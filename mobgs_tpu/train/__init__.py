from mobgs_tpu.train import densify, loop, losses, optim, step  # noqa: F401
