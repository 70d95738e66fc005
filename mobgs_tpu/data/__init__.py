from mobgs_tpu.data import cameras, synthetic  # noqa: F401
