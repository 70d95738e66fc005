from mobgs_tpu.parallel import mesh  # noqa: F401
