from mobgs_tpu.io import ply  # noqa: F401
