from mobgs_tpu.utils import observability  # noqa: F401
