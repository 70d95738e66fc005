from mobgs_tpu.eval import lpips, metrics, tto  # noqa: F401
