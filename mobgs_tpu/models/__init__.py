from mobgs_tpu.models import blce, gaussians, render, sandwich  # noqa: F401
