from mobgs_tpu.core import image, knn, se3, sh, spline  # noqa: F401
