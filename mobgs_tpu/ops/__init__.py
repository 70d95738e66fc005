from mobgs_tpu.ops import projection, raster_jax, rasterize, reference_raster, tiles  # noqa: F401
