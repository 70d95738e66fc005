"""mobgs_tpu — TPU-native dynamic Gaussian-splatting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MoBGS
("Motion Deblurring Dynamic 3D Gaussian Splatting for Blurry Monocular
Video"): spline-based dynamic Gaussians, blur-aware latent camera
estimation (BLCE), a differentiable tile rasterizer, densification, and
the DyBluRF stereo training/eval protocol — designed TPU-first:

* one fused, batched render over the [batch, exposure] axes instead of
  ~90 sequential kernel launches per iteration,
* fixed-capacity masked Gaussian arrays so every training step is a
  single jitted program with static shapes,
* a Pallas tile-compositing kernel for the hot rasterization path,
* `jax.sharding.Mesh` scale-out over the Gaussian and tile axes.
"""

__version__ = "0.1.0"
