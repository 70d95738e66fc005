"""Camera representation — minimal array pytree + derived quantities.

The reference `scene/cameras.py:18-299` Camera is a grab-bag of ~30
tensors rebuilt per latent pose (BLCE constructs 9 full Camera objects
per view per iteration, each recomputing per-pixel rays). Here a camera
is just (w2c, K, time); everything derived (rays, pixel grids) is a pure
function computed inside the jitted step where XLA fuses or hoists it.

Conventions: ``w2c`` is the 4x4 world→camera matrix (the reference's
`world_view_transform` is its transpose, row-major); ``K`` is the 3x3
pinhole intrinsics; ``time`` is the normalized frame time in [0, 1].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mobgs_tpu.core import se3


class Camera(NamedTuple):
    w2c: jnp.ndarray   # [4, 4]
    K: jnp.ndarray     # [3, 3]
    time: jnp.ndarray  # scalar f32, normalized


def camera_from_rt(R, t, K, time) -> Camera:
    """From the reference convention (R = c2w rotation, t = w2c trans)."""
    return Camera(w2c=se3.world_to_view(jnp.asarray(R, jnp.float32),
                                        jnp.asarray(t, jnp.float32)),
                  K=jnp.asarray(K, jnp.float32),
                  time=jnp.asarray(time, jnp.float32))


def pixel_grid(width: int, height: int, use_center: bool = False) -> jnp.ndarray:
    """[H, W, 2] pixel coordinates (reference cameras.py:206-213)."""
    xx, yy = jnp.meshgrid(jnp.arange(width, dtype=jnp.float32),
                          jnp.arange(height, dtype=jnp.float32))
    off = 0.5 if use_center else 0.0
    return jnp.stack([xx, yy], axis=-1) + off


def cam_rays(cam: Camera, width: int, height: int) -> jnp.ndarray:
    """Per-pixel [H, W, 6] (origin‖world viewdir), parity with
    `scene/cameras.py:132-146` (consumed by the Sandwich decoder)."""
    c2w = se3.view_to_world(cam.w2c)
    origin = c2w[:3, 3]
    R = c2w[:3, :3]
    pix = pixel_grid(width, height, use_center=True)
    fx, fy = cam.K[0, 0], cam.K[1, 1]
    cx, cy = cam.K[0, 2], cam.K[1, 2]
    x = (pix[..., 0] - cx) / fx
    y = (pix[..., 1] - cy) / fy
    local = jnp.stack([x, y, jnp.ones_like(x)], -1)
    local = se3.normalize(local)
    world = local @ R.T
    world = se3.normalize(world)
    org = jnp.broadcast_to(origin, world.shape)
    return jnp.concatenate([org, world], axis=-1)
