"""Sandwich RGB decoder — 9-channel rasterized features → RGB.

Parity target: reference `helper_model.py:7-28`. Two bias-free 1x1
convolutions: split the 9 rasterized channels into (albedo, spec,
timefeat); mlp1 maps [spec‖timefeat‖cam_ray(6)] (12ch) → 6, ReLU,
mlp2 → 3; output sigmoid(albedo + specular).

A 1x1 conv over [H, W] is a plain per-pixel matmul here, which XLA maps
straight onto the MXU — the decoder fuses into the render epilogue.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SandwichParams(NamedTuple):
    w1: jnp.ndarray  # [12, 6]
    w2: jnp.ndarray  # [6, 3]


def init_sandwich(rng: jax.Array) -> SandwichParams:
    """Kaiming-uniform-style init (torch Conv2d default: U(±1/√fan_in))."""
    k1, k2 = jax.random.split(rng)
    b1 = 1.0 / jnp.sqrt(12.0)
    b2 = 1.0 / jnp.sqrt(6.0)
    return SandwichParams(
        w1=jax.random.uniform(k1, (12, 6), jnp.float32, -b1, b1),
        w2=jax.random.uniform(k2, (6, 3), jnp.float32, -b2, b2),
    )


def apply_sandwich(params: SandwichParams, feat9: jnp.ndarray,
                   cam_ray: jnp.ndarray, clamp: bool = False) -> jnp.ndarray:
    """Decode features to RGB.

    Args:
      feat9: [..., H, W, 9] rasterized features (albedo3‖spec3‖timefeat3).
      cam_ray: [H, W, 6] per-pixel (origin‖viewdir).

    Returns:
      [..., H, W, 3] RGB in [0, 1].
    """
    albedo = feat9[..., 0:3]
    spec = feat9[..., 3:6]
    timefeat = feat9[..., 6:9]
    rays = jnp.broadcast_to(cam_ray, feat9.shape[:-1] + (6,))
    x = jnp.concatenate([spec, timefeat, rays], axis=-1)  # [..., 12]
    h = jax.nn.relu(x @ params.w1)
    specular = h @ params.w2
    out = albedo + specular
    if clamp:  # Sandwichnoact variant (helper_model.py:31-50)
        return jnp.clip(out, 0.0, 1.0)
    return jax.nn.sigmoid(out)
