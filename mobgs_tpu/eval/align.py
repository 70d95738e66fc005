"""Test-pose alignment through the BLCE-refined training poses.

Parity target: reference train.py:746-764 — before evaluating, each
test camera is re-expressed relative to the *refined* mid-exposure
latent pose of its paired training view:

    aligned_test_w2c = w2c_train_mid_refined · w2c_train_in⁻¹ · w2c_test_in

(The reference computes this on transposed `world_view_transform`
matrices; this is the same identity in plain w2c form.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mobgs_tpu.core import se3
from mobgs_tpu.models import blce as B


def align_test_poses(blce_state: B.BLCEState, train_w2c: jnp.ndarray,
                     test_w2c: jnp.ndarray, blur_feats: jnp.ndarray,
                     num_warp: int = 9) -> jnp.ndarray:
    """Align all test poses; arrays stacked over views [V, ...]."""
    half = num_warp // 2

    def per_view(idx, w2c_train, w2c_test, bf):
        c2w = se3.view_to_world(w2c_train)
        lat_c2w, _ = B.latent_poses(blce_state, c2w, bf, idx, num_warp)
        mid_w2c = se3.view_to_world(lat_c2w[half])
        return mid_w2c @ se3.view_to_world(w2c_train) @ w2c_test

    V = train_w2c.shape[0]
    return jax.vmap(per_view)(jnp.arange(V, dtype=jnp.int32), train_w2c,
                              test_w2c, blur_feats)
