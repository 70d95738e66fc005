"""K-nearest-neighbour distances for Gaussian scale initialization.

TPU-native replacement for the `simple-knn` CUDA extension
(`distCUDA2(points[N,3]) -> [N]`, used at `scene/gaussian_model.py:420,514`):
the mean *squared* distance from each point to its 3 nearest neighbours.

Init-time only (N ≤ ~60k), so a blocked O(N²) top-k is the right call on
TPU: each block computes an [B, N] distance panel on the MXU via
||a-b||² = ||a||² + ||b||² - 2a·b and reduces with `lax.top_k`. No
spatial hash, no host round-trips, fully jittable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block"))
def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3, block: int = 1024) -> jnp.ndarray:
    """Mean squared distance to the k nearest neighbours (excluding self).

    Args:
      points: [N, 3] float32.
      k: neighbour count (reference uses 3).
      block: query block size.

    Returns:
      [N] mean of the k smallest squared distances per point.
    """
    N = points.shape[0]
    pad = (-N) % block
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    sq = jnp.sum(pts * pts, axis=-1)  # [Np]
    Np = pts.shape[0]
    valid = jnp.arange(Np) < N  # padded points must never be neighbours

    def body(q):  # q: [block, 3]
        qsq = jnp.sum(q * q, axis=-1)  # [block]
        d2 = qsq[:, None] + sq[None, :] - 2.0 * (q @ pts.T)
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        # k+1 smallest includes the self-distance (0); drop it.
        neg_top, _ = jax.lax.top_k(-d2, k + 1)
        d2k = -neg_top[:, 1:]
        return jnp.mean(jnp.maximum(d2k, 0.0), axis=-1)

    out = jax.lax.map(body, pts.reshape(-1, block, 3))
    return out.reshape(-1)[:N]
