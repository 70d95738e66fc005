"""Perspective EWA projection of 3D Gaussians to screen space.

TPU-native equivalent of gsplat's `fully_fused_projection`
(call sites: reference `gaussian_renderer/__init__.py:190-199,411-431,
513-533`). Pure vectorized JAX — elementwise math over the Gaussian
axis; XLA fuses it into the surrounding program. Differentiable by
construction.

Semantics matched to gsplat v1.4 defaults:
* near-plane cull at z <= 0.01 (radius forced to 0),
* camera-plane coordinates clamped to ±1.3·tan(fov) when building the
  projection Jacobian,
* 2D covariance low-pass: +0.3 on the diagonal (eps2d),
* radius = ceil(3σ_max) with σ_max from the 2D covariance eigenvalues,
* off-screen cull (bbox test against the image rectangle).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mobgs_tpu.core import se3


class ProjectedSplats(NamedTuple):
    """Per-Gaussian screen-space records (the ~56-byte splat record)."""
    means2d: jnp.ndarray   # [N, 2] pixel coords
    conics: jnp.ndarray    # [N, 3] upper-tri of inverse 2D covariance (a, b, c)
    depths: jnp.ndarray    # [N] camera-space z
    radii: jnp.ndarray     # [N] int32 pixel radius (0 = culled)


def quat_scale_to_cov3d(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Covariance R S S^T R^T from unit-normalized quats and linear scales."""
    R = se3.quat_to_rotmat(quats)          # [N, 3, 3]
    M = R * scales[..., None, :]           # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def project(means: jnp.ndarray, quats: jnp.ndarray, scales: jnp.ndarray,
            viewmat: jnp.ndarray, K: jnp.ndarray, width: int, height: int,
            eps2d: float = 0.3, near: float = 0.01,
            sigma_cut: float = 3.0) -> ProjectedSplats:
    """Project Gaussians into one camera.

    Args:
      means: [N, 3] world positions.
      quats: [N, 4] rotations (wxyz, unnormalized ok).
      scales: [N, 3] linear (activated) scales.
      viewmat: [4, 4] world→camera.
      K: [3, 3] intrinsics.
      width, height: image size (static).

    Returns:
      ProjectedSplats; culled Gaussians have radius 0.
    """
    dt = means.dtype
    Rcw = viewmat[:3, :3]
    tcw = viewmat[:3, 3]
    p_cam = means @ Rcw.T + tcw  # [N, 3]
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    zs = jnp.maximum(z, near)
    # Clamp plane coords for the Jacobian like gsplat (±1.3 tan fov).
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = zs * jnp.clip(x / zs, -lim_x, lim_x)
    ty = zs * jnp.clip(y / zs, -lim_y, lim_y)

    cov3d = quat_scale_to_cov3d(quats, scales)  # [N, 3, 3]
    W = Rcw  # world→cam rotation
    covc = W @ cov3d @ W.T  # camera-frame covariance, [N,3,3] via broadcast

    rz = 1.0 / zs
    rz2 = rz * rz
    # J rows: d(u)/d(cam), d(v)/d(cam)
    # u = fx * x / z, v = fy * y / z
    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2
    c00, c01, c02 = covc[:, 0, 0], covc[:, 0, 1], covc[:, 0, 2]
    c11, c12, c22 = covc[:, 1, 1], covc[:, 1, 2], covc[:, 2, 2]
    # cov2d = J Σc J^T, expanded by hand (avoids materializing [N,2,3]).
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22) + eps2d
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22) + eps2d
    # runaway log-scales can push cov2d to inf, where det = inf - inf = NaN
    # poisons grads via 0*NaN; bound the 2D covariance instead (a Gaussian
    # this large is screen-filling garbage either way)
    big = 1e12
    a = jnp.clip(a, 0.0, big)
    b = jnp.clip(b, -big, big)
    c = jnp.clip(c, 0.0, big)
    det = a * c - b * b
    det = jnp.maximum(det, 1e-12)
    inv_det = 1.0 / det
    conics = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], -1)

    mean2d = jnp.stack([fx * x * rz + cx, fy * y * rz + cy], -1)

    # radius from the larger eigenvalue of cov2d
    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(sigma_cut * jnp.sqrt(lam))

    inside = ((mean2d[:, 0] + radius > 0) & (mean2d[:, 0] - radius < width)
              & (mean2d[:, 1] + radius > 0) & (mean2d[:, 1] - radius < height))
    valid = (z > near) & inside & (det > 1e-12)
    radius = jnp.where(valid, radius, 0.0).astype(jnp.int32)

    return ProjectedSplats(means2d=mean2d.astype(dt), conics=conics.astype(dt),
                           depths=z.astype(dt), radii=radius)
