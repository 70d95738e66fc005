"""Rotation / rigid-transform math shared across the framework.

Behavioral reference points in MoBGS:
* `utils/general_utils.py:85-116` (`build_rotation` quaternion→matrix),
* `utils/graphics_utils.py:40-79` (`getWorld2View2`, projection matrix),
* `scene/blce.py:432-478` (Rodrigues + G-formula SE(3) exponential used
  by the latent camera model).

Conventions (identical to the reference):
* quaternions are (w, x, y, z),
* `world_to_view(R, t)` returns the 4x4 W2C matrix with ``R`` stored as
  the camera-to-world rotation (so W2C rotation block is ``R.T``),
* the OpenGL-style projection matrix matches `getProjectionMatrix`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize, NaN-safe in the backward pass at ‖v‖ = 0.

    `v / max(‖v‖, eps)` still back-propagates NaN at exactly zero input
    (d√x/dx → ∞ times a zero cotangent); clamping the *squared* norm
    before rsqrt keeps both value and gradient finite — dead Gaussian
    slots carry all-zero quaternions through the training step.
    """
    sq = jnp.sum(v * v, axis=axis, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize quaternion(s) [..., 4] (wxyz) to rotation [..., 3, 3]."""
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack([
        jnp.stack([r00, r01, r02], -1),
        jnp.stack([r10, r11, r12], -1),
        jnp.stack([r20, r21, r22], -1),
    ], -2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] → quaternion [..., 4] (wxyz), branch-free."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best by which
    # diagonal term dominates (standard Shepperd method, vectorized).
    qw0 = jnp.sqrt(jnp.maximum(1 + tr, 1e-12)) / 2
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], -1)
    qx1 = jnp.sqrt(jnp.maximum(1 + m00 - m11 - m22, 1e-12)) / 2
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], -1)
    qy2 = jnp.sqrt(jnp.maximum(1 - m00 + m11 - m22, 1e-12)) / 2
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], -1)
    qz3 = jnp.sqrt(jnp.maximum(1 - m00 - m11 + m22, 1e-12)) / 2
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], -1)
    cond0 = tr > 0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(cond0[..., None], q0,
                  jnp.where(cond1[..., None], q1,
                            jnp.where(cond2[..., None], q2, q3)))
    return normalize(q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions [..., 4] (wxyz)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] → skew-symmetric [..., 3, 3]."""
    zero = jnp.zeros_like(w[..., 0])
    w1, w2, w3 = w[..., 0], w[..., 1], w[..., 2]
    return jnp.stack([
        jnp.stack([zero, -w3, w2], -1),
        jnp.stack([w3, zero, -w1], -1),
        jnp.stack([-w2, w1, zero], -1),
    ], -2)


def rodrigues(w_skew: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """exp(theta * [w]_x) for unit-axis skew matrices. theta: [..., 1, 1]."""
    eye = jnp.eye(3, dtype=w_skew.dtype)
    return eye + jnp.sin(theta) * w_skew + (1 - jnp.cos(theta)) * (w_skew @ w_skew)


def se3_G(w_skew: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """The V/G matrix of the SE(3) exponential (reference blce.py:452-459)."""
    eye = jnp.eye(3, dtype=w_skew.dtype)
    return (eye * theta + (1 - jnp.cos(theta)) * w_skew
            + (theta - jnp.sin(theta)) * (w_skew @ w_skew))


def se3_exp_wvtheta(w: jnp.ndarray, v: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """SE(3) delta from axis w [...,3], trans v [...,3], angle theta [...,1].

    Matches BLCE's decode path: normalize w to a unit axis, apply
    Rodrigues with the *decoded* theta, translation ``p = G(w, θ) v``.
    """
    w_unit = w * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(w * w, axis=-1, keepdims=True), 1e-20))
    W = skew(w_unit)
    th = theta[..., None]  # [..., 1, 1]
    R = rodrigues(W, th)
    p = (se3_G(W, th) @ v[..., None])
    top = jnp.concatenate([R, p], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], top.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def world_to_view(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """4x4 world→camera matrix from the reference's (R=c2w rot, t=w2c trans).

    Equivalent to `getWorld2View2` with zero translate / unit scale.
    """
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    top = jnp.concatenate([R.T, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], R.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def view_to_world(w2c: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid 4x4."""
    R = w2c[..., :3, :3]
    t = w2c[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], w2c.dtype), w2c.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> jnp.ndarray:
    """OpenGL-style projection, parity with `getProjectionMatrix`."""
    tan_y = jnp.tan(fovy / 2)
    tan_x = jnp.tan(fovx / 2)
    top = tan_y * znear
    right = tan_x * znear
    P = jnp.zeros((4, 4), jnp.float32)
    P = P.at[0, 0].set(znear / right)
    P = P.at[1, 1].set(znear / top)
    P = P.at[3, 2].set(1.0)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    return P


def fov2focal(fov, pixels):
    return pixels / (2 * jnp.tan(fov / 2))


def focal2fov(focal, pixels):
    return 2 * jnp.arctan(pixels / (2 * focal))
