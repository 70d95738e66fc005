"""Cubic-Hermite spline engine for per-Gaussian trajectories.

Behavioral reference: MoBGS `gaussian_renderer/__init__.py:23-56`
(forward interpolation with one-sided boundary derivatives and per-point
variable knot counts), `scene/gaussian_model.py:18-88` (inverse fit via
the scatter-assembled design matrix + least squares) and
`scene/gaussian_model.py:310-371` (masked refit used when pruning one
control point per Gaussian).

TPU-first design notes:

* Everything is expressed as dense gathers / `where`-selects over a
  fixed maximum knot count ``K`` so shapes stay static under ``jit``;
  the *live* knot count per point is the integer array ``n``.
* The trajectory fit exploits that at init time every point shares the
  same sample times and knot count, so a single ``[T, K]`` design matrix
  serves all points (one small matmul on the MXU instead of 30k tiny
  least-squares problems).
* The per-point masked refit (variable ``n``) solves batched normal
  equations with `jnp.linalg.solve`, which XLA batches natively.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hermite_basis(t: jnp.ndarray):
    """Cubic Hermite basis functions h00, h10, h01, h11 at local t∈[0,1]."""
    one_m_t = 1.0 - t
    h00 = (1.0 + 2.0 * t) * one_m_t * one_m_t
    h10 = t * one_m_t * one_m_t
    h01 = t * t * (3.0 - 2.0 * t)
    h11 = t * t * (t - 1.0)
    return h00, h10, h01, h11


def _segment_indices(times_scaled: jnp.ndarray, n: jnp.ndarray):
    """Knot indices (left, i, right, right-right) for scaled times.

    ``times_scaled`` and ``n`` broadcast together; ``n`` is the per-point
    live knot count.  Clamping matches the reference exactly: the segment
    index is clipped to [0, n-2] and neighbours to [0, n-1].
    """
    idx = jnp.clip(jnp.floor(times_scaled).astype(jnp.int32), 0, n - 2)
    left = jnp.clip(idx - 1, 0, n - 1)
    right = jnp.clip(idx + 1, 0, n - 1)
    rright = jnp.clip(idx + 2, 0, n - 1)
    return idx, left, right, rright


def eval_spline(control: jnp.ndarray, t, n: jnp.ndarray) -> jnp.ndarray:
    """Evaluate per-point cubic Hermite splines.

    Args:
      control: ``[P, K, C]`` control points (K = max knot capacity).
      t: scalar, ``[P]`` or ``[P, 1]`` normalized time in [0, 1].
      n: ``[P]`` or ``[P, 1]`` int live knot count per point (4 ≤ n ≤ K).

    Returns:
      ``[P, C]`` interpolated values.
    """
    P, K, C = control.shape
    t = jnp.asarray(t, control.dtype)
    t = jnp.broadcast_to(jnp.reshape(t, (-1, 1))[:, 0] if t.ndim else t, (P,))
    n = jnp.reshape(jnp.asarray(n, jnp.int32), (-1,))
    n = jnp.broadcast_to(n, (P,))

    ts = t * (n - 1).astype(control.dtype)  # [P]
    idx, left, right, rright = _segment_indices(ts, n)

    def take(i):  # [P] -> [P, C]
        return jnp.take_along_axis(control, i[:, None, None], axis=1)[:, 0, :]

    p0, p1, p2, p3 = take(left), take(idx), take(right), take(rright)

    # One-sided derivatives at segment boundaries (reference lines 41-42).
    at_left_edge = (left == idx)[:, None]
    at_right_edge = (rright == right)[:, None]
    m0 = jnp.where(at_left_edge, p2 - p1, (p2 - p0) * 0.5)
    m1 = jnp.where(at_right_edge, p2 - p1, (p3 - p1) * 0.5)

    tfrac = (ts - idx.astype(control.dtype))[:, None]
    h00, h10, h01, h11 = hermite_basis(tfrac)
    return h00 * p1 + h10 * m0 + h01 * p2 + h11 * m1


def design_row_np(t: float, n_pts: int, K: int) -> np.ndarray:
    """One row of the Hermite design matrix (numpy, host-side helper)."""
    row = np.zeros(K, np.float64)
    ts = t * (n_pts - 1)
    idx = int(np.clip(np.floor(ts), 0, n_pts - 2))
    left = max(idx - 1, 0)
    right = min(idx + 1, n_pts - 1)
    rright = min(idx + 2, n_pts - 1)
    tf = ts - idx
    h00 = (1 + 2 * tf) * (1 - tf) ** 2
    h10 = tf * (1 - tf) ** 2
    h01 = tf * tf * (3 - 2 * tf)
    h11 = tf * tf * (tf - 1)
    row[idx] += h00
    row[right] += h01
    if left == idx:  # boundary: m0 = p2 - p1
        row[right] += h10
        row[idx] -= h10
    else:  # m0 = (p2 - p0)/2
        row[right] += h10 / 2
        row[left] -= h10 / 2
    if rright == right:  # boundary: m1 = p2 - p1
        row[right] += h11
        row[idx] -= h11
    else:  # m1 = (p3 - p1)/2
        row[rright] += h11 / 2
        row[idx] -= h11 / 2
    return row


def design_matrix(times: jnp.ndarray, n: jnp.ndarray, K: int) -> jnp.ndarray:
    """Hermite design matrix rows, vectorized and per-point.

    Args:
      times: ``[..., T]`` normalized sample times.
      n: broadcastable int live knot count.
      K: static max knot capacity (columns).

    Returns:
      ``[..., T, K]`` such that ``A @ control ≈ curve``.
    """
    dt = jnp.float32
    times = jnp.asarray(times, dt)
    n = jnp.asarray(n, jnp.int32)
    ts = times * (n - 1).astype(dt)
    idx, left, right, rright = _segment_indices(ts, n)
    tf = ts - idx.astype(dt)
    h00, h10, h01, h11 = hermite_basis(tf)

    at_left = left == idx
    at_right = rright == right
    # Coefficients per knot slot (reference gaussian_model.py:40-57).
    c_idx = h00 + jnp.where(at_left, -h10, 0.0) + jnp.where(at_right, -h11, -h11 * 0.5)
    c_left = jnp.where(at_left, 0.0, -h10 * 0.5)
    c_right = h01 + jnp.where(at_left, h10, h10 * 0.5) + jnp.where(at_right, h11, 0.0)
    c_rright = jnp.where(at_right, 0.0, h11 * 0.5)

    cols = jnp.arange(K, dtype=jnp.int32)
    shape = ts.shape + (K,)
    A = jnp.zeros(shape, dt)
    for i, c in ((idx, c_idx), (left, c_left), (right, c_right), (rright, c_rright)):
        A = A + jnp.where(cols == i[..., None], c[..., None], 0.0)
    return A


def fit_spline_shared(traj: jnp.ndarray, times: jnp.ndarray, n_pts: int, K: int,
                      ridge: float = 1e-8) -> jnp.ndarray:
    """Fit control points when all points share times and knot count.

    The init-time case (reference `gaussian_model.py:436-441`): one shared
    ``[T, K]`` design matrix, so the whole fit is a single small solve +
    matmul over all P points.

    Args:
      traj: ``[P, T, C]`` trajectories.
      times: ``[T]`` sample times in [0, 1].
      n_pts: live knot count (same for every point).
      K: max knot capacity (output columns; trailing K - n_pts are zero).

    Returns:
      ``[P, K, C]`` fitted control points.
    """
    A = design_matrix(times, jnp.int32(n_pts), n_pts)  # [T, n_pts]
    AtA = A.T @ A + ridge * jnp.eye(n_pts, dtype=A.dtype)
    Atb = jnp.einsum("tk,ptc->pkc", A, traj)
    sol = jnp.linalg.solve(AtA[None], Atb)  # [P, n_pts, C]
    if n_pts < K:
        pad = jnp.zeros((traj.shape[0], K - n_pts, sol.shape[-1]), sol.dtype)
        sol = jnp.concatenate([sol, pad], axis=1)
    return sol


def project_points(pts: jnp.ndarray, w2c: jnp.ndarray,
                   K_mat: jnp.ndarray) -> jnp.ndarray:
    """World points -> pixel coordinates (graphics_utils.py:143-155
    `pts2pixel`/`cam2pixel`: column-wise w2c transform, then K projection
    with the reference's 1e-7 z-guard)."""
    cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    pix = cam @ K_mat.T
    return pix[..., :2] / (pix[..., 2:3] + 1e-7)


def compute_prune_error(control: jnp.ndarray, n_cur: jnp.ndarray,
                        new_control: jnp.ndarray, n_new: jnp.ndarray,
                        view_w2c: jnp.ndarray, view_times: jnp.ndarray,
                        focal: float, width: int, height: int,
                        pos_scale: float = 1e-2) -> jnp.ndarray:
    """Mean reprojection error of the pruned spline vs the current one.

    Port of `gaussian_model.py:292-308`: for every INTERIOR view (the
    reference skips the first and last frame), evaluate both splines at
    the view time, scale by 1e-2 (the spline-position convention), project
    through a synthesized K = [[f,0,W/2],[0,f,H/2],[0,0,1]] built from the
    first view's focal, and average the per-point 2-D L2 distances.

    Args:
      control/new_control: ``[P, K, 3]`` current / one-knot-pruned points.
      n_cur/n_new: ``[P]`` live knot counts for each.
      view_w2c: ``[V, 4, 4]`` world-to-camera matrices (V ≥ 3; the first
        and last rows are skipped, as the reference does).
      view_times: ``[V]`` normalized times.
      focal, width, height: intrinsics of the synthesized K.

    Returns:
      ``[P]`` mean pixel error over interior views.
    """
    K_mat = jnp.asarray([[focal, 0.0, width / 2.0],
                         [0.0, focal, height / 2.0],
                         [0.0, 0.0, 1.0]], control.dtype)
    V = view_w2c.shape[0]
    errs = []
    for v in range(1, V - 1):  # static count: interior views only
        t = view_times[v]
        old3d = eval_spline(control, t, n_cur) * pos_scale
        new3d = eval_spline(new_control, t, n_new) * pos_scale
        old2d = project_points(old3d, view_w2c[v], K_mat)
        new2d = project_points(new3d, view_w2c[v], K_mat)
        errs.append(jnp.linalg.norm(old2d - new2d, axis=-1))
    return jnp.stack(errs, 0).mean(0)


def onedown_control_pts(control: jnp.ndarray, n_cur: jnp.ndarray,
                        view_w2c: jnp.ndarray, view_times: jnp.ndarray,
                        focal: float, width: int, height: int,
                        error_threshold: float):
    """Knot-prune controller (`gaussian_model.py:274-291`): refit every
    spline with one fewer control point, gate the swap per point on the
    reprojection error staying under ``error_threshold``.

    Returns (control', n_cur', n_accepted). Functional (no in-place
    mutation). Points already at the 4-knot floor target n_new = 4
    (the reference's `new_control_num[new_control_num < 4] = 4` clamp),
    so an accepted swap re-solves them at the same count.
    """
    K = control.shape[1]
    n_cur = jnp.reshape(jnp.asarray(n_cur, jnp.int32), (-1,))
    n_new = jnp.maximum(n_cur - 1, 4)
    new_control = refit_spline_pruned(control, n_cur, K)
    err = compute_prune_error(control, n_cur, new_control, n_new,
                              view_w2c, view_times, focal, width, height)
    accept = err <= error_threshold
    control_out = jnp.where(accept[:, None, None], new_control, control)
    n_out = jnp.where(accept, n_new, n_cur)
    return control_out, n_out, jnp.sum(accept)


def refit_spline_pruned(control: jnp.ndarray, n_cur: jnp.ndarray,
                        K: int, ridge: float = 1e-6) -> jnp.ndarray:
    """Refit each spline with one fewer control point.

    Mirrors `gaussian_model.py:274-371`: the current spline is sampled at
    its own knot times, a masked design matrix with (n_cur - 1) live
    columns is assembled (rows beyond the live sample count replaced by
    dummy identity-like equations so the system stays well-posed), and
    the reduced control points are solved per point.

    Args:
      control: ``[P, K, C]`` current control points.
      n_cur: ``[P]`` current live knot counts.
      K: static capacity.

    Returns:
      ``[P, K, C]`` refitted control points for knot count
      ``max(n_cur - 1, 4)`` (column K-1 zeroed; caller updates counts).
    """
    P, _, C = control.shape
    n_cur = jnp.reshape(jnp.asarray(n_cur, jnp.int32), (-1,))
    n_new = jnp.maximum(n_cur - 1, 4)

    # Sample times of the *current* knots: j / (n_cur - 1) for j < n_cur.
    j = jnp.arange(K, dtype=jnp.float32)[None, :]  # [1, K]
    t_samples = j / (n_cur[:, None] - 1).astype(jnp.float32)  # [P, K]
    curves = control  # current knots ARE the curve samples at their times

    A = design_matrix(t_samples, n_new[:, None], K)  # [P, K(rows), K(cols)]

    # Live-row mask: rows beyond the current knot count are invalid.
    row_live = (j < n_cur[:, None].astype(jnp.float32))  # [P, K]
    # Dummy equations keep masked rows well-posed: row r selects column r-1
    # (shifted identity, reference gaussian_model.py:312).
    cols = jnp.arange(K, dtype=jnp.int32)
    dummy = (cols[None, :] == (jnp.arange(K, dtype=jnp.int32)[:, None] - 1)).astype(A.dtype)
    A = A * row_live[..., None] + dummy[None] * (1.0 - row_live[..., None])
    b = curves * row_live[..., None]

    AtA = jnp.einsum("prk,prl->pkl", A, A) + ridge * jnp.eye(K, dtype=A.dtype)[None]
    Atb = jnp.einsum("prk,prc->pkc", A, b)
    sol = jnp.linalg.solve(AtA, Atb)  # [P, K, C]
    # Zero columns at/after the new knot count.
    col_live = (cols[None, :] < n_new[:, None]).astype(sol.dtype)
    return sol * col_live[..., None]
