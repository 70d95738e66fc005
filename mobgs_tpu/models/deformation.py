"""Deformation field — HexPlane features → MLP heads.

Parity target: reference `scene/deformation.py:18-303` (`Deformation` /
`deform_network`). In MoBGS's fine stage the spline drives dynamics and
this network is legacy kept alive for the checkpoint format
(SURVEY.md §2.3), but it is a complete, trainable component here:
positional encodings (`poc_fre`, deformation.py:794-799), the
`feature_out` MLP (depth D=1, width W=128 in the stereo configs), and
the pos/scales/rotations heads with the reference's post-processing
(SE(3)-ish quat rotation applied to positions, scale clamp at log 100,
quaternion composition for rotations).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobgs_tpu.core.se3 import quat_multiply, quat_to_rotmat
from mobgs_tpu.models import hexplane as HP


class MLPParams(NamedTuple):
    ws: tuple
    bs: tuple


def _init_mlp(rng, dims):
    ws, bs = [], []
    for i in range(len(dims) - 1):
        rng, k1, k2 = jax.random.split(rng, 3)
        bound = 1.0 / math.sqrt(dims[i])
        ws.append(jax.random.uniform(k1, (dims[i], dims[i + 1]), jnp.float32,
                                     -bound, bound))
        bs.append(jax.random.uniform(k2, (dims[i + 1],), jnp.float32,
                                     -bound, bound))
    return MLPParams(ws=tuple(ws), bs=tuple(bs))


def _apply_mlp(p: MLPParams, x, relu_first=False):
    h = x
    for i, (w, b) in enumerate(zip(p.ws, p.bs)):
        if relu_first or i > 0:
            h = jax.nn.relu(h)
        h = h @ w + b
    return h


class DeformationParams(NamedTuple):
    grid: HP.HexPlaneParams
    feature_out: MLPParams     # grid_feat -> W (+ D-1 hidden)
    pos_deform: MLPParams      # W -> W -> 7 (dx3 + quat4)
    scales_deform: MLPParams   # W -> W -> 3
    rotations_deform: MLPParams  # W -> W -> 4
    # time embedding MLP of the reference wrapper (deformation.py:241-243);
    # present in `deformation.pth` and the reference Adam groups even
    # though the MoBGS forward path never calls it
    timenet: MLPParams         # 2*timebase_pe+1 -> timenet_width -> out


def init_deformation(rng: jax.Array, hidden_cfg) -> DeformationParams:
    """hidden_cfg: ModelHiddenParams-like (bounds, kplanes_config,
    multires, net_width, defor_depth)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
    grid = HP.init_hexplane(k1, hidden_cfg.bounds, hidden_cfg.kplanes_config,
                            list(hidden_cfg.multires))
    W = hidden_cfg.net_width
    D = hidden_cfg.defor_depth
    fdim = HP.feat_dim(grid)
    feature_dims = [fdim] + [W] * D
    times_ch = 2 * hidden_cfg.timebase_pe + 1
    return DeformationParams(
        grid=grid,
        feature_out=_init_mlp(k2, feature_dims),
        pos_deform=_init_mlp(k3, [W, W, 7]),
        scales_deform=_init_mlp(k4, [W, W, 3]),
        rotations_deform=_init_mlp(k5, [W, W, 4]),
        timenet=_init_mlp(k6, [times_ch, hidden_cfg.timenet_width,
                               hidden_cfg.timenet_output]),
    )


def poc_fre(x: jnp.ndarray, poc_buf: jnp.ndarray) -> jnp.ndarray:
    """Positional encoding [x ‖ sin(x·2^k) ‖ cos(x·2^k)]
    (deformation.py:794-799)."""
    xp = x[..., None] * poc_buf  # [..., C, L]
    s = jnp.sin(xp).reshape(*x.shape[:-1], -1)
    c = jnp.cos(xp).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, s, c], axis=-1)


def apply_deformation(params: DeformationParams, xyz: jnp.ndarray,
                      scales: jnp.ndarray, rotations: jnp.ndarray,
                      t: jnp.ndarray):
    """Deform (xyz, scales, rotations) at time t (deformation.py:107-145).

    Args: xyz [N,3]; scales [N,3] (log); rotations [N,4]; t scalar or [N].
    Returns (xyz', scales', rotations').
    """
    N = xyz.shape[0]
    tcol = jnp.broadcast_to(jnp.reshape(jnp.asarray(t, jnp.float32), (-1, 1)),
                            (N, 1))
    feat = HP.query(params.grid, xyz, tcol)
    hidden = _apply_mlp(params.feature_out, feat)

    dx = _apply_mlp(params.pos_deform, hidden, relu_first=True)  # [N, 7]
    pts = xyz + dx[:, 0:3]
    R = quat_to_rotmat(dx[:, 3:7])
    pts = jnp.einsum("nij,nj->ni", R, pts)

    ds = _apply_mlp(params.scales_deform, hidden, relu_first=True)
    ds = jnp.minimum(ds, math.log(100.0))  # clamp (deformation.py:129-131)
    new_scales = scales + ds

    dr = _apply_mlp(params.rotations_deform, hidden, relu_first=True)
    new_rot = quat_multiply(rotations, dr)
    return pts, new_scales, new_rot


def regulation_loss(params: DeformationParams, time_smoothness_weight: float,
                    l1_time_planes_weight: float,
                    plane_tv_weight: float) -> jnp.ndarray:
    """compute_regulation parity (gaussian_model.py:1414-1415)."""
    return (plane_tv_weight * HP.plane_regulation(params.grid)
            + time_smoothness_weight * HP.time_regulation(params.grid)
            + l1_time_planes_weight * HP.l1_time_regulation(params.grid))
