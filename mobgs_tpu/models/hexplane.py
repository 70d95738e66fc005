"""HexPlane (K-planes) spatio-temporal feature field in JAX.

Parity target: reference `scene/hexplane.py` — 6 planes = C(4,2)
combinations of (x, y, z, t) per multiresolution scale, bilinear
sampling (align_corners=True, border padding), product over planes,
concatenation over scales. Time-carrying planes init to 1, spatial
planes U(0.1, 0.5). Plus the plane regularizers consumed by
`compute_regulation` (`gaussian_model.py:1373-1415`,
`scene/regulation.py:22-28`).
"""

from __future__ import annotations

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp

COO_COMBS = list(itertools.combinations(range(4), 2))
# indices of time-carrying planes within COO_COMBS: (0,3), (1,3), (2,3)
TIME_PLANE_IDS = [i for i, c in enumerate(COO_COMBS) if 3 in c]
SPATIAL_PLANE_IDS = [i for i, c in enumerate(COO_COMBS) if 3 not in c]


class HexPlaneParams(NamedTuple):
    grids: tuple        # per scale: tuple of 6 arrays [C, r2, r1]
    aabb: jnp.ndarray   # [2, 3] (max, min) — reference stores (max, min)


def init_hexplane(rng: jax.Array, bounds: float, config: dict,
                  multires: list[int]) -> HexPlaneParams:
    out_dim = config["output_coordinate_dim"]
    base_res = config["resolution"]
    scales = []
    for res_mult in multires:
        reso = [r * res_mult for r in base_res[:3]] + base_res[3:]
        planes = []
        for comb in COO_COMBS:
            rng, k = jax.random.split(rng)
            # grid shape [C, reso[comb[1]], reso[comb[0]]] (torch reverses)
            shape = (out_dim, reso[comb[1]], reso[comb[0]])
            if 3 in comb:
                g = jnp.ones(shape, jnp.float32)
            else:
                g = jax.random.uniform(k, shape, jnp.float32, 0.1, 0.5)
            planes.append(g)
        scales.append(tuple(planes))
    aabb = jnp.asarray([[bounds] * 3, [-bounds] * 3], jnp.float32)
    return HexPlaneParams(grids=tuple(scales), aabb=aabb)


def feat_dim(params: HexPlaneParams) -> int:
    return sum(s[0].shape[0] for s in params.grids)


def set_aabb(params: HexPlaneParams, xyz_max, xyz_min) -> HexPlaneParams:
    return params._replace(aabb=jnp.asarray([xyz_max, xyz_min], jnp.float32))


def _bilinear_ac(grid: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """align_corners=True bilinear sample. grid [C, H, W], uv [N, 2] in
    [-1, 1] (x indexes W, y indexes H). Border padding."""
    C, H, W = grid.shape
    x = (uv[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (uv[:, 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def at(iy, ix):
        iy = jnp.clip(iy.astype(jnp.int32), 0, H - 1)
        ix = jnp.clip(ix.astype(jnp.int32), 0, W - 1)
        return grid[:, iy, ix]  # [C, N]

    top = at(y0, x0) * (1 - wx) + at(y0, x0 + 1) * wx
    bot = at(y0 + 1, x0) * (1 - wx) + at(y0 + 1, x0 + 1) * wx
    return (top * (1 - wy) + bot * wy).T  # [N, C]


def query(params: HexPlaneParams, pts: jnp.ndarray,
          t: jnp.ndarray) -> jnp.ndarray:
    """Sample features. pts [N, 3] world, t [N, 1] in [0, 1].

    Returns [N, feat_dim] (concat over scales, product over planes).
    """
    amax, amin = params.aabb[0], params.aabb[1]
    # EXACT reference semantics (hexplane.py:19-21): normalize_aabb is
    # (pts - aabb[0]) * 2/(aabb[1] - aabb[0]) - 1 with aabb = [max, min]
    # — i.e. the coordinate comes out MIRRORED (1-2u, not 2u-1). The
    # orientation is invisible when training from scratch, but grids
    # loaded from a reference deformation.pth would sample flipped
    # without it (caught by tests/test_reference_parity.py, which runs
    # the reference's own module).
    ptsn = jnp.clip((pts - amax) * (2.0 / (amin - amax)) - 1.0, -1.0, 1.0)
    # time also mapped to [-1, 1] plane coords? reference passes raw t in
    # [0,1] concat'd then samples with align_corners grid_sample, whose
    # input domain is [-1,1]; it relies on border padding for t>0. We
    # mirror: coords = concat(ptsn, t) used directly.
    coords = jnp.concatenate([ptsn, jnp.reshape(t, (-1, 1))], axis=1)  # [N,4]

    feats = []
    for planes in params.grids:
        interp = 1.0
        for ci, comb in enumerate(COO_COMBS):
            uv = coords[:, list(comb)]
            interp = interp * _bilinear_ac(planes[ci], uv)
        feats.append(interp)
    return jnp.concatenate(feats, axis=-1)


def plane_smoothness(grid: jnp.ndarray) -> jnp.ndarray:
    """Second-difference smoothness along the row (time) axis
    (`scene/regulation.py:22-28`)."""
    d1 = grid[..., 1:, :] - grid[..., :-1, :]
    d2 = d1[..., 1:, :] - d1[..., :-1, :]
    return jnp.mean(jnp.square(d2))


def plane_regulation(params: HexPlaneParams) -> jnp.ndarray:
    """Spatial-plane TV (gaussian_model._plane_regulation :1373)."""
    total = 0.0
    for planes in params.grids:
        for i in SPATIAL_PLANE_IDS:
            total = total + plane_smoothness(planes[i])
    return total


def time_regulation(params: HexPlaneParams) -> jnp.ndarray:
    """Time-plane smoothness (gaussian_model._time_regulation :1386)."""
    total = 0.0
    for planes in params.grids:
        for i in TIME_PLANE_IDS:
            total = total + plane_smoothness(planes[i])
    return total


def l1_time_regulation(params: HexPlaneParams) -> jnp.ndarray:
    """L1 pull of spatiotemporal planes to 1 (:1399-1412)."""
    total = 0.0
    for planes in params.grids:
        for i in TIME_PLANE_IDS:
            total = total + jnp.mean(jnp.abs(1.0 - planes[i]))
    return total
