"""Dense 3D feature grid (reference `scene/grid.py::DenseGrid`).

Default-off in the reference (`empty_voxel=False`,
`arguments/__init__.py:104`) but part of the component inventory: a
trilinear grid with `align_corners=True` grid_sample semantics, aabb
normalization, trilinear capacity rescale, and the in-place `-=`
operator used by the coarse density pruning path.

Functional layout: parameters are a NamedTuple, queries are pure
functions — trilinear interpolation is 8 gathers + a weighted sum,
which XLA fuses; no grid_sample op is needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DenseGridParams(NamedTuple):
    grid: jnp.ndarray      # [C, X, Y, Z]
    xyz_min: jnp.ndarray   # [3]
    xyz_max: jnp.ndarray   # [3]


def init_dense_grid(channels: int, world_size, fill: float = 1.0,
                    xyz_min=None, xyz_max=None) -> DenseGridParams:
    """Reference ctor: `nn.Parameter(torch.ones([1, C, *world_size]))`
    (grid.py:24); aabb set later via `set_aabb` (grid.py:44-46)."""
    X, Y, Z = world_size
    return DenseGridParams(
        grid=jnp.full((channels, X, Y, Z), fill, jnp.float32),
        xyz_min=(jnp.zeros(3) if xyz_min is None
                 else jnp.asarray(xyz_min, jnp.float32)),
        xyz_max=(jnp.ones(3) if xyz_max is None
                 else jnp.asarray(xyz_max, jnp.float32)))


def set_aabb(params: DenseGridParams, xyz_max, xyz_min) -> DenseGridParams:
    return params._replace(xyz_min=jnp.asarray(xyz_min, jnp.float32),
                           xyz_max=jnp.asarray(xyz_max, jnp.float32))


def _trilinear(grid: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Sample grid [C, X, Y, Z] at continuous indices u [..., 3]
    (align_corners=True: u already in index units, 0..dim-1), with
    border clamping. Returns [..., C]."""
    C = grid.shape[0]
    dims = jnp.asarray(grid.shape[1:], jnp.float32)
    u = jnp.clip(u, 0.0, dims - 1.0)
    i0 = jnp.floor(u).astype(jnp.int32)
    i0 = jnp.minimum(i0, jnp.asarray(grid.shape[1:], jnp.int32) - 2)
    i0 = jnp.maximum(i0, 0)
    f = u - i0.astype(jnp.float32)                       # [..., 3]

    def tap(dx, dy, dz):
        ix = i0[..., 0] + dx
        iy = i0[..., 1] + dy
        iz = i0[..., 2] + dz
        v = grid[:, ix, iy, iz]                          # [C, ...]
        w = (jnp.where(dx, f[..., 0], 1 - f[..., 0])
             * jnp.where(dy, f[..., 1], 1 - f[..., 1])
             * jnp.where(dz, f[..., 2], 1 - f[..., 2]))
        return v * w[None]

    out = sum(tap(dx, dy, dz)
              for dx in (0, 1) for dy in (0, 1) for dz in (0, 1))
    return jnp.moveaxis(out, 0, -1)                      # [..., C]


def query(params: DenseGridParams, xyz: jnp.ndarray) -> jnp.ndarray:
    """`DenseGrid.forward` (grid.py:26-37): normalize by the aabb and
    trilinearly sample; xyz [..., 3] → [..., C]."""
    t = (xyz - params.xyz_min) / (params.xyz_max - params.xyz_min)
    dims = jnp.asarray(params.grid.shape[1:], jnp.float32)
    u = t * (dims - 1.0)                                 # align_corners
    return _trilinear(params.grid, u)


def scale_volume_grid(params: DenseGridParams,
                      new_world_size) -> DenseGridParams:
    """`scale_volume_grid` (grid.py:38-43): trilinear resize with
    align_corners — i.e. sample the old grid at the new lattice."""
    X, Y, Z = new_world_size
    dims = jnp.asarray(params.grid.shape[1:], jnp.float32)
    ax = [jnp.linspace(0.0, d - 1.0, n)
          for d, n in zip(dims, (X, Y, Z))]
    u = jnp.stack(jnp.meshgrid(*ax, indexing="ij"), axis=-1)  # [X,Y,Z,3]
    new = jnp.moveaxis(_trilinear(params.grid, u), -1, 0)
    return params._replace(grid=new)


def isub(params: DenseGridParams, val) -> DenseGridParams:
    """`__isub__` (grid.py:52-55), functional."""
    return params._replace(grid=params.grid - val)
