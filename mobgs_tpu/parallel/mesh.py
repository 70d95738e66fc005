"""Device mesh + sharding rules for scale-out.

The reference is single-process single-GPU (SURVEY.md §2.2); this module
is the TPU-native communication layer that replaces "nothing" with
`jax.sharding` over ICI:

* axis ``gauss``: the Gaussian capacity axis M — parameters, Adam
  moments and densify stats shard here; projection is elementwise so it
  stays sharded, and XLA inserts the all-gather of the ~56-byte
  projected splat records before the (replicated) tile binning/sort.
* axis ``data``: the camera-batch axis — each device renders a subset
  of views; the loss psum happens automatically via sharding
  propagation in jit.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 1, n_gauss: int | None = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_gauss is None:
        n_gauss = len(devices) // n_data
    need = n_data * n_gauss
    if n_data < 1 or n_gauss < 1:
        raise ValueError(f"mesh axes must be positive, got "
                         f"data={n_data} gauss={n_gauss}")
    if len(devices) < need:
        raise ValueError(
            f"make_mesh needs {need} devices for a data={n_data} x "
            f"gauss={n_gauss} mesh but only {len(devices)} are available "
            f"({[d.platform for d in devices]}). For a virtual CPU mesh "
            f"set JAX_PLATFORMS=cpu and XLA_FLAGS="
            f"--xla_force_host_platform_device_count={need} before jax "
            f"initializes (see run_tests.sh).")
    dev = np.asarray(devices[:need]).reshape(n_data, n_gauss)
    return Mesh(dev, ("data", "gauss"))


def gauss_sharding(mesh: Mesh):
    """Shard the leading per-Gaussian axis across ``gauss``."""
    return NamedSharding(mesh, P("gauss"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh):
    """Shard a leading batch axis across ``data``."""
    return NamedSharding(mesh, P("data"))


# TrainState fields whose subtree holds per-Gaussian (capacity-axis)
# arrays. Sharding is decided by FIELD NAME, not by shape coincidence:
# a BLCE [V, ...] leaf with V == capacity must stay replicated.
GAUSS_FIELDS = ("stat", "dyn", "stat_opt", "dyn_opt",
                "stat_stats", "dyn_stats")


def shard_train_state_specs(ts, mesh: Mesh):
    """Sharding tree for a TrainState: leaves of the per-Gaussian
    subtrees (GaussianState / its Adam moments / densify stats) shard
    their leading capacity axis on ``gauss``; everything else —
    Sandwich/BLCE params, their optimizers, the step counter — is
    replicated."""
    gauss = gauss_sharding(mesh)
    rep = replicated(mesh)

    def gauss_leaf(x):
        # rank-0 leaves inside a gauss subtree (e.g. AdamState.step)
        # have no capacity axis to shard
        return gauss if getattr(x, "ndim", 0) >= 1 else rep

    parts = {}
    for f in ts._fields:
        sub = getattr(ts, f)
        if f in GAUSS_FIELDS:
            parts[f] = jax.tree.map(gauss_leaf, sub)
        else:
            parts[f] = jax.tree.map(lambda _: rep, sub)
    return type(ts)(**parts)


def shard_batch_specs(batch, mesh: Mesh):
    return jax.tree.map(lambda _: data_sharding(mesh), batch)


# ---------------------------------------------------------------------------
# Tile-axis compositing shard (round-3 VERDICT item 3).
#
# The Gaussian-axis (`gauss`) shard covers parameters/optimizer/densify
# state, but binning+compositing consume the ALL-GATHERED splat records,
# so without an explicit constraint every gauss rank redundantly
# composites every tile. Enabling tile sharding re-uses the `gauss` mesh
# axis for the TILE axis of the compositing stage: each rank composites
# tiles/n_gauss tiles, and XLA inserts (a) an all-gather of the final
# [H, W, C] image tiles and (b) an all-reduce of the backward's
# per-Gaussian gradient scatter — both riding ICI. The XLA compositor
# (ops/raster_jax.py) partitions this way automatically from the
# constraint; the Pallas kernel is a custom call GSPMD cannot split, so
# ops/pallas_raster.py wraps its core (custom VJP included) in an
# explicit `jax.shard_map` over the tile axis driven by the same
# setting (`tile_shard_info`) — each device runs the Mosaic kernel on
# its own tile rows. Both paths are validated on the virtual CPU mesh
# (the Pallas one in interpret mode) by the multichip dryrun.

_TILE_SHARD: tuple | None = None  # (Mesh, axis_name)


def enable_tile_sharding(mesh: Mesh, axis: str = "gauss") -> None:
    """Turn on tile-axis sharding constraints inside the compositor.
    Call before tracing (jit closes over the setting at trace time)."""
    global _TILE_SHARD
    _TILE_SHARD = (mesh, axis)


def disable_tile_sharding() -> None:
    global _TILE_SHARD
    _TILE_SHARD = None


def tile_shard_info(n_tiles: int):
    """(mesh, axis_name, n_shards) for the Pallas compositor's explicit
    tile-axis shard_map, or None when tile sharding is off / the tile
    count does not divide the axis. The Pallas kernel is an opaque
    custom call GSPMD cannot partition (unlike the XLA twin, which
    `constrain_tile_axis` covers), so `ops/pallas_raster.py` wraps its
    core in `jax.shard_map` using this setting."""
    if _TILE_SHARD is None:
        return None
    mesh, axis = _TILE_SHARD
    n = mesh.shape[axis]
    if n <= 1 or n_tiles % n:
        return None
    return mesh, axis, n


def constrain_tile_axis(x, dim: int):
    """Constrain array dim ``dim`` to the tile-shard axis (no-op when
    tile sharding is disabled). Safe to call inside jit."""
    if _TILE_SHARD is None:
        return x
    mesh, axis = _TILE_SHARD
    if x.shape[dim] % mesh.shape[axis]:
        return x  # unsplittable (tiny pads); let propagation decide
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
