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
    dev = np.asarray(devices[: n_data * n_gauss]).reshape(n_data, n_gauss)
    return Mesh(dev, ("data", "gauss"))


def gauss_sharding(mesh: Mesh):
    """Shard the leading per-Gaussian axis across ``gauss``."""
    return NamedSharding(mesh, P("gauss"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh):
    """Shard a leading batch axis across ``data``."""
    return NamedSharding(mesh, P("data"))


def shard_train_state_specs(ts, mesh: Mesh):
    """Sharding tree for a TrainState: per-Gaussian leaves on ``gauss``,
    everything else replicated."""
    caps = {ts.stat.capacity, ts.dyn.capacity}

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] in caps:
            return gauss_sharding(mesh)
        return replicated(mesh)

    return jax.tree.map(spec, ts)


def shard_batch_specs(batch, mesh: Mesh):
    return jax.tree.map(lambda _: data_sharding(mesh), batch)
