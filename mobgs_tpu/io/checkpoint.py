"""Full training-state checkpointing (resume-capable).

The reference parses `--start_checkpoint` but never restores, and its
`GaussianModel.capture/restore` pair is dead code with a mismatched
tuple layout (SURVEY.md §5; reference gaussian_model.py:161-207).
This module actually round-trips the COMPLETE TrainState — parameters,
BLCE, Adam moments, densification stats, step counter — as a flat npz
keyed by pytree paths, giving preemption-safe resume.

The reference-schema PLY checkpoints (io/ply.py) remain the
interchange format; this is the fast internal format.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p.name) if hasattr(p, "name") else str(p.idx)
                       for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def peek_shape(path: str, key: str):
    """Shape of one leaf in a checkpoint, or None if absent — used to
    size a template's pools before load (mid-train pool growth means a
    checkpoint's capacities can exceed a fresh template's)."""
    with np.load(path) as data:
        if key not in data:
            return None
        return data[key].shape


def save_train_state(path: str, ts) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat, _ = _flatten_with_paths(ts)
    np.savez_compressed(path, **flat)


def load_train_state(path: str, template):
    """Load into the structure of ``template`` (same shapes required)."""
    data = np.load(path)
    flat, treedef = _flatten_with_paths(template)
    leaves = []
    missing = []
    for key, tmpl in flat.items():
        if key not in data:
            # forward compat: leaves added after the checkpoint was
            # written (e.g. the carried deformation net) keep their
            # template (freshly initialized) values
            missing.append(key)
            leaves.append(jnp.asarray(tmpl))
            continue
        arr = data[key]
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs "
                f"template {tmpl.shape}")
        leaves.append(jnp.asarray(arr.astype(tmpl.dtype, copy=False)))
    if missing:
        print(f"checkpoint {path}: {len(missing)} leaves not in file, "
              f"kept template values (first: {missing[0]})")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)
