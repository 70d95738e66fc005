"""Full-state checkpoint round-trip + native PLY codec tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.io import checkpoint as C
from mobgs_tpu.models import blce as B
from mobgs_tpu.models import gaussians as G
from mobgs_tpu.models.sandwich import init_sandwich
from mobgs_tpu.train.step import init_train_state


def make_ts(seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(size=(20, 3)).astype(np.float32))
    stat = G.create_state(pts, cols, jnp.zeros(20), 32,
                          rng=jax.random.PRNGKey(0))
    dyn = G.create_state(pts, cols, jnp.zeros(20), 32,
                         rng=jax.random.PRNGKey(1))
    return init_train_state(stat, dyn, init_sandwich(jax.random.PRNGKey(2)),
                            B.init_blce(jax.random.PRNGKey(3), 4, num_warp=3))


def test_train_state_round_trip(tmp_path):
    ts = make_ts(0)
    ts = ts._replace(step=jnp.asarray(123, jnp.int32))
    p = os.path.join(tmp_path, "state.npz")
    C.save_train_state(p, ts)
    ts2 = C.load_train_state(p, make_ts(1))  # different template values
    flat1 = jax.tree.leaves(ts)
    flat2 = jax.tree.leaves(ts2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ts2.step) == 123


def test_checkpoint_shape_mismatch_raises(tmp_path):
    ts = make_ts(0)
    p = os.path.join(tmp_path, "state.npz")
    C.save_train_state(p, ts)
    import pytest
    bad = jax.tree.map(lambda x: x, ts)._replace(
        sandwich=ts.sandwich._replace(w1=jnp.zeros((13, 6))))
    with pytest.raises(ValueError):
        C.load_train_state(p, bad)


def test_native_ply_matches_python_codec(tmp_path):
    from mobgs_tpu.io import native, ply
    rng = np.random.default_rng(0)
    names = [f"col_{i}" for i in range(7)]
    data = rng.normal(size=(50, 7)).astype(np.float32)
    cols = {nm: data[:, i] for i, nm in enumerate(names)}
    p1 = os.path.join(tmp_path, "a.ply")
    ply.write_ply(p1, cols)  # native if available
    back = ply.read_ply(p1)
    for i, nm in enumerate(names):
        np.testing.assert_allclose(back[nm], data[:, i])
    if native.load_library() is not None:
        # cross-check: python reader parses native writer output w/o lib
        import mobgs_tpu.io.native as nat
        saved = nat._LIB
        try:
            nat._LIB = None
            back2 = ply.read_ply(p1)
        finally:
            nat._LIB = saved
        for i, nm in enumerate(names):
            np.testing.assert_allclose(back2[nm], data[:, i])
