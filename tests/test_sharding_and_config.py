"""Multi-chip sharding (8-device CPU mesh) + config overlay tests."""

import numpy as np
import jax


def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (48, 64, 3)
    assert np.isfinite(np.asarray(out[0])).all()


def test_shard_specs_are_name_based():
    """A BLCE [V, ...] leaf with V == Gaussian capacity must stay
    replicated (regression: shape-coincidence sharding)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import jax.numpy as jnp
    import pytest
    import __graft_entry__ as ge
    from jax.sharding import PartitionSpec as P
    from mobgs_tpu.parallel import mesh as Mx
    from mobgs_tpu.train.step import init_train_state

    mesh = Mx.make_mesh(n_data=2, n_gauss=4)
    cap = 32  # make BLCE num_views == capacity to provoke the old bug
    stat, dyn, sandwich, blce, _, _ = ge._build_tiny(
        num_views=cap, cap_s=cap, cap_d=cap)
    ts = init_train_state(stat, dyn, sandwich, blce)
    assert ts.blce.exposure_expo.shape[0] == cap == ts.stat.capacity

    specs = Mx.shard_train_state_specs(ts, mesh)
    # every BLCE leaf replicated, even [V,...] with V == capacity
    for s in jax.tree.leaves(specs.blce,
                             is_leaf=lambda x: hasattr(x, "spec")):
        assert s.spec == P()
    for s in jax.tree.leaves(specs.blce_opt,
                             is_leaf=lambda x: hasattr(x, "spec")):
        assert s.spec == P()
    # Gaussian capacity-axis leaves shard on gauss; scalar opt step doesn't
    assert specs.stat.xyz.spec == P("gauss")
    assert specs.dyn_opt.mu.xyz.spec == P("gauss")
    assert specs.stat_opt.step.spec == P()
    assert specs.stat_stats.denom.spec == P("gauss")

    # make_mesh validates device count with a real message
    with pytest.raises(ValueError, match="make_mesh needs 16 devices"):
        Mx.make_mesh(n_data=4, n_gauss=4)


def test_config_overlay_semantics():
    from mobgs_tpu.config import Config, load_scene_config, merge_overlay
    cfg = load_scene_config("/root/repo/configs/stereo/seesaw.py")
    assert cfg.opt.iterations == 10000          # from _base_
    assert cfg.opt.batch_size == 2
    assert cfg.opt.stat_npts == 20000           # scene overlay
    assert cfg.opt.lambda_flow_loss == 0
    assert cfg.hidden.kplanes_config["output_coordinate_dim"] == 32
    # unknown keys are silently dropped (reference merge_hparams parity)
    c2 = merge_overlay(Config(), {"OptimizationParams": {"densify": 3,
                                                         "batch_size": 7}})
    assert not hasattr(c2.opt, "densify")
    assert c2.opt.batch_size == 7
