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
