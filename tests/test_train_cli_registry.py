"""Train CLI over registry dataset families (non-stereo real data).

The reference `train.py` trains any sniffed dataset type; here the CLI
dispatches non-stereo paths through `SCENE_LOAD_CALLBACKS` and seeds
from the SfM cloud (or depth unprojection). Smoke-trains a tiny
PanopticSports fixture end to end.
"""

import os

import numpy as np

from mobgs_tpu.cli.train import main as train_main
from tests.test_panoptic_loader import _write_fixture


def test_train_cli_on_panoptic_fixture(tmp_path):
    root = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    _write_fixture(root, n_frames=3, n_cams=2, w=32, h=24)
    train_main(["-s", root, "-m", out, "--iterations", "3",
                "--test_iterations", "0", "--num_warp", "3",
                "--quiet"])
    ck = os.path.join(out, "point_cloud", "iteration_3")
    assert os.path.exists(os.path.join(ck, "point_cloud.ply"))
    assert os.path.exists(os.path.join(ck, "point_cloud_static.ply"))
    assert os.path.exists(os.path.join(ck, "train_state.npz"))


def test_seed_from_depths_shapes():
    from mobgs_tpu.data import synthetic
    from mobgs_tpu.train.warm import seed_from_depths
    data, _ = synthetic.generate(width=32, height=24, num_frames=3)
    pts, cols = seed_from_depths(data, 120, np.random.default_rng(0))
    assert pts.shape[1] == 3 and cols.shape == pts.shape
    assert len(pts) >= 117  # 3 views x 40
    assert np.isfinite(pts).all()
