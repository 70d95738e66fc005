"""render_process panel tests (scene_utils.py:14-269 parity layout)."""

import os

import numpy as np

from mobgs_tpu.train.debug_vis import (flow_to_color,
                                       normals_from_depth_screen,
                                       render_training_panels)
from tests.test_train_step import CFG, build_everything


def test_flow_to_color_properties():
    flow = np.zeros((8, 8, 2), np.float32)
    col = flow_to_color(flow)
    assert col.shape == (8, 8, 3)
    # zero flow → (near) white, the wheel's center
    assert np.all(col > 0.95)
    flow[:, :, 0] = 5.0
    col2 = flow_to_color(flow)
    assert np.all(col2 >= 0) and np.all(col2 <= 1)
    # pure +u and pure +v map to different hues
    flow_v = np.zeros((8, 8, 2), np.float32)
    flow_v[:, :, 1] = 5.0
    assert not np.allclose(flow_to_color(flow_v), col2, atol=0.1)


def test_normals_from_depth_plane():
    # fronto-parallel plane → normals point along -z (towards camera)
    K = np.asarray([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    n = normals_from_depth_screen(np.full((48, 64), 3.0, np.float32), K)
    assert n.shape == (48, 64, 3)
    assert np.all(np.abs(np.abs(n[..., 2]) - 1.0) < 0.1)


def test_render_training_panels_layout(tmp_path):
    ts, data, opt, blce_cfg = build_everything(num_warp=3)
    out = render_training_panels(ts, data, 300, str(tmp_path), view=0,
                                 num_warp=3, with_latents=True,
                                 raster_cfg=CFG)
    files = sorted(os.listdir(out))
    name = "view000_it000300"
    for expect in ([f"{name}.png", f"{name}_decomp.png"]
                   + [f"{name}_latent_{e:02d}.png" for e in range(3)]
                   + [f"{name}_flow_{e:02d}.png" for e in range(3)]):
        assert expect in files, f"missing {expect} in {files}"


def test_render_training_panels_no_latents(tmp_path):
    ts, data, opt, blce_cfg = build_everything(num_warp=3)
    out = render_training_panels(ts, data, 1, str(tmp_path), view=1,
                                 num_warp=3, with_latents=False,
                                 raster_cfg=CFG)
    files = os.listdir(out)
    assert "view001_it000001.png" in files
    assert not any("latent" in f for f in files)
