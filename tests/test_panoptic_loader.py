"""PanopticSports loader test (dataset_readers.py:648-714 semantics)."""

import json
import os

import numpy as np

from mobgs_tpu.data.scene import load_scene
from mobgs_tpu.data.stereo import sniff_dataset_type


def _write_fixture(root, n_frames=3, n_cams=2, w=32, h=24):
    from PIL import Image
    os.makedirs(os.path.join(root, "ims"), exist_ok=True)
    rng = np.random.default_rng(0)
    K = [[50.0, 0.0, w / 2], [0.0, 50.0, h / 2], [0.0, 0.0, 1.0]]

    def w2c_for(ci):
        m = np.eye(4)
        m[0, 3] = 0.5 * ci
        return m.tolist()

    meta = {"w": w, "h": h, "k": [], "w2c": [], "fn": [], "cam_id": []}
    for f in range(n_frames):
        meta["k"].append([K] * n_cams)
        meta["w2c"].append([w2c_for(c) for c in range(n_cams)])
        fns, cids = [], []
        for c in range(n_cams):
            fn = f"{c}/{f:06d}.jpg"
            os.makedirs(os.path.join(root, "ims", str(c)), exist_ok=True)
            img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(root, "ims", fn))
            fns.append(fn)
            cids.append(c)
        meta["fn"].append(fns)
        meta["cam_id"].append(cids)
    with open(os.path.join(root, "train_meta.json"), "w") as fh:
        json.dump(meta, fh)
    pts = np.concatenate([rng.normal(size=(50, 3)),
                          rng.uniform(size=(50, 3)),
                          np.ones((50, 1))], axis=1).astype(np.float32)
    np.savez(os.path.join(root, "init_pt_cld.npz"), data=pts)


def test_sniff_and_load_panoptic(tmp_path):
    root = str(tmp_path / "basketball")
    _write_fixture(root)
    assert sniff_dataset_type(root) == "panoptic"
    data = load_scene(root)
    # 3 frames x 2 cams -> 6 view rows
    assert data.images.shape == (6, 24, 32, 3)
    assert data.w2c.shape == (6, 4, 4)
    assert data.K.shape == (6, 3, 3)
    # time = frame / n_frames, repeated per camera
    np.testing.assert_allclose(data.time,
                               np.repeat([0, 1 / 3, 2 / 3], 2), atol=1e-6)
    assert data.points_xyz.shape == (50, 3)
    assert data.points_rgb.shape == (50, 3)
    # no test_meta.json -> test split falls back to train
    assert data.test_images.shape == data.images.shape


def test_max_views_per_frame(tmp_path):
    root = str(tmp_path / "pan")
    _write_fixture(root, n_frames=2, n_cams=3)
    data = load_scene(root, max_views_per_frame=1)
    assert data.images.shape[0] == 2
