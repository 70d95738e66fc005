"""iPhone/dycheck loader + camera model tests on a fabricated fixture."""

import json
import os

import numpy as np


def make_iphone_fixture(root, V=3, H=48, W=64):
    from PIL import Image
    rng = np.random.default_rng(0)
    for d in ["rgb/2x", "depth/2x", "camera", "splits"]:
        os.makedirs(f"{root}/{d}", exist_ok=True)
    json.dump({"scale": 0.5, "center": [0, 0, 0]},
              open(f"{root}/scene.json", "w"))
    json.dump({"time_ids": list(range(V)), "camera_ids": [0] * V,
               "frame_names": [f"0_{i:05d}" for i in range(V)]},
              open(f"{root}/splits/train.json", "w"))
    json.dump({"time_ids": list(range(V)), "camera_ids": [0] * V},
              open(f"{root}/splits/val.json", "w"))
    # also a dataset.json marker for sniffing
    json.dump({"count": V}, open(f"{root}/dataset.json", "w"))
    for i in range(V):
        name = f"0_{i:05d}"
        img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(f"{root}/rgb/2x/{name}.png")
        np.save(f"{root}/depth/2x/{name}.npy",
                rng.uniform(2, 4, (H, W)).astype(np.float32))
        # camera json at FULL resolution (2x rescale divides by 2)
        json.dump({
            "orientation": np.eye(3).tolist(),
            "position": [0.1 * i, 0.0, -1.0],
            "focal_length": 120.0,
            "principal_point": [W, H],  # full-res pp
            "image_size": [2 * W, 2 * H],
        }, open(f"{root}/camera/{name}.json", "w"))


def test_iphone_loader(tmp_path):
    from mobgs_tpu.data.scene import load_scene
    from mobgs_tpu.data.stereo import sniff_dataset_type
    root = str(tmp_path / "iphone")
    make_iphone_fixture(root)
    assert sniff_dataset_type(root) == "dycheck"
    data = load_scene(root)
    assert data.images.shape == (3, 48, 64, 3)
    assert data.K[0, 0, 0] == 60.0  # focal / 2
    assert data.K[0, 0, 2] == 32.0  # pp / 2
    assert abs(float(data.depths.mean()) - 1.0) < 0.05
    assert np.isfinite(data.w2c).all()


def test_dycheck_camera_model():
    from mobgs_tpu.data.dycheck_camera import DycheckCamera
    cam = DycheckCamera(
        orientation=np.eye(3, dtype=np.float32),
        position=np.array([1.0, 2.0, 3.0], np.float32),
        focal_length=100.0,
        principal_point=np.array([32.0, 24.0], np.float32),
        image_size=np.array([64, 48], np.float32))
    K = cam.intrin
    assert K[0, 0] == 100.0 and K[0, 2] == 32.0
    ext = cam.extrin
    np.testing.assert_allclose(ext[:3, 3], [-1, -2, -3], atol=1e-6)
    # centre pixel looks along +z
    ray = cam.pixels_to_rays(np.array([[32.0, 24.0]]))
    np.testing.assert_allclose(ray[0], [0, 0, 1], atol=1e-6)

    # distortion round trip: distort analytically, undistort numerically
    cam2 = DycheckCamera(
        orientation=np.eye(3, dtype=np.float32),
        position=np.zeros(3, np.float32), focal_length=100.0,
        principal_point=np.array([32.0, 24.0], np.float32),
        image_size=np.array([64, 48], np.float32),
        radial_distortion=np.array([0.1, 0.02, 0.0], np.float32),
        tangential_distortion=np.array([0.01, -0.005], np.float32))
    x = np.array([0.2, -0.1])
    r2 = (x ** 2).sum()
    k1, k2, _ = cam2.radial_distortion
    p1, p2 = cam2.tangential_distortion
    d = 1 + r2 * (k1 + r2 * k2)
    xd = x[0] * d + 2 * p1 * x[0] * x[1] + p2 * (r2 + 2 * x[0] ** 2)
    yd = x[1] * d + 2 * p2 * x[0] * x[1] + p1 * (r2 + 2 * x[1] ** 2)
    pix = np.array([[xd * 100 + 32, yd * 100 + 24]])
    undist = cam2.undistort_pixels(pix)
    np.testing.assert_allclose(undist[0], x, atol=1e-6)


def test_hypernerf_loader(tmp_path):
    from PIL import Image
    from mobgs_tpu.data.scene import load_scene
    root = str(tmp_path / "hyper")
    rng = np.random.default_rng(1)
    H, W = 40, 56  # at 2x downscale
    n = 8
    ids = [f"{i:06d}" for i in range(n)]
    os.makedirs(f"{root}/rgb/2x", exist_ok=True)
    os.makedirs(f"{root}/camera", exist_ok=True)
    json.dump({"near": 0.1, "far": 10, "scale": 1.0, "center": [0, 0, 0]},
              open(f"{root}/scene.json", "w"))
    json.dump({"ids": ids, "val_ids": [], "train_ids": []},
              open(f"{root}/dataset.json", "w"))
    json.dump({i: {"warp_id": k, "appearance_id": k, "camera_id": 0}
               for k, i in enumerate(ids)},
              open(f"{root}/metadata.json", "w"))
    for i in ids:
        img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(f"{root}/rgb/2x/{i}.png")
        json.dump({"orientation": np.eye(3).tolist(),
                   "position": [0, 0, -2.0], "focal_length": 100.0,
                   "principal_point": [W, H],
                   "image_size": [2 * W, 2 * H]},
                  open(f"{root}/camera/{i}.json", "w"))
    data = load_scene(root, ratio=0.5)
    # every-4th split: train = {0,4}, test = {2}
    assert data.images.shape[0] == 2
    assert data.test_images.shape[0] == 1
    assert data.images.shape[1:] == (H, W, 3)
    assert data.K[0, 0, 0] == 50.0
