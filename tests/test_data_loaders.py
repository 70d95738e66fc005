"""Dataset loader tests on fabricated on-disk fixtures."""

import json
import os

import numpy as np


def make_stereo_fixture(root, V=4, H=288, W=512):
    """Fabricate a minimal DyBluRF-stereo scene directory."""
    from PIL import Image
    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/images_512x288", exist_ok=True)
    os.makedirs(f"{root}/inference_images", exist_ok=True)
    os.makedirs(f"{root}/align_uni_depth_noclip", exist_ok=True)
    os.makedirs(f"{root}/motion_masks_manual", exist_ok=True)
    os.makedirs(f"{root}/bootstapir", exist_ok=True)

    # LLFF poses_bounds: [2V, 17]
    poses = np.zeros((2 * V, 3, 5))
    for i in range(2 * V):
        # c2w in LLFF convention ([down right back] ordering quirk handled
        # by the loader's permutation)
        poses[i, :, :3] = np.eye(3)
        poses[i, :, 3] = [0.1 * i, 0, 0.5]
        poses[i, :, 4] = [720, 1280, 800.0]  # h, w, focal at original res
    arr = np.concatenate([poses.reshape(2 * V, 15),
                          np.tile([[1.0, 10.0]], (2 * V, 1))], axis=1)
    np.save(f"{root}/poses_bounds.npy", arr)
    json.dump({"center": [0.0, 0.0, 0.0]}, open(f"{root}/scene.json", "w"))

    P = 16
    for i in range(V):
        img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(f"{root}/images_512x288/{i:05d}.png")
        Image.fromarray(img).save(f"{root}/inference_images/{i:05d}.png")
        np.save(f"{root}/align_uni_depth_noclip/{i:05d}.npy",
                rng.uniform(2, 5, (H, W)).astype(np.float32))
        mask = (rng.uniform(size=(H, W)) > 0.8).astype(np.uint8) * 255
        Image.fromarray(mask).save(f"{root}/motion_masks_manual/{i:05d}.png")
        for j in range(V):
            tracks = np.concatenate([
                rng.uniform(0, W, (P, 1)), rng.uniform(0, H, (P, 1)),
                rng.normal(size=(P, 1)), rng.normal(size=(P, 1))], axis=1)
            np.save(f"{root}/bootstapir/{i:05d}_{j:05d}.npy",
                    tracks.astype(np.float32))


def test_stereo_loader(tmp_path):
    from mobgs_tpu.data.stereo import load_stereo_scene, sniff_dataset_type
    root = str(tmp_path / "scene")
    V = 4
    make_stereo_fixture(root, V=V)
    assert sniff_dataset_type(root) == "nvidia"
    scene = load_stereo_scene(root)
    d = scene.data
    assert d.images.shape == (V, 288, 512, 3)
    assert d.depths.shape == (V, 288, 512)
    assert d.w2c.shape == (V, 4, 4)
    assert d.test_w2c.shape == (V, 4, 4)
    assert abs(float(d.time[-1]) - 1.0) < 1e-6
    assert d.max_time == V - 1
    # focal rescaled 720 -> 288
    assert abs(d.K[0, 0, 0] - 800.0 / 2.5) < 1e-3
    # depth normalized by global mean -> overall mean ~ 1
    assert abs(d.depths.mean() - 1.0) < 0.1
    # tracklet concatenated over V query frames x 16 points
    assert scene.tracklet.shape == (V, V * 16, 2)
    # poses are valid rigid transforms
    Rb = d.w2c[:, :3, :3]
    eye = np.einsum("nij,nik->njk", Rb, Rb)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (V, 1, 1)), atol=1e-5)
    assert np.isfinite(d.blur_feats).all()


def test_blender_loader(tmp_path):
    from PIL import Image
    from mobgs_tpu.data.scene import load_scene
    root = str(tmp_path / "blender")
    os.makedirs(f"{root}/train", exist_ok=True)
    rng = np.random.default_rng(1)
    frames = []
    for i in range(3):
        img = (rng.uniform(size=(32, 40, 4)) * 255).astype(np.uint8)
        Image.fromarray(img).save(f"{root}/train/r_{i}.png")
        c2w = np.eye(4); c2w[0, 3] = i * 0.1
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    json.dump({"camera_angle_x": 0.7, "frames": frames},
              open(f"{root}/transforms_train.json", "w"))
    data = load_scene(root)
    assert data.images.shape == (3, 32, 40, 3)
    assert data.w2c.shape == (3, 4, 4)


def test_colmap_binary_round_trip(tmp_path):
    import struct
    from mobgs_tpu.data import colmap
    # fabricate a points3D.bin with 2 points
    p = tmp_path / "points3D.bin"
    with open(p, "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", i, 2.0 * i, 3.0 * i))
            f.write(struct.pack("<BBB", 255, 128, 0))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 0, 0))
    xyz, rgb, err = colmap.read_points3d_binary(str(p))
    np.testing.assert_allclose(xyz[1], [1, 2, 3])
    np.testing.assert_allclose(rgb[0], [1.0, 128 / 255, 0])

    # cameras.bin with one PINHOLE camera
    c = tmp_path / "cameras.bin"
    with open(c, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<dddd", 500.0, 510.0, 320.0, 240.0))
    cams = colmap.read_cameras_binary(str(c))
    assert cams[1].model == "PINHOLE" and cams[1].width == 640

    # images.bin with one image
    im = tmp_path / "images.bin"
    with open(im, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 1))
        f.write(struct.pack("<dddd", 1.0, 0, 0, 0))
        f.write(struct.pack("<ddd", 0.1, 0.2, 0.3))
        f.write(struct.pack("<i", 1))
        f.write(b"frame.png\x00")
        f.write(struct.pack("<Q", 0))
    imgs = colmap.read_images_binary(str(im))
    assert imgs[1].name == "frame.png"
    np.testing.assert_allclose(colmap.qvec_to_rotmat(imgs[1].qvec), np.eye(3))


def test_dynerf_loader(tmp_path):
    from PIL import Image
    from mobgs_tpu.data.scene import load_scene
    root = str(tmp_path / "dynerf")
    rng = np.random.default_rng(2)
    n_cams, T, H, W = 3, 4, 36, 48
    poses = np.zeros((n_cams, 3, 5))
    for i in range(n_cams):
        poses[i, :, :3] = np.eye(3)
        poses[i, :, 3] = [0.2 * i, 0, 1.0]
        poses[i, :, 4] = [2 * H, 2 * W, 100.0]
    arr = np.concatenate([poses.reshape(n_cams, 15),
                          np.tile([[1.0, 10.0]], (n_cams, 1))], 1)
    os.makedirs(root, exist_ok=True)
    np.save(f"{root}/poses_bounds.npy", arr)
    for c in range(n_cams):
        d = f"{root}/cam{c:02d}/images"
        os.makedirs(d, exist_ok=True)
        for t in range(T):
            img = (rng.uniform(size=(2 * H, 2 * W, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(f"{d}/{t:04d}.png")
    data = load_scene(root, downscale=2, max_frames=T)
    # cam 0 held out: 2 train cams x T frames
    assert data.images.shape == (2 * T, H, W, 3)
    assert data.test_images.shape == (T, H, W, 3)
    assert data.K[0, 0, 0] == 50.0  # focal / downscale
    assert np.isfinite(data.w2c).all()


def test_colmap_scene_loader(tmp_path):
    """load_scene on a COLMAP dir returns a trainable SceneData
    (registry branch, reference dataset_readers.py:261-310,2089)."""
    import struct
    from PIL import Image
    from mobgs_tpu.data.scene import load_scene

    root = tmp_path / "colmap_scene"
    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    (root / "images").mkdir()

    W, H = 40, 30
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, W, H))
        f.write(struct.pack("<dddd", 35.0, 36.0, W / 2, H / 2))

    n_views = 10
    rng = np.random.default_rng(0)
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_views))
        for i in range(n_views):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", 1.0, 0, 0, 0))
            f.write(struct.pack("<ddd", 0.1 * i, 0, 2.0))
            f.write(struct.pack("<i", 1))
            f.write(f"im_{i:03d}.png\x00".encode())
            f.write(struct.pack("<Q", 0))
            Image.fromarray(
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8).astype(
                    np.uint8)).save(root / "images" / f"im_{i:03d}.png")

    n_pts = 5
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", i * 0.1, 0.2, 3.0))
            f.write(struct.pack("<BBB", 10, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))

    data = load_scene(str(root))  # sniffed as "colmap" via sparse/
    # llffhold=8 split: views 0 and 8 held out
    assert data.images.shape == (8, H, W, 3)
    assert data.test_images.shape == (2, H, W, 3)
    assert data.points_xyz.shape == (n_pts, 3)
    assert data.points_rgb.shape == (n_pts, 3)
    assert data.K[0, 0, 0] == 35.0 and data.K[0, 1, 1] == 36.0
    assert np.isfinite(data.blur_feats).all()


def make_nvidia_mono_fixture(root, V=3, H=96, W=128):
    """Fabricate a minimal Nvidia MONOCULAR scene directory
    (dataset_readers.py:1621-1974 layout: images_2/, gt/, per-frame
    flow npz, 3-digit frame names)."""
    from PIL import Image
    rng = np.random.default_rng(1)
    for d in ("images_2", "gt", "flow", "align_uni_depth_noclip",
              "instance_mask_manual/000"):
        os.makedirs(f"{root}/{d}", exist_ok=True)

    poses = np.zeros((V, 3, 5))
    for i in range(V):
        poses[i, :, :3] = np.eye(3)
        poses[i, :, 3] = [0.1 * i, 0, 0.5]
        # h, w, focal at the ORIGINAL resolution (loader divides by 2)
        poses[i, :, 4] = [2 * H, 2 * W, 300.0]
    arr = np.concatenate([poses.reshape(V, 15),
                          np.tile([[1.0, 10.0]], (V, 1))], axis=1)
    np.save(f"{root}/poses_bounds.npy", arr)
    json.dump({"center": [0.0, 0.0, 0.1]}, open(f"{root}/scene.json", "w"))

    for i in range(V):
        img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(f"{root}/images_2/{i:03d}.png")
        Image.fromarray(img).save(f"{root}/gt/v000_t{i:03d}.png")
        np.save(f"{root}/align_uni_depth_noclip/{i:03d}.npy",
                rng.uniform(2.0, 4.0, (H, W)).astype(np.float32))
        flow = rng.normal(size=(H, W, 2)).astype(np.float32)
        mask = (rng.uniform(size=(H, W)) > 0.5)
        np.savez(f"{root}/flow/{i:03d}_fwd.npz", flow=flow, mask=mask)
        np.savez(f"{root}/flow/{i:03d}_bwd.npz", flow=flow, mask=mask)
    m = np.zeros((H, W), np.uint8)
    m[10:30, 20:50] = 255
    Image.fromarray(m).save(f"{root}/instance_mask_manual/000/0.png")
    np.save(f"{root}/forward_tracks_dynamic.npy",
            rng.uniform(size=(V, 17, 2)).astype(np.float32))
    return V, H, W


def test_nvidia_mono_loader(tmp_path):
    from mobgs_tpu.data.nvidia import load_nvidia_mono_scene
    from mobgs_tpu.data.scene import load_scene, sniff_dataset_type

    V, H, W = make_nvidia_mono_fixture(tmp_path)
    scene = load_nvidia_mono_scene(str(tmp_path))
    d = scene.data
    assert d.images.shape == (V, H, W, 3)
    assert d.w2c.shape == (V, 4, 4)
    assert d.test_images.shape == (V, H, W, 3)
    # fixed-viewpoint test split: every test pose is camera 0's
    np.testing.assert_allclose(d.test_w2c[1], d.test_w2c[0])
    np.testing.assert_allclose(np.asarray(d.test_time), np.arange(V))
    # mean-depth normalization scales translations AND depths
    assert 0.1 < float(d.depths.mean()) < 10.0
    # endpoint frames zero the missing flow direction (:1716-1724)
    assert float(np.abs(scene.bwd_flow[0]).max()) == 0.0
    assert float(np.abs(scene.fwd_flow[V - 1]).max()) == 0.0
    assert float(np.abs(scene.fwd_flow[1]).max()) > 0.0
    # instance masks union into the motion mask
    assert float(d.masks[0].max()) == 1.0 and float(d.masks[0].min()) == 0.0
    assert scene.tracklet.shape == (V, 17, 2)
    assert np.isfinite(scene.normals).all()

    # registry dispatch: poses_bounds.npy sniffs as "nvidia", and the
    # images_2/ marker routes to the monocular reader
    assert sniff_dataset_type(str(tmp_path)) == "nvidia"
    d2 = load_scene(str(tmp_path))
    assert d2.images.shape == (V, H, W, 3)
