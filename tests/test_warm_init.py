"""Warm-stage geometric initialization tests on a synthetic scene."""

import numpy as np
import jax.numpy as jnp

from mobgs_tpu.data import synthetic
from mobgs_tpu.ops.rasterize import RasterConfig
from mobgs_tpu.train import warm

CFG = RasterConfig(tile_chunk=6, max_per_tile=256)


def test_unproject_round_trip():
    # unproject then reproject must give back pixel centres
    H, W = 24, 32
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[0, 3] = 0.3
    depth = np.full((H, W), 4.0, np.float32)
    pts = np.asarray(warm.unproject_depth(jnp.asarray(depth),
                                          jnp.asarray(w2c), jnp.asarray(K)))
    cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    u = K[0, 0] * cam[..., 0] / cam[..., 2] + K[0, 2]
    v = K[1, 1] * cam[..., 1] / cam[..., 2] + K[1, 2]
    ys, xs = np.mgrid[0:H, 0:W]
    np.testing.assert_allclose(u, xs + 0.5, atol=1e-4)
    np.testing.assert_allclose(v, ys + 0.5, atol=1e-4)
    np.testing.assert_allclose(cam[..., 2], 4.0, atol=1e-5)


def test_inverse_warp_identity():
    # warping a frame into itself must reproduce it (away from borders)
    rng = np.random.default_rng(0)
    H, W = 24, 32
    img = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(3, 5, (H, W)).astype(np.float32))
    K = jnp.asarray([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]])
    w2c = jnp.eye(4)
    warped, inb = warm.inverse_warp(img, depth, w2c, w2c, K)
    np.testing.assert_allclose(np.asarray(warped)[2:-2, 2:-2],
                               np.asarray(img)[2:-2, 2:-2], atol=1e-4)
    # borders reproject to u=W-0.5 > W-1 and are flagged out of bounds
    assert bool(np.asarray(inb)[1:-1, 1:-1].all())


def test_warm_init_separates_static_dynamic():
    data, traj = synthetic.generate(width=64, height=48, num_frames=5,
                                    n_static=300, n_dyn=100,
                                    blur_substeps=2, raster_cfg=CFG)
    # fabricate a frame-0-anchored tracklet from the GT trajectories:
    # project GT dynamic points into each frame
    V = 5
    T = traj.shape[1]
    track = np.zeros((T, traj.shape[0], 2), np.float32)
    for t in range(T):
        K = data.K[t]
        cam = traj[:, t] @ data.w2c[t][:3, :3].T + data.w2c[t][:3, 3]
        track[t, :, 0] = K[0, 0] * cam[:, 0] / cam[:, 2] + K[0, 2]
        track[t, :, 1] = K[1, 1] * cam[:, 1] / cam[:, 2] + K[1, 2]

    pc = warm.warm_init(data.images, data.depths, data.w2c, data.K,
                        data.time, (data.masks > 0.5).astype(np.float32),
                        track, stat_npts=500, dyn_npts=120)
    assert pc.stat_points.shape == (500, 3)
    assert pc.dyn_points.shape == (120, 3)
    assert pc.dyn_trajectory.shape == (120, T, 3)
    assert np.isfinite(pc.dyn_trajectory).all()
    # dynamic seeds should fall inside the motion mask region of frame 0
    K0 = data.K[0]
    cam = pc.dyn_points @ data.w2c[0][:3, :3].T + data.w2c[0][:3, 3]
    u = (K0[0, 0] * cam[:, 0] / cam[:, 2] + K0[0, 2]).astype(int)
    v = (K0[1, 1] * cam[:, 1] / cam[:, 2] + K0[1, 2]).astype(int)
    ok = (u >= 0) & (u < 64) & (v >= 0) & (v < 48)
    frac_in_mask = data.masks[0][v[ok], u[ok]].mean()
    assert frac_in_mask > 0.5
    # trajectories roughly follow the GT dynamic motion direction
    motion = pc.dyn_trajectory[:, -1] - pc.dyn_trajectory[:, 0]
    gt_motion = traj[:, -1] - traj[:, 0]
    assert np.dot(motion.mean(0), gt_motion.mean(0)) > 0
