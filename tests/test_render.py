"""Scene renderer tests: composition semantics, spline motion, BLCE."""

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.data.cameras import Camera, cam_rays
from mobgs_tpu.models import blce as B
from mobgs_tpu.models import gaussians as G
from mobgs_tpu.models import render as R
from mobgs_tpu.models.sandwich import apply_sandwich, init_sandwich
from mobgs_tpu.ops.rasterize import RasterConfig

CFG = RasterConfig(tile_chunk=4, max_per_tile=128)
W, H = 64, 48


def make_states(ns=50, nd=30, cap_s=64, cap_d=48, seed=0):
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    def cloud(n):
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        pts[:, 2] += 6.0
        cols = rng.uniform(size=(n, 3)).astype(np.float32)
        times = np.zeros((n,), np.float32)
        return jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(times)

    sp, sc, st = cloud(ns)
    stat = G.create_state(sp, sc, st, cap_s, rng=key)

    dp, dc, dtm = cloud(nd)
    T = 8
    times = jnp.linspace(0, 1, T)
    # linear trajectories
    vel = jnp.asarray(rng.normal(size=(nd, 3)).astype(np.float32) * 0.3)
    traj = dp[:, None, :] + vel[:, None, :] * times[None, :, None]
    dyn = G.create_state(dp, dc, dtm, cap_d, trajectory=traj, traj_times=times)
    return stat, dyn


def make_cam(t=0.5):
    K = jnp.asarray([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], jnp.float32)
    return Camera(w2c=jnp.eye(4), K=K, time=jnp.asarray(t, jnp.float32))


def test_spline_positions_follow_trajectory():
    stat, dyn = make_states()
    # positions_at at fitted times should reproduce trajectory closely
    p0 = G.positions_at(dyn, 0.0)[:30]
    p1 = G.positions_at(dyn, 1.0)[:30]
    assert float(jnp.abs(p1 - p0).mean()) > 0.01  # it moves
    # t=0 should be near the initial points
    np.testing.assert_allclose(np.asarray(p0), np.asarray(dyn.xyz[:30]),
                               atol=0.05)


def test_render_view_outputs():
    stat, dyn = make_states()
    sandwich = init_sandwich(jax.random.PRNGKey(1))
    cam = make_cam()
    out = R.render_view(stat, dyn, sandwich, cam, W, H,
                        jnp.zeros(3), get_static=True, get_dynamic=True,
                        config=CFG)
    assert out.image.shape == (H, W, 3)
    assert out.d_alpha.shape == (H, W)
    assert np.isfinite(np.asarray(out.image)).all()
    assert 0 <= float(out.image.min()) and float(out.image.max()) <= 1
    # combined alpha >= each subset alpha (monotone compositing)
    assert float((out.alpha - out.d_alpha).min()) > -1e-5
    assert float((out.alpha - out.s_alpha).min()) > -1e-5


def test_dead_slots_invisible():
    stat, dyn = make_states()
    sandwich = init_sandwich(jax.random.PRNGKey(1))
    cam = make_cam()
    out1 = R.render_view(stat, dyn, sandwich, cam, W, H, jnp.zeros(3), config=CFG)
    # corrupt dead-slot params wildly; render must not change
    dead = ~stat.live
    stat2 = stat._replace(
        xyz=jnp.where(dead[:, None], 100.0, stat.xyz),
        opacity=jnp.where(dead[:, None], 10.0, stat.opacity))
    out2 = R.render_view(stat2, dyn, sandwich, cam, W, H, jnp.zeros(3), config=CFG)
    np.testing.assert_allclose(np.asarray(out1.image), np.asarray(out2.image),
                               atol=1e-6)


def test_get_flow_shapes_and_zero_delta():
    stat, dyn = make_states()
    sandwich = init_sandwich(jax.random.PRNGKey(1))
    cam = make_cam()
    e2m, m2e, latent_img, latent_alpha = R.get_flow(
        stat, dyn, sandwich, cam, W, H, jnp.zeros(3), delta_exposure=0.0,
        config=CFG)
    assert e2m.shape == (H, W, 2) and latent_img.shape == (H, W, 3)
    # zero exposure delta -> flow displacement ~ 0 where alpha saturates
    from mobgs_tpu.data.cameras import pixel_grid
    pix = pixel_grid(W, H)
    disp = np.asarray(e2m - pix)
    assert np.abs(disp).max() < 1e-3


def test_get_flow_static_camera_motion():
    stat, dyn = make_states()
    cam = make_cam()
    cam2 = cam._replace(w2c=cam.w2c.at[0, 3].add(0.2))  # shifted camera
    flow2d, rendered = R.get_flow_static(stat, cam, cam2, cam, W, H, config=CFG)
    assert rendered.shape == (H, W, 2)
    live = np.asarray(stat.live)
    assert np.abs(np.asarray(flow2d)[live]).max() > 0.1  # parallax exists


def test_blce_latent_poses():
    state = B.init_blce(jax.random.PRNGKey(0), num_views=4, num_warp=9)
    c2w = jnp.eye(4)
    bf = jnp.asarray(0.5)
    poses, expo = B.latent_poses(state, c2w, bf, jnp.int32(2))
    assert poses.shape == (9, 4, 4)
    assert expo.shape == (9,)
    # tiny-gain decoders -> poses start near identity
    d = np.asarray(poses) - np.eye(4)
    assert np.abs(d).max() < 1e-2
    np.testing.assert_allclose(np.asarray(expo),
                               np.linspace(-1, 1, 9) * 0.4, atol=1e-6)
    # rotations stay orthonormal
    Rm = np.asarray(poses)[:, :3, :3]
    np.testing.assert_allclose(np.einsum("tij,tik->tjk", Rm, Rm),
                               np.tile(np.eye(3), (9, 1, 1)), atol=1e-4)


def test_blur_feature_sharp_vs_blurry():
    rng = np.random.default_rng(0)
    sharp = jnp.asarray(rng.uniform(size=(3, 64, 64)), jnp.float32)
    # blur = heavy smoothing
    k = jnp.ones((9, 9)) / 81.0
    blurred = jax.vmap(lambda c: jax.scipy.signal.convolve2d(c, k, mode="same"))(sharp)
    bf_sharp = float(B.blur_feature(sharp))
    bf_blur = float(B.blur_feature(blurred))
    assert bf_blur > bf_sharp  # blurrier -> more low-frequency energy


def test_sandwich_decoder():
    params = init_sandwich(jax.random.PRNGKey(0))
    feat = jnp.zeros((H, W, 9))
    rays = cam_rays(make_cam(), W, H)
    out = apply_sandwich(params, feat, rays)
    assert out.shape == (H, W, 3)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_align_test_poses_identity_at_init():
    # with tiny-init BLCE the mid latent pose ~= the input pose, so the
    # aligned test pose must ~= the original test pose
    from mobgs_tpu.eval.align import align_test_poses
    state = B.init_blce(jax.random.PRNGKey(0), num_views=3, num_warp=9)
    rng = np.random.default_rng(0)
    def rand_w2c(k):
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        from mobgs_tpu.core import se3
        R = np.asarray(se3.quat_to_rotmat(jnp.asarray(q, jnp.float32)))
        w = np.eye(4, dtype=np.float32); w[:3,:3] = R; w[:3,3] = rng.normal(size=3)
        return w
    train = jnp.asarray(np.stack([rand_w2c(i) for i in range(3)]))
    test = jnp.asarray(np.stack([rand_w2c(i+3) for i in range(3)]))
    bf = jnp.full((3,), 0.5)
    aligned = align_test_poses(state, train, test, bf, num_warp=9)
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(test),
                               atol=5e-3)


def test_assemble_exposure_time_semantics():
    """Parity with renderer :93-125: with delta_exposure, rotations and
    features use Δt = (t + Δe/max_time) - trbf_center, spline time is
    clipped to [0,1]."""
    stat, dyn = make_states(seed=5)
    rng = np.random.default_rng(5)
    dyn = dyn._replace(
        omega=jnp.asarray(rng.normal(size=dyn.omega.shape).astype(np.float32)),
        features_t=jnp.asarray(rng.normal(size=dyn.features_t.shape).astype(np.float32)),
        trbf_center=jnp.asarray(rng.uniform(size=dyn.trbf_center.shape).astype(np.float32)))
    t, delta, max_time = 0.9, 4.0, 10.0
    geom = R.assemble(stat, dyn, t, max_time=max_time, delta_exposure=delta)

    t_eff = t + delta / max_time          # 1.3, NOT clipped for features
    dt = t_eff - np.asarray(dyn.trbf_center)
    Ms = stat.capacity
    # features: [dc || dt * f_t]
    want_feat = np.concatenate([np.asarray(dyn.features_dc),
                                dt * np.asarray(dyn.features_t)], axis=1)
    np.testing.assert_allclose(np.asarray(geom.colors[Ms:]), want_feat,
                               rtol=1e-5, atol=1e-6)
    # rotations: normalize(q + dt * omega)
    q = np.asarray(dyn.rotation) + dt * np.asarray(dyn.omega)
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(np.asarray(geom.quats[Ms:]), q, atol=1e-5)
    # spline evaluated at clip(t_eff, 0, 1) = 1.0
    want_pos = np.asarray(G.positions_at(dyn, 1.0))
    np.testing.assert_allclose(np.asarray(geom.means[Ms:]), want_pos,
                               atol=1e-6)
