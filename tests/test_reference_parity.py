"""Parity tests against the reference's OWN torch modules (CPU).

Round-3 VERDICT item 4: earlier parity tests compared against torch
re-implementations written inside the tests. These import the actual
`/root/reference` code via tests/reference_shim.py and assert numerical
equality, so a shared misreading can no longer hide:

* BLCE latent poses + exposure times   (scene/blce.py:374-424)
* cubic-Hermite spline forward          (scene/gaussian_model.py:373-404)
* spline inverse (least-squares fit)    (scene/gaussian_model.py:18-88)
* HexPlane multiscale interpolation     (scene/hexplane.py:75-168)
* ssim / masked l1 / entropy / sparsity (utils/loss_utils.py:233-382)
* flow-warp bilinear sampler vs torch grid_sample + the reference's
  coord normalization                   (train.py:659-676)

The weight transfer for BLCE rides io/torch_ckpt.blce_state_dict — so
these tests also pin the upstream-loadable checkpoint format end to end.
"""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import reference_shim as rs  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# BLCE


def test_blce_latent_poses_match_reference_module():
    from mobgs_tpu.io.torch_ckpt import blce_state_dict
    from mobgs_tpu.models import blce as B

    ref_blce_mod = rs.import_ref("scene.blce")
    V, E, D = 3, 9, 32
    state = B.init_blce(jax.random.PRNGKey(7), num_views=V, view_dim=D,
                        num_warp=E)
    # non-trivial exposure times
    state = state._replace(
        exposure_expo=jnp.asarray([0.4, 0.55, 0.3], jnp.float32))

    ref = ref_blce_mod.BLCE(num_views=V, view_dim=D, num_warp=E)
    missing, unexpected = ref.load_state_dict(
        {k: v for k, v in blce_state_dict(state).items()}, strict=True)
    assert not missing and not unexpected

    rng = np.random.default_rng(0)
    for view in range(V):
        # a random rigid c2w
        ang = rng.normal(3)
        c2w = np.eye(4, dtype=np.float32)
        th = 0.3 * view + 0.1
        c2w[:3, :3] = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
             [0, 0, 1]], np.float32)
        c2w[:3, 3] = rng.normal(size=3).astype(np.float32)
        bf = np.float32(0.2 + 0.1 * view)

        with torch.no_grad():
            rt_new, expo_t = ref(torch.from_numpy(c2w),
                                 torch.tensor(bf), view)
        ours_c2w, ours_expo = B.latent_poses(
            state, jnp.asarray(c2w), jnp.asarray(bf),
            jnp.asarray(view, jnp.int32), E)
        np.testing.assert_allclose(np.asarray(ours_c2w),
                                   rt_new.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ours_expo),
                                   expo_t.numpy(), rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# Spline engine


def test_spline_forward_matches_reference_module():
    from mobgs_tpu.core import spline

    gm = rs.import_ref("scene.gaussian_model")
    rng = np.random.default_rng(1)
    P, K = 64, 12
    control = rng.normal(size=(P, K, 3)).astype(np.float32)
    n = rng.integers(4, K + 1, size=P).astype(np.int64)
    t = rng.uniform(-0.05, 1.05, size=P).astype(np.float32)  # incl. clamp

    ours = spline.eval_spline(jnp.asarray(control), jnp.asarray(t),
                              jnp.asarray(n, jnp.int32))

    # reference signature: signal [B, 3, K], times [B, 3, 1], N [B, 1]
    # (current_control_num is carried as a column vector — the [:,None]
    # broadcasts inside :374-380 require it)
    signal = torch.from_numpy(control).permute(0, 2, 1)
    times = torch.from_numpy(t)[:, None, None].expand(P, 3, 1)
    with torch.no_grad():
        theirs = gm.GaussianModel.interpolate_cubic_hermite(
            None, signal, times, torch.from_numpy(n)[:, None])
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_spline_inverse_fit_matches_reference_module():
    from mobgs_tpu.core import spline

    gm = rs.import_ref("scene.gaussian_model")
    rng = np.random.default_rng(2)
    P, T, K = 16, 24, 12
    traj = rng.normal(size=(P, T, 3)).astype(np.float32)
    times = np.linspace(0, 1, T, dtype=np.float32)

    ours = spline.fit_spline_shared(jnp.asarray(traj), jnp.asarray(times),
                                    K, K)

    times_t = torch.from_numpy(times)[None, :, None].expand(P, T, 1)
    with torch.no_grad():
        theirs = gm.inverse_cubic_hermite(torch.from_numpy(traj),
                                          times_t, N_pts=K)
    np.testing.assert_allclose(np.asarray(ours)[:, :K],
                               theirs.numpy(), rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# HexPlane


def test_hexplane_query_matches_reference_module():
    from mobgs_tpu.models import hexplane as HP

    hx = rs.import_ref("scene.hexplane")
    cfg = {"grid_dimensions": 2, "input_coordinate_dim": 4,
           "output_coordinate_dim": 8, "resolution": [9, 7, 5, 4]}
    multires = [1, 2]
    bounds = 1.3

    with torch.no_grad():
        field = hx.HexPlaneField(bounds, cfg, multires)

    # copy the reference grids into the repo layout ([C, r2, r1] = the
    # torch grid's [0] slice)
    grids = tuple(
        tuple(jnp.asarray(g.detach().numpy()[0]) for g in gp)
        for gp in field.grids)
    params = HP.HexPlaneParams(
        grids=grids, aabb=jnp.asarray(field.aabb.detach().numpy()))

    rng = np.random.default_rng(3)
    N = 257
    pts = rng.uniform(-1.5, 1.5, size=(N, 3)).astype(np.float32)
    t = rng.uniform(0, 1, size=(N, 1)).astype(np.float32)

    ours = HP.query(params, jnp.asarray(pts), jnp.asarray(t))
    with torch.no_grad():
        theirs = field.get_density(torch.from_numpy(pts),
                                   torch.from_numpy(t))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Losses


def test_losses_match_reference_module():
    from mobgs_tpu.train import losses as LO

    lu = rs.import_ref("utils.loss_utils")
    rng = np.random.default_rng(4)
    B, C, H, W = 2, 3, 31, 47
    a = rng.uniform(0, 1, size=(B, C, H, W)).astype(np.float32)
    b = rng.uniform(0, 1, size=(B, C, H, W)).astype(np.float32)
    m = (rng.uniform(size=(B, 1, H, W)) > 0.4).astype(np.float32)
    alpha = rng.uniform(0, 1, size=(B, H, W)).astype(np.float32)

    ta, tb, tm = map(torch.from_numpy, (a, b, m))

    np.testing.assert_allclose(
        float(LO.l1_loss(jnp.asarray(a), jnp.asarray(b))),
        float(lu.l1_loss(ta, tb)), rtol=1e-6)
    np.testing.assert_allclose(
        float(LO.l1_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(m))),
        float(lu.l1_loss(ta, tb, tm)), rtol=1e-5)
    np.testing.assert_allclose(
        float(LO.entropy_loss(jnp.asarray(alpha))),
        float(lu.entropy_loss(torch.from_numpy(alpha))), rtol=1e-4)
    np.testing.assert_allclose(
        float(LO.sparsity_loss(jnp.asarray(alpha))),
        float(lu.sparsity_loss(torch.from_numpy(alpha))), rtol=1e-5)
    np.testing.assert_allclose(
        float(LO.ssim_loss_term(jnp.asarray(a), jnp.asarray(b))),
        float(lu.ssim(ta, tb)), rtol=1e-5, atol=1e-6)


def test_flow_warp_sampler_matches_torch_grid_sample():
    """warp_images == grid_sample(bilinear, border, align_corners=False)
    composed with the reference's pixel normalization (train.py:660-663).
    torch itself is the reference implementation here."""
    import torch.nn.functional as F
    from mobgs_tpu.train import losses as LO

    rng = np.random.default_rng(5)
    K, H, W, C = 4, 24, 36, 3
    imgs = rng.uniform(size=(K, H, W, C)).astype(np.float32)
    coords = (rng.uniform(-0.1, 1.1, size=(K, H, W, 2)).astype(np.float32)
              * np.asarray([W, H], np.float32))

    ours = LO.warp_images(jnp.asarray(imgs), jnp.asarray(coords), W, H)

    g = torch.from_numpy(coords.copy())
    g[..., 0] = g[..., 0] / (W - 1) * 2.0 - 1.0
    g[..., 1] = g[..., 1] / (H - 1) * 2.0 - 1.0
    theirs = F.grid_sample(
        torch.from_numpy(imgs).permute(0, 3, 1, 2), g, mode="bilinear",
        padding_mode="border", align_corners=False)
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Depth-volume warp ops (dead in the reference train path; ported for
# inventory parity — scene/deformation.py:509-638)


def _rand_rt(rng):
    th = rng.uniform(-0.2, 0.2)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
         [0, 0, 1]], np.float32)
    w2c[:3, 3] = rng.normal(scale=0.1, size=3).astype(np.float32)
    return w2c


def _depth_warp_inputs(seed=6, H=17, W=23):
    rng = np.random.default_rng(seed)
    img = rng.uniform(size=(3, H, W)).astype(np.float32)
    depth = rng.uniform(2.0, 30.0, size=(H, W)).astype(np.float32)
    K = np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]],
                 np.float32)
    return rng, img, depth, K, _rand_rt(rng), _rand_rt(rng)


def test_direct_warp_and_occ_match_reference_module():
    from mobgs_tpu.train import losses_extra as LE

    deform = rs.import_ref("scene.deformation")
    rng, img, depth, K, w2c1, w2c2 = _depth_warp_inputs()
    Kinv = np.linalg.inv(K).astype(np.float32)

    ours_img, ours_occ = LE.direct_warp_rt1_rt2(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(w2c1),
        jnp.asarray(w2c2), jnp.asarray(K), jnp.asarray(Kinv), no_bucket=16)
    with torch.no_grad():
        t_img, t_occ = deform.direct_warp_rt1_rt2(
            torch.from_numpy(img)[None], torch.from_numpy(depth)[None, None],
            torch.from_numpy(w2c1[:3])[None], torch.from_numpy(w2c2[:3])[None],
            torch.from_numpy(K)[None], torch.from_numpy(Kinv)[None],
            no_bucket=16)
    np.testing.assert_allclose(np.asarray(ours_img), t_img[0].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_occ), t_occ[0, 0].numpy(),
                               rtol=1e-4, atol=1e-5)

    ours_o = LE.occ_rt1_rt2(jnp.asarray(depth), jnp.asarray(w2c1),
                            jnp.asarray(w2c2), jnp.asarray(K),
                            jnp.asarray(Kinv), no_bucket=16)
    with torch.no_grad():
        t_o = deform.occ_rt1_rt2(
            torch.from_numpy(depth)[None, None],
            torch.from_numpy(w2c1[:3])[None], torch.from_numpy(w2c2[:3])[None],
            torch.from_numpy(K)[None], torch.from_numpy(Kinv)[None],
            no_bucket=16)
    np.testing.assert_allclose(np.asarray(ours_o), t_o[0, 0].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_warp_pc2flow_matches_reference_module():
    from mobgs_tpu.train import losses_extra as LE

    deform = rs.import_ref("scene.deformation")
    rng, img, depth, K, w2c1, w2c2 = _depth_warp_inputs(seed=7)
    H, W = depth.shape
    # a plausible per-pixel world point cloud
    pc2 = rng.normal(scale=2.0, size=(3, H, W)).astype(np.float32)
    pc2[2] += 10.0

    ours = LE.warp_pc2flow(jnp.asarray(img), jnp.asarray(pc2),
                           jnp.asarray(w2c2), jnp.asarray(K))
    with torch.no_grad():
        theirs = deform.warp_pc2flow(
            torch.from_numpy(img)[None], torch.from_numpy(pc2)[None],
            torch.from_numpy(w2c2[:3])[None], torch.from_numpy(K)[None])
    np.testing.assert_allclose(np.asarray(ours), theirs[0].numpy(),
                               rtol=1e-4, atol=1e-5)
