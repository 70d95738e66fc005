"""SE(3), SSIM/PSNR, SH and KNN unit tests against independent oracles."""

import numpy as np
import jax.numpy as jnp

from mobgs_tpu.core import image, knn, se3, sh


def test_quat_rotmat_round_trip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(128, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.sign(q[:, :1])  # canonical hemisphere
    R = se3.quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(se3.rotmat_to_quat(R))
    np.testing.assert_allclose(np.abs(np.sum(q * q2, -1)), 1.0, atol=1e-5)
    # R must be orthonormal with det 1
    RtR = np.einsum("nij,nik->njk", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (128, 1, 1)), atol=1e-5)


def test_world_to_view_parity():
    # Same convention as reference getWorld2View2 (R stored as c2w rotation)
    rng = np.random.default_rng(1)
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    R = np.asarray(se3.quat_to_rotmat(jnp.asarray(q)))
    t = rng.normal(size=3)
    w2c = np.asarray(se3.world_to_view(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)))
    ref = np.zeros((4, 4)); ref[:3, :3] = R.T; ref[:3, 3] = t; ref[3, 3] = 1
    np.testing.assert_allclose(w2c, ref.astype(np.float32), atol=1e-6)
    inv = np.asarray(se3.view_to_world(jnp.asarray(w2c)))
    np.testing.assert_allclose(inv @ w2c, np.eye(4), atol=1e-5)


def test_se3_exp_identity_at_zero_theta():
    w = jnp.asarray(np.random.default_rng(2).normal(size=(5, 3)), jnp.float32)
    v = jnp.zeros((5, 3), jnp.float32)
    theta = jnp.zeros((5, 1), jnp.float32)
    T = np.asarray(se3.se3_exp_wvtheta(w, v, theta))
    np.testing.assert_allclose(T, np.tile(np.eye(4), (5, 1, 1)), atol=1e-5)


def test_se3_exp_known_rotation():
    # 90° about z
    w = jnp.asarray([[0.0, 0.0, 1.0]])
    v = jnp.zeros((1, 3))
    theta = jnp.asarray([[np.pi / 2]])
    T = np.asarray(se3.se3_exp_wvtheta(w, v, theta))[0]
    want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(T[:3, :3], want, atol=1e-6)


def test_ssim_identical_is_one_and_decreases_with_noise():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)), jnp.float32)
    assert float(image.ssim(img, img)) > 0.999
    noisy = img + jnp.asarray(rng.normal(scale=0.1, size=img.shape), jnp.float32)
    val = float(image.ssim(img, jnp.clip(noisy, 0, 1)))
    assert 0.2 < val < 0.99


def test_ssim_against_skimage():
    try:
        from skimage.metrics import structural_similarity
    except ImportError:
        return
    rng = np.random.default_rng(4)
    a = rng.uniform(size=(48, 48)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1).astype(np.float32)
    ours = float(image.ssim(jnp.asarray(a)[None, None], jnp.asarray(b)[None, None]))
    # skimage gaussian_weights matches the 11x11 sigma=1.5 window
    theirs = structural_similarity(a, b, gaussian_weights=True, sigma=1.5,
                                   use_sample_covariance=False, data_range=1.0)
    # border handling differs (zero-pad vs reflect) -> small tolerance
    assert abs(ours - theirs) < 0.02


def test_psnr_known_value():
    a = jnp.zeros((1, 3, 8, 8))
    b = jnp.full((1, 3, 8, 8), 0.1)
    got = float(image.psnr(a, b)[0])
    np.testing.assert_allclose(got, 20.0, atol=1e-4)


def test_sh_round_trip():
    rgb = jnp.asarray(np.random.default_rng(5).uniform(size=(10, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(rgb))), np.asarray(rgb),
                               rtol=1e-6, atol=1e-6)


def test_knn_against_bruteforce():
    rng = np.random.default_rng(6)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    got = np.asarray(knn.mean_knn_sq_dist(jnp.asarray(pts), k=3, block=128))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
