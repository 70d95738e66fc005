"""Rasterizer tests: tiled pipeline vs the brute-force oracle, gradient
checks, and pass-mask (subset rendering) semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.ops import projection, rasterize, reference_raster
from mobgs_tpu.ops.rasterize import RasterConfig


def make_scene(n=200, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * spread
    means[:, 2] += 6.0  # in front of the camera
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -1.5, size=(n, 3))).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    return map(jnp.asarray, (means, quats, scales, opac, colors))


def make_camera(width=96, height=64, f=80.0):
    viewmat = jnp.eye(4, dtype=jnp.float32)
    K = jnp.asarray([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], jnp.float32)
    return viewmat, K


def test_tiled_matches_bruteforce():
    W, H = 96, 64
    means, quats, scales, opac, colors = make_scene(300)
    viewmat, K = make_camera(W, H)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    splats = projection.project(means, quats, scales, viewmat, K, W, H)
    img_ref, alpha_ref, depth_ref = reference_raster.composite_bruteforce(
        splats, colors, opac, W, H, background=bg)

    out = rasterize.rasterize(means, quats, scales, opac, colors, viewmat, K,
                              W, H, background=bg,
                              config=RasterConfig(tiles_per_gauss=36,
                                                  max_per_tile=512,
                                                  tile_chunk=8))
    np.testing.assert_allclose(np.asarray(out.images[0]), np.asarray(img_ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.alphas[0]), np.asarray(alpha_ref),
                               atol=2e-5)
    # depth only meaningful where something was hit
    mask = np.asarray(alpha_ref) > 1e-3
    np.testing.assert_allclose(np.asarray(out.depths[0])[mask],
                               np.asarray(depth_ref)[mask], atol=1e-3, rtol=1e-3)


def test_pass_masks_equal_subset_render():
    W, H = 64, 48
    means, quats, scales, opac, colors = make_scene(120, seed=1)
    viewmat, K = make_camera(W, H)
    bg = jnp.zeros(3, jnp.float32)
    n = means.shape[0]
    subset = jnp.asarray((np.arange(n) % 2 == 0).astype(np.float32))

    cfg = RasterConfig(tile_chunk=6, max_per_tile=256)
    both = rasterize.rasterize(
        means, quats, scales, opac, colors, viewmat, K, W, H, background=bg,
        pass_masks=jnp.stack([jnp.ones(n), subset]), config=cfg)

    # explicit subset render (only even Gaussians) must match pass 1
    idx = np.arange(0, n, 2)
    solo = rasterize.rasterize(
        means[idx], quats[idx], scales[idx], opac[idx], colors[idx],
        viewmat, K, W, H, background=bg, config=cfg)
    np.testing.assert_allclose(np.asarray(both.images[1]),
                               np.asarray(solo.images[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(both.alphas[1]),
                               np.asarray(solo.alphas[0]), atol=1e-5)


def test_gradients_match_bruteforce():
    W, H = 48, 32
    means, quats, scales, opac, colors = make_scene(60, seed=2, spread=0.7)
    viewmat, K = make_camera(W, H, f=50.0)
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.zeros((H, W, 3), jnp.float32)
    cfg = RasterConfig(tile_chunk=3, max_per_tile=128)

    def loss_tiled(means, colors, opac, scales):
        out = rasterize.rasterize(means, quats, scales, opac, colors,
                                  viewmat, K, W, H, background=bg, config=cfg)
        return jnp.mean((out.images[0] - target) ** 2)

    def loss_ref(means, colors, opac, scales):
        splats = projection.project(means, quats, scales, viewmat, K, W, H)
        img, _, _ = reference_raster.composite_bruteforce(
            splats, colors, opac, W, H, background=bg)
        return jnp.mean((img - target) ** 2)

    g_t = jax.grad(loss_tiled, argnums=(0, 1, 2, 3))(means, colors, opac, scales)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(means, colors, opac, scales)
    for a, b, name in zip(g_t, g_r, ["means", "colors", "opac", "scales"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   rtol=1e-3, err_msg=name)


def test_means2d_offset_gradient():
    # The view-space gradient hook used for densification stats.
    W, H = 48, 32
    means, quats, scales, opac, colors = make_scene(40, seed=3, spread=0.5)
    viewmat, K = make_camera(W, H, f=50.0)
    n = means.shape[0]
    cfg = RasterConfig(tile_chunk=3, max_per_tile=128)

    def loss(off):
        out = rasterize.rasterize(means, quats, scales, opac, colors,
                                  viewmat, K, W, H,
                                  background=jnp.zeros(3),
                                  means2d_offset=off, config=cfg)
        return jnp.sum(out.images[0] ** 2)

    g = jax.grad(loss)(jnp.zeros((n, 2), jnp.float32))
    assert np.asarray(jnp.abs(g)).max() > 0  # nonzero view-space grads

    # finite differences on a single coordinate
    eps = 1e-3
    i = int(np.argmax(np.abs(np.asarray(g)[:, 0])))
    e = jnp.zeros((n, 2)).at[i, 0].set(eps)
    fd = (loss(e) - loss(-e)) / (2 * eps)
    np.testing.assert_allclose(float(fd), float(g[i, 0]), rtol=2e-2, atol=1e-4)


def test_radius_zero_culled_consistency():
    # Gaussians behind the camera must not contribute.
    W, H = 32, 32
    means, quats, scales, opac, colors = make_scene(30, seed=4)
    means = means.at[:10, 2].set(-5.0)  # behind
    viewmat, K = make_camera(W, H)
    out = rasterize.rasterize(means, quats, scales, opac, colors, viewmat, K,
                              W, H, background=jnp.zeros(3),
                              config=RasterConfig(tile_chunk=2, max_per_tile=64))
    assert np.all(np.asarray(out.radii[:10]) == 0)
    idx = np.arange(10, 30)
    solo = rasterize.rasterize(means[idx], quats[idx], scales[idx], opac[idx],
                               colors[idx], viewmat, K, W, H,
                               background=jnp.zeros(3),
                               config=RasterConfig(tile_chunk=2, max_per_tile=64))
    np.testing.assert_allclose(np.asarray(out.images[0]),
                               np.asarray(solo.images[0]), atol=1e-6)
