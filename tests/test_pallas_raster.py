"""Pallas compositing kernels vs the XLA compositor (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.ops import pallas_raster, projection, raster_jax, tiles

W, H = 64, 48


def setup(n=300, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32)
    means[:, 2] += 6.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -1.5, size=(n, 3))).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    viewmat = jnp.eye(4)
    K = jnp.asarray([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    splats = projection.project(jnp.asarray(means), jnp.asarray(quats),
                                jnp.asarray(scales), viewmat, K, W, H)
    bins = tiles.bin_gaussians(splats, W, H, tiles_per_gauss=36,
                               max_per_tile=128)
    return splats, bins, jnp.asarray(colors), jnp.asarray(opac)


def test_pallas_forward_matches_xla():
    splats, bins, colors, opac = setup()
    bg = jnp.asarray([0.1, 0.2, 0.3])
    img_x, a_x, d_x = raster_jax.composite_tiles(bins, splats, colors, opac,
                                                 W, H, background=bg,
                                                 tile_chunk=6)
    img_p, a_p, d_p = pallas_raster.composite_tiles_pallas(
        bins, splats, colors, opac, W, H, background=bg)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x), atol=2e-5)
    mask = np.asarray(a_x) > 1e-3
    np.testing.assert_allclose(np.asarray(d_p)[mask], np.asarray(d_x)[mask],
                               atol=1e-3, rtol=1e-3)


def test_image_only_columns_match_full():
    """want_depth/want_alpha=False drops the extended columns: the image
    (zero background) and its gradients must match the full composite;
    subset alpha chain unaffected."""
    splats, bins, colors, opac = setup(seed=2)
    full = pallas_raster.composite_tiles_pallas(
        bins, splats, colors, opac, W, H, background=None,
        sub_opacities=opac * 0.5)
    slim = pallas_raster.composite_tiles_pallas(
        bins, splats, colors, opac, W, H, background=None,
        sub_opacities=opac * 0.5, want_depth=False, want_alpha=False)
    np.testing.assert_allclose(np.asarray(slim[0]), np.asarray(full[0]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(slim[3]), np.asarray(full[3]),
                               atol=2e-5)
    assert not np.asarray(slim[1]).any() and not np.asarray(slim[2]).any()

    def loss_full(c, o):
        out = pallas_raster.composite_tiles_pallas(
            bins, splats, c, o, W, H, background=None)
        return jnp.sum(out[0] * jnp.cos(out[0]))

    def loss_slim(c, o):
        out = pallas_raster.composite_tiles_pallas(
            bins, splats, c, o, W, H, background=None,
            want_depth=False, want_alpha=False)
        return jnp.sum(out[0] * jnp.cos(out[0]))

    gf = jax.grad(loss_full, argnums=(0, 1))(colors, opac)
    gs = jax.grad(loss_slim, argnums=(0, 1))(colors, opac)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gf[0]),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gf[1]),
                               atol=1e-4, rtol=1e-3)


def test_pallas_gradients_match_xla():
    splats, bins, colors, opac = setup(n=150, seed=1)
    bg = jnp.zeros(3)
    target = jnp.zeros((H, W, 3))

    def loss(fn, m2d, con, dep, colors, opac):
        s2 = splats._replace(means2d=m2d, conics=con, depths=dep)
        img, a, d = fn(bins, s2, colors, opac, W, H, background=bg)
        return (jnp.mean((img - target) ** 2) + 0.1 * jnp.mean(a)
                + jnp.mean(jnp.where(a > 0.01, d, 0.0)) * 1e-3)

    args = (splats.means2d, splats.conics, splats.depths, colors, opac)
    g_x = jax.grad(lambda *a: loss(raster_jax.composite_tiles, *a),
                   argnums=(0, 1, 2, 3, 4))(*args)
    g_p = jax.grad(lambda *a: loss(pallas_raster.composite_tiles_pallas, *a),
                   argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means2d", "conics", "depths", "colors", "opac"]
    for a, b, nm in zip(g_p, g_x, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   rtol=2e-3, err_msg=nm)


def test_pallas_vmap_over_passes():
    splats, bins, colors, opac = setup(n=100, seed=2)
    n = opac.shape[0]
    masks = jnp.stack([jnp.ones(n), (jnp.arange(n) % 2 == 0).astype(jnp.float32)])

    def one(mask):
        img, a, d = pallas_raster.composite_tiles_pallas(
            bins, splats, colors, opac * mask, W, H,
            background=jnp.zeros(3))
        return img

    batched = jax.vmap(one)(masks)
    solo = jnp.stack([one(masks[0]), one(masks[1])])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(solo),
                               atol=1e-5)


def test_fused_sub_chain_matches_separate_passes():
    """The fused subset-alpha chain (sub_opacities, record row 6) must
    reproduce a standalone masked compositing pass — values AND grads."""
    splats, bins, colors, opac = setup(n=200, seed=3)
    n = opac.shape[0]
    sub_mask = (jnp.arange(n) % 3 == 0).astype(jnp.float32)
    bg = jnp.asarray([0.05, 0.1, 0.15])

    img_f, a_f, d_f, sub_f = pallas_raster.composite_tiles_pallas(
        bins, splats, colors, opac, W, H, background=bg,
        sub_opacities=opac * sub_mask)
    img_s, a_s, d_s = pallas_raster.composite_tiles_pallas(
        bins, splats, colors, opac, W, H, background=bg)
    _, a_sub_ref, _ = pallas_raster.composite_tiles_pallas(
        bins, splats, jnp.zeros((n, 0)), opac * sub_mask, W, H)

    np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_s),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sub_f), np.asarray(a_sub_ref),
                               atol=2e-5)

    def loss_fused(m2d, op):
        s2 = splats._replace(means2d=m2d)
        img, a, d, sub = pallas_raster.composite_tiles_pallas(
            bins, s2, colors, op, W, H, background=bg,
            sub_opacities=op * sub_mask)
        return jnp.mean(img ** 2) + 0.3 * jnp.mean(sub)

    def loss_sep(m2d, op):
        s2 = splats._replace(means2d=m2d)
        img, a, d = pallas_raster.composite_tiles_pallas(
            bins, s2, colors, op, W, H, background=bg)
        _, sub, _ = pallas_raster.composite_tiles_pallas(
            bins, s2, jnp.zeros((n, 0)), op * sub_mask, W, H)
        return jnp.mean(img ** 2) + 0.3 * jnp.mean(sub)

    gf = jax.grad(loss_fused, argnums=(0, 1))(splats.means2d, opac)
    gs = jax.grad(loss_sep, argnums=(0, 1))(splats.means2d, opac)
    for a, b, nm in zip(gf, gs, ["means2d", "opac"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   rtol=2e-3, err_msg=nm)
