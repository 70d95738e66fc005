"""Camera-shared static binning (ops/tiles.StaticBins + merge_dyn_bins).

The train step's mid render and E-1 exposure-flow passes share one
camera, and only the dynamic pool moves with the exposure shift — the
shared path bins the static pool once and merges the dynamic records
per pass. These tests pin EXACT equivalence with the plain combined
binning (the merge reproduces the stable combined sort, including
truncation and tie order), at the bin level, the rasterize level, and
the full flow-ON train forward.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.ops import projection, tiles
from mobgs_tpu.ops.rasterize import (RasterConfig, make_shared_static,
                                     rasterize)

from tests.test_multiscene_shard import make_cloud
from tests.test_train_step import CFG, build_everything


def _project(means, quats, scales, K, W, H, cfg):
    return projection.project(means, quats, scales, jnp.eye(4), K,
                              W, H, eps2d=cfg.eps2d, near=cfg.near,
                              sigma_cut=cfg.sigma_cut)


def test_merge_dyn_bins_bit_exact_vs_combined_sort():
    """Merged bins == bin_gaussians over the concatenated set, entry for
    entry — including pre-clamp counts and the max_count observability
    scalar. max_per_tile is forced tiny and the dynamic cloud is piled
    into one region so truncation + displacement both happen."""
    W, H = 128, 64
    K = jnp.asarray([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])
    cfg = RasterConfig(max_per_tile=64, tiles_per_gauss=9)

    means_s, quats_s, scales_s, *_ = make_cloud(768, seed=0)
    means_d, quats_d, scales_d, *_ = make_cloud(256, seed=1)
    # pile the dynamic splats into a small region in front of the static
    # cloud so single tiles overflow and dyn records DISPLACE static
    # ones past the cap
    means_d = means_d * jnp.asarray([0.2, 0.2, 0.05]) + jnp.asarray(
        [0.0, 0.0, 5.0])

    sp_s = _project(means_s, quats_s, scales_s, K, W, H, cfg)
    sp_d = _project(means_d, quats_d, scales_d, K, W, H, cfg)
    sp_all = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), sp_s, sp_d)

    ref = tiles.bin_gaussians(sp_all, W, H,
                              tiles_per_gauss=cfg.tiles_per_gauss,
                              max_per_tile=cfg.max_per_tile)
    sb = tiles.bin_static(sp_s, W, H, tiles_per_gauss=cfg.tiles_per_gauss,
                          max_per_tile=cfg.max_per_tile)
    got = tiles.merge_dyn_bins(sb, sp_d, means_s.shape[0], W, H,
                               tiles_per_gauss=cfg.tiles_per_gauss,
                               max_per_tile=cfg.max_per_tile)

    assert int(got.max_count) == int(ref.max_count)
    assert int(got.max_count) > cfg.max_per_tile, \
        "test setup failed to overflow a tile"
    np.testing.assert_array_equal(np.asarray(got.counts),
                                  np.asarray(ref.counts))
    # entries past a tile's count are garbage in both paths — mask them
    slot = np.arange(cfg.max_per_tile)[None, :]
    live = slot < np.asarray(ref.counts)[:, None]
    np.testing.assert_array_equal(
        np.where(live, np.asarray(got.gauss_ids), -1),
        np.where(live, np.asarray(ref.gauss_ids), -1))


def test_rasterize_shared_matches_images_and_grads():
    W, H = 128, 64
    K = jnp.asarray([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])
    cfg = RasterConfig(max_per_tile=64, tiles_per_gauss=9, tile_chunk=8)
    Ms = 768
    means_s, quats_s, scales_s, opac_s, col_s = make_cloud(Ms, seed=2)
    means_d, quats_d, scales_d, opac_d, col_d = make_cloud(192, seed=3)

    means = jnp.concatenate([means_s, means_d])
    quats = jnp.concatenate([quats_s, quats_d])
    scales = jnp.concatenate([scales_s, scales_d])
    opac = jnp.concatenate([opac_s, opac_d])
    colors = jnp.concatenate([col_s, col_d])
    N = means.shape[0]
    dyn_mask = jnp.concatenate([jnp.zeros(Ms), jnp.ones(N - Ms)])

    def run(m, use_shared):
        shared = (make_shared_static(m[:Ms], quats[:Ms], scales[:Ms],
                                     jnp.eye(4), K, W, H, cfg)
                  if use_shared else None)
        out = rasterize(m, quats, scales, opac, colors, jnp.eye(4), K,
                        W, H, background=jnp.zeros(3),
                        alpha_masks=dyn_mask[None],
                        config=cfg, shared=shared)
        loss = (jnp.sum(out.images[0] ** 2) + jnp.sum(out.alphas ** 2)
                + jnp.sum(out.depths ** 2) + jnp.sum(out.sub_alphas ** 2))
        return loss, out

    (l0, o0) = jax.jit(lambda m: run(m, False))(means)
    (l1, o1) = jax.jit(lambda m: run(m, True))(means)
    g0 = jax.jit(jax.grad(lambda m: run(m, False)[0]))(means)
    g1 = jax.jit(jax.grad(lambda m: run(m, True)[0]))(means)

    # identical op sequence per record, but the concat moves fusion
    # boundaries, so XLA may reassociate accumulations: ~1e-6 fuzz
    np.testing.assert_allclose(np.asarray(o1.images), np.asarray(o0.images),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1.sub_alphas),
                               np.asarray(o0.sub_alphas), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1.means2d), np.asarray(o0.means2d),
                               atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    # grads: the composite INPUTS are proven bit-identical (bin test
    # above; projection slices verified bitwise equal), so any grad
    # delta is scatter-add reassociation. Per-Gaussian grads are sums
    # of cancelling ±O(1e3) pixel contributions, so f32 reassociation
    # noise is O(|contrib|·eps) ≈ 1e-2 absolute even when the net grad
    # is small — measured 8e-3 max here vs 1e-4 for a pure
    # tile-scheduling change.
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-3, atol=2e-2)


def test_shared_static_step_matches():
    """Full flow-ON train forward: shared_static=True must equal the
    unshared path in loss AND gradients (it ships as the default)."""
    from mobgs_tpu.models import gaussians as G_
    from mobgs_tpu.train import loop as L
    from mobgs_tpu.train.step import make_forward

    ts, data, opt, blce_cfg = build_everything(num_warp=3, lambda_flow=1e-2)
    sampler = L.BatchSampler(6, 2, seed=0)
    batch = L.make_batch(data, sampler.next_ids())
    sd, sa = G_.split_diff(ts.stat)
    dd, da = G_.split_diff(ts.dyn)
    Ntot = ts.stat.capacity + ts.dyn.capacity
    offs = jnp.zeros((2, Ntot, 2), jnp.float32)

    outs = {}
    for mode in (True, False):
        fwd = make_forward(opt, data.width, data.height, data.max_time,
                           num_warp=3, raster_cfg=CFG, shared_static=mode)

        def loss_of(sd_, dd_, sand_, blce_p, offs_):
            return fwd(sd_, dd_, sand_, blce_p, offs_, sa, da,
                       ts.blce.exposure_expo, batch)[0]

        val, grads = jax.jit(jax.value_and_grad(loss_of, argnums=(0, 1, 4)))(
            sd, dd, ts.sandwich, ts.blce.params, offs)
        outs[mode] = (val, grads)

    v_sh, g_sh = outs[True]
    v_un, g_un = outs[False]
    np.testing.assert_allclose(float(v_sh), float(v_un), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_un)):
        # reassociation tolerance — see the note in the rasterize-level
        # test; the semantic (bit-level) guarantee is the bin test
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-2)
