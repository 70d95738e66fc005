"""Microbench: which stage regresses under lax.scan vs static unroll.

Times K=8 repetitions of each pipeline stage at protocol shapes, fwd+bwd,
scan vs unrolled. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_scan_micro.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.data.cameras import Camera
from mobgs_tpu.models import gaussians as G
from mobgs_tpu.models import render as R
from mobgs_tpu.ops import pallas_raster, projection, raster_jax, tiles
from mobgs_tpu.ops.rasterize import RasterConfig

W, H = 512, 288
CFG = RasterConfig(tiles_per_gauss=9, max_per_tile=256, tile_chunk=36)
KREP = 8


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.time()-t0)/reps*1000:9.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    N = 60_000
    pts = rng.normal(size=(N, 3)).astype(np.float32)
    pts[:, 2] += 9.0
    stat = G.create_state(jnp.asarray(pts), jnp.full((N, 3), 0.5),
                          jnp.zeros(N), capacity=N,
                          rng=jax.random.PRNGKey(0))
    w2c = jnp.eye(4)
    Km = jnp.asarray([[450.0, 0, W / 2], [0, 450.0, H / 2], [0, 0, 1]])
    geom = R.assemble(stat, G.create_state(
        jnp.asarray(pts[:16]), jnp.full((16, 3), 0.5), jnp.zeros(16),
        capacity=16, rng=jax.random.PRNGKey(1)), 0.5, 1.0)

    splats = projection.project(geom.means, geom.quats, geom.scales, w2c, Km,
                                W, H, eps2d=CFG.eps2d, near=CFG.near,
                                sigma_cut=CFG.sigma_cut)
    bins = tiles.bin_gaussians(splats, W, H, CFG.tiles_per_gauss,
                               CFG.max_per_tile)
    colors = geom.colors
    opac = geom.opacity
    comp = (pallas_raster.composite_tiles_pallas
            if jax.default_backend() == "tpu" else raster_jax.composite_tiles)

    # jitter means per repetition so XLA cannot CSE the K passes
    Ntot = geom.means.shape[0]
    deltas = jnp.asarray(rng.normal(size=(KREP, Ntot, 2)).astype(np.float32))
    tdeltas = jnp.linspace(0.1, 0.9, KREP)

    def one_comp(d):
        sp = splats._replace(means2d=splats.means2d + 1e-4 * d)
        img, a, dep = comp(bins, sp, colors, opac, W, H,
                           background=jnp.zeros(9), tile_chunk=CFG.tile_chunk)
        return jnp.sum(img)

    def comp_unroll(ds):
        return sum(one_comp(ds[k]) for k in range(KREP))

    def comp_scan(ds):
        def body(c, d):
            return c + one_comp(d), 0.0
        c, _ = jax.lax.scan(body, 0.0, ds)
        return c

    timeit("composite fwd+bwd x8  unroll",
           jax.jit(jax.grad(comp_unroll)), deltas)
    timeit("composite fwd+bwd x8  scan",
           jax.jit(jax.grad(comp_scan)), deltas)

    def one_bin(d):
        sp = splats._replace(means2d=splats.means2d + 1e-4 * d)
        b = tiles.bin_gaussians(sp, W, H, CFG.tiles_per_gauss,
                                CFG.max_per_tile)
        return jnp.sum(b.gauss_ids) + jnp.sum(b.counts)

    timeit("binning x8            unroll",
           jax.jit(lambda ds: sum(one_bin(ds[k]) for k in range(KREP))),
           deltas)
    timeit("binning x8            scan",
           jax.jit(lambda ds: jax.lax.scan(
               lambda c, d: (c + one_bin(d), 0.0), 0, ds)[0]), deltas)

    def one_full(d):
        sp = splats._replace(means2d=splats.means2d + 1e-4 * d)
        b = tiles.bin_gaussians(jax.tree.map(jax.lax.stop_gradient, sp),
                                W, H, CFG.tiles_per_gauss, CFG.max_per_tile)
        img, a, dep = comp(b, sp, colors, opac, W, H,
                           background=jnp.zeros(9), tile_chunk=CFG.tile_chunk)
        return jnp.sum(img)

    timeit("bin+composite fwd+bwd x8 unroll",
           jax.jit(jax.grad(
               lambda ds: sum(one_full(ds[k]) for k in range(KREP)))), deltas)
    timeit("bin+composite fwd+bwd x8 scan",
           jax.jit(jax.grad(lambda ds: jax.lax.scan(
               lambda c, d: (c + one_full(d), 0.0), 0.0, ds)[0])), deltas)


if __name__ == "__main__":
    import sys as _s0
    if len(_s0.argv) == 1:
        main()


def full_render():
    """render_view fwd+bwd w.r.t. Gaussian params — the real per-pass
    program of the train step (assemble+projection+bin+composite+decode)."""
    from mobgs_tpu.models.sandwich import init_sandwich
    rng = np.random.default_rng(0)
    N = 40_000
    pts = rng.normal(size=(N, 3)).astype(np.float32)
    pts[:, 2] += 9.0
    stat = G.create_state(jnp.asarray(pts), jnp.full((N, 3), 0.5),
                          jnp.zeros(N), capacity=N,
                          rng=jax.random.PRNGKey(0))
    nd = 20_000
    base = rng.normal(size=(nd, 3)).astype(np.float32)
    base[:, 2] += 9.0
    times6 = jnp.linspace(0, 1, 6)
    traj = jnp.asarray(base)[:, None, :] + 0.1 * times6[None, :, None]
    dyn = G.create_state(jnp.asarray(base), jnp.full((nd, 3), 0.5),
                         jnp.zeros(nd), capacity=nd, trajectory=traj,
                         traj_times=times6)
    sandwich = init_sandwich(jax.random.PRNGKey(1))
    w2c = jnp.eye(4)
    Km = jnp.asarray([[450.0, 0, W / 2], [0, 450.0, H / 2], [0, 0, 1]])
    ts8 = jnp.linspace(0.1, 0.9, KREP)

    def one(sd, dd, sa, da, t):
        st = G.merge_diff(sd, sa)
        dy = G.merge_diff(dd, da)
        cam = Camera(w2c=w2c, K=Km, time=t)
        out = R.render_view(st, dy, sandwich, cam, W, H, jnp.zeros(3), 1.0,
                            want_depth=False, want_alpha=False, config=CFG)
        return jnp.sum(out.image)

    sd, sa = G.split_diff(stat)
    dd, da = G.split_diff(dyn)

    def unrolled(sd_, dd_):
        return sum(one(sd_, dd_, sa, da, ts8[k]) for k in range(KREP))

    def scanned(sd_, dd_):
        def body(c, t):
            return c + one(sd_, dd_, sa, da, t), 0.0
        return jax.lax.scan(body, 0.0, ts8)[0]

    timeit("render_view fwd+bwd x8  unroll",
           jax.jit(jax.grad(unrolled, argnums=(0, 1))), sd, dd)
    timeit("render_view fwd+bwd x8  scan",
           jax.jit(jax.grad(scanned, argnums=(0, 1))), sd, dd)

    # bisect: geometry assembled ONCE outside; only proj+bin+composite in
    geom = R.assemble(stat, dyn, 0.5, 1.0)

    def one_pb(means, t):
        from mobgs_tpu.ops.rasterize import rasterize
        out = rasterize(means + 0.0 * t, geom.quats, geom.scales,
                        geom.opacity, geom.colors, w2c, Km, W, H,
                        background=None, want_depth=False, want_alpha=False,
                        config=CFG)
        return jnp.sum(out.images[0])

    def unrolled_pb(m):
        return sum(one_pb(m, ts8[k]) for k in range(KREP))

    def scanned_pb(m):
        return jax.lax.scan(lambda c, t: (c + one_pb(m, t), 0.0),
                            0.0, ts8)[0]

    timeit("proj+bin+comp fwd+bwd x8 unroll",
           jax.jit(jax.grad(unrolled_pb)), geom.means)
    timeit("proj+bin+comp fwd+bwd x8 scan",
           jax.jit(jax.grad(scanned_pb)), geom.means)


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "full":
        main()
        full_render()


def mega_gather():
    """8 unrolled record gathers+scatters vs ONE manually-flattened
    gather/scatter over a stacked table ([8N, 19] rows, flat indices).
    This is the primitive behind batching the 8 flow chains into one
    composite launch — CLAUDE.md's 3x cliff was measured on VMAP-batched
    gather/scatter; a flat gather is a different lowering."""
    rng = np.random.default_rng(0)
    N, T, K, CE = 60_000, 576, 256, 19
    E = 8
    tables = jnp.asarray(rng.normal(size=(E, N, CE)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, N, size=(E, T, K)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(E, T, K, CE)).astype(np.float32))

    def unrolled(tb):
        tot = 0.0
        for e in range(E):
            g = tb[e][ids[e]]             # [T, K, CE]
            tot = tot + jnp.sum(g * w[e])
        return tot

    def mega(tb):
        flat = tb.reshape(E * N, CE)
        fids = (ids + (jnp.arange(E, dtype=jnp.int32)[:, None, None] * N)
                ).reshape(E * T, K)
        g = flat[fids]                    # [E*T, K, CE]
        return jnp.sum(g * w.reshape(E * T, K, CE))

    timeit("record gather+scatter x8 unroll",
           jax.jit(jax.grad(unrolled)), tables)
    timeit("record gather+scatter x8 mega-flat",
           jax.jit(jax.grad(mega)), tables)

    # batched sort: 8 unrolled fused-key sorts vs ONE sort with a batch
    # dim (vmap of lax.sort lowers to a single variadic sort)
    M = N * 9
    keys = jnp.asarray(rng.integers(0, 2**30, size=(E, M)).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, N, size=(E, M)).astype(np.int32))

    def sort_unroll(ks):
        outs = [jax.lax.sort((ks[e], vals[e]), num_keys=1)[1]
                for e in range(E)]
        return sum(jnp.sum(o) for o in outs)

    def sort_batched(ks):
        _, v = jax.vmap(lambda k, va: jax.lax.sort((k, va), num_keys=1))(
            ks, vals)
        return jnp.sum(v)

    timeit("fused-key sort x8      unroll", jax.jit(sort_unroll), keys)
    timeit("fused-key sort x8      vmap-batched", jax.jit(sort_batched), keys)


if __name__ == "__main__":
    import sys as _s2
    if len(_s2.argv) > 1 and _s2.argv[1] == "mega":
        mega_gather()
