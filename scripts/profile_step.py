"""Stage attribution for the train step at bench (seesaw-protocol) shapes.

Times jitted sub-programs that mirror the step's [B=2, E=9] structure so
optimization effort goes to the real bottleneck:
  assemble (spline/pose chain) -> projection -> binning -> composite
  fwd -> composite fwd+bwd -> full forward -> full train step.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.config import OptimizationParams
from mobgs_tpu.data import synthetic
from mobgs_tpu.data.cameras import Camera
from mobgs_tpu.models import blce as B
from mobgs_tpu.models import gaussians as G
from mobgs_tpu.models import render as R
from mobgs_tpu.ops import projection, tiles
from mobgs_tpu.ops.rasterize import RasterConfig
from mobgs_tpu.train import loop as L
from mobgs_tpu.train.step import init_train_state, make_train_step

W, H, F = 512, 288, 24
N_STAT, N_DYN = 20_000, 10_000
CFG = RasterConfig(tiles_per_gauss=9, max_per_tile=256, tile_chunk=36)
NGEOM = 18  # 2 views x 9 exposures


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:38s} {dt*1000:9.2f} ms")
    return dt


def main():
    data, traj = synthetic.generate(width=W, height=H, num_frames=F,
                                    n_static=2000, n_dyn=400,
                                    blur_substeps=3, raster_cfg=CFG)
    s_pts, s_cols, d_traj = synthetic.init_point_clouds(
        data, traj, N_STAT, N_DYN)
    stat = G.create_state(jnp.asarray(s_pts), jnp.asarray(s_cols),
                          jnp.zeros(len(s_pts)), capacity=len(s_pts) * 2,
                          rng=jax.random.PRNGKey(0))
    dyn = G.create_state(
        jnp.asarray(d_traj[:, 0]),
        jnp.asarray(np.full((len(d_traj), 3), 0.5, np.float32)),
        jnp.zeros(len(d_traj)), capacity=len(d_traj) * 2,
        trajectory=jnp.asarray(d_traj), traj_times=jnp.asarray(data.time))
    from mobgs_tpu.models.sandwich import init_sandwich
    sandwich = init_sandwich(jax.random.PRNGKey(1))
    blce_state = B.init_blce(jax.random.PRNGKey(2), num_views=F, num_warp=9)
    ts = init_train_state(stat, dyn, sandwich, blce_state)

    Ktot = stat.capacity + dyn.capacity
    w2c = jnp.eye(4)
    Kmat = jnp.asarray([[450.0, 0, W / 2], [0, 450.0, H / 2], [0, 0, 1]])
    times = jnp.linspace(0.1, 0.9, NGEOM)

    # --- assemble chain (spline positions, rotations, features), x NGEOM
    def assemble_many(st, dy, ts_):
        return jax.vmap(lambda t: R.assemble(st, dy, t, data.max_time))(ts_)

    asm_j = jax.jit(assemble_many)
    timeit(f"assemble x{NGEOM} (spline chain)", asm_j, stat, dyn, times)
    geoms = asm_j(stat, dyn, times)

    # --- projection, x NGEOM
    def project_many(g):
        return jax.vmap(lambda m, q, s: projection.project(
            m, q, s, w2c, Kmat, W, H, eps2d=CFG.eps2d, near=CFG.near,
            sigma_cut=CFG.sigma_cut))(g.means, g.quats, g.scales)

    proj_j = jax.jit(project_many)
    timeit(f"projection x{NGEOM}", proj_j, geoms)
    splats = proj_j(geoms)
    print(f"  visible/geom: {int(jnp.sum(splats.radii[0] > 0))}")

    # --- binning, x NGEOM
    def bin_many(sp):
        return jax.vmap(lambda s: tiles.bin_gaussians(
            s, W, H, CFG.tiles_per_gauss, CFG.max_per_tile))(sp)

    bin_j = jax.jit(bin_many)
    timeit(f"binning x{NGEOM}", bin_j, splats)
    bins = bin_j(splats)
    print(f"  mean count/tile: {float(jnp.mean(bins.counts)):.0f}")

    # --- composite fwd / fwd+bwd, x NGEOM (1 pass each)
    from mobgs_tpu.ops import pallas_raster, raster_jax
    comp = (pallas_raster.composite_tiles_pallas
            if jax.default_backend() == "tpu" else raster_jax.composite_tiles)

    ntx, nty = -(-W // tiles.TILE), -(-H // tiles.TILE)

    def comp_many(ids, cnts, sp, cols, opac):
        def one(i, ct, s, c, o):
            b = tiles.TileBins(gauss_ids=i, counts=ct,
                               n_tiles_x=ntx, n_tiles_y=nty)
            img, a, d = comp(b, s, c, o, W, H, background=jnp.zeros(9),
                             tile_chunk=CFG.tile_chunk)
            return img
        return jax.vmap(one)(ids, cnts, sp, cols, opac)

    comp_j = jax.jit(comp_many)
    timeit(f"composite fwd x{NGEOM}", comp_j, bins.gauss_ids, bins.counts,
           splats, geoms.colors, geoms.opacity)

    def comp_loss(m2d, con, dep, cols, opac):
        sp = splats._replace(means2d=m2d, conics=con, depths=dep)
        return jnp.sum(comp_many(bins.gauss_ids, bins.counts, sp, cols, opac))

    compg_j = jax.jit(jax.grad(comp_loss, argnums=(0, 1, 2, 3, 4)))
    timeit(f"composite fwd+bwd x{NGEOM}", compg_j, splats.means2d,
           splats.conics, splats.depths, geoms.colors, geoms.opacity)

    # --- binning sub-stages, x NGEOM
    from mobgs_tpu.ops.tiles import TILE

    # This sub-stage deliberately re-times the REMOVED rank-precompute
    # design (tiles.py now fuses quantized depth bits into the sort key);
    # the old key layout reserved 17 bits for the rank.
    RANK_BITS = 17

    def bin_parts(sp):
        N = sp.means2d.shape[1]
        ntx_, nty_ = -(-W // TILE), -(-H // TILE)

        def rank_of(s):
            live = s.radii > 0
            order = jnp.argsort(jnp.where(live, s.depths, jnp.inf))
            return jnp.zeros((N,), jnp.int32).at[order].set(
                jnp.arange(N, dtype=jnp.int32))
        return jax.vmap(rank_of)(sp)

    timeit(f"  bin: rank (argsort+scatter) x{NGEOM}", jax.jit(bin_parts),
           splats)

    def bin_expand_sort(sp):
        N = sp.means2d.shape[1]
        E = CFG.tiles_per_gauss
        ntx_ = -(-W // TILE)

        def one(s):
            live = s.radii > 0
            r = s.radii.astype(jnp.float32)
            x, y = s.means2d[:, 0], s.means2d[:, 1]
            tx0 = jnp.clip(jnp.floor((x - r) / TILE), 0, ntx_ - 1).astype(jnp.int32)
            ty0 = jnp.clip(jnp.floor((y - r) / TILE), 0, 17).astype(jnp.int32)
            o = jnp.arange(E, dtype=jnp.int32)[None, :]
            tile_id = (ty0[:, None]) * ntx_ + (tx0[:, None] + o % 3)
            keys = jnp.where(live[:, None], tile_id << RANK_BITS,
                             jnp.int32(2**31 - 1)).reshape(-1)
            gidx = jnp.broadcast_to(
                jnp.arange(N, dtype=jnp.int32)[:, None], (N, E)).reshape(-1)
            return jax.lax.sort((keys, gidx), num_keys=1)[1]
        return jax.vmap(one)(sp)

    timeit(f"  bin: expand+sort x{NGEOM}", jax.jit(bin_expand_sort), splats)

    import os
    if os.environ.get("PROFILE_LIGHT"):
        return

    # --- full render_view fwd+bwd x NGEOM (incl. project+bin inside)
    def render_loss(st_diff, dy_diff, st_aux, dy_aux):
        st = G.merge_diff(st_diff, st_aux)
        dy = G.merge_diff(dy_diff, dy_aux)

        def one(t):
            cam = Camera(w2c=w2c, K=Kmat, time=t)
            out = R.render_view(st, dy, sandwich, cam, W, H,
                                jnp.zeros(3), data.max_time, config=CFG)
            return jnp.sum(out.image)
        return jnp.sum(jax.vmap(one)(times))

    sd, sa = G.split_diff(stat)
    dd, da = G.split_diff(dyn)
    rvg_j = jax.jit(jax.grad(render_loss, argnums=(0, 1)))
    timeit(f"render_view fwd+bwd x{NGEOM}", rvg_j, sd, dd, sa, da)

    # --- full train step
    opt = OptimizationParams(iterations=10_000, batch_size=2,
                             lambda_flow_loss=0.0)
    step_fn = make_train_step(opt, W, H, data.max_time, num_warp=9,
                              raster_cfg=CFG)
    sampler = L.BatchSampler(F, 2, seed=0)
    batch = L.make_batch(data, sampler.next_ids())

    # the step donates its input state; keep a live copy for the flow-ON
    # section below
    ts_keep = jax.tree.map(jnp.copy, ts)
    ts2, m = step_fn(ts, batch)
    jax.block_until_ready(m.loss)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        ts2, m = step_fn(ts2, batch)
    jax.block_until_ready(m.loss)
    print(f"{'FULL train step (flow OFF)':38s} {(time.time()-t0)/reps*1000:9.2f} ms")

    if not os.environ.get("PROFILE_FLOW"):
        return

    # --- flow-ON attribution (the 4/6-scene protocol, VERDICT item 3)
    from mobgs_tpu.train import losses
    from mobgs_tpu.train.step import make_forward

    # flow_warp_loss alone, fwd+bwd, x B=2 views at protocol shapes
    E = 9
    rngk = jax.random.PRNGKey(3)
    imgs = jax.random.uniform(rngk, (2, E, H, W, 3))
    alphas = jnp.full((2, E, H, W), 0.5)
    coords = jax.random.uniform(rngk, (2, E, H, W, 2)) * W

    def fw_loss(imgs_, alphas_, coords_):
        tot = 0.0
        for b in range(2):  # static unroll like the step
            tot += losses.flow_warp_loss(
                imgs_[b, 0], imgs_[b], alphas_[b], alphas_[b, 0],
                coords_[b], coords_[b], W, H)
        return tot

    fwg_j = jax.jit(jax.grad(fw_loss, argnums=(0, 2)))
    timeit("flow_warp_loss fwd+bwd x2 views", fwg_j, imgs, alphas, coords)

    # forward-only, flow ON vs step (isolates the bwd share)
    opt_f = OptimizationParams(iterations=10_000, batch_size=2,
                               lambda_flow_loss=1e-2)
    fwd_f = make_forward(opt_f, W, H, data.max_time, num_warp=9,
                         raster_cfg=CFG)
    sd, sa = G.split_diff(ts_keep.stat)
    dd, da = G.split_diff(ts_keep.dyn)
    Ktot2 = ts_keep.stat.capacity + ts_keep.dyn.capacity
    offs = jnp.zeros((2, Ktot2, 2), jnp.float32)

    def fwd_only(sd_, dd_, sand_, blce_p, offs_, expo_, b_):
        return fwd_f(sd_, dd_, sand_, blce_p, offs_, sa, da, expo_, b_)[0]

    fwd_j = jax.jit(fwd_only)
    timeit("forward only (flow ON)", fwd_j, sd, dd, ts_keep.sandwich,
           ts_keep.blce.params, offs, ts_keep.blce.exposure_expo, batch, reps=3)

    fwdg_j = jax.jit(jax.grad(fwd_only, argnums=(0, 1, 2, 3, 4)))
    timeit("forward+grad (flow ON)", fwdg_j, sd, dd, ts_keep.sandwich,
           ts_keep.blce.params, offs, ts_keep.blce.exposure_expo, batch, reps=3)

    step_f = make_train_step(opt_f, W, H, data.max_time, num_warp=9,
                             raster_cfg=CFG)
    ts3 = jax.tree.map(jnp.copy, ts_keep)
    ts3, m3 = step_f(ts3, batch)
    jax.block_until_ready(m3.loss)
    t0 = time.time()
    for _ in range(reps):
        ts3, m3 = step_f(ts3, batch)
    jax.block_until_ready(m3.loss)
    print(f"{'FULL train step (flow ON)':38s} {(time.time()-t0)/reps*1000:9.2f} ms")


if __name__ == "__main__":
    main()
