"""Benchmark: steady-state training throughput on the DyBluRF 'seesaw'
protocol shapes (512x288, 24 frames, 20k static + 10k dynamic seeds,
batch 2, 9 latent exposures — BASELINE.md table).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` compares against an ESTIMATED reference throughput of
2.0 train iters/sec (MoBGS on A100: ~90 sequential gsplat launches per
iteration at these shapes; the repo publishes no numbers — see
BASELINE.md). The synthetic scene reproduces the protocol's shapes, not
its pixels, so the metric is throughput, which is shape-determined.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_ITERS_PER_SEC_EST = 2.0


def main():
    import jax
    import jax.numpy as jnp

    from mobgs_tpu.config import BlceParams, OptimizationParams
    from mobgs_tpu.data import synthetic
    from mobgs_tpu.models import blce as B
    from mobgs_tpu.models import gaussians as G
    from mobgs_tpu.models.sandwich import init_sandwich
    from mobgs_tpu.ops.rasterize import RasterConfig
    from mobgs_tpu.train import loop as L
    from mobgs_tpu.train.step import init_train_state, make_train_step

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    if on_tpu:
        W, H, F = 512, 288, 24
        n_stat, n_dyn = 20_000, 10_000
        cap_mult = 2
        # max_per_tile=256: measured-lossless at protocol occupancy
        # (bit-identical loss vs 384 on this scene; validated per-scene
        # at train init by rasterize.validate_max_per_tile)
        raster_cfg = RasterConfig(tiles_per_gauss=9, max_per_tile=256,
                                  tile_chunk=36)
        iters_timed = 20
    else:  # CPU fallback keeps the bench runnable anywhere (scaled down)
        W, H, F = 128, 72, 8
        n_stat, n_dyn = 1500, 400
        cap_mult = 2
        raster_cfg = RasterConfig(tiles_per_gauss=16, max_per_tile=256,
                                  tile_chunk=12)
        iters_timed = 5

    data, traj = synthetic.generate(width=W, height=H, num_frames=F,
                                    n_static=2000, n_dyn=400,
                                    blur_substeps=3, raster_cfg=raster_cfg)
    s_pts, s_cols, d_traj = synthetic.init_point_clouds(
        data, traj, n_stat, n_dyn)

    stat = G.create_state(jnp.asarray(s_pts), jnp.asarray(s_cols),
                          jnp.zeros(len(s_pts)),
                          capacity=len(s_pts) * cap_mult,
                          rng=jax.random.PRNGKey(0))
    dyn = G.create_state(
        jnp.asarray(d_traj[:, 0]),
        jnp.asarray(np.full((len(d_traj), 3), 0.5, np.float32)),
        jnp.zeros(len(d_traj)), capacity=len(d_traj) * cap_mult,
        trajectory=jnp.asarray(d_traj), traj_times=jnp.asarray(data.time))
    sandwich = init_sandwich(jax.random.PRNGKey(1))
    blce_state = B.init_blce(jax.random.PRNGKey(2), num_views=F, num_warp=9)
    ts = init_train_state(stat, dyn, sandwich, blce_state)

    # seesaw overlay: batch 2, lambda_flow_loss = 0 (arguments/stereo/seesaw.py)
    opt = OptimizationParams(iterations=10_000, batch_size=2,
                             lambda_flow_loss=0.0)
    step_fn = make_train_step(opt, W, H, data.max_time, num_warp=9,
                              raster_cfg=raster_cfg)

    sampler = L.BatchSampler(F, 2, seed=0)
    batch = L.make_batch(data, sampler.next_ids())

    t_compile = time.time()
    ts, m = step_fn(ts, batch)
    _ = float(m.loss)
    compile_s = time.time() - t_compile

    # warmup
    for _ in range(3):
        ts, m = step_fn(ts, L.make_batch(data, sampler.next_ids()))
    jax.block_until_ready(m.loss)

    t0 = time.time()
    for _ in range(iters_timed):
        ts, m = step_fn(ts, L.make_batch(data, sampler.next_ids()))
    _ = float(m.loss)  # host pull: block_until_ready does NOT reliably
    #                    wait through the axon tunnel (BASELINE.md)
    dt = time.time() - t0
    ips = iters_timed / dt

    # flow-ON protocol (basketball/sailor/skating/street: the default
    # lambda_flow_loss=1e-2, arguments/__init__.py:185) — the folded
    # flow path (train/step.py) makes this E-1 extra geometry passes
    # instead of the reference's 3 per exposure.
    opt_flow = OptimizationParams(iterations=10_000, batch_size=2,
                                  lambda_flow_loss=1e-2)
    step_flow = make_train_step(opt_flow, W, H, data.max_time, num_warp=9,
                                raster_cfg=raster_cfg)
    # copy: step_flow donates its input state and ts is still needed
    # for the inference-fps section below
    ts_f = jax.tree.map(jnp.copy, ts)
    t_compile_f = time.time()
    ts_f, mf = step_flow(ts_f, L.make_batch(data, sampler.next_ids()))
    _ = float(mf.loss)
    compile_flow_s = time.time() - t_compile_f
    for _ in range(2):
        ts_f, mf = step_flow(ts_f, L.make_batch(data, sampler.next_ids()))
    _ = float(mf.loss)
    t0 = time.time()
    for _ in range(iters_timed):
        ts_f, mf = step_flow(ts_f, L.make_batch(data, sampler.next_ids()))
    _ = float(mf.loss)  # host pull (see above)
    ips_flow = iters_timed / (time.time() - t0)

    # inference: rendered frames/sec (combined pass, eval/TTO rate)
    from mobgs_tpu.data.cameras import Camera
    from mobgs_tpu.models import render as R

    # 10 frames per dispatch (statically unrolled inside ONE jit):
    # per-dispatch tunnel latency otherwise dominates and the number
    # measures the RPC path, not the chip (observed 54-83 fps variance
    # for identical code).
    n_frames = 10
    fw2c = jnp.asarray(data.w2c[:n_frames])
    fK = jnp.asarray(data.K[:n_frames])
    ft = jnp.asarray(data.time[:n_frames])

    @jax.jit
    def render_frames(ts_in, w2cs, Ks, ts_arr):
        imgs = []
        for i in range(n_frames):  # unrolled: vmap'd gather/scatter is ~3x
            cam = Camera(w2c=w2cs[i], K=Ks[i], time=ts_arr[i])
            imgs.append(R.render_view(ts_in.stat, ts_in.dyn, ts_in.sandwich,
                                      cam, W, H, jnp.zeros(3), data.max_time,
                                      config=raster_cfg).image)
        return jnp.stack(imgs)

    imgs = render_frames(ts, fw2c, fK, ft)
    _ = float(jnp.sum(imgs[-1]))
    t0 = time.time()
    imgs = render_frames(ts, fw2c, fK, ft)
    _ = float(jnp.sum(imgs[-1]))  # host pull forces true completion
    fps = n_frames / (time.time() - t0)

    # MFU: analytic step FLOPs (utils/observability.py model — XLA's
    # cost_analysis reports 0 for the Pallas custom call) / measured
    # step time / peak chip FLOPs. Intersections measured on the mid
    # view of the CURRENT trained state (post-densify occupancy).
    from mobgs_tpu.models import render as R2
    from mobgs_tpu.ops import projection as P2
    from mobgs_tpu.ops import tiles as T2
    from mobgs_tpu.utils.observability import analytic_step_flops

    g = R2.assemble(ts.stat, ts.dyn, jnp.asarray(data.time[0]),
                    data.max_time)
    spl = P2.project(g.means, g.quats, g.scales, jnp.asarray(data.w2c[0]),
                     jnp.asarray(data.K[0]), W, H)
    bins = T2.bin_gaussians(spl, W, H,
                            tiles_per_gauss=raster_cfg.tiles_per_gauss,
                            max_per_tile=raster_cfg.max_per_tile)
    n_inter = float(jnp.sum(bins.counts))
    cap_total = ts.stat.capacity + ts.dyn.capacity
    n_passes = 2 * 9  # batch x exposures (flow-OFF step)
    flops = analytic_step_flops(n_inter, cap_total, n_passes)
    peak = 197e12 if on_tpu else 1e12  # v5e bf16 peak / nominal CPU
    mfu = flops / (dt / iters_timed) / peak

    platform = jax.devices()[0].platform
    result = {
        "metric": f"train_iters_per_sec_seesaw_protocol_{platform}",
        "value": round(ips, 4),
        "unit": "iters/sec",
        "vs_baseline": round(ips / REFERENCE_ITERS_PER_SEC_EST, 4),
        "flow_on_iters_per_sec": round(ips_flow, 4),
        "render_fps": round(fps, 1),
        "mfu": round(mfu, 5),
        "step_gflops": round(flops / 1e9, 1),
    }
    print(json.dumps(result))
    print(f"# compile {compile_s:.1f}s (+{compile_flow_s:.1f}s flow-on), "
          f"{iters_timed} iters in {dt:.2f}s, "
          f"loss {float(m.loss):.4f}, psnr {float(m.psnr):.2f}, "
          f"flow-on {ips_flow:.3f} it/s, "
          f"render {fps:.1f} frames/sec/chip", file=sys.stderr)


if __name__ == "__main__":
    main()
