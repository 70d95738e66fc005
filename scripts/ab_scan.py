"""A/B: scan vs unrolled exposure/view passes — compile time + step time.

Protocol shapes (seesaw: 512x288, 20k+10k seeds, batch 2, E=9), both
flow modes. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_scan.py \
      [scan|unroll|both] [flow|noflow|both] [shared|noshared|both]

Timing uses a host pull on the loss (float()) — block_until_ready does
not reliably wait through the axon tunnel (BASELINE.md).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.config import OptimizationParams
from mobgs_tpu.data import synthetic
from mobgs_tpu.models import blce as B
from mobgs_tpu.models import gaussians as G
from mobgs_tpu.models.sandwich import init_sandwich
from mobgs_tpu.ops.rasterize import RasterConfig
from mobgs_tpu.train import loop as L
from mobgs_tpu.train.step import init_train_state, make_train_step

W, H, F = 512, 288, 24
CFG = RasterConfig(tiles_per_gauss=9, max_per_tile=256, tile_chunk=36)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    flows = sys.argv[2] if len(sys.argv) > 2 else "both"
    sharing = sys.argv[3] if len(sys.argv) > 3 else "shared"
    data, traj = synthetic.generate(width=W, height=H, num_frames=F,
                                    n_static=2000, n_dyn=400,
                                    blur_substeps=3, raster_cfg=CFG)
    s_pts, s_cols, d_traj = synthetic.init_point_clouds(data, traj,
                                                        20_000, 10_000)
    stat = G.create_state(jnp.asarray(s_pts), jnp.asarray(s_cols),
                          jnp.zeros(len(s_pts)), capacity=40_000,
                          rng=jax.random.PRNGKey(0))
    dyn = G.create_state(
        jnp.asarray(d_traj[:, 0]),
        jnp.asarray(np.full((len(d_traj), 3), 0.5, np.float32)),
        jnp.zeros(len(d_traj)), capacity=20_000,
        trajectory=jnp.asarray(d_traj), traj_times=jnp.asarray(data.time))
    sandwich = init_sandwich(jax.random.PRNGKey(1))
    blce_state = B.init_blce(jax.random.PRNGKey(2), num_views=F, num_warp=9)
    ts0 = init_train_state(stat, dyn, sandwich, blce_state)

    sampler = L.BatchSampler(F, 2, seed=0)
    batches = [L.make_batch(data, sampler.next_ids()) for _ in range(12)]

    # (scan_passes, scan_views) configurations
    all_modes = {
        "scan": (True, True),          # everything scanned
        "scanE": (True, False),        # exposures scanned, views unrolled
        "scanE2": (2, False),          # exposures scan(unroll=2)
        "scanE4": (4, False),          # exposures scan(unroll=4)
        "scanE2v": (2, True),
        "unroll": (False, False),
    }
    modes = all_modes if which == "both" else {
        k: all_modes[k] for k in which.split(",")}
    lams = {"noflow": 0.0, "flow": 1e-2}
    if flows != "both":
        lams = {flows: lams[flows]}

    shares = {"shared": True, "noshared": False}
    if sharing != "both":
        shares = {sharing: shares[sharing]}

    for fname, lam in lams.items():
        opt = OptimizationParams(iterations=10_000, batch_size=2,
                                 lambda_flow_loss=lam)
        for sname, sh in shares.items():
            for mname, (scan_e, scan_v) in modes.items():
                step = make_train_step(opt, W, H, data.max_time,
                                       num_warp=9, raster_cfg=CFG,
                                       scan_passes=scan_e,
                                       scan_views=scan_v,
                                       shared_static=sh)
                ts = jax.tree.map(jnp.copy, ts0)
                t0 = time.time()
                ts, m = step(ts, batches[0])
                _ = float(m.loss)  # host pull (tunnel-honest)
                compile_s = time.time() - t0
                for i in range(2):
                    ts, m = step(ts, batches[1 + i])
                _ = float(m.loss)
                t0 = time.time()
                n = 8
                for i in range(n):
                    ts, m = step(ts, batches[3 + i])
                _ = float(m.loss)
                dt = (time.time() - t0) / n
                print(f"{fname:7s} {sname:9s} {mname:7s} "
                      f"compile {compile_s:7.1f}s  step {dt*1000:7.1f} ms"
                      f"  loss {float(m.loss):.6f} "
                      f"psnr {float(m.psnr):.3f}", flush=True)


if __name__ == "__main__":
    main()
