"""TPU lowering gate — AOT-compiles the hot paths on the real chip.

The CPU test suite runs Pallas in interpret mode and takes the non-TPU
branches of backend-switched ops, so it structurally CANNOT catch
Mosaic lowering regressions (the round-2 bench crash: a Pallas kernel
in `_tile_slices` that failed TPU lowering under vmap while every CPU
test stayed green). This script closes that hole: it `.lower()`s and
`.compile()`s — no full execution needed — the three programs the
driver's bench exercises, at reduced shapes that keep the SAME kernel
configurations (tile_chunk, max_per_tile multiples of CH, subset-alpha
passes, vmap over views):

  1. the train step, flow-OFF (seesaw protocol)
  2. the train step, flow-ON (the 4/6-scene protocol)
  3. the vmapped synthetic renderer (the data-gen path that crashed)

MUST pass before any snapshot commit that touches ops/, models/render,
or train/step (see CLAUDE.md). Runtime: ~2-3 min on the axon chip
(dominated by the two train-step compiles).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_smoke.py
Exit code 0 = all programs lower + compile on TPU.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        print("tpu_smoke: WARNING — no TPU backend; this run proves "
              "nothing about Mosaic lowering", file=sys.stderr)

    from mobgs_tpu.config import OptimizationParams
    from mobgs_tpu.models import blce as B
    from mobgs_tpu.models import gaussians as G
    from mobgs_tpu.models.sandwich import init_sandwich
    from mobgs_tpu.ops.rasterize import RasterConfig, rasterize
    from mobgs_tpu.train import loop as L
    from mobgs_tpu.train.step import Batch, init_train_state, make_train_step

    t0 = time.time()
    # Reduced shapes, PROTOCOL kernel config: tiles_per_gauss=9,
    # max_per_tile=256 (the TPU bench values — multiples of pallas CH).
    W, H, F = 256, 144, 6
    raster_cfg = RasterConfig(tiles_per_gauss=9, max_per_tile=256,
                              tile_chunk=36)
    rng = np.random.default_rng(0)
    n_stat, n_dyn = 800, 200

    def mk_pts(n, z):
        p = rng.normal(size=(n, 3)).astype(np.float32)
        p[:, 2] += z
        return p

    stat = G.create_state(jnp.asarray(mk_pts(n_stat, 9.0)),
                          jnp.full((n_stat, 3), 0.5), jnp.zeros(n_stat),
                          capacity=n_stat * 2, rng=jax.random.PRNGKey(0))
    traj = np.stack([mk_pts(n_dyn, 8.0)] * F, axis=1)
    dyn = G.create_state(jnp.asarray(traj[:, 0]), jnp.full((n_dyn, 3), 0.5),
                         jnp.zeros(n_dyn), capacity=n_dyn * 2,
                         trajectory=jnp.asarray(traj),
                         traj_times=jnp.asarray(np.linspace(0, 1, F,
                                                            dtype=np.float32)))
    sandwich = init_sandwich(jax.random.PRNGKey(1))
    blce_state = B.init_blce(jax.random.PRNGKey(2), num_views=F, num_warp=9)
    ts = init_train_state(stat, dyn, sandwich, blce_state)

    Kmat = np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1]],
                    np.float32)
    batch = Batch(
        view_idx=jnp.asarray([0, 1], jnp.int32),
        w2c=jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 2)),
        K=jnp.asarray(np.stack([Kmat] * 2)),
        time=jnp.asarray([0.0, 0.2], jnp.float32),
        image=jnp.zeros((2, H, W, 3)), depth=jnp.ones((2, H, W)),
        blur_feat=jnp.asarray([0.1, 0.1], jnp.float32))

    for name, lam in [("train_step[flow_off]", 0.0),
                      ("train_step[flow_on]", 1e-2)]:
        opt = OptimizationParams(iterations=10_000, batch_size=2,
                                 lambda_flow_loss=lam)
        step = make_train_step(opt, W, H, float(F - 1), num_warp=9,
                               raster_cfg=raster_cfg)
        t = time.time()
        step.lower(ts, batch).compile()
        print(f"tpu_smoke: {name} compiled in {time.time() - t:.1f}s")

    # the vmapped data-gen renderer (round-2 crash shape)
    quats = jnp.zeros((n_stat, 4)).at[:, 0].set(1.0)
    scales = jnp.full((n_stat, 3), 0.05)
    opac = jnp.full((n_stat,), 0.8)
    cols = jnp.full((n_stat, 3), 0.5)

    def render_one(means, w2c):
        out = rasterize(means, quats, scales, opac, cols, w2c,
                        jnp.asarray(Kmat), W, H, background=jnp.zeros(3),
                        config=raster_cfg)
        return out.images[0], out.depths[0]

    means_b = jnp.asarray(np.stack([mk_pts(n_stat, 9.0)] * 4))
    w2c_b = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 4))
    t = time.time()
    jax.jit(jax.vmap(render_one)).lower(means_b, w2c_b).compile()
    print(f"tpu_smoke: vmapped_renderer compiled in {time.time() - t:.1f}s")

    print(f"tpu_smoke: OK ({time.time() - t0:.1f}s total)")


if __name__ == "__main__":
    main()
