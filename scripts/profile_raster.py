"""Micro-benchmark of rasterizer stages at seesaw protocol shapes.

Times projection / binning / composite-fwd / composite-grad separately
so optimization effort goes where the time is.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.ops import projection, raster_jax, tiles
from mobgs_tpu.ops.rasterize import RasterConfig, rasterize

N = 60_000
W, H = 512, 288
CFG = RasterConfig(tiles_per_gauss=16, max_per_tile=512, tile_chunk=36)


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:30s} {dt*1000:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 2 + [0, 0, 8])
    quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    scales = jnp.asarray(np.exp(rng.uniform(-4.5, -2.5, (N, 3))).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.1, 0.9, N).astype(np.float32))
    colors = jnp.asarray(rng.uniform(size=(N, 9)).astype(np.float32))
    viewmat = jnp.eye(4)
    K = jnp.asarray([[450.0, 0, W / 2], [0, 450.0, H / 2], [0, 0, 1]])
    bg = jnp.zeros(9)

    proj = jax.jit(lambda m, q, s: projection.project(m, q, s, viewmat, K, W, H))
    t_proj = timeit("projection", proj, means, quats, scales)
    splats = proj(means, quats, scales)
    print("visible:", int(jnp.sum(splats.radii > 0)),
          "mean count/tile:", float(jnp.sum(
              tiles.bin_gaussians(splats, W, H, CFG.tiles_per_gauss,
                                  CFG.max_per_tile).counts)) / (32 * 18))

    binf = jax.jit(lambda s: tiles.bin_gaussians(s, W, H, CFG.tiles_per_gauss,
                                                 CFG.max_per_tile))
    t_bin = timeit("binning (sort)", binf, splats)
    bins = binf(splats)

    ntx, nty = bins.n_tiles_x, bins.n_tiles_y

    def mk_bins(ids, cnt):
        return tiles.TileBins(gauss_ids=ids, counts=cnt,
                              n_tiles_x=int(ntx), n_tiles_y=int(nty))

    compf = jax.jit(lambda ids, cnt, s, c, o: raster_jax.composite_tiles(
        mk_bins(ids, cnt), s, c, o, W, H, background=bg,
        tile_chunk=CFG.tile_chunk))
    t_comp = timeit("composite fwd", compf, bins.gauss_ids, bins.counts,
                    splats, colors, opac)

    def loss(c, o, m2d):
        s2 = splats._replace(means2d=m2d)
        img, a, d = raster_jax.composite_tiles(
            mk_bins(bins.gauss_ids, bins.counts), s2, c, o, W, H,
            background=bg, tile_chunk=CFG.tile_chunk)
        return jnp.sum(img ** 2) + jnp.sum(a) + jnp.sum(jnp.where(a > 0, d, 0.0))

    gradf = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t_grad = timeit("composite grad", gradf, colors, opac, splats.means2d)

    fullf = jax.jit(lambda m, q, s, o, c: rasterize(
        m, q, s, o, c, viewmat, K, W, H, background=bg, config=CFG).images)
    t_full = timeit("full rasterize fwd", fullf, means, quats, scales, opac, colors)

    per_iter = 18 * (t_proj + t_bin) + 22 * (t_comp + t_grad)
    print(f"\nprojected per-train-iter cost (18 geoms, 22 passes fwd+bwd): "
          f"{per_iter:.2f} s")


if __name__ == "__main__":
    main()
