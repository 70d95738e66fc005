"""Tile compositing in pure JAX (XLA-fused path; Pallas twin in
`pallas_raster.py`).

Front-to-back alpha blending per 16x16 tile over the depth-ordered,
capacity-capped per-tile Gaussian lists from `tiles.bin_gaussians`.
Matches gsplat semantics (see `reference_raster.py` docstring).

Differentiable end-to-end: gradients flow through the record gathers
back to means2d / conics / colors / opacities (XLA turns the backward
gathers into scatter-adds over the Gaussian axis). The per-chunk body is
`jax.checkpoint`-ed so the backward pass recomputes the [K, pixels]
alpha panels instead of storing them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mobgs_tpu.ops.projection import ProjectedSplats
from mobgs_tpu.ops.tiles import TILE, TileBins


def composite_tiles(bins: TileBins, splats: ProjectedSplats,
                    colors: jnp.ndarray, opacities: jnp.ndarray,
                    width: int, height: int,
                    background: jnp.ndarray | None = None,
                    tile_chunk: int = 36,
                    want_depth: bool = True,
                    want_alpha: bool = True):
    """Composite all tiles.

    Args:
      bins: tile binning result.
      splats: projected Gaussian records.
      colors: [N, C] per-Gaussian colors/features.
      opacities: [N] activated opacities.
      width, height: output size (static).
      background: [C] or None.
      tile_chunk: tiles processed per scan step (memory knob).
      want_depth, want_alpha: accepted for signature parity with the
        Pallas compositor; this path is plain XLA, so unused outputs
        are dead-code-eliminated without help.

    Returns:
      image [H, W, C], alpha [H, W], expected_depth [H, W].
    """
    del want_depth, want_alpha
    ntx, nty = bins.n_tiles_x, bins.n_tiles_y
    n_tiles = ntx * nty
    K = bins.gauss_ids.shape[1]
    C = colors.shape[1]
    dt = colors.dtype

    # local pixel-centre offsets within a tile
    yy, xx = jnp.mgrid[0:TILE, 0:TILE]
    local = jnp.stack([xx, yy], -1).reshape(-1, 2).astype(dt) + 0.5  # [P, 2]
    P = TILE * TILE

    tile_idx = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_org = jnp.stack([(tile_idx % ntx) * TILE,
                          (tile_idx // ntx) * TILE], -1).astype(dt)  # [T, 2]

    pad = (-n_tiles) % tile_chunk
    ids_all = jnp.concatenate(
        [bins.gauss_ids, jnp.zeros((pad, K), jnp.int32)]) if pad else bins.gauss_ids
    cnt_all = jnp.concatenate(
        [bins.counts, jnp.zeros((pad,), jnp.int32)]) if pad else bins.counts
    org_all = jnp.concatenate(
        [tile_org, jnp.zeros((pad, 2), dt)]) if pad else tile_org

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def chunk_body(ids, cnt, org):
        # ids [c, K], cnt [c], org [c, 2]
        m2d = splats.means2d[ids]          # [c, K, 2]
        con = splats.conics[ids]           # [c, K, 3]
        dep = splats.depths[ids]           # [c, K]
        col = colors[ids]                  # [c, K, C]
        opa = opacities[ids]               # [c, K]
        pix = org[:, None, :] + local[None]          # [c, P, 2]
        dx = pix[:, None, :, 0] - m2d[:, :, None, 0]  # [c, K, P]
        dy = pix[:, None, :, 1] - m2d[:, :, None, 1]
        sigma = (0.5 * (con[:, :, None, 0] * dx * dx
                        + con[:, :, None, 2] * dy * dy)
                 + con[:, :, None, 1] * dx * dy)
        alpha = jnp.minimum(0.99, opa[:, :, None] * jnp.exp(-sigma))
        k_live = (jnp.arange(K, dtype=jnp.int32)[None] < cnt[:, None])
        alpha = jnp.where((sigma >= 0) & (alpha > 1.0 / 255.0)
                          & k_live[:, :, None], alpha, 0.0)
        trans = jnp.cumprod(1.0 - alpha, axis=1)
        trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], 1)
        w = alpha * trans                               # [c, K, P]
        img = jnp.einsum("tkp,tkc->tpc", w, col,
                         preferred_element_type=jnp.float32)
        a = jnp.sum(w, axis=1)                          # [c, P]
        d = jnp.einsum("tkp,tk->tp", w, dep,
                       preferred_element_type=jnp.float32)
        return img.astype(dt), a.astype(dt), d.astype(dt)

    n_chunks = (n_tiles + pad) // tile_chunk
    # Optional tile-axis shard (parallel/mesh.enable_tile_sharding): the
    # intra-chunk tile axis (dim 1) splits across the mesh's gauss axis,
    # so each rank composites tile_chunk/n_gauss tiles of every chunk
    # instead of all of them (round-3 VERDICT item 3). XLA partitions
    # the [c, K, P] panels + einsums from this one constraint and
    # all-gathers the image tiles at `untile`.
    from mobgs_tpu.parallel import mesh as _pmesh
    ids_r = _pmesh.constrain_tile_axis(
        ids_all.reshape(n_chunks, tile_chunk, K), 1)
    cnt_r = _pmesh.constrain_tile_axis(
        cnt_all.reshape(n_chunks, tile_chunk), 1)
    org_r = _pmesh.constrain_tile_axis(
        org_all.reshape(n_chunks, tile_chunk, 2), 1)
    imgs, alphas, depths = jax.lax.map(
        lambda args: chunk_body(*args), (ids_r, cnt_r, org_r))

    def untile(x, ch):
        x = x.reshape(n_tiles + pad, TILE, TILE, ch)[:n_tiles]
        x = x.reshape(nty, ntx, TILE, TILE, ch)
        x = x.transpose(0, 2, 1, 3, 4).reshape(nty * TILE, ntx * TILE, ch)
        return x[:height, :width]

    # explicit leading dim: -1 is uninferable when C == 0 (alpha-only)
    image = untile(imgs.reshape(n_tiles + pad, P, C), C)
    alpha = untile(alphas.reshape(-1, P, 1), 1)[..., 0]
    depth_acc = untile(depths.reshape(-1, P, 1), 1)[..., 0]
    if background is not None:
        image = image + background[None, None, :] * (1.0 - alpha[..., None])
    exp_depth = depth_acc / jnp.maximum(alpha, 1e-10)
    return image, alpha, exp_depth
