"""Pallas TPU tile-compositing kernels (production rasterization path).

The XLA compositor (`raster_jax.py`) materializes [tiles, K, pixels]
alpha panels and pays a log-depth cumprod plus full recompute in the
backward pass. These kernels keep each 16x16 tile's working set in VMEM
and walk the depth-ordered Gaussian list front-to-back in chunks:

* forward: per chunk — sigma/alpha on the VPU, an unrolled exclusive
  prefix-product for intra-chunk transmittance, and one [P, CH] x
  [CH, CE] MXU matmul to accumulate all channels; early exit when the
  tile's transmittance is saturated or the list is exhausted,
* backward: front-to-back replay using the forward output as the
  suffix-sum anchor (the standard 3DGS backward identity
  dC/dα_i = c_i·T_i − S_i/(1−α_i) with S_i = C_total − prefix_i),
  producing per-(tile, slot) gradient records that XLA scatter-adds
  back to the Gaussian axis.

Data layout: scalar per-Gaussian records are PACKED as one
``[T, 8, K]`` array (rows: mx, my, conic-a, conic-b, conic-c, opacity,
2 pad) so each tile is a single sublane-aligned DMA; extended channels
are ``CE = C + 2`` [colors ‖ depth ‖ 1], so image / expected depth /
alpha come from one accumulation. Interpret mode (CPU) is used
automatically off-TPU so the same code path is testable everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mobgs_tpu.ops.projection import ProjectedSplats
from mobgs_tpu.ops.tiles import TILE, TileBins

P = TILE * TILE  # 256 pixels per tile
CH = 64          # minimum chunk unit; max_per_tile must divide by this
CH_MAX = 128     # preferred chunk size: per-chunk loop iterations carry
                 # ~0.7us fixed cost on the single TensorCore, so fewer,
                 # larger chunks win (measured 1.55x fwd at 128 vs 64)
R = 8            # packed record rows (6 used + 2 pad)


def _pick_chunk(K: int) -> int:
    """Largest chunk size <= CH_MAX that divides max_per_tile."""
    for c in (CH_MAX, 64):
        if K % c == 0:
            return c
    raise AssertionError(f"max_per_tile={K} must be a multiple of {CH}")
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
TRANS_EPS = 1e-4


def _tile_pixel_grid(ntx: int, t, dtype=jnp.float32):
    """GLOBAL pixel coordinates for tile ``t``, [1, P].

    ``t`` is the tile's GLOBAL id (column 1 of the SMEM counts array) —
    NOT ``pl.program_id(0)``: under tile-axis shard_map each shard's
    program ids restart at 0 while its rows keep their global ids."""
    ox = ((t % ntx) * TILE).astype(dtype)
    oy = ((t // ntx) * TILE).astype(dtype)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (lin % TILE).astype(dtype) + 0.5 + ox
    py = (lin // TILE).astype(dtype) + 0.5 + oy
    return px, py


def _chunk_geom(rec, px, py):
    """Shared per-chunk geometry. rec [R, ch] -> [ch, P] pieces."""
    mx, my = rec[0][:, None], rec[1][:, None]
    ca, cb, cc = rec[2][:, None], rec[3][:, None], rec[4][:, None]
    dx = px - mx
    dy = py - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    expneg = jnp.exp(-sigma)
    return dx, dy, sigma, expneg


def _chunk_alpha_of(op_row, expneg, sigma, live):
    """Gated alpha for one opacity row (main or fused subset)."""
    raw = op_row[:, None] * expneg
    alpha = jnp.minimum(ALPHA_MAX, raw)
    valid = (sigma >= 0) & (alpha > ALPHA_MIN) & live[:, None]
    return jnp.where(valid, alpha, 0.0), valid, raw


def _excl_prefix_prod(one_m_alpha, ch):
    """Exclusive prefix product along axis 0 of [ch, P].

    Hillis-Steele doubling scan: log2(ch) shifted multiplies instead of
    ch-1 serial ones (the per-chunk loop runs serially on the single
    TensorCore, so op count dominates)."""
    x = one_m_alpha
    sh = 1
    while sh < ch:
        pad = jnp.ones((sh, x.shape[1]), x.dtype)
        x = x * jnp.concatenate([pad, x[:-sh]], axis=0)
        sh *= 2
    total = x[ch - 1]
    excl = jnp.concatenate([jnp.ones((1, x.shape[1]), x.dtype), x[:-1]], 0)
    return excl, total


def _incl_prefix_sum(u, ch):
    """Inclusive prefix sum along axis 0 of [ch, P] (doubling scan)."""
    x = u
    sh = 1
    while sh < ch:
        pad = jnp.zeros((sh, x.shape[1]), x.dtype)
        x = x + jnp.concatenate([pad, x[:-sh]], axis=0)
        sh *= 2
    return x


def _fwd_kernel(ntx, ch, count_ref, rec_ref, col_ref, out_ref, acc, trans):
    n_chunks = rec_ref.shape[1]
    count = count_ref[pl.program_id(0), 0]
    px, py = _tile_pixel_grid(ntx, count_ref[pl.program_id(0), 1])

    acc[...] = jnp.zeros_like(acc)
    trans[...] = jnp.ones_like(trans)

    def cond(state):
        j, tmax = state
        return (j < n_chunks) & (j * ch < count) & (tmax > TRANS_EPS)

    def body(state):
        j, _ = state
        s = j * ch
        live = (jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0)[:, 0] + s) < count
        rec = rec_ref[0, j, :, :]                  # [R, ch]
        col = col_ref[0, j, :, :]                  # [ch, CE]
        dx, dy, sigma, expneg = _chunk_geom(rec, px, py)
        alpha, _, _ = _chunk_alpha_of(rec[5], expneg, sigma, live)
        prefix, total = _excl_prefix_prod(1.0 - alpha, ch)
        w = alpha * prefix * trans[...]            # [ch, P]
        acc[...] += jax.lax.dot_general(
            w, col, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [P, CE]
        new_trans = trans[...] * total
        trans[...] = new_trans
        return j + 1, jnp.max(new_trans)

    jax.lax.while_loop(cond, body, (0, jnp.float32(1.0)))
    out_ref[0, :, :] = acc[...]


def _fwd_kernel_sub(ntx, ch, count_ref, rec_ref, col_ref, out_ref, out2_ref,
                    acc, trans, trans2, acc2):
    """Fused variant: a SECOND transmittance chain over the subset-
    masked opacities (record row 6) rides the same chunk loop and
    writes its alpha into a separate [T, 1, P] output — the fused
    equivalent of the reference's 1-channel dynamic-alpha launch
    (renderer :158-177) sharing pack, DMA, and the loop."""
    n_chunks = rec_ref.shape[1]
    count = count_ref[pl.program_id(0), 0]
    px, py = _tile_pixel_grid(ntx, count_ref[pl.program_id(0), 1])

    acc[...] = jnp.zeros_like(acc)
    acc2[...] = jnp.zeros_like(acc2)
    trans[...] = jnp.ones_like(trans)
    trans2[...] = jnp.ones_like(trans2)

    def cond(state):
        j, tmax = state
        return (j < n_chunks) & (j * ch < count) & (tmax > TRANS_EPS)

    def body(state):
        j, _ = state
        s = j * ch
        live = (jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0)[:, 0] + s) < count
        rec = rec_ref[0, j, :, :]                  # [R, ch]
        col = col_ref[0, j, :, :]                  # [ch, CE]
        dx, dy, sigma, expneg = _chunk_geom(rec, px, py)

        alpha, _, _ = _chunk_alpha_of(rec[5], expneg, sigma, live)
        prefix, total = _excl_prefix_prod(1.0 - alpha, ch)
        w = alpha * prefix * trans[...]            # [ch, P]
        acc[...] += jax.lax.dot_general(
            w, col, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [P, CE]
        new_trans = trans[...] * total
        trans[...] = new_trans

        alpha_s, _, _ = _chunk_alpha_of(rec[6], expneg, sigma, live)
        prefix_s, total_s = _excl_prefix_prod(1.0 - alpha_s, ch)
        w_s = alpha_s * prefix_s * trans2[...]
        acc2[...] += jax.lax.dot_general(
            jnp.ones((1, ch), jnp.float32), w_s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [1, P]
        new_t2 = trans2[...] * total_s
        trans2[...] = new_t2
        return j + 1, jnp.maximum(jnp.max(new_trans), jnp.max(new_t2))

    jax.lax.while_loop(cond, body, (0, jnp.float32(1.0)))
    out_ref[0, :, :] = acc[...]
    out2_ref[0, :, :] = acc2[...]


def _bwd_kernel(ntx, ch, count_ref, rec_ref, col_ref, out_ref, g_ref,
                grec_ref, gcol_ref, trans, gacc, gdt):
    n_chunks = rec_ref.shape[1]
    count = count_ref[pl.program_id(0), 0]
    px, py = _tile_pixel_grid(ntx, count_ref[pl.program_id(0), 1])

    g = g_ref[0, :, :]                    # [P, CE]
    out_tot = out_ref[0, :, :]            # [P, CE] forward output (no bg)
    # Σ_ch g·C_total per pixel, via ONE MXU matvec stored in scratch.
    # Expressed as a lane-axis jnp.sum it gets rematerialized inside
    # every loop iteration and costs ~23µs each (73ms/pass measured);
    # hoisted through scratch the whole backward drops to ~6.5ms.
    gdt[...] = jax.lax.dot_general(
        g * out_tot, jnp.ones((g.shape[1], 1), jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(1, -1)

    trans[...] = jnp.ones_like(trans)
    gacc[...] = jnp.zeros_like(gacc)
    grec_ref[...] = jnp.zeros_like(grec_ref)
    gcol_ref[...] = jnp.zeros_like(gcol_ref)

    def cond(state):
        j, tmax = state
        return (j < n_chunks) & (j * ch < count) & (tmax > TRANS_EPS)

    def body(state):
        j, _ = state
        s = j * ch
        live = (jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0)[:, 0] + s) < count
        rec = rec_ref[0, j, :, :]                  # [R, ch]
        col = col_ref[0, j, :, :]                  # [ch, CE]
        ca, cb, cc = rec[2][:, None], rec[3][:, None], rec[4][:, None]

        dx, dy, sigma, expneg = _chunk_geom(rec, px, py)
        alpha, valid, raw = _chunk_alpha_of(rec[5], expneg, sigma, live)
        prefix, total = _excl_prefix_prod(1.0 - alpha, ch)
        T_i = prefix * trans[...]                  # [ch, P]
        w = alpha * T_i

        cg = jax.lax.dot_general(col, g, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [ch,P]
        u = w * cg
        gacc_incl = _incl_prefix_sum(u, ch) + gacc[...]  # [ch, P] (+carry)

        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        s_term = (gdt[...] - gacc_incl) / one_m
        g_alpha = T_i * cg - s_term
        gate = valid & (raw < ALPHA_MAX)
        g_alpha = jnp.where(gate, g_alpha, 0.0)

        g_sigma = -alpha * g_alpha                 # [ch, P]
        # Reduce the six per-Gaussian integrals over pixels with ONE MXU
        # matvec ([6ch, P] @ [P, 1]) — lane-axis jnp.sum reductions are
        # ~15x slower on this core (measured 67ms -> <5ms).
        panels = jnp.concatenate([
            g_sigma * (ca * dx + cb * dy),
            g_sigma * (cc * dy + cb * dx),
            g_sigma * 0.5 * dx * dx,
            g_sigma * dx * dy,
            g_sigma * 0.5 * dy * dy,
            jnp.where(gate, expneg * g_alpha, 0.0),
        ], axis=0)                                 # [6ch, P]
        red = jax.lax.dot_general(
            panels, jnp.ones((panels.shape[1], 1), jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [6ch, 1]
        grec = jnp.concatenate(
            [red.reshape(6, ch), jnp.zeros((2, ch), jnp.float32)], axis=0)
        grec_ref[0, j, :, :] = grec                # [R, ch]
        gcol_ref[0, j, :, :] = jax.lax.dot_general(
            w, g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        new_trans = trans[...] * total
        trans[...] = new_trans
        gacc[...] = gacc_incl[ch - 1][None]
        return j + 1, jnp.max(new_trans)

    jax.lax.while_loop(cond, body, (0, jnp.float32(1.0)))


def _bwd_kernel_sub(ntx, ch, count_ref, rec_ref, col_ref, out_ref, out2_ref,
                    g_ref, g2_ref, grec_ref, gcol_ref, trans, gacc, gdt,
                    trans2, gacc2, gdt2):
    """Fused backward: replays BOTH transmittance chains; the subset
    chain's opacity gradient lands in record row 6 and its sigma
    gradient folds into the shared conic/mean rows."""
    n_chunks = rec_ref.shape[1]
    count = count_ref[pl.program_id(0), 0]
    px, py = _tile_pixel_grid(ntx, count_ref[pl.program_id(0), 1])

    g = g_ref[0, :, :]                    # [P, CE]
    g2 = g2_ref[0, :, :]                  # [1, P]
    out_tot = out_ref[0, :, :]            # [P, CE]
    gdt[...] = jax.lax.dot_general(
        g * out_tot, jnp.ones((g.shape[1], 1), jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(1, -1)
    gdt2[...] = g2 * out2_ref[0, :, :]    # [1, P]

    trans[...] = jnp.ones_like(trans)
    trans2[...] = jnp.ones_like(trans2)
    gacc[...] = jnp.zeros_like(gacc)
    gacc2[...] = jnp.zeros_like(gacc2)
    grec_ref[...] = jnp.zeros_like(grec_ref)
    gcol_ref[...] = jnp.zeros_like(gcol_ref)

    def cond(state):
        j, tmax = state
        return (j < n_chunks) & (j * ch < count) & (tmax > TRANS_EPS)

    def body(state):
        j, _ = state
        s = j * ch
        live = (jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0)[:, 0] + s) < count
        rec = rec_ref[0, j, :, :]                  # [R, ch]
        col = col_ref[0, j, :, :]                  # [ch, CE]
        ca, cb, cc = rec[2][:, None], rec[3][:, None], rec[4][:, None]

        dx, dy, sigma, expneg = _chunk_geom(rec, px, py)

        # main chain
        alpha, valid, raw = _chunk_alpha_of(rec[5], expneg, sigma, live)
        prefix, total = _excl_prefix_prod(1.0 - alpha, ch)
        T_i = prefix * trans[...]
        w = alpha * T_i
        cg = jax.lax.dot_general(col, g, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        u = w * cg
        gacc_incl = _incl_prefix_sum(u, ch) + gacc[...]
        s_term = (gdt[...] - gacc_incl) / jnp.maximum(1.0 - alpha, 1e-6)
        g_alpha = T_i * cg - s_term
        gate = valid & (raw < ALPHA_MAX)
        g_alpha = jnp.where(gate, g_alpha, 0.0)
        g_sigma = -alpha * g_alpha
        new_trans = trans[...] * total
        trans[...] = new_trans
        gacc[...] = gacc_incl[ch - 1][None]

        # fused subset chain
        alpha_s, valid_s, raw_s = _chunk_alpha_of(rec[6], expneg, sigma,
                                                  live)
        prefix_s, total_s = _excl_prefix_prod(1.0 - alpha_s, ch)
        T_s = prefix_s * trans2[...]
        w_s = alpha_s * T_s
        u_s = w_s * g2
        gacc2_incl = _incl_prefix_sum(u_s, ch) + gacc2[...]
        s_term_s = (gdt2[...] - gacc2_incl) / jnp.maximum(
            1.0 - alpha_s, 1e-6)
        g_alpha_s = T_s * g2 - s_term_s
        gate_s = valid_s & (raw_s < ALPHA_MAX)
        g_alpha_s = jnp.where(gate_s, g_alpha_s, 0.0)
        g_sigma = g_sigma - alpha_s * g_alpha_s
        new_t2 = trans2[...] * total_s
        trans2[...] = new_t2
        gacc2[...] = gacc2_incl[ch - 1][None]

        panels = jnp.concatenate([
            g_sigma * (ca * dx + cb * dy),
            g_sigma * (cc * dy + cb * dx),
            g_sigma * 0.5 * dx * dx,
            g_sigma * dx * dy,
            g_sigma * 0.5 * dy * dy,
            jnp.where(gate, expneg * g_alpha, 0.0),
            jnp.where(gate_s, expneg * g_alpha_s, 0.0),
        ], axis=0)                                 # [7ch, P]
        red = jax.lax.dot_general(
            panels, jnp.ones((panels.shape[1], 1), jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [7ch, 1]
        grec = jnp.concatenate(
            [red.reshape(7, ch), jnp.zeros((1, ch), jnp.float32)], axis=0)
        grec_ref[0, j, :, :] = grec                # [R, ch]
        gcol_ref[0, j, :, :] = jax.lax.dot_general(
            w, g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        return j + 1, jnp.maximum(jnp.max(new_trans), jnp.max(new_t2))

    jax.lax.while_loop(cond, body, (0, jnp.float32(1.0)))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_shard_info(n_tiles: int):
    """(mesh, axis, n_shards) when tile-axis sharding is enabled and the
    tile count splits evenly — None otherwise (late import: parallel is
    a higher layer)."""
    from mobgs_tpu.parallel.mesh import tile_shard_info
    return tile_shard_info(n_tiles)


def _gather_records(bins: TileBins, splats: ProjectedSplats,
                    opacities: jnp.ndarray, colors_ext: jnp.ndarray,
                    ch: int, sub_opacities: jnp.ndarray | None = None):
    """Gather per-tile records + colors with ONE row-major gather.

    The scalar records and the channel columns ride a single [N, R+CE]
    row-contiguous table so the forward is one row gather and — the part
    that matters — the backward is ONE scatter-add over the [T, K]
    entry indices instead of two (the record rows' column-axis scatter
    plus the colors' row scatter; measured ~5 ms/geometry combined at
    protocol scale, the largest per-geometry slice after binning).

    Returns (recs [T, NC, R, ch], colors_t [T, NC, ch, CE]); record row
    6 carries the fused subset-pass opacities when given."""
    ids = bins.gauss_ids                     # [T, K]
    T, K = ids.shape
    zeros = jnp.zeros_like(opacities)
    table = jnp.stack([
        splats.means2d[:, 0], splats.means2d[:, 1],
        splats.conics[:, 0], splats.conics[:, 1], splats.conics[:, 2],
        opacities,
        zeros if sub_opacities is None else sub_opacities,
        zeros,
    ], axis=1)                               # [N, R]
    table = jnp.concatenate([table, colors_ext], axis=1)  # [N, R+CE]
    gat = table[ids]                         # [T, K, R+CE]
    CE = colors_ext.shape[1]
    gat = gat.reshape(T, K // ch, ch, R + CE)
    recs = gat[..., :R].transpose(0, 1, 3, 2)       # [T, NC, R, ch]
    colors_t = gat[..., R:]                          # [T, NC, ch, CE]
    return recs, colors_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _composite_core(n_tiles: int, K: int, ntx: int, ch: int,
                    recs: jnp.ndarray, colors_t: jnp.ndarray,
                    counts: jnp.ndarray) -> jnp.ndarray:
    return _composite_fwd_call(n_tiles, K, ntx, ch, recs, colors_t, counts)


def _composite_fwd_call(n_tiles, K, ntx, ch, recs, colors_t, counts):
    CE = colors_t.shape[-1]
    NC = K // ch
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, ntx, ch),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # counts [T,1]
            pl.BlockSpec((1, NC, R, ch), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, NC, ch, CE), lambda t: (t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P, CE), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, CE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P, CE), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32)],
        interpret=_interpret(),
    )(counts, recs, colors_t)
    return out


def _composite_fwd(n_tiles, K, ntx, ch, recs, colors_t, counts):
    out = _composite_fwd_call(n_tiles, K, ntx, ch, recs, colors_t, counts)
    return out, (recs, colors_t, counts, out)


def _composite_bwd(n_tiles, K, ntx, ch, res, g):
    recs, colors_t, counts, out = res
    CE = colors_t.shape[-1]
    NC = K // ch
    pspec = pl.BlockSpec((1, P, CE), lambda t: (t, 0, 0))
    grec, gcol = pl.pallas_call(
        functools.partial(_bwd_kernel, ntx, ch),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NC, R, ch), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, NC, ch, CE), lambda t: (t, 0, 0, 0)),
            pspec, pspec,
        ],
        out_specs=(pl.BlockSpec((1, NC, R, ch), lambda t: (t, 0, 0, 0)),
                   pl.BlockSpec((1, NC, ch, CE), lambda t: (t, 0, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((n_tiles, NC, R, ch), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, NC, ch, CE), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((1, P), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32)],
        interpret=_interpret(),
    )(counts, recs, colors_t, out, g)
    # mean gradients carry a -(dsigma/d dx) sign (rows 0, 1)
    sign = jnp.asarray([-1.0, -1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0])
    grec = grec * sign[None, None, :, None]
    return grec, gcol, None


_composite_core.defvjp(_composite_fwd, _composite_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _composite_core_sub(n_tiles: int, K: int, ntx: int, ch: int,
                        recs: jnp.ndarray, colors_t: jnp.ndarray,
                        counts: jnp.ndarray):
    return _composite_sub_fwd_call(n_tiles, K, ntx, ch, recs, colors_t,
                                   counts)


def _composite_sub_fwd_call(n_tiles, K, ntx, ch, recs, colors_t, counts):
    CE = colors_t.shape[-1]
    NC = K // ch
    out, out2 = pl.pallas_call(
        functools.partial(_fwd_kernel_sub, ntx, ch),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NC, R, ch), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, NC, ch, CE), lambda t: (t, 0, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, P, CE), lambda t: (t, 0, 0)),
                   pl.BlockSpec((1, 1, P), lambda t: (t, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((n_tiles, P, CE), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((P, CE), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32)],
        interpret=_interpret(),
    )(counts, recs, colors_t)
    return out, out2


def _composite_sub_fwd(n_tiles, K, ntx, ch, recs, colors_t, counts):
    out, out2 = _composite_sub_fwd_call(n_tiles, K, ntx, ch, recs,
                                        colors_t, counts)
    return (out, out2), (recs, colors_t, counts, out, out2)


def _composite_sub_bwd(n_tiles, K, ntx, ch, res, gs):
    recs, colors_t, counts, out, out2 = res
    g, g2 = gs
    CE = colors_t.shape[-1]
    NC = K // ch
    pspec = pl.BlockSpec((1, P, CE), lambda t: (t, 0, 0))
    p2spec = pl.BlockSpec((1, 1, P), lambda t: (t, 0, 0))
    grec, gcol = pl.pallas_call(
        functools.partial(_bwd_kernel_sub, ntx, ch),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NC, R, ch), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, NC, ch, CE), lambda t: (t, 0, 0, 0)),
            pspec, p2spec, pspec, p2spec,
        ],
        out_specs=(pl.BlockSpec((1, NC, R, ch), lambda t: (t, 0, 0, 0)),
                   pl.BlockSpec((1, NC, ch, CE), lambda t: (t, 0, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((n_tiles, NC, R, ch), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, NC, ch, CE), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((1, P), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32),
                        pltpu.VMEM((1, P), jnp.float32)],
        interpret=_interpret(),
    )(counts, recs, colors_t, out, out2, g, g2)
    # rows 0, 1 carry the -(dsigma/d dx) sign; row 6 is the fused
    # subset-pass opacity gradient
    sign = jnp.asarray([-1.0, -1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0])
    grec = grec * sign[None, None, :, None]
    return grec, gcol, None


_composite_core_sub.defvjp(_composite_sub_fwd, _composite_sub_bwd)


def composite_tiles_pallas(bins: TileBins, splats: ProjectedSplats,
                           colors: jnp.ndarray, opacities: jnp.ndarray,
                           width: int, height: int,
                           background: jnp.ndarray | None = None,
                           tile_chunk: int = 0,
                           sub_opacities: jnp.ndarray | None = None,
                           want_depth: bool = True,
                           want_alpha: bool = True):
    """Drop-in replacement for `raster_jax.composite_tiles`.

    ``sub_opacities`` [N] runs a FUSED second transmittance chain (the
    subset-masked alpha pass) inside the same kernel launch; its alpha
    map is returned as a fourth output. One pack/gather serves both
    chains and the backward replays them together.

    ``want_depth`` / ``want_alpha`` drop the extended depth/weight
    columns: the kernel is opaque to XLA so unused outputs cannot be
    dead-code-eliminated from outside — a pass consuming only the image
    (the train step's latent renders) otherwise pays the extra columns
    through the colors gather, the per-chunk MXU matmul, and the
    backward's gcol scatter. Depth requires the weight column
    (normalization); a background requires it too (blending).
    """
    assert want_alpha or not want_depth, "depth needs the weight column"
    assert want_alpha or background is None, "background blending needs alpha"
    ntx, nty = int(bins.n_tiles_x), int(bins.n_tiles_y)
    n_tiles = ntx * nty
    K = bins.gauss_ids.shape[1]
    assert K % CH == 0, f"max_per_tile must be a multiple of {CH}"
    ch = _pick_chunk(K)
    N, C = colors.shape
    dt = colors.dtype
    has_sub = sub_opacities is not None

    ext = [colors]
    if want_depth:
        ext.append(splats.depths[:, None])
    if want_alpha:
        ext.append(jnp.ones((N, 1), dt))
    colors_ext = jnp.concatenate(ext, axis=1) if len(ext) > 1 else colors
    CE = C + int(want_depth) + int(want_alpha)
    recs, colors_t = _gather_records(bins, splats, opacities, colors_ext,
                                     ch, sub_opacities)
    # SMEM control array: column 0 = per-tile entry count, column 1 =
    # GLOBAL tile id (pixel coordinates derive from it, so the kernels
    # stay correct when shard_map hands each device a tile slice whose
    # program ids restart at 0)
    counts2 = jnp.stack(
        [bins.counts.astype(jnp.int32),
         jnp.arange(n_tiles, dtype=jnp.int32)], axis=1)

    # tile-axis shard_map (round-4 VERDICT item 4): with tile sharding
    # enabled (parallel.mesh.enable_tile_sharding) and the tile count
    # divisible by the shard axis, each device composites its own tile
    # rows with the SAME Mosaic kernel — XLA cannot partition an opaque
    # custom call, so the split is explicit. The custom VJP sits inside
    # the shard_map region: forward shards the [T, ...] operands, and
    # the backward's per-(tile, slot) gradient records come back
    # tile-sharded; the caller's scatter-add onto the Gaussian axis is
    # where GSPMD inserts the cross-device reduce.
    shard = _tile_shard_info(n_tiles)
    if shard is not None:
        mesh, axis, S = shard
        from jax.sharding import PartitionSpec
        spec = PartitionSpec(axis)
        if has_sub:
            out, out2 = jax.shard_map(
                functools.partial(_composite_core_sub, n_tiles // S, K,
                                  ntx, ch),
                mesh=mesh, in_specs=(spec, spec, spec),
                out_specs=(spec, spec), check_vma=False,
            )(recs, colors_t, counts2)
        else:
            out = jax.shard_map(
                functools.partial(_composite_core, n_tiles // S, K,
                                  ntx, ch),
                mesh=mesh, in_specs=(spec, spec, spec),
                out_specs=spec, check_vma=False,
            )(recs, colors_t, counts2)
    elif has_sub:
        out, out2 = _composite_core_sub(n_tiles, K, ntx, ch, recs,
                                        colors_t, counts2)
    else:
        out = _composite_core(n_tiles, K, ntx, ch, recs, colors_t,
                              counts2)

    full = out.reshape(nty, ntx, TILE, TILE, CE)
    full = full.transpose(0, 2, 1, 3, 4).reshape(nty * TILE, ntx * TILE, CE)
    full = full[:height, :width]
    image = full[..., :C]
    if want_alpha:
        # The MXU accumulates the weight column at TPU default
        # (bf16-input) precision, so Σw can overshoot 1 by ~1e-3;
        # gsplat's alpha is ≤ 1 by construction, clamp to match.
        alpha = jnp.minimum(full[..., C + int(want_depth)], 1.0)
    else:
        alpha = jnp.zeros(image.shape[:2], jnp.float32)
    if background is not None:
        image = image + background[None, None, :] * (1.0 - alpha[..., None])
    if want_depth:
        exp_depth = full[..., C] / jnp.maximum(alpha, 1e-10)
    else:
        exp_depth = jnp.zeros(image.shape[:2], jnp.float32)
    if has_sub:
        sub = out2.reshape(nty, ntx, TILE, TILE)
        sub = sub.transpose(0, 2, 1, 3).reshape(nty * TILE, ntx * TILE)
        sub_alpha = jnp.minimum(sub[:height, :width], 1.0)
        return image, alpha, exp_depth, sub_alpha
    return image, alpha, exp_depth
