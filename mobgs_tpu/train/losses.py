"""Training losses (parity: `utils/loss_utils.py` + train.py:597-676).

Includes a torch-`F.grid_sample`-compatible bilinear sampler
(align_corners=False, border padding) used by the flow-warp consistency
loss, so loss values line up with the reference numerically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mobgs_tpu.core.image import ssim as _ssim


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray,
            mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Plain or masked mean absolute error (loss_utils.py:233-239)."""
    if mask is None:
        return jnp.mean(jnp.abs(pred - gt))
    mask = jnp.broadcast_to(mask, gt.shape)
    return jnp.sum(jnp.abs((pred - gt) * mask)) / (jnp.sum(mask) + 1e-8)


def ssim_loss_term(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return _ssim(pred, gt)


def entropy_loss(alpha: jnp.ndarray) -> jnp.ndarray:
    """Σ binary entropy — pushes alpha to 0/1 (loss_utils.py:264-276)."""
    eps = 1e-6
    alpha = jnp.clip(alpha, 0.0, 1.0)  # guard fp overshoot past 1.0
    return -jnp.sum(alpha * jnp.log(alpha + eps)
                    + (1 - alpha) * jnp.log(1 - alpha + eps))


def sparsity_loss(alpha: jnp.ndarray) -> jnp.ndarray:
    """Σ alpha² (loss_utils.py:285-295)."""
    return jnp.sum(alpha ** 2)


def binary_dice_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray,
                     batch_dice: bool = False, from_logits: bool = True,
                     log_loss: bool = False, smooth: float = 0.0,
                     eps: float = 1e-7) -> jnp.ndarray:
    """Binary Dice loss (loss_utils.py:384-443 `BinaryDiceLoss`).

    Constructed by the reference at train.py:287 (never invoked after —
    ported for loss-library completeness). y_pred [N,C,H,W]-like with
    leading batch axis; y_true broadcastable after per-sample flatten.
    """
    if from_logits:
        # logsigmoid().exp() of the reference == sigmoid, but the
        # log-exp form is the numerically-stable one at extremes
        y_pred = jnp.exp(jax.nn.log_sigmoid(y_pred))
    bs = y_pred.shape[0]
    y_pred = y_pred.reshape(bs, -1)
    y_true = y_true.reshape(bs, -1).astype(y_pred.dtype)
    axis = None if batch_dice else -1
    intersection = jnp.sum(y_pred * y_true, axis=axis)
    cardinality = jnp.sum(y_pred + y_true, axis=axis)
    dice = (2.0 * intersection + smooth) / jnp.maximum(
        cardinality + smooth, eps)
    losses = -jnp.log(jnp.maximum(dice, eps)) if log_loss else 1.0 - dice
    return jnp.mean(losses)


def grid_sample_border(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.functional.grid_sample parity (bilinear, border padding,
    align_corners=False).

    Args:
      img: [C, H, W].
      grid: [Ho, Wo, 2] normalized coords in [-1, 1] (x, y order).

    Returns:
      [C, Ho, Wo].
    """
    C, H, W = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    # align_corners=False: -1..1 spans pixel *edges*
    x = ((gx + 1.0) * W - 1.0) * 0.5
    y = ((gy + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def at(ix, iy):
        ix = jnp.clip(ix.astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(iy.astype(jnp.int32), 0, H - 1)
        return img[:, iy, ix]  # [C, Ho, Wo]

    v00 = at(x0, y0)
    v10 = at(x0 + 1, y0)
    v01 = at(x0, y0 + 1)
    v11 = at(x0 + 1, y0 + 1)
    top = v00 * (1 - wx) + v10 * wx
    bot = v01 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def normalize_coords(coords: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Pixel coord map → torch grid_sample coords, exactly the reference's
    normalization (train.py:660-663): c/(S-1) * 2 - 1."""
    gx = coords[..., 0] / (width - 1) * 2.0 - 1.0
    gy = coords[..., 1] / (height - 1) * 2.0 - 1.0
    return jnp.stack([gx, gy], axis=-1)


# ---------------------------------------------------------------------------
# Fused K-warp bilinear sampler (the flow-loss hot path).
#
# Semantics: torch grid_sample(bilinear, border, align_corners=False)
# composed with the reference's pixel→grid normalization (train.py:660-663),
# i.e. source coords  x = c_x * W/(W-1) - 0.5.
#
# TPU design: [C,H,W] 2D gathers (4 per warp) plus their autodiff
# scatter-add backward dominate the flow-ON step. Instead:
#  - flatten each image to [P, C] and pack the 2x2 bilinear footprint into
#    one row, C4[i] = img[i] ‖ img[i+1] ‖ img[i+W] ‖ img[i+W+1] (cheap
#    rolls) — the forward needs ONE row gather per warp;
#  - the custom-VJP backward is ONE scatter-add per warp into the packed
#    space, folded back to image space with the inverse rolls (exact
#    adjoint);
#  - the K warps stay STATICALLY UNROLLED. Measured on v5e at protocol
#    shapes (18 warps of 512x288x3, fwd+bwd): [C,H,W] autodiff 234 ms →
#    flat-index autodiff 197 ms → packed-row unrolled 91 ms; merging all
#    K warps into one [K*P]-index mega gather/scatter REGRESSES to
#    345 ms — the same lowering cliff as vmap-batched gather/scatter
#    (CLAUDE.md invariant), so keep per-warp ops.
#
# Boundary note: clamping x0 to W-2 with wx = clip(x)-x0 reproduces
# border-padding VALUES exactly (wx saturates to 0/1 so the clamped
# neighbor wins); coord grads are zeroed outside [0, W-1] like torch. The
# only divergence is a measure-zero set (coords exactly on the far
# border), where this returns the one-sided derivative.
# ---------------------------------------------------------------------------

def _warp_prep(coords_k: jnp.ndarray, width: int, height: int):
    """[H,W,2] pixel coords → flat row indices + bilinear weights."""
    P = height * width
    x = coords_k[..., 0] * (width / (width - 1.0)) - 0.5
    y = coords_k[..., 1] * (height / (height - 1.0)) - 0.5
    inb_x = (x >= 0.0) & (x <= width - 1.0)
    inb_y = (y >= 0.0) & (y <= height - 1.0)
    x = jnp.clip(x, 0.0, width - 1.0)
    y = jnp.clip(y, 0.0, height - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, width - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, height - 2)
    wx = (x - x0).reshape(P, 1)
    wy = (y - y0).reshape(P, 1)
    idx = (y0 * width + x0).reshape(P)
    return idx, wx, wy, inb_x.reshape(P), inb_y.reshape(P)


def _pack_footprint(img: jnp.ndarray, width: int) -> jnp.ndarray:
    """[P,C] → [P,4C] rows holding each pixel's 2x2 footprint."""
    r1 = jnp.roll(img, -1, axis=0)
    rw = jnp.roll(img, -width, axis=0)
    rw1 = jnp.roll(img, -width - 1, axis=0)
    return jnp.concatenate([img, r1, rw, rw1], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def warp_images(imgs: jnp.ndarray, coords: jnp.ndarray,
                width: int, height: int) -> jnp.ndarray:
    """Bilinear-warp K images by K pixel-coord maps (packed-row gathers,
    statically unrolled over K — see module note above).

    Args:
      imgs: [K, H, W, C].
      coords: [K, H, W, 2] source pixel coordinates (x, y).

    Returns:
      [K, H, W, C]; out[k, i, j] = imgs[k] sampled at coords[k, i, j]
      with torch border semantics (see module note above).
    """
    return _warp_impl(imgs, coords, width, height)[0]


def _warp_impl(imgs, coords, width, height):
    K, H, W, C = imgs.shape
    outs, blks = [], []
    for k in range(K):
        packed = _pack_footprint(imgs[k].reshape(H * W, C), width)
        idx, wx, wy, _, _ = _warp_prep(coords[k], width, height)
        blk = packed[idx]
        blks.append(blk)
        top = blk[:, 0 * C:1 * C] * (1 - wx) + blk[:, 1 * C:2 * C] * wx
        bot = blk[:, 2 * C:3 * C] * (1 - wx) + blk[:, 3 * C:4 * C] * wx
        outs.append((top * (1 - wy) + bot * wy).reshape(H, W, C))
    return jnp.stack(outs), blks


def _warp_fwd(imgs, coords, width, height):
    out, blks = _warp_impl(imgs, coords, width, height)
    # the gathered footprints are residuals: the backward's coord grads
    # reuse them instead of re-packing + re-gathering (random-access)
    return out, (coords, jnp.stack(blks))


def _warp_bwd(width, height, res, g):
    coords, blks = res
    K, H, W, C = g.shape
    P = H * W
    g_img_l, g_coord_l = [], []
    for k in range(K):
        idx, wx, wy, inb_x, inb_y = _warp_prep(coords[k], width, height)
        gk = g[k].reshape(P, C)
        upd = jnp.concatenate([gk * (1 - wx) * (1 - wy), gk * wx * (1 - wy),
                               gk * (1 - wx) * wy, gk * wx * wy], axis=1)
        S = jnp.zeros((P, 4 * C), gk.dtype).at[idx].add(upd)
        g_im = (S[:, 0 * C:1 * C]
                + jnp.roll(S[:, 1 * C:2 * C], 1, axis=0)
                + jnp.roll(S[:, 2 * C:3 * C], W, axis=0)
                + jnp.roll(S[:, 3 * C:4 * C], W + 1, axis=0))
        blk = blks[k]
        v00, v10 = blk[:, 0 * C:1 * C], blk[:, 1 * C:2 * C]
        v01, v11 = blk[:, 2 * C:3 * C], blk[:, 3 * C:4 * C]
        dx = (v10 - v00) * (1 - wy) + (v11 - v01) * wy
        dy = (v01 - v00) * (1 - wx) + (v11 - v10) * wx
        gx = (jnp.sum(gk * dx, axis=-1)
              * jnp.where(inb_x, width / (width - 1.0), 0.0))
        gy = (jnp.sum(gk * dy, axis=-1)
              * jnp.where(inb_y, height / (height - 1.0), 0.0))
        g_img_l.append(g_im.reshape(H, W, C))
        g_coord_l.append(jnp.stack([gx, gy], axis=-1).reshape(H, W, 2))
    return jnp.stack(g_img_l), jnp.stack(g_coord_l)


warp_images.defvjp(_warp_fwd, _warp_bwd)


def flow_warp_loss(ori_image: jnp.ndarray, latent_imgs: jnp.ndarray,
                   latent_alphas: jnp.ndarray, d_alpha: jnp.ndarray,
                   exp2mid_coords: jnp.ndarray, mid2exp_coords: jnp.ndarray,
                   width: int, height: int) -> jnp.ndarray:
    """Bidirectional flow-warp photometric consistency (train.py:659-675).

    Args (single view; vmap over the batch outside):
      ori_image: [H, W, 3] mid-exposure render.
      latent_imgs: [E, H, W, 3] latent renders at each exposure.
      latent_alphas: [E, H, W] dynamic alphas at each exposure.
      d_alpha: [H, W] mid-time dynamic alpha.
      exp2mid_coords / mid2exp_coords: [E, H, W, 2] pixel coord maps.
    """
    # All 2E warps of the view ride ONE fused gather (and their backward
    # ONE fused scatter) via warp_images — see the packed-footprint note
    # above. Semantics match the reference's per-warp
    # grid_sample(border, align_corners=False) on normalized coords.
    E = latent_imgs.shape[0]
    ori_rep = jnp.broadcast_to(ori_image[None], (E,) + ori_image.shape)
    imgs_all = jnp.concatenate([ori_rep, latent_imgs], axis=0)
    coords_all = jnp.concatenate([exp2mid_coords, mid2exp_coords], axis=0)
    warped = warp_images(imgs_all, coords_all, width, height)

    # warp the mid render to each exposure via exp→mid coords; compare to
    # the latent render, masked by the latent dynamic alpha
    t1 = l1_loss(warped[:E], latent_imgs, mask=latent_alphas[..., None])

    # warp each latent render to mid via mid→exp coords; compare to the
    # mid render, masked by the mid dynamic alpha
    mask = jnp.broadcast_to(d_alpha[None, ..., None], (E,) + d_alpha.shape + (1,))
    t2 = l1_loss(warped[E:], ori_rep, mask=mask)
    return t1 + t2
