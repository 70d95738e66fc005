"""Training losses (parity: `utils/loss_utils.py` + train.py:597-676).

Includes a torch-`F.grid_sample`-compatible bilinear sampler
(align_corners=False, border padding) used by the flow-warp consistency
loss, so loss values line up with the reference numerically.
"""

from __future__ import annotations

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
    def warp(img_hw3, coords):
        g = normalize_coords(coords, width, height)
        return grid_sample_border(img_hw3.transpose(2, 0, 1), g).transpose(1, 2, 0)

    # warp the mid render to each exposure via exp→mid coords; compare to
    # the latent render, masked by the latent dynamic alpha.
    # Static unroll over E: batched (vmapped) gather/scatter lowers ~3x
    # slower on TPU, and the grid_sample backward is a scatter-add.
    E = latent_imgs.shape[0]
    warped_mid = jnp.stack([warp(ori_image, exp2mid_coords[e])
                            for e in range(E)])
    t1 = l1_loss(warped_mid, latent_imgs, mask=latent_alphas[..., None])

    # warp each latent render to mid via mid→exp coords; compare to the
    # mid render, masked by the mid dynamic alpha
    warped_lat = jnp.stack([warp(latent_imgs[e], mid2exp_coords[e])
                            for e in range(E)])
    ori_rep = jnp.broadcast_to(ori_image[None], (E,) + ori_image.shape)
    mask = jnp.broadcast_to(d_alpha[None, ..., None], (E,) + d_alpha.shape + (1,))
    t2 = l1_loss(warped_lat, ori_rep, mask=mask)
    return t1 + t2
