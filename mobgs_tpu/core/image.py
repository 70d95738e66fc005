"""Image quality metrics/losses in pure JAX.

Parity targets: MoBGS `utils/loss_utils.py:351-382` (SSIM with an 11x11
Gaussian window, sigma=1.5, zero padding, per-channel depthwise conv)
and `utils/image_utils.py:17` (masked PSNR). The SSIM here matches the
reference's torch implementation (zero-padded convolutions included) so
loss values line up numerically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    w2d = np.outer(g, g)
    return w2d.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _gaussian_1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(img: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Zero-padded depthwise Gaussian blur, img [B, C, H, W].

    The reference's 2D window is `outer(g, g)` of a 1D Gaussian
    (loss_utils.py:351-360) — exactly separable, so two 1D convs give
    bit-equal-to-rounding results at k+k taps instead of k*k (the 2D
    3-channel f32 conv was ~40 ms/step fwd+bwd on the v5e)."""
    C = img.shape[1]
    k = window_size
    g = jnp.asarray(_gaussian_1d(k))
    kh = jnp.broadcast_to(g[None, None, None, :], (C, 1, 1, k))
    kv = jnp.broadcast_to(g[None, None, :, None], (C, 1, k, 1))
    dn = ("NCHW", "OIHW", "NCHW")
    out = jax.lax.conv_general_dilated(
        img, kh, window_strides=(1, 1),
        padding=[(0, 0), (k // 2, k // 2)],
        dimension_numbers=dn, feature_group_count=C)
    return jax.lax.conv_general_dilated(
        out, kv, window_strides=(1, 1),
        padding=[(k // 2, k // 2), (0, 0)],
        dimension_numbers=dn, feature_group_count=C)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         size_average: bool = True) -> jnp.ndarray:
    """SSIM on [B, C, H, W] (or [C, H, W]) images in [0, 1]."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    mu1 = _depthwise_blur(img1, window_size)
    mu2 = _depthwise_blur(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window_size) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window_size) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """PSNR over flattened images; per-batch-item mean like the reference."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    if mask is None:
        mse = jnp.mean((img1 - img2) ** 2, axis=(1, 2, 3))
    else:
        if mask.ndim == 3:
            mask = mask[None]
        mask = jnp.broadcast_to(mask, img1.shape)
        mse = jnp.sum(((img1 - img2) * mask) ** 2, axis=(1, 2, 3)) / (
            jnp.sum(mask, axis=(1, 2, 3)) + 1e-8)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
