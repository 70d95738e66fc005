"""Brute-force O(N·pixels) differentiable splatting — correctness oracle.

Composites *every* Gaussian against *every* pixel in strict depth order.
Only for tests and tiny scenes; the production path is the tiled
rasterizer in `mobgs_tpu.ops.rasterize`. Semantics mirror gsplat's
`rasterization(..., render_mode="RGB+ED")` as used at reference
`gaussian_renderer/__init__.py:201-214`:

* alpha_i = min(0.99, opacity_i * exp(-σ_i)), skipped when < 1/255,
* front-to-back transmittance compositing,
* background blended as `color += bg * (1 - alpha)`,
* expected depth (ED) = accumulated depth / alpha.
"""

from __future__ import annotations

import jax.numpy as jnp

from mobgs_tpu.ops.projection import ProjectedSplats


def composite_bruteforce(splats: ProjectedSplats, colors: jnp.ndarray,
                         opacities: jnp.ndarray, width: int, height: int,
                         background: jnp.ndarray | None = None):
    """Returns (image [H, W, C], alpha [H, W], expected_depth [H, W])."""
    N, C = colors.shape
    order = jnp.argsort(jnp.where(splats.radii > 0, splats.depths, jnp.inf))
    m2d = splats.means2d[order]
    con = splats.conics[order]
    dep = splats.depths[order]
    col = colors[order]
    opa = opacities[order]
    live = (splats.radii[order] > 0)

    ys, xs = jnp.mgrid[0:height, 0:width]
    px = xs.astype(m2d.dtype) + 0.5
    py = ys.astype(m2d.dtype) + 0.5

    dx = px[None] - m2d[:, 0, None, None]  # [N, H, W]
    dy = py[None] - m2d[:, 1, None, None]
    sigma = (0.5 * (con[:, 0, None, None] * dx * dx
                    + con[:, 2, None, None] * dy * dy)
             + con[:, 1, None, None] * dx * dy)
    alpha = jnp.minimum(0.99, opa[:, None, None] * jnp.exp(-sigma))
    alpha = jnp.where((sigma >= 0) & (alpha > 1.0 / 255.0) & live[:, None, None],
                      alpha, 0.0)
    # exclusive cumulative transmittance along the depth-sorted axis
    trans = jnp.cumprod(1.0 - alpha, axis=0)
    trans = jnp.concatenate([jnp.ones_like(trans[:1]), trans[:-1]], axis=0)
    w = alpha * trans  # [N, H, W]
    img = jnp.einsum("nhw,nc->hwc", w, col)
    acc_alpha = jnp.sum(w, axis=0)
    acc_depth = jnp.einsum("nhw,n->hw", w, dep)
    if background is not None:
        img = img + background[None, None, :] * (1.0 - acc_alpha[..., None])
    exp_depth = acc_depth / jnp.maximum(acc_alpha, 1e-10)
    return img, acc_alpha, exp_depth
