"""gsplat-compatible API shim.

Exposes `rasterization(...)` and `fully_fused_projection(...)` with the
gsplat v1.4 call signatures the reference uses
(`gaussian_renderer/__init__.py:15` import surface), mapped onto the
TPU-native pipeline — so code written against gsplat ports mechanically.

Supported surface = what MoBGS actually calls (SURVEY.md §2.1):
packed=False, single camera, render_mode "RGB" / "RGB+ED", backgrounds
optional, C∈{1,2,3,9}; info dict carries "means2d" and "radii".
"""

from __future__ import annotations

import jax.numpy as jnp

from mobgs_tpu.ops import projection as _proj
from mobgs_tpu.ops.rasterize import RasterConfig, rasterize as _rasterize


def rasterization(means, quats, scales, opacities, colors,
                  viewmats, Ks, width, height,
                  backgrounds=None, packed=False, render_mode="RGB",
                  config: RasterConfig = RasterConfig()):
    """gsplat.rendering.rasterization parity (single camera).

    Returns (render [1, H, W, C(+1)], alpha [1, H, W, 1], info dict).
    "RGB+ED" appends expected depth as the last channel.
    """
    assert not packed, "packed mode is not used by the reference"
    assert viewmats.shape[0] == 1, "single-camera surface"
    bg = backgrounds[0] if backgrounds is not None else None
    out = _rasterize(means, quats, scales, opacities, colors,
                     viewmats[0], Ks[0], int(width), int(height),
                     background=bg, config=config)
    img = out.images[0]
    if render_mode == "RGB+ED":
        img = jnp.concatenate([img, out.depths[0][..., None]], axis=-1)
    elif render_mode != "RGB":
        raise NotImplementedError(render_mode)
    alpha = out.alphas[0][None, ..., None]
    info = {"means2d": out.means2d[None], "radii": out.radii[None]}
    return img[None], alpha, info


def fully_fused_projection(means, covars, quats, scales, viewmats, Ks,
                           width, height,
                           config: RasterConfig = RasterConfig()):
    """gsplat.rendering.fully_fused_projection parity: returns the
    5-tuple the reference destructures as `(_, means2d, _, _, _)`."""
    assert covars is None, "covars path not used by the reference"
    splats = _proj.project(means, quats, scales, viewmats[0], Ks[0],
                           int(width), int(height), eps2d=config.eps2d,
                           near=config.near, sigma_cut=config.sigma_cut)
    return (splats.radii[None], splats.means2d[None], splats.depths[None],
            splats.conics[None], None)
