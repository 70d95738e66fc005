"""Training debug visualization.

Parity targets: `main_utils.py:49-92` (save_debug_imgs grids every 300
iterations) and `utils/scene_utils.py:14-269` (render_training_image
per-view panels incl. latent sharp frames). Runs OUTSIDE the hot jitted
step — the reference renders its static-only debug pass every iteration;
here it renders only when a dump is actually written.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from mobgs_tpu.data.cameras import Camera
from mobgs_tpu.models import render as R
from mobgs_tpu.ops.rasterize import RasterConfig
from mobgs_tpu.utils.observability import save_debug_grid


def dump_debug_images(ts, data, iteration: int, out_dir: str,
                      view: int = 0,
                      raster_cfg: RasterConfig = RasterConfig()):
    """Render the standard debug panel for one view and write a grid:
    [render ‖ gt ‖ depth ‖ gt_depth ‖ d_alpha ‖ s_alpha ‖ s_render]."""
    cam = Camera(w2c=jnp.asarray(data.w2c[view]), K=jnp.asarray(data.K[view]),
                 time=jnp.asarray(data.time[view]))
    out = R.render_view(ts.stat, ts.dyn, ts.sandwich, cam, data.width,
                        data.height, jnp.zeros(3), data.max_time,
                        get_static=True, get_dynamic=True, config=raster_cfg)
    depth = np.asarray(out.depth)
    norm = max(float(depth.max()), 1e-6)
    gt_depth = np.asarray(data.depths[view])
    panels = {
        "render": np.asarray(out.image),
        "gt": np.asarray(data.images[view]),
        "depth": depth / norm,
        "gt_depth": gt_depth / max(gt_depth.max(), 1e-6),
        "d_alpha": np.asarray(out.d_alpha),
        "s_alpha": np.asarray(out.s_alpha),
        "s_render": np.asarray(out.s_image),
    }
    path = os.path.join(out_dir, "fine_debug", f"iter_{iteration:06d}.png")
    save_debug_grid(path, panels)
    return path
