"""Training debug visualization.

Parity targets: `main_utils.py:49-92` (save_debug_imgs grids every 300
iterations) and `utils/scene_utils.py:14-269` (render_training_image
per-view panels incl. latent sharp frames + flow color maps, enabled by
`render_process=True` in `arguments/stereo/default.py:14`, called at
testing iterations from `train.py:776-790`). Runs OUTSIDE the hot
jitted step — the reference renders its static-only debug pass every
iteration; here debug rendering happens only when a dump is written.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.data.cameras import Camera
from mobgs_tpu.models import render as R
from mobgs_tpu.ops.rasterize import RasterConfig
from mobgs_tpu.utils.observability import save_debug_grid


def flow_to_color(flow: np.ndarray, max_mag: float | None = None) -> np.ndarray:
    """Optical-flow color coding (Middlebury/Baker color wheel), the
    convention of the `flow_vis` package used at `scene_utils.py:109`.
    flow: [H, W, 2] → float RGB in [0, 1]."""
    # color wheel: RY=15, YG=6, GC=4, CB=11, BM=13, MR=6 (55 colors)
    seg = [(15, [1, 0, 0], [1, 1, 0]), (6, [1, 1, 0], [0, 1, 0]),
           (4, [0, 1, 0], [0, 1, 1]), (11, [0, 1, 1], [0, 0, 1]),
           (13, [0, 0, 1], [1, 0, 1]), (6, [1, 0, 1], [1, 0, 0])]
    wheel = []
    for n, c0, c1 in seg:
        for i in range(n):
            a = i / n
            wheel.append([(1 - a) * x + a * y for x, y in zip(c0, c1)])
    wheel = np.asarray(wheel)                       # [55, 3]
    ncols = len(wheel)

    u, v = flow[..., 0], flow[..., 1]
    mag = np.sqrt(u * u + v * v)
    if max_mag is None:
        max_mag = max(float(mag.max()), 1e-6)
    u, v = u / max_mag, v / max_mag
    mag = mag / max_mag
    ang = np.arctan2(-v, -u) / np.pi                 # [-1, 1]
    fk = (ang + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int) % ncols
    k1 = (k0 + 1) % ncols
    f = (fk - np.floor(fk))[..., None]
    col = (1 - f) * wheel[k0] + f * wheel[k1]        # [H, W, 3]
    # saturate towards white for small magnitudes
    col = 1 - mag[..., None] * (1 - col)
    return np.clip(col, 0.0, 1.0)


def normals_from_depth_screen(depth: np.ndarray, K: np.ndarray) -> np.ndarray:
    """Screen-space normals from an expected-depth map — the
    finite-difference cross-product construction of
    `scene_utils.py:130-165` (dx/du x dx/dv of the unprojected coords).
    Returns [H, W, 3] in [-1, 1]."""
    H, W = depth.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    xs, ys = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    z = depth + 1e-6
    x = (xs - cx) / fx * z
    y = (ys - cy) / fy * z
    coords = np.stack([x, y, z], axis=-1)            # [H, W, 3]
    du = np.diff(coords, axis=1)
    du = np.concatenate([du, du[:, -1:]], axis=1)
    dv = np.diff(coords, axis=0)
    dv = np.concatenate([dv, dv[-1:]], axis=0)
    n = np.cross(dv, du)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    return n


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


def render_training_panels(ts, data, iteration: int, out_dir: str,
                           view: int = 0, num_warp: int = 9,
                           with_latents: bool = True,
                           raster_cfg: RasterConfig = RasterConfig()):
    """`render_training_image` parity for one train view (fine stage,
    is_train, BLCE active — `scene_utils.py:88-110,205-210`):

      <name>_latent_XX.png   E latent sharp renders (BLCE poses)
      <name>_flow_XX.png     exp→mid flow color maps
      <name>.png             [gt ‖ blurry(mean latents) ‖ mid ‖ d_alpha]
      <name>_decomp.png      [gt_normal? ‖ pred_normal ‖ gt_depth ‖ depth]

    All E latent renders + flows run as ONE vmapped dispatch.
    """
    from mobgs_tpu.core import se3
    from mobgs_tpu.models import blce as B

    W, H = data.width, data.height
    E = num_warp
    w2c = jnp.asarray(data.w2c[view])
    K = jnp.asarray(data.K[view])
    t = jnp.asarray(data.time[view])
    cam = Camera(w2c=w2c, K=K, time=t)
    bg3 = jnp.zeros(3)

    mid = R.render_view(ts.stat, ts.dyn, ts.sandwich, cam, W, H, bg3,
                        data.max_time, get_static=True, get_dynamic=True,
                        config=raster_cfg)

    img_dir = os.path.join(out_dir, "fine_render", "train", "images")
    os.makedirs(img_dir, exist_ok=True)
    name = f"view{view:03d}_it{iteration:06d}"

    latents = None
    if with_latents:
        c2w = se3.view_to_world(w2c)
        lat_c2w, expo = B.latent_poses(
            ts.blce, c2w, jnp.asarray(data.blur_feats[view]),
            jnp.int32(view), E)
        lat_w2c = se3.view_to_world(lat_c2w)

        def one(w2c_e, d_expo):
            cam_e = Camera(w2c=w2c_e, K=K, time=t)
            out = R.render_view(ts.stat, ts.dyn, ts.sandwich, cam_e, W, H,
                                bg3, data.max_time, d_expo,
                                config=raster_cfg)
            e2m, _, _, _ = R.get_flow(ts.stat, ts.dyn, ts.sandwich, cam,
                                      W, H, bg3, d_expo, data.max_time,
                                      config=raster_cfg)
            from mobgs_tpu.data.cameras import pixel_grid
            flow = e2m - pixel_grid(W, H, use_center=False)
            return out.image, flow

        lat_imgs, flows = jax.jit(jax.vmap(one))(lat_w2c, expo)
        lat_imgs = np.asarray(lat_imgs)
        flows = np.asarray(flows)
        from PIL import Image
        for e in range(E):
            Image.fromarray((np.clip(lat_imgs[e], 0, 1) * 255).astype(
                np.uint8)).save(os.path.join(img_dir,
                                             f"{name}_latent_{e:02d}.png"))
            Image.fromarray((flow_to_color(flows[e]) * 255).astype(
                np.uint8)).save(os.path.join(img_dir,
                                             f"{name}_flow_{e:02d}.png"))
        latents = lat_imgs

    gt = np.asarray(data.images[view])
    mid_np = np.asarray(mid.image)
    blurry = (latents.sum(0) + mid_np) / (E + 1) if latents is not None \
        else mid_np
    save_debug_grid(os.path.join(img_dir, f"{name}.png"), {
        "gt": gt, "blurry": blurry, "mid": mid_np,
        "d_alpha": np.asarray(mid.d_alpha)})

    depth = np.asarray(mid.depth)
    pred_n = (normals_from_depth_screen(depth, np.asarray(data.K[view]))
              + 1) / 2
    gt_depth = np.asarray(data.depths[view])
    decomp = {"pred_normal": pred_n,
              "gt_depth": gt_depth / max(float(gt_depth.max()), 1e-6),
              "depth": depth / max(float(depth.max()), 1e-6)}
    normals = getattr(data, "normals", None)
    if normals is not None:
        decomp = {"gt_normal": (np.asarray(normals[view]) + 1) / 2,
                  **decomp}
    save_debug_grid(os.path.join(img_dir, f"{name}_decomp.png"), decomp)
    return img_dir
