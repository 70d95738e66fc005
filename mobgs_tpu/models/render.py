"""Scene rendering — spline-deformed dynamic + static Gaussian composition.

Behavioral reference: `gaussian_renderer/__init__.py:59-553`
(`render`, `get_flow`, `get_flow_static`). The reference launches the
CUDA rasterizer 5-8 times per view (combined / dyn / dyn-alpha / stat /
stat-alpha / flow / latent passes); here each *geometry evaluation*
(a (camera, time) pair) is ONE projection + binning with a handful of
wide-channel compositing passes over shared tiles:

* channel layout per pass: ``[feat9 ‖ extra...]`` where extras carry
  optical-flow displacements (flow is "splatting a 2D displacement as
  color", reference :271-289) — so flow maps cost no extra binning,
* the dynamic-only and static-only images/alphas are subset passes over
  the same geometry (opacity masks), not separate launches,
* everything is batched with `vmap` over (view × exposure) so the full
  [B=2, E=9] training batch is one compiled program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobgs_tpu.data.cameras import Camera, cam_rays, pixel_grid
from mobgs_tpu.models import gaussians as G
from mobgs_tpu.models.sandwich import SandwichParams, apply_sandwich
from mobgs_tpu.ops import projection
from mobgs_tpu.ops.rasterize import (RasterConfig, RasterOut,
                                     make_shared_static, rasterize)


class SceneGeom(NamedTuple):
    """Assembled per-Gaussian fields for one (time) evaluation, static set
    first then dynamic (concat order matches reference renderer :181-185)."""
    means: jnp.ndarray      # [N, 3]
    quats: jnp.ndarray      # [N, 4] (normalized)
    scales: jnp.ndarray     # [N, 3] (activated)
    opacity: jnp.ndarray    # [N]
    colors: jnp.ndarray     # [N, 9]
    stat_mask: jnp.ndarray  # [N] 1.0 on static slots
    dyn_mask: jnp.ndarray   # [N] 1.0 on dynamic slots


def assemble(stat: G.GaussianState, dyn: G.GaussianState, t,
             max_time: float = 1.0, delta_exposure=None) -> SceneGeom:
    """Gather the combined Gaussian set at (possibly exposure-shifted) time.

    Mirrors renderer :69-130: dynamic positions from the spline at
    ``clip(t + Δe/max_time, 0, 1)``, rotations ``q + Δt·ω``, features
    ``[dc ‖ Δt·f_t]`` with Δt = t_eff - trbf_center; static uses raw
    params with zero time modulation.
    """
    d_means, d_quats, d_scales, d_opac, d_colors = assemble_dyn(
        dyn, t, max_time, delta_exposure)
    s_means, s_quats, s_scales, s_opac, s_colors = assemble_static(stat)

    Ms, Md = stat.capacity, dyn.capacity
    return SceneGeom(
        means=jnp.concatenate([s_means, d_means]),
        quats=jnp.concatenate([s_quats, d_quats]),
        scales=jnp.concatenate([s_scales, d_scales]),
        opacity=jnp.concatenate([s_opac, d_opac]),
        colors=jnp.concatenate([s_colors, d_colors]),
        stat_mask=jnp.concatenate([jnp.ones(Ms), jnp.zeros(Md)]),
        dyn_mask=jnp.concatenate([jnp.zeros(Ms), jnp.ones(Md)]),
    )


def assemble_dyn(dyn: G.GaussianState, t, max_time: float = 1.0,
                 delta_exposure=None):
    """Dynamic half of :func:`assemble` — the only part that changes
    with the exposure shift (renderer :69-130)."""
    t = jnp.asarray(t, jnp.float32)
    if delta_exposure is None:
        t_eff = t
    else:
        t_eff = t + jnp.asarray(delta_exposure, jnp.float32) / max_time
    t_spline = jnp.clip(t_eff, 0.0, 1.0)

    dt = G.time_offset(dyn, t_eff)  # [Md, 1]
    d_means = G.positions_at(dyn, t_spline)
    d_quats = G.rotation_at(dyn, jax.lax.stop_gradient(dt))
    d_scales = G.act_scaling(dyn)
    d_opac = G.act_opacity(dyn)
    d_colors = G.features_at(dyn, jax.lax.stop_gradient(dt))
    return d_means, d_quats, d_scales, d_opac, d_colors


def assemble_static(stat: G.GaussianState):
    """Static half of :func:`assemble` — time- AND exposure-invariant
    (the reference never time-shifts static means either, renderer
    :318-492), so per (view, camera) these rows are identical across
    the mid render and every exposure-flow pass."""
    s_means = stat.xyz
    s_quats = G.act_rotation(stat.rotation)
    s_scales = G.act_scaling(stat)
    s_opac = G.act_opacity(stat)
    s_colors = G.features_at(stat, 0.0)
    return s_means, s_quats, s_scales, s_opac, s_colors


def make_shared_view(stat: G.GaussianState, cam: Camera,
                     width: int, height: int,
                     config: RasterConfig = RasterConfig()):
    """Project + bin the static pool ONCE for a camera
    (ops/rasterize.make_shared_static) — reused by the mid render and
    all E-1 exposure-flow passes of the view, which differ only in the
    dynamic rows. The returned SharedStatic is differentiable through
    its projection (one projection backward per view instead of one
    per pass)."""
    s_means, s_quats, s_scales, _, _ = assemble_static(stat)
    return make_shared_static(s_means, s_quats, s_scales, cam.w2c, cam.K,
                              width, height, config)


def project_dyn2d(dyn: G.GaussianState, cam: Camera,
                  width: int, height: int, max_time: float = 1.0,
                  delta_exposure=None,
                  config: RasterConfig = RasterConfig()) -> jnp.ndarray:
    """2D projections of the DYNAMIC rows only at a time — the static
    rows of a flow-color difference (`mid2d - exp2d`, renderer
    :187-199) are exactly zero because static means never move, so the
    flow colors need only the dynamic projections."""
    d_means, d_quats, d_scales, _, _ = assemble_dyn(dyn, cam.time,
                                                    max_time,
                                                    delta_exposure)
    splats = projection.project(d_means, d_quats, d_scales,
                                cam.w2c, cam.K, width, height,
                                eps2d=config.eps2d, near=config.near,
                                sigma_cut=config.sigma_cut)
    return splats.means2d


def _bg9(bg3: jnp.ndarray) -> jnp.ndarray:
    """9-channel background = bg3 tiled x3 (renderer :90-91)."""
    return jnp.concatenate([bg3, bg3, bg3])


class RenderOut(NamedTuple):
    image: jnp.ndarray       # [H, W, 3] decoded RGB (combined)
    depth: jnp.ndarray       # [H, W] expected depth (combined)
    alpha: jnp.ndarray       # [H, W] (combined)
    d_image: jnp.ndarray | None
    d_depth: jnp.ndarray | None
    d_alpha: jnp.ndarray | None
    s_image: jnp.ndarray | None
    s_alpha: jnp.ndarray | None
    feat: jnp.ndarray        # [H, W, 9] raw combined features (pre-decoder)
    means2d: jnp.ndarray     # [N, 2]
    radii: jnp.ndarray       # [N]
    flow: jnp.ndarray | None  # [H, W, F] optional extra-channel renders
    tile_max: jnp.ndarray | int = 0  # pre-clamp peak tile occupancy


def render_view(stat: G.GaussianState, dyn: G.GaussianState,
                sandwich: SandwichParams, cam: Camera,
                width: int, height: int, bg3: jnp.ndarray,
                max_time: float = 1.0, delta_exposure=None,
                get_static: bool = False, get_dynamic: bool = False,
                extra_colors: jnp.ndarray | None = None,
                means2d_offset: jnp.ndarray | None = None,
                subset_alpha_only: bool = False,
                want_depth: bool = True,
                want_alpha: bool = True,
                precomputed: tuple | None = None,
                shared=None,
                config: RasterConfig = RasterConfig()) -> RenderOut:
    """Render one view at one time. Equivalent of reference `render()`.

    Args:
      extra_colors: [N, F] additional per-Gaussian channels composited
        with zero background (e.g. 2D flow displacements).
      subset_alpha_only: when True, the static/dynamic subset passes
        composite ONLY alpha (no color channels) — what the train-step
        losses consume; d_image/d_depth/s_image stay None. Matches the
        reference's 1-channel alpha launches (renderer :158-177) and
        skips the per-entry color gather + its backward scatter.
      want_depth, want_alpha: composite the extended depth/weight
        columns (ops/rasterize.py note). Callers consuming only images
        disable both; the outputs' depth/alpha come back as zeros, and
        the background term is skipped (zero-bg train passes only).
      precomputed: (SceneGeom, ProjectedSplats) from assemble_project —
        skips the internal assemble + projection (see the splats note in
        ops/rasterize.rasterize; delta_exposure is then ignored).
      shared: SharedStatic from make_shared_view — the static pool's
        projection + binning for THIS camera, computed once per view;
        only the dynamic rows are projected/merged here (mutually
        exclusive with precomputed).
    """
    if precomputed is not None:
        geom, splats = precomputed
    else:
        geom = assemble(stat, dyn, cam.time, max_time, delta_exposure)
        splats = None
    colors = geom.colors
    bg = _bg9(bg3) if want_alpha else None
    if extra_colors is not None:
        colors = jnp.concatenate([colors, extra_colors], axis=1)
        if bg is not None:
            bg = jnp.concatenate([bg, jnp.zeros(extra_colors.shape[1])])

    masks = [jnp.ones_like(geom.stat_mask)]
    sub_masks = []
    sub_list = sub_masks if subset_alpha_only else masks
    if get_dynamic:
        sub_list.append(geom.dyn_mask)
    if get_static:
        sub_list.append(geom.stat_mask)
    out: RasterOut = rasterize(
        geom.means, geom.quats, geom.scales, geom.opacity, colors,
        cam.w2c, cam.K, width, height, background=bg,
        pass_masks=jnp.stack(masks),
        alpha_masks=jnp.stack(sub_masks) if sub_masks else None,
        means2d_offset=means2d_offset,
        want_depth=want_depth, want_alpha=want_alpha,
        splats=splats, shared=shared, config=config)

    rays = cam_rays(cam, width, height)
    image = apply_sandwich(sandwich, out.images[0, ..., :9], rays)
    i = 1
    j = 0
    d_image = d_depth = d_alpha = s_image = s_alpha = None
    if get_dynamic:
        if subset_alpha_only:
            d_alpha = out.sub_alphas[j]
            j += 1
        else:
            d_image = apply_sandwich(sandwich, out.images[i, ..., :9], rays)
            d_depth = out.depths[i]
            d_alpha = out.alphas[i]
            i += 1
    if get_static:
        if subset_alpha_only:
            s_alpha = out.sub_alphas[j]
            j += 1
        else:
            s_image = apply_sandwich(sandwich, out.images[i, ..., :9], rays)
            s_alpha = out.alphas[i]
            i += 1
    flow = out.images[0, ..., 9:] if extra_colors is not None else None
    return RenderOut(image=image, depth=out.depths[0], alpha=out.alphas[0],
                     d_image=d_image, d_depth=d_depth, d_alpha=d_alpha,
                     s_image=s_image, s_alpha=s_alpha,
                     feat=out.images[0, ..., :9],
                     means2d=out.means2d, radii=out.radii, flow=flow,
                     tile_max=out.tile_max)


def assemble_project(stat: G.GaussianState, dyn: G.GaussianState,
                     cam: Camera, width: int, height: int,
                     max_time: float = 1.0, delta_exposure=None,
                     config: RasterConfig = RasterConfig()):
    """Assemble the combined set at (exposure-shifted) time and project
    it — returns (SceneGeom, ProjectedSplats) for render_view's
    ``precomputed`` hook, so a caller that consumes means2d BEFORE
    compositing (the train step's flow colors) evaluates the geometry
    exactly once even inside a `lax.scan` body (where XLA CSE cannot
    dedupe a re-projection across regions)."""
    geom = assemble(stat, dyn, cam.time, max_time, delta_exposure)
    splats = projection.project(geom.means, geom.quats, geom.scales,
                                cam.w2c, cam.K, width, height,
                                eps2d=config.eps2d, near=config.near,
                                sigma_cut=config.sigma_cut)
    return geom, splats


def project_combined(stat: G.GaussianState, dyn: G.GaussianState, cam: Camera,
                     width: int, height: int, max_time: float = 1.0,
                     delta_exposure=None,
                     config: RasterConfig = RasterConfig()) -> jnp.ndarray:
    """2D projections of the combined set at a time — for flow colors
    (parity with `fully_fused_projection` use, renderer :187-199)."""
    _, splats = assemble_project(stat, dyn, cam, width, height, max_time,
                                 delta_exposure, config)
    return splats.means2d


def get_flow(stat: G.GaussianState, dyn: G.GaussianState,
             sandwich: SandwichParams, cam: Camera,
             width: int, height: int, bg3: jnp.ndarray,
             delta_exposure, max_time: float = 1.0,
             config: RasterConfig = RasterConfig()):
    """Exposure↔mid flow maps + latent image/alpha.

    Equivalent of reference `get_flow` (renderer :318-492), but the
    five rasterizer launches collapse to two geometry passes:
    * exp-time pass with channels [feat9 ‖ exp2mid_flow2] (+ dyn alpha),
    * mid-time pass rendering [mid2exp_flow2] only.

    Returns (exp2mid_coord [H,W,2], mid2exp_coord [H,W,2],
             latent_img [H,W,3], latent_alpha [H,W]).
    """
    mid2d = project_combined(stat, dyn, cam, width, height, max_time, None,
                             config)
    exp2d = project_combined(stat, dyn, cam, width, height, max_time,
                             delta_exposure, config)
    flow2d = jax.lax.stop_gradient(mid2d - exp2d)  # exp→mid displacement

    exp_out = render_view(stat, dyn, sandwich, cam, width, height, bg3,
                          max_time, delta_exposure, get_dynamic=True,
                          extra_colors=flow2d, config=config)
    mid_out = render_view(stat, dyn, sandwich, cam, width, height, bg3,
                          max_time, None, extra_colors=-flow2d, config=config)

    pix = pixel_grid(width, height, use_center=False)
    exp2mid_coord = pix + exp_out.flow
    mid2exp_coord = pix + mid_out.flow
    return exp2mid_coord, mid2exp_coord, exp_out.image, exp_out.d_alpha


def get_flow_static(stat: G.GaussianState, source_cam: Camera,
                    target_cam: Camera, splat_cam: Camera,
                    width: int, height: int,
                    config: RasterConfig = RasterConfig()):
    """Camera-induced flow from static Gaussians (renderer :494-553):
    project the static set in source and target views, splat the 2D
    displacement from the splat camera. Returns (flow2d [N,2],
    rendered_flow [H,W,2])."""
    s_means = stat.xyz
    s_quats = G.act_rotation(stat.rotation)
    s_scales = G.act_scaling(stat)
    s_opac = G.act_opacity(stat)

    def proj2d(cam):
        spl = projection.project(s_means, s_quats, s_scales, cam.w2c, cam.K,
                                 width, height, eps2d=config.eps2d,
                                 near=config.near, sigma_cut=config.sigma_cut)
        return spl.means2d

    flow2d = proj2d(source_cam) - proj2d(target_cam)
    out = rasterize(s_means, s_quats, s_scales, s_opac, flow2d,
                    splat_cam.w2c, splat_cam.K, width, height,
                    background=None, config=config)
    return flow2d, out.images[0]
