"""The fine-stage training step — one jitted program per iteration.

Behavioral reference: the hot loop `train.py:289-820`. The reference
runs ~85-95 sequential CUDA rasterizer launches per iteration (2 cams x
9 latent renders x multi-pass + 9 get_flow x 2 + exposure flows); here
the whole iteration — BLCE pose prediction, all latent/flow renders,
losses, gradients, Adam updates, densification stats — is ONE compiled
XLA program, vmapped over the [B, E] (camera-batch x exposure) axes.

Loss structure (train.py:597-678):
  photo  = L1(mean-of-9-latents, gt_blurry) + λ_dssim (1 - SSIM)
  reg    = 0.2 L1(depth, gt_depth)
         + 1e-7 (entropy + sparsity)(dynamic alpha)
         + λ_flow * bidirectional flow-warp consistency
Densification stats use the mid render's view-space gradient, scaled by
(W/2, H/2) (train.py:633-648).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobgs_tpu.core import se3
from mobgs_tpu.core.image import psnr
from mobgs_tpu.data.cameras import Camera, pixel_grid
from mobgs_tpu.models import blce as B
from mobgs_tpu.models import gaussians as G
from mobgs_tpu.models import render as R
from mobgs_tpu.models.sandwich import SandwichParams
from mobgs_tpu.ops.rasterize import RasterConfig
from mobgs_tpu.train import densify, losses
from mobgs_tpu.train.optim import AdamState, adam_update, gaussian_lrs, init_adam


class TrainState(NamedTuple):
    stat: G.GaussianState
    dyn: G.GaussianState
    sandwich: SandwichParams
    blce: B.BLCEState
    stat_opt: AdamState
    dyn_opt: AdamState
    sandwich_opt: AdamState
    blce_opt: AdamState
    stat_stats: densify.DensifyStats
    dyn_stats: densify.DensifyStats
    step: jnp.ndarray  # scalar int32 iteration counter
    # Carried hexplane+MLP deformation net (reference gaussian_model.py:118
    # instantiates it and :602-605 registers it in Adam, but the fine
    # stage never renders through it so its torch grads stay None and
    # torch Adam skips it — i.e. it never updates; we carry it verbatim
    # so `deformation.pth` checkpoints have real content).
    deform: object | None = None


class Batch(NamedTuple):
    """One sampled camera batch (arrays stacked over B)."""
    view_idx: jnp.ndarray   # [B] int32
    w2c: jnp.ndarray        # [B, 4, 4]
    K: jnp.ndarray          # [B, 3, 3]
    time: jnp.ndarray       # [B]
    image: jnp.ndarray      # [B, H, W, 3] blurry GT
    depth: jnp.ndarray      # [B, H, W] prior depth
    blur_feat: jnp.ndarray  # [B] precomputed FFT blur features


class Metrics(NamedTuple):
    loss: jnp.ndarray
    photo: jnp.ndarray
    depth_l1: jnp.ndarray
    mask: jnp.ndarray
    flow: jnp.ndarray
    psnr: jnp.ndarray
    # peak pre-clamp tile occupancy across every geometry evaluation of
    # the iteration: > max_per_tile means the binning clamp dropped the
    # farthest entries somewhere (observability for the truncation
    # approximation; logged into history.json by the train loop)
    tile_max: jnp.ndarray | int = 0


def init_train_state(stat, dyn, sandwich, blce_state,
                     deform=None) -> TrainState:
    sd, _ = G.split_diff(stat)
    dd, _ = G.split_diff(dyn)
    return TrainState(
        stat=stat, dyn=dyn, sandwich=sandwich, blce=blce_state,
        stat_opt=init_adam(sd), dyn_opt=init_adam(dd),
        sandwich_opt=init_adam(sandwich),
        blce_opt=init_adam(blce_state.params),
        stat_stats=densify.init_stats(stat.capacity),
        dyn_stats=densify.init_stats(dyn.capacity),
        step=jnp.zeros((), jnp.int32), deform=deform)


def _loop(body, xs, n: int, carry_init, use_scan):
    """Run ``body(carry, x_i) -> (carry, y_i)`` over the leading axis of
    the stacked pytree ``xs``, returning (carry, stacked ys).

    use_scan truthy lowers the body via `lax.scan` — the passes run
    serially either way on the single TensorCore, but the fully unrolled
    form compiles the body once PER PASS (762 s for the flow-ON step at
    protocol shapes, round-3 VERDICT item 2). An int value > 1 is passed
    as scan's ``unroll`` (k bodies per loop iteration): XLA's static
    schedule can only overlap DMA/compute across passes that live in the
    same program region, so some unrolling buys back cross-pass overlap
    at a fraction of the full compile cost. The batched-gather/scatter
    vmap cliff (CLAUDE.md) does not apply: scan's body sees unbatched
    operands, so gathers/scatters lower exactly as in the unrolled
    program."""
    if use_scan:
        unroll = use_scan if isinstance(use_scan, int) and use_scan > 1 else 1
        return jax.lax.scan(body, carry_init, xs, unroll=unroll)
    carry = carry_init
    ys = []
    for i in range(n):
        carry, y = body(carry, jax.tree.map(lambda a: a[i], xs))
        ys.append(y)
    return carry, jax.tree.map(lambda *zs: jnp.stack(zs), *ys)


def make_forward(opt_cfg, width: int, height: int,
                 max_time: float, num_warp: int = 9,
                 raster_cfg: RasterConfig = RasterConfig(),
                 use_blce: bool = True,
                 with_latents: bool = True,
                 with_exposure_delta: bool = True,
                 scan_passes=False, scan_views=False,
                 shared_static: bool = False):
    """Build the (un-jitted) forward loss over a camera batch — the
    differentiated core of the train step, also used standalone by the
    stage profiler (scripts/profile_step.py).

    Args:
      with_latents: False before ``start_warp`` — the reference skips
        blur synthesis entirely (train.py:471: no warped cams, no flow
        loss, no BLCE step; pred = the mid render alone).
      with_exposure_delta: False before ``start_warp_dynamic`` — latent
        renders use the warped poses but delta_exposure = 0
        (train.py:503-507).
      scan_passes: loop the per-exposure latent/flow passes with
        `lax.scan` instead of static unrolling — numerically identical,
        compiles each pass body once; int > 1 = scan's unroll factor
        (see _loop). scan_views does the same for the B-view batch axis.
      shared_static: bin + project the static pool ONCE per view and
        reuse it across the mid render and all E-1 exposure-flow passes
        (they share the camera; static Gaussians never time-shift —
        ops/tiles.StaticBins). Numerically identical to the unshared
        path (tests/test_shared_static.py). Default OFF: at protocol
        shapes the dyn pool is half the static pool, so the per-pass
        dyn re-sort + [T,2K] row-merge costs MORE than the shared
        static sort saves (measured 600 vs 588 ms/step on v5e;
        BASELINE.md round-4 notes). Worth flipping on for scenes whose
        dynamic pool is a small fraction of the static one.
    """
    E = num_warp
    half = E // 2
    bg3 = jnp.zeros(3, jnp.float32)
    lambda_dssim = opt_cfg.lambda_dssim
    lambda_flow = opt_cfg.lambda_flow_loss
    compute_flow = lambda_flow > 0 and with_latents

    def forward(stat_diff, dyn_diff, sandwich, blce_params, offsets,
                stat_aux, dyn_aux, expo_state, batch: Batch):
        stat = G.merge_diff(stat_diff, stat_aux)
        dyn = G.merge_diff(dyn_diff, dyn_aux)
        blce_state = B.BLCEState(params=blce_params, exposure_expo=expo_state)
        Bsz = batch.view_idx.shape[0]

        def per_view(view_idx, w2c, K, time, gt_img, blur_feat, offset):
            cam = Camera(w2c=w2c, K=K, time=time)

            # ---- BLCE latent poses (blce.py:374-424)
            if use_blce and with_latents:
                c2w = se3.view_to_world(w2c)
                lat_c2w, expo = B.latent_poses(blce_state, c2w, blur_feat,
                                               view_idx, E)
                lat_w2c = se3.view_to_world(lat_c2w)  # inverse (rigid)
            else:
                lat_w2c = jnp.broadcast_to(w2c, (E, 4, 4))
                expo = jnp.zeros((E,))

            # ---- per-exposure passes: ONE loop whose body holds the
            # latent sharp render (train.py:502-541) AND the fused
            # exposure-flow pass (train.py:564-584). Fusing matters for
            # the scanned form: the flow pass needs its own means2d both
            # as flow colors (`mid2d - means2d`, renderer :187-199) and
            # for compositing — computing them in one body via
            # assemble_project evaluates each exposure geometry exactly
            # once, which the unrolled program got from XLA CSE but a
            # pass-per-scan structure cannot (scan bodies are separate
            # program regions; this was the bulk of scan's +200 ms over
            # unroll at protocol shapes).
            shared = None
            if compute_flow:
                ratios = jnp.asarray([(e - half) / half for e in range(E)],
                                     jnp.float32)
                Ntot = stat.capacity + dyn.capacity
                if shared_static:
                    # static pool: ONE projection + binning for this
                    # camera, reused by the mid render and every flow
                    # pass below; flow colors need only the dynamic
                    # projections (static rows of mid2d - exp2d are
                    # exactly zero — static means never move)
                    shared = R.make_shared_view(stat, cam, width, height,
                                                raster_cfg)
                    mid_dyn2d = jax.lax.stop_gradient(
                        R.project_dyn2d(dyn, cam, width, height,
                                        max_time, None, raster_cfg))
                else:
                    mid2d = jax.lax.stop_gradient(
                        R.project_combined(stat, dyn, cam, width, height,
                                           max_time, None, raster_cfg))
            other = jnp.asarray([i for i in range(E) if i != half],
                                jnp.int32)

            def pass_body(carry, xs):
                if compute_flow:
                    w2c_e, d_expo, d_flow = xs
                else:
                    w2c_e, d_expo = xs
                cam_e = Camera(w2c=w2c_e, K=K, time=time)
                # latent render, image-only: it feeds pred_image alone,
                # so skip the depth/weight columns (zero bg; the Pallas
                # kernel cannot DCE them from outside)
                lat = R.render_view(stat, dyn, sandwich, cam_e, width,
                                    height, bg3, max_time,
                                    d_expo if with_exposure_delta else None,
                                    want_depth=False, want_alpha=False,
                                    config=raster_cfg)
                tm = jnp.maximum(carry, jnp.asarray(lat.tile_max, jnp.int32))
                if not compute_flow:
                    return tm, lat.image
                # fused flow pass at the ORIGINAL camera, exposure-time
                # geometry; consumes image + flow channels + the SUBSET
                # dyn alpha (fused chain)
                if shared_static:
                    # only the dynamic rows differ from the shared
                    # static panel; their projection here CSEs with the
                    # one inside render_view (same program region)
                    dyn2d_e = jax.lax.stop_gradient(
                        R.project_dyn2d(dyn, cam, width, height,
                                        max_time, d_flow, raster_cfg))
                    flow2d_e = jnp.concatenate(
                        [jnp.zeros((stat.capacity, 2), jnp.float32),
                         mid_dyn2d - dyn2d_e])
                    fout = R.render_view(stat, dyn, sandwich, cam, width,
                                         height, bg3, max_time, d_flow,
                                         get_dynamic=True,
                                         extra_colors=flow2d_e,
                                         subset_alpha_only=True,
                                         want_depth=False,
                                         want_alpha=False,
                                         shared=shared, config=raster_cfg)
                else:
                    geom_f, splats_f = R.assemble_project(
                        stat, dyn, cam, width, height, max_time, d_flow,
                        raster_cfg)
                    flow2d_e = jax.lax.stop_gradient(
                        mid2d - splats_f.means2d)
                    fout = R.render_view(stat, dyn, sandwich, cam, width,
                                         height, bg3, max_time,
                                         get_dynamic=True,
                                         extra_colors=flow2d_e,
                                         subset_alpha_only=True,
                                         want_depth=False,
                                         want_alpha=False,
                                         precomputed=(geom_f, splats_f),
                                         config=raster_cfg)
                tm = jnp.maximum(tm, jnp.asarray(fout.tile_max, jnp.int32))
                return tm, (lat.image, fout.image, fout.d_alpha, fout.flow,
                            flow2d_e)

            if with_latents:
                xs = ((lat_w2c[other], expo[other], ratios[other])
                      if compute_flow else (lat_w2c[other], expo[other]))
                tile_max, ys = _loop(pass_body, xs, E - 1,
                                     jnp.zeros((), jnp.int32), scan_passes)
            else:
                tile_max = jnp.zeros((), jnp.int32)

            # ---- mid→exposure flow colors for the mid render: the
            # reference's 9 separate mid-time get_flow rasterizations
            # (renderer :379-491) ride the mid pass as extra channels
            # (zero extra geometry evaluations); the mid exposure's own
            # row is exactly zero (same geometry)
            if compute_flow:
                lat_imgs, f_img, f_alpha, f_e2m, flow2d_o = ys
                zcol = jnp.zeros((1,) + flow2d_o.shape[1:])
                flow2d = jnp.concatenate(
                    [flow2d_o[:half], zcol, flow2d_o[half:]])   # [E, N, 2]
                mid_extra = (-flow2d).transpose(1, 0, 2).reshape(Ntot, 2 * E)
            else:
                mid_extra = None
                lat_imgs = ys if with_latents else None

            # ---- mid render at the ORIGINAL camera (train.py:441-469).
            # The reference also renders a static-only pass here, but its
            # outputs feed only the /300-iteration debug dumps
            # (train.py:699-711) — that pass lives in the debug path, not
            # the hot step.
            mid = R.render_view(stat, dyn, sandwich, cam, width, height,
                                bg3, max_time, None, get_static=False,
                                get_dynamic=True, means2d_offset=offset,
                                extra_colors=mid_extra,
                                subset_alpha_only=True, shared=shared,
                                config=raster_cfg)
            tile_max = jnp.maximum(tile_max,
                                   jnp.asarray(mid.tile_max, jnp.int32))

            if with_latents:
                pred_image = (jnp.sum(lat_imgs, axis=0) + mid.image) / E + 1e-10
            else:
                # pre-start_warp: the prediction IS the mid render
                pred_image = mid.image

            # ---- exposure flow consistency loss (train.py:564-584). The
            # exposure-time passes double as the latent image/alpha
            # sources; the mid exposure (delta=0) reuses the mid render
            # outright, so flow costs E-1 extra geometry evaluations
            # instead of the reference's 3 per exposure.
            if compute_flow:
                pix = pixel_grid(width, height, use_center=False)
                m2e = mid.flow.reshape(height, width, E, 2)
                m2e = m2e.transpose(2, 0, 1, 3)               # [E, H, W, 2]
                mid2exp_coords = pix[None] + m2e

                zrow = jnp.zeros((1, height, width, 2))
                lat_f_imgs = jnp.concatenate(
                    [f_img[:half], mid.image[None], f_img[half:]], axis=0)
                lat_alphas = jnp.concatenate(
                    [f_alpha[:half], mid.d_alpha[None], f_alpha[half:]],
                    axis=0)
                e2m = jnp.concatenate(
                    [f_e2m[:half], zrow, f_e2m[half:]], axis=0)
                exp2mid_coords = pix[None] + e2m
                flow_l = losses.flow_warp_loss(
                    mid.image, lat_f_imgs, lat_alphas, mid.d_alpha,
                    exp2mid_coords, mid2exp_coords, width, height)
            else:
                flow_l = jnp.zeros(())

            return dict(pred=pred_image, depth=mid.depth, d_alpha=mid.d_alpha,
                        radii=mid.radii, flow_l=flow_l, tile_max=tile_max)

        # loop over the camera batch (B is 2 in the protocol). vmap is
        # NOT used here: batched gather/scatter lowers ~3x slower on TPU
        # (CLAUDE.md invariant); scan/unroll keep per-view ops unbatched.
        def view_body(carry, xs):
            vi, w2c_b, K_b, t_b, img_b, bf_b, off_b = xs
            return carry, per_view(vi, w2c_b, K_b, t_b, img_b, bf_b, off_b)

        _, outs = _loop(
            view_body,
            (batch.view_idx, batch.w2c, batch.K, batch.time, batch.image,
             batch.blur_feat, offsets),
            Bsz, 0, scan_views)

        pred = outs["pred"].transpose(0, 3, 1, 2)         # [B,3,H,W]
        gt = batch.image.transpose(0, 3, 1, 2)
        l1 = losses.l1_loss(pred, gt)
        ssim_v = losses.ssim_loss_term(pred, gt) if lambda_dssim else 0.0
        photo = l1 + lambda_dssim * (1.0 - ssim_v)

        depth_l1 = losses.l1_loss(outs["depth"], batch.depth)
        mask_l = 1e-7 * (losses.entropy_loss(outs["d_alpha"])
                         + losses.sparsity_loss(outs["d_alpha"]))
        flow_l = lambda_flow * jnp.sum(outs["flow_l"]) if compute_flow else 0.0
        reg = 0.2 * depth_l1 + mask_l + flow_l
        total = photo + reg

        psnr_v = jnp.mean(psnr(jax.lax.stop_gradient(pred), gt))
        aux = dict(radii=outs["radii"], photo=photo, depth_l1=depth_l1,
                   mask=mask_l, flow=flow_l, psnr=psnr_v,
                   tile_max=jnp.max(outs["tile_max"]))
        return total, aux

    return forward


def make_train_step(opt_cfg, width: int, height: int,
                    max_time: float, num_warp: int = 9,
                    raster_cfg: RasterConfig = RasterConfig(),
                    spatial_lr_scale: float = 5.0,
                    use_blce: bool = True,
                    with_latents: bool = True,
                    with_exposure_delta: bool = True,
                    with_omega_freeze: bool = False,
                    scan_passes=False, scan_views=False,
                    shared_static: bool = False):
    """Build the jitted per-iteration update.

    with_omega_freeze: densify mode 1 past iteration 8001
    (helper_train.py:191-194) — the step takes two extra [M] bool mask
    args (static pool, dynamic pool) and applies
    densify.apply_omega_freeze to the Gaussian grads before Adam.
    """
    forward = make_forward(opt_cfg, width, height, max_time, num_warp,
                           raster_cfg, use_blce, with_latents,
                           with_exposure_delta, scan_passes, scan_views,
                           shared_static)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(ts: TrainState, batch: Batch,
                   stat_omega_mask=None, dyn_omega_mask=None):
        stat_diff, stat_aux = G.split_diff(ts.stat)
        dyn_diff, dyn_aux = G.split_diff(ts.dyn)
        Bsz = batch.view_idx.shape[0]
        Ntot = ts.stat.capacity + ts.dyn.capacity
        offsets = jnp.zeros((Bsz, Ntot, 2), jnp.float32)

        grad_fn = jax.value_and_grad(forward, argnums=(0, 1, 2, 3, 4),
                                     has_aux=True)
        (total, aux), grads = grad_fn(stat_diff, dyn_diff, ts.sandwich,
                                      ts.blce.params, offsets,
                                      stat_aux, dyn_aux,
                                      ts.blce.exposure_expo, batch)
        g_stat, g_dyn, g_sand, g_blce, g_off = grads
        if with_omega_freeze:
            g_stat = densify.apply_omega_freeze(g_stat, stat_omega_mask)
            g_dyn = densify.apply_omega_freeze(g_dyn, dyn_omega_mask)

        # ---- densification stats from view-space grads (train.py:633-648)
        Ms = ts.stat.capacity
        vs_grad = jnp.sum(g_off, axis=0)  # accumulate over the batch
        vs_grad = vs_grad * jnp.asarray([width * 0.5, height * 0.5])
        radii = aux["radii"]                              # [B, Ntot]
        radii_max = jnp.max(radii, axis=0)
        visible = jnp.any(radii > 0, axis=0)
        stat_stats = densify.add_stats(ts.stat_stats, vs_grad[:Ms],
                                       radii_max[:Ms], visible[:Ms])
        dyn_stats = densify.add_stats(ts.dyn_stats, vs_grad[Ms:],
                                      radii_max[Ms:], visible[Ms:])

        # ---- Adam updates
        step = ts.step + 1
        lrs = gaussian_lrs(opt_cfg, step, spatial_lr_scale)
        new_stat_diff, stat_opt = adam_update(stat_diff, g_stat, ts.stat_opt, lrs)
        new_dyn_diff, dyn_opt = adam_update(dyn_diff, g_dyn, ts.dyn_opt, lrs)
        sand_lr = jax.tree.map(lambda _: jnp.asarray(opt_cfg.rgb_lr), ts.sandwich)
        new_sand, sand_opt = adam_update(ts.sandwich, g_sand,
                                         ts.sandwich_opt, sand_lr)
        # BLCE: lr 1e-4 decayed by 0.01^(step/iterations) (blce.py:136-137).
        # Global-norm clip: the SE(3) exp-map's 1/|w| factors amplify pose
        # gradients when the decoded axis passes near zero (observed NaN
        # blow-up ~iteration 1.4k without it; the reference shares the
        # parametrization but torch's non-finite grads fail silently).
        gnorm = jnp.sqrt(sum(jnp.sum(g * g)
                             for g in jax.tree.leaves(g_blce)) + 1e-20)
        scale = jnp.minimum(1.0, 1.0 / gnorm)
        scale = jnp.where(jnp.isfinite(gnorm), scale, 0.0)
        g_blce = jax.tree.map(lambda g: g * scale, g_blce)
        blce_lr_v = 1e-4 * (0.01 ** (step.astype(jnp.float32) / opt_cfg.iterations))
        blce_lr = jax.tree.map(lambda _: blce_lr_v, ts.blce.params)
        new_blce_p, blce_opt = adam_update(ts.blce.params, g_blce,
                                           ts.blce_opt, blce_lr)

        new_ts = TrainState(
            stat=G.merge_diff(new_stat_diff, stat_aux),
            dyn=G.merge_diff(new_dyn_diff, dyn_aux),
            sandwich=new_sand,
            blce=ts.blce._replace(params=new_blce_p),
            stat_opt=stat_opt, dyn_opt=dyn_opt, sandwich_opt=sand_opt,
            blce_opt=blce_opt, stat_stats=stat_stats, dyn_stats=dyn_stats,
            step=step, deform=ts.deform)
        metrics = Metrics(loss=total, photo=aux["photo"],
                          depth_l1=aux["depth_l1"], mask=aux["mask"],
                          flow=aux["flow"], psnr=aux["psnr"],
                          tile_max=aux["tile_max"])
        return new_ts, metrics

    return train_step


def make_exposure_update(width: int, height: int, max_time: float,
                         num_warp: int = 9,
                         raster_cfg: RasterConfig = RasterConfig()):
    """Online exposure re-estimation (train.py:474-492, every 10 iters):
    ratio of latent-window to frame-to-frame static flow magnitude.

    All views of the batch update in ONE vmapped dispatch (the reference
    loops per camera; on the remote-tunnel TPU each dispatch costs real
    latency, so the batch axis matters here too)."""

    @jax.jit
    def update(ts: TrainState, view_idx, w2c, K, time, blur_feat,
               fwd_w2c, bwd_w2c, is_endpoint):
        """Args are batched: view_idx [B], w2c/fwd_w2c/bwd_w2c [B,4,4],
        K [B,3,3], time/blur_feat/is_endpoint [B]."""

        def one(view_idx, w2c, K, time, blur_feat, fwd_w2c, bwd_w2c,
                is_endpoint):
            cam = Camera(w2c=w2c, K=K, time=time)
            c2w = se3.view_to_world(w2c)
            lat_c2w, _ = B.latent_poses(ts.blce, c2w, blur_feat, view_idx,
                                        num_warp)
            lat_w2c = se3.view_to_world(lat_c2w)
            start = Camera(w2c=lat_w2c[0], K=K, time=time)
            end = Camera(w2c=lat_w2c[-1], K=K, time=time)
            fwd = Camera(w2c=fwd_w2c, K=K, time=time)
            bwd = Camera(w2c=bwd_w2c, K=K, time=time)

            _, cam_flow = R.get_flow_static(ts.stat, bwd, fwd, cam,
                                            width, height, config=raster_cfg)
            _, lat_flow = R.get_flow_static(ts.stat, start, end, cam,
                                            width, height, config=raster_cfg)
            cam_mag = jnp.linalg.norm(cam_flow, axis=-1).reshape(-1)
            lat_mag = jnp.linalg.norm(lat_flow, axis=-1).reshape(-1)
            q = jnp.quantile(cam_mag, 0.01)
            valid = cam_mag > q
            ratio = jnp.where(valid, lat_mag / jnp.maximum(cam_mag, 1e-12),
                              jnp.nan)
            new_expo = jnp.nanmedian(ratio)
            new_expo = jnp.where(is_endpoint, new_expo * 0.5, new_expo)
            # keep the previous value if the estimate degenerates
            return jnp.where(jnp.isfinite(new_expo), new_expo,
                             ts.blce.exposure_expo[view_idx])

        new_expos = jax.vmap(one)(view_idx, w2c, K, time, blur_feat,
                                  fwd_w2c, bwd_w2c, is_endpoint)
        expo = ts.blce.exposure_expo.at[view_idx].set(new_expos)
        return ts._replace(blce=ts.blce._replace(exposure_expo=expo))

    return update
