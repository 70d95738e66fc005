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


def make_forward(opt_cfg, width: int, height: int,
                 max_time: float, num_warp: int = 9,
                 raster_cfg: RasterConfig = RasterConfig(),
                 use_blce: bool = True,
                 with_latents: bool = True,
                 with_exposure_delta: bool = True):
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

            # ---- flow displacement colors (computed BEFORE the mid
            # render so the mid→exp maps for ALL exposures ride the mid
            # pass as extra channels — the reference's 9 separate
            # mid-time get_flow rasterizations, renderer :379-491,
            # collapse into zero extra geometry evaluations; XLA CSEs
            # the duplicate mid projection)
            if compute_flow:
                ratios = [(e - half) / half for e in range(E)]
                Ntot = stat.capacity + dyn.capacity
                mid2d = R.project_combined(stat, dyn, cam, width, height,
                                           max_time, None, raster_cfg)
                # static unroll over exposures: batched (vmapped)
                # gather/scatter lowers ~3x slower on TPU than the same
                # ops unrolled (measured 327 vs 115 ms for the full
                # composite fwd+bwd at protocol shapes)
                exp2d = jnp.stack([
                    R.project_combined(stat, dyn, cam, width, height,
                                       max_time, d, raster_cfg)
                    for d in ratios])
                flow2d = jax.lax.stop_gradient(mid2d[None] - exp2d)  # [E,N,2]
                mid_extra = (-flow2d).transpose(1, 0, 2).reshape(Ntot, 2 * E)
            else:
                mid_extra = None

            # ---- mid render at the ORIGINAL camera (train.py:441-469).
            # The reference also renders a static-only pass here, but its
            # outputs feed only the /300-iteration debug dumps
            # (train.py:699-711) — that pass lives in the debug path, not
            # the hot step.
            mid = R.render_view(stat, dyn, sandwich, cam, width, height,
                                bg3, max_time, None, get_static=False,
                                get_dynamic=True, means2d_offset=offset,
                                extra_colors=mid_extra,
                                subset_alpha_only=True, config=raster_cfg)

            # ---- the other E-1 latent sharp renders (train.py:502-541),
            # statically unrolled (see the vmap note above)
            other = [i for i in range(E) if i != half]

            def latent_render(w2c_e, d_expo):
                cam_e = Camera(w2c=w2c_e, K=K, time=time)
                # image-only: the latent renders feed pred_image alone,
                # so skip the depth/weight columns (zero bg; the Pallas
                # kernel cannot DCE them from outside)
                out = R.render_view(stat, dyn, sandwich, cam_e, width,
                                    height, bg3, max_time, d_expo,
                                    want_depth=False, want_alpha=False,
                                    config=raster_cfg)
                return out.image, out.tile_max

            if with_latents:
                lat_outs = [latent_render(
                    lat_w2c[e], expo[e] if with_exposure_delta else None)
                    for e in other]
                lat_imgs = [o[0] for o in lat_outs]
                tile_max = jnp.maximum(
                    jnp.asarray(mid.tile_max),
                    jnp.max(jnp.stack([jnp.asarray(o[1]) for o in lat_outs])))
                pred_image = (sum(lat_imgs) + mid.image) / E + 1e-10
            else:
                # pre-start_warp: the prediction IS the mid render
                tile_max = jnp.asarray(mid.tile_max)
                pred_image = mid.image

            # ---- exposure flow consistency (train.py:564-584). The
            # exposure-time passes double as the latent image/alpha
            # sources; the mid exposure (delta=0) reuses the mid render
            # outright, so flow costs E-1 extra geometry evaluations
            # instead of the reference's 3 per exposure.
            if compute_flow:
                pix = pixel_grid(width, height, use_center=False)
                m2e = mid.flow.reshape(height, width, E, 2)
                m2e = m2e.transpose(2, 0, 1, 3)               # [E, H, W, 2]
                mid2exp_coords = pix[None] + m2e

                def flow_exp(d_expo, fl):
                    # consumes image + flow channels + the SUBSET alpha
                    # (fused chain) — the main pass's depth/weight
                    # columns are dead weight here
                    out = R.render_view(stat, dyn, sandwich, cam, width,
                                        height, bg3, max_time, d_expo,
                                        get_dynamic=True, extra_colors=fl,
                                        subset_alpha_only=True,
                                        want_depth=False, want_alpha=False,
                                        config=raster_cfg)
                    return out.image, out.d_alpha, out.flow, out.tile_max

                # static unroll over the E-1 exposure passes; slot the
                # mid render into position `half`
                lat_f_l, lat_a_l, e2m_l = [], [], []
                for e in range(E):
                    if e == half:
                        lat_f_l.append(mid.image)
                        lat_a_l.append(mid.d_alpha)
                        e2m_l.append(jnp.zeros((height, width, 2)))
                    else:
                        fi, fa, fe, ftm = flow_exp(ratios[e], flow2d[e])
                        tile_max = jnp.maximum(tile_max, jnp.asarray(ftm))
                        lat_f_l.append(fi)
                        lat_a_l.append(fa)
                        e2m_l.append(fe)
                lat_f_imgs = jnp.stack(lat_f_l)
                lat_alphas = jnp.stack(lat_a_l)
                e2m = jnp.stack(e2m_l)
                exp2mid_coords = pix[None] + e2m
                flow_l = losses.flow_warp_loss(
                    mid.image, lat_f_imgs, lat_alphas, mid.d_alpha,
                    exp2mid_coords, mid2exp_coords, width, height)
            else:
                flow_l = jnp.zeros(())

            return dict(pred=pred_image, depth=mid.depth, d_alpha=mid.d_alpha,
                        radii=mid.radii, flow_l=flow_l, tile_max=tile_max)

        # static unroll over the camera batch (B is 2 in the protocol;
        # batched gather/scatter under vmap costs ~3x on TPU)
        per_view_outs = [
            per_view(batch.view_idx[b], batch.w2c[b], batch.K[b],
                     batch.time[b], batch.image[b], batch.blur_feat[b],
                     offsets[b])
            for b in range(Bsz)]
        outs = {k: jnp.stack([o[k] for o in per_view_outs])
                for k in per_view_outs[0]}

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
                    with_omega_freeze: bool = False):
    """Build the jitted per-iteration update.

    with_omega_freeze: densify mode 1 past iteration 8001
    (helper_train.py:191-194) — the step takes two extra [M] bool mask
    args (static pool, dynamic pool) and applies
    densify.apply_omega_freeze to the Gaussian grads before Adam.
    """
    forward = make_forward(opt_cfg, width, height, max_time, num_warp,
                           raster_cfg, use_blce, with_latents,
                           with_exposure_delta)

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
