"""Test-time pose optimization (TTO) evaluation.

Parity target: `eval.py:43-166` — per test frame, optimize the w2c pose
(quaternion + translation) with Adam against −PSNR of the render vs the
sharp ground truth, cosine LR decay after `decay_start`, then render the
refined view.

TPU-first: the reference loops 24 cameras × N python steps × several
CUDA launches each, paying host↔device round-trips per step. Here the
whole optimization is ONE jitted program — `lax.map` over cameras of a
`fori_loop` over Adam steps on the 7 pose scalars — so the host is out
of the loop entirely. The cameras run SEQUENTIALLY inside that program
(deliberately: batching the render with vmap hits the ~3x TPU
gather/scatter lowering cliff, CLAUDE.md invariant, which would cost
more than the per-camera overhead it saves on a single core; measured
TTO wall-clock is in BASELINE.md).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobgs_tpu.core import se3
from mobgs_tpu.data.cameras import Camera
from mobgs_tpu.models import gaussians as G
from mobgs_tpu.models import render as R
from mobgs_tpu.models.sandwich import SandwichParams
from mobgs_tpu.ops.rasterize import RasterConfig


class TTOResult(NamedTuple):
    w2c: jnp.ndarray      # [V, 4, 4] refined poses
    renders: jnp.ndarray  # [V, H, W, 3]
    psnr: jnp.ndarray     # [V]


def make_tto(stat: G.GaussianState, dyn: G.GaussianState,
             sandwich: SandwichParams, width: int, height: int,
             max_time: float = 1.0,
             steps: int = 100, decay_start: int = 30,
             lr_q: float = 3e-4, lr_p: float = 3e-4,
             lr_final: float = 1e-6,
             raster_cfg: RasterConfig = RasterConfig()):
    """Build the jitted TTO function over a batch of test cameras.

    Defaults match the SHIPPED reference call (`eval.py:258-263`:
    tto_steps=100, decay_start=30, lr_p=lr_q=3e-4, lr_final=1e-6,
    initialize_from_previous_camera=False ⇒ per-camera lr factor 1.0),
    not the function-signature defaults at `eval.py:51-57`.
    """
    bg3 = jnp.zeros(3, jnp.float32)
    t_max = max(steps - decay_start, 1)

    def render_rgb(q, t, K, time):
        Rm = se3.quat_to_rotmat(q)
        top = jnp.concatenate([Rm, t[:, None]], axis=1)
        w2c = jnp.concatenate(
            [top, jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
        cam = Camera(w2c=w2c, K=K, time=time)
        out = R.render_view(stat, dyn, sandwich, cam, width, height, bg3,
                            max_time, config=raster_cfg)
        return out.image, w2c

    def neg_psnr(qt, K, time, gt):
        q, t = qt
        img, _ = render_rgb(q, t, K, time)
        mse = jnp.mean((img - gt) ** 2)
        return -(20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12))))

    @functools.partial(jax.jit, static_argnames=())
    def tto(w2c0: jnp.ndarray, K: jnp.ndarray, time: jnp.ndarray,
            gt: jnp.ndarray, lr_scale: jnp.ndarray) -> TTOResult:
        """Optimize all cameras in parallel.

        Args: w2c0 [V,4,4]; K [V,3,3]; time [V]; gt [V,H,W,3];
              lr_scale [V] per-camera LR factor (reference uses 0.1
              after the first camera).
        """

        def per_cam(w2c_i, K_i, time_i, gt_i, lr_s):
            q0 = se3.rotmat_to_quat(w2c_i[:3, :3])
            t0 = w2c_i[:3, 3]

            def body(step, carry):
                (q, t), (mq, vq, mt, vt) = carry
                loss, (gq, gt_) = jax.value_and_grad(neg_psnr)(
                    (q, t), K_i, time_i, gt_i)
                n = jnp.clip(step - decay_start, 0, t_max).astype(jnp.float32)
                cos = 0.5 * (1 + jnp.cos(jnp.pi * n / t_max))
                lrq = (lr_final + (lr_q - lr_final) * cos) * lr_s
                lrp = (lr_final + (lr_p - lr_final) * cos) * lr_s
                b1, b2, eps = 0.9, 0.999, 1e-8
                tt = (step + 1).astype(jnp.float32)

                def adam(p, g, m, v, lr):
                    m = b1 * m + (1 - b1) * g
                    v = b2 * v + (1 - b2) * g * g
                    mh = m / (1 - b1**tt)
                    vh = v / (1 - b2**tt)
                    return p - lr * mh / (jnp.sqrt(vh) + eps), m, v

                q2, mq, vq = adam(q, gq, mq, vq, lrq)
                t2, mt, vt = adam(t, gt_, mt, vt, lrp)
                return (q2, t2), (mq, vq, mt, vt)

            init = ((q0, t0), (jnp.zeros(4), jnp.zeros(4),
                               jnp.zeros(3), jnp.zeros(3)))
            (q, t), _ = jax.lax.fori_loop(0, steps, body, init)
            img, w2c = render_rgb(q, t, K_i, time_i)
            mse = jnp.mean((img - gt_i) ** 2)
            psnr = 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
            return w2c, jnp.clip(img, 0.0, 1.0), psnr

        w2c, renders, psnrs = jax.lax.map(
            lambda a: per_cam(*a), (w2c0, K, time, gt, lr_scale))
        return TTOResult(w2c=w2c, renders=renders, psnr=psnrs)

    return tto
