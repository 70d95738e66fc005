"""Warm-stage pose network (reference `scene/deformation.py:306-417`).

A time→pose MLP: positional-encoded time through two 256-wide trunks to
a 6-DoF head (euler rotation + translation), plus a per-frame depth
scale (`instance_scale_list`), a learned `focal_bias`, and a pixel-wise
depth-refinement MLP. The reference instantiates it for the legacy warm
path (`gaussian_model.py:159`); the MoBGS training flow never calls it —
ported for inventory completeness and checkpoint parity.

Key layout mirrors the torch module so a state_dict could be mapped
1:1: timenet0/timenet1 (Linear+ReLU pairs), timenet_out (no bias),
depth_scale_net_out (no bias), depth_net (4 Linear+ReLU), depth_out
(no bias), time_poc/pixel_poc buffers, focal_bias, instance_scale_list.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

TIMEBASE_PE = 10
TIMENET_WIDTH = 256
TIMENET_OUTPUT = 6
PIXEL_BASE_PE = 5


def euler2mat(angle: jnp.ndarray) -> jnp.ndarray:
    """Euler [B, 3] (x, y, z radians) → rotation matrices [B, 3, 3],
    composed xmat @ ymat @ zmat (deformation.py:441-478)."""
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    zeros = jnp.zeros_like(z)
    ones = jnp.ones_like(z)
    zmat = jnp.stack([cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones],
                     axis=1).reshape(-1, 3, 3)
    ymat = jnp.stack([cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy],
                     axis=1).reshape(-1, 3, 3)
    xmat = jnp.stack([ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx],
                     axis=1).reshape(-1, 3, 3)
    return xmat @ ymat @ zmat


def poc_fre(x: jnp.ndarray, poc: jnp.ndarray) -> jnp.ndarray:
    """Positional encoding [x ‖ sin(x·2^i) ‖ cos(x·2^i)]
    (deformation.py:794-799)."""
    emb = (x[..., None] * poc).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(emb), jnp.cos(emb)], axis=-1)


class PoseNetParams(NamedTuple):
    # trunks: lists of (w [in,out], b [out])
    timenet0: tuple
    timenet1: tuple
    timenet_out_w: jnp.ndarray        # [W, 6], init 1e-6 (line 340)
    depth_scale_out_w: jnp.ndarray    # [W, 1]
    depth_net: tuple
    depth_out_w: jnp.ndarray          # [W, 1]
    focal_bias: jnp.ndarray           # [1], init log(500)
    instance_scale: jnp.ndarray       # [V, 1], init 1.0
    max_time: float
    H: int
    W: int


def _linear(k, fan_in, fan_out):
    lim = math.sqrt(6.0 / (fan_in + fan_out))     # xavier_uniform gain 1
    kw, kb = jax.random.split(k)
    return (jax.random.uniform(kw, (fan_in, fan_out), jnp.float32,
                               -lim, lim),
            jax.random.uniform(kb, (fan_out,), jnp.float32, -lim, lim))


def init_posenet(rng: jax.Array, num_views: int, height: int, width: int,
                 max_time: float) -> PoseNetParams:
    times_ch = 2 * TIMEBASE_PE + 1
    pixel_ch = 2 * (2 * PIXEL_BASE_PE + 1)
    Wn = TIMENET_WIDTH
    ks = jax.random.split(rng, 10)
    return PoseNetParams(
        timenet0=(_linear(ks[0], times_ch, Wn), _linear(ks[1], Wn, Wn)),
        timenet1=(_linear(ks[2], Wn + times_ch, Wn), _linear(ks[3], Wn, Wn)),
        timenet_out_w=jnp.full((Wn, TIMENET_OUTPUT), 1e-6, jnp.float32),
        depth_scale_out_w=_linear(ks[4], Wn, 1)[0],
        depth_net=tuple(_linear(k, d_in, Wn) for k, d_in in zip(
            ks[5:9], (times_ch + pixel_ch + 1 + 3, Wn, Wn, Wn))),
        depth_out_w=_linear(ks[9], Wn, 1)[0],
        focal_bias=jnp.asarray([math.log(500.0)], jnp.float32),
        instance_scale=jnp.ones((num_views, 1), jnp.float32),
        max_time=float(max_time), H=height, W=width)


def _mlp(layers, x):
    for w, b in layers:
        x = jax.nn.relu(x @ w + b)
    return x


def posenet_forward(p: PoseNetParams, times_sel: jnp.ndarray,
                    depth: jnp.ndarray | None = None):
    """`pose_network.forward` (deformation.py:367-410).

    times_sel [B] → (R [B,3,3], t [B,3]) and, when depth [B, H*W] is
    given, the instance-scaled CVD depth [B, 1, H, W]."""
    time_poc = 2.0 ** jnp.arange(TIMEBASE_PE)
    temb = poc_fre(times_sel[:, None], time_poc)        # [B, times_ch]
    h = _mlp(p.timenet0, temb)
    h = _mlp(p.timenet1, jnp.concatenate([h, temb], axis=1))
    pose = h @ p.timenet_out_w                           # [B, 6]
    R = euler2mat(pose[:, 0:3])
    t = pose[:, 3:]
    if depth is None:
        return R, t

    idx = jnp.clip((times_sel * p.max_time).astype(jnp.int32), 0,
                   p.instance_scale.shape[0] - 1)
    scale = p.instance_scale[idx]                        # [B, 1]
    canon = jax.lax.stop_gradient(p.instance_scale[0])[None]
    scale = scale / canon
    cvd = depth.reshape(-1, 1, p.H, p.W) * scale[:, :, None, None]
    return R, t, cvd
