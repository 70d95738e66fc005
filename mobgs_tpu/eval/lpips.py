"""LPIPS (AlexNet, v0.1) in pure JAX.

Parity target: the vendored LPIPS stack at reference `models/`
(`networks_basic.py:31-96`): torchvision AlexNet conv features at 5
taps → channel-unit-normalize → learned 1x1 linear per tap (weights in
`models/weights/v0.1/alex.pth`) → spatial mean → sum over taps.

Weight sourcing: the learned linear weights load from any LPIPS v0.1
``alex.pth``. The AlexNet *backbone* weights load from a torchvision
``alexnet`` state_dict when available (`backbone_path`); in a
zero-egress image without torchvision they are unavailable, so the
fallback is a fixed-seed random backbone — the metric is then a valid
perceptual-style distance but NOT numerically comparable to published
LPIPS numbers (callers should label it; see eval/metrics.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# AlexNet feature config: (out_ch, kernel, stride, pad), with taps after
# each ReLU and maxpools between groups, exactly torchvision's layout.
_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
          (256, 3, 1, 1), (256, 3, 1, 1)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPSParams(NamedTuple):
    conv_w: tuple        # 5 x [out, in, k, k]
    conv_b: tuple        # 5 x [out]
    lin_w: tuple         # 5 x [C] learned per-channel weights
    pretrained_backbone: bool


def _random_backbone(seed: int = 0):
    rng = np.random.default_rng(seed)
    ws, bs = [], []
    cin = 3
    for cout, k, _, _ in _CONVS:
        fan = cin * k * k
        ws.append((rng.normal(size=(cout, cin, k, k)) / np.sqrt(fan)).astype(np.float32))
        bs.append(np.zeros(cout, np.float32))
        cin = cout
    return ws, bs


def find_default_lpips_weights(near: str | None = None) -> str | None:
    """Locate LPIPS v0.1 lin weights (``alex.pth``) without flags.

    Search order: (1) $MOBGS_LPIPS_WEIGHTS, (2) next to the checkpoint
    / results dir being evaluated, (3) the reference repo's bundled
    copy. Mirrors the reference behavior of always loading its vendored
    `models/weights/v0.1/alex.pth` (`models/dist_model.py:61-65`).
    """
    import os
    cands = []
    env = os.environ.get("MOBGS_LPIPS_WEIGHTS")
    if env:
        cands.append(env)
    if near:
        cands.append(os.path.join(near, "alex.pth"))
        cands.append(os.path.join(near, "weights", "v0.1", "alex.pth"))
    cands.append("/root/reference/models/weights/v0.1/alex.pth")
    for c in cands:
        if c and os.path.isfile(c):
            return c
    return None


def find_default_backbone(near: str | None = None) -> str | None:
    """Locate a torchvision alexnet state_dict for the LPIPS backbone.

    Published-comparable LPIPS needs torchvision's ImageNet alexnet
    weights; in a zero-egress image they are usually absent and the
    metric falls back to a fixed-seed random backbone (labelled
    ``lpips_randfeat`` by callers)."""
    import glob
    import os
    cands = []
    env = os.environ.get("MOBGS_ALEXNET_WEIGHTS")
    if env:
        cands.append(env)
    if near:
        cands.append(os.path.join(near, "alexnet.pth"))
    hub = os.path.expanduser("~/.cache/torch/hub/checkpoints")
    cands.extend(sorted(glob.glob(os.path.join(hub, "alexnet*.pth"))))
    for c in cands:
        if c and os.path.isfile(c):
            return c
    return None


def load_lpips(lin_path: str | None = None,
               backbone_path: str | None = None) -> LPIPSParams:
    if lin_path is not None:
        import torch
        sd = torch.load(lin_path, map_location="cpu", weights_only=True)
        lin_w = tuple(jnp.asarray(sd[f"lin{i}.model.1.weight"].numpy()
                                  .reshape(-1)) for i in range(5))
    else:
        lin_w = tuple(jnp.ones(c[0], jnp.float32) / c[0] for c in _CONVS)

    pretrained = False
    if backbone_path is not None:
        import torch
        sd = torch.load(backbone_path, map_location="cpu", weights_only=True)
        conv_keys = [k for k in sd if k.startswith("features") and "weight" in k]
        conv_keys = sorted(conv_keys, key=lambda k: int(k.split(".")[1]))
        ws = [jnp.asarray(sd[k].numpy()) for k in conv_keys]
        bs = [jnp.asarray(sd[k.replace("weight", "bias")].numpy())
              for k in conv_keys]
        pretrained = True
    else:
        w_np, b_np = _random_backbone()
        ws = [jnp.asarray(w) for w in w_np]
        bs = [jnp.asarray(b) for b in b_np]
    return LPIPSParams(conv_w=tuple(ws), conv_b=tuple(bs), lin_w=lin_w,
                       pretrained_backbone=pretrained)


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, 3, 3), (1, 1, 2, 2), "VALID")


def _features(params: LPIPSParams, x: jnp.ndarray):
    """x: [B, 3, H, W] in [-1, 1] (LPIPS convention). Returns 5 taps."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / \
        jnp.asarray(_SCALE)[None, :, None, None]
    taps = []
    for i, (cout, k, s, p) in enumerate(_CONVS):
        x = jax.nn.relu(_conv(x, params.conv_w[i], params.conv_b[i], s, p))
        taps.append(x)
        if i in (0, 1):
            x = _maxpool(x)
    return taps


@functools.partial(jax.jit, static_argnums=())
def lpips_distance(params: LPIPSParams, img0: jnp.ndarray,
                   img1: jnp.ndarray) -> jnp.ndarray:
    """Images [B, 3, H, W] in [-1, 1]. Returns [B] distances."""
    f0 = _features(params, img0)
    f1 = _features(params, img1)
    total = 0.0
    for a, b, w in zip(f0, f1, params.lin_w):
        an = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
        bn = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
        diff = (an - bn) ** 2
        weighted = jnp.einsum("bchw,c->bhw", diff, w)
        total = total + jnp.mean(weighted, axis=(1, 2))
    return total
