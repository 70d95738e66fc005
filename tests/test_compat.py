"""gsplat-shim API surface tests."""

import numpy as np
import jax.numpy as jnp

from mobgs_tpu import compat
from mobgs_tpu.ops.rasterize import RasterConfig

CFG = RasterConfig(tile_chunk=4, max_per_tile=128)


def setup(n=80):
    rng = np.random.default_rng(0)
    means = rng.normal(size=(n, 3)).astype(np.float32)
    means[:, 2] += 6
    return (jnp.asarray(means),
            jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
            jnp.asarray(np.exp(rng.uniform(-3, -1.5, (n, 3))).astype(np.float32)),
            jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32)),
            jnp.asarray(rng.uniform(size=(n, 9)).astype(np.float32)))


def test_rasterization_rgb_ed_signature():
    means, quats, scales, opac, colors = setup()
    W, H = 64, 48
    K = jnp.asarray([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    bg = jnp.zeros(9)
    img, alpha, info = compat.rasterization(
        means, quats, scales, opac, colors, backgrounds=bg[None],
        viewmats=jnp.eye(4)[None], Ks=K[None], width=W, height=H,
        packed=False, render_mode="RGB+ED", config=CFG)
    assert img.shape == (1, H, W, 10)   # 9 features + expected depth
    assert alpha.shape == (1, H, W, 1)
    assert info["means2d"].shape == (1, means.shape[0], 2)
    assert info["radii"].shape == (1, means.shape[0])
    # the reference's depth split: rendered_image[..., -1] is depth
    assert float(img[0, ..., -1].max()) > 1.0


def test_fully_fused_projection_signature():
    means, quats, scales, opac, colors = setup()
    W, H = 64, 48
    K = jnp.asarray([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    _, means2d, _, _, _ = compat.fully_fused_projection(
        means=means, covars=None, quats=quats, scales=scales,
        viewmats=jnp.eye(4)[None], Ks=K[None], width=W, height=H,
        config=CFG)
    assert means2d.shape == (1, means.shape[0], 2)
    vis = np.asarray(means2d[0])
    assert np.isfinite(vis).all()
