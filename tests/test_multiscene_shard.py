"""Scale-out tests: 2x-resolution sharded rendering and multi-scene
data-parallel batching over the virtual 8-device mesh (BASELINE.json
config 5 shape)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mobgs_tpu.ops.rasterize import RasterConfig, rasterize
from mobgs_tpu.parallel import mesh as Mx


def make_cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32)
    means[:, 2] += 7.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.5, -2, (n, 3))).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    return tuple(map(jnp.asarray, (means, quats, scales, opac, colors)))


def test_gauss_sharded_highres_render_matches_single():
    # Gaussian axis sharded 8-way; XLA inserts the all-gather for binning
    mesh = Mx.make_mesh(n_data=1, n_gauss=8)
    W, H = 256, 128  # "2x" the small test resolution
    n = 1024
    means, quats, scales, opac, colors = make_cloud(n)
    K = jnp.asarray([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1]])
    cfg = RasterConfig(tile_chunk=16, max_per_tile=256)

    ref = rasterize(means, quats, scales, opac, colors, jnp.eye(4), K,
                    W, H, background=jnp.zeros(3), config=cfg)

    gs = NamedSharding(mesh, P("gauss"))
    sharded_in = [jax.device_put(x, gs)
                  for x in (means, quats, scales, opac, colors)]

    @jax.jit
    def render(m, q, s, o, c):
        out = rasterize(m, q, s, o, c, jnp.eye(4), K, W, H,
                        background=jnp.zeros(3), config=cfg)
        return out.images[0]

    img = render(*sharded_in)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.images[0]),
                               atol=1e-4)


def test_multiscene_data_parallel_batch():
    # two independent scenes rendered as one data-parallel program
    mesh = Mx.make_mesh(n_data=2, n_gauss=4)
    W, H = 64, 48
    n = 256
    clouds = [make_cloud(n, seed=i) for i in range(2)]
    stacked = [jnp.stack([c[i] for c in clouds]) for i in range(5)]
    K = jnp.asarray([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    cfg = RasterConfig(tile_chunk=6, max_per_tile=128)

    def render_one(m, q, s, o, c):
        out = rasterize(m, q, s, o, c, jnp.eye(4), K, W, H,
                        background=jnp.zeros(3), config=cfg)
        return out.images[0]

    ds = NamedSharding(mesh, P("data"))
    batched = [jax.device_put(x, ds) for x in stacked]
    imgs = jax.jit(jax.vmap(render_one))(*batched)
    for i in range(2):
        ref = render_one(*[c for c in clouds[i]])
        np.testing.assert_allclose(np.asarray(imgs[i]), np.asarray(ref),
                                   atol=1e-4)


def test_tile_sharded_pallas_compositor_matches_unsharded():
    """Round-4 VERDICT item 4: the production Pallas compositor (an
    opaque custom call GSPMD cannot partition) must shard over the tile
    axis via the explicit `jax.shard_map` in ops/pallas_raster.py —
    value- and gradient-identical to the unsharded kernel, with each
    device compositing a [T/n_gauss, ...] tile slice (checked in the
    compiled HLO), including the fused subset-alpha variant."""
    import re

    mesh = Mx.make_mesh(n_data=2, n_gauss=4)
    W, H = 128, 64   # 8x4 = 32 tiles -> 8 per gauss rank
    n = 512
    means, quats, scales, opac, colors = make_cloud(n, seed=5)
    K = jnp.asarray([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]])
    cfg = RasterConfig(tile_chunk=8, max_per_tile=128, backend="pallas")
    sub_mask = (jnp.arange(n) % 2).astype(jnp.float32)[None]

    def mk_loss():
        def loss(m, o):
            out = rasterize(m, quats, scales, o, colors, jnp.eye(4), K,
                            W, H, background=jnp.zeros(3),
                            alpha_masks=sub_mask, config=cfg)
            return (jnp.sum(out.images[0] ** 2)
                    + jnp.sum(out.sub_alphas[0] ** 2),
                    (out.images[0], out.sub_alphas[0], out.depths[0]))
        return loss

    loss = mk_loss()
    (ref_val, ref_outs) = jax.jit(loss)(means, opac)
    ref_grads = jax.jit(jax.grad(lambda m, o: loss(m, o)[0],
                                 argnums=(0, 1)))(means, opac)

    Mx.enable_tile_sharding(mesh, axis="gauss")
    try:
        from mobgs_tpu.parallel.mesh import tile_shard_info
        info = tile_shard_info(32)
        assert info is not None and info[2] == 4
        loss_s = mk_loss()
        jf = jax.jit(loss_s)
        hlo = jf.lower(means, opac).compile().as_text()
        val, outs = jf(means, opac)
        grads = jax.jit(jax.grad(lambda m, o: loss_s(m, o)[0],
                                 argnums=(0, 1)))(means, opac)
    finally:
        Mx.disable_tile_sharding()

    # each device's kernel operands are a [T/4 = 8, NC, R, ch] slice
    assert re.search(r"f32\[8,1,8,128\]", hlo), \
        "Pallas compositor operands are not tile-sharded in the HLO"
    assert not re.search(r"f32\[32,1,8,128\]", hlo), \
        "a full-tile-axis (replicated) operand survived tile sharding"

    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
    for a, b in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_tile_sharded_compositing_splits_per_device_work():
    """Round-3 VERDICT item 3: with tile sharding enabled, the
    compositor's per-chunk [c, K, P] panels must SHRINK to c/n_gauss per
    device (inspected in the compiled HLO), the result must match the
    replicated render, and the backward gradients must be unchanged."""
    import re

    mesh = Mx.make_mesh(n_data=2, n_gauss=4)
    W, H = 256, 128
    n = 1024
    means, quats, scales, opac, colors = make_cloud(n, seed=3)
    K = jnp.asarray([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1]])
    chunk, cap = 16, 128
    cfg = RasterConfig(tile_chunk=chunk, max_per_tile=cap)

    def mk_loss():
        # fresh function object per phase: jax's jit cache keys on the
        # callable, and the tile-shard flag is read at TRACE time
        def loss(m):
            out = rasterize(m, quats, scales, opac, colors, jnp.eye(4), K,
                            W, H, background=jnp.zeros(3), config=cfg)
            return jnp.sum(out.images[0] ** 2), out.images[0]
        return loss

    loss = mk_loss()
    ref_val, ref_img = jax.jit(loss)(means)
    ref_grad = jax.jit(jax.grad(lambda m: loss(m)[0]))(means)

    Mx.enable_tile_sharding(mesh, axis="gauss")
    try:
        loss_s = mk_loss()
        jf = jax.jit(loss_s)
        hlo = jf.lower(means).compile().as_text()
        val, img = jf(means)
        grad = jax.jit(jax.grad(lambda m: loss_s(m)[0]))(means)
    finally:
        Mx.disable_tile_sharding()

    # per-device panel: [chunk/n_gauss, K, P] instead of [chunk, K, P]
    local = chunk // 4
    assert re.search(rf"f32\[{local},{cap},256\]", hlo), \
        "compositor panels are not tile-sharded in the compiled HLO"
    assert not re.search(rf"f32\[{chunk},{cap},256\]", hlo), \
        "a full-chunk (replicated) panel survived tile sharding"

    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               atol=1e-5)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref_grad),
                               atol=1e-5)
