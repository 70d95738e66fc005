"""PLY checkpoint round-trip, torch grid_sample parity, loss oracles."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.models import gaussians as G
from mobgs_tpu.models.sandwich import init_sandwich
from mobgs_tpu.io import ply
from mobgs_tpu.train import losses


def make_state(n=30, cap=40, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    state = G.create_state(pts, cols, jnp.zeros(n), cap,
                           rng=jax.random.PRNGKey(0))
    # randomize every field so round-trip is meaningful
    diff, aux = G.split_diff(state)
    diff = jax.tree.map(
        lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)), diff)
    return G.merge_diff(diff, aux)


def test_ply_round_trip(tmp_path):
    state = make_state()
    sandwich = init_sandwich(jax.random.PRNGKey(1))
    path = os.path.join(tmp_path, "point_cloud.ply")
    ply.save_gaussians(path, state, sandwich)

    loaded = ply.load_gaussians(path, capacity=40)
    live = np.asarray(state.live)
    for f in G.DiffFields._fields:
        a = np.asarray(getattr(state, f))[live]
        b = np.asarray(getattr(loaded, f))[np.asarray(loaded.live)]
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=f)
    np.testing.assert_array_equal(np.asarray(state.control_num)[live],
                                  np.asarray(loaded.control_num)[np.asarray(loaded.live)])

    s2 = ply.load_sandwich_pt(os.path.join(tmp_path, "point_cloud.pt"))
    np.testing.assert_allclose(np.asarray(s2.w1), np.asarray(sandwich.w1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s2.w2), np.asarray(sandwich.w2), atol=1e-7)


def test_ply_schema_names():
    names = ply.attribute_names()
    # reference construct_list_of_attributes order (gaussian_model.py:696-725)
    assert names[:8] == ["x", "y", "z", "trbf_center", "trbf_scale",
                         "nx", "ny", "nz"]
    assert names[8] == "f_dc_0" and names[13] == "f_dc_5"
    assert "opacity" in names and names[-1] == "current_control_num"
    assert sum(n.startswith("f_rest_") for n in names) == 48
    assert sum(n.startswith("control_") for n in names) == 36


def test_grid_sample_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(3, 20, 30)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(16, 24, 2)).astype(np.float32)

    ours = np.asarray(losses.grid_sample_border(jnp.asarray(img),
                                                jnp.asarray(grid)))
    theirs = F.grid_sample(torch.from_numpy(img)[None],
                           torch.from_numpy(grid)[None],
                           mode="bilinear", padding_mode="border",
                           align_corners=False)[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def _composed_warp(img_hw3, coords, W, H):
    """The pre-fusion reference path: normalize + grid_sample_border."""
    g = losses.normalize_coords(coords, W, H)
    return losses.grid_sample_border(img_hw3.transpose(2, 0, 1),
                                     g).transpose(1, 2, 0)


def test_warp_images_matches_grid_sample_path():
    """warp_images (fused K-warp gather) == per-warp torch-parity sampler,
    values AND grads, including out-of-border coords."""
    rng = np.random.default_rng(2)
    K, H, W = 4, 12, 18
    imgs = jnp.asarray(rng.uniform(size=(K, H, W, 3)).astype(np.float32))
    # coords spanning inside + both out-of-border sides, avoiding exact
    # border hits (measure-zero one-sided-derivative divergence, see note
    # in losses.py)
    coords = jnp.asarray(
        rng.uniform(-4.3, 1.2, size=(K, H, W, 2)).astype(np.float32)
        * np.asarray([W, H], np.float32))

    got = losses.warp_images(imgs, coords, W, H)
    want = jnp.stack([_composed_warp(imgs[k], coords[k], W, H)
                      for k in range(K)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def loss_fused(im, c):
        return jnp.sum(losses.warp_images(im, c, W, H)
                       * jnp.cos(jnp.arange(K * H * W * 3).reshape(got.shape)))

    def loss_ref(im, c):
        w = jnp.stack([_composed_warp(im[k], c[k], W, H) for k in range(K)])
        return jnp.sum(w * jnp.cos(jnp.arange(K * H * W * 3).reshape(got.shape)))

    gi_f, gc_f = jax.grad(loss_fused, argnums=(0, 1))(imgs, coords)
    gi_r, gc_r = jax.grad(loss_ref, argnums=(0, 1))(imgs, coords)
    np.testing.assert_allclose(np.asarray(gi_f), np.asarray(gi_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_r), atol=1e-4)


def test_flow_warp_loss_matches_unfused_oracle():
    """flow_warp_loss (fused) == the straightforward per-warp formula."""
    rng = np.random.default_rng(3)
    E, H, W = 3, 10, 14
    ori = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    lat = jnp.asarray(rng.uniform(size=(E, H, W, 3)).astype(np.float32))
    la = jnp.asarray(rng.uniform(size=(E, H, W)).astype(np.float32))
    da = jnp.asarray(rng.uniform(size=(H, W)).astype(np.float32))
    e2m = jnp.asarray(rng.uniform(0, 1, size=(E, H, W, 2)).astype(np.float32)
                      * np.asarray([W - 1, H - 1], np.float32))
    m2e = jnp.asarray(rng.uniform(0, 1, size=(E, H, W, 2)).astype(np.float32)
                      * np.asarray([W - 1, H - 1], np.float32))

    got = float(losses.flow_warp_loss(ori, lat, la, da, e2m, m2e, W, H))

    wm = jnp.stack([_composed_warp(ori, e2m[e], W, H) for e in range(E)])
    t1 = losses.l1_loss(wm, lat, mask=la[..., None])
    wl = jnp.stack([_composed_warp(lat[e], m2e[e], W, H) for e in range(E)])
    ori_rep = jnp.broadcast_to(ori[None], (E, H, W, 3))
    mask = jnp.broadcast_to(da[None, ..., None], (E, H, W, 1))
    t2 = losses.l1_loss(wl, ori_rep, mask=mask)
    np.testing.assert_allclose(got, float(t1 + t2), rtol=1e-5)


def test_l1_masked_matches_reference_formula():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(size=(2, 3, 8, 8)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(2, 3, 8, 8)).astype(np.float32))
    m = jnp.asarray((rng.uniform(size=(2, 1, 8, 8)) > 0.5).astype(np.float32))
    got = float(losses.l1_loss(a, b, mask=m))
    mm = np.broadcast_to(np.asarray(m), a.shape)
    want = np.abs((np.asarray(a) - np.asarray(b)) * mm).sum() / (mm.sum() + 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_entropy_sparsity_values():
    a = jnp.asarray([0.5, 0.0, 1.0])
    ent = float(losses.entropy_loss(a))
    # only the 0.5 entry contributes ~ln(2)... (x2 for both terms)
    np.testing.assert_allclose(ent, 2 * 0.5 * -np.log(0.5 + 1e-6), rtol=1e-3)
    np.testing.assert_allclose(float(losses.sparsity_loss(a)), 1.25, rtol=1e-6)


def test_binary_dice_loss_matches_reference_module():
    """Runs the reference's OWN BinaryDiceLoss (loss_utils.py:384-443)
    against the port across the constructor grid."""
    from reference_shim import import_ref
    import torch

    lu = import_ref("utils.loss_utils")
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(3, 1, 6, 5)).astype(np.float32) * 3
    target = (rng.uniform(size=(3, 1, 6, 5)) > 0.4).astype(np.float32)
    for batch_dice in (False, True):
        for log_loss in (False, True):
            for from_logits in (True, False):
                pred = logits if from_logits else 1 / (1 + np.exp(-logits))
                ref = lu.BinaryDiceLoss(batch_dice=batch_dice,
                                        from_logits=from_logits,
                                        log_loss=log_loss, smooth=0.1)
                want = float(ref(torch.from_numpy(pred),
                                 torch.from_numpy(target)))
                got = float(losses.binary_dice_loss(
                    jnp.asarray(pred), jnp.asarray(target),
                    batch_dice=batch_dice, from_logits=from_logits,
                    log_loss=log_loss, smooth=0.1))
                np.testing.assert_allclose(got, want, rtol=1e-5)
