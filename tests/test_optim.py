"""Optimizer parity tests: expon LR schedule, Adam vs torch, LR tree."""

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.config import OptimizationParams
from mobgs_tpu.train import optim


def ref_expon_lr(step, lr_init, lr_final, max_steps):
    """Transliteration of the reference formula (general_utils.py:35-60)."""
    if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
        return 0.0
    t = np.clip(step / max_steps, 0, 1)
    return np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)


def test_expon_lr_matches_reference():
    for step in [0, 1, 100, 5000, 20000, 30000]:
        got = float(optim.expon_lr(step, 8e-4, 8e-6, 20000))
        want = ref_expon_lr(step, 8e-4, 8e-6, 20000)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gaussian_lrs_reference_values():
    cfg = OptimizationParams()
    lrs = optim.gaussian_lrs(cfg, step=0, spatial_lr_scale=5.0)
    # training_setup group values (gaussian_model.py:598-618)
    np.testing.assert_allclose(float(lrs.xyz), 0.00016 * 5, rtol=1e-5)
    np.testing.assert_allclose(float(lrs.control_xyz), 10 * 0.00016 * 5)
    np.testing.assert_allclose(float(lrs.features_dc), 0.0025)
    np.testing.assert_allclose(float(lrs.features_rest), 0.0025 / 20)
    np.testing.assert_allclose(float(lrs.opacity), 0.05)
    np.testing.assert_allclose(float(lrs.scaling), 0.005)
    np.testing.assert_allclose(float(lrs.rotation), 0.001)
    np.testing.assert_allclose(float(lrs.trbf_scale), 0.03)
    np.testing.assert_allclose(float(lrs.motion), 0.00016 * 5 * 0.5 * 3.5)
    # xyz decays, control_xyz does not (never matched by the scheduler)
    lrs2 = optim.gaussian_lrs(cfg, step=20000, spatial_lr_scale=5.0)
    np.testing.assert_allclose(float(lrs2.xyz), 0.0000016 * 5, rtol=1e-5)
    np.testing.assert_allclose(float(lrs2.control_xyz), 10 * 0.00016 * 5)


def test_adam_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(8, 3)).astype(np.float32)
    grads = [rng.normal(size=(8, 3)).astype(np.float32) for _ in range(5)]

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=0.01, eps=1e-15)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()

    params = {"w": jnp.asarray(p0)}
    state = optim.init_adam(params)
    lr = {"w": jnp.asarray(0.01)}
    for g in grads:
        params, state = optim.adam_update(params, {"w": jnp.asarray(g)},
                                          state, lr)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), atol=2e-6)


def test_ssim_matches_reference_torch_formula():
    """Exact parity with the reference _ssim (loss_utils.py:351-382):
    11x11 Gaussian window sigma=1.5, zero-padded depthwise conv."""
    import math
    import torch
    import torch.nn.functional as F
    from mobgs_tpu.core.image import ssim as our_ssim

    def create_window(window_size=11, channel=3):
        g = torch.tensor([math.exp(-(x - window_size // 2) ** 2 /
                                   (2 * 1.5 ** 2))
                          for x in range(window_size)])
        g = (g / g.sum()).unsqueeze(1)
        w2 = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
        return w2.expand(channel, 1, window_size, window_size).contiguous()

    def ref_ssim(img1, img2):
        window = create_window()
        mu1 = F.conv2d(img1, window, padding=5, groups=3)
        mu2 = F.conv2d(img2, window, padding=5, groups=3)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, window, padding=5, groups=3) - mu1_sq
        s2 = F.conv2d(img2 * img2, window, padding=5, groups=3) - mu2_sq
        s12 = F.conv2d(img1 * img2, window, padding=5, groups=3) - mu1_mu2
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
            (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
        return m.mean().item()

    rng = np.random.default_rng(7)
    a = rng.uniform(size=(1, 3, 40, 56)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.08, size=a.shape), 0, 1).astype(np.float32)
    want = ref_ssim(torch.from_numpy(a), torch.from_numpy(b))
    got = float(our_ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-5)
