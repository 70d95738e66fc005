"""LPIPS backbone sourcing tests (round-2 judge item 9).

The published-comparable LPIPS needs torchvision's pretrained AlexNet
(reference models/pretrained_networks.py:14-40); this image has no
torchvision, so the metric falls back to a fixed-seed random backbone
and callers must label it `lpips_randfeat`. These tests pin the
backbone-load path end-to-end with a synthetic torchvision-layout
state_dict so a real weights file works the moment one appears.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mobgs_tpu.eval import lpips as L

torch = pytest.importorskip("torch")


def _synthetic_alexnet_state_dict():
    """torchvision alexnet `features.*` layout (indices 0,3,6,8,10)."""
    rng = np.random.default_rng(7)
    idxs = [0, 3, 6, 8, 10]
    sd = {}
    cin = 3
    for i, (cout, k, _, _) in zip(idxs, L._CONVS):
        sd[f"features.{i}.weight"] = torch.from_numpy(
            rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05)
        sd[f"features.{i}.bias"] = torch.from_numpy(
            rng.normal(size=(cout,)).astype(np.float32) * 0.01)
        cin = cout
    # classifier keys must be ignored by the loader
    sd["classifier.1.weight"] = torch.zeros(8, 8)
    return sd


def test_backbone_state_dict_load(tmp_path):
    path = tmp_path / "alexnet.pth"
    torch.save(_synthetic_alexnet_state_dict(), path)
    params = L.load_lpips(None, str(path))
    assert params.pretrained_backbone
    assert params.conv_w[0].shape == (64, 3, 11, 11)
    assert params.conv_w[4].shape == (256, 256, 3, 3)

    img = jnp.asarray(np.random.default_rng(0)
                      .uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32))
    d_same = L.lpips_distance(params, img, img)
    assert float(d_same[0]) < 1e-6
    other = jnp.clip(img + 0.5, -1, 1)
    assert float(L.lpips_distance(params, img, other)[0]) > 1e-4


def test_backbone_autodetect_env(tmp_path, monkeypatch):
    path = tmp_path / "weights.pth"
    torch.save(_synthetic_alexnet_state_dict(), path)
    monkeypatch.setenv("MOBGS_ALEXNET_WEIGHTS", str(path))
    assert L.find_default_backbone() == str(path)
    monkeypatch.delenv("MOBGS_ALEXNET_WEIGHTS")
    monkeypatch.setenv("HOME", str(tmp_path))  # no torch hub cache
    assert L.find_default_backbone() is None


def test_metric_key_labels_backbone():
    """evaluate_sequence must label random-backbone LPIPS unambiguously."""
    from mobgs_tpu.eval.metrics import evaluate_sequence
    imgs = np.random.default_rng(1).uniform(
        0, 1, (2, 32, 48, 3)).astype(np.float32)
    rand_params = L.load_lpips(None, None)
    out = evaluate_sequence(imgs, imgs, lpips_params=rand_params,
                            compute_tof=False)
    assert "lpips_randfeat" in out and "lpips" not in out
