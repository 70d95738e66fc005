"""Eval-protocol constants pinned to the SHIPPED reference call sites."""

import inspect


def test_tto_defaults_match_shipped_eval_call():
    """eval.py:258-263: tto_steps=100, decay_start=30, lr 3e-4 -> 1e-6."""
    from mobgs_tpu.eval.tto import make_tto
    sig = inspect.signature(make_tto)
    assert sig.parameters["steps"].default == 100
    assert sig.parameters["decay_start"].default == 30
    assert sig.parameters["lr_q"].default == 3e-4
    assert sig.parameters["lr_p"].default == 3e-4
    assert sig.parameters["lr_final"].default == 1e-6


def test_metrics_cli_gt_fallback(tmp_path, capsys):
    """With no -s, metrics_cli pairs renders against the test_gt/
    staging dir eval_cli writes (the hermetic synthetic protocol has
    no inference_images/ source dir — this failed on the first 10k
    protocol run)."""
    import numpy as np
    from PIL import Image

    from mobgs_tpu.cli.metrics_cli import main as metrics_main

    rng = np.random.default_rng(0)
    (tmp_path / "test_refined").mkdir()
    (tmp_path / "test_gt").mkdir()
    for i in range(2):
        img = (rng.uniform(size=(32, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            tmp_path / "test_refined" / f"img_{i:05d}.png.png")
        Image.fromarray(img).save(tmp_path / "test_gt" / f"{i:05d}.png")

    out = metrics_main(["-m", str(tmp_path), "--no_tof"])
    assert out["psnr"] > 50.0  # identical images
    assert out["ssim"] > 0.99
