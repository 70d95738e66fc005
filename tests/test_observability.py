"""Timer / logger / debug-grid tests."""

import json
import os
import time

import numpy as np

from mobgs_tpu.utils import observability as O


def test_timer_pause_excludes_time():
    t = O.Timer()
    t.start()
    time.sleep(0.05)
    t.pause()
    paused_at = t.get_elapsed_time()
    time.sleep(0.05)
    assert abs(t.get_elapsed_time() - paused_at) < 1e-6
    t.start()
    time.sleep(0.02)
    assert t.get_elapsed_time() > paused_at + 0.01


def test_run_logger_jsonl_and_points_journal(tmp_path):
    log = O.RunLogger(str(tmp_path))
    log.scalars(1, loss=0.5, psnr=20.0)
    log.scalars(2, loss=0.4, psnr=21.0)
    log.record_points(2, "after densify", 12345)
    log.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "scalars.jsonl").read().splitlines()]
    assert lines[0]["step"] == 1 and lines[1]["psnr"] == 21.0
    assert "after densify 12345" in open(tmp_path / "exp_log.txt").read()


def test_debug_grid_written(tmp_path):
    p = str(tmp_path / "grid.png")
    O.save_debug_grid(p, {"a": np.zeros((8, 8, 3)),
                          "b": np.ones((8, 8))})
    from PIL import Image
    img = np.asarray(Image.open(p))
    assert img.shape == (8, 16, 3)
    assert img[:, :8].max() == 0 and img[:, 8:].min() == 255


def test_setup_seed_deterministic():
    O.setup_seed(123)
    a = np.random.rand(3)
    O.setup_seed(123)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
