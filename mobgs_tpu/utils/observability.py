"""Observability: wall-clock timer, structured logging, debug dumps.

Parity targets (SURVEY.md §5): `utils/timer.py` (pause/resume timer that
excludes eval/IO from reported training time), `helper_train.py:303-309`
(exp_log point-count journal), `main_utils.py:49-92` (debug image
grids), and TensorBoard-optional scalar logging (train.py:40-45,
871-934). TPU additions: `jax.profiler` trace capture helpers.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager

import numpy as np


class Timer:
    """Pause/resume wall-clock timer (reference utils/timer.py:2-24)."""

    def __init__(self):
        self.start_time = None
        self.elapsed = 0.0
        self.paused = False

    def start(self):
        if self.start_time is None or self.paused:
            self.start_time = time.time()
            self.paused = False

    def pause(self):
        if not self.paused and self.start_time is not None:
            self.elapsed += time.time() - self.start_time
            self.paused = True

    def get_elapsed_time(self) -> float:
        if self.paused or self.start_time is None:
            return self.elapsed
        return self.elapsed + (time.time() - self.start_time)


class RunLogger:
    """JSONL scalar logger + optional TensorBoard.

    The reference logs to TensorBoard when available (train.py:40-45);
    here scalars always go to `<dir>/scalars.jsonl` (greppable, no
    dependency) and to TB if tensorboardX/tensorboard is importable.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def scalars(self, step: int, **kv):
        rec = {"step": step, **{k: float(v) for k, v in kv.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.tb is not None:
            for k, v in kv.items():
                self.tb.add_scalar(k, float(v), step)

    def record_points(self, step: int, note: str, n_points: int):
        """exp_log journal parity (helper_train.py:303-309)."""
        with open(os.path.join(self.log_dir, "exp_log.txt"), "a") as f:
            f.write(f"iteration {step} {note} {n_points}\n")

    def close(self):
        self._f.close()
        if self.tb is not None:
            self.tb.close()


def save_debug_grid(path: str, images: dict[str, np.ndarray]):
    """Dump a labeled image grid (main_utils.save_debug_imgs parity):
    each entry [H, W, 3] or [H, W] in [0, 1], tiled horizontally."""
    from PIL import Image
    tiles = []
    for name, img in images.items():
        img = np.asarray(img)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        tiles.append(np.clip(img, 0, 1))
    grid = np.concatenate(tiles, axis=1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)


@contextmanager
def profiler_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context — the TPU analogue of the reference's
    CUDA-event timing (SURVEY.md §5 tracing)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def setup_seed(seed: int):
    """Deterministic seeding (reference train.py:941-947)."""
    import random
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return seed
