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


# ---------------------------------------------------------------------------
# Analytic FLOP model for the train step (MFU / roofline reporting).
#
# XLA's cost_analysis() reports 0 FLOPs for the Pallas compositor (an
# opaque custom call), and the compositor is where the arithmetic is —
# so the step cost is modeled analytically from the kernel geometry:
#
#   projection (ops/projection.py): per Gaussian slot, the EWA chain is
#     quat->rotmat + R diag(s^2) R^T + cam transform + Jacobian/cov2d +
#     2x2 eigen-radii  ~= 300 flops.
#   compositing (ops/pallas_raster.py): per (tile-entry, pixel):
#     conic quadratic + exp + alpha  ~= 13, Hillis-Steele transmittance
#     prefix over the CH=128 chunk  ~= 7 (log2(CH) passes amortized),
#     channel accumulation on the MXU = 2*C  -> (20 + 2*C) flops over
#     P=256 pixels per intersection entry. The backward kernel replays
#     the chain twice (second transmittance chain + channel/conic
#     grads): counted as 2x forward.
#   binning sort: integer key compares, not FLOPs — excluded (it IS
#   ~25% of wall time, which the MFU number then honestly reflects).
#
# Intersections are the POST-clamp per-tile entry counts summed over
# tiles (the kernel is count-bounded, not capacity-bounded).
# ---------------------------------------------------------------------------

def analytic_step_flops(n_intersections: float, cap_total: int,
                        n_passes: int, channels: int = 13,
                        pixels_per_tile: int = 256) -> float:
    """Total train-step FLOPs (fwd+bwd) under the model above.

    Args:
      n_intersections: post-clamp (gaussian, tile) pairs for ONE
        geometry pass (measure with ops/tiles.bin_gaussians counts).
      cap_total: total Gaussian slot capacity projected per pass.
      n_passes: geometry passes per step (fwd): batch x exposures.
      channels: composited channel count (9 feat + depth + subset
        alpha columns).
    """
    proj = 300.0 * cap_total
    comp_fwd = float(n_intersections) * pixels_per_tile * (20.0 + 2.0 * channels)
    per_pass_fwd_bwd = 3.0 * (proj + comp_fwd)  # bwd ~= 2x fwd
    return n_passes * per_pass_fwd_bwd
