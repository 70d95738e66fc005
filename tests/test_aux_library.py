"""Library-parity tests: FineSampler, add_points, camera frustum viz."""

import os

import numpy as np

from mobgs_tpu.data.scene import add_points
from mobgs_tpu.eval import cam_viz
from mobgs_tpu.train.loop import FineSampler


def test_fine_sampler_structure():
    V, F = 4, 6  # poses x frames -> dataset of 24
    s = FineSampler(V, F, seed=0)
    ids = list(s)
    assert len(s) == len(ids)
    # every id addresses a valid dataset element
    assert all(0 <= i < V * F for i in ids)
    # per-timestamp blocks: each block's fresh (non-replay) ids must all
    # be ≡ i (mod frame_length) — the permutation covers the poses of
    # ONE timestamp (loader_utils.py:28)
    # the final block for each i contains V fresh ids with id % F == i
    for i in range(F):
        assert sum(1 for x in ids if x % F == i) >= V
    # deterministic per seed
    assert ids == list(FineSampler(V, F, seed=0))
    assert ids != list(FineSampler(V, F, seed=3))


def test_add_points_pads_bbox():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    cols = rng.random((10, 3)).astype(np.float32)
    nrm = rng.random((10, 3)).astype(np.float32)
    lo, hi = np.array([-1, -2, -3]), np.array([1, 2, 3])
    p2, c2, n2 = add_points(pts, cols, nrm, lo, hi, n_add=500,
                            rng=np.random.default_rng(1))
    assert p2.shape == (510, 3) and c2.shape == (510, 3) and n2.shape == (510, 3)
    np.testing.assert_array_equal(p2[:10], pts)
    extra = p2[10:]
    assert (extra >= lo - 1e-6).all() and (extra <= hi + 1e-6).all()


def test_camera_frustum_geometry(tmp_path):
    # identity camera, opengl coords: apex at origin, corners at z=-L
    pts, lines, colors = cam_viz.camera_frustum(
        480, 640, fx=600.0, fy=600.0, w2c=np.eye(4), frustum_length=0.5)
    np.testing.assert_allclose(pts[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(pts[1:, 2], -0.5, atol=1e-12)
    half_w = 0.5 * np.tan(np.arctan(640 / 2 / 600.0))
    np.testing.assert_allclose(np.abs(pts[1:, 0]), half_w, rtol=1e-6)
    assert lines.shape == (8, 2) and colors.shape == (8, 3)

    # translated camera moves the apex to the camera centre
    c2w = np.eye(4)
    c2w[:3, 3] = [1.0, 2.0, 3.0]
    P, L, C = cam_viz.frustums_lineset(c2w[None], 480, 640)
    np.testing.assert_allclose(P[0], [1, 2, 3], atol=1e-9)
    assert L.shape == (8, 2)

    # N cameras: line indices offset per frustum; PLY written + parseable
    c2ws = np.stack([np.eye(4), c2w])
    P, L, C = cam_viz.frustums_lineset(c2ws, 480, 640, coord="opencv")
    assert P.shape == (10, 3) and L.shape == (16, 2)
    assert L[8:].min() >= 5
    out = os.path.join(tmp_path, "traj.ply")
    cam_viz.save_lineset_ply(out, P, L, C)
    txt = open(out).read().splitlines()
    assert txt[0] == "ply" and "element edge 16" in txt
    assert len(txt) == txt.index("end_header") + 1 + 10 + 16
