"""DenseGrid + pose_network parity tests (scene/grid.py, deformation.py:306-478)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mobgs_tpu.models import grid as DG
from mobgs_tpu.models.posenet import (euler2mat, init_posenet, poc_fre,
                                      posenet_forward)


def test_dense_grid_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    C, X, Y, Z = 4, 5, 6, 7
    g = rng.normal(size=(C, X, Y, Z)).astype(np.float32)
    xyz_min = np.asarray([-1.0, -2.0, 0.0], np.float32)
    xyz_max = np.asarray([1.0, 2.0, 3.0], np.float32)
    pts = (rng.uniform(size=(50, 3)).astype(np.float32)
           * (xyz_max - xyz_min) + xyz_min)

    params = DG.DenseGridParams(grid=jnp.asarray(g),
                                xyz_min=jnp.asarray(xyz_min),
                                xyz_max=jnp.asarray(xyz_max))
    ours = np.asarray(DG.query(params, jnp.asarray(pts)))

    # reference forward (grid.py:26-37): flip + grid_sample align_corners
    t_g = torch.from_numpy(g)[None]                       # [1, C, X, Y, Z]
    ind = (torch.from_numpy(pts) - torch.from_numpy(xyz_min)) / (
        torch.from_numpy(xyz_max) - torch.from_numpy(xyz_min))
    ind = ind.flip(-1).reshape(1, 1, 1, -1, 3) * 2 - 1
    ref = F.grid_sample(t_g, ind, mode="bilinear", align_corners=True)
    ref = ref.reshape(C, -1).T.numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_dense_grid_scale_and_isub():
    params = DG.init_dense_grid(2, (4, 4, 4), fill=1.0,
                                xyz_min=[0, 0, 0], xyz_max=[1, 1, 1])
    up = DG.scale_volume_grid(params, (8, 8, 8))
    assert up.grid.shape == (2, 8, 8, 8)
    # constant grid stays constant under trilinear resize
    np.testing.assert_allclose(np.asarray(up.grid), 1.0, atol=1e-6)
    down = DG.isub(up, 0.25)
    np.testing.assert_allclose(np.asarray(down.grid), 0.75, atol=1e-6)
    # query of a constant grid returns the constant everywhere
    q = DG.query(down, jnp.asarray([[0.3, 0.7, 0.1]]))
    np.testing.assert_allclose(np.asarray(q), 0.75, atol=1e-6)


def test_euler2mat_matches_torch_reference():
    angles = np.asarray([[0.1, -0.2, 0.3], [0.0, 0.0, 0.0],
                         [1.0, 0.5, -0.7]], np.float32)
    R = np.asarray(euler2mat(jnp.asarray(angles)))
    # transliteration of deformation.py:441-478
    for i, (x, y, z) in enumerate(angles):
        cz, sz, cy, sy, cx, sx = (np.cos(z), np.sin(z), np.cos(y),
                                  np.sin(y), np.cos(x), np.sin(x))
        zm = np.asarray([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        ym = np.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        xm = np.asarray([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        np.testing.assert_allclose(R[i], xm @ ym @ zm, atol=1e-6)
        # orthonormality
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-6)


def test_posenet_forward_shapes_and_near_identity_init():
    p = init_posenet(jax.random.PRNGKey(0), num_views=5, height=8,
                     width=10, max_time=4.0)
    times = jnp.asarray([0.0, 0.5, 1.0])
    R, t = posenet_forward(p, times)
    assert R.shape == (3, 3, 3) and t.shape == (3, 3)
    # timenet_out init 1e-6 (deformation.py:340) → near-identity poses
    np.testing.assert_allclose(np.asarray(R),
                               np.tile(np.eye(3), (3, 1, 1)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-3)

    depth = jnp.ones((3, 8 * 10))
    R2, t2, cvd = posenet_forward(p, times, depth=depth)
    assert cvd.shape == (3, 1, 8, 10)
    # instance scales init to 1 → CVD == depth
    np.testing.assert_allclose(np.asarray(cvd), 1.0, atol=1e-6)


def test_poc_fre_layout():
    x = jnp.asarray([[0.5]])
    poc = 2.0 ** jnp.arange(3)
    emb = np.asarray(poc_fre(x, poc))
    assert emb.shape == (1, 1 + 3 + 3)
    np.testing.assert_allclose(emb[0, 0], 0.5)
    np.testing.assert_allclose(emb[0, 1:4], np.sin([0.5, 1.0, 2.0]),
                               rtol=1e-6)
    np.testing.assert_allclose(emb[0, 4:7], np.cos([0.5, 1.0, 2.0]),
                               rtol=1e-6)
