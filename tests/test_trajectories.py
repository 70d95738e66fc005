"""Novel-view trajectory generator tests."""

import numpy as np

from mobgs_tpu.eval import trajectories as T


def ref_cam():
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 5.0  # camera 5 units back from origin
    return w2c


def _valid_rigid(w2cs):
    R = w2cs[:, :3, :3]
    eye = np.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(w2cs), 1, 1)),
                               atol=1e-4)


def test_orbit_path_rigid_and_looks_at_target():
    w2cs = T.orbit_path(ref_cam(), lookat=np.zeros(3), num_frames=24)
    assert w2cs.shape == (24, 4, 4)
    _valid_rigid(w2cs)
    # every camera's +z axis points at the origin
    for w in w2cs:
        c2w = np.linalg.inv(w)
        fwd = c2w[:3, 2]
        to_target = -c2w[:3, 3]
        cos = np.dot(fwd, to_target) / np.linalg.norm(to_target)
        assert cos > 0.999


def test_lemniscate_path_rigid():
    w2cs = T.lemniscate_path(ref_cam(), lookat=np.zeros(3), num_frames=16)
    assert w2cs.shape == (16, 4, 4)
    _valid_rigid(w2cs)


def test_smooth_path_interpolates_endpoints():
    a = ref_cam()
    b = ref_cam(); b[0, 3] = 1.0
    path = T.smooth_camera_path(np.stack([a, b]), n_per_segment=10)
    assert path.shape == (10, 4, 4)
    _valid_rigid(path)
    np.testing.assert_allclose(path[0], a, atol=1e-5)
    # translation moves monotonically toward b
    assert np.all(np.diff(path[:, 0, 3]) >= -1e-6)
