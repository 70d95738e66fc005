"""HexPlane field, deformation net, pose metrics, viewer protocol tests."""

import threading

import numpy as np
import jax
import jax.numpy as jnp

from mobgs_tpu.config import ModelHiddenParams
from mobgs_tpu.eval import pose_metrics as PM
from mobgs_tpu.models import deformation as DF
from mobgs_tpu.models import hexplane as HP


def test_hexplane_feature_shapes_and_time_init():
    cfg = {"grid_dimensions": 2, "input_coordinate_dim": 4,
           "output_coordinate_dim": 8, "resolution": [16, 16, 16, 6]}
    params = HP.init_hexplane(jax.random.PRNGKey(0), 1.6, cfg, [1, 2])
    assert HP.feat_dim(params) == 16
    pts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (32, 3)),
                      jnp.float32)
    t = jnp.full((32, 1), 0.5)
    f = HP.query(params, pts, t)
    assert f.shape == (32, 16)
    assert np.isfinite(np.asarray(f)).all()
    # time planes init to 1 -> at init the product == product of spatial
    # planes only; perturbing t must not change features
    f2 = HP.query(params, pts, jnp.full((32, 1), 0.9))
    np.testing.assert_allclose(np.asarray(f), np.asarray(f2), atol=1e-6)


def test_hexplane_regularizers():
    cfg = {"grid_dimensions": 2, "input_coordinate_dim": 4,
           "output_coordinate_dim": 4, "resolution": [8, 8, 8, 6]}
    params = HP.init_hexplane(jax.random.PRNGKey(0), 1.0, cfg, [1])
    # time planes are exactly 1 at init -> both time regs are 0
    assert float(HP.time_regulation(params)) == 0.0
    assert float(HP.l1_time_regulation(params)) == 0.0
    assert float(HP.plane_regulation(params)) > 0.0


def test_deformation_identity_scale_and_gradients():
    hidden = ModelHiddenParams(net_width=32, defor_depth=1, bounds=1.6,
                               kplanes_config={"grid_dimensions": 2,
                                               "input_coordinate_dim": 4,
                                               "output_coordinate_dim": 8,
                                               "resolution": [8, 8, 8, 4]},
                               multires=[1])
    params = DF.init_deformation(jax.random.PRNGKey(0), hidden)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-1, 1, (16, 3)), jnp.float32)
    scales = jnp.zeros((16, 3))
    rots = jnp.zeros((16, 4)).at[:, 0].set(1.0)
    p, s, r = DF.apply_deformation(params, xyz, scales, rots, 0.3)
    assert p.shape == (16, 3) and s.shape == (16, 3) and r.shape == (16, 4)
    assert np.isfinite(np.asarray(p)).all()

    def loss(params):
        p, s, r = DF.apply_deformation(params, xyz, scales, rots, 0.3)
        return jnp.sum(p**2) + jnp.sum(s**2)

    g = jax.grad(loss)(params)
    gn = jax.tree.reduce(lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert np.isfinite(gn) and gn > 0

    reg = DF.regulation_loss(params, 0.001, 0.0001, 0.0002)
    assert np.isfinite(float(reg))


def test_pose_metrics_identity_and_known_offset():
    rng = np.random.default_rng(0)
    N = 10
    poses = np.tile(np.eye(4), (N, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(N, 3))
    assert PM.compute_ate(poses, poses) == 0.0
    rpe_t, rpe_r = PM.compute_rpe(poses, poses)
    assert rpe_t == 0.0 and rpe_r == 0.0

    # similarity-transformed copy must align back to ~zero ATE
    s, ang = 2.0, 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    pred = poses.copy()
    pred[:, :3, 3] = (s * (R @ poses[:, :3, 3].T)).T + np.array([1, 2, 3.0])
    pred[:, :3, :3] = np.einsum("ij,njk->nik", R, poses[:, :3, :3])
    out = PM.evaluate_poses(poses, pred, align="sim3")
    assert out["ate"] < 1e-6
    assert out["rpe_rot_deg"] < 1e-4


def test_viewer_protocol_round_trip():
    import json
    import socket
    from mobgs_tpu.viewer import ViewerServer

    srv = ViewerServer(port=0)  # ephemeral
    port = srv.listener.getsockname()[1]
    H, W = 4, 6
    rendered = {}

    def render_fn(msg):
        rendered["w2c"] = msg["_w2c"]
        return np.full((H, W, 3), 0.5, np.float32)

    def client():
        c = socket.create_connection(("127.0.0.1", port))
        msg = {"resolution_x": W, "resolution_y": H, "train": True,
               "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100,
               "shs_python": False, "rot_scale_python": False,
               "keep_alive": False, "scaling_modifier": 1.0,
               "view_matrix": list(np.eye(4).reshape(-1)),
               "view_projection_matrix": list(np.eye(4).reshape(-1))}
        payload = json.dumps(msg).encode()
        c.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        while len(img) < H * W * 3:
            img += c.recv(H * W * 3 - len(img))
        n = int.from_bytes(c.recv(4), "little")
        verify = c.recv(n)
        c.close()
        client.result = (img, verify)

    th = threading.Thread(target=client)
    th.start()
    import time
    for _ in range(100):
        srv.try_connect()
        if srv.conn is not None:
            break
        time.sleep(0.01)
    keep = srv.poll(render_fn, verify="ok")
    th.join()
    img, verify = client.result
    assert verify == b"ok"
    assert np.frombuffer(img, np.uint8).reshape(H, W, 3)[0, 0, 0] == 127
    assert keep is True
    assert rendered["w2c"].shape == (4, 4)
