"""Torch-format checkpoint artifacts: reference key-layout + round trips.

The strict `load_state_dict` checks below build torch replicas of the
reference module layouts (`scene/deformation.py:228-249`,
`scene/blce.py:322-368`) and verify our emitted `deformation.pth` /
`blce.pth` load with strict=True — i.e. exact key names and shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from mobgs_tpu.config import ModelHiddenParams
from mobgs_tpu.io import torch_ckpt as TC
from mobgs_tpu.models.blce import init_blce
from mobgs_tpu.models.deformation import init_deformation

HIDDEN = ModelHiddenParams(
    net_width=16, defor_depth=1, timenet_width=8, timenet_output=8,
    kplanes_config={"grid_dimensions": 2, "input_coordinate_dim": 4,
                    "output_coordinate_dim": 8,
                    "resolution": [8, 8, 8, 4]},
    multires=[1, 2])


def _torch_deform_replica(cfg):
    """Replica of reference deform_network's registered-tensor layout."""
    W, D = cfg.net_width, cfg.defor_depth
    fdim = cfg.kplanes_config["output_coordinate_dim"] * len(cfg.multires)
    times_ch = 2 * cfg.timebase_pe + 1

    class Grid(nn.Module):
        def __init__(self):
            super().__init__()
            self.aabb = nn.Parameter(torch.zeros(2, 3), requires_grad=False)
            self.grids = nn.ModuleList()
            import itertools
            combs = list(itertools.combinations(range(4), 2))
            for mult in cfg.multires:
                reso = [r * mult for r in cfg.kplanes_config["resolution"][:3]]
                reso = reso + cfg.kplanes_config["resolution"][3:]
                pl = nn.ParameterList()
                for comb in combs:
                    c = cfg.kplanes_config["output_coordinate_dim"]
                    pl.append(nn.Parameter(torch.zeros(
                        1, c, reso[comb[1]], reso[comb[0]])))
                self.grids.append(pl)

    class Deformation(nn.Module):
        def __init__(self):
            super().__init__()
            self.grid = Grid()
            layers = [nn.Linear(fdim, W)]
            for _ in range(D - 1):
                layers += [nn.ReLU(), nn.Linear(W, W)]
            self.feature_out = nn.Sequential(*layers)
            self.pos_deform = nn.Sequential(
                nn.ReLU(), nn.Linear(W, W), nn.ReLU(), nn.Linear(W, 7))
            self.scales_deform = nn.Sequential(
                nn.ReLU(), nn.Linear(W, W), nn.ReLU(), nn.Linear(W, 3))
            self.rotations_deform = nn.Sequential(
                nn.ReLU(), nn.Linear(W, W), nn.ReLU(), nn.Linear(W, 4))

    class DeformNetwork(nn.Module):
        def __init__(self):
            super().__init__()
            self.timenet = nn.Sequential(
                nn.Linear(times_ch, cfg.timenet_width), nn.ReLU(),
                nn.Linear(cfg.timenet_width, cfg.timenet_output))
            self.deformation_net = Deformation()
            self.register_buffer(
                "time_poc", torch.FloatTensor(
                    [2 ** i for i in range(cfg.timebase_pe)]))
            self.register_buffer(
                "pos_poc", torch.FloatTensor(
                    [2 ** i for i in range(cfg.posebase_pe)]))
            self.register_buffer(
                "rotation_scaling_poc", torch.FloatTensor(
                    [2 ** i for i in range(cfg.scale_rotation_pe)]))
            self.register_buffer(
                "opacity_poc", torch.FloatTensor(
                    [2 ** i for i in range(cfg.opacity_pe)]))

    return DeformNetwork()


def test_deformation_pth_strict_load_and_roundtrip(tmp_path):
    params = init_deformation(jax.random.PRNGKey(0), HIDDEN)
    TC.save_deformation_pth(str(tmp_path), params, HIDDEN, num_points=17)

    sd = torch.load(tmp_path / "deformation.pth", map_location="cpu",
                    weights_only=True)
    replica = _torch_deform_replica(HIDDEN)
    replica.load_state_dict(sd, strict=True)  # exact keys + shapes

    table = torch.load(tmp_path / "deformation_table.pth",
                       weights_only=True)
    accum = torch.load(tmp_path / "deformation_accum.pth",
                       weights_only=True)
    assert table.dtype == torch.bool and table.shape == (17,) and table.all()
    assert accum.shape == (17, 3) and float(accum.abs().sum()) == 0.0

    back = TC.load_deformation_pth(str(tmp_path / "deformation.pth"), HIDDEN)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def _torch_blce_replica(num_views, view_dim, num_warp):
    """Replica of reference BLCE's registered-tensor layout
    (scene/blce.py:322-368), incl. the shared ode_func module."""
    V, D, E = num_views, view_dim, num_warp
    H = D // 2

    class WVDeriv(nn.Module):
        def __init__(self):
            super().__init__()
            self.time_embedder = nn.Parameter(torch.zeros(E, 8))
            self.w_linear = nn.Linear(H + 8 + D, H)
            self.v_linear = nn.Linear(H + 8 + D, H)

    class Solver(nn.Module):
        def __init__(self, f):
            super().__init__()
            self.ode_func = f

    class BLCE(nn.Module):
        def __init__(self):
            super().__init__()
            self.view_embedder = nn.Parameter(torch.zeros(V, D))
            self.exposure_time_expo = nn.Parameter(
                torch.ones(V) * 0.4, requires_grad=False)
            self.view_encoder = nn.ModuleList()
            self.Rt_encoder = nn.ModuleList()
            self.wv_derivative = nn.ModuleList()
            self.diffeq_solver = nn.ModuleList()
            self.rot_decoder = nn.ModuleList()
            self.trans_decoder = nn.ModuleList()
            self.theta_decoder = nn.ModuleList()
            self.blur_feature_encoder = nn.ModuleList()
            for i in range(V):
                self.blur_feature_encoder.append(nn.Sequential(
                    nn.Linear(21, D), nn.ReLU(), nn.Linear(D, D),
                    nn.ReLU(), nn.Linear(D, D)))
                self.Rt_encoder.append(nn.Linear(12, D))
                self.view_encoder.append(nn.Linear(2 * D, D))
                self.wv_derivative.append(WVDeriv())
                self.diffeq_solver.append(Solver(self.wv_derivative[i]))
                self.rot_decoder.append(nn.Linear(H, 3))
                self.trans_decoder.append(nn.Linear(H, 3))
                self.theta_decoder.append(nn.Linear(H, 1))

    return BLCE()


def test_blce_pth_strict_load_and_roundtrip(tmp_path):
    V, D, E = 3, 32, 9
    state = init_blce(jax.random.PRNGKey(1), num_views=V, view_dim=D,
                      num_warp=E)
    state = state._replace(
        exposure_expo=jnp.asarray([0.3, 0.5, 0.7], jnp.float32))
    TC.save_blce_pth(str(tmp_path), state)

    sd = torch.load(tmp_path / "blce.pth", map_location="cpu",
                    weights_only=True)
    replica = _torch_blce_replica(V, D, E)
    replica.load_state_dict(sd, strict=True)  # exact keys + shapes

    back = TC.load_blce_pth(str(tmp_path / "blce.pth"))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
