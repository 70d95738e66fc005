"""Torch-format checkpoint artifacts matching the reference layout.

The reference writes, per checkpoint dir (`scene/__init__.py:116-138`):
  point_cloud.ply / point_cloud_static.ply  (io/ply.py here)
  deformation.pth         deform_network.state_dict()
  deformation_table.pth   bool [N] (all True, gaussian_model.py:741)
  deformation_accum.pth   float [N, 3] zeros
  blce.pth                BLCE.state_dict()
and `eval.py:221-231` / `gaussian_model.py:736-753` load them back with
strict torch `load_state_dict`. This module emits/consumes those exact
key layouts (torch 2.x is in the image; no CUDA needed) so checkpoints
cross-load with the upstream repo in both directions.

Key-layout sources: `scene/deformation.py:228-249` (deform_network:
timenet Sequential + poc buffers + Deformation submodule),
`scene/deformation.py:50-73` (feature_out/pos/scales/rotations
Sequentials), `scene/hexplane.py:50-148` (grids ModuleList of
ParameterLists + aabb), `scene/blce.py:322-368` (BLCE per-view
ModuleLists; the DiffEqSolver shares its ode_func module with
wv_derivative, so its keys are duplicated in the state_dict).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from mobgs_tpu.models.blce import BLCEParams, BLCEState
from mobgs_tpu.models.deformation import DeformationParams, MLPParams
from mobgs_tpu.models.hexplane import HexPlaneParams


def _t(x):
    import torch
    return torch.from_numpy(np.asarray(x).copy())


def _mlp_to_seq(sd: dict, prefix: str, mlp: MLPParams, relu_first: bool):
    """Write an MLPParams as torch Sequential keys. torch Linear weight
    is [out, in] — ours is [in, out]."""
    idx = 1 if relu_first else 0
    for w, b in zip(mlp.ws, mlp.bs):
        sd[f"{prefix}.{idx}.weight"] = _t(np.asarray(w).T)
        sd[f"{prefix}.{idx}.bias"] = _t(b)
        idx += 2


def _seq_to_mlp(sd: dict, prefix: str, n_linear: int,
                relu_first: bool) -> MLPParams:
    ws, bs = [], []
    idx = 1 if relu_first else 0
    for _ in range(n_linear):
        ws.append(jnp.asarray(np.asarray(sd[f"{prefix}.{idx}.weight"]).T))
        bs.append(jnp.asarray(np.asarray(sd[f"{prefix}.{idx}.bias"])))
        idx += 2
    return MLPParams(ws=tuple(ws), bs=tuple(bs))


# ---------------------------------------------------------------------------
# deformation.pth


def deformation_state_dict(params: DeformationParams, hidden_cfg) -> dict:
    sd = {}
    _mlp_to_seq(sd, "timenet", params.timenet, relu_first=False)
    # poc frequency buffers (deformation.py:245-248)
    for name, pe in (("time_poc", hidden_cfg.timebase_pe),
                     ("pos_poc", hidden_cfg.posebase_pe),
                     ("rotation_scaling_poc", hidden_cfg.scale_rotation_pe),
                     ("opacity_poc", hidden_cfg.opacity_pe)):
        sd[name] = _t(np.asarray([2.0 ** i for i in range(pe)], np.float32))
    # hexplane grid: ModuleList of ParameterLists, [1, C, r2, r1] each
    sd["deformation_net.grid.aabb"] = _t(params.grid.aabb)
    for s, scale in enumerate(params.grid.grids):
        for p, plane in enumerate(scale):
            sd[f"deformation_net.grid.grids.{s}.{p}"] = _t(
                np.asarray(plane)[None])
    _mlp_to_seq(sd, "deformation_net.feature_out", params.feature_out,
                relu_first=False)
    _mlp_to_seq(sd, "deformation_net.pos_deform", params.pos_deform,
                relu_first=True)
    _mlp_to_seq(sd, "deformation_net.scales_deform", params.scales_deform,
                relu_first=True)
    _mlp_to_seq(sd, "deformation_net.rotations_deform",
                params.rotations_deform, relu_first=True)
    return sd


def save_deformation_pth(ckpt_dir: str, params: DeformationParams,
                         hidden_cfg, num_points: int) -> None:
    """Write deformation.pth + deformation_table/accum.pth
    (`gaussian_model.py:755-758`; table all-True, accum zeros — both are
    4DGS legacy the MoBGS path never mutates)."""
    import torch
    torch.save(deformation_state_dict(params, hidden_cfg),
               os.path.join(ckpt_dir, "deformation.pth"))
    torch.save(torch.ones(num_points, dtype=torch.bool),
               os.path.join(ckpt_dir, "deformation_table.pth"))
    torch.save(torch.zeros(num_points, 3),
               os.path.join(ckpt_dir, "deformation_accum.pth"))


def load_deformation_pth(path: str, hidden_cfg) -> DeformationParams:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    n_scales = len(hidden_cfg.multires)
    grids = tuple(
        tuple(jnp.asarray(sd[f"deformation_net.grid.grids.{s}.{p}"][0])
              for p in range(6))
        for s in range(n_scales))
    grid = HexPlaneParams(
        grids=grids, aabb=jnp.asarray(sd["deformation_net.grid.aabb"]))
    return DeformationParams(
        grid=grid,
        feature_out=_seq_to_mlp(sd, "deformation_net.feature_out",
                                hidden_cfg.defor_depth, relu_first=False),
        pos_deform=_seq_to_mlp(sd, "deformation_net.pos_deform", 2, True),
        scales_deform=_seq_to_mlp(sd, "deformation_net.scales_deform", 2,
                                  True),
        rotations_deform=_seq_to_mlp(sd, "deformation_net.rotations_deform",
                                     2, True),
        timenet=_seq_to_mlp(sd, "timenet", 2, relu_first=False),
    )


# ---------------------------------------------------------------------------
# blce.pth


def blce_state_dict(state: BLCEState) -> dict:
    p = state.params
    V = p.view_embed.shape[0]
    sd = {
        "view_embedder": _t(p.view_embed),
        "exposure_time_expo": _t(state.exposure_expo),
    }

    def lin(prefix, w, b):
        sd[f"{prefix}.weight"] = _t(np.asarray(w).T)
        sd[f"{prefix}.bias"] = _t(b)

    for i in range(V):
        lin(f"blur_feature_encoder.{i}.0", p.bf_w0[i], p.bf_b0[i])
        lin(f"blur_feature_encoder.{i}.2", p.bf_w1[i], p.bf_b1[i])
        lin(f"blur_feature_encoder.{i}.4", p.bf_w2[i], p.bf_b2[i])
        lin(f"Rt_encoder.{i}", p.rt_w[i], p.rt_b[i])
        lin(f"view_encoder.{i}", p.venc_w[i], p.venc_b[i])
        # wv_derivative.{i} and diffeq_solver.{i}.ode_func are the SAME
        # torch module (blce.py:356-357) — state_dict carries both paths
        for prefix in (f"wv_derivative.{i}", f"diffeq_solver.{i}.ode_func"):
            sd[f"{prefix}.time_embedder"] = _t(p.time_embed[i])
            lin(f"{prefix}.w_linear", p.w_lin_w[i], p.w_lin_b[i])
            lin(f"{prefix}.v_linear", p.v_lin_w[i], p.v_lin_b[i])
        lin(f"rot_decoder.{i}", p.rot_w[i], p.rot_b[i])
        lin(f"trans_decoder.{i}", p.trans_w[i], p.trans_b[i])
        lin(f"theta_decoder.{i}", p.theta_w[i], p.theta_b[i])
    return sd


def save_blce_pth(ckpt_dir: str, state: BLCEState) -> None:
    import torch
    torch.save(blce_state_dict(state), os.path.join(ckpt_dir, "blce.pth"))


def load_blce_pth(path: str) -> BLCEState:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    V = sd["view_embedder"].shape[0]

    def lin(prefix):
        return (np.stack([sd[f"{prefix.format(i=i)}.weight"].T
                          for i in range(V)]),
                np.stack([sd[f"{prefix.format(i=i)}.bias"]
                          for i in range(V)]))

    bf_w0, bf_b0 = lin("blur_feature_encoder.{i}.0")
    bf_w1, bf_b1 = lin("blur_feature_encoder.{i}.2")
    bf_w2, bf_b2 = lin("blur_feature_encoder.{i}.4")
    rt_w, rt_b = lin("Rt_encoder.{i}")
    venc_w, venc_b = lin("view_encoder.{i}")
    w_lin_w, w_lin_b = lin("wv_derivative.{i}.w_linear")
    v_lin_w, v_lin_b = lin("wv_derivative.{i}.v_linear")
    rot_w, rot_b = lin("rot_decoder.{i}")
    trans_w, trans_b = lin("trans_decoder.{i}")
    theta_w, theta_b = lin("theta_decoder.{i}")
    time_embed = np.stack([sd[f"wv_derivative.{i}.time_embedder"]
                           for i in range(V)])
    params = BLCEParams(
        view_embed=jnp.asarray(sd["view_embedder"]),
        bf_w0=jnp.asarray(bf_w0), bf_b0=jnp.asarray(bf_b0),
        bf_w1=jnp.asarray(bf_w1), bf_b1=jnp.asarray(bf_b1),
        bf_w2=jnp.asarray(bf_w2), bf_b2=jnp.asarray(bf_b2),
        rt_w=jnp.asarray(rt_w), rt_b=jnp.asarray(rt_b),
        venc_w=jnp.asarray(venc_w), venc_b=jnp.asarray(venc_b),
        time_embed=jnp.asarray(time_embed),
        w_lin_w=jnp.asarray(w_lin_w), w_lin_b=jnp.asarray(w_lin_b),
        v_lin_w=jnp.asarray(v_lin_w), v_lin_b=jnp.asarray(v_lin_b),
        rot_w=jnp.asarray(rot_w), rot_b=jnp.asarray(rot_b),
        trans_w=jnp.asarray(trans_w), trans_b=jnp.asarray(trans_b),
        theta_w=jnp.asarray(theta_w), theta_b=jnp.asarray(theta_b),
    )
    return BLCEState(params=params,
                     exposure_expo=jnp.asarray(sd["exposure_time_expo"]))
