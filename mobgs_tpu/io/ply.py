"""Checkpoint IO — reference-schema PLY + torch-compatible decoder state.

Schema parity: `gaussian_model.py:696-725` (construct_list_of_attributes)
and `save_ply` (:761-804). Attribute order:
  x y z, trbf_center, trbf_scale, nx ny nz (zeros), f_dc_0..5,
  f_rest_0..47 (features_rest [16,3] transposed to [3,16] then flat),
  f_t_0..2, motion_0..8, opacity, scale_0..2, rot_0..3, omega_0..3,
  zeta_0, control_{x,y,z}_{0..11}, current_control_num.

The RGB decoder state saves as a torch `.pt` state_dict
(mlp1.weight [6,12,1,1], mlp2.weight [3,6,1,1]) so checkpoints are
loadable by the reference's `load_ply` (`gaussian_model.py:934-1027`)
and vice versa. plyfile is not available in this image, so a minimal
binary-little-endian PLY codec is implemented inline.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from mobgs_tpu.models.gaussians import CONTROL_NUM, GaussianState
from mobgs_tpu.models.sandwich import SandwichParams


def attribute_names() -> list[str]:
    names = ["x", "y", "z", "trbf_center", "trbf_scale", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(6)]
    names += [f"f_rest_{i}" for i in range(48)]
    names += [f"f_t_{i}" for i in range(3)]
    names += [f"motion_{i}" for i in range(9)]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    names += [f"omega_{i}" for i in range(4)]
    names += ["zeta_0"]
    for i in range(CONTROL_NUM):
        names += [f"control_x_{i}", f"control_y_{i}", f"control_z_{i}"]
    names += ["current_control_num"]
    return names


def write_ply(path: str, columns: dict[str, np.ndarray]) -> None:
    """Binary-little-endian PLY with float32 vertex properties.

    Uses the native C++ codec (mobgs_tpu.io.native) when available,
    falling back to pure python."""
    names = list(columns.keys())
    n = len(columns[names[0]])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = np.stack([np.asarray(columns[nm], np.float32).reshape(n)
                     for nm in names], axis=1)
    from mobgs_tpu.io import native
    if native.ply_write(path, names, data):
        return
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {nm}" for nm in names]
    header += ["end_header", ""]
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(data.astype("<f4").tobytes())


def read_ply(path: str) -> dict[str, np.ndarray]:
    from mobgs_tpu.io import native
    res = native.ply_read(path)
    if res is not None:
        names, data = res
        return {nm: data[:, i].copy() for i, nm in enumerate(names)}
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode("ascii").splitlines()
        n = None
        names = []
        fmt = None
        for ln in lines:
            parts = ln.split()
            if parts[:2] == ["element", "vertex"]:
                n = int(parts[2])
            elif parts[0] == "property":
                assert parts[1] in ("float", "float32"), "float props only"
                names.append(parts[2])
            elif parts[0] == "format":
                fmt = parts[1]
        assert fmt == "binary_little_endian", fmt
        raw = np.frombuffer(f.read(4 * n * len(names)), "<f4")
    data = raw.reshape(n, len(names))
    return {nm: data[:, i].copy() for i, nm in enumerate(names)}


def state_to_columns(state: GaussianState) -> dict[str, np.ndarray]:
    """Live rows only, in reference attribute order."""
    live = np.asarray(state.live)
    idx = np.nonzero(live)[0]

    def g(x):
        return np.asarray(x)[idx]

    cols: dict[str, np.ndarray] = {}
    xyz = g(state.xyz)
    cols["x"], cols["y"], cols["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    cols["trbf_center"] = g(state.trbf_center)[:, 0]
    cols["trbf_scale"] = g(state.trbf_scale)[:, 0]
    for i, nm in enumerate(["nx", "ny", "nz"]):
        cols[nm] = np.zeros(len(idx), np.float32)
    fdc = g(state.features_dc)
    for i in range(6):
        cols[f"f_dc_{i}"] = fdc[:, i]
    # [16,3] -> transpose -> [3,16] -> flat 48 (reference save_ply :770)
    frest = g(state.features_rest).transpose(0, 2, 1).reshape(len(idx), 48)
    for i in range(48):
        cols[f"f_rest_{i}"] = frest[:, i]
    ft = g(state.features_t)
    for i in range(3):
        cols[f"f_t_{i}"] = ft[:, i]
    mot = g(state.motion)
    for i in range(9):
        cols[f"motion_{i}"] = mot[:, i]
    cols["opacity"] = g(state.opacity)[:, 0]
    sc = g(state.scaling)
    for i in range(3):
        cols[f"scale_{i}"] = sc[:, i]
    rot = g(state.rotation)
    for i in range(4):
        cols[f"rot_{i}"] = rot[:, i]
    om = g(state.omega)
    for i in range(4):
        cols[f"omega_{i}"] = om[:, i]
    cols["zeta_0"] = g(state.zeta)[:, 0]
    ctrl = g(state.control_xyz)  # [n, K, 3]
    for i in range(CONTROL_NUM):
        cols[f"control_x_{i}"] = ctrl[:, i, 0]
        cols[f"control_y_{i}"] = ctrl[:, i, 1]
        cols[f"control_z_{i}"] = ctrl[:, i, 2]
    cols["current_control_num"] = g(state.control_num).astype(np.float32)
    return cols


def save_gaussians(path: str, state: GaussianState,
                   sandwich: SandwichParams | None = None) -> None:
    """Write `<path>.ply` (+ torch `.pt` decoder if sandwich given)."""
    cols = state_to_columns(state)
    write_ply(path, cols)
    if sandwich is not None:
        save_sandwich_pt(path.replace(".ply", ".pt"), sandwich)


def save_sandwich_pt(path: str, sandwich: SandwichParams) -> None:
    import torch
    # our w1 is [in=12, out=6]; torch Conv2d weight is [out, in, 1, 1]
    sd = {"mlp1.weight": torch.from_numpy(
              np.asarray(sandwich.w1).T.reshape(6, 12, 1, 1).copy()),
          "mlp2.weight": torch.from_numpy(
              np.asarray(sandwich.w2).T.reshape(3, 6, 1, 1).copy())}
    torch.save(sd, path)


def load_sandwich_pt(path: str) -> SandwichParams:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    w1 = sd["mlp1.weight"].numpy().reshape(6, 12).T
    w2 = sd["mlp2.weight"].numpy().reshape(3, 6).T
    return SandwichParams(w1=jnp.asarray(w1), w2=jnp.asarray(w2))


def load_gaussians(path: str, capacity: int | None = None) -> GaussianState:
    """Read a reference-schema PLY into a GaussianState (padded)."""
    cols = read_ply(path)
    n = len(cols["x"])
    cap = capacity or n

    xyz = np.stack([cols["x"], cols["y"], cols["z"]], -1)
    frest = np.stack([cols[f"f_rest_{i}"] for i in range(48)], -1)
    frest = frest.reshape(n, 3, 16).transpose(0, 2, 1)
    ctrl = np.zeros((n, CONTROL_NUM, 3), np.float32)
    for i in range(CONTROL_NUM):
        ctrl[:, i, 0] = cols[f"control_x_{i}"]
        ctrl[:, i, 1] = cols[f"control_y_{i}"]
        ctrl[:, i, 2] = cols[f"control_z_{i}"]

    def pad(x, fill=0.0):
        x = np.asarray(x, np.float32)
        if cap > n:
            x = np.concatenate(
                [x, np.full((cap - n,) + x.shape[1:], fill, np.float32)])
        return jnp.asarray(x)

    zeta_key = "zeta_0" if "zeta_0" in cols else "zeta"
    state = GaussianState(
        xyz=pad(xyz),
        control_xyz=pad(ctrl),
        control_num=pad(cols["current_control_num"], 4).astype(jnp.int32),
        features_dc=pad(np.stack([cols[f"f_dc_{i}"] for i in range(6)], -1)),
        features_rest=pad(frest),
        features_t=pad(np.stack([cols[f"f_t_{i}"] for i in range(3)], -1)),
        scaling=pad(np.stack([cols[f"scale_{i}"] for i in range(3)], -1)),
        rotation=pad(np.stack([cols[f"rot_{i}"] for i in range(4)], -1)),
        opacity=pad(cols["opacity"][:, None], -10.0),
        omega=pad(np.stack([cols[f"omega_{i}"] for i in range(4)], -1)),
        motion=pad(np.stack([cols[f"motion_{i}"] for i in range(9)], -1)),
        zeta=pad(cols[zeta_key][:, None]),
        trbf_center=pad(cols["trbf_center"][:, None]),
        trbf_scale=pad(cols["trbf_scale"][:, None]),
        live=jnp.asarray(np.arange(cap) < n),
    )
    return state
