"""COLMAP binary/text model parsing.

Parity target: reference `scene/colmap_loader.py` (cameras.bin /
images.bin / points3D.bin readers used by the Colmap branch of
`sceneLoadTypeCallbacks`). Standard COLMAP file formats, written from
the format spec.
"""

from __future__ import annotations

import os
import struct
from typing import NamedTuple

import numpy as np

CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4), 3: ("RADIAL", 5),
    4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12), 7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4), 9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


class ColmapCamera(NamedTuple):
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


class ColmapImage(NamedTuple):
    id: int
    qvec: np.ndarray   # wxyz, world→camera rotation
    tvec: np.ndarray   # world→camera translation
    camera_id: int
    name: str


def _read(f, fmt):
    return struct.unpack(fmt, f.read(struct.calcsize(fmt)))


def read_cameras_binary(path: str) -> dict[int, ColmapCamera]:
    out = {}
    with open(path, "rb") as f:
        n = _read(f, "<Q")[0]
        for _ in range(n):
            cid, model_id, w, h = _read(f, "<iiQQ")
            name, nparams = CAMERA_MODELS[model_id]
            params = np.asarray(_read(f, "<" + "d" * nparams))
            out[cid] = ColmapCamera(cid, name, int(w), int(h), params)
    return out


def read_images_binary(path: str) -> dict[int, ColmapImage]:
    out = {}
    with open(path, "rb") as f:
        n = _read(f, "<Q")[0]
        for _ in range(n):
            iid = _read(f, "<i")[0]
            q = np.asarray(_read(f, "<dddd"))
            t = np.asarray(_read(f, "<ddd"))
            cam_id = _read(f, "<i")[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            npts = _read(f, "<Q")[0]
            f.read(24 * npts)  # skip 2D points
            out[iid] = ColmapImage(iid, q, t, cam_id, name.decode())
    return out


def read_points3d_binary(path: str):
    """Returns (xyz [N,3], rgb [N,3] float in [0,1], err [N])."""
    with open(path, "rb") as f:
        n = _read(f, "<Q")[0]
        xyz = np.empty((n, 3))
        rgb = np.empty((n, 3))
        err = np.empty(n)
        for i in range(n):
            _read(f, "<Q")  # id
            xyz[i] = _read(f, "<ddd")
            rgb[i] = _read(f, "<BBB")
            err[i] = _read(f, "<d")[0]
            track_len = _read(f, "<Q")[0]
            f.read(8 * track_len)
    return xyz.astype(np.float32), (rgb / 255.0).astype(np.float32), err


def read_points3d_text(path: str):
    xyz, rgb = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            el = line.split()
            xyz.append([float(x) for x in el[1:4]])
            rgb.append([float(x) / 255.0 for x in el[4:7]])
    return (np.asarray(xyz, np.float32), np.asarray(rgb, np.float32),
            np.zeros(len(xyz)))


def qvec_to_rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def load_colmap_model(sparse_dir: str):
    """Load a COLMAP sparse model dir; returns (cameras, images, points)."""
    cams = read_cameras_binary(os.path.join(sparse_dir, "cameras.bin"))
    imgs = read_images_binary(os.path.join(sparse_dir, "images.bin"))
    p3d = os.path.join(sparse_dir, "points3D.bin")
    if os.path.exists(p3d):
        pts = read_points3d_binary(p3d)
    else:
        pts = read_points3d_text(os.path.join(sparse_dir, "points3D.txt"))
    return cams, imgs, pts
