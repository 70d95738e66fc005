"""ctypes bindings for the native IO library (native/mobgs_io.cpp).

Compiled on first use with g++ (cached next to the source); all users
fall back to the pure-python codec in `mobgs_tpu.io.ply` if the
toolchain is unavailable, so the native path is an accelerator, never a
hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _source_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def load_library():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src_dir = _source_dir()
    src = os.path.join(src_dir, "mobgs_io.cpp")
    so = os.path.join(src_dir, "libmobgs_io.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.ply_write_f32.restype = ctypes.c_int
        lib.ply_write_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.ply_probe.restype = ctypes.c_int
        lib.ply_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_int64]
        lib.ply_read_f32.restype = ctypes.c_int
        lib.ply_read_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def ply_write(path: str, names: list[str], data: np.ndarray) -> bool:
    """Native PLY write; returns False if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, np.float32)
    n, c = data.shape
    assert c == len(names)
    rc = lib.ply_write_f32(
        path.encode(), "\n".join(names).encode(), n, c,
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return rc == 0


def ply_read(path: str):
    """Native PLY read → (names, data [n, c]) or None if unavailable."""
    lib = load_library()
    if lib is None:
        return None
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    hdr = ctypes.c_int64()
    buf = ctypes.create_string_buffer(65536)
    rc = lib.ply_probe(path.encode(), ctypes.byref(rows), ctypes.byref(cols),
                       ctypes.byref(hdr), buf, len(buf))
    if rc != 0:
        return None
    names = buf.value.decode().strip().split("\n")
    out = np.empty((rows.value, cols.value), np.float32)
    rc = lib.ply_read_f32(path.encode(), hdr.value, rows.value, cols.value,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    return names, out
