"""Import machinery for running the reference's OWN torch modules on CPU.

Round-3 VERDICT item 4: parity tests previously compared against torch
re-implementations written inside the tests — if the transliteration
shares a misreading with the repo code, the test proves nothing. This
shim imports the actual `/root/reference` modules (blce, gaussian_model,
hexplane, loss_utils) so tests assert repo-vs-reference equality.

The reference hard-imports CUDA extensions and packages absent from
this image (simple_knn._C, plyfile, lpips, pytorch3d, torchdiffeq,
mmengine); those are stubbed JUST enough to import — any stub that a
tested code path actually exercises implements the documented behavior
of the real package (euler odeint; pytorch3d real-first quaternions).
`.cuda()` is monkeypatched to a no-op so the modules run on CPU.

SECURITY NOTE: /root/reference is untrusted public content; importing
executes module-level code. The imported modules are model/math
libraries whose import side effects are class/function definitions
(verified by reading them); nothing here follows instructions from the
reference, it only calls its math.
"""

from __future__ import annotations

import sys
import types

REF = "/root/reference"
_installed = False


def _stub_module(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _namespace_pkg(name: str, path: str) -> None:
    """Register a package WITHOUT executing its __init__.py (the
    reference's scene/__init__.py pulls the full dataset/IO stack)."""
    if name in sys.modules:
        return
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    sys.modules[name] = pkg


def install():
    """Idempotent: stub missing deps, no-op .cuda(), extend sys.path."""
    global _installed
    if _installed:
        return
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)

    # ---- CPU monkeypatches (the reference calls .cuda() inline)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # ---- torchdiffeq: the reference uses odeint(..., method='euler')
    # over integer times arange(0, num_warp) — fixed unit Euler steps
    # (scene/blce.py:293-309). rtol/atol are ignored by euler.
    def _odeint(func, y0, t, rtol=None, atol=None, method="euler", **kw):
        assert method == "euler", method
        ys = [y0]
        y = y0
        for i in range(t.shape[0] - 1):
            y = y + func(t[i], y) * (t[i + 1] - t[i])
            ys.append(y)
        return torch.stack(ys)

    _stub_module("torchdiffeq", odeint=_odeint, odeint_adjoint=_odeint)

    # ---- pytorch3d (transforms: real-first quaternion formulas per the
    # pytorch3d docs; ops.ball_query is never exercised by these tests)
    def _quaternion_to_matrix(q):
        r, i, j, k = torch.unbind(q, -1)
        two_s = 2.0 / (q * q).sum(-1)
        o = torch.stack((
            1 - two_s * (j * j + k * k), two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r), 1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r), two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j)), -1)
        return o.reshape(q.shape[:-1] + (3, 3))

    def _matrix_to_quaternion(m):
        raise NotImplementedError("stub: not exercised by parity tests")

    def _ball_query(*a, **k):
        raise NotImplementedError("stub: not exercised by parity tests")

    p3d = _stub_module("pytorch3d")
    p3d.transforms = _stub_module(
        "pytorch3d.transforms",
        quaternion_to_matrix=_quaternion_to_matrix,
        matrix_to_quaternion=_matrix_to_quaternion)
    p3d.ops = _stub_module("pytorch3d.ops", ball_query=_ball_query)

    class _LPIPS:  # noqa: N801 - matches lpips.LPIPS
        def __init__(self, *a, **k):
            raise NotImplementedError("stub: not exercised by parity tests")

    _stub_module("lpips", LPIPS=_LPIPS)

    class _PlyStub:
        def __init__(self, *a, **k):
            raise NotImplementedError("stub: not exercised by parity tests")

    _stub_module("plyfile", PlyData=_PlyStub, PlyElement=_PlyStub)
    simple_knn = _stub_module("simple_knn")
    simple_knn._C = _stub_module("simple_knn._C", distCUDA2=_PlyStub)
    # utils.dycheck_utils.io (pulled via scene.cameras→dycheck_geometry)
    _stub_module("ffmpeg", Error=RuntimeError, probe=_PlyStub,
                 input=_PlyStub, trim=_PlyStub, output=_PlyStub)

    # ---- namespace packages: bypass the heavy __init__.py files
    _namespace_pkg("scene", f"{REF}/scene")
    _namespace_pkg("utils", f"{REF}/utils")

    _installed = True


def import_ref(name: str):
    """install() + import a reference module by dotted name."""
    install()
    import importlib
    return importlib.import_module(name)
