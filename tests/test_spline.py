"""Spline engine tests: forward vs a numpy oracle, fit round-trips."""

import numpy as np
import jax.numpy as jnp

from mobgs_tpu.core import spline


def hermite_oracle(control, t, n):
    """Direct scalar-python transliteration of the reference formulas."""
    out = np.zeros(control.shape[-1], np.float64)
    ts = t * (n - 1)
    idx = int(np.clip(np.floor(ts), 0, n - 2))
    left = max(idx - 1, 0)
    right = min(idx + 1, n - 1)
    rr = min(idx + 2, n - 1)
    p0, p1, p2, p3 = control[left], control[idx], control[right], control[rr]
    m0 = (p2 - p1) if left == idx else (p2 - p0) / 2
    m1 = (p2 - p1) if rr == right else (p3 - p1) / 2
    tf = ts - idx
    h00 = (1 + 2 * tf) * (1 - tf) ** 2
    h10 = tf * (1 - tf) ** 2
    h01 = tf * tf * (3 - 2 * tf)
    h11 = tf * tf * (tf - 1)
    out = h00 * p1 + h10 * m0 + h01 * p2 + h11 * m1
    return out


def test_eval_matches_oracle_variable_knots():
    rng = np.random.default_rng(0)
    P, K = 64, 12
    control = rng.normal(size=(P, K, 3)).astype(np.float32)
    n = rng.integers(4, K + 1, size=P)
    for t in [0.0, 0.13, 0.5, 0.77, 1.0]:
        got = np.asarray(spline.eval_spline(jnp.asarray(control), t, jnp.asarray(n)))
        want = np.stack([hermite_oracle(control[i], t, int(n[i])) for i in range(P)])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_knot_interpolation_exact():
    # A Hermite spline passes through its own control points at knot times.
    rng = np.random.default_rng(1)
    P, K = 16, 12
    control = rng.normal(size=(P, K, 3)).astype(np.float32)
    n = np.full(P, K)
    for j in range(K):
        t = j / (K - 1)
        got = np.asarray(spline.eval_spline(jnp.asarray(control), t, jnp.asarray(n)))
        np.testing.assert_allclose(got, control[:, j], rtol=1e-4, atol=1e-5)


def test_design_matrix_matches_eval():
    rng = np.random.default_rng(2)
    P, K, T = 32, 12, 24
    control = rng.normal(size=(P, K, 3)).astype(np.float32)
    n = rng.integers(4, K + 1, size=P)
    times = np.linspace(0, 1, T).astype(np.float32)
    A = spline.design_matrix(jnp.tile(times[None], (P, 1)), jnp.asarray(n)[:, None], K)
    via_matrix = np.einsum("ptk,pkc->ptc", np.asarray(A), control)
    for ti, t in enumerate(times):
        direct = np.asarray(spline.eval_spline(jnp.asarray(control), float(t), jnp.asarray(n)))
        np.testing.assert_allclose(via_matrix[:, ti], direct, rtol=1e-4, atol=1e-5)


def test_fit_round_trip():
    # Fit control points to a trajectory sampled from a known spline;
    # re-evaluating must reproduce the trajectory.
    rng = np.random.default_rng(3)
    P, K, T = 40, 12, 24
    true_control = rng.normal(size=(P, K, 3)).astype(np.float32)
    n = np.full(P, K)
    times = np.linspace(0, 1, T).astype(np.float32)
    traj = np.stack([
        np.asarray(spline.eval_spline(jnp.asarray(true_control), float(t), jnp.asarray(n)))
        for t in times], axis=1)  # [P, T, 3]
    fitted = spline.fit_spline_shared(jnp.asarray(traj), jnp.asarray(times), K, K)
    recon = np.stack([
        np.asarray(spline.eval_spline(fitted, float(t), jnp.asarray(n)))
        for t in times], axis=1)
    np.testing.assert_allclose(recon, traj, rtol=1e-3, atol=1e-3)


def test_refit_pruned_smooth_trajectory():
    # A smooth (low-order) trajectory should survive losing one knot.
    P, K = 8, 12
    times_k = np.linspace(0, 1, K).astype(np.float32)
    # quadratic trajectories: exactly representable with few knots
    coef = np.random.default_rng(4).normal(size=(P, 3, 3)).astype(np.float32)
    control = np.stack([
        coef[:, :, 0] + coef[:, :, 1] * t + coef[:, :, 2] * t * t
        for t in times_k], axis=1)  # [P, K, 3]
    n_cur = np.full(P, K)
    new_control = spline.refit_spline_pruned(jnp.asarray(control), jnp.asarray(n_cur), K)
    n_new = np.full(P, K - 1)
    for t in np.linspace(0, 1, 13):
        old = np.asarray(spline.eval_spline(jnp.asarray(control), float(t), jnp.asarray(n_cur)))
        new = np.asarray(spline.eval_spline(new_control, float(t), jnp.asarray(n_new)))
        np.testing.assert_allclose(new, old, rtol=2e-2, atol=2e-2)


def test_onedown_control_pts_matches_reference_decisions():
    """Knot-prune controller parity (gaussian_model.py:274-371): run the
    reference's OWN onedown_control_pts on a mock self and assert the
    port makes identical per-point prune decisions and knot counts."""
    import types

    import jax.numpy as jnp
    import torch
    from reference_shim import import_ref

    gm = import_ref("scene.gaussian_model")

    rng = np.random.default_rng(11)
    P, K, V = 24, 12, 6
    # mix: half smooth (near-linear -> prunable), half wiggly (kept)
    times_k = np.linspace(0, 1, K).astype(np.float32)
    smooth = (rng.normal(size=(P // 2, 1, 3)) +
              rng.normal(size=(P // 2, 1, 3)) * times_k[None, :, None])
    wiggly = rng.normal(size=(P - P // 2, K, 3)) * 40.0
    control = np.concatenate([smooth, wiggly]).astype(np.float32)
    n_cur = rng.integers(5, K + 1, size=P).astype(np.int64)
    # zero the dead columns like training state does
    for i in range(P):
        control[i, n_cur[i]:] = 0.0

    W, H, focal = 64, 48, 50.0
    w2c = np.tile(np.eye(4, dtype=np.float32)[None], (V, 1, 1))
    w2c[:, 2, 3] = 8.0  # push points in front of the camera
    vtimes = np.linspace(0, 1, V).astype(np.float32)

    views = []
    for v in range(V):
        views.append(types.SimpleNamespace(
            metadata=types.SimpleNamespace(focal_length=focal),
            image_width=W, image_height=H, time=float(vtimes[v]),
            world_view_transform=torch.from_numpy(w2c[v].T.copy())))

    mock = types.SimpleNamespace(
        control_xyz=torch.from_numpy(control.copy()),
        current_control_num=torch.from_numpy(n_cur[:, None].copy()),
        control_num=K, error_threshold=0.05)
    for name in ("onedown_control_pts", "compute_prune_error",
                 "inverse_cubic_hermite_for_prune",
                 "interpolate_cubic_hermite"):
        setattr(mock, name,
                types.MethodType(getattr(gm.GaussianModel, name), mock))
    mock.onedown_control_pts(views)  # mutates mock in place
    ref_n = mock.current_control_num.numpy()[:, 0]

    got_c, got_n, n_acc = spline.onedown_control_pts(
        jnp.asarray(control), jnp.asarray(n_cur), jnp.asarray(w2c),
        jnp.asarray(vtimes), focal, W, H, error_threshold=0.05)
    got_n = np.asarray(got_n)

    np.testing.assert_array_equal(got_n, ref_n)
    accepted = got_n < n_cur
    assert int(n_acc) >= accepted.sum()  # floor points may also accept
    assert 0 < accepted.sum() < P, "test must exercise both branches"
    # accepted splines still track the original trajectory
    for t in np.linspace(0, 1, 7):
        old = np.asarray(spline.eval_spline(jnp.asarray(control),
                                            float(t), jnp.asarray(n_cur)))
        new = np.asarray(spline.eval_spline(got_c, float(t),
                                            jnp.asarray(got_n)))
        assert np.abs((new - old)[accepted]).max() < 8.0
