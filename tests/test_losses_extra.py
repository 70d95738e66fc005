"""Parity tests for the auxiliary (reference-dead) loss library against
torch transliterations of `utils/loss_utils.py` / `utils/depth_loss_utils.py`."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mobgs_tpu.train import losses_extra as LX


def rng_arrays(*shapes, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.normal(size=s).astype(np.float32) for s in shapes]


def test_trimmed_losses_match_torch():
    p, g = rng_arrays((50, 3), (50, 3))
    tp, tg = torch.from_numpy(p), torch.from_numpy(g)

    loss = F.mse_loss(tp, tg, reduction="none").mean(dim=-1)
    q = torch.quantile(loss, 0.9)
    want = loss[loss < q].mean().item()
    got = float(LX.trimmed_mse_loss(jnp.asarray(p), jnp.asarray(g), 0.9))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    loss = F.l1_loss(tp, tg, reduction="none").mean(dim=-1)
    q = torch.quantile(loss, 0.8)
    want = loss[loss < q].mean().item()
    got = float(LX.trimmed_l1_loss(jnp.asarray(p), jnp.asarray(g), 0.8))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_quantile_losses_match_torch():
    p, g = rng_arrays((40, 3), (40, 3), seed=1)
    mask = (np.random.default_rng(2).uniform(size=(40, 1)) > 0.4).astype(np.float32)
    tp, tg, tm = map(torch.from_numpy, (p, g, mask))

    for quantile in (1.0, 0.7):
        sum_loss = F.l1_loss(tp, tg, reduction="none").mean(dim=-1, keepdim=True)
        qmask = ((sum_loss < torch.quantile(sum_loss, quantile)).squeeze(-1)
                 if quantile < 1 else
                 torch.ones_like(sum_loss, dtype=torch.bool).squeeze(-1))
        want = (torch.sum((sum_loss * tm)[qmask])
                / (1 * torch.sum(tm[qmask]) + 1e-8)).item()
        got = float(LX.masked_l1_loss(jnp.asarray(p), jnp.asarray(g),
                                      jnp.asarray(mask), quantile=quantile))
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=f"q={quantile}")

    # huber
    want = F.huber_loss(tp, tg, delta=0.5).item()
    got = float(LX.masked_huber_loss(jnp.asarray(p), jnp.asarray(g), 0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gradient_loss_matches_torch():
    rng = np.random.default_rng(3)
    p = rng.normal(size=(2, 12, 16)).astype(np.float32)
    g = rng.normal(size=(2, 12, 16)).astype(np.float32)
    mask = (rng.uniform(size=(2, 12, 16)) > 0.3).astype(np.float32)
    tp, tg, tm = map(torch.from_numpy, (p, g, mask))

    def torch_grad_loss(pred, gt, m, quantile=0.98):
        mask_x = m[:, :, 1:] * m[:, :, :-1]
        mask_y = m[:, 1:, :] * m[:, :-1, :]
        def term(pd, gd, mm):
            sel_p = pd[mm.bool()][..., None]
            sel_g = gd[mm.bool()][..., None]
            loss = F.l1_loss(sel_p, sel_g, reduction="none").mean(dim=-1)
            q = torch.quantile(loss, quantile)
            return loss[loss < q].mean()
        return (term(pred[:, :, 1:] - pred[:, :, :-1],
                     gt[:, :, 1:] - gt[:, :, :-1], mask_x)
                + term(pred[:, 1:, :] - pred[:, :-1, :],
                       gt[:, 1:, :] - gt[:, :-1, :], mask_y)).item()

    want = torch_grad_loss(tp, tg, tm)
    got = float(LX.compute_gradient_loss(jnp.asarray(p), jnp.asarray(g),
                                         jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_quaternion_helpers_and_path_losses():
    rng = np.random.default_rng(4)
    q1 = rng.normal(size=(5, 4)).astype(np.float32)
    q2 = rng.normal(size=(5, 4)).astype(np.float32)
    tq1 = F.normalize(torch.from_numpy(q1), dim=-1)
    tq2 = F.normalize(torch.from_numpy(q2), dim=-1)
    dot = torch.clamp(torch.sum(tq1 * tq2, dim=-1).abs(), -1, 1)
    want = (2 * torch.acos(dot)).numpy()
    got = np.asarray(LX.quaternion_distance(jnp.asarray(q1), jnp.asarray(q2)))
    np.testing.assert_allclose(got, want, atol=1e-4)

    # slerp endpoints + midpoint sanity
    a = jnp.asarray(q1[0]) / np.linalg.norm(q1[0])
    b = jnp.asarray(q1[1]) / np.linalg.norm(q1[1])
    s0 = LX.quaternion_slerp(a, b, jnp.asarray(0.0))
    s1 = LX.quaternion_slerp(a, b, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(a), atol=1e-5)
    bt = np.asarray(b) if float(jnp.sum(a * b)) >= 0 else -np.asarray(b)
    np.testing.assert_allclose(np.asarray(s1), bt, atol=1e-5)

    # path losses vs a numpy transliteration of the reference (NOTE the
    # reference SUMS the min distance to each arc per warped camera —
    # loss_utils.py:676,689 — a point on arc 1 still pays its distance
    # to arc 2)
    axis = np.asarray([1.0, -1.0, 0.0])
    axis /= np.linalg.norm(axis)

    def rot_about(a, t):
        K = np.asarray([[0, -a[2], a[1]], [a[2], 0, -a[0]],
                        [-a[1], a[0], 0]], np.float64)
        return (np.eye(3) + np.sin(t) * K
                + (1 - np.cos(t)) * (K @ K)).astype(np.float32)

    def np_rot_path_loss(ref_Rs, warped_Rs, S=50):
        base = np.ones(3) / np.sqrt(3)
        v1, v2, v3 = (R @ base for R in ref_Rs)
        warped = warped_Rs @ base
        loss = 0.0
        for a, b in ((v1, v2), (v2, v3)):
            if np.allclose(a, b, atol=1e-6):
                continue
            th = np.arccos(np.clip(np.dot(a, b), -1, 1))
            t = np.linspace(0, 1, S)[:, None]
            arc = (np.sin((1 - t) * th) / np.sin(th) * a
                   + np.sin(t * th) / np.sin(th) * b)
            for w in warped:
                loss += np.min(np.linalg.norm(w[None] - arc, axis=-1))
        return loss / len(warped_Rs)

    ref = np.stack([rot_about(axis, t) for t in (0.0, 0.4, 0.8)])
    warped = np.stack([rot_about(axis, t)
                       for t in np.linspace(0.05, 0.75, 7)])
    got = float(LX.path_distance_loss_rotation(jnp.asarray(ref),
                                               jnp.asarray(warped)))
    np.testing.assert_allclose(got, np_rot_path_loss(ref, warped), rtol=1e-4)
    # degenerate endpoints drop an arc
    ref_deg = np.stack([ref[0], ref[0], ref[2]])
    got_deg = float(LX.path_distance_loss_rotation(jnp.asarray(ref_deg),
                                                   jnp.asarray(warped)))
    np.testing.assert_allclose(got_deg, np_rot_path_loss(ref_deg, warped),
                               rtol=1e-4)

    def np_transl_path_loss(ref_Ts, warped_Ts, S=50):
        loss = 0.0
        for a, b in ((ref_Ts[0], ref_Ts[1]), (ref_Ts[1], ref_Ts[2])):
            if np.allclose(a, b, atol=1e-6):
                continue
            t = np.linspace(0, 1, S)[:, None]
            seg = (1 - t) * a + t * b
            for w in warped_Ts:
                loss += np.min(np.linalg.norm(w[None] - seg, axis=-1))
        return loss / len(warped_Ts)

    T = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32)
    W = np.asarray([[0.5, 0, 0], [1, 0.5, 0], [0.5, 2.0, 0]], np.float32)
    got = float(LX.path_distance_loss_translation(jnp.asarray(T),
                                                  jnp.asarray(W)))
    np.testing.assert_allclose(got, np_transl_path_loss(T, W), rtol=1e-4)

    # separate (quaternion) variant: zero on degenerate double path
    refq = np.tile(np.asarray([1, 0, 0, 0], np.float32), (3, 1))
    wq = rng.normal(size=(4, 4)).astype(np.float32)
    assert float(LX.path_distance_loss_separate(
        jnp.asarray(refq), jnp.asarray(wq))) == 0.0


def test_som_losses_match_torch():
    rng = np.random.default_rng(5)
    transls = rng.normal(size=(6, 10, 3)).astype(np.float32)
    t = torch.from_numpy(transls)
    accel = 2 * t[:, 1:-1] - t[:, :-2] - t[:, 2:]
    want = accel.norm(dim=-1).mean().item()
    got = float(LX.compute_accel_loss(jnp.asarray(transls)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    means = rng.normal(size=(7, 3, 2, 3)).astype(np.float32)
    w2cs = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    w2cs[:, :3, 3] = rng.normal(size=(2, 3))
    tm, tw = torch.from_numpy(means), torch.from_numpy(w2cs)
    cc = torch.linalg.inv(tw)[:, :3, 3]
    ray = F.normalize(tm[:, 1] - cc, p=2.0, dim=-1)
    want = ((((tm[:, 1] - tm[:, 0]) * ray).sum(-1) ** 2).mean()
            + (((tm[:, 2] - tm[:, 1]) * ray).sum(-1) ** 2).mean()).item()
    got = float(LX.compute_z_acc_loss(jnp.asarray(means), jnp.asarray(w2cs)))
    np.testing.assert_allclose(got, want, rtol=1e-4)

    clusters = rng.normal(size=(8, 12, 3)).astype(np.float32)
    tc = torch.from_numpy(clusters)
    med = tc.median(dim=-2, keepdim=True)[0]
    d = torch.norm(tc - med, dim=-1)
    d = d / d.median(dim=-1, keepdim=True)[0]
    w = torch.exp(-d)
    w = w / (w.mean(dim=-1, keepdim=True) + 1e-6)
    invalid = d > np.quantile(d.numpy(), 0.9)
    w[invalid | torch.isnan(w)] = 0
    got = np.asarray(LX.get_weights_for_procrustes(jnp.asarray(clusters)))
    np.testing.assert_allclose(got, w.numpy(), atol=1e-5)


def test_ball_query_and_knn_constraint():
    rng = np.random.default_rng(6)
    pts = rng.uniform(size=(1, 30, 3)).astype(np.float32)
    d, idx = LX.ball_query(jnp.asarray(pts), jnp.asarray(pts), k=5, radius=0.3)
    d, idx = np.asarray(d), np.asarray(idx)
    # brute-force oracle: first-5 in-index-order within radius
    d2 = ((pts[0][:, None] - pts[0][None]) ** 2).sum(-1)
    for i in range(30):
        hits = [j for j in range(30) if d2[i, j] <= 0.3 ** 2][:5]
        want = hits + [-1] * (5 - len(hits))
        np.testing.assert_array_equal(idx[0, i], want, err_msg=f"row {i}")
        for s, j in enumerate(hits):
            np.testing.assert_allclose(d[0, i, s], d2[i, j], atol=1e-5)

    # rigid motion of the whole cloud keeps pairwise distances → 0 loss
    th = 0.3
    R = np.asarray([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    moved = (pts[0] @ R.T + np.asarray([0.1, 0.2, 0.3], np.float32))[None]
    loss_rigid = float(LX.knn_constraint_loss(
        jnp.asarray(moved), jnp.asarray(pts[0]), radius=0.3))
    squashed = pts * np.asarray([1.0, 1.0, 0.2], np.float32)
    loss_squash = float(LX.knn_constraint_loss(
        jnp.asarray(squashed), jnp.asarray(pts[0]), radius=0.3))
    assert loss_rigid < 1e-9
    assert loss_squash > loss_rigid


def test_depth_losses_match_torch():
    rng = np.random.default_rng(7)
    depth = rng.uniform(1, 3, size=(2, 1, 10, 12)).astype(np.float32)
    img = rng.uniform(size=(2, 3, 10, 12)).astype(np.float32)
    td, ti = torch.from_numpy(depth), torch.from_numpy(img)

    igx = ti[:, :, :, :-1] - ti[:, :, :, 1:]
    igy = ti[:, :, :-1, :] - ti[:, :, 1:, :]
    wx = torch.exp(-igx.abs().mean(1).unsqueeze(1))
    wy = torch.exp(-igy.abs().mean(1).unsqueeze(1))
    want = (((td[:, :, :, :-1] - td[:, :, :, 1:]).abs() * wx).sum()
            + ((td[:, :, :-1, :] - td[:, :, 1:, :]).abs() * wy).sum()) \
        / (wx.sum() + wy.sum())
    got = float(LX.loss_depth_smoothness(jnp.asarray(depth), jnp.asarray(img)))
    np.testing.assert_allclose(got, want.item(), rtol=1e-5)

    # patch losses vs full torch pipeline
    def t_normalize(x, mean=None, std=None):
        m = torch.mean(x, dim=1, keepdim=True) if mean is None else mean
        s = torch.std(x, dim=1, keepdim=True) if std is None else std
        return (x - m) / (s + 1e-2 * torch.std(x.reshape(-1)))

    def t_patchify(x, p):
        return F.unfold(x, kernel_size=p, stride=p).permute(0, 2, 1) \
            .reshape(-1, p * p)

    a = depth
    b = rng.uniform(1, 3, size=(2, 1, 10, 12)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    pa = t_normalize(t_patchify(ta, 2))
    pb = t_normalize(t_patchify(tb, 2))
    m = (pa - pb).abs() > 0.1
    want = ((pa - pb)[m].abs()).mean().item()
    got = float(LX.patch_norm_l1_loss(jnp.asarray(a), jnp.asarray(b),
                                      patch_size=2, margin=0.1))
    np.testing.assert_allclose(got, want, rtol=2e-4)

    # torch.std defaults to Bessel correction; jnp.std does not — verify
    # our _norm_patches uses the torch convention
    kl_in = rng.normal(size=(4, 9)).astype(np.float32)
    kl_tg = rng.normal(size=(4, 9)).astype(np.float32)
    want = F.kl_div(F.log_softmax(torch.from_numpy(kl_in), dim=-1),
                    F.softmax(torch.from_numpy(kl_tg), dim=-1),
                    reduction="batchmean").item()
    got = float(LX.kl_loss(jnp.asarray(kl_in), jnp.asarray(kl_tg)))
    np.testing.assert_allclose(got, want, rtol=1e-4)
