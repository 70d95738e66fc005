"""BLCE numerical parity vs a torch transliteration of the reference.

Builds the reference BLCE forward path (scene/blce.py:374-424:
blur-feature PE -> per-view encoders -> Euler odeint of WV_Derivative ->
(w, theta, v) decode -> Rodrigues + G-formula SE(3) -> right-multiplied
pose deltas) in torch with weights copied from our stacked pytree, and
checks the latent poses match.
"""

import math

import numpy as np
import jax.numpy as jnp
import jax


def torch_blce_forward(p, Rt, blur_feature, num_warp=9, num_freqs=10):
    """Reference-equation forward in torch for ONE view's params `p`
    (dict of numpy arrays, our layout: linear weights [in, out])."""
    import torch

    def lin(x, w, b):
        return x @ torch.from_numpy(w) + torch.from_numpy(b)

    bf = torch.tensor(float(blur_feature))
    freqs = 2.0 ** torch.arange(num_freqs)
    ang = bf * freqs * math.pi
    embed = torch.cat([bf[None], torch.sin(ang), torch.cos(ang)])
    h = torch.relu(lin(embed, p["bf_w0"], p["bf_b0"]))
    h = torch.relu(lin(h, p["bf_w1"], p["bf_b1"]))
    bf_feat = lin(h, p["bf_w2"], p["bf_b2"])

    Rt_t = torch.from_numpy(Rt)
    rt_enc = lin(Rt_t[:3, :].reshape(-1), p["rt_w"], p["rt_b"])
    ve = torch.cat([torch.from_numpy(p["view_embed"]), rt_enc])
    x = lin(ve, p["venc_w"], p["venc_b"])

    D = x.shape[0]
    H = D // 2

    def deriv(t, x):
        x = torch.relu(x)
        w, v = x[:H], x[H:]
        te = torch.from_numpy(p["time_embed"][int(t)])
        w_in = torch.cat([w, te, bf_feat])
        v_in = torch.cat([v, te, bf_feat])
        return torch.cat([lin(w_in, p["w_lin_w"], p["w_lin_b"]),
                          lin(v_in, p["v_lin_w"], p["v_lin_b"])])

    states = [x]
    for t in range(num_warp - 1):
        x = x + deriv(t, x)  # euler, dt = 1
        states.append(x)
    latent = torch.stack(states)                 # [E, D]

    lw, lv = latent[:, :H], latent[:, H:]
    w_rigid = lin(lw, p["rot_w"], p["rot_b"])    # [E, 3]
    theta = lin(lw, p["theta_w"], p["theta_b"])[..., None]  # [E,1,1]
    v_rigid = lin(lv, p["trans_w"], p["trans_b"])

    # exp_map + skew + rodrigues + G (reference blce.py:432-478)
    norm = torch.norm(w_rigid, dim=-1, keepdim=True) + 1e-10
    wn = w_rigid / norm
    w1, w2, w3 = wn[:, 0], wn[:, 1], wn[:, 2]
    zero = torch.zeros_like(w1)
    W = torch.stack([torch.stack([zero, -w3, w2], -1),
                     torch.stack([w3, zero, -w1], -1),
                     torch.stack([-w2, w1, zero], -1)], -2)
    eye = torch.eye(3)
    R_exp = eye + torch.sin(theta) * W + (1 - torch.cos(theta)) * (W @ W)
    G = eye[None] * theta + (1 - torch.cos(theta)) * W \
        + (theta - torch.sin(theta)) * (W @ W)
    pvec = G @ v_rigid[..., None]
    delta = torch.cat([torch.cat([R_exp, pvec], -1),
                       torch.tensor([0, 0, 0, 1.0]).expand(num_warp, 1, 4)], 1)
    Rt_new = torch.einsum("ij,tjk->tik", Rt_t, delta)
    return Rt_new.numpy()


def test_blce_latent_poses_match_torch_reference():
    from mobgs_tpu.models import blce as B
    rng = np.random.default_rng(0)
    state = B.init_blce(jax.random.PRNGKey(3), num_views=3, num_warp=9)
    # randomize all params so the test is not trivially near-identity
    params = jax.tree.map(
        lambda x: jnp.asarray(rng.normal(scale=0.1, size=x.shape)
                              .astype(np.float32)), state.params)
    state = state._replace(params=params)

    view = 1
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    from mobgs_tpu.core import se3
    Rm = np.asarray(se3.quat_to_rotmat(jnp.asarray(q, jnp.float32)))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = Rm
    c2w[:3, 3] = rng.normal(size=3)
    bf = 0.37

    got, expo = B.latent_poses(state, jnp.asarray(c2w), jnp.asarray(bf),
                               jnp.int32(view), num_warp=9)
    p_np = {f: np.asarray(getattr(params, f))[view]
            for f in params._fields}
    want = torch_blce_forward(p_np, c2w, bf, num_warp=9)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)
