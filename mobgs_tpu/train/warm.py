"""Warm-stage geometric initialization.

Parity target: `scene_initialization` (reference train.py:58-199) plus
the depth-warping ops it uses (`scene/deformation.py:481-783`):

1. For every training frame, warp every other frame into it via the
   depth map (inverse warping) and accumulate the photometric error.
2. Pixels with error == 0 AND motion-mask == 0 seed the *static* cloud
   (accumulated across all frames, stat_npts sampled).
3. Frame-0 pixels with error == 1 AND mask == 1 seed the *dynamic*
   cloud (dyn_npts sampled); each dynamic seed snaps to its nearest
   TAPIR track and its 3D trajectory is read off the per-frame
   unprojected point maps at the track positions (nearest sampling).

Everything is vectorized jax — the reference's O(V²) python warp loop
becomes one vmap over (target, reference) frame pairs.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class PointClouds(NamedTuple):
    stat_points: np.ndarray  # [Ns, 3]
    stat_colors: np.ndarray  # [Ns, 3]
    stat_times: np.ndarray   # [Ns]
    dyn_points: np.ndarray   # [Nd, 3]
    dyn_colors: np.ndarray   # [Nd, 3]
    dyn_times: np.ndarray    # [Nd]
    dyn_trajectory: np.ndarray  # [Nd, T, 3] world-space tracks


def unproject_depth(depth: jnp.ndarray, w2c: jnp.ndarray, K: jnp.ndarray):
    """Depth map → world points [H, W, 3] (deformation.points_from_DRTK)."""
    H, W = depth.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    z = depth
    x = (xs.astype(jnp.float32) + 0.5 - K[0, 2]) / K[0, 0] * z
    y = (ys.astype(jnp.float32) + 0.5 - K[1, 2]) / K[1, 1] * z
    cam = jnp.stack([x, y, z], -1)
    c2w_R = w2c[:3, :3].T
    c2w_t = -c2w_R @ w2c[:3, 3]
    return cam @ c2w_R.T + c2w_t


def inverse_warp(ref_img: jnp.ndarray, tgt_depth: jnp.ndarray,
                 w2c_tgt: jnp.ndarray, w2c_ref: jnp.ndarray,
                 K: jnp.ndarray):
    """Warp ``ref_img`` into the target view through the target depth
    (deformation.inverse_warp_rt1_rt2, :640-702). Returns
    (warped [H,W,3], in_bounds [H,W])."""
    H, W = tgt_depth.shape
    wpts = unproject_depth(tgt_depth, w2c_tgt, K)          # [H, W, 3]
    cam_ref = wpts @ w2c_ref[:3, :3].T + w2c_ref[:3, 3]
    z = jnp.maximum(cam_ref[..., 2], 1e-6)
    u = K[0, 0] * cam_ref[..., 0] / z + K[0, 2]
    v = K[1, 1] * cam_ref[..., 1] / z + K[1, 2]
    inb = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (cam_ref[..., 2] > 0)

    u0 = jnp.clip(jnp.floor(u - 0.5).astype(jnp.int32), 0, W - 1)
    v0 = jnp.clip(jnp.floor(v - 0.5).astype(jnp.int32), 0, H - 1)
    wu = jnp.clip(u - 0.5 - u0, 0.0, 1.0)
    wv = jnp.clip(v - 0.5 - v0, 0.0, 1.0)
    u1 = jnp.clip(u0 + 1, 0, W - 1)
    v1 = jnp.clip(v0 + 1, 0, H - 1)

    def at(iy, ix):
        return ref_img[iy, ix]

    top = at(v0, u0) * (1 - wu)[..., None] + at(v0, u1) * wu[..., None]
    bot = at(v1, u0) * (1 - wu)[..., None] + at(v1, u1) * wu[..., None]
    warped = top * (1 - wv)[..., None] + bot * wv[..., None]
    warped = warped * inb[..., None]
    return warped, inb


def photometric_error_masks(images: jnp.ndarray, depths: jnp.ndarray,
                            w2cs: jnp.ndarray, Ks: jnp.ndarray) -> jnp.ndarray:
    """Per-frame binary inconsistency masks (train.py:91-109).

    Returns [V, H, W] in {0, 1}: 1 = photometrically inconsistent
    (accumulated warp error above its frame mean)."""
    V = images.shape[0]

    def per_target(tgt_idx):
        tgt_img = images[tgt_idx]
        tgt_depth = depths[tgt_idx]
        w2c_t = w2cs[tgt_idx]
        K = Ks[tgt_idx]

        def per_ref(ref_idx, acc):
            warped, _ = inverse_warp(images[ref_idx], tgt_depth, w2c_t,
                                     w2cs[ref_idx], K)
            out_mask = (jnp.sum(warped, -1) > 0).astype(jnp.float32)
            err = out_mask * jnp.mean(jnp.abs(warped - tgt_img), -1)
            return acc + err

        acc = jax.lax.fori_loop(0, V, lambda i, a: per_ref(i, a),
                                jnp.zeros_like(tgt_depth))
        return (acc > jnp.mean(acc)).astype(jnp.float32)

    return jax.lax.map(per_target, jnp.arange(V))


def warm_init(images: np.ndarray, depths: np.ndarray, w2cs: np.ndarray,
              Ks: np.ndarray, times: np.ndarray, motion_masks: np.ndarray,
              tracklet: np.ndarray, stat_npts: int, dyn_npts: int,
              seed: int = 0) -> PointClouds:
    """Full warm-stage init (train.py:58-199).

    Args:
      images: [V, H, W, 3]; depths: [V, H, W]; w2cs: [V, 4, 4];
      Ks: [V, 3, 3]; times: [V]; motion_masks: [V, H, W] in {0,1};
      tracklet: [T, P, 2] TAPIR tracks in pixel coords (frame-0 anchored).
    """
    rng = np.random.default_rng(seed)
    V, H, W = depths.shape

    err = np.asarray(photometric_error_masks(
        jnp.asarray(images), jnp.asarray(depths), jnp.asarray(w2cs),
        jnp.asarray(Ks)))
    point_maps = np.asarray(jax.vmap(unproject_depth)(
        jnp.asarray(depths), jnp.asarray(w2cs), jnp.asarray(Ks)))  # [V,H,W,3]

    stat_pts, stat_cols, stat_ts = [], [], []
    for v in range(V):
        sel = (err[v].reshape(-1) == 0) & (motion_masks[v].reshape(-1) == 0)
        stat_pts.append(point_maps[v].reshape(-1, 3)[sel])
        stat_cols.append(images[v].reshape(-1, 3)[sel])
        stat_ts.append(np.full(sel.sum(), times[v], np.float32))
    stat_pts = np.concatenate(stat_pts)
    stat_cols = np.concatenate(stat_cols)
    stat_ts = np.concatenate(stat_ts)
    sel = rng.choice(len(stat_pts), size=min(stat_npts, len(stat_pts)),
                     replace=len(stat_pts) < stat_npts)
    stat_pts, stat_cols, stat_ts = stat_pts[sel], stat_cols[sel], stat_ts[sel]

    # dynamic seeds from frame 0 (train.py:126-148)
    dyn_sel = (err[0].reshape(-1) == 1) & (motion_masks[0].reshape(-1) == 1)
    idxs = np.nonzero(dyn_sel)[0]
    if len(idxs) == 0:  # degenerate scene: fall back to masked pixels
        idxs = np.nonzero(motion_masks[0].reshape(-1) > 0)[0]
    if len(idxs) == 0:
        idxs = np.arange(H * W)
    replace = len(idxs) < dyn_npts
    pick = rng.choice(idxs, size=dyn_npts, replace=replace)
    ys, xs = np.divmod(pick, W)
    dyn_coords = np.stack([xs, ys], -1).astype(np.float32)  # [Nd, 2] (x, y)
    dyn_pts = point_maps[0].reshape(-1, 3)[pick]
    dyn_cols = images[0].reshape(-1, 3)[pick]
    dyn_ts = np.full(dyn_npts, times[0], np.float32)

    # nearest TAPIR track per dynamic seed (train.py:171-189)
    start = tracklet[0]                                     # [P, 2]
    d2 = ((dyn_coords[:, None] - start[None]) ** 2).sum(-1)
    nearest = np.argmin(d2, axis=1)                         # [Nd]
    track = tracklet[:, nearest]                            # [T, Nd, 2]
    # nearest-neighbour sample of per-frame world point maps at track pos
    T = track.shape[0]
    traj = np.zeros((dyn_npts, T, 3), np.float32)
    for t in range(T):
        px = np.clip(np.round(track[t, :, 0]).astype(np.int64), 0, W - 1)
        py = np.clip(np.round(track[t, :, 1]).astype(np.int64), 0, H - 1)
        traj[:, t] = point_maps[min(t, V - 1), py, px]

    return PointClouds(stat_points=stat_pts.astype(np.float32),
                       stat_colors=stat_cols.astype(np.float32),
                       stat_times=stat_ts,
                       dyn_points=dyn_pts.astype(np.float32),
                       dyn_colors=dyn_cols.astype(np.float32),
                       dyn_times=dyn_ts,
                       dyn_trajectory=traj)


def seed_from_depths(data, n_points: int, rng: np.random.Generator):
    """Seed a point cloud by unprojecting the per-view depth priors —
    the registry families without an SfM cloud (blender/dycheck) seed
    this way; mirrors the per-family random/depth seeding of
    `dataset_readers.py` (e.g. readNerfSyntheticInfo's random cloud,
    but anchored to the depth priors when they exist).

    Returns (points [N, 3], colors [N, 3]) float32.
    """
    import jax

    V = data.w2c.shape[0]
    per_view = max(1, n_points // V)
    unproject = jax.jit(unproject_depth)
    pts_l, col_l = [], []
    for v in range(V):
        pm = np.asarray(unproject(jnp.asarray(data.depths[v]),
                                  jnp.asarray(data.w2c[v]),
                                  jnp.asarray(data.K[v])))
        flat = pm.reshape(-1, 3)
        cols = data.images[v].reshape(-1, 3)
        pick = rng.choice(len(flat), size=min(per_view, len(flat)),
                          replace=False)
        pts_l.append(flat[pick])
        col_l.append(cols[pick])
    return (np.concatenate(pts_l).astype(np.float32),
            np.concatenate(col_l).astype(np.float32))
