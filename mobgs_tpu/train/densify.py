"""Densification / pruning with fixed-capacity masked arrays.

Behavioral reference: `helper_train.py:222-258` (controlgaussians mode 2
— the mode train.py hardcodes at :208) and `scene/gaussian_model.py`
(densify_and_clone :1480, densify_and_splitv2 :1210, prune_points :1068,
reset_opacity :897, add_densification_stats :1352).

The reference grows/shrinks torch tensors and performs "optimizer
surgery" every densification interval. Under XLA that would mean a
recompile per shape change, so here:

* arrays have a static capacity and a ``live`` mask,
* cloning/splitting scatters rows into free (dead) slots — a rank-match
  between `cumsum(candidate_mask)` and the ordered free-slot list,
* newly allocated slots get zeroed Adam moments (parity with
  `cat_tensors_to_optimizer`'s zero-moment extension, :1102-1105),
* pruning just clears ``live`` (the slot is recycled later),
* capacity overflow silently drops the lowest-priority candidates (the
  count is returned so callers can log it).

Reference behavior notes mirrored exactly:
* mode 2 increments the stop-counter ``flag`` only for the static set —
  the dynamic set keeps densifying every interval for the whole run,
* the dynamic grad threshold is halved (helper_train.py:236),
* `densify_pruneclone` computes but never applies its prune mask; real
  opacity-pruning only happens in the ``flag >= desicnt`` branch,
* opacity reset every 3000 iters clamps activated opacity to ≤ 0.01 and
  zeroes the opacity Adam moments.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobgs_tpu.models import gaussians as G
from mobgs_tpu.train.optim import AdamState


class DensifyStats(NamedTuple):
    xyz_grad_accum: jnp.ndarray  # [M]
    denom: jnp.ndarray           # [M]
    max_radii2d: jnp.ndarray     # [M]


def init_stats(capacity: int) -> DensifyStats:
    # three distinct buffers — donation-safe (no aliased leaves in jit)
    return DensifyStats(jnp.zeros((capacity,), jnp.float32),
                        jnp.zeros((capacity,), jnp.float32),
                        jnp.zeros((capacity,), jnp.float32))


def add_stats(stats: DensifyStats, means2d_grad: jnp.ndarray,
              radii: jnp.ndarray, visible: jnp.ndarray) -> DensifyStats:
    """Accumulate view-space gradient norms + max radii (reference
    train.py:809-817, gaussian_model.py:1352-1355)."""
    gnorm = jnp.linalg.norm(means2d_grad, axis=-1)
    vis = visible.astype(jnp.float32)
    return DensifyStats(
        xyz_grad_accum=stats.xyz_grad_accum + gnorm * vis,
        denom=stats.denom + vis,
        max_radii2d=jnp.maximum(stats.max_radii2d,
                                radii.astype(jnp.float32) * vis),
    )


def _alloc_slots(live: jnp.ndarray, want: jnp.ndarray):
    """Map the i-th wanted candidate to the i-th free slot.

    Returns (dest [M] int32, ok [M] bool): for each candidate index j
    with want[j], dest[j] is a unique dead-slot index; ok[j] False if
    capacity ran out.
    """
    M = live.shape[0]
    free_slots = jnp.argsort(live, stable=True)  # dead (False) slots first
    n_free = M - jnp.sum(live.astype(jnp.int32))
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1  # 0-based rank per candidate
    ok = want & (rank < n_free)
    dest = free_slots[jnp.clip(rank, 0, M - 1)]
    # rejected candidates scatter out of bounds → dropped by mode='drop',
    # so they can never race with an accepted write to the same slot
    dest = jnp.where(ok, dest, M)
    return dest, ok


def _scatter_rows(state: G.GaussianState, src_idx: jnp.ndarray,
                  dest: jnp.ndarray, ok: jnp.ndarray,
                  overrides: dict | None = None) -> G.GaussianState:
    """Copy rows src→dest (masked), with optional per-field overrides."""
    overrides = overrides or {}

    def scat(field, x):
        row = overrides.get(field, x[src_idx])
        return x.at[dest].set(row, mode="drop")

    new = {f: scat(f, getattr(state, f)) for f in state._fields if f != "live"}
    live = state.live.at[dest].set(True, mode="drop")
    return G.GaussianState(live=live, **new)


def _zero_moments_at(opt_state: AdamState, dest: jnp.ndarray,
                     ok: jnp.ndarray) -> AdamState:
    """Zero Adam moments for newly allocated slots (per-Gaussian leaves)."""
    def z(x):
        if x.ndim == 0 or x.shape[0] != ok.shape[0]:
            return x  # non-per-Gaussian leaf (shouldn't occur for DiffFields)
        return x.at[dest].set(0.0, mode="drop")
    return AdamState(mu=jax.tree.map(z, opt_state.mu),
                     nu=jax.tree.map(z, opt_state.nu), step=opt_state.step)


def densify_clone_split(state: G.GaussianState, stats: DensifyStats,
                        opt_state: AdamState, rng: jax.Array,
                        grad_threshold: float, percent_dense: float,
                        scene_extent: float, split_n: int = 2):
    """Clone small high-grad Gaussians; split big high-grad ones.

    Parity: densify_and_clone (:1480) + densify_and_splitv2 (:1210).
    Returns (state, opt_state, stats, n_dropped).
    """
    grads = stats.xyz_grad_accum / jnp.maximum(stats.denom, 1e-12)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)
    max_scale = jnp.max(G.act_scaling(state), axis=1)
    hi = (grads >= grad_threshold) & state.live

    # ---- clone: small Gaussians copied verbatim
    clone_mask = hi & (max_scale <= percent_dense * scene_extent)
    idx = jnp.arange(state.capacity, dtype=jnp.int32)
    dest, ok = _alloc_slots(state.live, clone_mask)
    state = _scatter_rows(state, idx, dest, ok)
    opt_state = _zero_moments_at(opt_state, dest, ok)
    dropped = jnp.sum(clone_mask) - jnp.sum(ok)

    # ---- split: big Gaussians → split_n children, parent pruned.
    # A parent is only pruned if ALL its children were allocated —
    # otherwise a full capacity pool would net-destroy Gaussians.
    split_mask = hi & (max_scale > percent_dense * scene_extent) & state.live
    scales = G.act_scaling(state)
    R = jax.vmap(lambda q: _quat_rot(q))(state.rotation)
    child_state = state
    all_ok = split_mask
    for c in range(split_n):
        rng, sub = jax.random.split(rng)
        samples = jax.random.normal(sub, (state.capacity, 3)) * scales
        new_xyz = jnp.einsum("nij,nj->ni", R, samples) + state.xyz
        new_scaling = jnp.log(scales / (0.8 * split_n))
        dest, ok = _alloc_slots(child_state.live, split_mask)
        child_state = _scatter_rows(
            child_state, idx, dest, ok,
            overrides={"xyz": new_xyz[idx], "scaling": new_scaling[idx]})
        opt_state = _zero_moments_at(opt_state, dest, ok)
        all_ok = all_ok & ok
        dropped = dropped + jnp.sum(split_mask) - jnp.sum(ok)
    child_state = child_state._replace(live=child_state.live & ~all_ok)

    new_stats = init_stats(state.capacity)
    return child_state, opt_state, new_stats, dropped


def _quat_rot(q):
    from mobgs_tpu.core.se3 import quat_to_rotmat
    return quat_to_rotmat(q)


def grow_stats(stats: DensifyStats, new_capacity: int) -> DensifyStats:
    """Zero-pad the accumulators to a grown pool capacity."""
    def pad(x):
        n = new_capacity - x.shape[0]
        return jnp.concatenate([x, jnp.zeros((n,), x.dtype)])
    return DensifyStats(*(pad(getattr(stats, f)) for f in stats._fields))


def grow_pool(state: G.GaussianState, opt_state: AdamState,
              stats: DensifyStats, dropped: int,
              max_capacity: int = 400_000, headroom: float = 0.5):
    """Host-side pool re-capacity on densify pressure.

    The reference appends EVERY accepted densify candidate — parameter
    and Adam tensors grow without limit (`gaussian_model.py:1093-1123`);
    runs reach 30k-300k points. The fixed-capacity pools instead drop
    candidates when full, which starves densification (round-4: 154k
    static candidates rejected, pool pinned). This restores the
    reference's growth dynamics as a RARE host event: size the new
    capacity to cover the rejected candidates plus headroom (so growth
    events stay logarithmic in count — each one recompiles the step),
    pad the state/moments/stats, and let jit retrace on the new shapes.

    Returns (state, opt_state, stats, new_capacity) — unchanged inputs
    and the old capacity if no growth is needed or the cap is reached.
    """
    cap = state.capacity
    if dropped <= 0 or cap >= max_capacity:
        return state, opt_state, stats, cap
    want = cap + dropped
    new_cap = int(min(max_capacity, (1.0 + headroom) * want))
    new_cap = -(-new_cap // 1024) * 1024  # round up to 1024 slots
    new_cap = min(new_cap, max_capacity)
    if new_cap <= cap:
        return state, opt_state, stats, cap
    from mobgs_tpu.train.optim import grow_adam
    state = G.grow_state(state, new_cap)
    opt_state = grow_adam(opt_state, cap, new_cap)
    stats = grow_stats(stats, new_cap)
    return state, opt_state, stats, new_cap


def grow_train_state(ts, cap_stat: int, cap_dyn: int):
    """Grow BOTH pools of a TrainState to explicit capacities (≥ current).

    Used on resume: a checkpoint written after mid-train pool growth has
    larger pools than a freshly-initialized template, so the template is
    grown to the checkpoint's capacities before loading."""
    from mobgs_tpu.train.optim import grow_adam
    new = ts
    if cap_stat > ts.stat.capacity:
        new = new._replace(
            stat=G.grow_state(ts.stat, cap_stat),
            stat_opt=grow_adam(ts.stat_opt, ts.stat.capacity, cap_stat),
            stat_stats=grow_stats(ts.stat_stats, cap_stat))
    if cap_dyn > ts.dyn.capacity:
        new = new._replace(
            dyn=G.grow_state(ts.dyn, cap_dyn),
            dyn_opt=grow_adam(ts.dyn_opt, ts.dyn.capacity, cap_dyn),
            dyn_stats=grow_stats(ts.dyn_stats, cap_dyn))
    return new


def prune_by_opacity(state: G.GaussianState, min_opacity: float) -> G.GaussianState:
    keep = G.act_opacity(state) >= min_opacity
    return state._replace(live=state.live & keep)


def reset_opacity(state: G.GaussianState, opt_state: AdamState):
    """Clamp activated opacity to ≤0.01, zero opacity moments (:897-903)."""
    o = jnp.minimum(jax.nn.sigmoid(state.opacity), 0.01)
    new_logits = jnp.log(o / (1.0 - o))
    state = state._replace(opacity=new_logits)
    opt_state = AdamState(
        mu=opt_state.mu._replace(opacity=jnp.zeros_like(opt_state.mu.opacity)),
        nu=opt_state.nu._replace(opacity=jnp.zeros_like(opt_state.nu.opacity)),
        step=opt_state.step)
    return state, opt_state


def zero_omega_by_motion(state: G.GaussianState, opt_state: AdamState,
                         threshold: float = 0.15):
    """Freeze-mask computation at the mode-1 iteration-8001 boundary
    (gaussian_model.py:920-932 `zero_omegabymotion`).

    mask=True ⇒ the Gaussian keeps a trainable ω: it moves
    (Σ|motion[:3]| > 0.3), is mid-sized (0.2 < max scale < 0.6) and
    opaque (α > 0.7). ω is zeroed everywhere else, and — matching
    `replace_tensor_to_optimizer` (:1090-1105) — the ω Adam moments are
    reset. Returns (state, opt_state, omega_mask[M] bool).

    ``threshold`` mirrors the reference's (dead) default argument; the
    shipped criterion uses the motion-magnitude 0.3 cut instead.
    """
    del threshold  # kept for signature parity; see docstring
    scales = G.act_scaling(state)
    moving = jnp.sum(jnp.abs(state.motion[:, 0:3]), axis=1) > 0.3
    ms = jnp.max(scales, axis=1)
    mask = (moving & (ms > 0.2) & (ms < 0.6)
            & (G.act_opacity(state) > 0.7) & state.live)
    state = state._replace(
        omega=mask[:, None].astype(state.omega.dtype) * state.omega)
    opt_state = AdamState(
        mu=opt_state.mu._replace(omega=jnp.zeros_like(opt_state.mu.omega)),
        nu=opt_state.nu._replace(omega=jnp.zeros_like(opt_state.nu.omega)),
        step=opt_state.step)
    return state, opt_state, mask


def apply_omega_freeze(grads: G.DiffFields,
                       omega_mask: jnp.ndarray) -> G.DiffFields:
    """Per-iteration gradient freeze for densify mode 1 after iter 8001
    (`freezweightsbymasknounsqueeze`, helper_train.py:158-164,191-194):
    where ω stays trainable (mask=1) the rotation grad is zeroed, and
    vice versa. The reference stashes ``_omega_grd`` and re-injects the
    masked grad AFTER zero_grad — accumulating it into the next
    backward; we implement the intended semantics (mask each
    iteration's fresh gradient before Adam)."""
    m = omega_mask.astype(grads.omega.dtype)
    return grads._replace(omega=grads.omega * m[:, None],
                          rotation=grads.rotation * (1.0 - m)[:, None])


def remove_min_max(state: G.GaussianState, maxbounds, minbounds):
    """Prune Gaussians outside the init-time xyz bounding box
    (helper_train.py:167-180; bounds captured at train.py:216-228)."""
    xyz = state.xyz
    mx = jnp.asarray(maxbounds)
    mn = jnp.asarray(minbounds)
    outside = jnp.any((xyz > mx[None]) | (xyz < mn[None]), axis=1)
    return state._replace(live=state.live & ~outside)


def prune_z_below(state: G.GaussianState, z_thresh: float = 4.5):
    """Mode-1 post-densify stability prune: drop xyz.z < 4.5
    (helper_train.py:212-215)."""
    return state._replace(live=state.live & ~(state.xyz[:, 2] < z_thresh))


def control_gaussians(state: G.GaussianState, stats: DensifyStats,
                      opt_state: AdamState, rng: jax.Array,
                      iteration: int, flag: int, opt_cfg,
                      scene_extent: float, is_dynamic: bool,
                      mode: int = 2, omega_mask: jnp.ndarray | None = None,
                      maxbounds=None, minbounds=None,
                      total_iterations: int = 10_000,
                      densify_fn=None, prune_fn=None, reset_fn=None):
    """Host-level controller — `controlgaussians` (helper_train.py:183-289).

    Mode 2 is what the shipped train path hardcodes (train.py:208); modes
    1 (N3D + ω-freeze) and 3 (Technicolor thresholds) are implemented for
    inventory parity. Called outside the hot jitted step at
    densification boundaries. The optional ``*_fn`` hooks let the train
    loop pass its pre-jitted primitives (defaults run unjitted).

    Returns (state, opt_state, stats, flag, omega_mask, n_dropped).
    ``omega_mask`` is non-None only in mode 1 past iteration 8001 — the
    caller must then run the gradient-freeze step variant
    (apply_omega_freeze) every iteration.
    """
    if mode not in (1, 2, 3):
        raise ValueError(f"unknown densify mode {mode}")
    densify_fn = densify_fn or functools.partial(
        densify_clone_split, percent_dense=opt_cfg.percent_dense,
        scene_extent=scene_extent, split_n=2)
    prune_fn = prune_fn or prune_by_opacity
    reset_fn = reset_fn or reset_opacity
    dropped = 0

    def _densify(thr):
        nonlocal state, opt_state, stats, dropped
        state, opt_state, stats, n_drop = densify_fn(
            state, stats, opt_state, rng, grad_threshold=thr)
        dropped += int(n_drop)

    at_interval = (iteration > opt_cfg.densify_from_iter
                   and iteration % opt_cfg.densification_interval == 0)

    if mode == 2:  # helper_train.py:222-258
        if iteration < opt_cfg.densify_until_iter:
            if at_interval:
                if flag < opt_cfg.desicnt:
                    _densify(opt_cfg.densify_grad_threshold
                             * (0.5 if is_dynamic else 1.0))
                    if not is_dynamic:
                        flag += 1
                else:
                    state = prune_fn(state, opt_cfg.opthr)
            if iteration % opt_cfg.opacity_reset_interval == 0:
                state, opt_state = reset_fn(state, opt_state)
        return state, opt_state, stats, flag, None, dropped

    if mode == 1:  # helper_train.py:185-217
        if iteration < opt_cfg.densify_until_iter:
            if iteration == 8001:
                state, opt_state, omega_mask = zero_omega_by_motion(
                    state, opt_state)
            if at_interval:
                if flag < opt_cfg.desicnt:
                    _densify(opt_cfg.densify_grad_threshold)
                    flag += 1
                elif iteration < 7000:
                    state = prune_fn(state, opt_cfg.opthr)
            if iteration % 3000 == 0:
                state, opt_state = reset_fn(state, opt_state)
        else:
            if iteration % 1000 == 500:
                state = prune_z_below(state)
            if iteration == total_iterations and maxbounds is not None:
                state = remove_min_max(state, maxbounds, minbounds)
        return state, opt_state, stats, flag, omega_mask, dropped

    # mode 3 — helper_train.py:265-289 (Technicolor)
    if iteration < opt_cfg.densify_until_iter:
        if at_interval:
            if flag < opt_cfg.desicnt:
                _densify(opt_cfg.densify_grad_threshold
                         * (1.0 if is_dynamic else 1e-2))
                flag += 1
            elif iteration < 7000:
                state = prune_fn(state, opt_cfg.opthr)
        if iteration % opt_cfg.opacity_reset_interval == 0:
            state, opt_state = reset_fn(state, opt_state)
    else:
        if iteration == total_iterations and maxbounds is not None:
            state = remove_min_max(state, maxbounds, minbounds)
    return state, opt_state, stats, flag, None, dropped
