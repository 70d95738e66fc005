"""Per-group Adam over the Gaussian pytree + exponential LR schedules.

Parity targets: reference `gaussian_model.py:590-661` (17 Adam param
groups, eps=1e-15, per-group learning rates, exponential schedules for
xyz/grid/deformation) and `utils/general_utils.py:35-60`
(`get_expon_lr_func`).

Design: one Adam moment pytree congruent with the parameter pytree and
a matching *learning-rate pytree* (scalars per leaf, some re-computed
per step from the schedule). "Optimizer surgery" (zeroing moments for
newly allocated Gaussian slots, reference `gaussian_model.py:1102-1105`)
becomes masked writes into the moment arrays — see `train/densify.py`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any       # first moments, pytree congruent with params
    nu: Any       # second moments
    step: jnp.ndarray  # scalar int32


def init_adam(params: Any) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def grow_adam(state: AdamState, old_capacity: int,
              new_capacity: int) -> AdamState:
    """Pad per-Gaussian Adam moments with zeros for new pool slots.

    Companion to `models/gaussians.grow_state` — the reference's
    `cat_tensors_to_optimizer` extends exp_avg/exp_avg_sq with zeros for
    appended points (`gaussian_model.py:1102-1105`); here growth pads the
    fixed-capacity moment arrays the same way. Leaves whose leading axis
    is not the pool capacity (none today for DiffFields) pass through.
    """
    pad_n = new_capacity - old_capacity

    def pad(x):
        if x.ndim == 0 or x.shape[0] != old_capacity:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((pad_n,) + x.shape[1:], x.dtype)], axis=0)

    return AdamState(mu=jax.tree.map(pad, state.mu),
                     nu=jax.tree.map(pad, state.nu), step=state.step)


def adam_update(params: Any, grads: Any, state: AdamState, lrs: Any,
                b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-15):
    """One Adam step with a per-leaf learning-rate pytree.

    ``lrs`` leaves may be python floats or scalar arrays; a leaf lr of
    exactly 0.0 still updates moments (like torch with lr=0) but leaves
    the parameter unchanged.
    """
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def upd(p, g, m, v, lr):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * (g * g)
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps), m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_lr = treedef.flatten_up_to(lrs)
    out = [upd(p, g, m, v, lr) for p, g, m, v, lr in
           zip(flat_p, flat_g, flat_m, flat_v, flat_lr)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(mu=new_m, nu=new_v, step=step)


def expon_lr(step, lr_init: float, lr_final: float, max_steps: int,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """Log-linear LR interpolation (parity: get_expon_lr_func)."""
    t = jnp.clip(jnp.asarray(step, jnp.float32) / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    zero = jnp.where((lr_init == 0.0) & (lr_final == 0.0), 0.0, 1.0)
    return delay_rate * log_lerp * zero


def gaussian_lrs(opt_cfg, step, spatial_lr_scale: float = 5.0):
    """Learning-rate pytree for a GaussianState (reference :598-618).

    ``opt_cfg`` is the OptimizationParams-like config dataclass.
    Returns a DiffFields of scalar learning rates.
    """
    from mobgs_tpu.models.gaussians import DiffFields
    slr = spatial_lr_scale
    xyz_lr = expon_lr(step, opt_cfg.position_lr_init * slr,
                      opt_cfg.position_lr_final * slr,
                      opt_cfg.position_lr_max_steps)
    return DiffFields(
        xyz=xyz_lr,
        # control_xyz group is named "control_xyz" — never matched by the
        # reference's LR scheduler, so it stays constant at 10x init.
        control_xyz=jnp.asarray(10.0 * opt_cfg.position_lr_init * slr),
        features_dc=jnp.asarray(opt_cfg.feature_lr),
        features_rest=jnp.asarray(opt_cfg.feature_lr / 20.0),
        features_t=jnp.asarray(opt_cfg.featuret_lr),
        scaling=jnp.asarray(opt_cfg.scaling_lr),
        rotation=jnp.asarray(opt_cfg.rotation_lr),
        opacity=jnp.asarray(opt_cfg.opacity_lr),
        omega=jnp.asarray(opt_cfg.omega_lr),
        motion=jnp.asarray(opt_cfg.position_lr_init * slr * 0.5 * opt_cfg.movelr),
        zeta=jnp.asarray(opt_cfg.zeta_lr),
        trbf_center=jnp.asarray(opt_cfg.trbfc_lr),
        trbf_scale=jnp.asarray(opt_cfg.trbfs_lr),
    )
