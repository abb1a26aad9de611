"""Per-group Adam for the padded Gaussian pytree.

Functional equivalent of the reference's torch.optim.Adam with six named
parameter groups and per-group learning rates (gaussian.py:128-146,
eps=1e-15), plus the densification-time optimizer-state surgery
(gaussian.py:153-228) expressed as masked moment resets instead of tensor
reallocation. The xyz group follows the Plenoxels-style log-linear decay
(gaussian_utils.py:212-245).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from manus_tpu.models.gaussians import GaussianOpts, GaussianParams

BETA1, BETA2 = 0.9, 0.999
EPS = 1e-15


class AdamState(NamedTuple):
    m: GaussianParams
    v: GaussianParams
    step: jax.Array  # [] int32


def init_adam(params: GaussianParams) -> AdamState:
    # m and v must be INDEPENDENT buffers: sharing one zeros pytree makes
    # the train step's donated input alias itself and XLA rejects the
    # double donation (the round-2 blocker for donate_argnums).
    return AdamState(
        m=jax.tree.map(jnp.zeros_like, params),
        v=jax.tree.map(jnp.zeros_like, params),
        step=jnp.zeros((), jnp.int32),
    )


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
):
    """Log-linear LR interpolation (reference gaussian_utils.py:212-245).

    Returns 0 when both endpoints are 0 ("disable this parameter").
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(
        jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
    )
    return delay_rate * log_lerp


def group_learning_rates(opts: GaussianOpts, step) -> GaussianParams:
    """Per-leaf LR pytree for the current step (reference gaussian.py:133-140)."""
    xyz_lr_init = opts.position_lr_init * opts.spatial_lr_scale
    xyz_lr_final = opts.position_lr_final * opts.spatial_lr_scale
    return GaussianParams(
        xyz=expon_lr(
            step,
            xyz_lr_init,
            xyz_lr_final,
            lr_delay_mult=opts.position_lr_delay_mult,
            max_steps=opts.position_lr_max_steps,
        ),
        features_dc=jnp.asarray(opts.feature_lr),
        features_rest=jnp.asarray(opts.feature_lr / 20.0),
        scaling=jnp.asarray(opts.scaling_lr),
        rotation=jnp.asarray(opts.rotation_lr),
        opacity=jnp.asarray(opts.opacity_lr),
    )


def adam_update(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    lrs: GaussianParams,
    active: jax.Array,
):
    """One masked Adam step. Inactive slots receive no update.

    Bias correction uses the global step (the reference's per-group torch
    step counter survives densification surgery, so after warmup the two
    are indistinguishable).
    """
    step = state.step + 1
    bc1 = 1.0 - BETA1 ** step.astype(jnp.float32)
    bc2 = 1.0 - BETA2 ** step.astype(jnp.float32)

    def upd(p, g, m, v, lr):
        mask = active.reshape((-1,) + (1,) * (p.ndim - 1))
        g = jnp.where(mask, g, 0.0)
        m_new = BETA1 * m + (1 - BETA1) * g
        v_new = BETA2 * v + (1 - BETA2) * g * g
        m_hat = m_new / bc1
        v_hat = v_new / bc2
        p_new = p - lr * m_hat / (jnp.sqrt(v_hat) + EPS)
        return jnp.where(mask, p_new, p), m_new, v_new

    out = jax.tree.map(upd, params, grads, state.m, state.v, lrs)
    is_tup = lambda x: isinstance(x, tuple) and not hasattr(x, "_fields")
    new_params = jax.tree.map(lambda t: t[0], out, is_leaf=is_tup)
    new_m = jax.tree.map(lambda t: t[1], out, is_leaf=is_tup)
    new_v = jax.tree.map(lambda t: t[2], out, is_leaf=is_tup)
    return new_params, AdamState(m=new_m, v=new_v, step=step)


class ArrayAdamState(NamedTuple):
    """Adam moments for a single auxiliary array (skin weights). Bias
    correction shares the main AdamState's step counter."""

    m: jax.Array
    v: jax.Array


def init_array_adam(x: jax.Array) -> ArrayAdamState:
    return ArrayAdamState(m=jnp.zeros_like(x), v=jnp.zeros_like(x))


def array_adam_update(
    p: jax.Array,
    g: jax.Array,
    state: ArrayAdamState,
    lr: float,
    active: jax.Array,
    step: jax.Array,  # 1-based (the main optimizer's post-increment step)
):
    """Masked Adam step for one array (the skinning_lr group the reference
    declares at gaussian.yaml:12 but never wires up — here it is live)."""
    bc1 = 1.0 - BETA1 ** step.astype(jnp.float32)
    bc2 = 1.0 - BETA2 ** step.astype(jnp.float32)
    mask = active.reshape((-1,) + (1,) * (p.ndim - 1))
    g = jnp.where(mask, g, 0.0)
    m_new = BETA1 * state.m + (1 - BETA1) * g
    v_new = BETA2 * state.v + (1 - BETA2) * g * g
    p_new = p - lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + EPS)
    return jnp.where(mask, p_new, p), ArrayAdamState(m=m_new, v=v_new)


def array_reset_rows(state: ArrayAdamState, rows_mask: jax.Array):
    mask = rows_mask.reshape((-1,) + (1,) * (state.m.ndim - 1))
    return ArrayAdamState(
        m=jnp.where(mask, 0.0, state.m), v=jnp.where(mask, 0.0, state.v)
    )


def reset_moments_rows(state: AdamState, rows_mask: jax.Array) -> AdamState:
    """Zero first/second moments for the masked rows (densify surgery).

    Equivalent to the reference's zeroed exp_avg / exp_avg_sq for new or
    replaced tensors (gaussian.py:153-165, 204-228).
    """

    def zero_rows(x):
        mask = rows_mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(mask, 0.0, x)

    return AdamState(
        m=jax.tree.map(zero_rows, state.m),
        v=jax.tree.map(zero_rows, state.v),
        step=state.step,
    )


def reset_moments_leaf(state: AdamState, leaf: str) -> AdamState:
    """Zero moments of one whole parameter group (opacity reset)."""
    m = state.m._replace(**{leaf: jnp.zeros_like(getattr(state.m, leaf))})
    v = state.v._replace(**{leaf: jnp.zeros_like(getattr(state.v, leaf))})
    return AdamState(m=m, v=v, step=state.step)
