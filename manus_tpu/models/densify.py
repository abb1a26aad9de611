"""Densification & pruning under static padded shapes.

Functional re-design of the reference's adaptive density control
(/root/reference/src/models/gaussian.py:230-338 and the policy in
gaussian_utils.py:451-502). The reference reallocates parameter tensors
and performs optimizer-state surgery; on TPU that would recompile XLA every
topology change, so instead:

  * capacity is fixed at N_max; `active` marks live slots;
  * clone/split write children into free slots found by a stable argsort of
    the active mask, with positions assigned by prefix sums (pure XLA, no
    host round-trip);
  * prune flips mask bits; Adam moments of touched rows are zeroed
    (models/../train/optim.reset_moments_rows = the reference's zeroed
    exp_avg surgery);
  * the whole update is one jitted function of fixed shapes — the train
    loop calls it every `densification_interval` steps.

Densification statistics mirror the reference: accumulated viewspace
(pixel * 0.5*[W,H], i.e. the CUDA NDC half-size convention) gradient norms
and per-slot max 2D radii (gaussian.py:335-338, gaussian_utils.py:466-473).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from manus_tpu.models.gaussians import (
    GaussianModel,
    GaussianOpts,
    get_opacity,
    get_scaling,
    inverse_sigmoid,
)
from manus_tpu.train.optim import AdamState, reset_moments_leaf, reset_moments_rows
from manus_tpu.utils.transforms import build_rotation


class DensifyStats(NamedTuple):
    """Running densification signals, all [N_max]."""

    grad_accum: jax.Array  # sum of viewspace grad norms
    denom: jax.Array  # number of accumulations
    max_radii2d: jax.Array  # max screen radius seen


def init_stats(capacity: int) -> DensifyStats:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyStats(grad_accum=z, denom=z, max_radii2d=z)


def accumulate_stats(
    stats: DensifyStats,
    viewspace_grad: jax.Array,  # [N, 2] d(loss)/d(means2d) in pixels
    radii: jax.Array,  # [N] int32
    width: int,
    height: int,
) -> DensifyStats:
    """Add one step's signals (reference add_densification_stats +
    max_radii2D tracking). Pixel grads are rescaled by 0.5*[W, H] to match
    the CUDA viewspace convention so thresholds transfer unchanged."""
    visible = radii > 0
    scaled = viewspace_grad * jnp.asarray(
        [0.5 * width, 0.5 * height], viewspace_grad.dtype
    )
    norm = jnp.linalg.norm(scaled, axis=-1)
    return DensifyStats(
        grad_accum=stats.grad_accum + jnp.where(visible, norm, 0.0),
        denom=stats.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.maximum(
            stats.max_radii2d,
            jnp.where(visible, radii.astype(jnp.float32), 0.0),
        ),
    )


def _scatter_rows_tree(dst_tree, src_tree, dst_idx, valid):
    """dst_tree[dst_idx[i]] = src_tree[i] where valid[i] (per-leaf).

    Invalid entries are routed to an out-of-bounds index and dropped.
    """
    def copy(dst, src):
        safe_idx = jnp.where(valid, dst_idx, dst.shape[0])
        return dst.at[safe_idx].set(src, mode="drop")

    return jax.tree.map(copy, dst_tree, src_tree)


def densify_and_prune(
    model: GaussianModel,
    opt_state: AdamState,
    stats: DensifyStats,
    opts: GaussianOpts,
    scene_extent: float,
    rng: jax.Array,
    use_size_threshold: jax.Array,  # [] bool (step > opacity_reset_interval)
) -> Tuple[GaussianModel, AdamState, DensifyStats, dict]:
    """One densify+prune event (reference densify_and_prune).

    Returns updated (model, opt_state, stats, info) where info carries
    counters (clones, splits, pruned, alloc_dropped).
    """
    params = model.params
    active = model.active
    cap = active.shape[0]
    n_split_children = 2  # reference N=2

    grads = jnp.where(stats.denom > 0, stats.grad_accum / stats.denom, 0.0)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)
    scaling = get_scaling(params, opts.isotropic_scaling)
    max_scale = jnp.max(scaling, axis=1)

    over_thr = active & (grads >= opts.densify_grad_threshold)
    clone_mask = over_thr & (max_scale <= opts.percent_dense * scene_extent)
    split_mask = over_thr & (max_scale > opts.percent_dense * scene_extent)

    # --- allocate free slots: inactive slots first (stable order).
    free_order = jnp.argsort(active, stable=True)  # False (free) first
    n_free = cap - jnp.sum(active)

    # clones take slots [0, n_clone); splits take 2 each after.
    clone_rank = jnp.cumsum(clone_mask) - 1
    n_clone = jnp.sum(clone_mask)
    split_rank = jnp.cumsum(split_mask) - 1

    def slot_at(pos, valid):
        ok = valid & (pos < n_free)
        return jnp.where(ok, free_order[jnp.minimum(pos, cap - 1)], cap), ok

    clone_dst, clone_ok = slot_at(clone_rank, clone_mask)
    s1_pos = n_clone + 2 * split_rank
    s2_pos = n_clone + 2 * split_rank + 1
    split1_dst, _ = slot_at(s1_pos, split_mask)
    split2_dst, split2_ok = slot_at(s2_pos, split_mask)
    # A split only proceeds when BOTH children fit (s2_pos > s1_pos, so
    # split2_ok implies split1_ok): never kill a parent for one child.
    split1_ok = split2_ok

    # --- clone: verbatim copies (reference densify_and_clone).
    new_params = _scatter_rows_tree(params, params, clone_dst, clone_ok)
    new_sw = model.skin_weights
    if new_sw is not None:
        new_sw = _scatter_rows_tree(new_sw, model.skin_weights, clone_dst, clone_ok)

    # --- split: children sampled from the parent gaussian, scales /(0.8*N)
    # (reference densify_and_split:264-270).
    rots = build_rotation(params.rotation)  # [cap, 3, 3]
    child_scaling = jnp.log(scaling / (0.8 * n_split_children))
    if params.scaling.shape[1] == 1:
        child_scaling = child_scaling[:, :1]

    k1, k2 = jax.random.split(rng)
    for key, dst, ok in ((k1, split1_dst, split1_ok), (k2, split2_dst, split2_ok)):
        noise = jax.random.normal(key, (cap, 3)) * scaling
        child_xyz = params.xyz + jnp.einsum("nij,nj->ni", rots, noise)
        child_tree = params._replace(xyz=child_xyz, scaling=child_scaling)
        new_params = _scatter_rows_tree(new_params, child_tree, dst, ok)
        if new_sw is not None:
            new_sw = _scatter_rows_tree(new_sw, model.skin_weights, dst, ok)

    # --- activity updates: children live, split parents die.
    new_active = active
    for dst, ok in ((clone_dst, clone_ok), (split1_dst, split1_ok), (split2_dst, split2_ok)):
        new_active = new_active.at[jnp.where(ok, dst, cap)].set(True, mode="drop")
    split_parent_dead = split_mask & split1_ok  # only if children allocated
    new_active = new_active & ~split_parent_dead

    # --- prune (reference densify_and_prune:317-331).
    opacity = get_opacity(new_params)[:, 0]
    prune = new_active & (opacity < opts.min_opacity_threshold)
    big_vs = stats.max_radii2d > opts.size_threshold
    big_ws = jnp.max(get_scaling(new_params, opts.isotropic_scaling), axis=1) > (
        0.1 * scene_extent
    )
    prune = jnp.where(use_size_threshold, prune | (new_active & (big_vs | big_ws)), prune)
    # NaN hygiene: drop any slot with non-finite scaling (gaussian.py:328-331)
    bad = ~jnp.all(jnp.isfinite(new_params.scaling), axis=-1)
    prune = prune | (new_active & bad)
    new_active = new_active & ~prune

    # --- optimizer surgery: only freshly written rows and rows whose
    # activity flipped get zeroed moments. Surviving rows — including clone
    # parents — keep their Adam state, matching the reference's
    # cat_tensors_to_optimizer (gaussian.py:186-228), which zeroes moments
    # only for appended rows.
    written = jnp.zeros((cap,), bool)
    for dst, ok in ((clone_dst, clone_ok), (split1_dst, split1_ok), (split2_dst, split2_ok)):
        written = written.at[jnp.where(ok, dst, cap)].set(True, mode="drop")
    new_opt = reset_moments_rows(opt_state, (new_active != active) | written)

    info = dict(
        clones=jnp.sum(clone_ok),
        splits=jnp.sum(split1_ok),
        pruned=jnp.sum(prune),
        alloc_dropped=jnp.sum(clone_mask & ~clone_ok)
        + jnp.sum(split_mask & ~split1_ok),
        num_active=jnp.sum(new_active),
    )
    model = GaussianModel(
        params=new_params, active=new_active, skin_weights=new_sw
    )
    return model, new_opt, init_stats(cap), info


def prune_by_mask(
    model: GaussianModel, opt_state: AdamState, mask: jax.Array
) -> Tuple[GaussianModel, AdamState, jax.Array]:
    """Deactivate masked slots (the reference's mask-based prune path,
    gaussian_utils.py:454-459). Returns (model, opt, n_removed)."""
    kill = model.active & mask
    new_active = model.active & ~kill
    new_opt = reset_moments_rows(opt_state, kill)
    return (
        model._replace(active=new_active),
        new_opt,
        jnp.sum(kill),
    )


def reset_opacity(
    model: GaussianModel, opt_state: AdamState
) -> Tuple[GaussianModel, AdamState]:
    """Clamp opacities to <= 0.01 and zero opacity moments
    (reference reset_opacity, gaussian.py:148-151)."""
    op = get_opacity(model.params)
    new_logit = inverse_sigmoid(jnp.minimum(op, 0.01))
    params = model.params._replace(opacity=new_logit)
    return model._replace(params=params), reset_moments_leaf(opt_state, "opacity")
