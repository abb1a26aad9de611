"""Training workloads: object (static 3DGS) and hand (articulated LBS).

Functional re-design of the reference Lightning modules
(/root/reference/src/modules/object.py, hand_dynamic.py, base.py): one
jitted `train_step` fuses render -> loss -> grad -> masked-Adam update ->
densification-stat accumulation -> mask pruning; topology events
(densify/prune/opacity reset) are separate jitted calls triggered on the
host at the reference cadences. Batches carry a leading view axis V — the
analogue of the reference's accum_iter gradient accumulation, and the
data-parallel shard axis on a device mesh.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from manus_tpu.config import ExperimentConfig
from manus_tpu.models import densify as densify_mod
from manus_tpu.models.gaussians import (
    GaussianModel,
    GaussianOpts,
    get_covariance,
    get_features,
    get_opacity,
    get_scaling,
)
from manus_tpu.ops.grid_sample import skinning_weights_from_voxel_grid
from manus_tpu.ops.mask_prune import points_outside_mask
from manus_tpu.ops.rasterizer.api import RasterConfig, render_gaussians
from manus_tpu.ops.skinning import skin_gaussians
from manus_tpu.train import optim as optim_mod
from manus_tpu.utils import losses as loss_mod
from manus_tpu.utils.camera import Camera, index_camera


class VoxelGrid(NamedTuple):
    """Skinning weight grid (reference brics_dynamic.build_voxel_grid)."""

    center: jax.Array  # [3]
    scale: jax.Array  # [3]
    weights: jax.Array  # [D, H, W, B+1] (incl. background channel)
    # one-gather 2x2x2 neighborhood table (grid_sample.build_brick_table);
    # None when disabled or over the memory gate — sampling falls back to
    # the 8-corner gather
    brick: Optional[jax.Array] = None


class TrainState(NamedTuple):
    model: GaussianModel
    opt: optim_mod.AdamState
    stats: densify_mod.DensifyStats
    step: jax.Array  # [] int32
    rng: jax.Array
    mask_pruned_flag: jax.Array  # [] bool: did mask-prune fire this step
    # Adam moments for per-point skin weights (opts.optimize_skin_weights);
    # None unless the model carries point-mode skin weights.
    skin_opt: Optional[optim_mod.ArrayAdamState] = None


def init_train_state(model: GaussianModel, seed: int = 0) -> TrainState:
    return TrainState(
        model=model,
        opt=optim_mod.init_adam(model.params),
        stats=densify_mod.init_stats(model.capacity),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(seed),
        mask_pruned_flag=jnp.zeros((), bool),
        skin_opt=(
            optim_mod.init_array_adam(model.skin_weights)
            if model.skin_weights is not None
            else None
        ),
    )


def resolve_skin_weights(
    model: GaussianModel, voxel_grid: Optional[VoxelGrid]
) -> Optional[jax.Array]:
    """Voxel mode resamples weights from the grid at current positions every
    step (reference hand_gaussian.py:65-76); points mode uses stored ones."""
    if voxel_grid is not None:
        return skinning_weights_from_voxel_grid(
            model.params.xyz, voxel_grid.center, voxel_grid.scale,
            voxel_grid.weights, brick=voxel_grid.brick,
        )
    return model.skin_weights


def forward_gaussians(
    params,
    active,
    skin_weights: Optional[jax.Array],
    bone_tf: Optional[jax.Array],
    opts: GaussianOpts,
):
    """Shared forward: object (identity pose) or hand (LBS).

    bone_tf: [B(+1), 4, 4] rest->posed deformation transforms.
    Returns (posed_xyz, posed_cov, tf or None).
    """
    cov_cano = get_covariance(params, isotropic=opts.isotropic_scaling)
    if bone_tf is None:
        return params.xyz, cov_cano, None
    sk = skin_gaussians(params.xyz, cov_cano, skin_weights, bone_tf)
    return sk.posed_xyz, sk.posed_cov, sk.tf


def donation_supported() -> bool:
    """Whether to donate the train state into the jitted step.

    Donation halves steady-state HBM for the optimizer pytree, but on the
    tunneled 'axon' TPU platform every donated execution dies with a
    runtime `INVALID_ARGUMENT: TPU backend error` — bisected in round 4
    (scripts/tpu_step_bisect.py: the identical tiny step passes with
    donation off and fails with it on; the input-aliasing buffer protocol
    is evidently not implemented by the tunnel server). So: donate on
    directly-attached TPU only. MANUS_TPU_NO_DONATE=1 force-disables.
    """
    import os

    if os.environ.get("MANUS_TPU_NO_DONATE"):
        return False
    if jax.default_backend() != "tpu":
        return False
    plats = str(getattr(jax.config, "jax_platforms", "") or "")
    return "axon" not in plats.lower()


def make_raster_config(cfg: ExperimentConfig) -> RasterConfig:
    """Forward every RasterOptions knob (incl. the quality-critical
    pair_budget_factor / lane_align) so CLI overrides actually apply."""
    return RasterConfig(
        tg_max=cfg.raster.tg_max,
        chunk=cfg.raster.chunk,
        pallas_chunk=cfg.raster.pallas_chunk,
        max_pairs_per_tile=cfg.raster.max_pairs_per_tile,
        backend=cfg.raster.backend,
        lane_align=cfg.raster.lane_align,
        pair_budget_factor=cfg.raster.pair_budget_factor,
        multi_frac=cfg.raster.multi_frac,
        tile_shard_mode=cfg.raster.tile_shard_mode,
        hot_split_tiles=cfg.raster.hot_split_tiles,
    )


def make_train_step(
    cfg: ExperimentConfig,
    extent: float,
    articulated: bool,
    voxel_grid: Optional[VoxelGrid] = None,
    mesh=None,
    lpips_params: Optional[dict] = None,
):
    """Build the jitted train step for one workload configuration.

    Batch layout (leading V = views per step):
      rgb [V,H,W,3], mask [V,H,W,1], cameras: stacked Camera [V],
      bg [3], and for the hand: bone_tf [B(+1),4,4], keypoints [K,3].

    With `mesh` (a Mesh carrying a "data" axis), the gradient computation
    runs under shard_map: each device unrolls only its local view shard
    (the per-view render is deliberately unrolled, not vmapped — batched
    binning lowers 2x slower) and gradients are psum-averaged over the
    axis. Without a mesh the plain single-device step is returned.
    """
    opts = cfg.model
    raster_cfg = make_raster_config(cfg)
    loss_names = tuple(cfg.loss.losses)
    loss_weights = tuple(cfg.loss.loss_weight)
    # Trainable per-point skin weights (points mode only — voxel mode
    # resamples from the grid each step, so there is no per-point leaf).
    train_sw = bool(opts.optimize_skin_weights) and voxel_grid is None

    def loss_fn(params, m2d_off, active, skin_w, batch, step,
                gauss_axis=None, gauss_axis_size=1):
        # start_lpips_iter gate (reference base.py:333-341); traced so the
        # same compiled step serves the whole run.
        lpips_on = step >= opts.start_lpips_iter
        posed_xyz, posed_cov, tf = forward_gaussians(
            params, active, skin_w, batch.get("bone_tf"), opts
        )
        feats = get_features(params)
        opac = get_opacity(params)
        scaling = get_scaling(params, opts.isotropic_scaling)
        # Under gauss-axis sharding the N-heavy stages above ran on the
        # local shard; loss terms that reduce over gaussians (isotropy)
        # need the full cloud so every mesh column computes the identical
        # loss replica (render_gaussians gathers its own fields).
        if gauss_axis is not None:
            scaling_full = jax.lax.all_gather(scaling, gauss_axis, tiled=True)
            active_full = jax.lax.all_gather(active, gauss_axis, tiled=True)
        else:
            scaling_full, active_full = scaling, active

        def render_view(cam, rgb, m2d_v, gt_feats=None):
            out = render_gaussians(
                posed_xyz, posed_cov, params.xyz, feats, opac, cam,
                batch["bg"], sh_degree=opts.sh_degree, tf=tf, active=active,
                means2d_offset=m2d_v, config=raster_cfg,
                gauss_axis=gauss_axis, gauss_axis_size=gauss_axis_size,
            )
            total, parts = loss_mod.compute_losses(
                out.render, rgb, scaling_full, active_full, loss_names,
                loss_weights, opts.condition_number,
                lpips_params=lpips_params, lpips_enabled=lpips_on,
                lpips_downsample=cfg.loss.lpips_downsample,
                lpips_conv=cfg.loss.lpips_conv,
                lpips_gt_feats=gt_feats,
            )
            return total, (out.radii, out.render, parts,
                           jnp.stack([out.overflow, out.overflow_far]))

        # Unrolled static loop over views, NOT vmap: batching the binning
        # sort/scatter de-optimises their XLA lowering (2x slower even at
        # V=1). V is small (1-8); under a sharded mesh each device unrolls
        # only its local shard.
        cams = batch["cameras"]
        v = batch["rgb"].shape[0]
        # Precomputed gt LPIPS features (trainer gt-feature cache): a
        # tuple of per-stage arrays with leading V, sliced per view.
        gt_feats_v = batch.get("lpips_gt_feats")
        outs = [
            render_view(
                index_camera(cams, i), batch["rgb"][i], m2d_off[i],
                None if gt_feats_v is None
                else [a[i] for a in gt_feats_v],
            )
            for i in range(v)
        ]
        totals = jnp.stack([o[0] for o in outs])
        radii = jnp.stack([o[1][0] for o in outs])
        renders = jnp.stack([o[1][1] for o in outs])
        parts = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[o[1][2] for o in outs]
        )
        overflow = jnp.stack([o[1][3] for o in outs])
        loss = jnp.mean(totals)
        return loss, dict(radii=radii, renders=renders, parts=parts,
                          posed_xyz=posed_xyz, overflow=overflow)

    width, height = cfg.dataset.width, cfg.dataset.height

    # The train state is DONATED: the old step's params/moments/stats
    # buffers are reused for the new state, halving steady-state HBM for
    # the optimizer pytree (init_adam now allocates m and v independently
    # — the round-2 donation blocker was m/v sharing one zeros pytree).
    # The batch and voxel grid are NOT donated (device-cached across
    # steps). The voxel grid travels as a traced ARGUMENT, not a closure
    # constant: closed-over arrays are serialized into the compile
    # payload, and the brick table alone is ~0.6GB at 96^3 (the tunneled
    # platform rejects such compile requests outright, and baked-in
    # constants bloat the executable everywhere else).
    donate = (0,) if donation_supported() else ()

    @functools.partial(jax.jit, donate_argnums=donate)
    def _train_step(state: TrainState, batch, vg: Optional[VoxelGrid]):
        v = batch["rgb"].shape[0]
        n = state.model.capacity
        skin_w = resolve_skin_weights(state.model, vg)
        m2d_zero = jnp.zeros((v, n, 2), jnp.float32)

        argnums = (0, 1, 3) if train_sw else (0, 1)
        if mesh is None:
            (loss, aux), grads_out = jax.value_and_grad(
                loss_fn, argnums=argnums, has_aux=True
            )(state.model.params, m2d_zero, state.model.active, skin_w, batch,
              state.step)
            g_params, g_m2d = grads_out[0], grads_out[1]
            g_sw = grads_out[2] if train_sw else None
            # Rescale to per-view-loss gradients: loss_fn averages over V,
            # so d(mean)/dm2d[i] = (1/V) dL_i/dm2d. The reference accumulates
            # d(L_i)/dmeans2D from per-view backwards (base.py accum_iter),
            # so densify thresholds only transfer if stats are invariant to
            # batch_views (and to the data axis under shard_map).
            g_m2d = g_m2d * v
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from manus_tpu.parallel.mesh import GAUSS_AXIS

            n_gauss = int(mesh.shape.get(GAUSS_AXIS, 1))
            g_axis = GAUSS_AXIS if n_gauss > 1 else None

            def local_grads(params, m2d, active, sw, local_batch, step):
                (l, a), gout = jax.value_and_grad(
                    loss_fn, argnums=argnums, has_aux=True
                )(params, m2d, active, sw, local_batch, step, g_axis,
                  n_gauss)
                gp, gm = gout[0], gout[1]
                gsw = gout[2] if train_sw else None
                # average loss and param grads over the data axis; per-view
                # quantities stay sharded
                l = jax.lax.pmean(l, "data")
                gp = jax.tree.map(lambda g: jax.lax.pmean(g, "data"), gp)
                if gsw is not None:
                    gsw = jax.lax.pmean(gsw, "data")
                if g_axis is not None:
                    # every gauss column computes the identical loss replica
                    # from the gathered fields, so the all_gather transpose
                    # (psum_scatter over "gauss") sums n_gauss identical
                    # cotangents into each param shard — rescale back.
                    gp = jax.tree.map(lambda g: g / n_gauss, gp)
                    if gsw is not None:
                        gsw = gsw / n_gauss
                # per-view-loss viewspace grads (see single-device branch):
                # loss_fn averaged over the LOCAL shard, so undo with the
                # local view count — stats become mesh-shape invariant.
                gm = gm * local_batch["rgb"].shape[0]
                if g_axis is not None:
                    # replicated composite: columns hold identical full gm
                    # (pmean = identity); tile-sharded composite: each
                    # column holds n_gauss x its tile block's partial gm,
                    # and pmean reassembles the true full gradient.
                    gm = jax.lax.pmean(gm, g_axis)
                return (l, a), (gp, gm, gsw)

            shard = P("data")
            rep = P()
            # N-leading model leaves shard over the gauss axis (projection/
            # LBS/SH tensor parallelism, SURVEY §5.7); replicated when the
            # mesh has no gauss extent.
            gshard = P(GAUSS_AXIS) if g_axis is not None else rep
            gspec = lambda tree: jax.tree.map(lambda _: gshard, tree)
            batch_specs = {
                "rgb": shard, "mask": shard,
                "cameras": jax.tree.map(lambda _: shard, batch["cameras"]),
                "bg": rep,
            }
            if "bone_tf" in batch:
                batch_specs["bone_tf"] = rep
            if "keypoints" in batch:
                batch_specs["keypoints"] = rep
            aux_specs = dict(
                radii=shard, renders=shard, parts=shard, posed_xyz=gshard,
                overflow=shard,
            )
            gsw_spec = gshard if train_sw else None
            (loss, aux), (g_params, g_m2d, g_sw) = shard_map(
                local_grads, mesh=mesh,
                in_specs=(gspec(state.model.params), shard, gshard,
                          gspec(skin_w), batch_specs, rep),
                out_specs=((rep, aux_specs), (gspec(state.model.params),
                                              shard, gsw_spec)),
                check_vma=False,
            )(state.model.params, m2d_zero, state.model.active, skin_w, batch,
              state.step)

        lrs = optim_mod.group_learning_rates(opts, state.step)
        new_params, new_opt = optim_mod.adam_update(
            state.model.params, g_params, state.opt, lrs, state.model.active
        )
        model = state.model._replace(params=new_params)
        new_skin_opt = state.skin_opt
        if train_sw and g_sw is not None:
            # skinning_lr group (the knob the reference declares but never
            # wires): masked Adam, then clamp>=0 + renormalize so the LBS
            # blend stays a convex combination of bone transforms.
            new_sw, new_skin_opt = optim_mod.array_adam_update(
                state.model.skin_weights, g_sw, state.skin_opt,
                opts.skinning_lr, state.model.active, new_opt.step,
            )
            new_sw = jnp.maximum(new_sw, 0.0)
            norm = jnp.sum(new_sw, axis=-1, keepdims=True)
            new_sw = jnp.where(
                state.model.active[:, None] & (norm > 1e-8),
                new_sw / jnp.maximum(norm, 1e-8),
                state.model.skin_weights,
            )
            model = model._replace(skin_weights=new_sw)

        # ---- mask pruning phase (reference on_after_backward):
        step = state.step
        in_seg_phase = (step >= opts.remove_seg_start) & (
            step < opts.remove_seg_end
        )
        cam0 = index_camera(batch["cameras"], 0)
        posed = jax.lax.stop_gradient(aux["posed_xyz"])

        def seg_signal(_):
            keypoints = batch.get("keypoints") if articulated else None
            return points_outside_mask(
                cam0, posed, batch["mask"][0], keypoints=keypoints,
                dilate=articulated, active=model.active,
            )

        def no_signal(_):
            return jnp.zeros((n,), bool)

        # lax.cond skips the projection/dilation work outside the seg phase
        outside = jax.lax.cond(in_seg_phase, seg_signal, no_signal, None)
        if articulated:
            # distance-to-skeleton prune every 100 steps after the seg phase
            # (reference hand_dynamic.py:209-217)
            do_far = (step % 100 == 0) & (step >= opts.remove_seg_end)

            def far_signal(_):
                kp = batch["keypoints"]
                dist = jnp.mean(
                    jnp.linalg.norm(
                        posed[:, None, :] - kp[None, :, :], axis=-1
                    ),
                    axis=1,
                )
                return (dist > opts.skeleton_dist_threshold) & model.active

            far = jax.lax.cond(
                do_far & ~in_seg_phase, far_signal, no_signal, None
            )
            outside = outside | far

        do_prune = jnp.any(outside)
        new_active = jnp.where(do_prune, model.active & ~outside, model.active)
        new_opt = jax.lax.cond(
            do_prune,
            lambda o: optim_mod.reset_moments_rows(o, outside),
            lambda o: o,
            new_opt,
        )
        if new_skin_opt is not None:
            new_skin_opt = jax.lax.cond(
                do_prune,
                lambda o: optim_mod.array_reset_rows(o, outside),
                lambda o: o,
                new_skin_opt,
            )
        model = model._replace(active=new_active)

        # ---- densification stats (skipped on mask-prune steps, matching
        # the reference density_update if/else, gaussian_utils.py:451-502)
        in_densify = step < opts.densify_until_step
        acc = jnp.logical_and(~do_prune, in_densify)

        def add_stats(stats):
            def one(s, i):
                return densify_mod.accumulate_stats(
                    s, g_m2d[i], aux["radii"][i], width, height
                )
            return jax.lax.fori_loop(
                0, v, lambda i, s: one(s, i), stats
            )

        new_stats = jax.lax.cond(acc, add_stats, lambda s: s, state.stats)

        psnr_val = loss_mod.psnr(aux["renders"][0], batch["rgb"][0])
        metrics = dict(
            loss=loss,
            psnr=psnr_val,
            num_active=jnp.sum(new_active),
            mask_pruned=jnp.sum(outside),
            pair_overflow=jnp.max(aux["overflow"][..., 0]),
            pair_overflow_far=jnp.max(aux["overflow"][..., 1]),
            max_radius=jnp.max(aux["radii"]),
        )
        for k, val in aux["parts"].items():
            metrics[f"loss/{k}"] = jnp.mean(val)

        new_state = TrainState(
            model=model,
            opt=new_opt,
            stats=new_stats,
            step=step + 1,
            rng=state.rng,
            mask_pruned_flag=do_prune,
            skin_opt=new_skin_opt,
        )
        return new_state, metrics

    def train_step(state: TrainState, batch):
        return _train_step(state, batch, voxel_grid)

    # AOT hooks: bench.py compiles via _jitted.lower(state, batch,
    # *_extra_args).compile() so the executable's memory_analysis() can
    # report peak HBM (runtime memory_stats() returns nothing through the
    # tunneled platform), then times the compiled callable directly.
    train_step._jitted = _train_step
    train_step._extra_args = (voxel_grid,)
    return train_step


def make_densify_step(cfg: ExperimentConfig, extent: float):
    opts = cfg.model

    @jax.jit
    def densify_step(state: TrainState):
        rng, sub = jax.random.split(state.rng)
        use_size = state.step > opts.opacity_reset_interval
        model, opt, stats, info = densify_mod.densify_and_prune(
            state.model, state.opt, state.stats, opts, extent, sub,
            use_size_threshold=use_size,
        )
        skin_opt = state.skin_opt
        if skin_opt is not None:
            # freshly written / killed slots are exactly the activity flips
            # (children land in free slots) — same policy as the main opt
            skin_opt = optim_mod.array_reset_rows(
                skin_opt, model.active != state.model.active
            )
        return state._replace(
            model=model, opt=opt, stats=stats, rng=rng, skin_opt=skin_opt
        ), info

    @jax.jit
    def opacity_reset_step(state: TrainState):
        model, opt = densify_mod.reset_opacity(state.model, state.opt)
        return state._replace(model=model, opt=opt)

    return densify_step, opacity_reset_step


def make_eval_step(cfg: ExperimentConfig, articulated: bool,
                   voxel_grid: Optional[VoxelGrid] = None,
                   lpips_params: Optional[dict] = None):
    """Jitted single-view render + metrics for validation loops.

    lpips_params: when provided, a real LPIPS metric is reported at every
    validation (reference base.py:149 computes it unconditionally)."""
    opts = cfg.model
    raster_cfg = make_raster_config(cfg)

    # voxel grid as a traced arg, not a closure constant (see _train_step)
    @jax.jit
    def _eval_step(model: GaussianModel, cam: Camera, rgb, mask, bg,
                   bone_tf, vg: Optional[VoxelGrid]):
        skin_w = resolve_skin_weights(model, vg)
        posed_xyz, posed_cov, tf = forward_gaussians(
            model.params, model.active, skin_w, bone_tf, opts
        )
        out = render_gaussians(
            posed_xyz, posed_cov, model.params.xyz, get_features(model.params),
            get_opacity(model.params), cam, bg, sh_degree=opts.sh_degree,
            tf=tf, active=model.active, config=raster_cfg,
        )
        render = out.render * mask
        gt = rgb * mask
        metrics = dict(
            render=out.render,
            psnr=loss_mod.psnr(render, gt),
            ssim=loss_mod.ssim(render, gt),
        )
        if lpips_params is not None:
            from manus_tpu.train.lpips import lpips_distance

            metrics["lpips"] = lpips_distance(lpips_params, render, gt)
        else:
            metrics["lpips"] = jnp.asarray(0.0)
        # posed positions for the validation PLY dumps (base.py:271-290)
        metrics["posed_xyz"] = jax.lax.stop_gradient(posed_xyz)
        # pair-budget overflow diagnostic: surfaced in val_results.csv so
        # raster.pair_budget_factor tuning is a config change, not a probe
        metrics["pair_overflow"] = out.overflow
        metrics["pair_overflow_far"] = out.overflow_far
        return metrics

    def eval_step(model, cam, rgb, mask, bg, bone_tf=None):
        return _eval_step(model, cam, rgb, mask, bg, bone_tf, voxel_grid)

    return eval_step
