"""Scene compositing + contact capture: hand and object models rendered
jointly, with per-gaussian contact distances accumulated across frames.

Functional re-design of the reference composite module
(/root/reference/src/modules/composite.py): both trained models are frozen
pytrees; `composite_render` concatenates their gaussian clouds (padded
capacities simply concatenate, active masks included) and produces the
reference's render layouts:

  results:     [rgb | hand contact | object contact | accumulated contact]
  gt_eval:     [hand contact | accumulated contact] from the canonical cam
  acc_gt_eval: [skin-weight colors | precomputed accumulated contact]
  nocs:        [rgb | nocs hand | nocs object]

The brute-force Taichi NN kernel becomes the blockwise MXU distance op
(ops/contacts.py); accumulation stays a device-side [N_hand] array.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from manus_tpu.config import ExperimentConfig
from manus_tpu.models.gaussians import (
    GaussianModel,
    GaussianOpts,
    get_covariance,
    get_features,
    get_opacity,
    get_scaling,
)
from manus_tpu.ops import contacts as contacts_mod
from manus_tpu.ops.rasterizer.api import (
    RasterConfig,
    calculate_colors_from_sh,
    render_gaussians,
)
from manus_tpu.train.workloads import VoxelGrid, forward_gaussians, resolve_skin_weights
from manus_tpu.utils.colormap import apply_colormap


class CompositeModels(NamedTuple):
    """Array-only pytree: model hyperparameters are closed over statically
    by make_composite_render."""

    hand: GaussianModel
    obj: GaussianModel
    voxel_grid: Optional[VoxelGrid] = None


def make_composite_render(cfg: ExperimentConfig, raster_cfg: RasterConfig,
                          mode: str, cmap_type: str = "magma",
                          alpha: float = 0.3,
                          hand_opts: GaussianOpts = GaussianOpts(),
                          obj_opts: GaussianOpts = GaussianOpts()):
    """Build the jitted composite renderer for one contact_render_type."""

    def forward(models: CompositeModels, bone_tf):
        skin_w = resolve_skin_weights(models.hand, models.voxel_grid)
        h_xyz, h_cov, h_tf = forward_gaussians(
            models.hand.params, models.hand.active, skin_w, bone_tf,
            hand_opts,
        )
        o_xyz, o_cov, _ = forward_gaussians(
            models.obj.params, models.obj.active, None, None, obj_opts
        )
        o_tf = jnp.broadcast_to(
            jnp.eye(4, dtype=h_tf.dtype), (o_xyz.shape[0], 4, 4)
        )
        return (h_xyz, h_cov, h_tf), (o_xyz, o_cov, o_tf)

    def render_cloud(xyz, cov, cano_xyz, feats, opac, active, cam, bg, tf,
                     colors_precomp):
        return render_gaussians(
            xyz, cov, cano_xyz, feats, opac, cam, bg,
            colors_precomp=colors_precomp, sh_degree=3, tf=tf, active=active,
            config=raster_cfg,
        ).render

    @jax.jit
    def composite_render(models: CompositeModels, bone_tf, camera,
                         cano_camera, bg, acc_dist, aux_colors):
        # aux_colors [N_hand, 3]: skin-weight colors for acc_gt_eval,
        # NOCS colors (ops/contacts.get_nocs_colors at hand xyz) for nocs.
        (h_xyz, h_cov, h_tf), (o_xyz, o_cov, o_tf) = forward(models, bone_tf)
        hp, op_ = models.hand.params, models.obj.params
        h_act, o_act = models.hand.active, models.obj.active

        h_feats, o_feats = get_features(hp), get_features(op_)
        h_opac, o_opac = get_opacity(hp)[:, 0], get_opacity(op_)[:, 0]

        # hand <-> object nearest distances over active slots only
        h_d01, _, h_cmap = contacts_mod.contact_map(
            h_xyz, o_xyz, pt1_valid=h_act, pt2_valid=o_act,
            cmap_type=cmap_type,
        )
        o_d01, o_idx, o_cmap = contacts_mod.contact_map(
            o_xyz, h_xyz, pt1_valid=o_act, pt2_valid=h_act,
            cmap_type=cmap_type,
        )

        panels = []
        if mode in ("results", "nocs"):
            # full scene RGB
            xyz = jnp.concatenate([h_xyz, o_xyz])
            cov = jnp.concatenate([h_cov, o_cov])
            cano = jnp.concatenate([hp.xyz, op_.xyz])
            feats = jnp.concatenate([h_feats, o_feats])
            opac = jnp.concatenate([h_opac, o_opac])
            act = jnp.concatenate([h_act, o_act])
            tf = jnp.concatenate([h_tf, o_tf])
            panels.append(
                render_cloud(xyz, cov, cano, feats, opac, act, camera, bg,
                             tf, None)
            )

        h_rgb = calculate_colors_from_sh(hp.xyz, h_feats, hp.xyz,
                                         cano_camera, 3, h_tf)
        o_rgb = calculate_colors_from_sh(o_xyz, o_feats, o_xyz, camera, 3,
                                         None)
        h_cov_cano = get_covariance(hp, isotropic=hand_opts.isotropic_scaling)
        o_cov_cano = get_covariance(op_, isotropic=obj_opts.isotropic_scaling)

        if mode in ("results", "gt_eval"):
            # hand-only contact, canonical pose + canonical camera
            blend = h_rgb * alpha + (1 - alpha) * h_cmap
            panels.append(
                render_cloud(hp.xyz, h_cov_cano, hp.xyz, h_feats, h_opac,
                             h_act, cano_camera, bg, None, blend)
            )
        if mode == "results":
            # object-only contact in the posed scene
            blend = o_rgb * alpha + (1 - alpha) * o_cmap
            panels.append(
                render_cloud(o_xyz, o_cov_cano, o_xyz, o_feats, o_opac,
                             o_act, camera, bg, None, blend)
            )
        if mode in ("results", "gt_eval"):
            # accumulated contact (running sum over frames)
            new_acc = acc_dist + h_d01
            acc_cmap = apply_colormap(jnp.clip(new_acc, 0, 1), cmap_type)
            blend = h_rgb * alpha + (1 - alpha) * acc_cmap
            panels.append(
                render_cloud(hp.xyz, h_cov_cano, hp.xyz, h_feats, h_opac,
                             h_act, cano_camera, bg, None, blend)
            )
        elif mode == "acc_gt_eval":
            new_acc = acc_dist
            sk = render_cloud(h_xyz, h_cov, hp.xyz, h_feats, h_opac, h_act,
                              camera, bg, h_tf, aux_colors)
            acc_cmap = apply_colormap(jnp.clip(acc_dist, 0, 1), "gray")
            acc_panel = render_cloud(h_xyz, h_cov, hp.xyz, h_feats, h_opac,
                                     h_act, camera, bg, h_tf, acc_cmap)
            panels = [sk, acc_panel]
        elif mode == "nocs":
            new_acc = acc_dist + h_d01
            nocs_h = jnp.where((h_d01 > 0)[:, None], aux_colors, 0.0)
            panels.append(
                render_cloud(hp.xyz, h_cov_cano, hp.xyz, h_feats, h_opac,
                             h_act, cano_camera, bg, None, nocs_h)
            )
            nocs_o = jnp.where(
                (o_d01 > 0)[:, None], aux_colors[o_idx], 0.0
            )
            panels.append(
                render_cloud(o_xyz, o_cov_cano, o_xyz, o_feats, o_opac,
                             o_act, camera, bg, None, nocs_o)
            )
        else:
            new_acc = acc_dist + h_d01

        render = jnp.concatenate(panels, axis=1)  # side by side
        return render, new_acc, h_d01

    return composite_render


def make_composite_finetune_step(
    cfg: ExperimentConfig,
    raster_cfg: RasterConfig,
    optimize: str,  # "hand" | "object"
    voxel_grid: Optional[VoxelGrid] = None,
    hand_opts: GaussianOpts = GaussianOpts(),
    obj_opts: GaussianOpts = GaussianOpts(),
):
    """Composite fine-tuning step (reference composite.py:27-35 + the
    manual-optimization loop): one of the two loaded models is unfrozen
    and continues photometric optimization on the FULL composite render;
    the other stays a frozen pytree.

    Returns a jitted (state, frozen_model, batch) -> (state, metrics)
    where `state` is a workloads.TrainState holding the trainable model
    and its masked-Adam state, and `frozen_model` is the other cloud.
    batch: rgb [H,W,3], mask [H,W,1], camera (single), bg [3],
    bone_tf [B(+1),4,4].
    """
    from manus_tpu.train import optim as optim_mod
    from manus_tpu.utils import losses as loss_mod

    assert optimize in ("hand", "object")
    opts = cfg.model
    loss_names = tuple(n for n in cfg.loss.losses if n != "lpips_loss")
    loss_weights = tuple(
        w for n, w in zip(cfg.loss.losses, cfg.loss.loss_weight)
        if n != "lpips_loss"
    )

    # vg as a traced arg: closure constants land in the compile payload
    @jax.jit
    def _step(state, frozen: GaussianModel, batch, vg):
        def loss_fn(params):
            train_model = state.model._replace(params=params)
            hand = train_model if optimize == "hand" else frozen
            obj = frozen if optimize == "hand" else train_model
            skin_w = resolve_skin_weights(hand, vg)
            h_xyz, h_cov, h_tf = forward_gaussians(
                hand.params, hand.active, skin_w, batch["bone_tf"], hand_opts
            )
            o_xyz, o_cov, _ = forward_gaussians(
                obj.params, obj.active, None, None, obj_opts
            )
            o_tf = jnp.broadcast_to(
                jnp.eye(4, dtype=h_tf.dtype), (o_xyz.shape[0], 4, 4)
            )
            hp, op_ = hand.params, obj.params
            out = render_gaussians(
                jnp.concatenate([h_xyz, o_xyz]),
                jnp.concatenate([h_cov, o_cov]),
                jnp.concatenate([hp.xyz, op_.xyz]),
                jnp.concatenate([get_features(hp), get_features(op_)]),
                jnp.concatenate([get_opacity(hp)[:, 0], get_opacity(op_)[:, 0]]),
                batch["camera"], batch["bg"],
                sh_degree=3,
                tf=jnp.concatenate([h_tf, o_tf]),
                active=jnp.concatenate([hand.active, obj.active]),
                config=raster_cfg,
            )
            scaling = get_scaling(
                params,
                hand_opts.isotropic_scaling if optimize == "hand"
                else obj_opts.isotropic_scaling,
            )
            total, parts = loss_mod.compute_losses(
                out.render, batch["rgb"], scaling, train_model.active,
                loss_names, loss_weights, opts.condition_number,
            )
            return total, (out.render, parts)

        (loss, (render, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.model.params)
        lrs = optim_mod.group_learning_rates(opts, state.step)
        new_params, new_opt = optim_mod.adam_update(
            state.model.params, grads, state.opt, lrs, state.model.active
        )
        metrics = dict(
            loss=loss,
            psnr=loss_mod.psnr(render * batch["mask"],
                               batch["rgb"] * batch["mask"]),
        )
        new_state = state._replace(
            model=state.model._replace(params=new_params),
            opt=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    def step(state, frozen, batch):
        return _step(state, frozen, batch, voxel_grid)

    return step
