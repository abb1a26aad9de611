"""Composite rendering + contact estimation tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from manus_tpu.config import composite_config
from manus_tpu.data.synthetic import build_synthetic_dynamic, gt_object_gaussians
from manus_tpu.data.voxel import build_voxel_grid, visualize_skin_weights
from manus_tpu.models.gaussians import GaussianOpts, init_gaussian_model
from manus_tpu.ops import contacts as contacts_mod
from manus_tpu.ops.knn import (
    knn_self_distances,
    knn_self_distances_host,
    nearest_neighbor,
)
from manus_tpu.ops.rasterizer.api import RasterConfig
from manus_tpu.ops.skinning import bone_deformation_transforms
from manus_tpu.train.composite import CompositeModels, make_composite_render
from manus_tpu.utils.camera import index_camera


def test_knn_matches_bruteforce():
    rng = np.random.RandomState(0)
    a = rng.randn(200, 3).astype(np.float32)
    b = rng.randn(300, 3).astype(np.float32)
    dist, idx = nearest_neighbor(jnp.asarray(a), jnp.asarray(b))
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d2.argmin(1))
    np.testing.assert_allclose(np.asarray(dist), np.sqrt(d2.min(1)), atol=1e-5)

    self_d = knn_self_distances(jnp.asarray(a), k=3)
    d2s = d2 = ((a[:, None] - a[None]) ** 2).sum(-1)
    np.fill_diagonal(d2s, np.inf)
    expect = np.sort(d2s, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(np.asarray(self_d), expect, rtol=1e-4)

    # the host (init-time) path must agree with the device path
    host_d = knn_self_distances_host(a, k=3)
    np.testing.assert_allclose(host_d, expect, rtol=1e-4)
    # blockwise path: block smaller than N exercises the loop
    host_b = knn_self_distances_host(a, k=3, block=64)
    np.testing.assert_allclose(host_b, expect, rtol=1e-4)


def test_contact_map_threshold():
    pt1 = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
    pt2 = jnp.asarray([[0.002, 0, 0]])
    d01, idx, colors = contacts_mod.contact_map(pt1, pt2, cmap_type="gray")
    assert abs(float(d01[0]) - 0.5) < 1e-4  # 2mm of 4mm threshold
    assert float(d01[1]) == 0.0  # 1m away -> no contact
    assert colors.shape == (2, 3)


def test_contact_iou_f1():
    pred = jnp.asarray([[1, 1, 0, 0]])
    gt = jnp.asarray([[1, 0, 1, 0]])
    iou, f1 = contacts_mod.contact_iou_f1(pred, gt)
    assert abs(float(iou) - 1 / 3) < 1e-6
    assert abs(float(f1) - 0.5) < 1e-6


def test_voxel_grid_synthetic_fallback():
    kp = np.random.RandomState(0).uniform(-0.1, 0.1, (21, 3)).astype(np.float32)
    grid = build_voxel_grid(kp, mano=None, res=16, num_bones=20)
    w = np.asarray(grid.weights)
    assert w.shape[-1] == 21  # 20 bones + background
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)


def test_composite_render_results_mode(tmp_path):
    ds = build_synthetic_dynamic(
        width=64, height=64, num_cameras=2, num_frames=2,
        samples_per_bone_gt=15, seed=0, use_reference_skeleton=False,
    )
    nb = ds.bones_rest.num_bones
    # hand model from GT
    hand = init_gaussian_model(
        ds.gt["means"], ds.gt["colors"], 1024, skin_weights=ds.gt["skin"]
    )
    # object: a small blob next to the hand
    obj_gt = gt_object_gaussians(100, seed=3)
    obj = init_gaussian_model(
        obj_gt["means"] * 0.1, obj_gt["colors"], 256
    )
    models = CompositeModels(hand=hand, obj=obj)
    cfg = composite_config()
    raster_cfg = RasterConfig(backend="xla", tg_max=64,
                              max_pairs_per_tile=512, chunk=32)
    render_fn = make_composite_render(cfg, raster_cfg, "results")
    bone_tf = bone_deformation_transforms(
        ds.bones_posed[0].transforms, ds.bones_rest.transforms
    )
    cam = index_camera(ds.cameras, 0)
    acc = jnp.zeros(hand.capacity)
    aux_colors = jnp.asarray(
        visualize_skin_weights(np.asarray(hand.skin_weights))
    )
    render, new_acc, h_d01 = render_fn(
        models, bone_tf, cam, cam, jnp.zeros(3), acc, aux_colors
    )
    # results mode: 4 panels side by side
    assert render.shape == (64, 64 * 4, 3)
    assert np.all(np.isfinite(np.asarray(render)))
    # contact accumulation monotone
    render2, acc2, _ = render_fn(
        models, bone_tf, cam, cam, jnp.zeros(3), new_acc, aux_colors
    )
    assert float(jnp.sum(acc2)) >= float(jnp.sum(new_acc))


def test_composite_finetune_recovers_perturbation():
    """VERDICT r1 item 4 (reference composite.py:27-48): optimize_hand
    unfreezes the hand model inside the composite step; photometric loss
    on a held-out frame falls after fine-tuning. GT is rendered from the
    unperturbed models, then the hand is perturbed and fine-tuned back."""
    from manus_tpu.config import composite_config
    from manus_tpu.train.composite import make_composite_finetune_step
    from manus_tpu.train.workloads import init_train_state

    ds = build_synthetic_dynamic(
        width=64, height=64, num_cameras=3, num_frames=3,
        samples_per_bone_gt=15, seed=0, use_reference_skeleton=False,
    )
    hand_gt = init_gaussian_model(
        ds.gt["means"], ds.gt["colors"], 512, skin_weights=ds.gt["skin"]
    )
    obj_gt = gt_object_gaussians(80, seed=3)
    obj = init_gaussian_model(obj_gt["means"] * 0.1, obj_gt["colors"], 128)

    cfg = composite_config()
    cfg.finetune_steps = 60
    raster_cfg = RasterConfig(backend="xla", tg_max=64,
                              max_pairs_per_tile=512, chunk=32)
    ft_step = make_composite_finetune_step(cfg, raster_cfg, "hand")

    def make_batch(f, v, rgb=None):
        return dict(
            rgb=jnp.zeros((64, 64, 3)) if rgb is None else rgb,
            mask=jnp.ones((64, 64, 1)),
            camera=index_camera(ds.cameras, v),
            bg=jnp.zeros(3),
            bone_tf=bone_deformation_transforms(
                ds.bones_posed[f].transforms, ds.bones_rest.transforms
            ),
        )

    # pseudo-GT: render the composite scene with unperturbed models
    gts = {}
    from manus_tpu.train.composite import CompositeModels, make_composite_render

    render_fn = make_composite_render(cfg, raster_cfg, "results")
    aux = jnp.zeros((hand_gt.capacity, 3))
    acc = jnp.zeros(hand_gt.capacity)
    for f in range(3):
        for v in range(3):
            r, _, _ = render_fn(
                CompositeModels(hand=hand_gt, obj=obj),
                make_batch(f, v)["bone_tf"], index_camera(ds.cameras, v),
                index_camera(ds.cameras, v), jnp.zeros(3), acc, aux,
            )
            gts[(f, v)] = r[:, :64]  # rgb panel only

    # perturb hand positions + colors
    rng = np.random.RandomState(1)
    pert = hand_gt.params._replace(
        xyz=hand_gt.params.xyz
        + jnp.asarray(rng.normal(0, 0.01, (512, 3)), jnp.float32),
    )
    hand_pert = hand_gt._replace(params=pert)
    state = init_train_state(hand_pert)

    def heldout_loss(model):
        losses = []
        for v in range(3):
            b = make_batch(2, v, rgb=gts[(2, v)])
            _, m = ft_step(init_train_state(model), obj, b)
            losses.append(float(m["loss"]))
        return np.mean(losses)

    before = heldout_loss(hand_pert)
    for it in range(cfg.finetune_steps):
        f, v = rng.randint(2), rng.randint(3)  # train on frames 0-1 only
        state, m = ft_step(state, obj, make_batch(f, v, rgb=gts[(f, v)]))
    after = heldout_loss(state.model)
    assert after < before * 0.7, f"held-out loss {before} -> {after}"
