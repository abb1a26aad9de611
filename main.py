"""CLI driver: train / test the object, hand and composite workloads.

Mirrors the reference entrypoint (/root/reference/main.py): pick an
experiment config by name, apply dotted overrides, snapshot the resolved
config into the run directory, resolve checkpoints ("best" supported),
seed, then run.

  python main.py --config-name OBJ_GAUSSIAN trainer.max_steps=2000 \
      dataset.kind=synthetic trainer.exp_name=run1
  python main.py --config-name HAND_GAUSSIAN dataset.kind=brics_dynamic \
      dataset.root=/data/subject0 ...
  python main.py --config-name COMPOSITE hand_ckpt_dir=... object_ckpt_dir=...
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_dataset(cfg, split: str):
    d = cfg.dataset
    if d.kind == "synthetic":
        from manus_tpu.data.synthetic import (
            build_synthetic_dynamic,
            build_synthetic_static,
        )

        if cfg.workload == "object":
            return build_synthetic_static(
                width=d.width, height=d.height, num_cameras=d.num_cameras,
                bg_color=d.bg_color,
            )
        return build_synthetic_dynamic(
            width=d.width, height=d.height, num_cameras=d.num_cameras,
            num_frames=max(d.num_frames, 2), bg_color=d.bg_color,
        )
    if d.kind == "brics_static":
        from manus_tpu.data.brics import BricsStaticDataset

        return BricsStaticDataset(
            root_dir=d.root, params_dir=os.path.join(d.root, "calib"),
            width=d.width, height=d.height, split=split, bg_color=d.bg_color,
        )
    if d.kind == "brics_dynamic":
        from manus_tpu.data.brics import BricsDynamicDataset

        return BricsDynamicDataset(
            root_dir=d.root, width=d.width, height=d.height, split=split,
            bg_color=d.bg_color, num_time_steps=d.num_frames,
            split_ratio=d.split_ratio,
        )
    raise ValueError(f"unknown dataset kind {d.kind}")


def build_hand_pieces(cfg, dataset):
    """Init model + optional voxel skinning grid for the hand workload."""
    import jax.numpy as jnp

    from manus_tpu.data.voxel import build_voxel_grid, load_mano_rest
    from manus_tpu.models.gaussians import init_gaussian_model
    from manus_tpu.ops.knn import knn_indices

    pts, cols = dataset.sample_gaussians_on_bones(cfg.dataset.sample_size)
    voxel_grid = None
    skin = None
    if cfg.skin_init == "mano_init_voxel":
        kp = np.asarray(dataset.bones_rest.keypoints())
        voxel_grid = build_voxel_grid(
            kp, mano=load_mano_rest(), res=cfg.dataset.grid_res,
            ratio=cfg.dataset.grid_size, offset=cfg.dataset.grid_offset,
            num_bones=dataset.bones_rest.num_bones,
        )
    else:  # mano_init_points
        mano = load_mano_rest()
        if mano is not None:
            from manus_tpu.data.voxel import MANO_TO_OURS

            idx = np.asarray(
                knn_indices(jnp.asarray(pts), jnp.asarray(mano["verts"]), 20)
            )
            w = mano["weights"][:, MANO_TO_OURS]
            skin = w[idx].mean(axis=1)
            skin = skin / np.maximum(skin.sum(-1, keepdims=True), 1e-8)
        else:
            # nearest-bone hard weights fallback
            skin = np.ones((pts.shape[0], dataset.bones_rest.num_bones))
            skin /= skin.sum(-1, keepdims=True)
    model = init_gaussian_model(
        pts, cols, cfg.capacity, opts=cfg.model, skin_weights=skin
    )
    return model, voxel_grid


def run_train(cfg, out_dir):
    from manus_tpu.models.gaussians import init_gaussian_model
    from manus_tpu.train.trainer import Trainer

    dataset = build_dataset(cfg, "train")
    # Held-out validation split (reference: static cameras [:2] never train;
    # dynamic: the frame-split tail). Synthetic datasets are split in-memory.
    if cfg.dataset.kind == "synthetic":
        if cfg.workload == "object":
            from manus_tpu.data.synthetic import split_synthetic_static

            dataset, val_dataset = split_synthetic_static(dataset)
        else:
            from manus_tpu.data.synthetic import split_synthetic_dynamic

            dataset, val_dataset = split_synthetic_dynamic(
                dataset, cfg.dataset.split_ratio
            )
    else:
        val_dataset = build_dataset(cfg, "val")
    if cfg.workload == "object":
        pts, cols = dataset.sample_gaussians(cfg.dataset.sample_size)
        model = init_gaussian_model(pts, cols, cfg.capacity, opts=cfg.model)
        voxel_grid = None
        articulated = False
    else:
        model, voxel_grid = build_hand_pieces(cfg, dataset)
        articulated = True

    tr = Trainer(cfg, dataset, model, articulated, voxel_grid,
                 out_dir=out_dir, val_dataset=val_dataset)
    if cfg.checkpoint:
        path, n_bad = tr.load(cfg.checkpoint)
        print(f"resumed from {path} (scrubbed {n_bad} NaN slots)")
    tr.fit()
    psnr = tr.final_val_psnr(cfg.trainer.max_steps)
    print(f"final val psnr: {psnr:.2f}")
    return tr


def run_composite(cfg, out_dir):
    import cv2
    import jax.numpy as jnp


    from manus_tpu.train import checkpoint as ckpt_mod
    from manus_tpu.train.composite import CompositeModels, make_composite_render
    from manus_tpu.train.workloads import make_raster_config, resolve_skin_weights
    from manus_tpu.data.voxel import visualize_skin_weights
    from manus_tpu.ops.skinning import bone_deformation_transforms
    from manus_tpu.utils.camera import index_camera

    dataset = build_dataset(cfg, "test")

    def load_model(ckpt_dir):
        path = ckpt_mod.find_best_checkpoint(ckpt_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        model, voxel_grid, _ = ckpt_mod.load_gaussian_model(path)
        print(f"loaded {path} ({int(model.num_active())} gaussians)")
        return model, voxel_grid

    hand, hand_vg = load_model(cfg.hand_ckpt_dir)
    obj, _ = load_model(cfg.object_ckpt_dir)

    raster_cfg = make_raster_config(cfg)

    # optional composite fine-tuning (reference composite.py:27-35):
    # unfreeze one model and continue photometric optimization on the
    # full composite render before contact capture.
    if cfg.optimize_hand or cfg.optimize_object:
        from manus_tpu.train.composite import make_composite_finetune_step
        from manus_tpu.train.workloads import init_train_state

        optimize = "hand" if cfg.optimize_hand else "object"
        train_model = hand if optimize == "hand" else obj
        frozen = obj if optimize == "hand" else hand
        state = init_train_state(train_model, seed=cfg.trainer.seed)
        ft_step = make_composite_finetune_step(
            cfg, raster_cfg, optimize, voxel_grid=hand_vg
        )
        rng = np.random.RandomState(cfg.trainer.seed)
        for it in range(cfg.finetune_steps):
            f = rng.randint(dataset.num_frames)
            v = rng.randint(dataset.num_views)
            raw = dataset.get_batch(f, np.asarray([v]))
            batch = dict(
                rgb=jnp.asarray(raw["rgb"][0], jnp.float32),
                mask=jnp.asarray(raw["mask"][0], jnp.float32),
                camera=index_camera(dataset.cameras, v),
                bg=jnp.zeros(3),
                bone_tf=bone_deformation_transforms(
                    dataset.bones_posed[f].transforms,
                    dataset.bones_rest.transforms,
                    append_identity=hand_vg is not None,
                ),
            )
            state, m = ft_step(state, frozen, batch)
            if it % 50 == 0 or it == cfg.finetune_steps - 1:
                print(
                    f"[finetune:{optimize}] step {it}: "
                    f"loss={float(m['loss']):.5f} psnr={float(m['psnr']):.2f}"
                )
        if optimize == "hand":
            hand = state.model
        else:
            obj = state.model

    models = CompositeModels(hand=hand, obj=obj, voxel_grid=hand_vg)
    mode = cfg.contact_render_type
    render_fn = make_composite_render(cfg, raster_cfg, mode)

    out_imgs = os.path.join(out_dir, "results", "eval_results", "ours")
    os.makedirs(out_imgs, exist_ok=True)
    acc = jnp.zeros(hand.capacity)
    skin_w = resolve_skin_weights(hand, hand_vg)
    aux_colors = jnp.asarray(
        visualize_skin_weights(np.asarray(skin_w))
        if skin_w is not None
        else np.zeros((hand.capacity, 3), np.float32)
    )
    bg = jnp.zeros(3)
    frames = []
    # per-frame test cameras (reference TestDataset: one camera-path
    # entry per frame; acc_gt_eval sweeps the calib cameras instead,
    # which our dataset cameras already are). Falls back to cycling the
    # dataset cameras when no path file exists.
    path_cams = None
    if mode != "acc_gt_eval" and cfg.camera_path and os.path.exists(
        cfg.camera_path
    ):
        from manus_tpu.utils.io import load_camera_path

        path_cams = load_camera_path(
            cfg.camera_path, cfg.dataset.width, cfg.dataset.height
        )
        print(f"composite: sweeping {len(path_cams)} path cameras")
    cano_cam = index_camera(dataset.cameras, 0)
    # gt_eval selects the TAIL of the sequence (reference TestDataset
    # brics_dynamic.py:564-567: frame_nums[-250:]); other modes sweep all
    frame_list = list(range(dataset.num_frames))
    if mode == "gt_eval":
        frame_list = frame_list[-250:]
    for f in frame_list:
        bone_tf = bone_deformation_transforms(
            dataset.bones_posed[f].transforms, dataset.bones_rest.transforms,
            append_identity=hand_vg is not None,
        )
        if path_cams is not None:
            cam = path_cams[f % len(path_cams)]
        else:
            cam = index_camera(dataset.cameras, f % dataset.num_views)
        render, acc, _ = render_fn(
            models, bone_tf, cam, cano_cam, bg, acc, aux_colors
        )
        img = np.clip(np.asarray(render), 0, 1)
        frames.append((img * 255).astype(np.uint8))
        cv2.imwrite(
            os.path.join(out_imgs, f"{f:04d}.png"),
            cv2.cvtColor(frames[-1], cv2.COLOR_RGB2BGR),
        )
    np.save(os.path.join(out_imgs, "acc_contacts.npy"), np.asarray(acc))
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(
        os.path.join(out_imgs, f"{mode}.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h),
    )
    for fr in frames:
        vw.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
    vw.release()
    print(f"composite: wrote {len(frames)} frames to {out_imgs}")


def run_render_path(cfg, out_dir, video_name="novel_path.mp4",
                    canonical=False):
    """Novel-view rendering along a Blender camera path (reference
    TestDataset camera-path mode, brics_static.py:200-258 /
    brics_dynamic.py:485-696): load a trained model, sweep the pkl path
    cameras, animate the hand with reference skeleton poses if present.

    canonical=True renders every frame at the REST pose (reference
    test_on_canonical_pose, brics_dynamic.py:608-611)."""
    import jax.numpy as jnp

    from manus_tpu.data.synthetic import load_reference_skeleton
    from manus_tpu.models.gaussians import (
        get_covariance, get_features, get_opacity,
    )
    from manus_tpu.ops.rasterizer.api import render_gaussians
    from manus_tpu.ops.skinning import (
        bone_deformation_transforms, skin_gaussians,
    )
    from manus_tpu.train import checkpoint as ckpt_mod
    from manus_tpu.train.workloads import make_raster_config, resolve_skin_weights
    from manus_tpu.utils.io import dump_video, load_camera_path

    path = ckpt_mod.find_best_checkpoint(cfg.render_ckpt_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoint in {cfg.render_ckpt_dir}")
    model, voxel_grid, _ = ckpt_mod.load_gaussian_model(path)
    print(f"loaded {path} ({int(model.num_active())} gaussians)")

    cams = load_camera_path(
        cfg.camera_path, cfg.dataset.width, cfg.dataset.height
    )
    skel = load_reference_skeleton() if cfg.workload == "hand" else None
    raster_cfg = make_raster_config(cfg)
    import jax

    # vg as a traced arg: closure constants land in the compile payload
    # (a brick table is ~0.6GB at 96^3)
    @jax.jit
    def _render_one(model, cam_tree, bone_tf, vg):
        params = model.params
        skin_w = resolve_skin_weights(model, vg)
        cov = get_covariance(params, isotropic=cfg.model.isotropic_scaling)
        if bone_tf is not None:
            sk = skin_gaussians(params.xyz, cov, skin_w, bone_tf)
            posed, cov, tf = sk.posed_xyz, sk.posed_cov, sk.tf
        else:
            posed, tf = params.xyz, None
        out = render_gaussians(
            posed, cov, params.xyz, get_features(params),
            get_opacity(params), cam_tree, jnp.zeros(3),
            sh_degree=cfg.model.sh_degree, tf=tf, active=model.active,
            config=raster_cfg,
        )
        return out.render

    def render_one(model, cam_tree, bone_tf):
        return _render_one(model, cam_tree, bone_tf, voxel_grid)

    frames = []
    n = min(cfg.render_frames, len(cams))
    for i in range(n):
        bone_tf = None
        if skel is not None:
            # canonical mode: rest pose for every frame (identity deform)
            fidx = 0 if canonical else i % skel["pose_transforms"].shape[0]
            pose = (
                skel["rest_transforms"] if canonical
                else skel["pose_transforms"][fidx]
            )
            bone_tf = bone_deformation_transforms(
                jnp.asarray(pose),
                jnp.asarray(skel["rest_transforms"]),
                append_identity=voxel_grid is not None,
            )
        frames.append(np.asarray(render_one(model, cams[i], bone_tf)))
    out_path = os.path.join(out_dir, "results", video_name)
    dump_video(frames, out_path, fps=15)
    print(f"wrote {len(frames)} path frames to {out_path}")


def run_test(cfg, out_dir):
    """Test epoch for the object/hand workloads (reference
    base.py:190-307 + TestDataset modes, brics_dynamic.py:485-696):

      - dataset.test_on_train_dataset (or worst_cases): re-render every
        train frame with gt, write pred|gt|diff^2 strips to
        test_train.mp4 + per-frame metrics; worst_cases additionally
        ranks frames ascending by PSNR into worst_cases.json (the
        reference pose-optimizer's "optimize worst first" input).
      - dataset.test_on_canonical_pose: camera-path sweep at the rest
        pose -> test_cano.mp4.
      - else: novel camera-path sweep -> test_novel.mp4.
    """
    import json

    import jax
    import jax.numpy as jnp

    on_train = cfg.dataset.test_on_train_dataset or cfg.dataset.worst_cases
    if not on_train:
        cano = cfg.dataset.test_on_canonical_pose
        name = "test_cano.mp4" if cano else "test_novel.mp4"
        return run_render_path(cfg, out_dir, video_name=name, canonical=cano)

    from manus_tpu.models.gaussians import (
        get_covariance, get_features, get_opacity,
    )
    from manus_tpu.ops.rasterizer.api import render_gaussians
    from manus_tpu.ops.skinning import (
        bone_deformation_transforms, skin_gaussians,
    )
    from manus_tpu.train import checkpoint as ckpt_mod
    from manus_tpu.train.workloads import make_raster_config, resolve_skin_weights
    from manus_tpu.utils import losses as loss_mod
    from manus_tpu.utils.camera import index_camera
    from manus_tpu.utils.io import concat_images, dump_points, dump_video

    # full train split (reference sets split_ratio = 0, base.py:29-31)
    cfg.dataset.split_ratio = 0.0
    dataset = build_dataset(cfg, "train")
    articulated = cfg.workload == "hand"

    path = ckpt_mod.find_best_checkpoint(cfg.render_ckpt_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoint in {cfg.render_ckpt_dir}")
    model, voxel_grid, _ = ckpt_mod.load_gaussian_model(path)
    print(f"loaded {path} ({int(model.num_active())} gaussians)")
    raster_cfg = make_raster_config(cfg)

    # vg as a traced arg (see run_render_path)
    @jax.jit
    def _render_one(model, cam_tree, bone_tf, vg):
        params = model.params
        cov = get_covariance(params, isotropic=cfg.model.isotropic_scaling)
        if articulated:
            skin_w = resolve_skin_weights(model, vg)
            sk = skin_gaussians(params.xyz, cov, skin_w, bone_tf)
            posed, cov, tf = sk.posed_xyz, sk.posed_cov, sk.tf
        else:
            posed, tf = params.xyz, None
        out = render_gaussians(
            posed, cov, params.xyz, get_features(params),
            get_opacity(params), cam_tree, jnp.zeros(3),
            sh_degree=cfg.model.sh_degree, tf=tf, active=model.active,
            config=raster_cfg,
        )
        return out.render, posed

    def render_one(model, cam_tree, bone_tf):
        return _render_one(model, cam_tree, bone_tf, voxel_grid)

    res_dir = os.path.join(out_dir, "results", "eval_results")
    os.makedirs(res_dir, exist_ok=True)
    frames_list = list(range(0, dataset.num_frames,
                             max(cfg.dataset.frame_sample_rate, 1)))
    strips, records = [], []
    for i, f in enumerate(frames_list):
        v = f % dataset.num_views
        raw = dataset.get_batch(f, np.asarray([v]))
        bone_tf = None
        if articulated:
            bone_tf = bone_deformation_transforms(
                dataset.bones_posed[f].transforms,
                dataset.bones_rest.transforms,
                append_identity=voxel_grid is not None,
            )
        render, posed = render_one(
            model, index_camera(dataset.cameras, v), bone_tf
        )
        pred = np.clip(np.asarray(render), 0, 1)
        gt = np.asarray(raw["rgb"][0], np.float32)
        psnr = float(loss_mod.psnr(jnp.asarray(pred), jnp.asarray(gt)))
        diff = (gt - pred) ** 2  # reference uses squared diff in test strips
        strips.append(concat_images(pred, gt, diff))
        records.append(dict(frame=int(f), view=int(v), psnr=psnr))
        if i == 0:
            gdir = os.path.join(res_dir, "gaussians")
            colors = None
            if articulated:
                from manus_tpu.data.voxel import visualize_skin_weights

                sw = resolve_skin_weights(model, voxel_grid)
                if sw is not None:
                    colors = visualize_skin_weights(np.asarray(sw))[
                        np.asarray(model.active)
                    ]
            dump_points(
                np.asarray(posed)[np.asarray(model.active)],
                os.path.join(gdir, f"test_{f}_posed.ply"), colors,
            )
    dump_video(strips, os.path.join(res_dir, "test_train.mp4"), fps=10)
    mean_psnr = float(np.mean([r["psnr"] for r in records]))
    print(f"test epoch: {len(strips)} frames, mean psnr={mean_psnr:.2f}")
    if cfg.dataset.worst_cases:
        ranked = sorted(records, key=lambda r: r["psnr"])
        with open(os.path.join(res_dir, "worst_cases.json"), "w") as fjson:
            json.dump(ranked, fjson, indent=2)
        print(
            f"worst case: frame {ranked[0]['frame']} "
            f"(psnr={ranked[0]['psnr']:.2f}) -> worst_cases.json"
        )


def main(argv=None):
    from manus_tpu.config import (
        CONFIGS, apply_overrides, load_config_snapshot, save_config,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config-name", required=True,
        help="experiment name (%s) or a run directory / config.json "
        "snapshot to resume from" % "|".join(CONFIGS),
    )
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    if args.config_name in CONFIGS:
        cfg = CONFIGS[args.config_name]()
    elif os.path.exists(args.config_name):
        # resume-from-run-dir (reference --config-path $EXP_DIR
        # --config-name config.yaml, inference_hand.sh:23-25): reload the
        # snapshot, then let overrides refine it
        cfg = load_config_snapshot(args.config_name)
        print(f"resumed config snapshot from {args.config_name}")
    else:
        parser.error(
            f"--config-name must be one of {sorted(CONFIGS)} or an "
            f"existing run dir / config.json (got {args.config_name!r})"
        )
    apply_overrides(cfg, args.overrides)

    if cfg.trainer.distributed:
        # multi-host bring-up BEFORE any device use (SURVEY §5.8)
        from manus_tpu.parallel.distributed import initialize_distributed

        active = initialize_distributed(
            cfg.trainer.coordinator, cfg.trainer.num_processes,
            cfg.trainer.process_id,
        )
        import jax

        print(
            f"[distributed] active={active} process "
            f"{jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()}/{jax.device_count()} devices local"
        )

    out_dir = os.path.join(
        cfg.trainer.output_dir, cfg.trainer.project,
        cfg.dataset.subject or "synthetic", cfg.trainer.exp_name,
    )
    os.makedirs(out_dir, exist_ok=True)
    save_config(cfg, os.path.join(out_dir, "config.json"))

    np.random.seed(cfg.trainer.seed)

    if cfg.trainer.debug_nans:
        from manus_tpu.utils.profiling import enable_nan_debugging

        enable_nan_debugging(True)
    if cfg.trainer.mode == "debug":
        # reference fast_dev_run (main.py:81-82): one-step smoke run
        cfg.trainer.max_steps = 1
        cfg.trainer.val_every = 0
        cfg.trainer.checkpoint_every = 0
        cfg.trainer.mode = "train"

    if cfg.trainer.mode == "validate_data":
        # device-free capture schema check: walk the real BRICS /
        # MANUS-Grasps directory and report every contract violation
        # before any training run touches the device. Nonzero exit code =
        # error count (contracts: reference brics_dynamic.py:172-263,
        # params.py:28-105).
        from manus_tpu.data.validate import report, validate_capture

        return report(validate_capture(cfg))
    if cfg.trainer.mode == "make_path":
        # in-repo camera-path generation (reference does this offline in
        # Blender, bl_render.py); writes the pkl contract render_path /
        # composite consume
        from manus_tpu.utils.io import generate_camera_path

        out = generate_camera_path(
            cfg.camera_path, num_frames=cfg.render_frames,
            width=cfg.dataset.width, height=cfg.dataset.height,
        )
        print(f"wrote camera path: {out}")
    elif cfg.trainer.mode == "make_pose":
        # in-repo novel-pose generation (reference does this in Blender,
        # export_novel_pose.py); writes the meta_data pkl contract that
        # render_path / the synthetic dynamic dataset consume
        from manus_tpu.data.synthetic import (
            load_reference_skeleton, procedural_skeleton,
        )
        from manus_tpu.preprocess.novel_pose import generate_flexion_sequence

        skel = load_reference_skeleton() or procedural_skeleton()
        path = cfg.novel_pose_path or os.path.join(out_dir, "novel_pose.pkl")
        d = generate_flexion_sequence(
            skel, num_frames=cfg.render_frames, out_path=path
        )
        print(
            f"wrote {d['pose_matrixs'].shape[0]}-frame novel pose "
            f"({d['rest_matrixs'].shape[0]} bones): {path}"
        )
    elif cfg.trainer.mode == "eval_contacts":
        # three-way contact eval table over an existing composite run
        # (reference eval.sh -> get_iou{,_ours}.py)
        from manus_tpu.train.evaluate import evaluate_composite

        scores = evaluate_composite(
            out_dir,
            os.path.join(cfg.gt_contact_dir, "gt_contacts_seg"),
            os.path.join(cfg.gt_contact_dir, "gt_contacts"),
        )
        for m, s in scores.items():
            print(f"[eval] {m}: iou={s['iou']:.3f} f1={s['f1']:.3f}")
    elif cfg.trainer.mode == "render_path":
        run_render_path(cfg, out_dir)
    elif cfg.workload == "composite":
        run_composite(cfg, out_dir)
    elif cfg.trainer.mode == "test":
        run_test(cfg, out_dir)
    else:
        run_train(cfg, out_dir)


if __name__ == "__main__":
    sys.exit(main())
