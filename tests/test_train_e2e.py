"""End-to-end smoke tests: tiny synthetic scenes trained for a few hundred
steps must reduce loss and raise masked PSNR (SURVEY.md section 4 item c)."""
import dataclasses
import os

import numpy as np
import pytest

from manus_tpu.config import hand_config, object_config
from manus_tpu.data.synthetic import (
    build_synthetic_dynamic,
    build_synthetic_static,
)
from manus_tpu.models.gaussians import init_gaussian_model
from manus_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def static_ds():
    return build_synthetic_static(
        width=64, height=64, num_cameras=6, n_gaussians=150, seed=0
    )


def test_object_training_improves(tmp_path, static_ds):
    cfg = object_config()
    cfg.capacity = 1024
    cfg.dataset.width = cfg.dataset.height = 64
    cfg.trainer.max_steps = 250
    cfg.trainer.val_every = 0
    cfg.trainer.checkpoint_every = 0
    cfg.trainer.log_every = 100
    cfg.model = dataclasses.replace(
        cfg.model,
        densification_interval=50,
        densify_from_step=20,
        opacity_reset_interval=10_000,
        remove_seg_end=0,  # no seg-prune phase on synthetic
        densify_grad_threshold=1e9,  # keep topology fixed for determinism
    )
    cfg.raster = dataclasses.replace(
        cfg.raster, backend="xla", tg_max=64, max_pairs_per_tile=512, chunk=32
    )
    pts, cols = static_ds.sample_gaussians(400)
    model = init_gaussian_model(pts, cols, cfg.capacity)
    tr = Trainer(cfg, static_ds, model, articulated=False,
                 out_dir=str(tmp_path))
    batch = tr.sample_batch()
    _, m0 = tr.train_step(tr.state, batch)
    psnr0 = tr.validate(0, log=lambda *a: None)
    tr.fit(log=lambda *a: None)
    psnr1 = tr.validate(1, log=lambda *a: None)
    assert psnr1 > psnr0 + 1.5, f"psnr {psnr0} -> {psnr1}"


def test_object_training_with_densify(tmp_path, static_ds):
    cfg = object_config()
    cfg.capacity = 2048
    cfg.dataset.width = cfg.dataset.height = 64
    cfg.trainer.max_steps = 150
    cfg.trainer.val_every = 0
    cfg.trainer.checkpoint_every = 0
    cfg.model = dataclasses.replace(
        cfg.model,
        densification_interval=40,
        densify_from_step=30,
        densify_grad_threshold=1e-6,  # force lots of densification
        percent_dense=0.01,
        opacity_reset_interval=10_000,
        remove_seg_end=0,
    )
    cfg.raster = dataclasses.replace(
        cfg.raster, backend="xla", tg_max=64, max_pairs_per_tile=512, chunk=32
    )
    pts, cols = static_ds.sample_gaussians(300)
    model = init_gaussian_model(pts, cols, cfg.capacity)
    tr = Trainer(cfg, static_ds, model, articulated=False,
                 out_dir=str(tmp_path))
    n0 = int(tr.state.model.num_active())
    tr.fit(log=lambda *a: None)
    n1 = int(tr.state.model.num_active())
    assert n1 != n0  # topology actually changed
    assert np.isfinite(float(tr.validate(1, log=lambda *a: None)))


def test_hand_training_improves(tmp_path):
    ds = build_synthetic_dynamic(
        width=64, height=64, num_cameras=4, num_frames=2,
        samples_per_bone_gt=25, seed=0, use_reference_skeleton=False,
    )
    cfg = hand_config()
    cfg.capacity = 2048
    cfg.dataset.width = cfg.dataset.height = 64
    cfg.trainer.max_steps = 120
    cfg.trainer.val_every = 0
    cfg.trainer.checkpoint_every = 0
    cfg.loss = dataclasses.replace(
        cfg.loss,
        losses=("rgb_loss", "ssim_loss", "isotropic_reg"),
        loss_weight=(0.8, 0.2, 0.1),
    )
    cfg.model = dataclasses.replace(
        cfg.model,
        densify_grad_threshold=1e9,
        opacity_reset_interval=10_000,
        remove_seg_end=0,
    )
    cfg.raster = dataclasses.replace(
        cfg.raster, backend="xla", tg_max=64, max_pairs_per_tile=512, chunk=32
    )
    pts, cols = ds.sample_gaussians_on_bones(40)
    # points-mode skinning: init weights by nearest GT gaussian's weights
    from manus_tpu.ops.knn import nearest_neighbor
    import jax.numpy as jnp

    _, idx = nearest_neighbor(jnp.asarray(pts), jnp.asarray(ds.gt["means"]))
    skin = ds.gt["skin"][np.asarray(idx)]
    model = init_gaussian_model(pts, cols, cfg.capacity, skin_weights=skin)
    tr = Trainer(cfg, ds, model, articulated=True, out_dir=str(tmp_path))
    psnr0 = tr.validate(0, log=lambda *a: None)
    tr.fit(log=lambda *a: None)
    psnr1 = tr.validate(1, log=lambda *a: None)
    assert psnr1 > psnr0 + 2.0, f"psnr {psnr0} -> {psnr1}"


def test_checkpoint_roundtrip(tmp_path, static_ds):
    cfg = object_config()
    cfg.capacity = 512
    cfg.dataset.width = cfg.dataset.height = 64
    cfg.trainer.max_steps = 5
    cfg.trainer.val_every = 0
    cfg.trainer.checkpoint_every = 0
    cfg.model = dataclasses.replace(cfg.model, remove_seg_end=0)
    cfg.raster = dataclasses.replace(
        cfg.raster, backend="xla", tg_max=64, max_pairs_per_tile=256, chunk=32
    )
    pts, cols = static_ds.sample_gaussians(100)
    model = init_gaussian_model(pts, cols, cfg.capacity)
    tr = Trainer(cfg, static_ds, model, articulated=False,
                 out_dir=str(tmp_path))
    tr.fit(log=lambda *a: None)
    path = tr.save(99, 0.0001)  # lowest loss => resolved as "best"
    xyz_before = np.asarray(tr.state.model.params.xyz)
    tr.state = tr.state._replace(
        model=tr.state.model._replace(
            params=tr.state.model.params._replace(
                xyz=tr.state.model.params.xyz * 0
            )
        )
    )
    loaded_path, n_bad = tr.load("best")
    assert loaded_path == path
    assert n_bad == 0
    np.testing.assert_array_equal(
        np.asarray(tr.state.model.params.xyz), xyz_before
    )


def test_lpips_wired_into_training(tmp_path, static_ds):
    """VERDICT r1 item 2: lpips_loss must actually contribute (random-feature
    fallback when no pretrained npz) and the val CSV must report nonzero
    LPIPS. Reference: base.py:333-341, loss_utils.py:111-117."""
    import csv
    import os

    def make_trainer(with_lpips, out):
        cfg = object_config()
        cfg.capacity = 512
        cfg.dataset.width = cfg.dataset.height = 64
        cfg.trainer.max_steps = 3
        cfg.trainer.val_every = 0
        cfg.trainer.checkpoint_every = 0
        cfg.model = dataclasses.replace(
            cfg.model, remove_seg_end=0, start_lpips_iter=0
        )
        if with_lpips:
            # lpips_random_in_loss: this test exercises the LIVE term
            # plumbing; the default-off gate has its own test below
            cfg.loss = dataclasses.replace(
                cfg.loss,
                losses=("rgb_loss", "lpips_loss"),
                loss_weight=(0.8, 0.1),
                lpips_random_in_loss=True,
            )
        else:
            cfg.loss = dataclasses.replace(
                cfg.loss, losses=("rgb_loss",), loss_weight=(0.8,)
            )
        cfg.raster = dataclasses.replace(
            cfg.raster, backend="xla", tg_max=64, max_pairs_per_tile=256,
            chunk=32,
        )
        pts, cols = static_ds.sample_gaussians(100)
        model = init_gaussian_model(pts, cols, cfg.capacity)
        return Trainer(cfg, static_ds, model, articulated=False, out_dir=out)

    tr_lp = make_trainer(True, str(tmp_path / "lp"))
    tr_no = make_trainer(False, str(tmp_path / "no"))
    assert tr_lp.lpips_params is not None  # fallback resolved
    batch = tr_lp.sample_batch()
    _, m_lp = tr_lp.train_step(tr_lp.state, batch)
    _, m_no = tr_no.train_step(tr_no.state, batch)
    lp_val = float(m_lp["loss/lpips_loss"])
    assert lp_val > 0.0, "lpips term is still a no-op"
    assert abs(float(m_lp["loss"]) - float(m_no["loss"])) > 1e-6

    # start_lpips_iter gate: before the gate the term is exactly zero
    tr_gate = make_trainer(True, str(tmp_path / "gate"))
    tr_gate.cfg.model = dataclasses.replace(
        tr_gate.cfg.model, start_lpips_iter=1000
    )
    from manus_tpu.train.workloads import make_train_step

    gated_step = make_train_step(
        tr_gate.cfg, static_ds.extent, False,
        lpips_params=tr_gate.lpips_params,
    )
    _, m_gate = gated_step(tr_gate.state, batch)
    assert float(m_gate["loss/lpips_loss"]) == 0.0

    # val CSV carries the metric, evaluated with the ALEXNET net (the
    # reference's eval arch, loss_utils.py:17-19) and marked with its
    # provenance so random-feature values can never read as real LPIPS
    from manus_tpu.train.lpips import infer_arch

    assert infer_arch(tr_lp.lpips_params) == "vgg"  # loss net
    assert infer_arch(tr_lp.lpips_eval_params) == "alex"  # metric net
    tr_lp.validate(0, log=lambda *a: None)
    with open(os.path.join(str(tmp_path / "lp"), "results",
                           "val_results.csv")) as f:
        rows = list(csv.DictReader(f))
    assert float(rows[-1]["lpips"]) > 0.0
    assert rows[-1]["lpips_mode"] == "alex:random-feature"


def test_random_feature_lpips_loss_gated_off(tmp_path, static_ds):
    """VERDICT r4 item 3: under missing pretrained weights the LPIPS loss
    term is a random-projection feature loss with no evidence it helps,
    so the trainer strips it from the TRAINING loss by default (val
    metric stays live). Pretrained weights or the explicit opt-in keep
    it."""
    import numpy as np

    from manus_tpu.train.lpips import random_lpips_params

    def make_trainer(out, **loss_kw):
        cfg = object_config()
        cfg.capacity = 512
        cfg.dataset.width = cfg.dataset.height = 64
        cfg.trainer.max_steps = 2
        cfg.trainer.val_every = 0
        cfg.trainer.checkpoint_every = 0
        cfg.model = dataclasses.replace(
            cfg.model, remove_seg_end=0, start_lpips_iter=0
        )
        cfg.loss = dataclasses.replace(
            cfg.loss, losses=("rgb_loss", "lpips_loss"),
            loss_weight=(0.8, 0.1), lpips_gt_cache_mb=0, **loss_kw,
        )
        cfg.raster = dataclasses.replace(
            cfg.raster, backend="xla", tg_max=64, max_pairs_per_tile=256,
            chunk=32,
        )
        pts, cols = static_ds.sample_gaussians(100)
        model = init_gaussian_model(pts, cols, cfg.capacity)
        return Trainer(cfg, static_ds, model, articulated=False,
                       out_dir=out)

    # default: random-feature fallback -> term stripped, metric net live
    tr = make_trainer(str(tmp_path / "off"))
    assert "lpips_loss" not in tr.cfg.loss.losses
    assert len(tr.cfg.loss.losses) == len(tr.cfg.loss.loss_weight)
    assert tr.lpips_eval_params is not None  # val metric column stays

    # explicit opt-in keeps the term
    tr_in = make_trainer(str(tmp_path / "in"), lpips_random_in_loss=True)
    assert "lpips_loss" in tr_in.cfg.loss.losses

    # pretrained weights (any loadable npz) keep the reference loss live
    wpath = str(tmp_path / "vgg.npz")
    np.savez(wpath, **{k: np.asarray(v) for k, v in
                       random_lpips_params(0, arch="vgg").items()})
    tr_pre = make_trainer(str(tmp_path / "pre"), lpips_weights=wpath)
    assert tr_pre.lpips_mode == "vgg:pretrained"
    assert "lpips_loss" in tr_pre.cfg.loss.losses


def test_heldout_validation_and_artifacts(tmp_path):
    """VERDICT r1 item 3: validation renders cameras the trainer never saw
    and dumps pred|gt|diff strips + gaussian PLYs (base.py:112-188,271-290)."""
    import os

    from manus_tpu.data.synthetic import (
        build_synthetic_static,
        split_synthetic_static,
    )

    full = build_synthetic_static(
        width=64, height=64, num_cameras=8, n_gaussians=120, seed=3
    )
    train_ds, val_ds = split_synthetic_static(full)
    assert train_ds.num_views == 6 and val_ds.num_views == 2
    # the val cameras are genuinely disjoint from the train cameras
    tc = np.asarray(train_ds.cameras.camera_center)
    vc = np.asarray(val_ds.cameras.camera_center)
    assert np.min(np.linalg.norm(tc[:, None] - vc[None], axis=-1)) > 1e-4

    cfg = object_config()
    cfg.capacity = 512
    cfg.dataset.width = cfg.dataset.height = 64
    cfg.trainer.max_steps = 150
    cfg.trainer.val_every = 0
    cfg.trainer.checkpoint_every = 0
    cfg.model = dataclasses.replace(
        cfg.model, remove_seg_end=0, densify_grad_threshold=1e9
    )
    cfg.raster = dataclasses.replace(
        cfg.raster, backend="xla", tg_max=64, max_pairs_per_tile=256, chunk=32
    )
    pts, cols = train_ds.sample_gaussians(120)
    model = init_gaussian_model(pts, cols, cfg.capacity)
    tr = Trainer(cfg, train_ds, model, articulated=False,
                 out_dir=str(tmp_path), val_dataset=val_ds)
    psnr0 = tr.validate(0, log=lambda *a: None)
    tr.fit(log=lambda *a: None)
    psnr1 = tr.validate(1, log=lambda *a: None)
    assert psnr1 > psnr0, f"held-out psnr {psnr0} -> {psnr1}"

    img_dir = os.path.join(str(tmp_path), "results", "val_results", "images")
    imgs = sorted(os.listdir(img_dir))
    assert imgs, "no val images dumped"
    import cv2

    strip = cv2.imread(os.path.join(img_dir, imgs[0]))
    assert strip.shape == (64, 64 * 3, 3)  # pred | gt | diff
    gdir = os.path.join(str(tmp_path), "results", "val_results", "gaussians")
    assert any(f.endswith("_posed.ply") for f in os.listdir(gdir))


def test_full_sweep_validation_and_val_keyed_best(tmp_path):
    """VERDICT r2 item 7: trainer.val_full_sweep sweeps EVERY held-out
    view per val epoch with one val_results.csv row per sample (reference
    base.py:112-154 full-dataloader semantics), and checkpoints saved at a
    validated step carry the val PSNR so `best` resolves on the held-out
    metric instead of train loss."""
    import csv
    import os

    from manus_tpu.data.synthetic import (
        build_synthetic_static,
        split_synthetic_static,
    )
    from manus_tpu.train import checkpoint as ckpt_mod

    full = build_synthetic_static(
        width=64, height=64, num_cameras=8, n_gaussians=100, seed=4
    )
    train_ds, val_ds = split_synthetic_static(full)
    cfg = object_config()
    cfg.capacity = 256
    cfg.dataset.width = cfg.dataset.height = 64
    cfg.trainer.max_steps = 5
    cfg.trainer.val_every = 4
    cfg.trainer.checkpoint_every = 4
    cfg.trainer.val_full_sweep = True
    cfg.model = dataclasses.replace(
        cfg.model, remove_seg_end=0, densify_grad_threshold=1e9
    )
    cfg.raster = dataclasses.replace(
        cfg.raster, backend="xla", tg_max=64, max_pairs_per_tile=256, chunk=32
    )
    pts, cols = train_ds.sample_gaussians(100)
    model = init_gaussian_model(pts, cols, cfg.capacity)
    tr = Trainer(cfg, train_ds, model, articulated=False,
                 out_dir=str(tmp_path), val_dataset=val_ds)
    tr.fit(log=lambda *a: None)

    with open(os.path.join(str(tmp_path), "results", "val_results.csv")) as f:
        rows = list(csv.DictReader(f))
    # step-4 epoch: one row per held-out view (2) + the aggregate row
    step4 = [r for r in rows if r["step"] == "4"]
    items = [r for r in step4 if "/f" in r["name"]]
    assert len(items) == val_ds.num_views
    assert len(step4) == val_ds.num_views + 1

    # the step-4 checkpoint is val-keyed; the final (step-5) one is not,
    # and best resolves to the val-keyed snapshot
    names = os.listdir(os.path.join(str(tmp_path), "checkpoints"))
    assert any("-vpsnr" in n and "step000004" in n for n in names)
    best = ckpt_mod.find_best_checkpoint(
        os.path.join(str(tmp_path), "checkpoints")
    )
    assert "-vpsnr" in os.path.basename(best)


def test_find_best_checkpoint_val_keyed(tmp_path):
    """Name-parsing unit test: highest vpsnr wins over any loss; loss
    ordering still applies when no checkpoint carries a val metric."""
    from manus_tpu.train import checkpoint as ckpt_mod

    d = str(tmp_path)
    for n in ("step000100-loss0.100000.npz",
              "step000200-loss0.900000-vpsnr30.1000.npz",
              "step000300-loss0.500000-vpsnr29.0000.npz"):
        open(os.path.join(d, n), "wb").close()
    best = ckpt_mod.find_best_checkpoint(d)
    assert os.path.basename(best) == "step000200-loss0.900000-vpsnr30.1000.npz"
    # loss-only directory: lowest loss, tie -> latest step
    d2 = str(tmp_path / "lossonly")
    os.makedirs(d2)
    for n in ("step000100-loss0.200000.npz", "step000250-loss0.100000.npz"):
        open(os.path.join(d2, n), "wb").close()
    assert os.path.basename(
        ckpt_mod.find_best_checkpoint(d2)
    ) == "step000250-loss0.100000.npz"


def test_trainable_skin_weights(tmp_path):
    """optimize_skin_weights actually trains the per-point weights (the
    skinning_lr group the reference declares at gaussian.yaml:12 but never
    wires into its optimizer): weights move, stay a convex combination,
    and the loss still falls."""
    import jax.numpy as jnp

    from manus_tpu.data.synthetic import build_synthetic_dynamic
    from manus_tpu.ops.knn import nearest_neighbor

    ds = build_synthetic_dynamic(
        width=64, height=64, num_cameras=4, num_frames=2,
        samples_per_bone_gt=15, seed=0, use_reference_skeleton=False,
    )
    cfg = hand_config()
    cfg.capacity = 512
    cfg.dataset.width = cfg.dataset.height = 64
    cfg.skin_init = "mano_init_points"
    cfg.trainer.max_steps = 40
    cfg.trainer.val_every = 0
    cfg.trainer.checkpoint_every = 0
    cfg.loss = dataclasses.replace(
        cfg.loss, losses=("rgb_loss",), loss_weight=(1.0,)
    )
    cfg.model = dataclasses.replace(
        cfg.model, remove_seg_end=0, optimize_skin_weights=True,
        skinning_lr=0.01, densify_grad_threshold=1e9,
    )
    cfg.raster = dataclasses.replace(
        cfg.raster, backend="xla", tg_max=64, max_pairs_per_tile=512,
        chunk=32,
    )
    pts, cols = ds.sample_gaussians_on_bones(20)
    _, idx = nearest_neighbor(jnp.asarray(pts), jnp.asarray(ds.gt["means"]))
    skin = ds.gt["skin"][np.asarray(idx)]
    model = init_gaussian_model(pts, cols, cfg.capacity, skin_weights=skin)
    tr = Trainer(cfg, ds, model, articulated=True, out_dir=str(tmp_path))
    assert tr.state.skin_opt is not None
    sw0 = np.asarray(tr.state.model.skin_weights).copy()
    batch = tr.sample_batch()
    _, m0 = tr.train_step(tr.state, batch)
    tr.fit(log=lambda *a: None)
    sw1 = np.asarray(tr.state.model.skin_weights)
    active = np.asarray(tr.state.model.active)
    assert np.abs(sw1[active] - sw0[active]).max() > 1e-5, "weights frozen"
    assert (sw1[active] >= 0).all()
    np.testing.assert_allclose(sw1[active].sum(-1), 1.0, atol=1e-4)
    assert np.isfinite(sw1).all()
    # flag off: weights must stay exactly frozen
    cfg2 = dataclasses.replace(cfg)
    cfg2.model = dataclasses.replace(cfg.model, optimize_skin_weights=False)
    cfg2.trainer = dataclasses.replace(cfg.trainer, max_steps=10)
    model2 = init_gaussian_model(pts, cols, cfg.capacity, skin_weights=skin)
    tr2 = Trainer(cfg2, ds, model2, articulated=True,
                  out_dir=str(tmp_path / "off"))
    tr2.fit(log=lambda *a: None)
    np.testing.assert_array_equal(
        np.asarray(tr2.state.model.skin_weights), sw0
    )
