"""End-to-end smoke tests: tiny synthetic scenes trained for a few hundred
steps must reduce loss and raise masked PSNR (SURVEY.md section 4 item c)."""
import dataclasses

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
