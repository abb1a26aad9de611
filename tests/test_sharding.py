"""Multi-device correctness on the 8-device virtual CPU mesh:
data-parallel sharded training must match the single-device computation
(SURVEY.md section 4 item d)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manus_tpu.config import hand_config
from manus_tpu.data.synthetic import build_synthetic_dynamic
from manus_tpu.models.gaussians import init_gaussian_model
from manus_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from manus_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def hand_setup():
    ds = build_synthetic_dynamic(
        width=64, height=64, num_cameras=8, num_frames=2,
        samples_per_bone_gt=15, seed=0, use_reference_skeleton=False,
    )
    cfg = hand_config()
    cfg.capacity = 1024
    cfg.dataset.width = cfg.dataset.height = 64
    cfg.trainer.batch_views = 8
    cfg.loss = dataclasses.replace(
        cfg.loss,
        losses=("rgb_loss", "ssim_loss", "isotropic_reg"),
        loss_weight=(0.8, 0.2, 0.1),
    )
    cfg.model = dataclasses.replace(cfg.model, remove_seg_end=0)
    cfg.raster = dataclasses.replace(
        cfg.raster, backend="xla", tg_max=64, max_pairs_per_tile=512,
        chunk=32,
    )
    from manus_tpu.ops.knn import nearest_neighbor

    pts, cols = ds.sample_gaussians_on_bones(25)
    _, idx = nearest_neighbor(jnp.asarray(pts), jnp.asarray(ds.gt["means"]))
    skin = ds.gt["skin"][np.asarray(idx)]
    model = init_gaussian_model(pts, cols, cfg.capacity, skin_weights=skin)
    tr = Trainer(cfg, ds, model, articulated=True, out_dir="/tmp/shard_test")
    return tr


def test_sharded_step_matches_single_device(hand_setup):
    tr = hand_setup
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    batch = tr.sample_batch()

    # single device
    state1, metrics1 = tr.train_step(tr.state, batch)

    # 8-way data parallel over views
    mesh = make_mesh(n_data=8)
    with mesh:
        state_r = replicate_state(tr.state, mesh)
        batch_r = shard_batch(batch, mesh)
        state8, metrics8 = tr.train_step(state_r, batch_r)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics8["loss"]), rtol=1e-5
    )
    # parameter updates must agree across the replicated result
    for name in ("opacity", "features_dc", "scaling"):
        a = np.asarray(getattr(state1.model.params, name))
        b = np.asarray(getattr(state8.model.params, name))
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                   err_msg=f"param mismatch: {name}")
    assert int(metrics8["num_active"]) == int(metrics1["num_active"])


def test_sharded_batch_placement(hand_setup):
    tr = hand_setup
    mesh = make_mesh(n_data=8)
    batch = shard_batch(tr.sample_batch(), mesh)
    # view-batched leaves sharded, broadcast leaves replicated
    rgb_shard = batch["rgb"].sharding
    assert rgb_shard.num_devices == 8 if hasattr(rgb_shard, "num_devices") else True
    assert batch["rgb"].addressable_shards[0].data.shape[0] == 1  # 8/8
    assert batch["bone_tf"].addressable_shards[0].data.shape == batch["bone_tf"].shape


def test_shard_map_step_matches_plain(hand_setup):
    """The explicit shard_map DP path must reproduce the plain step."""
    from manus_tpu.train.workloads import make_train_step

    tr = hand_setup
    batch = tr.sample_batch()
    state1, metrics1 = tr.train_step(tr.state, batch)

    mesh = make_mesh(n_data=8)
    sharded_step = make_train_step(
        tr.cfg, tr.dataset.extent, articulated=True, voxel_grid=None,
        mesh=mesh,
    )
    with mesh:
        state_r = replicate_state(tr.state, mesh)
        batch_r = shard_batch(batch, mesh)
        state8, metrics8 = sharded_step(state_r, batch_r)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics8["loss"]), rtol=1e-5
    )
    a = np.asarray(state1.model.params.opacity)
    b = np.asarray(state8.model.params.opacity)
    scale = np.abs(a).max() + 1e-8
    np.testing.assert_allclose(a / scale, b / scale, atol=1e-5)


def test_shard_map_data_x_gauss_matches_plain(hand_setup):
    """VERDICT r1 item 8: (data=4, gauss=2) — LBS/SH/projection sharded
    over the gaussian axis with an all_gather into binning — must match
    the single-device step (loss, param update, densify stats grads)."""
    from manus_tpu.train.workloads import make_train_step

    tr = hand_setup
    batch = tr.sample_batch()
    state1, metrics1 = tr.train_step(tr.state, batch)

    mesh = make_mesh(n_data=4, n_gauss=2)
    sharded_step = make_train_step(
        tr.cfg, tr.dataset.extent, articulated=True, voxel_grid=None,
        mesh=mesh,
    )
    with mesh:
        state_r = replicate_state(tr.state, mesh)
        batch_r = shard_batch(batch, mesh)
        state42, metrics42 = sharded_step(state_r, batch_r)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics42["loss"]), rtol=1e-5
    )
    for name in ("opacity", "xyz", "scaling"):
        a = np.asarray(getattr(state1.model.params, name))
        b = np.asarray(getattr(state42.model.params, name))
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                   err_msg=f"param mismatch: {name}")
    # densification stats (fed by the viewspace m2d grads) must also be
    # mesh-shape invariant
    np.testing.assert_allclose(
        np.asarray(state1.stats.grad_accum), np.asarray(state42.stats.grad_accum),
        atol=1e-5,
    )
    # overflow diagnostics are psum'd over the tile-owner columns inside
    # the sharded binning, so the reported totals must match unsharded
    assert int(metrics42["pair_overflow"]) == int(metrics1["pair_overflow"])
    assert int(metrics42["pair_overflow_far"]) == int(
        metrics1["pair_overflow_far"]
    )


def test_shard_map_gauss4_matches_plain(hand_setup):
    """(data=2, gauss=4): four tile-owner columns under the round-robin
    interleave — a stricter permutation/ownership check than gauss=2
    (where interleave and contiguous halves coincide for 2 tiles)."""
    from manus_tpu.train.workloads import make_train_step

    tr = hand_setup
    batch = tr.sample_batch()
    state1, metrics1 = tr.train_step(tr.state, batch)

    mesh = make_mesh(n_data=2, n_gauss=4)
    sharded_step = make_train_step(
        tr.cfg, tr.dataset.extent, articulated=True, voxel_grid=None,
        mesh=mesh,
    )
    with mesh:
        state_r = replicate_state(tr.state, mesh)
        batch_r = shard_batch(batch, mesh)
        state24, metrics24 = sharded_step(state_r, batch_r)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics24["loss"]), rtol=1e-5
    )
    for name in ("opacity", "xyz", "scaling"):
        a = np.asarray(getattr(state1.model.params, name))
        b = np.asarray(getattr(state24.model.params, name))
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                   err_msg=f"param mismatch: {name}")
    assert int(metrics24["pair_overflow"]) == int(metrics1["pair_overflow"])


def test_multihost_scaffolding_single_process():
    """VERDICT r1 item 7: the multi-host path exists and is exercisable
    at process_count=1 — initialize is a no-op, the mesh builder returns
    the (data, gauss) mesh, and host-local batch indices cover the full
    view range exactly once across the (single) host."""
    from manus_tpu.parallel.distributed import (
        initialize_distributed,
        make_multihost_mesh,
        process_local_batch_indices,
    )

    assert initialize_distributed() is False  # single-process: not active
    mesh = make_multihost_mesh(n_data=4, n_gauss=2)
    assert mesh.axis_names == ("data", "gauss")
    assert mesh.devices.shape == (4, 2)
    idx = process_local_batch_indices(8, mesh)
    np.testing.assert_array_equal(idx, np.arange(8))


def test_pairslice_gauss4_matches_plain(hand_setup):
    """raster.tile_shard_mode=pairslice (VERDICT r4 item 4 rebalance):
    each gauss column composites an equal slice of the depth-sorted pair
    array and the partial segments over-compose across columns. Not
    bit-exact (termination is applied at slice granularity, ~1e-4
    bound), so tolerances are one notch looser than the owner-mode
    tests — but the full train step (loss, params, densify stats) must
    still agree with single-device."""
    import copy

    from manus_tpu.train.workloads import make_train_step

    tr = hand_setup
    batch = tr.sample_batch()
    state1, metrics1 = tr.train_step(tr.state, batch)

    cfg = copy.deepcopy(tr.cfg)
    cfg.raster = dataclasses.replace(cfg.raster, tile_shard_mode="pairslice")
    mesh = make_mesh(n_data=2, n_gauss=4)
    sharded_step = make_train_step(
        cfg, tr.dataset.extent, articulated=True, voxel_grid=None,
        mesh=mesh,
    )
    with mesh:
        state_r = replicate_state(tr.state, mesh)
        batch_r = shard_batch(batch, mesh)
        state_ps, metrics_ps = sharded_step(state_r, batch_r)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics_ps["loss"]), rtol=1e-4
    )
    for name in ("opacity", "xyz", "scaling"):
        a = np.asarray(getattr(state1.model.params, name))
        b = np.asarray(getattr(state_ps.model.params, name))
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4,
                                   err_msg=f"param mismatch: {name}")
    np.testing.assert_allclose(
        np.asarray(state1.stats.grad_accum),
        np.asarray(state_ps.stats.grad_accum), atol=1e-4,
    )
    # binning runs unsharded in pairslice mode -> overflow totals global
    assert int(metrics_ps["pair_overflow"]) == int(metrics1["pair_overflow"])


def test_hybrid_gauss4_matches_plain(hand_setup):
    """raster.tile_shard_mode=hybrid: owner tiles + the hot_split_tiles
    deepest tiles depth-split across columns. Only split tiles carry the
    ~1e-4 termination-boundary deviation; the full train step must match
    single-device at the same tolerance as pairslice."""
    import copy

    from manus_tpu.train.workloads import make_train_step

    tr = hand_setup
    batch = tr.sample_batch()
    state1, metrics1 = tr.train_step(tr.state, batch)

    cfg = copy.deepcopy(tr.cfg)
    cfg.raster = dataclasses.replace(
        cfg.raster, tile_shard_mode="hybrid", hot_split_tiles=4
    )
    mesh = make_mesh(n_data=2, n_gauss=4)
    sharded_step = make_train_step(
        cfg, tr.dataset.extent, articulated=True, voxel_grid=None,
        mesh=mesh,
    )
    with mesh:
        state_r = replicate_state(tr.state, mesh)
        batch_r = shard_batch(batch, mesh)
        state_h, metrics_h = sharded_step(state_r, batch_r)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics_h["loss"]), rtol=1e-4
    )
    for name in ("opacity", "xyz", "scaling"):
        a = np.asarray(getattr(state1.model.params, name))
        b = np.asarray(getattr(state_h.model.params, name))
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4,
                                   err_msg=f"param mismatch: {name}")
    np.testing.assert_allclose(
        np.asarray(state1.stats.grad_accum),
        np.asarray(state_h.stats.grad_accum), atol=1e-4,
    )
    assert int(metrics_h["pair_overflow"]) == int(metrics1["pair_overflow"])
