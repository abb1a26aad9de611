"""Worker process for tests/test_distributed.py — NOT a test module.

Launched once per process by the test: brings up jax.distributed over
CPU (4 virtual devices per process), builds the hybrid multi-host mesh
through manus_tpu.parallel.distributed, runs ONE fully sharded train
step (dp x gauss), and writes loss/param checksums to a JSON file the
test compares across processes and against a single-process run.

This executes the jax.process_count() > 1 branch of
parallel/distributed.py — the code path a real pod slice runs — which
no single-process test can reach (SURVEY §5.8, VERDICT r2 missing 4).
"""
import json
import os
import sys


def run_one_step(mesh):
    """Deterministic tiny-hand sharded train step on `mesh`; identical
    computation for the multi-process workers and the single-process
    reference (same seeds, same batch, same shardings)."""
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _tiny_hand_setup
    from manus_tpu.ops.skinning import bone_deformation_transforms
    from manus_tpu.parallel.mesh import DATA_AXIS, replicate_state, shard_batch
    from manus_tpu.train.workloads import init_train_state, make_train_step
    from manus_tpu.utils.camera import index_camera

    cfg, ds, model = _tiny_hand_setup(backend="xla")
    n_data = mesh.shape[DATA_AXIS]
    cfg.trainer.batch_views = n_data
    views = np.arange(n_data) % ds.num_views
    raw = ds.get_batch(0, views)
    batch = {
        "rgb": jnp.asarray(np.asarray(raw["rgb"], np.float32)),
        "mask": jnp.asarray(np.asarray(raw["mask"], np.float32)),
        "cameras": index_camera(ds.cameras, views),
        "bg": jnp.zeros(3, jnp.float32),
        "bone_tf": bone_deformation_transforms(
            ds.bones_posed[0].transforms, ds.bones_rest.transforms
        ),
        "keypoints": jnp.asarray(ds.bones_posed[0].keypoints()),
    }
    step = make_train_step(
        cfg, ds.extent, articulated=True, voxel_grid=None, mesh=mesh
    )
    with mesh:
        state = replicate_state(init_train_state(model), mesh)
        batch = shard_batch(batch, mesh)
        new_state, metrics = step(state, batch)
    # outputs are replicated -> fully-replicated global arrays are host-
    # readable on every process
    xyz = np.asarray(new_state.model.params.xyz, np.float64)
    return {
        "loss": float(metrics["loss"]),
        "num_active": int(metrics["num_active"]),
        "xyz_abs_sum": float(np.abs(xyz).sum()),
        "opacity_abs_sum": float(
            np.abs(np.asarray(new_state.model.params.opacity, np.float64)).sum()
        ),
    }


def main():
    pid, port, out_path, n_proc = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], int(sys.argv[4])
    )
    # platform pins must land BEFORE jax import (this machine pins
    # JAX_PLATFORMS=axon; CLAUDE.md: config.update is what sticks)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from manus_tpu.parallel.distributed import (
        initialize_distributed,
        make_multihost_mesh,
        process_local_batch_indices,
    )

    active = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=n_proc,
        process_id=pid,
    )
    assert active, "distributed bring-up did not activate"
    assert jax.process_count() == n_proc
    assert jax.device_count() == n_proc * 4

    mesh = make_multihost_mesh(n_data=4, n_gauss=2)
    local_views = process_local_batch_indices(4, mesh)
    assert len(local_views) == 4 // n_proc, local_views

    result = run_one_step(mesh)
    result["process_id"] = pid
    result["local_views"] = [int(v) for v in local_views]
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"[proc {pid}] ok: {result}", flush=True)


if __name__ == "__main__":
    main()
