"""Multi-host (multi-process) scaffolding: jax.distributed + DCN-aware mesh.

SURVEY §5.8: the reference scales with torch DDP over NCCL (attempted and
abandoned, reference main.py:84-94); the TPU-native path is SPMD over a
global device mesh. One JAX process runs per host; `initialize_distributed`
brings up the cross-host runtime, and `make_multihost_mesh` builds a mesh
whose DATA axis spans hosts (gradient psum rides DCN once per step — small,
latency-tolerant) while the GAUSS axis stays inside a host (its all_gather
into binning is bandwidth-hungry and must ride ICI).

No multi-host hardware exists in this environment; the single-process path
(process_count == 1) is exercised by tests and the driver's
dryrun_multichip, and the multi-process branch follows the standard
jax.distributed contract so it runs unchanged on a real pod slice.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from manus_tpu.parallel.mesh import DATA_AXIS, GAUSS_AXIS


def initialize_distributed(
    coordinator_address: str = "",
    num_processes: int = -1,
    process_id: int = -1,
) -> bool:
    """Bring up the multi-host runtime. Returns True if distributed mode
    is active after the call.

    With no arguments, relies on jax.distributed's automatic environment
    detection (TPU pod metadata / SLURM / Open MPI). Explicit values
    follow the jax.distributed.initialize contract. Safe to call in a
    single-process run: initialization is skipped when nothing indicates
    a multi-process job.
    """
    import jax

    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes > 0:
        kwargs["num_processes"] = num_processes
    if process_id >= 0:
        kwargs["process_id"] = process_id
    if not kwargs:
        # nothing explicit: only auto-initialize under a recognizable
        # multi-process launcher, else stay single-process
        import os

        markers = ("SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE", "TPU_WORKER_ID")
        if not any(m in os.environ for m in markers):
            return jax.process_count() > 1
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return jax.process_count() > 1


def make_multihost_mesh(
    n_data: Optional[int] = None,
    n_gauss: int = 1,
    devices=None,
):
    """Global (DATA, GAUSS) mesh over all processes' devices.

    Multi-process: hybrid mesh via mesh_utils — DCN (cross-host) granules
    map to the DATA axis, ICI (intra-host) to GAUSS. Single-process:
    identical to parallel.mesh.make_mesh.
    """
    import jax
    from jax.sharding import Mesh

    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        n_proc = jax.process_count()
        n_local = jax.local_device_count()
        total = n_proc * n_local
        if n_data is None:
            n_data = total // n_gauss
        assert n_gauss <= n_local, (
            f"gauss axis ({n_gauss}) must fit inside one host ({n_local} "
            "local devices): its binning all_gather must ride ICI, not DCN"
        )
        assert n_data * n_gauss == total, (
            f"mesh {n_data}x{n_gauss} != {total} global devices"
        )
        # DCN granule: processes along data; ICI granule: the per-host
        # remainder of data times gauss. Multi-slice TPU topologies group
        # by slice_index; single-slice pods and multi-process CPU (the
        # test harness) have one slice for all processes, so fall back to
        # the per-process granule there.
        try:
            dev = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(n_data // n_proc, n_gauss),
                dcn_mesh_shape=(n_proc, 1),
            )
        except ValueError:
            dev = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(n_data // n_proc, n_gauss),
                dcn_mesh_shape=(n_proc, 1),
                process_is_granule=True,
            )
        return Mesh(dev, (DATA_AXIS, GAUSS_AXIS))

    from manus_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=n_data, n_gauss=n_gauss, devices=devices)


def process_local_batch_indices(
    num_views: int, mesh
) -> np.ndarray:
    """View indices this process must materialise for a globally sharded
    [V, ...] batch: the rows of the DATA axis shards owned by local
    devices. Hosts only load/decode their own camera shard (the
    multi-host analogue of data/prefetch feeding a single chip)."""
    import jax

    axis = list(mesh.axis_names).index(DATA_AXIS)
    n_data = mesh.devices.shape[axis]
    per = num_views // n_data
    local = set()
    local_devs = {d.id for d in jax.local_devices()}
    it = np.nditer(np.arange(mesh.devices.size).reshape(mesh.devices.shape),
                   flags=["multi_index"])
    for _ in it:
        d = mesh.devices[it.multi_index]
        if d.id in local_devs:
            row = it.multi_index[axis]
            local.update(range(row * per, (row + 1) * per))
    return np.asarray(sorted(local), dtype=np.int64)
