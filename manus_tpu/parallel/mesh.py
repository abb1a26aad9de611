"""Device mesh + sharding helpers for multi-chip training.

The scaling strategy (SURVEY.md sections 2.10, 5.7-5.8): cameras/views are
the data-parallel axis — each device renders its shard of the view batch
against replicated gaussian parameters, and XLA GSPMD inserts the psum
over parameter gradients when the per-view losses are averaged. This is
the TPU-native replacement for the DDP the reference attempted and
abandoned (main.py:84-94 "DDP fails for multiple models and optimizers"):
with functional state there is nothing to wrap — sharding annotations on
the already-batched train step are sufficient, and densify/prune events
run on the replicated state identically on every device (no divergence,
since all RNG and inputs are replicated).

A second mesh axis ("gauss") is provided for sharding the gaussian axis of
projection/LBS-heavy stages (tensor-parallel analogue) on pods where the
view batch alone cannot fill the mesh.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GAUSS_AXIS = "gauss"


def make_mesh(n_data: Optional[int] = None, n_gauss: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_gauss
    assert n_data * n_gauss <= len(devices), (
        f"mesh {n_data}x{n_gauss} exceeds {len(devices)} devices"
    )
    dev = np.asarray(devices[: n_data * n_gauss]).reshape(n_data, n_gauss)
    return Mesh(dev, (DATA_AXIS, GAUSS_AXIS))


def view_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (view) sharding for batch leaves."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_put(x, sharding: NamedSharding):
    """device_put that also works on multi-process meshes.

    Single-process meshes go through jax.device_put. On a mesh spanning
    processes (jax.distributed multi-host), the caller holds the FULL
    global value (tests / replicated state; production hosts can restrict
    batch loading with distributed.process_local_batch_indices and pass
    the same globally-consistent array) and the global jax.Array is
    assembled from this process's addressable shards only.
    """
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    shards = [
        jax.device_put(x[idx], d)
        for d, idx in sharding.addressable_devices_indices_map(
            x.shape
        ).items()
    ]
    return jax.make_array_from_single_device_arrays(x.shape, sharding, shards)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a view-batched dict: [V, ...] leaves sharded over data axis,
    everything else replicated. Works on Camera pytrees too (their static
    width/height fields are aux data, not leaves)."""
    vs = view_sharding(mesh)
    rep = replicated(mesh)
    v = batch["rgb"].shape[0]

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == v:
            return global_put(x, vs)
        return global_put(x, rep)

    out = {}
    for key, val in batch.items():
        if key in ("rgb", "mask", "cameras", "lpips_gt_feats"):
            out[key] = jax.tree.map(place, val)
        else:
            out[key] = jax.tree.map(lambda x: global_put(x, rep), val)
    return out


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: global_put(x, rep), state)
