"""Pair-payload construction for the tiled raster kernels.

The payload is a field-major [16, P_pad] f32 array: one column per
(gaussian, tile) pair in lane-aligned per-tile segments (see binning.py),
with the 9 live fields in the first rows and zero padding to 16. A
[16, 128] chunk slice is 16 contiguous 512B bursts and lands on a
128-lane-aligned column offset, which the Mosaic DMA engine requires; in
the kernel each field is a [1, G] row that broadcasts against [Px, 1]
pixel columns with no transposes.

Padding slots get all-zero columns (opacity 0 composites as a no-op, and
the masked gather's VJP blocks cotangents so garbage in never-written
gradient regions cannot leak through the clamped gather index).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from manus_tpu.ops.rasterizer.binning import TileBins
from manus_tpu.ops.rasterizer.projection import ProjectedGaussians

# Field order (rows of the payload matrix).
F_MEAN_X, F_MEAN_Y = 0, 1
F_CONIC_A, F_CONIC_B, F_CONIC_C = 2, 3, 4
F_OPACITY = 5
F_R, F_G, F_B = 6, 7, 8
NUM_FIELDS = 16  # padded so the chunk buffer keeps (8, 128)-friendly shape


def build_payload(
    proj: ProjectedGaussians,
    colors: jax.Array,  # [N, 3]
    opacity: jax.Array,  # [N]
    bins: TileBins,
) -> jax.Array:
    """Gather per-gaussian fields into the aligned pair layout [16, P_pad]."""
    src = bins.pair_src
    ok = src >= 0
    idx = jnp.maximum(src, 0)
    fields = jnp.stack(
        [
            proj.means2d[:, 0],
            proj.means2d[:, 1],
            proj.conic[:, 0],
            proj.conic[:, 1],
            proj.conic[:, 2],
            opacity,
            colors[:, 0],
            colors[:, 1],
            colors[:, 2],
        ],
        axis=0,
    )  # [9, N]
    payload = jnp.where(ok[None, :], fields[:, idx], 0.0)  # [9, P_pad]
    pad = NUM_FIELDS - payload.shape[0]
    return jnp.concatenate(
        [payload, jnp.zeros((pad, payload.shape[1]), payload.dtype)], axis=0
    )
