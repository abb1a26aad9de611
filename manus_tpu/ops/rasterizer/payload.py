"""Pair-payload construction for the tiled raster kernels.

The payload is a row-major [P_pad, 16] f32 array: one row per
(gaussian, tile) pair in aligned per-tile segments (see binning.py), with
the 9 live fields in the first columns and zero padding to 16. 16-column
f32 rows are 64 contiguous bytes, so a [chunk, 16] block is a single
contiguous 8KB DMA — and inside the kernel each field is a [G, 1] column
slice that broadcasts against [1, Px] pixel rows with no transposes.

Padding slots get opacity 0 so they composite as no-ops and need no masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from manus_tpu.ops.rasterizer.binning import TileBins
from manus_tpu.ops.rasterizer.projection import ProjectedGaussians

# Field order (columns of the payload matrix).
F_MEAN_X, F_MEAN_Y = 0, 1
F_CONIC_A, F_CONIC_B, F_CONIC_C = 2, 3, 4
F_OPACITY = 5
F_R, F_G, F_B = 6, 7, 8
NUM_FIELDS = 16  # padded to 64-byte rows


def build_payload(
    proj: ProjectedGaussians,
    colors: jax.Array,  # [N, 3]
    opacity: jax.Array,  # [N]
    bins: TileBins,
) -> jax.Array:
    """Gather per-gaussian fields into the aligned pair layout [P_pad, 16]."""
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
        axis=-1,
    )  # [N, 9]
    # The where() does double duty: padding slots render as no-ops (opacity
    # 0), and — critically — its VJP blocks cotangents for invalid slots, so
    # garbage (even NaN) in never-written gradient regions of the Pallas
    # backward cannot leak into gaussian 0 through the clamped gather index.
    payload = jnp.where(ok[:, None], fields[idx], 0.0)  # [P_pad, 9]
    pad = NUM_FIELDS - payload.shape[1]
    return jnp.concatenate(
        [payload, jnp.zeros((payload.shape[0], pad), payload.dtype)], axis=1
    )


def scatter_payload_grads(
    d_payload: jax.Array,  # [P_pad, 16]
    bins: TileBins,
    n: int,
):
    """Scatter pair-payload cotangents back to per-gaussian arrays.

    Returns (d_means2d [N,2], d_conic [N,3], d_colors [N,3], d_opacity [N]).
    """
    src = bins.pair_src
    ok = src >= 0
    idx = jnp.where(ok, src, n)  # dump invalid into an extra slot
    d = jnp.where(ok[:, None], d_payload[:, :9], 0.0)
    acc = jnp.zeros((n + 1, 9), d.dtype).at[idx].add(d)[:n]
    d_means2d = acc[:, F_MEAN_X : F_MEAN_Y + 1]
    d_conic = acc[:, F_CONIC_A : F_CONIC_C + 1]
    d_opacity = acc[:, F_OPACITY]
    d_colors = acc[:, F_R : F_B + 1]
    return d_means2d, d_conic, d_colors, d_opacity
