"""Pair-payload construction for the tiled raster kernels.

The payload is a field-major [NUM_FIELDS, P_pad] f32 array: one column per
(gaussian, tile) pair in aligned per-tile segments (see binning.py).
Field-major layout means the kernels DMA [F, chunk] blocks whose rows are
contiguous lane-aligned vectors — no transposes in the hot loop.

Padding slots get opacity 0 so they composite as no-ops and need no masks.
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
NUM_FIELDS = 9


def build_payload(
    proj: ProjectedGaussians,
    colors: jax.Array,  # [N, 3]
    opacity: jax.Array,  # [N]
    bins: TileBins,
) -> jax.Array:
    """Gather per-gaussian fields into the aligned pair layout [9, P_pad]."""
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
    payload = fields[:, idx]  # [9, P_pad]
    # Disable padding slots by zeroing opacity only (cheapest single mask).
    payload = payload.at[F_OPACITY].set(jnp.where(ok, payload[F_OPACITY], 0.0))
    return payload


def scatter_payload_grads(
    d_payload: jax.Array,  # [9, P_pad]
    bins: TileBins,
    n: int,
):
    """Scatter pair-payload cotangents back to per-gaussian arrays.

    Returns (d_means2d [N,2], d_conic [N,3], d_colors [N,3], d_opacity [N]).
    """
    src = bins.pair_src
    ok = src >= 0
    idx = jnp.where(ok, src, n)  # dump invalid into an extra slot
    d = jnp.where(ok[None, :], d_payload, 0.0)

    def acc(row):
        return jnp.zeros(n + 1, row.dtype).at[idx].add(row)[:n]

    d_means2d = jnp.stack([acc(d[F_MEAN_X]), acc(d[F_MEAN_Y])], axis=-1)
    d_conic = jnp.stack(
        [acc(d[F_CONIC_A]), acc(d[F_CONIC_B]), acc(d[F_CONIC_C])], axis=-1
    )
    d_colors = jnp.stack([acc(d[F_R]), acc(d[F_G]), acc(d[F_B])], axis=-1)
    d_opacity = acc(d[F_OPACITY])
    return d_means2d, d_conic, d_colors, d_opacity
