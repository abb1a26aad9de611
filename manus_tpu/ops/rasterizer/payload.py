"""Pair-payload construction for the tiled raster kernels.

The payload is a field-major [16, P_pad] f32 array: one column per
(gaussian, tile) pair in lane-aligned per-tile segments (see binning.py),
with the 9 live fields in the first rows and zero padding to 16. A
[16, 128] chunk slice is 16 contiguous 512B bursts and lands on a
128-lane-aligned column offset, which the Mosaic DMA engine requires; in
the kernel each field is a [1, G] row that broadcasts against [Px, 1]
pixel columns with no transposes.

Padding slots get all-zero columns (opacity 0 composites as a no-op).

Layout strategy (measured on v5e): the naive field-major gather
`fields[:, idx]` walks the MINOR dimension — XLA lowers it (and its
scatter-add transpose on the backward) element-wise, ~1.4 + ~1.5 ms at
65k/512^2. Instead both directions run on the MAJOR dimension:

  forward:  row gather  [N, 16] -> [P, 16]  + one tiled transpose;
  backward: row scatter [P, 16] -> [N*TG, 16] keyed by the pair's flat
            pre-sort slot id (bins.pair_slot). Every live slot id appears
            exactly once and dead tail entries carry unique out-of-range
            ids, so the scatter is a pure `unique_indices` permutation
            (no atomics/serialization), and the per-gaussian gradient is
            a dense [N, TG, 16] -> [N, 16] sum — no scatter-ADD anywhere.

The backward is a custom VJP because autodiff of the forward gather would
reintroduce exactly the scatter-add this layout exists to avoid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from manus_tpu.ops.rasterizer.binning import TileBins
from manus_tpu.ops.rasterizer.projection import ProjectedGaussians

# Field order (rows of the payload matrix).
F_MEAN_X, F_MEAN_Y = 0, 1
F_CONIC_A, F_CONIC_B, F_CONIC_C = 2, 3, 4
F_OPACITY = 5
F_R, F_G, F_B = 6, 7, 8
NUM_FIELDS = 16  # padded so the chunk buffer keeps (8, 128)-friendly shape


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_pairs(tg_max, means2d, conic, colors, opacity, src, slot):
    rows = _gather_rows(means2d, conic, colors, opacity, src)
    return rows.T  # [16, P]


def _gather_rows(means2d, conic, colors, opacity, src):
    fields = jnp.concatenate(
        [
            means2d,  # [N, 2]
            conic,  # [N, 3]
            opacity[:, None],  # [N, 1]
            colors,  # [N, 3]
            jnp.zeros((means2d.shape[0], NUM_FIELDS - 9), means2d.dtype),
        ],
        axis=1,
    )  # [N, 16]
    ok = src >= 0
    rows = fields[jnp.maximum(src, 0)]  # [P, 16] major-dim row gather
    return jnp.where(ok[:, None], rows, 0.0)


def _gather_pairs_fwd(tg_max, means2d, conic, colors, opacity, src, slot):
    out = _gather_pairs(tg_max, means2d, conic, colors, opacity, src, slot)
    return out, (means2d.shape[0], src, slot)


def _gather_pairs_bwd(tg_max, res, d_payload):
    n, src, slot = res
    d_rows = d_payload.T  # [P, 16]
    # Unique-index row permutation back to pre-sort slot layout; dead
    # entries carry out-of-range ids and drop.
    acc = jnp.zeros((n * tg_max, NUM_FIELDS), d_rows.dtype)
    acc = acc.at[slot].set(d_rows, mode="drop", unique_indices=True)
    d_fields = acc.reshape(n, tg_max, NUM_FIELDS).sum(axis=1)  # [N, 16]
    zero_i = np.zeros(src.shape, jax.dtypes.float0)
    return (
        d_fields[:, 0:2],  # means2d
        d_fields[:, 2:5],  # conic
        d_fields[:, 6:9],  # colors
        d_fields[:, 5],  # opacity
        zero_i,
        zero_i,
    )


_gather_pairs.defvjp(_gather_pairs_fwd, _gather_pairs_bwd)


def build_payload(
    proj: ProjectedGaussians,
    colors: jax.Array,  # [N, 3]
    opacity: jax.Array,  # [N]
    bins: TileBins,
    tg_max: int,
) -> jax.Array:
    """Gather per-gaussian fields into the aligned pair layout [16, P_pad].

    tg_max must match the value `bins` was built with (it fixes the
    [N, TG] slot layout the backward reduces over).
    """
    return _gather_pairs(
        tg_max, proj.means2d, proj.conic, colors, opacity,
        bins.pair_src, bins.pair_slot,
    )
