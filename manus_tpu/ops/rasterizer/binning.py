"""Tile binning: turn depth-sorted gaussians into per-tile contiguous lists.

TPU-native replacement for the CUDA duplicate-and-radix-sort binning in
diff-gaussian-rasterization (see SURVEY.md section 2.9). Design:

  1. argsort gaussians by view depth ([N] XLA sort, stable);
  2. expand each gaussian into at most TG_MAX (gaussian, tile) pairs by
     enumerating its tile-rect slots (static [N, TG_MAX] grid — no dynamic
     allocation);
  3. one stable XLA sort of the flat pair array keyed by tile id — because
     pairs are generated in depth order, stability gives per-tile
     front-to-back order for free (no 64-bit composite keys needed);
  4. per-tile segments via searchsorted, then re-laid-out so every tile's
     segment starts at a LANE-aligned offset. Alignment means the Pallas
     raster kernel can DMA fixed-size chunks at aligned dynamic offsets,
     and the padding slots are simply given opacity 0 (they composite to a
     no-op) — no validity masks in the hot loop.

Gaussians whose tile rect exceeds TG_MAX tiles are truncated (row-major
from the rect origin); `overflow_count` reports how many. Size TG_MAX so
this is zero in practice (radii are pruned during training).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from manus_tpu.ops.rasterizer.projection import ProjectedGaussians


class TileBins(NamedTuple):
    """Pair layout for the raster kernels.

    pair_src: [P_pad] int32 — for each aligned pair slot, the index into the
      *original* (unsorted) gaussian arrays; -1 for padding slots.
    tile_offsets: [T] int32 — aligned start of each tile's segment.
    tile_counts: [T] int32 — number of real pairs per tile.
    overflow_count: [] int32 — pairs dropped due to TG_MAX truncation.
    depth_order: [N] int32 — gaussians sorted by depth (diagnostics).
    """

    pair_src: jax.Array
    tile_offsets: jax.Array
    tile_counts: jax.Array
    overflow_count: jax.Array
    depth_order: jax.Array


def bin_gaussians(
    proj: ProjectedGaussians,
    num_tiles_x: int,
    num_tiles_y: int,
    tg_max: int,
    lane_align: int = 128,
    pair_budget_factor: int = 0,
) -> TileBins:
    """See module docstring. pair_budget_factor > 0 caps the aligned pair
    buffer at N*factor + T*lane_align slots (instead of the N*tg_max worst
    case), shrinking every downstream P_pad-sized op; overflowing pairs are
    dropped farthest-first per tile and counted in overflow_count."""
    n = proj.depth.shape[0]
    num_tiles = num_tiles_x * num_tiles_y

    # -- 1. depth order (invisible gaussians pushed to the back so their
    # pairs cluster at the sentinel; stable to match CUDA tie-breaking).
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)

    rect = proj.tile_rect[order]  # [N, 4]
    visible = proj.visible[order]

    # -- 2. expand tile-rect slots.
    rw = rect[:, 2] - rect[:, 0]
    rh = rect[:, 3] - rect[:, 1]
    n_slots = rw * rh
    rw_safe = jnp.maximum(rw, 1)
    slots = jnp.arange(tg_max, dtype=jnp.int32)
    dx = slots[None, :] % rw_safe[:, None]
    dy = slots[None, :] // rw_safe[:, None]
    pair_valid = visible[:, None] & (slots[None, :] < n_slots[:, None])
    tile_id = (rect[:, 1:2] + dy) * num_tiles_x + (rect[:, 0:1] + dx)
    tile_id = jnp.where(pair_valid, tile_id, num_tiles).astype(jnp.int32)

    overflow = jnp.sum(
        jnp.where(visible, jnp.maximum(n_slots - tg_max, 0), 0)
    ).astype(jnp.int32)

    # -- 3. stable sort pairs by tile id; values carry the ORIGINAL gaussian
    # index directly (saves a 2M-wide gather after the sort).
    pair_tile = tile_id.reshape(-1)
    pair_gidx = jnp.broadcast_to(order[:, None], (n, tg_max)).reshape(-1)
    sorted_tile, sorted_gidx = jax.lax.sort(
        (pair_tile, pair_gidx), num_keys=1, is_stable=True
    )

    # -- 4. per-tile segments + lane-aligned re-layout.
    # Segment boundaries: T+1 queries against the sorted keys (cheap).
    tids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    starts = bounds[:-1]
    counts = bounds[1:] - starts

    aligned_sizes = ((counts + lane_align - 1) // lane_align) * lane_align
    tile_offsets = (jnp.cumsum(aligned_sizes) - aligned_sizes).astype(jnp.int32)

    # Scatter each sorted pair to its aligned destination. Destinations are
    # strictly increasing over valid pairs (sorted by tile, ranks ascending,
    # offsets ascending), so the scatter is sorted+unique — this avoids a
    # P_pad-sized searchsorted, which costs two orders of magnitude more on
    # TPU than table lookups + one monotone scatter.
    p_pad = n * tg_max + num_tiles * lane_align  # static worst case
    if pair_budget_factor > 0:
        p_pad = min(p_pad, n * pair_budget_factor + num_tiles * lane_align)
    p_idx = jnp.arange(n * tg_max, dtype=jnp.int32)
    tile_c = jnp.minimum(sorted_tile, num_tiles - 1)
    # dst = offset[tile] + (p - start[tile]): fold the two tables into one.
    delta = tile_offsets - starts  # [T]
    dst = p_idx + jnp.take(delta, tile_c)
    valid = sorted_tile < num_tiles
    # invalid pairs (the sorted tail) get distinct, increasing OOB indices,
    # disjoint from any (possibly budget-overflowing) valid dst, so the
    # sorted+unique hints stay sound under mode="drop"
    oob_base = n * tg_max + num_tiles * lane_align
    dst_full = jnp.where(valid, dst, oob_base + p_idx)
    pair_src = jnp.full((p_pad,), -1, jnp.int32).at[dst_full].set(
        sorted_gidx, mode="drop", indices_are_sorted=True, unique_indices=True
    )

    # Budget truncation: segments that spill past p_pad lose their farthest
    # pairs (counts clamped so kernels never read past the buffer).
    counts_eff = jnp.clip(p_pad - tile_offsets, 0, counts)
    overflow = overflow + jnp.sum(counts - counts_eff).astype(jnp.int32)
    tile_offsets = jnp.minimum(tile_offsets, p_pad - lane_align)

    return TileBins(
        pair_src=pair_src.astype(jnp.int32),
        tile_offsets=tile_offsets,
        tile_counts=counts_eff,
        overflow_count=overflow,
        depth_order=order,
    )
