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
) -> TileBins:
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

    # -- 3. stable sort pairs by tile id; values carry the position in the
    # depth-sorted array.
    pair_tile = tile_id.reshape(-1)
    pair_pos = jnp.arange(n * tg_max, dtype=jnp.int32) // tg_max  # row = sorted idx
    sorted_tile, sorted_pos = jax.lax.sort(
        (pair_tile, pair_pos), num_keys=1, is_stable=True
    )

    # -- 4. per-tile segments + lane-aligned re-layout.
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tids, side="right").astype(jnp.int32)
    counts = ends - starts

    aligned_sizes = ((counts + lane_align - 1) // lane_align) * lane_align
    tile_offsets = (jnp.cumsum(aligned_sizes) - aligned_sizes).astype(jnp.int32)

    p_pad = n * tg_max + num_tiles * lane_align  # static worst case
    slot_ids = jnp.arange(p_pad, dtype=jnp.int32)
    # Which tile does each aligned slot belong to?
    seg_end = tile_offsets + aligned_sizes
    slot_tile = jnp.searchsorted(seg_end, slot_ids, side="right").astype(jnp.int32)
    slot_tile_c = jnp.minimum(slot_tile, num_tiles - 1)
    within = slot_ids - tile_offsets[slot_tile_c]
    slot_ok = (slot_tile < num_tiles) & (within < counts[slot_tile_c])
    src_pair = jnp.clip(starts[slot_tile_c] + within, 0, n * tg_max - 1)
    # aligned slot -> depth-sorted gaussian -> original gaussian index
    pair_src = jnp.where(slot_ok, order[sorted_pos[src_pair]], -1)

    return TileBins(
        pair_src=pair_src.astype(jnp.int32),
        tile_offsets=tile_offsets,
        tile_counts=counts,
        overflow_count=overflow,
        depth_order=order,
    )
