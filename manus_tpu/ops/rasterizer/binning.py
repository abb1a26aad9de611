"""Tile binning: turn projected gaussians into per-tile contiguous lists.

TPU-native replacement for the CUDA duplicate-and-radix-sort binning in
diff-gaussian-rasterization (see SURVEY.md section 2.9). Design:

  1. expand each gaussian into at most TG_MAX (gaussian, tile) pairs by
     enumerating its tile-rect slots (static [N, TG_MAX] grid; the
     slot->offset div/mod runs in f32 — TPUs have no vector integer
     divide, and the operands are tiny enough for exact f32 division).
     Gaussians whose rect exceeds TG_MAX tiles are truncated to a SUB-RECT
     (width clamped to TG_MAX, then rows to TG_MAX // width) rather than a
     raster-order slot prefix, so per-tile pair counts keep an exact
     rank-1 product form (see 3);
  2. ONE stable two-key XLA sort of the flat pair array keyed by
     (tile id, view depth) with the gaussian index as value — the depth
     key replaces the CUDA 64-bit tile|depth composite AND the earlier
     design's separate [N] depth argsort + [N]-gather of rects into depth
     order (measured ~1.5 ms of the ~5.5 ms binning cost at 65k/512^2;
     a fused single-int32 key was measured SLOWER than the two-key sort).
     Stability gives the reference tie-break: equal (tile, depth) pairs
     stay in slot order.
  3. per-tile segment bounds come from a closed-form histogram, not a
     searchsorted over the 1M sorted keys: each (possibly sub-rect
     truncated) gaussian covers a row-interval x column-interval of the
     tile grid, so counts[ty, tx] = sum_i row_i[ty] * col_i[tx] — one
     [nty, N] @ [N, ntx] MXU matmul (exact in f32: counts < 2^24) and a
     T-length cumsum. Segments then live at their NATURAL sorted offsets
     [start, end): no re-layout. (An earlier design re-laid segments out
     lane-aligned; the required 2M-wide table-gather + scatter cost
     ~27 ms/frame on v5e — far more than the raster kernel itself.) The
     Pallas kernel instead DMAs lane-aligned chunk windows covering each
     segment and masks the edge pairs by global position; gradient chunks
     are read-modify-write, race-free because the pallas grid is
     sequential on a core.

The sorted pair array is truncated to a static budget
(N * pair_budget_factor, rounded to the lane width): invalid pairs sort to
the tail and real pair counts are far below N*TG_MAX, so the budget only
drops work when a scene overflows it. All three drop paths (sub-rect
tg_max truncation, the pair budget — which chops the highest tile ids
first — and the per-tile max_pairs cap, which drops farthest-first) are
counted in overflow_count.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from manus_tpu.ops.rasterizer.projection import ProjectedGaussians


class TileBins(NamedTuple):
    """Pair layout for the raster kernels.

    pair_src: [P_budget] int32 — for each sorted pair slot, the index into
      the *original* (unsorted) gaussian arrays; -1 for the invalid tail.
    tile_offsets: [T] int32 — segment start of each tile (NOT lane-aligned).
    tile_counts: [T] int32 — number of pairs per tile (budget-clamped).
    overflow_count: [] int32 — pairs dropped (tg_max truncation + budget).
    """

    pair_src: jax.Array
    tile_offsets: jax.Array
    tile_counts: jax.Array
    overflow_count: jax.Array


def bin_gaussians(
    proj: ProjectedGaussians,
    num_tiles_x: int,
    num_tiles_y: int,
    tg_max: int,
    lane_align: int = 128,
    pair_budget_factor: int = 8,
    max_pairs_per_tile: int = 0,
) -> TileBins:
    n = proj.depth.shape[0]
    num_tiles = num_tiles_x * num_tiles_y

    rect = proj.tile_rect  # [N, 4], original (unsorted) order
    visible = proj.visible

    # -- 1. expand tile-rect slots (f32 div: operands < 2^10, exact).
    # Oversized rects truncate to a sub-rect (width first, then rows) so
    # the kept cells stay a row-interval x column-interval — the product
    # form the histogram in step 3 requires.
    rw = rect[:, 2] - rect[:, 0]
    rh = rect[:, 3] - rect[:, 1]
    n_slots = rw * rh
    rw_eff = jnp.clip(rw, 1, tg_max)
    rh_eff = jnp.minimum(rh, tg_max // rw_eff)
    slots = jnp.arange(tg_max, dtype=jnp.int32)
    dy = jnp.floor(
        slots[None, :].astype(jnp.float32) / rw_eff[:, None].astype(jnp.float32)
    ).astype(jnp.int32)
    dx = slots[None, :] - dy * rw_eff[:, None]
    pair_valid = (
        visible[:, None] & (dx < jnp.minimum(rw, rw_eff)[:, None])
        & (dy < rh_eff[:, None])
    )
    tile_id = (rect[:, 1:2] + dy) * num_tiles_x + (rect[:, 0:1] + dx)
    tile_id = jnp.where(pair_valid, tile_id, num_tiles).astype(jnp.int32)

    kept = jnp.minimum(rw, rw_eff) * rh_eff
    overflow = jnp.sum(
        jnp.where(visible, n_slots - kept, 0)
    ).astype(jnp.int32)

    # -- 2. one stable (tile, depth) two-key sort; values carry the
    # ORIGINAL gaussian index. Equal depths tie-break by slot order —
    # identical to the previous stable depth-argsort + stable tile sort.
    pair_tile = tile_id.reshape(-1)
    pair_depth = jnp.broadcast_to(
        proj.depth[:, None], (n, tg_max)
    ).reshape(-1)
    pair_gidx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, tg_max)
    ).reshape(-1)
    sorted_tile, _, sorted_gidx = jax.lax.sort(
        (pair_tile, pair_depth, pair_gidx), num_keys=2, is_stable=True
    )

    del sorted_tile  # bounds come from the closed-form histogram below

    # -- 3. segment bounds from the rank-1 histogram: counts[ty, tx] =
    # sum_i row_i[ty] col_i[tx] on the MXU (f32 exact: counts < 2^24),
    # then a T-length cumsum. Replaces a searchsorted over the 1M sorted
    # keys (~0.4 ms at 65k/512^2) and decouples bounds from the sort.
    ty = jnp.arange(num_tiles_y, dtype=jnp.int32)[None, :]
    tx = jnp.arange(num_tiles_x, dtype=jnp.int32)[None, :]
    row = (
        (ty >= rect[:, 1:2]) & (ty < rect[:, 1:2] + rh_eff[:, None])
        & visible[:, None]
    ).astype(jnp.float32)
    col = (
        (tx >= rect[:, 0:1]) & (tx < rect[:, 0:1] + jnp.minimum(rw, rw_eff)[:, None])
    ).astype(jnp.float32)
    counts2d = jax.lax.dot_general(
        row, col, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [nty, ntx]
    bounds = jnp.concatenate(
        [
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(counts2d.reshape(-1).astype(jnp.int32)),
        ]
    )

    p_budget = n * tg_max
    if pair_budget_factor > 0:
        p_budget = min(p_budget, n * pair_budget_factor)
    p_budget = ((p_budget + lane_align - 1) // lane_align) * lane_align

    starts = jnp.minimum(bounds[:-1], p_budget)
    ends = jnp.minimum(bounds[1:], p_budget)
    counts = ends - starts
    overflow = overflow + jnp.sum((bounds[1:] - bounds[:-1]) - counts).astype(
        jnp.int32
    )
    if max_pairs_per_tile > 0:
        # Per-tile cap: truncate back-to-front (segments are depth-ordered,
        # farthest pairs drop first) and COUNT the truncation, so the xla
        # backend's static loop bound and the pallas backend composite the
        # same clamped segments and the overflow diagnostic sees it.
        overflow = overflow + jnp.sum(
            jnp.maximum(counts - max_pairs_per_tile, 0)
        ).astype(jnp.int32)
        counts = jnp.minimum(counts, max_pairs_per_tile)

    total_valid = jnp.minimum(bounds[num_tiles], p_budget)
    take = min(p_budget, n * tg_max)
    src = sorted_gidx[:take]
    if p_budget > take:  # lane rounding can exceed the raw pair count
        src = jnp.concatenate(
            [src, jnp.full((p_budget - take,), -1, jnp.int32)]
        )
    slot_ids = jnp.arange(p_budget, dtype=jnp.int32)
    pair_src = jnp.where(slot_ids < total_valid, src, -1)

    return TileBins(
        pair_src=pair_src.astype(jnp.int32),
        tile_offsets=starts,
        tile_counts=counts,
        overflow_count=overflow,
    )
