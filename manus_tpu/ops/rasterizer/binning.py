"""Tile binning: turn projected gaussians into per-tile contiguous lists.

TPU-native replacement for the CUDA duplicate-and-radix-sort binning in
diff-gaussian-rasterization (see SURVEY.md section 2.9). Design:

  1. expand each gaussian's tile-rect cells in SIZE TIERS: every visible
     gaussian emits its top-left cell ([N] slots); multi-tile gaussians,
     split into size classes (2..8 cells, 9..TG_MAX cells) and compacted
     by cheap [N] sorts into static per-class blocks, emit the rest of
     their rect. Most gaussians touch one tile and most multis 2-8, so
     this shrinks the sorted slot count ~4-15x vs the flat [N, TG_MAX]
     expansion at equal coverage.
     Gaussians whose rect exceeds TG_MAX tiles are truncated to a
     SUB-RECT (width clamped to TG_MAX, then rows to TG_MAX // width)
     rather than a raster-order slot prefix, and multis beyond the
     multi_frac capacity degrade to their top-left cell only — both
     keep per-tile pair counts in the exact rank-1 product form the
     histogram in step 3 requires, and both are overflow-counted;
  2. ONE three-key XLA sort of the concatenated tiers keyed by
     (tile id, view depth, gaussian id). The keys are unique per pair
     (a gaussian contributes at most one pair per tile), so no
     stability is needed, and the order equals the reference tie-break
     (the depth key replaces the CUDA 64-bit tile|depth composite;
     equal depths order by gaussian id exactly like the old stable
     slot-order sort);
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

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from manus_tpu.ops.rasterizer.projection import ProjectedGaussians


@functools.lru_cache(maxsize=64)
def tile_owner_tables(num_tiles_x: int, num_tiles_y: int, num_owners: int):
    """Static tile->owner assignment for tile-sharded rasterisation.

    A flat round-robin (tile t -> t mod n) degenerates when n divides the
    grid width: t mod n is then the tile's image COLUMN, so each mesh
    column owns a vertical stripe and a hand centered in the frame lands
    almost entirely on one or two columns (observed: 587 dropped pairs at
    64^2/g=4 where the unsharded run dropped none). Instead tiles are
    DEALT one-by-one in diagonal scan order ((tx+ty, tx) ascending) —
    spatial neighbours go to different owners for any n — which also
    guarantees exactly T/n tiles per owner.

    Returns numpy arrays (owner[T], rank[T] — slot index within the
    owner's id-ascending list, owned_ids[n, T/n], perm[T] — position of
    global tile t in the owner-major all_gather output).
    """
    assert (num_tiles_x * num_tiles_y) % num_owners == 0
    t = np.arange(num_tiles_x * num_tiles_y)
    tx, ty = t % num_tiles_x, t // num_tiles_x
    deal = np.lexsort((tx, tx + ty))  # diagonal scan order
    owner = np.empty(t.shape[0], np.int32)
    owner[deal] = np.arange(t.shape[0], dtype=np.int32) % num_owners
    t_local = t.shape[0] // num_owners
    rank = np.zeros_like(owner)
    owned_ids = np.empty((num_owners, t_local), np.int32)
    for c in range(num_owners):
        ids = np.flatnonzero(owner == c)
        owned_ids[c] = ids
        rank[ids] = np.arange(ids.shape[0], dtype=np.int32)
    perm = owner * t_local + rank
    return owner, rank, owned_ids, perm


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
    # portion of overflow_count from the per-tile max_pairs cap: those
    # drops are the FARTHEST pairs of depth-sorted segments, which
    # forward early-termination usually never reaches — harmless in
    # opaque scenes, unlike the coverage-loss remainder
    # (overflow_count - overflow_far: tg_max sub-rect truncation,
    # multi-capacity degradation, pair-budget tile drops).
    overflow_far: jax.Array


def bin_gaussians(
    proj: ProjectedGaussians,
    num_tiles_x: int,
    num_tiles_y: int,
    tg_max: int,
    lane_align: int = 128,
    pair_budget_factor: int = 8,
    max_pairs_per_tile: int = 0,
    multi_frac: float = 1.0,
    multi_floor: int = 4096,
    tile_owner_axis: Optional[str] = None,
    num_owners: int = 1,
) -> TileBins:
    """See module docstring. With (tile_owner_axis, num_owners > 1) —
    inside shard_map over that mesh axis — each column bins only the
    tiles it OWNS under the static dealt-diagonal interleave of
    `tile_owner_tables` (contiguous blocks lose badly to occupancy skew —
    SURVEY §5.7 names the load balance the hard part — and a flat t mod n
    degenerates into vertical stripes when n divides the grid width). The
    expansion and the [N]-sorts still run on the full cloud (cheap), but
    the budgeted pair array, the payload gather built from it, and the
    backward's segmented sums all shrink to the column's share.
    tile_offsets/counts come back LOCAL ([T / num_owners], local slot i =
    global tile tile_owner_tables(...)[2][owner, i]) and overflow counts
    are psum'd so every column reports the same global totals."""
    n = proj.depth.shape[0]
    num_tiles = num_tiles_x * num_tiles_y
    sharded = num_owners > 1
    if sharded:
        assert num_tiles % num_owners == 0, (num_tiles, num_owners)
        owner = jax.lax.axis_index(tile_owner_axis).astype(jnp.int32)
        owner_np, rank_np, owned_np, _ = tile_owner_tables(
            num_tiles_x, num_tiles_y, num_owners
        )
    t_local = num_tiles // num_owners

    rect = proj.tile_rect  # [N, 4], original (unsorted) order
    visible = proj.visible

    # -- 1. size-tiered slot expansion. Most gaussians touch exactly ONE
    # tile and most multis touch 2-8, so a flat [N, TG_MAX] expansion
    # sorts mostly-dead slots (tg_max=64 at 131k gaussians = an 8.4M-slot
    # sort, ~12 ms on v5e). Instead: tier 0 gives EVERY visible gaussian
    # its top-left rect cell ([N] slots); each higher tier expands the
    # REMAINING rect cells for one size class of multi-tile gaussians,
    # compacted (by a cheap [N] sort) into a static [capacity, class_max-1]
    # block. Multis beyond a class capacity degrade gracefully to 1-tile
    # (top-left) coverage — their effective rect is clamped to 1x1, which
    # keeps the bounds histogram (step 3) exactly consistent — and the
    # lost cells are overflow-counted.
    #
    # Oversized rects truncate to a sub-rect (width clamped first, then
    # rows) so kept cells stay a row-interval x column-interval — the
    # product form the histogram requires. All index arithmetic that
    # needs a vector divide runs in f32 (exact: operands < 2^10).
    rw = rect[:, 2] - rect[:, 0]
    rh = rect[:, 3] - rect[:, 1]
    n_slots = rw * rh
    rw_eff = jnp.clip(rw, 1, tg_max)
    rh_eff = jnp.minimum(rh, tg_max // rw_eff)
    rw_kept = jnp.minimum(rw, rw_eff)

    kept0 = rw_kept * rh_eff
    is_multi = visible & (kept0 > 1)
    gids = jnp.arange(n, dtype=jnp.int32)

    # Size-tier ladder: (max cells, static capacity) per multi class.
    # Small multis (2..8 cells) dominate real scenes, so giving them a
    # narrow 7-slot block and reserving the wide tg_max-1 block for the
    # rare big rects keeps the sorted slot count ~Nx4 instead of
    # N x tg_max. Capacity floors keep small scenes pressure-free; the
    # fractional caps only bite at scale, where the sort savings matter.
    small_max = min(8, tg_max)
    tiers = []
    if tg_max >= 2:
        tiers.append((2, small_max,
                      min(n, max(multi_floor, int(round(n * multi_frac))))))
    if tg_max > small_max:
        # multi_frac >= 1 means NO capacity pressure in either class; the
        # /8 heuristic (big rects are ~8x rarer than small multis) only
        # shapes the static block when a fractional cap was asked for
        cap_big = n if multi_frac >= 1.0 else min(
            n, max(multi_floor // 4, int(round(n * multi_frac / 8)))
        )
        tiers.append((small_max + 1, tg_max, cap_big))

    def admit(in_class, lo, hi, cap):
        """Size-prioritized admission within one class: the LARGEST rects
        keep full expansion (they lose the most cells if degraded) and
        the smallest degrade first. Scatter-free: c[s] = #class members
        of size >= s is a tiny [N, hi-lo+1] compare-reduce; s* is the
        smallest size that fits, and the partial size class s*-1 is
        admitted in gaussian-id order via a cumsum rank."""
        sizes = jnp.arange(lo, hi + 1, dtype=jnp.int32)
        c = jnp.sum(
            (kept0[:, None] >= sizes[None, :]) & in_class[:, None], axis=0
        )  # non-increasing in s
        s_star = jnp.min(jnp.where(c <= cap, sizes, hi + 1))
        n_big = jnp.sum(in_class & (kept0 >= s_star))
        part = in_class & (kept0 == s_star - 1)
        rank = jnp.cumsum(part.astype(jnp.int32))  # 1-based inclusive
        return in_class & (
            (kept0 >= s_star) | (part & (rank <= cap - n_big))
        )

    # tier 0: top-left cell of every visible gaussian
    tile_blocks = [jnp.where(
        visible, rect[:, 1] * num_tiles_x + rect[:, 0], num_tiles
    ).astype(jnp.int32)]
    depth_blocks = [proj.depth]
    gidx_blocks = [gids]

    rw_f = jnp.where(visible, 1, 0)
    rh_f = jnp.where(visible, 1, 0)
    for lo, hi, cap in tiers:
        in_class = is_multi & (kept0 >= lo) & (kept0 <= hi)
        inc = admit(in_class, lo, hi, cap)
        rw_f = jnp.where(inc, rw_kept, rw_f)
        rh_f = jnp.where(inc, rh_eff, rh_f)
        # Compact the admitted class (stable -> gid order), carrying every
        # per-gaussian field the expansion needs as sort VALUES — TPU row
        # gathers cost ~30 ns/row regardless of width, so takes of the
        # compacted block would cost more than the whole [N] sort; extra
        # sort operands are nearly free by comparison. Then expand rect
        # slots 1..kept-1 into a [cap, hi-1] block.
        mkey = jnp.where(inc, 0, 1).astype(jnp.int32)
        skey, mgid, m_x0, m_y0, m_rw, m_kept, m_depth = jax.lax.sort(
            (mkey, gids, rect[:, 0], rect[:, 1], rw_kept, kept0,
             proj.depth),
            num_keys=1, is_stable=True,
        )
        m_ok = skey[:cap] == 0
        mgid = mgid[:cap]
        m_x0, m_y0 = m_x0[:cap, None], m_y0[:cap, None]
        # tail rows past the admitted count are arbitrary (possibly
        # invisible, rw = 0) — keep the div finite; m_ok masks their slots
        m_rw = jnp.maximum(m_rw[:cap], 1)
        m_kept = m_kept[:cap]
        m_depth = m_depth[:cap]
        slots = jnp.arange(1, hi, dtype=jnp.int32)  # rect slots 1..hi-1
        dy = jnp.floor(
            slots[None, :].astype(jnp.float32)
            / m_rw[:, None].astype(jnp.float32)
        ).astype(jnp.int32)
        dx = slots[None, :] - dy * m_rw[:, None]
        m_valid = m_ok[:, None] & (slots[None, :] < m_kept[:, None])
        tile_k = (m_y0 + dy) * num_tiles_x + (m_x0 + dx)
        tile_blocks.append(
            jnp.where(m_valid, tile_k, num_tiles).astype(jnp.int32).reshape(-1)
        )
        depth_blocks.append(jnp.broadcast_to(
            m_depth[:, None], (cap, hi - 1)).reshape(-1))
        gidx_blocks.append(jnp.broadcast_to(
            mgid[:, None], (cap, hi - 1)).reshape(-1))

    kept = rw_f * rh_f
    # tg-truncation / multi-degradation drops: computed from the FULL
    # rects, so under tile-owner sharding this piece is replicated
    # identical on every column (added once, no psum)
    overflow_trunc = jnp.sum(
        jnp.where(visible, n_slots - kept, 0)
    ).astype(jnp.int32)

    # -- 2. one three-key sort over the concatenated tiers. Keys
    # (tile, depth, gaussian id) are unique per pair, so no stability is
    # needed and the order equals the old stable slot-order tie-break:
    # within a tile, ascending depth, ties by gaussian id (two pairs of
    # the same gaussian can never share a tile).
    pair_tile = jnp.concatenate(tile_blocks)
    pair_depth = jnp.concatenate(depth_blocks)
    pair_gidx = jnp.concatenate(gidx_blocks)
    n_exp = int(pair_tile.shape[0])
    if sharded:
        # keep only pairs of OWNED tiles, re-keyed to the owner's local
        # slot order via the static rank table; foreign/invalid pairs
        # key to the t_local sentinel and sort to the tail
        safe_t = jnp.minimum(pair_tile, num_tiles - 1)
        is_local = (pair_tile < num_tiles) & (
            jnp.asarray(owner_np)[safe_t] == owner
        )
        pair_key = jnp.where(is_local, jnp.asarray(rank_np)[safe_t], t_local)
    else:
        pair_key = pair_tile
    _, _, sorted_gidx = jax.lax.sort(
        (pair_key, pair_depth, pair_gidx), num_keys=3
    )

    # -- 3. segment bounds from the rank-1 histogram: counts[ty, tx] =
    # sum_i row_i[ty] col_i[tx] on the MXU (f32 exact: counts < 2^24),
    # then a T-length cumsum. Replaces a searchsorted over the 1M sorted
    # keys (~0.4 ms at 65k/512^2) and decouples bounds from the sort.
    ty = jnp.arange(num_tiles_y, dtype=jnp.int32)[None, :]
    tx = jnp.arange(num_tiles_x, dtype=jnp.int32)[None, :]
    row = (
        (ty >= rect[:, 1:2]) & (ty < rect[:, 1:2] + rh_f[:, None])
        & visible[:, None]
    ).astype(jnp.float32)
    col = (
        (tx >= rect[:, 0:1]) & (tx < rect[:, 0:1] + rw_f[:, None])
    ).astype(jnp.float32)
    counts2d = jax.lax.dot_general(
        row, col, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [nty, ntx]
    flat_counts = counts2d.reshape(-1).astype(jnp.int32)
    if sharded:
        flat_counts = jnp.take(
            flat_counts, jnp.asarray(owned_np)[owner]
        )
    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(flat_counts)]
    )

    p_budget = n_exp
    if pair_budget_factor > 0:
        p_budget = min(p_budget, n * pair_budget_factor)
    if sharded:
        # Each column keeps 1.5x its even share of the global budget PLUS
        # an absolute 8-lane floor: the dealt interleave spreads dense
        # regions at real tile counts, but per-column totals fluctuate —
        # and on tiny grids (e.g. the 16-tile test scenes) a handful of
        # occupied tiles cannot be balanced statically at all, so the
        # relative headroom alone dropped pairs the unsharded run kept
        # (952-pair column vs a 768 share: a 1.6e-5 loss mismatch at
        # g=4). The floor makes small scenes pressure-free while large
        # scenes keep the ~1/g buffer savings; residual drops under
        # extreme skew are overflow-counted like every other drop path.
        p_budget = min(
            p_budget,
            -(-(p_budget * 3) // (2 * num_owners)) + 8 * lane_align,
        )
    p_budget = ((p_budget + lane_align - 1) // lane_align) * lane_align

    starts = jnp.minimum(bounds[:-1], p_budget)
    ends = jnp.minimum(bounds[1:], p_budget)
    counts = ends - starts
    overflow_budget = jnp.sum(
        (bounds[1:] - bounds[:-1]) - counts
    ).astype(jnp.int32)
    overflow_far = jnp.zeros((), jnp.int32)
    if max_pairs_per_tile > 0:
        # Per-tile cap: truncate back-to-front (segments are depth-ordered,
        # farthest pairs drop first) and COUNT the truncation, so the xla
        # backend's static loop bound and the pallas backend composite the
        # same clamped segments and the overflow diagnostic sees it.
        overflow_far = jnp.sum(
            jnp.maximum(counts - max_pairs_per_tile, 0)
        ).astype(jnp.int32)
        counts = jnp.minimum(counts, max_pairs_per_tile)
    if sharded:
        # budget/cap drops are per-column (each pair is owned by exactly
        # one column); report global totals on every column
        overflow_budget = jax.lax.psum(overflow_budget, tile_owner_axis)
        overflow_far = jax.lax.psum(overflow_far, tile_owner_axis)
    overflow = overflow_trunc + overflow_budget + overflow_far

    total_valid = jnp.minimum(bounds[t_local], p_budget)
    take = min(p_budget, n_exp)
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
        overflow_far=overflow_far,
    )
