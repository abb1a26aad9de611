"""Pallas TPU tile-compositing kernels (forward + hand-derived backward).

This is the hot path of the framework: per-tile front-to-back alpha
compositing of binned, depth-ordered gaussian pairs, with

  * lane-aligned, double-buffered chunk DMAs from the field-major
    [16, P_budget] payload; tile segments sit at their natural sorted
    offsets and the kernel masks edge pairs by global position (cheaper
    by ~27 ms/frame than re-laying segments out lane-aligned in XLA),
  * all-VPU/MXU math in a [Px, G] = [256, chunk] layout with zero
    transposes (fields broadcast as [1, G] rows, pixels as [Px, 1] iotas),
  * cumulative transmittance via an MXU triangular-matmul prefix sum,
  * per-tile early exit once every pixel saturates (the reference CUDA
    kernel's per-pixel `done` flag, lifted to tile granularity),
  * a custom VJP whose backward kernel re-walks the chunks in reverse,
    reconstructing transmittance analytically. Edge chunks are shared
    between adjacent tiles, so gradient writes are read-modify-write into
    a pre-zeroed aliased output — race-free because the pallas grid runs
    sequentially on a TensorCore (dimension_semantics "arbitrary").

Gradient semantics replicate the upstream CUDA rasterizer exactly
(straight-through 0.99 alpha clamp, hard 1/255 and 1e-4 gates); parity is
enforced against the oracle/XLA paths in tests/test_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manus_tpu.ops.rasterizer.oracle import ALPHA_EPS, ALPHA_MAX, T_EPS
from manus_tpu.ops.rasterizer.payload import (
    F_CONIC_A,
    F_CONIC_B,
    F_CONIC_C,
    F_MEAN_X,
    F_MEAN_Y,
    F_OPACITY,
    F_R,
    NUM_FIELDS,
)

LOG_T_EPS = float(np.log(T_EPS))
HI = jax.lax.Precision.HIGHEST


def _upper_tri_incl(chunk: int):
    """U[j, g] = 1 where j <= g: inclusive prefix-sum operator for the
    [Px, G] layout (x @ U), built in-kernel (pallas kernels cannot capture
    array constants)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (rows <= cols).astype(jnp.float32)


def _pixel_coords(t, ntx: int, tile: int):
    """Pixel-center coordinates of tile t as two [Px, 1] f32 columns."""
    tx = t % ntx
    ty = t // ntx
    i = jax.lax.broadcasted_iota(jnp.int32, (tile * tile, 1), 0)
    px = (tx * tile + i % tile).astype(jnp.float32)
    py = (ty * tile + i // tile).astype(jnp.float32)
    return px, py


def _chunk_alpha(buf, px, py, seg_mask):
    """Shared fwd/bwd per-chunk alpha math. buf: [16, G] payload chunk.

    seg_mask [1, G]: pairs of this chunk belonging to the current tile's
    segment (edge chunks contain neighbors' pairs). Returns (alpha [Px, G]
    gated+clamped+masked, g_val = exp(power), dx, dy, ca, cb, cc, op).
    """
    mx = buf[F_MEAN_X : F_MEAN_X + 1, :]
    my = buf[F_MEAN_Y : F_MEAN_Y + 1, :]
    ca = buf[F_CONIC_A : F_CONIC_A + 1, :]
    cb = buf[F_CONIC_B : F_CONIC_B + 1, :]
    cc = buf[F_CONIC_C : F_CONIC_C + 1, :]
    op = buf[F_OPACITY : F_OPACITY + 1, :]
    dx = px - mx  # [Px, G]
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g_val = jnp.exp(power)
    alpha = jnp.minimum(op * g_val, ALPHA_MAX)
    keep = (power <= 0.0) & (alpha >= ALPHA_EPS) & seg_mask
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, g_val, dx, dy, ca, cb, cc, op


def _seg_geometry(start, count, chunk):
    """(first_chunk, n_chunks) covering [start, start+count) with aligned
    chunks; n_chunks is 0 for empty segments."""
    end = start + count
    first = start // chunk
    n_chunks = jnp.where(count > 0, (end + chunk - 1) // chunk - first, 0)
    return first, n_chunks, end


PREFETCH_DEPTH = 4  # in-flight payload chunk DMAs per kernel walk


def _make_fwd_kernel(ntx: int, tile: int, chunk: int, tpp: int):
    n_px = tile * tile
    depth = PREFETCH_DEPTH

    def kernel(
        tids_ref,  # scalar prefetch [T_local]: global tile id per slot
        offs_ref,  # scalar prefetch [T_local]
        cnts_ref,  # scalar prefetch [T_local]
        payload_ref,  # ANY [16, P_budget]
        rgb_ref,  # out [tpp, Px, 3]
        tfin_ref,  # out [tpp, Px, 1]
        aux_ref,  # out [tpp, Px, 2]: col 0 = log T at stop, col 1 = k_stop
        buf,  # VMEM scratch [depth, 16, chunk] (multi-buffered)
        sem,  # DMA sem [depth]
    ):
        # Each grid program composites `tpp` consecutive tiles: sparse
        # scenes average ~1 chunk per tile, so per-program dispatch
        # overhead (not chunk work) dominates a 1-tile grid — batching
        # tiles amortizes it and reuses the iota/triangular constants.
        p = pl.program_id(0)
        u_incl = _upper_tri_incl(chunk)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

        def tile_body(j, carry):
            t = p * tpp + j
            count = cnts_ref[t]

            # Empty tiles (most of a sparse scene: the bench hand covers
            # ~8% of the 512^2 tile grid) short-circuit to constant
            # writes — no pixel iotas, loop setup, or drain bookkeeping.
            @pl.when(count == 0)
            def _():
                rgb_ref[j] = jnp.zeros((n_px, 3), jnp.float32)
                tfin_ref[j] = jnp.ones((n_px, 1), jnp.float32)
                aux_ref[j] = jnp.zeros((n_px, 2), jnp.float32)

            @pl.when(count > 0)
            def _():
                _walk_tile(j, t)
            return carry

        def _walk_tile(j, t):
            start_seg = offs_ref[t]
            count = cnts_ref[t]
            first, n_chunks, end_seg = _seg_geometry(start_seg, count, chunk)
            # pixel coords use the GLOBAL tile id from the prefetched slot
            # map (identity for the full grid; the owner's dealt tile set
            # under tile-sharded rendering)
            px, py = _pixel_coords(tids_ref[t], ntx, tile)

            def dma_for(k, slot):
                base = pl.multiple_of((first + k) * chunk, 128)
                return pltpu.make_async_copy(
                    payload_ref.at[:, pl.ds(base, chunk)], buf.at[slot],
                    sem.at[slot],
                )

            # keep `depth` chunk loads in flight: per-chunk compute is a
            # few hundred ns while an HBM DMA's latency is ~1 us, so
            # one-ahead double buffering leaves the walk latency-bound.
            jax.lax.fori_loop(
                0, jnp.minimum(n_chunks, depth),
                lambda i, c: (dma_for(i, i % depth).start(), c)[1], 0,
            )

            def cond(state):
                k, log_t, _, _ = state
                return (k < n_chunks) & (jnp.max(log_t) >= LOG_T_EPS)

            def body(state):
                k, log_t, accum, t_min = state
                slot = k % depth

                dma_for(k, slot).wait()
                chunk_vals = buf[slot]
                gpos = (first + k) * chunk + lane
                seg_mask = (gpos >= start_seg) & (gpos < end_seg)
                alpha, _, _, _, _, _, _, _ = _chunk_alpha(
                    chunk_vals, px, py, seg_mask
                )
                log1m = jnp.log1p(-alpha)
                # inclusive prefix sum along the chunk axis on the MXU
                csum = jax.lax.dot_general(
                    log1m, u_incl, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI,
                )
                logcp = log_t + csum  # [Px, G]
                t_bef = jnp.exp(logcp - log1m)
                incl = (logcp >= LOG_T_EPS) & (alpha > 0.0)
                w = jnp.where(incl, alpha * t_bef, 0.0)
                # color accumulation on the VPU: a [Px,G]x[G,3] matmul
                # pads its 3-wide output to the full MXU tile (measured
                # slower than three lane reductions)
                accum = accum + jnp.concatenate(
                    [
                        jnp.sum(
                            w * chunk_vals[F_R + c : F_R + c + 1, :],
                            axis=1, keepdims=True,
                        )
                        for c in range(3)
                    ],
                    axis=1,
                )  # [Px, 3]
                # exp(logcp) == t_bef * (1 - alpha) — reuse instead of a
                # second [Px,G] transcendental
                t_min = jnp.minimum(
                    t_min,
                    jnp.min(
                        jnp.where(incl, t_bef * (1.0 - alpha), 1.0), axis=1,
                        keepdims=True,
                    ),
                )
                log_t = logcp[:, chunk - 1 : chunk]

                # refill the slot we just consumed (after the last buf
                # read above — the DMA overwrites buf[slot])
                @pl.when(k + depth < n_chunks)
                def _():
                    dma_for(k + depth, slot).start()

                return k + 1, log_t, accum, t_min

            init = (
                jnp.asarray(0, jnp.int32),
                jnp.zeros((n_px, 1), jnp.float32),
                jnp.zeros((n_px, 3), jnp.float32),
                jnp.ones((n_px, 1), jnp.float32),
            )
            k, log_t, accum, t_min = jax.lax.while_loop(cond, body, init)

            # early exit (or loop end) leaves up to `depth` prefetches
            # in flight; drain them so the semaphores are clean for the
            # next tile walk
            jax.lax.fori_loop(
                k, jnp.minimum(k + depth, n_chunks),
                lambda i, c: (dma_for(i, i % depth).wait(), c)[1], 0,
            )

            rgb_ref[j] = accum
            tfin_ref[j] = t_min
            aux_ref[j] = jnp.concatenate(
                [log_t, jnp.full((n_px, 1), 1.0) * k.astype(jnp.float32)],
                axis=1,
            )

        jax.lax.fori_loop(0, tpp, tile_body, 0)

    return kernel


BWD_DEPTH = 4  # in-flight chunk loads / RMW reads / grad writes in the bwd


def _make_bwd_kernel(ntx: int, tile: int, chunk: int, tpp: int):
    n_px = tile * tile
    depth = BWD_DEPTH

    def kernel(
        tids_ref,  # scalar prefetch [T_local]: global tile id per slot
        offs_ref,  # scalar prefetch [T_local]
        cnts_ref,  # scalar prefetch [T_local]
        kstop_all_ref,  # scalar prefetch [T_local] int32
        payload_ref,  # ANY [16, P_budget]
        d_rgb_ref,  # in [tpp, Px, 3]
        d_tfin_ref,  # in [tpp, Px, 1]
        tfin_ref,  # in [tpp, Px, 1]
        logt_ref,  # in [tpp, Px, 1]
        zeros_ref,  # in ANY [16, P_budget] — aliased to d_payload_ref
        d_payload_ref,  # out ANY [16, P_budget]
        buf,  # VMEM scratch [2, 16, chunk] (payload in)
        gbuf,  # VMEM scratch [2, 16, chunk] (grads accum/out)
        rbuf,  # VMEM scratch [2, 16, chunk] (existing grads in, RMW)
        sem_in,
        sem_out,
        sem_rmw,
    ):
        del zeros_ref  # consumed purely through the aliased output
        p = pl.program_id(0)
        u_incl = _upper_tri_incl(chunk)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

        def tile_body(j, carry):
            t = p * tpp + j

            # Tiles whose forward composited nothing (k_stop == 0 — empty
            # segment, or every pixel culled before chunk 0) have a zero
            # gradient footprint: d_payload is pre-zeroed through the
            # alias, so skip the whole reverse walk setup.
            @pl.when(kstop_all_ref[t] > 0)
            def _():
                _walk_tile(j, t)
            return carry

        def _walk_tile(j, t):
            start_seg = offs_ref[t]
            count = cnts_ref[t]
            k_stop = kstop_all_ref[t]
            first, n_chunks, end_seg = _seg_geometry(start_seg, count, chunk)
            px, py = _pixel_coords(tids_ref[t], ntx, tile)

            d_rgb = d_rgb_ref[j]  # [Px, 3]
            d_tfin = d_tfin_ref[j]  # [Px, 1]
            t_final = tfin_ref[j]  # [Px, 1]
            # gradient routed through T_final's product (bg + direct uses)
            tfin_term = t_final * d_tfin  # [Px, 1]

            def chunk_base(k):
                return pl.multiple_of((first + k) * chunk, 128)

            def dma_in_for(k, slot):
                return pltpu.make_async_copy(
                    payload_ref.at[:, pl.ds(chunk_base(k), chunk)],
                    buf.at[slot], sem_in.at[slot],
                )

            # Gradient writes are read-modify-write for EVERY chunk:
            # only boundary chunks are shared with a neighboring tile
            # (interior pre-state is the pre-zeroed alias, so adding it
            # is a no-op), but the unconditional form keeps the loop
            # body straight-line — an edge-only conditional RMW measured
            # no faster while costing 3 scalar branches per iteration,
            # and the extra interior reads are ~8KB DMAs off the
            # critical path.
            def dma_rmw_for(k, slot):
                return pltpu.make_async_copy(
                    d_payload_ref.at[:, pl.ds(chunk_base(k), chunk)],
                    rbuf.at[slot], sem_rmw.at[slot],
                )

            def dma_out_for(k, slot):
                return pltpu.make_async_copy(
                    gbuf.at[slot],
                    d_payload_ref.at[:, pl.ds(chunk_base(k), chunk)],
                    sem_out.at[slot],
                )

            # reverse walk over the chunks the forward actually
            # processed; chunks beyond k_stop contributed nothing and
            # stay zero (output is pre-zeroed through the alias).
            # Payload loads + RMW reads stay `depth` chunks in flight and
            # gradient writes drain lazily (waited `depth` iterations
            # later / at walk end), so the walk is compute-bound instead
            # of serialized on DMA latency (a 1-deep version measured
            # ~5us/chunk vs the forward's ~0.65us). Ordering safety: all
            # addresses touched within the walk are distinct chunks, our
            # RMW reads only target chunks we have not written yet, and
            # cross-walk write->read ordering is preserved by the
            # end-of-walk drain (tile walks and grid programs are
            # sequential on a core).
            k_start = k_stop - 1  # >= 0: _walk_tile only runs for k_stop > 0

            def prefetch(k):
                dma_in_for(k, k % depth).start()
                dma_rmw_for(k, k % depth).start()

            jax.lax.fori_loop(
                0, jnp.minimum(depth, k_stop),
                lambda i, c: (prefetch(k_start - i), c)[1], 0,
            )

            def cond(state):
                return state[0] >= 0

            def body(state):
                k, log_t_end, r_carry = state
                slot = k % depth

                dma_in_for(k, slot).wait()
                chunk_vals = buf[slot]
                gpos = (first + k) * chunk + lane
                seg_mask = (gpos >= start_seg) & (gpos < end_seg)
                alpha, g_val, dx, dy, ca, cb, cc, op = _chunk_alpha(
                    chunk_vals, px, py, seg_mask
                )
                log1m = jnp.log1p(-alpha)
                csum = jax.lax.dot_general(
                    log1m, u_incl, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI,
                )
                chunk_sum = csum[:, chunk - 1 : chunk]
                log_t_start = log_t_end - chunk_sum
                logcp = log_t_start + csum
                t_bef = jnp.exp(logcp - log1m)
                incl = (logcp >= LOG_T_EPS) & (alpha > 0.0)
                w = jnp.where(incl, alpha * t_bef, 0.0)

                # cd[px, g] = sum_c dL/dC[px, c] * color[c, g] — 3-term
                # VPU broadcast sum (the MXU form pads the 3-long
                # contraction)
                cd = sum(
                    d_rgb[:, c : c + 1]
                    * chunk_vals[F_R + c : F_R + c + 1, :]
                    for c in range(3)
                )  # [Px, G]
                wcd = w * cd
                total = jnp.sum(wcd, axis=1, keepdims=True)  # [Px, 1]
                suffix = total - jax.lax.dot_general(
                    wcd, u_incl, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI,
                )  # sum_{j>g} w_j cd_j within chunk
                r_g = suffix + r_carry
                d_alpha = jnp.where(
                    incl,
                    t_bef * cd - (r_g + tfin_term) / (1.0 - alpha),
                    0.0,
                )
                # d colors [3, G] = dL/dC^T w — sublane reductions (the
                # MXU form pads the 3-wide output)
                d_colors = jnp.concatenate(
                    [
                        jnp.sum(
                            d_rgb[:, c : c + 1] * w, axis=0, keepdims=True
                        )
                        for c in range(3)
                    ],
                    axis=0,
                )
                d_op = jnp.sum(d_alpha * g_val, axis=0, keepdims=True)
                d_power = d_alpha * op * g_val
                # conic/mean cotangents share the d_power*dx / d_power*dy
                # factors: 5 product passes + 5 reductions instead of the
                # naive ~17 full [Px, G] passes (ca/cb/cc are [1, G] rows,
                # so their weighting moves outside the pixel reduction)
                dpx = d_power * dx
                dpy = d_power * dy
                p1 = jnp.sum(dpx, axis=0, keepdims=True)
                p2 = jnp.sum(dpy, axis=0, keepdims=True)
                q11 = jnp.sum(dpx * dx, axis=0, keepdims=True)
                q12 = jnp.sum(dpx * dy, axis=0, keepdims=True)
                q22 = jnp.sum(dpy * dy, axis=0, keepdims=True)
                d_mx = ca * p1 + cb * p2
                d_my = cc * p2 + cb * p1
                d_ca = -0.5 * q11
                d_cb = -q12
                d_cc = -0.5 * q22
                pad = jnp.zeros((NUM_FIELDS - 9, chunk), jnp.float32)
                contrib = jnp.concatenate(
                    [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_colors, pad],
                    axis=0,
                )

                dma_rmw_for(k, slot).wait()
                prev = rbuf[slot]

                # this gbuf slot was last used for chunk k+depth; make
                # sure that write has landed before overwriting the buffer
                @pl.when(k + depth <= k_start)
                def _():
                    dma_out_for(k + depth, slot).wait()

                gbuf[slot] = prev + contrib
                dma_out_for(k, slot).start()

                # refill the input (+RMW) slot we just consumed with the
                # chunk `depth` positions behind in the reverse walk
                # (after the last buf/rbuf read above — the DMAs
                # overwrite buf[slot]/rbuf[slot])
                @pl.when(k - depth >= 0)
                def _():
                    prefetch(k - depth)

                r_carry = r_carry + total
                return k - 1, log_t_start, r_carry

            init = (
                k_start,
                logt_ref[j],
                jnp.zeros((n_px, 1), jnp.float32),
            )
            jax.lax.while_loop(cond, body, init)

            # drain the outstanding gradient writes (chunks 0..depth-1 of
            # this walk) before the next tile walk / grid program, whose
            # RMW may read the chunks they target
            jax.lax.fori_loop(
                0, jnp.minimum(depth, k_stop),
                lambda i, c: (dma_out_for(i, i % depth).wait(), c)[1], 0,
            )

        jax.lax.fori_loop(0, tpp, tile_body, 0)

    return kernel


@functools.lru_cache(maxsize=32)
def _make_composite(ntx: int, nty: int, tile: int, chunk: int, p_pad: int,
                    interpret: bool, t_local: int):
    """Build the custom-vjp composite fn for one static configuration.

    t_local: number of tiles this call composites (= ntx*nty for the full
    grid; a subset under tile-sharded multi-chip rendering — the traced
    tile-id prefetch array maps each local slot to its global tile for
    pixel-coordinate generation).
    Returns rgb tiles as [T_local, 3, Px] (transposed from the kernel's
    [T_local, Px, 3] in XLA) and t_final as [T_local, Px].
    """
    n_px = tile * tile
    # tiles per grid program: the largest power of two <= 8 dividing
    # t_local (per-program dispatch overhead dominates sparse scenes)
    tpp = 1
    while tpp < 8 and t_local % (tpp * 2) == 0:
        tpp *= 2

    fwd_kernel = _make_fwd_kernel(ntx, tile, chunk, tpp)
    bwd_kernel = _make_bwd_kernel(ntx, tile, chunk, tpp)

    serial = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
    )

    fwd_call = pl.pallas_call(
        fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(t_local // tpp,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((tpp, n_px, 3), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((tpp, n_px, 1), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((tpp, n_px, 2), lambda t, *_: (t, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((PREFETCH_DEPTH, NUM_FIELDS, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((PREFETCH_DEPTH,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((t_local, n_px, 3), jnp.float32),
            jax.ShapeDtypeStruct((t_local, n_px, 1), jnp.float32),
            jax.ShapeDtypeStruct((t_local, n_px, 2), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=serial,
    )

    bwd_call = pl.pallas_call(
        bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(t_local // tpp,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((tpp, n_px, 3), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((tpp, n_px, 1), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((tpp, n_px, 1), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((tpp, n_px, 1), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=[
                pltpu.VMEM((BWD_DEPTH, NUM_FIELDS, chunk), jnp.float32),
                pltpu.VMEM((BWD_DEPTH, NUM_FIELDS, chunk), jnp.float32),
                pltpu.VMEM((BWD_DEPTH, NUM_FIELDS, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((BWD_DEPTH,)),
                pltpu.SemaphoreType.DMA((BWD_DEPTH,)),
                pltpu.SemaphoreType.DMA((BWD_DEPTH,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((NUM_FIELDS, p_pad), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        # zeros input (index 9 incl. the 4 scalar-prefetch args) donates its
        # buffer to the output so unwritten chunks read as zero in the RMW
        input_output_aliases={9: 0},
    )

    @jax.custom_vjp
    def composite(payload, tbase, offsets, counts):
        rgb, tfin, _ = fwd_call(tbase, offsets, counts, payload)
        return rgb.transpose(0, 2, 1), tfin[:, :, 0]

    def composite_fwd(payload, tbase, offsets, counts):
        rgb, tfin, aux = fwd_call(tbase, offsets, counts, payload)
        return (rgb.transpose(0, 2, 1), tfin[:, :, 0]), (
            payload, tbase, offsets, counts, tfin, aux,
        )

    def composite_bwd(res, cts):
        payload, tbase, offsets, counts, tfin, aux = res
        d_rgb, d_tfin = cts
        kstop = aux[:, 0, 1].astype(jnp.int32)
        logt = aux[:, :, 0:1]
        zeros = jnp.zeros_like(payload)
        (d_payload,) = bwd_call(
            tbase, offsets, counts, kstop, payload,
            d_rgb.transpose(0, 2, 1), d_tfin[:, :, None], tfin, logt, zeros,
        )
        zero_i = np.zeros(offsets.shape, jax.dtypes.float0)
        zero_b = np.zeros(tbase.shape, jax.dtypes.float0)
        return d_payload, zero_b, zero_i, zero_i

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


def composite_tiles_pallas(
    payload: jax.Array,  # [16, P_budget]
    tile_offsets: jax.Array,  # [T_local] int32 (natural, unaligned)
    tile_counts: jax.Array,  # [T_local] int32
    ntx: int,
    nty: int,
    tile: int = 16,
    chunk: int = 128,
    interpret: bool | None = None,
    tile_base: jax.Array | None = None,  # [1] int32 global id of slot 0
    tile_ids: jax.Array | None = None,  # [T_local] int32 global ids
):
    """Composite tiles on TPU. Returns (rgb [T_local,3,Px], t_final
    [T_local,Px]). tile_offsets/tile_counts may be a SUBSET of the full
    tile grid (tile-sharded rendering): local slot i composites global
    tile `tile_ids[i]` (traced; no recompile per column) — e.g. the
    owner's dealt tile set from binning.tile_owner_tables. tile_base is
    the contiguous-block shorthand: slot i -> tile_base + i.

    `chunk` must be a multiple of the 128-lane alignment on real hardware
    (payload columns are chunk-window DMA'd at aligned offsets).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and chunk % 128 != 0:
        # Mosaic rejects payload-column DMAs below the 128-lane tiling
        # ("Slice shape along dimension 1 must be aligned to tiling (128)")
        raise ValueError(
            f"chunk={chunk} must be a multiple of 128 on real TPU hardware "
            "(payload columns are chunk-window DMA'd; 64 is interpret-only)"
        )
    t_local = int(tile_offsets.shape[0])
    if tile_ids is None:
        base = (
            jnp.asarray(tile_base, jnp.int32).reshape(1)
            if tile_base is not None
            else jnp.zeros((1,), jnp.int32)
        )
        tile_ids = base + jnp.arange(t_local, dtype=jnp.int32)
    fn = _make_composite(
        ntx, nty, tile, chunk, int(payload.shape[1]), bool(interpret),
        t_local,
    )
    return fn(payload, tile_ids.astype(jnp.int32), tile_offsets, tile_counts)
