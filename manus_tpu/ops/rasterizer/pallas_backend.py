"""Pallas TPU tile-compositing kernels (forward + hand-derived backward).

This is the hot path of the framework: per-tile front-to-back alpha
compositing of binned, depth-ordered gaussian pairs, with

  * contiguous 8KB chunk DMAs from the aligned [P_pad, 16] payload,
  * all-VPU/MXU math in a [G, Px] = [chunk, 256] layout with zero
    transposes (fields broadcast as [G, 1] columns, pixels as [1, Px] rows),
  * cumulative transmittance via an MXU triangular-matmul prefix sum,
  * per-tile early exit once every pixel saturates (the reference CUDA
    kernel's per-pixel `done` flag, lifted to tile granularity),
  * a custom VJP whose backward kernel re-walks the chunks in reverse,
    reconstructing transmittance analytically — no per-pixel contributor
    stacks, no atomics (each pair slot belongs to exactly one tile, so
    gradient writes are race-free by construction).

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


def _lower_tri(chunk: int):
    """Lower-triangular ones [chunk, chunk], built in-kernel (MXU prefix-sum
    operator — constants cannot be captured by pallas kernels)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (rows >= cols).astype(jnp.float32)


def _pixel_coords(t, ntx: int, tile: int):
    """Pixel-center coordinates of tile t as two [1, Px] f32 rows."""
    tx = t % ntx
    ty = t // ntx
    i = jax.lax.broadcasted_iota(jnp.int32, (1, tile * tile), 1)
    px = (tx * tile + i % tile).astype(jnp.float32)
    py = (ty * tile + i // tile).astype(jnp.float32)
    return px, py


def _chunk_alpha(buf, px, py):
    """Shared fwd/bwd per-chunk alpha math. buf: [G, 16] payload chunk.

    Returns (alpha [G, Px] gated+clamped, g_val [G, Px] = exp(power),
    dx, dy, ca, cb, cc, op).
    """
    mx = buf[:, F_MEAN_X : F_MEAN_X + 1]
    my = buf[:, F_MEAN_Y : F_MEAN_Y + 1]
    ca = buf[:, F_CONIC_A : F_CONIC_A + 1]
    cb = buf[:, F_CONIC_B : F_CONIC_B + 1]
    cc = buf[:, F_CONIC_C : F_CONIC_C + 1]
    op = buf[:, F_OPACITY : F_OPACITY + 1]
    dx = px - mx  # [G, Px]
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g_val = jnp.exp(power)
    alpha = jnp.minimum(op * g_val, ALPHA_MAX)
    alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_EPS), alpha, 0.0)
    return alpha, g_val, dx, dy, ca, cb, cc, op


def _make_fwd_kernel(ntx: int, tile: int, chunk: int):
    n_px = tile * tile

    def kernel(
        offs_ref,  # scalar prefetch [T]
        cnts_ref,  # scalar prefetch [T]
        payload_ref,  # ANY [P_pad, 16]
        rgb_ref,  # out [1, 3, Px]
        tfin_ref,  # out [1, Px]
        logt_ref,  # out [1, Px] (residual: log T at stop)
        kstop_ref,  # out [1, 1] int32 in SMEM (residual)
        buf,  # VMEM scratch [chunk, 16]
        sem,  # DMA sem
    ):
        t = pl.program_id(0)
        count = cnts_ref[t]
        offset = offs_ref[t]
        n_chunks = (count + chunk - 1) // chunk
        px, py = _pixel_coords(t, ntx, tile)
        lower_incl = _lower_tri(chunk)

        def cond(state):
            k, log_t, _, _ = state
            return (k < n_chunks) & (jnp.max(log_t) >= LOG_T_EPS)

        def body(state):
            k, log_t, accum, t_min = state
            cp_dma = pltpu.make_async_copy(
                payload_ref.at[pl.ds(offset + k * chunk, chunk), :], buf, sem
            )
            cp_dma.start()
            cp_dma.wait()
            alpha, _, _, _, _, _, _, _ = _chunk_alpha(buf[:, :], px, py)
            log1m = jnp.log1p(-alpha)
            # inclusive prefix sum along the chunk axis on the MXU
            csum = jax.lax.dot_general(
                lower_incl, log1m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logcp = log_t + csum  # [G, Px]
            t_bef = jnp.exp(logcp - log1m)
            incl = (logcp >= LOG_T_EPS) & (alpha > 0.0)
            w = jnp.where(incl, alpha * t_bef, 0.0)
            colors = buf[:, F_R : F_R + 3]  # [G, 3]
            accum = accum + jax.lax.dot_general(
                colors, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [3, Px]
            t_min = jnp.minimum(
                t_min,
                jnp.min(jnp.where(incl, jnp.exp(logcp), 1.0), axis=0,
                        keepdims=True),
            )
            log_t = logcp[chunk - 1 : chunk, :]
            return k + 1, log_t, accum, t_min

        init = (
            jnp.asarray(0, jnp.int32),
            jnp.zeros((1, n_px), jnp.float32),
            jnp.zeros((3, n_px), jnp.float32),
            jnp.ones((1, n_px), jnp.float32),
        )
        k, log_t, accum, t_min = jax.lax.while_loop(cond, body, init)
        rgb_ref[0] = accum
        tfin_ref[0, :] = t_min[0, :]
        logt_ref[0, :] = log_t[0, :]
        kstop_ref[0, 0] = k

    return kernel


def _make_bwd_kernel(ntx: int, tile: int, chunk: int):
    n_px = tile * tile

    def kernel(
        offs_ref,  # scalar prefetch [T]
        cnts_ref,  # scalar prefetch [T]
        kstop_all_ref,  # scalar prefetch [T] int32
        payload_ref,  # ANY [P_pad, 16]
        d_rgb_ref,  # in [1, 3, Px]
        d_tfin_ref,  # in [1, Px]
        tfin_ref,  # in [1, Px]
        logt_ref,  # in [1, Px]
        d_payload_ref,  # out ANY [P_pad, 16]
        buf,  # VMEM scratch [chunk, 16] (payload in)
        gbuf,  # VMEM scratch [chunk, 16] (grads out)
        zbuf,  # VMEM scratch [chunk, 16] (zeros)
        sem_in,
        sem_out,
    ):
        t = pl.program_id(0)
        count = cnts_ref[t]
        offset = offs_ref[t]
        k_stop = kstop_all_ref[t]
        n_chunks = (count + chunk - 1) // chunk
        px, py = _pixel_coords(t, ntx, tile)
        lower_incl = _lower_tri(chunk)

        d_rgb = d_rgb_ref[0]  # [3, Px]
        d_tfin = d_tfin_ref[:, :]  # [1, Px]
        t_final = tfin_ref[:, :]  # [1, Px]
        # gradient routed through T_final's product (bg + direct uses)
        tfin_term = t_final * d_tfin  # [1, Px]

        # --- pass 1: zero-fill chunks the forward never reached.
        zbuf[:, :] = jnp.zeros((chunk, NUM_FIELDS), jnp.float32)

        def zero_body(k, _):
            zdma = pltpu.make_async_copy(
                zbuf, d_payload_ref.at[pl.ds(offset + k * chunk, chunk), :],
                sem_out,
            )
            zdma.start()
            zdma.wait()
            return 0

        jax.lax.fori_loop(k_stop, n_chunks, zero_body, 0)

        # --- pass 2: reverse walk over contributing chunks.
        def cond(state):
            k = state[0]
            return k >= 0

        def body(state):
            k, log_t_end, r_carry = state
            cp_in = pltpu.make_async_copy(
                payload_ref.at[pl.ds(offset + k * chunk, chunk), :], buf, sem_in
            )
            cp_in.start()
            cp_in.wait()
            alpha, g_val, dx, dy, ca, cb, cc, op = _chunk_alpha(
                buf[:, :], px, py
            )
            log1m = jnp.log1p(-alpha)
            csum = jax.lax.dot_general(
                lower_incl, log1m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            chunk_sum = csum[chunk - 1 : chunk, :]
            log_t_start = log_t_end - chunk_sum
            logcp = log_t_start + csum
            t_bef = jnp.exp(logcp - log1m)
            incl = (logcp >= LOG_T_EPS) & (alpha > 0.0)
            w = jnp.where(incl, alpha * t_bef, 0.0)

            colors = buf[:, F_R : F_R + 3]  # [G, 3]
            # cd[g, px] = sum_c color[g, c] * dL/dC[c, px]
            cd = jax.lax.dot_general(
                colors, d_rgb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, Px]
            wcd = w * cd
            total = jnp.sum(wcd, axis=0, keepdims=True)
            suffix = total - jax.lax.dot_general(
                lower_incl, wcd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # sum_{j>g} w_j cd_j within chunk
            r_g = suffix + r_carry  # [G, Px]
            d_alpha = jnp.where(
                incl,
                t_bef * cd - (r_g + tfin_term) / (1.0 - alpha),
                0.0,
            )
            # d colors [G, 3] = sum_px w * dL/dC
            d_colors = jax.lax.dot_general(
                w, d_rgb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d_op = jnp.sum(d_alpha * g_val, axis=1, keepdims=True)  # [G, 1]
            d_power = d_alpha * op * g_val
            d_mx = jnp.sum(d_power * (ca * dx + cb * dy), axis=1, keepdims=True)
            d_my = jnp.sum(d_power * (cc * dy + cb * dx), axis=1, keepdims=True)
            d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=1, keepdims=True)
            d_cb = jnp.sum(d_power * (-dx * dy), axis=1, keepdims=True)
            d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=1, keepdims=True)
            pad = jnp.zeros((chunk, NUM_FIELDS - 9), jnp.float32)
            gbuf[:, :] = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_colors, pad], axis=1
            )
            cp_out = pltpu.make_async_copy(
                gbuf, d_payload_ref.at[pl.ds(offset + k * chunk, chunk), :],
                sem_out,
            )
            cp_out.start()
            cp_out.wait()

            r_carry = r_carry + jnp.sum(wcd, axis=0, keepdims=True)
            return k - 1, log_t_start, r_carry

        init = (
            k_stop - 1,
            logt_ref[:, :],
            jnp.zeros((1, n_px), jnp.float32),
        )
        jax.lax.while_loop(cond, body, init)

    return kernel


@functools.lru_cache(maxsize=32)
def _make_composite(ntx: int, nty: int, tile: int, chunk: int, p_pad: int,
                    interpret: bool):
    """Build the custom-vjp composite fn for one static configuration."""
    num_tiles = ntx * nty
    n_px = tile * tile

    fwd_kernel = _make_fwd_kernel(ntx, tile, chunk)
    bwd_kernel = _make_bwd_kernel(ntx, tile, chunk)

    fwd_call = pl.pallas_call(
        fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((1, 3, n_px), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, n_px), lambda t, *_: (t, 0)),
                pl.BlockSpec((1, n_px), lambda t, *_: (t, 0)),
                pl.BlockSpec(
                    (1, 1), lambda t, *_: (t, 0), memory_space=pltpu.SMEM
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((chunk, NUM_FIELDS), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 3, n_px), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, n_px), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, n_px), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1), jnp.int32),
        ],
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 3, n_px), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, n_px), lambda t, *_: (t, 0)),
                pl.BlockSpec((1, n_px), lambda t, *_: (t, 0)),
                pl.BlockSpec((1, n_px), lambda t, *_: (t, 0)),
            ],
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=[
                pltpu.VMEM((chunk, NUM_FIELDS), jnp.float32),
                pltpu.VMEM((chunk, NUM_FIELDS), jnp.float32),
                pltpu.VMEM((chunk, NUM_FIELDS), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((p_pad, NUM_FIELDS), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.custom_vjp
    def composite(payload, offsets, counts):
        rgb, tfin, _, _ = fwd_call(offsets, counts, payload)
        return rgb, tfin

    def composite_fwd(payload, offsets, counts):
        rgb, tfin, logt, kstop = fwd_call(offsets, counts, payload)
        return (rgb, tfin), (payload, offsets, counts, tfin, logt, kstop)

    def composite_bwd(res, cts):
        payload, offsets, counts, tfin, logt, kstop = res
        d_rgb, d_tfin = cts
        (d_payload,) = bwd_call(
            offsets, counts, kstop[:, 0], payload, d_rgb, d_tfin, tfin, logt
        )
        zero_i = np.zeros(offsets.shape, jax.dtypes.float0)
        return d_payload, zero_i, zero_i

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


def composite_tiles_pallas(
    payload: jax.Array,  # [P_pad, 16]
    tile_offsets: jax.Array,  # [T] int32
    tile_counts: jax.Array,  # [T] int32
    ntx: int,
    nty: int,
    tile: int = 16,
    chunk: int = 128,
    interpret: bool | None = None,
):
    """Composite all tiles on TPU. Returns (rgb [T,3,Px], t_final [T,Px])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _make_composite(
        ntx, nty, tile, chunk, int(payload.shape[0]), bool(interpret)
    )
    return fn(payload, tile_offsets, tile_counts)
