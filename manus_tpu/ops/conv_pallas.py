"""Implicit-GEMM 3x3 convolutions for the LPIPS VGG16 (Pallas, bf16 MXU).

Why this exists: the canonical hand training turns the VGG16 LPIPS loss on
after step 1000 (reference base.py:333-341, loss_utils.py:111-117 — the
reference pays the same conv sweeps through cuDNN). On TPU, XLA's batch-1
conv lowering runs the stack at the fp32 MXU roof (~13.4 ms f+b at 512^2,
scripts/bench_lpips_conv.py) and its bf16 conv lowering is WORSE, so the
~4x bf16-MXU win needs a hand-written kernel.

Design (one kernel, used for forward and for the dx backward):

  * the [H, W, Ci] image is zero-padded to [H_pad+2, W+2, Ci] and
    flattened to rows of Ci lanes. In this layout the 9 conv taps of
    output pixel p are the rows p + dy*(W+2) + dx — STATIC row offsets,
    so a 3x3 SAME conv becomes 9 shifted [M, Ci] x [Ci, Co] matmuls that
    accumulate in an fp32 VMEM scratch (the XLA im2col variant loses
    exactly because its accumulation round-trips HBM). Output rows with
    w-index >= W are wrap-around junk and are sliced off outside.
  * inputs/weights are bf16 (MXU-rate), accumulation and bias fp32,
    ReLU fused, outputs bf16 (halves feature-map traffic).
  * the grid walks row-blocks; each block's input window overlaps its
    neighbour by 2*(W+2)+2 rows (the halo), which BlockSpec pipelining
    cannot express, so the input stays unblocked (pl.ANY) and the kernel
    runs its own double-buffered DMA pipeline (block i+1 prefetched while
    i computes), same pattern as ops/rasterizer/pallas_backend.py.
  * block sizes: TILE_H is a multiple of 8 so DMA starts/lengths are
    16-row aligned for bf16 (W+2 is always even), sized to keep
    accumulator + double buffers + weights under the VMEM budget.

Backward: LPIPS weights are frozen (they are closure constants of the
loss), so the only cotangent that exists is dx — which for a stride-1
SAME 3x3 conv is the same conv with spatially-flipped, channel-transposed
weights applied to the ReLU-masked upstream gradient. `make_lpips_conv`
therefore closes over (w, b) and registers a custom VJP over x alone; no
dw/db kernels are needed (the XLA path in train/lpips.py remains for
anyone differentiating the weights).

Max-pools between stages use a reshape-max (VALID 2x2/2, identical values
to reduce_window for non-overlapping windows) whose autodiff VJP is a
vectorised equality mask instead of XLA's select-and-scatter.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tile_h(h: int, w: int, ci: int, co: int,
                 vmem_budget: int = 11 << 20) -> int:
    """Largest TILE_H (multiple of 8) whose working set fits the budget,
    capped once the matmul M dimension is comfortably MXU-sized."""
    ci_l = max(ci, 128)  # VMEM lane padding
    co_l = max(co, 128)
    best = 8
    for th in range(8, _round_up(max(h, 8), 8) + 8, 8):
        m_blk = th * (w + 2)
        m_halo = _round_up(m_blk + 2 * (w + 2) + 2, 16)
        vmem = (
            m_blk * co_l * 4  # fp32 accumulator scratch
            + 2 * m_halo * ci_l * 2  # double-buffered input scratch
            + 9 * ci_l * co_l * 2  # weights
            + 2 * m_blk * co_l * 2  # pipelined output blocks
        )
        if vmem > vmem_budget and th > 8:
            break
        best = th
        if m_blk >= 4096 or th >= h + 7:
            break
    return best


def _conv_kernel(x_hbm, w_ref, b_ref, y_ref, xs, sem, acc,
                 *, m_blk, m_halo, n_blocks, taps, relu):
    i = pl.program_id(0)

    def dma(slot, blk):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(blk * m_blk, 16), m_halo)],
            xs.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n_blocks)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    xb = xs[i % 2]
    for k, off in enumerate(taps):
        part = jax.lax.dot_general(
            xb[off : off + m_blk],
            w_ref[k],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if k == 0:
            acc[:] = part
        else:
            acc[:] = acc[:] + part
    out = acc[:] + b_ref[:]
    if relu:
        out = jnp.maximum(out, 0.0)
    y_ref[:] = out.astype(y_ref.dtype)


def conv3x3_raw(x: jax.Array, w: jax.Array, b: jax.Array, relu: bool,
                interpret: Optional[bool] = None) -> jax.Array:
    """3x3 SAME stride-1 conv (+bias, optional fused ReLU) of a single
    [H, W, Ci] image with [3, 3, Ci, Co] weights; bf16 inputs, fp32
    accumulation, bf16 output. Not differentiable — use make_lpips_conv
    for the custom-VJP op."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, wd, ci = x.shape
    co = w.shape[-1]
    # Mosaic cannot slice a VMEM ref to a lane extent below 128 (the
    # scratch's x2d[slot] read), so narrow input channels are zero-padded
    # to the lane width: the zero lanes contribute nothing to the dots and
    # K=128 is the MXU-native contraction anyway. Affects the Ci=3 image
    # layer and the Ci=64 stage-0 conv only (~0.2 ms of extra DMA at 512^2).
    ci_pad = max(ci, 128)
    tile_h = _pick_tile_h(h, wd, ci_pad, co)
    h_pad = _round_up(h, tile_h)
    n_blocks = h_pad // tile_h
    w2 = wd + 2
    m_blk = tile_h * w2
    m_halo = _round_up(m_blk + 2 * w2 + 2, 16)

    xp = jnp.pad(
        x.astype(jnp.bfloat16),
        ((1, 1 + h_pad - h), (1, 1), (0, ci_pad - ci)),
    )
    x2d = xp.reshape(-1, ci_pad)
    rows_needed = (n_blocks - 1) * m_blk + m_halo
    x2d = jnp.pad(x2d, ((0, max(0, rows_needed - x2d.shape[0])), (0, 0)))
    wf = jnp.pad(
        w.astype(jnp.bfloat16).reshape(9, ci, co),
        ((0, 0), (0, ci_pad - ci), (0, 0)),
    )
    bf = b.reshape(1, co).astype(jnp.float32)
    taps = tuple(dy * w2 + dx for dy in range(3) for dx in range(3))

    kernel = functools.partial(
        _conv_kernel, m_blk=m_blk, m_halo=m_halo, n_blocks=n_blocks,
        taps=taps, relu=relu,
    )
    y2d = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, ci_pad, co), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, co), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m_blk, co), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks * m_blk, co), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, m_halo, ci_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((m_blk, co), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x2d, wf, bf)
    return y2d.reshape(h_pad, w2, co)[:h, :wd]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3(x: jax.Array, w: jax.Array, b: jax.Array, relu: bool = True,
            interpret: Optional[bool] = None) -> jax.Array:
    """Differentiable 3x3 SAME conv for frozen LPIPS layers.

    LPIPS weights are loss constants (never trained), so the custom VJP
    produces dx only — the same conv with spatially-flipped, channel-
    transposed weights applied to the ReLU-masked upstream gradient —
    and symbolic-zero dw/db. (w, b) are explicit ARGUMENTS, not closure
    captures: a custom_vjp closing over traced weights cannot be lifted
    into lax.cond branches (the train step gates LPIPS on a traced step
    counter, and grad-of-cond then fails with "No constant handler")."""
    return conv3x3_raw(x, w, b, relu, interpret)


def _conv3x3_fwd(x, w, b, relu, interpret):
    y = conv3x3_raw(x, w, b, relu, interpret)
    # y doubles as the ReLU mask; remember x's dtype for the cotangent
    return y, (y, w, b, jnp.zeros((), x.dtype))


def _conv3x3_bwd(relu, interpret, res, g):
    y, w, b, x_dt = res
    if relu:
        g = jnp.where(y > 0, g, 0)
    # spatially flipped, channel-transposed weights for the dx conv
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    zeros_ci = jnp.zeros((w.shape[2],), jnp.float32)
    dx = conv3x3_raw(g.astype(jnp.bfloat16), w_t, zeros_ci, False, interpret)
    # dw/db are zeros (frozen weights); DCE'd unless someone differentiates
    # the params, which the XLA path in train/lpips.py exists for
    return (dx.astype(x_dt.dtype), jnp.zeros_like(w), jnp.zeros_like(b))


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def make_lpips_conv(w: jax.Array, b: jax.Array, relu: bool = True,
                    interpret: Optional[bool] = None):
    """Back-compat wrapper: a partial of conv3x3 over one layer's (w, b)."""
    return lambda x: conv3x3(x, w, b, relu, interpret)


def maxpool2x2(x: jax.Array) -> jax.Array:
    """VALID 2x2 stride-2 max pool of [H, W, C] via reshape-max: values
    identical to reduce_window for non-overlapping windows, but the
    autodiff VJP is an equality mask instead of select-and-scatter."""
    h2, w2 = x.shape[0] // 2, x.shape[1] // 2
    return jnp.max(
        x[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2, x.shape[-1]),
        axis=(1, 3),
    )
