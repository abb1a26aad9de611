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


# ---------------------------------------------------------------------------
# Layout-persistent conv chain.
#
# conv3x3 above pays two full HBM copies of XLA glue PER LAYER: jnp.pad on
# the input and the junk-column slice on the output. For a 13-layer VGG
# sweep that glue dominates (measured: the per-layer kernel runs at >2x the
# fp32 conv roof, yet end-to-end barely beat the XLA stack). The fix is to
# keep feature maps in the flat padded layout BETWEEN layers:
#
#   layout L(H, W): [rows, C] with pixel (y, x) at row  m_blk + y*(W+2) + x,
#   where m_blk = tile_h*(W+2) is the kernel's row-block. Rows < m_blk (the
#   top border), the two junk columns of every pixel row (which coincide
#   exactly with the next layer's left/right zero borders, offset algebra
#   below), rows for y >= H, and the tail block are all ZERO.
#
# A consumer computing pixel q = y*(W+2)+x reads taps at rows
# lead + q + dy*(W+2) + dx with lead = m_blk - (W+3): the dy=dx=1 center tap
# lands on m_blk + q — exactly where the producer wrote it. So the producer's
# output IS the consumer's input, with no XLA ops in between: the kernel
# zeroes its own junk (an iota mask fused into the bias+ReLU pass) and the
# grid gets one leading and one trailing all-zero block for the borders.
# DMA starts stay 16-row aligned by reading from the aligned floor and
# shifting the (static) tap offsets by `shift = (-(W+3)) mod 16`.
#
# Only stage boundaries (4 maxpools + the first image) and the LPIPS head
# touch XLA, and the head can consume the layout directly (zero rows
# contribute nothing to the stage distance; divide by H*W instead of mean).
# ---------------------------------------------------------------------------


class StageLayout:
    """Static geometry of one VGG stage's persistent layout (hashable so it
    can ride custom_vjp nondiff_argnums and lru_cache keys)."""

    __slots__ = ("h", "w", "tile_h", "m_blk", "n_blocks", "rows", "lead",
                 "shift", "m_halo")

    def __init__(self, h: int, w: int, c_max: int,
                 vmem_budget: int = 11 << 20):
        # DMA-start alignment needs m_blk % 16 == 0: tile_h granule 8 when
        # W+2 is even, 16 when odd (odd widths appear via floor-halving
        # pools, e.g. 720p reaches 80x45 at stage 4)
        gran = 8 if (w + 2) % 2 == 0 else 16
        c_l = max(c_max, 128)
        best = gran
        for th in range(gran, _round_up(max(h, gran), gran) + gran, gran):
            m_blk = th * (w + 2)
            m_halo = _round_up(m_blk + 2 * (w + 2) + 2 + 16, 16)
            vmem = (
                m_blk * c_l * 4          # fp32 accumulator scratch
                + 2 * m_halo * c_l * 2   # double-buffered input scratch
                + 9 * c_l * c_l * 2      # weights
                + 2 * m_blk * c_l * 2    # pipelined output blocks
            )
            if vmem > vmem_budget and th > gran:
                break
            best = th
            if m_blk >= 4096 or th >= h + gran - 1:
                break
        self.h, self.w, self.tile_h = h, w, best
        self.m_blk = best * (w + 2)
        self.n_blocks = _round_up(h, best) // best
        self.rows = (self.n_blocks + 2) * self.m_blk
        self.lead = self.m_blk - (w + 3)
        self.shift = (-(w + 3)) % 16
        self.m_halo = _round_up(self.m_blk + 2 * (w + 2) + 2 + self.shift,
                                16)

    def _key(self):
        return (self.h, self.w, self.tile_h)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, StageLayout) and self._key() == other._key()


def build_layout(x: jax.Array, L: StageLayout,
                 dtype=jnp.bfloat16) -> jax.Array:
    """[H, W, C] -> layout array [L.rows, max(C, 128)] (bf16, zero borders,
    lanes zero-padded to the VMEM slicing minimum)."""
    h, w, c = x.shape
    cp = max(c, 128)
    h_pad = L.tile_h * L.n_blocks
    core = jnp.pad(x.astype(dtype), ((1, 1 + h_pad - h), (1, 1),
                                     (0, cp - c)))
    core = core.reshape(-1, cp)
    return jnp.pad(core, ((L.lead, L.rows - L.lead - core.shape[0]), (0, 0)))


def unlayout(xl: jax.Array, L: StageLayout) -> jax.Array:
    """Layout array -> [H, W, C] (lane padding kept; harmless zeros)."""
    h_pad = L.tile_h * L.n_blocks
    x = xl[L.m_blk : L.m_blk + h_pad * (L.w + 2)]
    return x.reshape(h_pad, L.w + 2, x.shape[-1])[: L.h, : L.w]


def _conv_layout_kernel(x_hbm, w_ref, b_ref, y_ref, xs, sem,
                        *, L: StageLayout, taps, relu, n_valid_rows):
    i = pl.program_id(0)
    nb = L.n_blocks

    def dma(slot, c):
        start = L.lead - L.shift + c * L.m_blk
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(start, 16), L.m_halo)],
            xs.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when((i >= 1) & (i < nb))
    def _():
        dma(i % 2, i).start()

    is_border = (i == 0) | (i == nb + 1)

    @pl.when(is_border)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    @pl.when(~is_border)
    def _():
        c = i - 1
        dma(c % 2, c).wait()
        xb = xs[c % 2]
        # pure-value accumulation: measured marginally faster than the
        # VMEM-scratch RMW form (0.128 vs 0.132 ms at 256^2x128->128,
        # scripts/bench_conv_kernel_variants.py) and frees the scratch
        out = b_ref[:]
        for k, off in enumerate(taps):
            out = out + jax.lax.dot_general(
                xb[off : off + L.m_blk],
                w_ref[k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if relu:
            out = jnp.maximum(out, 0.0)
        # zero the junk columns (x >= W: they land on the next layer's
        # borders) and the y >= H padding rows, fused into this pass
        q = jax.lax.broadcasted_iota(jnp.int32, (L.m_blk, 1), 0)
        valid = (q % (L.w + 2) < L.w) & (q < n_valid_rows - c * L.m_blk)
        y_ref[:] = jnp.where(valid, out, 0.0).astype(y_ref.dtype)


def conv3x3_layout_raw(xl: jax.Array, w: jax.Array, b: jax.Array,
                       relu: bool, L: StageLayout,
                       interpret: Optional[bool] = None) -> jax.Array:
    """One 3x3 SAME conv layer on the persistent layout: xl [L.rows, Cin]
    -> [L.rows, max(Cout, 128)]. Not differentiable (see conv3x3_layout)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ci = xl.shape[-1]
    assert ci >= 128, "layout arrays carry >=128 lanes (build_layout pads)"
    assert w.shape[2] <= ci
    co = w.shape[-1]
    co_out = max(co, 128)
    wf = jnp.pad(
        w.astype(jnp.bfloat16).reshape(9, w.shape[2], co),
        ((0, 0), (0, ci - w.shape[2]), (0, co_out - co)),
    )
    bf = jnp.pad(b.astype(jnp.float32), (0, co_out - co)).reshape(1, co_out)
    w2 = L.w + 2
    taps = tuple(L.shift + dy * w2 + dx
                 for dy in range(3) for dx in range(3))
    kernel = functools.partial(
        _conv_layout_kernel, L=L, taps=taps, relu=relu,
        n_valid_rows=L.h * w2,
    )
    return pl.pallas_call(
        kernel,
        grid=(L.n_blocks + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, ci, co_out), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, co_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((L.m_blk, co_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((L.rows, co_out), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, L.m_halo, ci), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xl, wf, bf)


def _conv_dx_layout_kernel(g_hbm, y_hbm, w_ref, o_ref, gs, ys, sem,
                           *, L: StageLayout, taps, n_valid_rows):
    """dx conv with the ReLU mask fused into the DMA stream: gm =
    where(y > 0, g, 0) is computed on the halo buffer in VMEM, so the
    mask never costs an XLA HBM round trip per layer (measured ~1.8 ms
    across the 13-layer backward before fusion)."""
    i = pl.program_id(0)
    nb = L.n_blocks

    def dma(ref, buf, stream, slot, c):
        start = L.lead - L.shift + c * L.m_blk
        return pltpu.make_async_copy(
            ref.at[pl.ds(pl.multiple_of(start, 16), L.m_halo)],
            buf.at[slot],
            sem.at[stream, slot],
        )

    @pl.when(i == 0)
    def _():
        dma(g_hbm, gs, 0, 0, 0).start()
        dma(y_hbm, ys, 1, 0, 0).start()

    @pl.when((i >= 1) & (i < nb))
    def _():
        dma(g_hbm, gs, 0, i % 2, i).start()
        dma(y_hbm, ys, 1, i % 2, i).start()

    is_border = (i == 0) | (i == nb + 1)

    @pl.when(is_border)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(~is_border)
    def _():
        c = i - 1
        dma(g_hbm, gs, 0, c % 2, c).wait()
        dma(y_hbm, ys, 1, c % 2, c).wait()
        # f32 compare: Mosaic cannot cmpf packed bf16 vectors
        mask = ys[c % 2].astype(jnp.float32) > 0
        gm = jnp.where(mask, gs[c % 2], jnp.zeros((), gs.dtype))
        out = jnp.zeros((), jnp.float32)
        for k, off in enumerate(taps):
            out = out + jax.lax.dot_general(
                gm[off : off + L.m_blk],
                w_ref[k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        q = jax.lax.broadcasted_iota(jnp.int32, (L.m_blk, 1), 0)
        valid = (q % (L.w + 2) < L.w) & (q < n_valid_rows - c * L.m_blk)
        o_ref[:] = jnp.where(valid, out, 0.0).astype(o_ref.dtype)


def conv3x3_layout_dx_raw(gl: jax.Array, yl: jax.Array, w_t: jax.Array,
                          L: StageLayout,
                          interpret: Optional[bool] = None) -> jax.Array:
    """Fused dx of a relu'd layout conv: ReLU-mask gl by yl (the saved
    layer output) and convolve with the already-flipped/transposed
    weights w_t [3, 3, Co, Ci]. gl/yl: [L.rows, co_lanes]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ci = gl.shape[-1]  # = fwd co lanes
    assert ci >= 128 and yl.shape == gl.shape
    assert w_t.shape[2] <= ci
    co = w_t.shape[-1]  # = fwd ci
    co_out = max(co, 128)
    wf = jnp.pad(
        w_t.astype(jnp.bfloat16).reshape(9, w_t.shape[2], co),
        ((0, 0), (0, ci - w_t.shape[2]), (0, co_out - co)),
    )
    w2 = L.w + 2
    taps = tuple(L.shift + dy * w2 + dx
                 for dy in range(3) for dx in range(3))
    kernel = functools.partial(
        _conv_dx_layout_kernel, L=L, taps=taps, n_valid_rows=L.h * w2,
    )
    return pl.pallas_call(
        kernel,
        grid=(L.n_blocks + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, ci, co_out), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((L.m_blk, co_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((L.rows, co_out), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, L.m_halo, ci), jnp.bfloat16),
            pltpu.VMEM((2, L.m_halo, ci), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(gl, yl, wf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_layout(xl: jax.Array, w: jax.Array, b: jax.Array,
                   relu: bool, L: StageLayout,
                   interpret: Optional[bool] = None) -> jax.Array:
    """Differentiable layout conv for frozen LPIPS layers (dx-only VJP,
    same contract as conv3x3 — see its docstring for why (w, b) are
    arguments). The dx of a layout conv is another layout conv with
    flipped/transposed weights: zero borders in, zero borders out."""
    return conv3x3_layout_raw(xl, w, b, relu, L, interpret)


def _conv3x3_layout_fwd(xl, w, b, relu, L, interpret):
    y = conv3x3_layout_raw(xl, w, b, relu, L, interpret)
    return y, (y, w, b, jnp.zeros((), xl.dtype), xl.shape[-1])


def _conv3x3_layout_bwd(relu, L, interpret, res, g):
    y, w, b, x_dt, ci = res
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    if relu:
        # fused kernel: relu mask applied on the DMA'd halo buffer
        dx = conv3x3_layout_dx_raw(g.astype(jnp.bfloat16), y, w_t, L,
                                   interpret)
    else:
        zeros_co = jnp.zeros((w.shape[2],), jnp.float32)
        dx = conv3x3_layout_raw(g.astype(jnp.bfloat16), w_t, zeros_co,
                                False, L, interpret)
    # the layout carries >= max(ci, 128) lanes; dx must match xl's lanes
    dx = dx[:, : ci] if dx.shape[-1] > ci else jnp.pad(
        dx, ((0, 0), (0, ci - dx.shape[-1]))
    )
    return (dx.astype(x_dt.dtype), jnp.zeros_like(w), jnp.zeros_like(b))


conv3x3_layout.defvjp(_conv3x3_layout_fwd, _conv3x3_layout_bwd)


# ---------------------------------------------------------------------------
# LPIPS head stage on layout arrays.
#
# The head (channel-unit-normalise both feature maps, squared diff, 1x1
# nonnegative weights, spatial mean) is elementwise-per-row, so on layout
# arrays it runs as a row-blocked Pallas pass: ONE read of a+b for the
# forward and one for the backward, where the XLA lowering (even with the
# closed-form custom VJP in train/lpips.py) materialises several full
# fp32 feature-map temporaries per stage. Zero border/junk/padding rows
# have zero norm and contribute nothing; the caller divides by the true
# H*W via the lin scaling (the head is linear in lin).
# ---------------------------------------------------------------------------

_HEAD_EPS = 1e-10


def _head_fwd_kernel(a_ref, b_ref, lin_ref, out_ref):
    a = a_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    ra = jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True))
    rb = jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True))
    na = a / (ra + _HEAD_EPS)
    nb = b / (rb + _HEAD_EPS)
    d = (na - nb) ** 2 * lin_ref[:]
    # per-block lane partials in row 0 of an 8-row block (Mosaic cannot
    # store scalars to VMEM and output sublane blocks must be >= 8):
    # reduce rows here, lanes + blocks outside
    part = jnp.sum(d, axis=0, keepdims=True)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, d.shape[1]), 0)
    out_ref[:] = jnp.where(row == 0, part, 0.0)


def _head_bwd_kernel(a_ref, b_ref, lin_ref, da_ref, db_ref):
    a = a_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    ra = jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True))
    rb = jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True))
    na = a / (ra + _HEAD_EPS)
    nb = b / (rb + _HEAD_EPS)
    g = 2.0 * lin_ref[:] * (na - nb)

    def d_normed(x, r, gg):
        dot = jnp.sum(x * gg, axis=1, keepdims=True)
        safe_r = jnp.where(r > 0, r, 1.0)
        return gg / (r + _HEAD_EPS) - x * (
            dot / (safe_r * (r + _HEAD_EPS) ** 2)
        )

    da_ref[:] = d_normed(a, ra, g).astype(da_ref.dtype)
    db_ref[:] = (-d_normed(b, rb, g)).astype(db_ref.dtype)


def _head_block_rows(rows: int, c: int, budget: int = 10 << 20) -> int:
    """Largest row-block that divides rows, is sublane-aligned (multiple
    of 8), and keeps ~12 live fp32 block temporaries (the backward's
    working set) under the 16 MB scoped-VMEM stack limit, with margin.
    rows is always a multiple of 8 (layout rows are (n_blocks+2) * m_blk
    with tile_h a multiple of 8), so blk=8 is a valid floor."""
    best = 8
    for blk in range(8, min(rows, 8192) + 1, 8):
        if rows % blk == 0 and blk * c * 4 * 12 <= budget:
            best = blk
    return best


def _head_fwd_call(a, b, lin_eff, interpret):
    rows, c = a.shape
    blk = _head_block_rows(rows, c)
    out = pl.pallas_call(
        _head_fwd_kernel,
        grid=(rows // blk,),
        in_specs=[
            pl.BlockSpec((blk, c), lambda i: (i, 0)),
            pl.BlockSpec((blk, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows // blk * 8, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(a, b, lin_eff)
    return jnp.sum(out)


def _head_bwd_call(a, b, lin_scaled, interpret):
    rows, c = a.shape
    blk = _head_block_rows(rows, c)
    return pl.pallas_call(
        _head_bwd_kernel,
        grid=(rows // blk,),
        in_specs=[
            pl.BlockSpec((blk, c), lambda i: (i, 0)),
            pl.BlockSpec((blk, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((blk, c), lambda i: (i, 0)),
            pl.BlockSpec((blk, c), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, c), a.dtype),
            jax.ShapeDtypeStruct((rows, c), b.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(a, b, lin_scaled)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def head_stage_layout(a: jax.Array, b: jax.Array, lin_eff: jax.Array,
                      interpret: Optional[bool] = None) -> jax.Array:
    """One LPIPS head stage on [rows, C] layout (or any row-major) feature
    pairs: sum((unit(a) - unit(b))^2 * lin_eff). The caller folds the
    spatial 1/(H*W) into lin_eff (the head is linear in lin); lanes beyond
    the real channels must be zero in a AND b. Differentiable in a and b
    (closed-form normalize gradient in one fused backward pass); lin_eff
    gets symbolic-zero (LPIPS heads are frozen)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _head_fwd_call(a, b, lin_eff, interpret)


def _head_stage_layout_fwd(a, b, lin_eff, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _head_fwd_call(a, b, lin_eff, interpret), (a, b, lin_eff)


def _head_stage_layout_bwd(interpret, res, ct):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    a, b, lin_eff = res
    da, db = _head_bwd_call(a, b, lin_eff * ct, interpret)
    return da, db, jnp.zeros_like(lin_eff)


head_stage_layout.defvjp(_head_stage_layout_fwd, _head_stage_layout_bwd)


def maxpool2x2(x: jax.Array) -> jax.Array:
    """VALID 2x2 stride-2 max pool of [H, W, C] via reshape-max: values
    identical to reduce_window for non-overlapping windows, but the
    autodiff VJP is an equality mask instead of select-and-scatter."""
    h2, w2 = x.shape[0] // 2, x.shape[1] // 2
    return jnp.max(
        x[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2, x.shape[-1]),
        axis=(1, 3),
    )


def maxpool2x2_layout(xl: jax.Array, La: StageLayout,
                      Lb: StageLayout) -> jax.Array:
    """2x2/2 max pool directly between persistent layouts — equal values
    to build_layout(maxpool2x2(unlayout(xl, La)), Lb) without its three
    materializing junk-column slices/pads (measured 0.64 ms fwd + ~1.1 ms
    eq-mask VJP for the 512² boundary; this form is a leading-dim slice +
    reshape-max + two pads that XLA fuses).

    The junk-column algebra lines up exactly: pixel (y, x) sits at flat
    row La.m_blk + y*(Wa+2) + x with zeros at x = Wa, Wa+1, so row pairs
    are adjacent w2a-row groups and the x-junk PAIR pools to the zero
    column the pooled row needs — only one extra zero column (stride
    Wa/2+1 -> Wb+2) and the Lb border blocks are added by padding.
    Requires La.w even and Lb.w == La.w // 2 (every VGG boundary).

    Autodiff caveat: unlike the composed form (whose pad-transpose
    discards junk-column cotangent), this VJP routes cotangent arriving
    at the pooled JUNK column into the junk input pair. In the conv
    chain that cotangent is always zero — the dx conv kernels and the
    head mask junk rows — so the gradients are identical there
    (tests/test_conv_pallas.py asserts it under that invariant)."""
    w2a = La.w + 2
    c = xl.shape[-1]
    h2, w2b = Lb.h, Lb.w + 2
    assert La.w % 2 == 0 and 2 * Lb.w == La.w and 2 * h2 <= (
        La.tile_h * La.n_blocks
    )
    core = xl[La.m_blk : La.m_blk + 2 * h2 * w2a]
    ym = jnp.max(core.reshape(h2, 2, w2a // 2, 2, c), axis=(1, 3))
    ym = jnp.pad(ym, ((0, 0), (0, w2b - w2a // 2), (0, 0)))
    out = ym.reshape(h2 * w2b, c)
    return jnp.pad(
        out, ((Lb.m_blk, Lb.rows - Lb.m_blk - out.shape[0]), (0, 0))
    )
