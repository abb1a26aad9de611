"""Dev microbench: single 3x3 conv layer, Pallas kernel structure variants.

Iterates kernel-body structures on one representative VGG layer
(256^2 x 128 -> 128, ~19.3 GFLOP) to find the one that reaches bf16 MXU
rate. Chained fori_loop timing per CLAUDE.md. Theory floors at 512^2-class
shapes: bf16 MXU ~394 TFLOP/s => ~0.05 ms; fp32 ~49 => ~0.4 ms.

Run: python scripts/bench_conv_layer.py [H W CI CO]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from manus_tpu.ops.conv_pallas import _pick_tile_h, _round_up  # noqa: E402

H, W, CI, CO = 256, 256, 128, 128
if len(sys.argv) >= 5:
    H, W, CI, CO = map(int, sys.argv[1:5])


def build(variant: str):
    h, wd, ci, co = H, W, CI, CO
    ci_pad = max(ci, 128)
    tile_h = _pick_tile_h(h, wd, ci_pad, co)
    h_pad = _round_up(h, tile_h)
    n_blocks = h_pad // tile_h
    w2 = wd + 2
    m_blk = tile_h * w2
    m_halo = _round_up(m_blk + 2 * w2 + 2, 16)
    taps = tuple(dy * w2 + dx for dy in range(3) for dx in range(3))

    def body_common(x_hbm, xs, sem, i):
        def dma(slot, blk):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(blk * m_blk, 16), m_halo)],
                xs.at[slot], sem.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < n_blocks)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()
        return xs[i % 2]

    if variant == "scratch9":  # current production structure
        def kernel(x_hbm, w_ref, b_ref, y_ref, xs, sem, acc):
            i = pl.program_id(0)
            xb = body_common(x_hbm, xs, sem, i)
            for k, off in enumerate(taps):
                part = jax.lax.dot_general(
                    xb[off:off + m_blk], w_ref[k],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if k == 0:
                    acc[:] = part
                else:
                    acc[:] = acc[:] + part
            y_ref[:] = jnp.maximum(acc[:] + b_ref[:], 0.0).astype(y_ref.dtype)
        scratch = [pltpu.VMEM((2, m_halo, ci_pad), jnp.bfloat16),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.VMEM((m_blk, co), jnp.float32)]
    elif variant == "value9":  # value-chain accumulation
        def kernel(x_hbm, w_ref, b_ref, y_ref, xs, sem):
            i = pl.program_id(0)
            xb = body_common(x_hbm, xs, sem, i)
            acc = None
            for k, off in enumerate(taps):
                part = jax.lax.dot_general(
                    xb[off:off + m_blk], w_ref[k],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            y_ref[:] = jnp.maximum(acc + b_ref[:], 0.0).astype(y_ref.dtype)
        scratch = [pltpu.VMEM((2, m_halo, ci_pad), jnp.bfloat16),
                   pltpu.SemaphoreType.DMA((2,))]
    elif variant == "xcol3":  # dy-grouped im2col: 3 dots of K=3*ci
        def kernel(x_hbm, w_ref, b_ref, y_ref, xs, sem, xcol):
            i = pl.program_id(0)
            xb = body_common(x_hbm, xs, sem, i)
            acc = None
            for dy in range(3):
                for dx in range(3):
                    off = dy * w2 + dx
                    xcol[:, dx * ci_pad:(dx + 1) * ci_pad] = (
                        xb[off:off + m_blk])
                part = jax.lax.dot_general(
                    xcol[:], w_ref[dy],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            y_ref[:] = jnp.maximum(acc + b_ref[:], 0.0).astype(y_ref.dtype)
        scratch = [pltpu.VMEM((2, m_halo, ci_pad), jnp.bfloat16),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.VMEM((m_blk, 3 * ci_pad), jnp.bfloat16)]
    else:
        raise ValueError(variant)

    def run(x, w, b):
        xp = jnp.pad(x.astype(jnp.bfloat16),
                     ((1, 1 + h_pad - h), (1, 1), (0, ci_pad - ci)))
        x2d = xp.reshape(-1, ci_pad)
        rows_needed = (n_blocks - 1) * m_blk + m_halo
        x2d = jnp.pad(x2d, ((0, max(0, rows_needed - x2d.shape[0])), (0, 0)))
        if variant == "xcol3":
            wf = jnp.pad(w.astype(jnp.bfloat16),
                         ((0, 0), (0, 0), (0, ci_pad - ci), (0, 0)))
            wf = wf.reshape(3, 3 * ci_pad, co)
            w_spec = pl.BlockSpec((3, 3 * ci_pad, co), lambda i: (0, 0, 0))
        else:
            wf = jnp.pad(w.astype(jnp.bfloat16).reshape(9, ci, co),
                         ((0, 0), (0, ci_pad - ci), (0, 0)))
            w_spec = pl.BlockSpec((9, ci_pad, co), lambda i: (0, 0, 0))
        y2d = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), w_spec,
                      pl.BlockSpec((1, co), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((m_blk, co), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_blocks * m_blk, co),
                                           jnp.bfloat16),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x2d, wf, b.reshape(1, co).astype(jnp.float32))
        return y2d.reshape(h_pad, w2, co)[:h, :wd]

    return run


def bench(name, run, x, w, b, ref=None):
    @jax.jit
    def chain(n, x, w, b):
        def body(_, carry):
            y = run(carry if CO == CI else carry[:, :, :CI], w, b)
            y = y.astype(jnp.float32)
            if CO != CI:
                y = jnp.pad(y, ((0, 0), (0, 0), (0, CI - CO)))
            return y
        return jax.lax.fori_loop(0, n, body, x)

    t0 = time.time()
    out = np.asarray(chain(jnp.asarray(2), x, w, b)[0, 0, 0])
    tc = time.time() - t0
    if ref is not None:
        got = np.asarray(jax.jit(lambda: run(x, w, b))(), np.float32)
        err = np.abs(got - ref).max()
        assert err < 0.1, f"{name}: max err {err}"

    def timed(n):
        t = time.time()
        np.asarray(chain(jnp.asarray(n), x, w, b)[0, 0, 0])
        return time.time() - t

    t2 = min(timed(2) for _ in range(2))
    t202 = min(timed(202) for _ in range(2))
    per = (t202 - t2) / 200 * 1e3
    gflop = 2 * H * W * 9 * CI * CO / 1e9
    print(f"{name:10s} {per:7.3f} ms  ({gflop / per:.1f} TFLOP/s)"
          f" (compile {tc:.0f}s)", flush=True)
    return per


def main():
    print(f"layer {H}x{W} {CI}->{CO} on {jax.devices()[0].platform}",
          flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 1, (H, W, CI)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, CI, CO)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (CO,)), jnp.float32)
    ref = np.asarray(jax.jit(lambda: jnp.maximum(
        jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16)[None], w.astype(jnp.bfloat16), (1, 1),
            "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)[0] + b, 0.0))(), np.float32)

    for v in ("value9", "xcol3", "scratch9"):
        try:
            bench(v, build(v), x, w, b, ref)
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
