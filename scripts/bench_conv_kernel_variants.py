"""Single-layer conv kernel variants, timed like-for-like in ONE session.

The layout conv kernel (ops/conv_pallas.py) accumulates 9 per-tap dots
through a VMEM fp32 scratch (acc[:] = acc[:] + part — a VPU RMW pass per
tap). This bench compares in-kernel accumulation strategies at one VGG
layer shape (ci == co so the output can feed back as the next input — the
chain methodology requires a loop-carried dependency; a carry + eps*fn(a)
chain is hoistable by XLA's LICM and can time NOTHING):

  tap9_scratch — current production: 9 dots K=Ci, VMEM scratch accumulate
  tap9_value   — 9 dots K=Ci, pure-value (register) accumulate

K-concat variants (3 dots of K=3*Ci / 1 dot of K=9*Ci via lane-concat of
row-shifted slices) are NOT included: Mosaic rejects tpu.concatenate of
operands with different sublane offsets ("result/input offset mismatch on
non-concat dimension") — concatenating the 9 shifted windows would need a
materializing copy per tap, which is exactly the VPU traffic being
avoided.

Run: python scripts/bench_conv_kernel_variants.py [H W C]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from manus_tpu.ops.conv_pallas import (  # noqa: E402
    StageLayout, build_layout, unlayout,
)


def make_layout_conv_variant(L: StageLayout, ci: int, co: int, mode: str):
    """A conv3x3_layout_raw clone with a selectable accumulation strategy."""
    w2 = L.w + 2
    taps = tuple(L.shift + dy * w2 + dx for dy in range(3) for dx in range(3))

    def kernel(x_hbm, w_ref, b_ref, y_ref, xs, sem, acc):
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

            def dot(a, wk):
                return jax.lax.dot_general(
                    a, wk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            if mode == "tap9_scratch":
                for k, off in enumerate(taps):
                    part = dot(xb[off : off + L.m_blk], w_ref[k])
                    if k == 0:
                        acc[:] = part
                    else:
                        acc[:] = acc[:] + part
                out = acc[:] + b_ref[:]
            elif mode == "tap9_value":
                out = b_ref[:]
                for k, off in enumerate(taps):
                    out = out + dot(xb[off : off + L.m_blk], w_ref[k])
            else:
                raise ValueError(mode)
            out = jnp.maximum(out, 0.0)
            q = jax.lax.broadcasted_iota(jnp.int32, (L.m_blk, 1), 0)
            valid = (q % w2 < L.w) & (q < L.h * w2 - c * L.m_blk)
            y_ref[:] = jnp.where(valid, out, 0.0).astype(y_ref.dtype)

    co_out = max(co, 128)

    def run(xl, wf, bf):
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
                pltpu.VMEM((L.m_blk, co_out), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=jax.default_backend() != "tpu",
        )(xl, wf, bf)

    return run


def chain_time(name, fn, x0, *consts, flop=None):
    """fn(x, *consts) -> next x (same shape/dtype): loop-carried, so the
    per-iter work cannot be hoisted out of the fori_loop."""

    @jax.jit
    def chain(k, x, *cs):
        def body(_, carry):
            return fn(carry, *cs)

        out = jax.lax.fori_loop(0, k, body, x)
        # reduce ON DEVICE: reading the full array back through the tunnel
        # costs hundreds of ms with huge variance (17 MB at bf16 here) and
        # buries the signal
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.time()
    np.asarray(chain(jnp.asarray(2), x0, *consts))
    tc = time.time() - t0

    def timed(k):
        t = time.time()
        np.asarray(chain(jnp.asarray(k), x0, *consts))
        return time.time() - t

    # sub-ms per-iter costs need a LONG chain: the tunnel's per-call
    # readback noise is ~40-80 ms, so 300 iters puts the signal well above
    # it (40 iters measured NEGATIVE per-iter costs here)
    t2 = min(timed(2) for _ in range(3))
    t302 = min(timed(302) for _ in range(3))
    per = (t302 - t2) / 300
    tfs = (flop / per / 1e12) if flop and per > 0 else 0.0
    print(f"{name:16s} {per * 1e3:7.3f} ms/iter  {tfs:6.1f} TF/s "
          f"(compile {tc:.0f}s)", flush=True)
    return per


def main():
    args = [int(a) for a in sys.argv[1:4]] or [256, 256, 128]
    h, w, c = args
    print(f"platform: {jax.devices()[0].platform}  layer {h}x{w} "
          f"{c}->{c}", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 1, (h, w, c)), jnp.float32)
    # small-gain weights + bias keep the fed-back activations bounded
    wt = jnp.asarray(rng.normal(0, 0.03, (3, 3, c, c)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (c,)), jnp.float32)
    flop = 2.0 * h * w * c * c * 9

    L = StageLayout(h, w, max(c, 128))
    c_l = max(c, 128)
    xl = jax.jit(lambda a: build_layout(a, L))(x)
    wf = jnp.pad(wt.astype(jnp.bfloat16).reshape(9, c, c),
                 ((0, 0), (0, c_l - c), (0, c_l - c)))
    bf = jnp.pad(b.astype(jnp.float32), (0, c_l - c)).reshape(1, c_l)

    # fp32 XLA reference for the agreement gate
    def conv_xla(dt):
        def f(a, wt_, b_):
            out = jax.lax.conv_general_dilated(
                a.astype(dt)[None], wt_.astype(dt), (1, 1),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )[0] + b_
            return jnp.maximum(out, 0.0).astype(dt)

        return f

    ref = np.asarray(jax.jit(conv_xla(jnp.float32))(x, wt, b), np.float32)
    scale = float(ref.std()) + 1e-6

    results = {}
    for mode in ("tap9_scratch", "tap9_value"):
        run = make_layout_conv_variant(L, c_l, c, mode)
        got = np.asarray(unlayout(run(xl, wf, bf), L)[:, :, :c], np.float32)
        err = float(np.abs(got - ref).max()) / scale
        tag = "ok" if err < 0.05 else f"MISMATCH rel={err:.4f}"
        print(f"  agreement[{mode}]: {tag}", flush=True)
        results[mode] = chain_time(mode, run, xl, wf, bf, flop=flop)

    results["xla_fp32"] = chain_time(
        "xla_fp32", conv_xla(jnp.float32), x, wt, b, flop=flop)
    results["xla_bf16"] = chain_time(
        "xla_bf16", conv_xla(jnp.bfloat16), x.astype(jnp.bfloat16), wt, b,
        flop=flop)

    best = min(results, key=results.get)
    print(f"best variant: {best} ({results[best] * 1e3:.3f} ms)")


if __name__ == "__main__":
    main()
