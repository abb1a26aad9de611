"""Payload-backward variants, timed like-for-like in ONE session.

The tunnel's session-to-session throughput swings make cross-session
comparisons worthless (CLAUDE.md), so this script carries BOTH backward
implementations as self-contained custom-vjp functions plus component
probes, and times everything with the chained-fori_loop methodology.

Variants:
  pairmajor  — round-2 design: sort (key, iota), row-gather [P+N, 16],
               pointer-doubling on [P+N, 16], sort2 (key2, iota), gather.
  fieldmajor — round-3 candidate: the 9 live field rows of the [16, P]
               cotangent ride both sorts as extra operands; doubling on a
               [9, total] stack (no 16->128 minor-dim padding tax).
Components: 2-op sort, 10-op sort, row gather, doubling alone.

Run: python scripts/bench_payload_variants.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from utils import make_test_camera, random_scene  # noqa: E402

from manus_tpu.ops.rasterizer.binning import bin_gaussians  # noqa: E402
from manus_tpu.ops.rasterizer.projection import TILE, project_gaussians  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
RES = 512
TG_MAX = 64
NUM_FIELDS = 16


def make_gather(bwd_impl, tg_max, src):
    @jax.custom_vjp
    def gather(means2d, conic, colors, opacity):
        ok = src >= 0
        fields = jnp.concatenate(
            [means2d, conic, opacity[:, None], colors,
             jnp.zeros((means2d.shape[0], NUM_FIELDS - 9), means2d.dtype)],
            axis=1,
        )
        rows = jnp.take(fields, jnp.maximum(src, 0), axis=0)
        return jnp.where(ok[:, None], rows, 0.0).T

    def fwd(m, c, col, o):
        return gather(m, c, col, o), (m.shape[0],)

    def bwd(res, d_payload):
        return bwd_impl(tg_max, res[0], src, d_payload)

    gather.defvjp(fwd, bwd)
    return gather


def bwd_pairmajor(tg_max, n, src, d_payload):
    p = src.shape[0]
    d_rows = d_payload.T
    key = jnp.where(src >= 0, src, n).astype(jnp.int32)
    keys = jnp.concatenate([key, jnp.arange(n, dtype=jnp.int32)])
    total = p + n
    skey, pos = jax.lax.sort(
        (keys, jnp.arange(total, dtype=jnp.int32)), num_keys=1
    )
    dr_ext = jnp.concatenate(
        [d_rows, jnp.zeros((n, NUM_FIELDS), d_rows.dtype)], axis=0
    )
    s = jnp.take(dr_ext, pos, axis=0)
    steps = max(1, int(tg_max).bit_length())
    g = skey
    for k in range(steps):
        sh = 1 << k
        same = jnp.concatenate([g[sh:] == g[:-sh], jnp.zeros((sh,), bool)])
        shifted = jnp.concatenate(
            [s[sh:], jnp.zeros((sh, NUM_FIELDS), s.dtype)], axis=0
        )
        s = s + jnp.where(same[:, None], shifted, 0.0)
    idx = jnp.arange(total, dtype=jnp.int32)
    start = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    key2 = jnp.where(start & (skey < n), skey, n + idx)
    _, pos2 = jax.lax.sort((key2, idx), num_keys=1)
    d_fields = jnp.take(s, pos2[:n], axis=0)
    return (d_fields[:, 0:2], d_fields[:, 2:5], d_fields[:, 6:9],
            d_fields[:, 5])


def bwd_fieldmajor(tg_max, n, src, d_payload):
    p = src.shape[0]
    total = p + n
    key = jnp.where(src >= 0, src, n).astype(jnp.int32)
    keys = jnp.concatenate([key, jnp.arange(n, dtype=jnp.int32)])
    live = [
        jnp.concatenate([d_payload[f], jnp.zeros((n,), d_payload.dtype)])
        for f in range(9)
    ]
    sorted_ops = jax.lax.sort((keys, *live), num_keys=1)
    skey = sorted_ops[0]
    s = jnp.stack(sorted_ops[1:])
    steps = max(1, int(tg_max).bit_length())
    g = skey
    for k in range(steps):
        sh = 1 << k
        same = jnp.concatenate([g[sh:] == g[:-sh], jnp.zeros((sh,), bool)])
        shifted = jnp.concatenate(
            [s[:, sh:], jnp.zeros((9, sh), s.dtype)], axis=1
        )
        s = s + jnp.where(same[None, :], shifted, 0.0)
    idx = jnp.arange(total, dtype=jnp.int32)
    start = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    key2 = jnp.where(start & (skey < n), skey, n + idx)
    out_ops = jax.lax.sort((key2, *[s[f] for f in range(9)]), num_keys=1)
    d = [v[:n] for v in out_ops[1:]]
    return (jnp.stack([d[0], d[1]], axis=1),
            jnp.stack([d[2], d[3], d[4]], axis=1),
            jnp.stack([d[6], d[7], d[8]], axis=1), d[5])


def chain_time(name, fn, *args):
    """fn(*args) must return a tuple with the SAME structure as args: the
    loop feeds outputs back as inputs, so no iteration is loop-invariant.
    (The earlier carry + 1e-12*fn(*a) form was hoistable — XLA's LICM can
    compute fn once outside the fori_loop and the probe times nothing;
    several micro probes measured ~0/negative exactly because of this.)"""

    @jax.jit
    def chain(k, a):
        def body(_, carry):
            return tuple(fn(*carry))

        out = jax.lax.fori_loop(0, k, body, tuple(a))
        # reduce ON DEVICE: large-array readbacks through the tunnel cost
        # hundreds of ms with huge variance and bury the signal
        return sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(out)
        )

    t0 = time.time()
    np.asarray(chain(jnp.asarray(2), args))
    tc = time.time() - t0

    def timed(k):
        t = time.time()
        np.asarray(chain(jnp.asarray(k), args))
        return time.time() - t

    # 60+ iters: sub-ms per-iter signals drown in the ~40-80 ms per-call
    # tunnel readback noise at 20 iters
    t2 = min(timed(2) for _ in range(3))
    t62 = min(timed(62) for _ in range(3))
    per = (t62 - t2) / 60 * 1e3
    print(f"{name:28s} {per:7.3f} ms/iter (compile {tc:.0f}s)", flush=True)
    return per


def main():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    scene = random_scene(N, seed=7)
    cam = make_test_camera(RES, RES)
    proj = jax.jit(project_gaussians)(
        jnp.asarray(scene["means"]), jnp.asarray(scene["cov6"]), cam
    )
    nt = RES // TILE
    bins = jax.jit(
        lambda p: bin_gaussians(p, nt, nt, TG_MAX, 128, 4, 4096)
    )(proj)
    src = bins.pair_src
    colors = jnp.asarray(scene["colors"])
    opacity = jnp.asarray(scene["opacity"])
    print(f"pairs budget: {src.shape[0]}", flush=True)

    results = {}
    for name, impl in (("pairmajor", bwd_pairmajor),
                       ("fieldmajor", bwd_fieldmajor)):
        gather = make_gather(impl, TG_MAX, src)

        def fb(m2d, con, col, op, _g=gather):
            v, g = jax.value_and_grad(
                lambda *a: jnp.sum(_g(*a) * 1e-6), argnums=(0, 1, 2, 3)
            )(m2d, con, col, op)
            # feed the grads back into the inputs (chain dependency)
            return (m2d + 1e-9 * g[0], con + 1e-9 * g[1],
                    col + 1e-9 * g[2], op + 1e-9 * g[3] + 1e-12 * v)

        results[name] = chain_time(
            f"payload f+b [{name}]", fb, proj.means2d, proj.conic,
            colors, opacity,
        )

    # component probes
    total = src.shape[0] + N
    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randint(0, N, total), jnp.int32)
    vals = [jnp.asarray(rng.rand(total), jnp.float32) for _ in range(9)]
    mat = jnp.asarray(rng.rand(total, NUM_FIELDS), jnp.float32)
    idx = jnp.asarray(rng.permutation(total), jnp.int32)

    chain_time("sort 2-op",
               lambda k, i: jax.lax.sort((k, i), num_keys=1),
               keys, jnp.arange(total, dtype=jnp.int32))
    chain_time("sort 10-op",
               lambda k, *v: jax.lax.sort((k, *v), num_keys=1),
               keys, *vals)
    chain_time("row gather [T,16]",
               lambda m, i: (jnp.take(m, i, axis=0), i), mat, idx)

    def doubling_pm(m, k):
        s = m
        for j in range(7):
            sh = 1 << j
            same = jnp.concatenate([k[sh:] == k[:-sh],
                                    jnp.zeros((sh,), bool)])
            shifted = jnp.concatenate(
                [s[sh:], jnp.zeros((sh, NUM_FIELDS), s.dtype)], axis=0)
            s = s + jnp.where(same[:, None], shifted, 0.0)
        return s * 0.005, k  # rescale so the fed-back values stay bounded

    def doubling_fm(mT, k):
        s = mT
        for j in range(7):
            sh = 1 << j
            same = jnp.concatenate([k[sh:] == k[:-sh],
                                    jnp.zeros((sh,), bool)])
            shifted = jnp.concatenate(
                [s[:, sh:], jnp.zeros((NUM_FIELDS, sh), s.dtype)], axis=1)
            s = s + jnp.where(same[None, :], shifted, 0.0)
        return s * 0.005, k

    chain_time("doubling x7 [T,16]", doubling_pm, mat, keys)
    chain_time("doubling x7 [16,T]", doubling_fm, mat.T, keys)

    print(f"\nsummary: pairmajor {results['pairmajor']:.3f} ms, "
          f"fieldmajor {results['fieldmajor']:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
