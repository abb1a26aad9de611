"""Pair-payload construction for the tiled raster kernels.

The payload is a field-major [16, P_pad] f32 array: one column per
(gaussian, tile) pair in lane-aligned per-tile segments (see binning.py),
with the 9 live fields in the first rows and zero padding to 16. A
[16, 128] chunk slice is 16 contiguous 512B bursts and lands on a
128-lane-aligned column offset, which the Mosaic DMA engine requires; in
the kernel each field is a [1, G] row that broadcasts against [Px, 1]
pixel columns with no transposes.

Padding slots get all-zero columns (opacity 0 composites as a no-op).

Layout strategy (all variants measured on v5e at 65k gaussians / 262k
pair budget): XLA TPU *scatters* are pathologically slow — a unique-index
row scatter costs ~15 ms, the minor-dim scatter-add that plain autodiff
of the forward gather produces ~3.6 ms — while *sorts* are cheap (~0.25
ms for a 262k 2-operand sort) and major-dim row gathers ~0.6 ms. So:

  forward:  row gather [N, 16] -> [P, 16] + one tiled transpose
            (~0.6 ms vs ~0.75 ms for the field-major minor-dim gather);
  backward: NO scatter at all. Sort the pair cotangents by source
            gaussian, segmented suffix-sum via pointer-doubling (run
            lengths are bounded by tg_max: a gaussian emits at most
            tg_max pairs), and read each run's total back with a second
            tiny int sort + row gather. One appended "ghost pair" per
            gaussian (zero cotangent) guarantees every gaussian owns a
            run, so the run-start extraction is a dense [N] row gather
            with no missing-id bookkeeping.

The backward is a custom VJP because autodiff of the forward gather would
reintroduce exactly the scatter-add this design exists to avoid.

A field-major backward rewrite (the 9 cotangent field rows riding both
sorts as extra [total] operands, doubling on a [9, total] stack) was
measured SLOWER like-for-like in two independent sessions (2.89 vs 2.31
ms, then 3.81 vs 2.07 ms with loop-carried chaining;
scripts/bench_payload_variants.py): the hypothesized 16->128 minor-dim
padding tax never binds — XLA fuses the [T, 16] passes well — so the
pair-major form below stands.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from manus_tpu.ops.rasterizer.binning import TileBins
from manus_tpu.ops.rasterizer.projection import ProjectedGaussians

# Field order (rows of the payload matrix).
F_MEAN_X, F_MEAN_Y = 0, 1
F_CONIC_A, F_CONIC_B, F_CONIC_C = 2, 3, 4
F_OPACITY = 5
F_R, F_G, F_B = 6, 7, 8
NUM_FIELDS = 16  # padded so the chunk buffer keeps (8, 128)-friendly shape


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_pairs(tg_max, means2d, conic, colors, opacity, src):
    ok = src >= 0
    fields = jnp.concatenate(
        [
            means2d,  # [N, 2]
            conic,  # [N, 3]
            opacity[:, None],  # [N, 1]
            colors,  # [N, 3]
            jnp.zeros((means2d.shape[0], NUM_FIELDS - 9), means2d.dtype),
        ],
        axis=1,
    )  # [N, 16]
    rows = jnp.take(fields, jnp.maximum(src, 0), axis=0)  # [P, 16]
    return jnp.where(ok[:, None], rows, 0.0).T  # [16, P]


def _gather_pairs_fwd(tg_max, means2d, conic, colors, opacity, src):
    out = _gather_pairs(tg_max, means2d, conic, colors, opacity, src)
    return out, (means2d.shape[0], src)


def _gather_pairs_bwd(tg_max, res, d_payload):
    n, src = res
    p = src.shape[0]
    d_rows = d_payload.T  # [P, 16]

    # Keys: source gaussian id; dead pairs key to n (sort to the tail and
    # never match a real run). One zero-cotangent ghost pair per gaussian
    # guarantees every id owns a run.
    key = jnp.where(src >= 0, src, n).astype(jnp.int32)
    keys = jnp.concatenate([key, jnp.arange(n, dtype=jnp.int32)])
    total = p + n
    skey, pos = jax.lax.sort(
        (keys, jnp.arange(total, dtype=jnp.int32)), num_keys=1
    )
    dr_ext = jnp.concatenate(
        [d_rows, jnp.zeros((n, NUM_FIELDS), d_rows.dtype)], axis=0
    )
    s = jnp.take(dr_ext, pos, axis=0)  # [P+N, 16], grouped by gaussian

    # Segmented suffix-sum by pointer doubling: runs are <= tg_max + 1
    # entries (tg_max pairs + the ghost), so ceil(log2(tg_max+1)) steps.
    # Exact per-segment summation — no cumsum cancellation across
    # unrelated gaussians.
    steps = max(1, int(tg_max).bit_length())  # 2**steps >= tg_max + 1
    g = skey
    for k in range(steps):
        sh = 1 << k
        same = jnp.concatenate(
            [g[sh:] == g[:-sh], jnp.zeros((sh,), bool)]
        )
        shifted = jnp.concatenate(
            [s[sh:], jnp.zeros((sh, NUM_FIELDS), s.dtype)], axis=0
        )
        s = s + jnp.where(same[:, None], shifted, 0.0)

    # Run starts carry the full segment sum; every gaussian id has exactly
    # one (ghosts), so sorting (id at starts, unique big keys elsewhere)
    # puts start positions 0..n-1 in gaussian-id order.
    idx = jnp.arange(total, dtype=jnp.int32)
    start = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
    )
    key2 = jnp.where(start & (skey < n), skey, n + idx)
    _, pos2 = jax.lax.sort((key2, idx), num_keys=1)
    d_fields = jnp.take(s, pos2[:n], axis=0)  # [N, 16]

    return (
        d_fields[:, 0:2],  # means2d
        d_fields[:, 2:5],  # conic
        d_fields[:, 6:9],  # colors
        d_fields[:, 5],  # opacity
        np.zeros(src.shape, jax.dtypes.float0),
    )


_gather_pairs.defvjp(_gather_pairs_fwd, _gather_pairs_bwd)


def build_payload(
    proj: ProjectedGaussians,
    colors: jax.Array,  # [N, 3]
    opacity: jax.Array,  # [N]
    bins: TileBins,
    tg_max: int,
) -> jax.Array:
    """Gather per-gaussian fields into the aligned pair layout [16, P_pad].

    tg_max must match the value `bins` was built with (it bounds the
    per-gaussian run length the backward's segmented sum covers).
    """
    return _gather_pairs(
        tg_max, proj.means2d, proj.conic, colors, opacity, bins.pair_src
    )
