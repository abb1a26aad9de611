"""Nearest-neighbor ops on point sets, MXU-friendly blockwise formulation.

TPU-native replacements for two native components of the reference
(SURVEY.md section 2.9):
  * simple-knn's distCUDA2 (mean squared distance to 3 nearest neighbors,
    used once for log-scale init — reference gaussian.py:110),
  * the Taichi brute-force NN distance+index kernel used for contact maps
    (reference gaussian_utils.py:521-554).

The pairwise distance matrix is computed blockwise as
|x|^2 + |y|^2 - 2 x.y^T — the inner product rides the MXU, and blocking
keeps the [B, M] slab in VMEM-sized chunks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_rows(x: jax.Array, block: int, fill: float):
    n = x.shape[0]
    pad = (-n) % block
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        )
    return x, n


def knn_self_distances_host(points, k: int = 3, block: int = 4096):
    """Host-side (numpy) knn_self_distances for init-time use.

    Scale init (reference gaussian.py:110 distCUDA2) is the FIRST device
    op of every cold start, and the tunneled TPU platform is at its most
    fragile right after process start — BENCH_r03 died three times inside
    the device version of this op. The workload is init-time-only and
    tiny (SURVEY.md 2.9), so it runs on the host: blockwise
    |x|^2+|y|^2-2xy^T with np.partition top-k, ~1s at 131k points.

    points: [N, 3] array-like. Returns np.ndarray [N] float32.
    """
    import numpy as np

    pts = np.asarray(points, np.float32)
    n = pts.shape[0]
    sq = np.sum(pts * pts, axis=-1)
    out = np.empty(n, np.float32)
    for i in range(0, n, block):
        rows = pts[i:i + block]
        d2 = sq[i:i + block, None] + sq[None, :] - 2.0 * (rows @ pts.T)
        ids = np.arange(i, i + rows.shape[0])
        d2[np.arange(rows.shape[0]), ids] = np.inf  # mask self
        kk = min(k, n - 1)
        top = np.partition(d2, kk - 1, axis=-1)[:, :kk]
        out[i:i + block] = np.maximum(top, 0.0).mean(axis=-1)
    return out


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_self_distances(points: jax.Array, k: int = 3, block: int = 1024):
    """Mean squared distance from each point to its k nearest neighbors
    (excluding itself). Equivalent to simple-knn's distCUDA2 for k=3.

    points: [N, 3]. Returns [N].
    """
    pts, n = _pad_rows(points, block, jnp.inf)
    np_ = pts.shape[0]
    sq = jnp.sum(jnp.where(jnp.isfinite(pts), pts, 0.0) ** 2, axis=-1)
    pts_z = jnp.where(jnp.isfinite(pts), pts, 0.0)

    def body(i, _):
        rows = jax.lax.dynamic_slice_in_dim(pts_z, i * block, block)
        rows_sq = jax.lax.dynamic_slice_in_dim(sq, i * block, block)
        d2 = (
            rows_sq[:, None]
            + sq[None, :]
            - 2.0 * rows @ pts_z.T
        )  # [block, Np]
        # mask self and padding
        col = jnp.arange(np_)
        row_ids = i * block + jnp.arange(block)
        d2 = jnp.where(col[None, :] == row_ids[:, None], jnp.inf, d2)
        pad_mask = col[None, :] >= n
        d2 = jnp.where(pad_mask, jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return i + 1, jnp.mean(jnp.maximum(-neg_top, 0.0), axis=-1)

    _, out = jax.lax.scan(
        lambda c, _: body(c, None), 0, None, length=np_ // block
    )
    return out.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("block",))
def nearest_neighbor(pt1: jax.Array, pt2: jax.Array, block: int = 1024,
                     pt2_valid: jax.Array | None = None):
    """For each point in pt1 [N,3], distance and index of nearest pt2 [M,3].

    Replaces the Taichi contact kernel (gaussian_utils.py:521-554).
    Returns (dist [N], idx [N] int32).
    """
    p1, n = _pad_rows(pt1, block, 0.0)
    m = pt2.shape[0]
    sq2 = jnp.sum(pt2 * pt2, axis=-1)
    if pt2_valid is not None:
        sq2 = jnp.where(pt2_valid, sq2, jnp.inf)

    def body(i, _):
        rows = jax.lax.dynamic_slice_in_dim(p1, i * block, block)
        d2 = (
            jnp.sum(rows * rows, axis=-1)[:, None]
            + sq2[None, :]
            - 2.0 * rows @ pt2.T
        )
        idx = jnp.argmin(d2, axis=-1)
        best = jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0]
        return i + 1, (jnp.sqrt(jnp.maximum(best, 0.0)), idx.astype(jnp.int32))

    _, (dist, idx) = jax.lax.scan(
        lambda c, _: body(c, None), 0, None, length=p1.shape[0] // block
    )
    return dist.reshape(-1)[:n], idx.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_indices(query: jax.Array, ref: jax.Array, k: int, block: int = 1024):
    """Indices of the k nearest ref points for each query point.

    query: [N, 3], ref: [M, 3]. Returns [N, k] int32. Used for MANO
    skin-weight initialisation (reference train_utils.py:70-74).
    """
    q, n = _pad_rows(query, block, 0.0)
    sq2 = jnp.sum(ref * ref, axis=-1)

    def body(i, _):
        rows = jax.lax.dynamic_slice_in_dim(q, i * block, block)
        d2 = (
            jnp.sum(rows * rows, axis=-1)[:, None]
            + sq2[None, :]
            - 2.0 * rows @ ref.T
        )
        _, idx = jax.lax.top_k(-d2, k)
        return i + 1, idx.astype(jnp.int32)

    _, idx = jax.lax.scan(
        lambda c, _: body(c, None), 0, None, length=q.shape[0] // block
    )
    return idx.reshape(-1, k)[:n]
