"""Statistical outlier detection for gaussian clouds (LoOP estimator).

TPU-native replacement for the reference's pymeshlab outlier prune
(/root/reference/src/utils/gaussian_utils.py:557-568 and its call site
src/models/gaussian.py:323-326: propthreshold=0.8, knearest=512, fired
once at `remove_outliers_step`). MeshLab's "select point cloud outliers"
filter implements the Local Outlier Probability (LoOP) of Kriegel et al.;
this module reimplements that estimator directly on the MXU blockwise
kNN machinery of ops/knn.py:

  sigma(p)  = sqrt(mean_{o in kNN(p)} d^2(p, o))      (standard distance)
  plof(p)   = sigma(p) / mean_{o in kNN(p)} sigma(o) - 1
  nplof     = lambda * sqrt(mean_p plof(p)^2)
  LoOP(p)   = max(0, erf(plof(p) / (nplof * sqrt(2))))

Points with LoOP > prob are outliers. Runs as one jitted call on the
padded [N_max] cloud with an active mask (inactive slots are excluded
from both roles — query and neighbor).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block"))
def _knn_d2_and_idx(points, valid, k: int, block: int):
    """Squared distances + indices of the k nearest VALID neighbors
    (self excluded) for every row. Invalid rows get garbage (masked by
    the caller). points: [N, 3] (N % block == 0)."""
    n = points.shape[0]
    pts = jnp.where(valid[:, None], points, 0.0)
    sq = jnp.sum(pts * pts, axis=-1)
    sq_masked = jnp.where(valid, sq, jnp.inf)

    def body(i, _):
        rows = jax.lax.dynamic_slice_in_dim(pts, i * block, block)
        rows_sq = jax.lax.dynamic_slice_in_dim(sq, i * block, block)
        d2 = rows_sq[:, None] + sq_masked[None, :] - 2.0 * rows @ pts.T
        row_ids = i * block + jnp.arange(block)
        d2 = jnp.where(
            jnp.arange(n)[None, :] == row_ids[:, None], jnp.inf, d2
        )
        neg_top, idx = jax.lax.top_k(-d2, k)
        return i + 1, (jnp.maximum(-neg_top, 0.0), idx.astype(jnp.int32))

    _, (d2, idx) = jax.lax.scan(
        lambda c, _: body(c, None), 0, None, length=n // block
    )
    return d2.reshape(-1, k), idx.reshape(-1, k)


@functools.partial(jax.jit, static_argnames=("k", "lam", "block"))
def loop_outlier_probability(
    points: jax.Array,  # [N, 3] (N multiple of block; pad if needed)
    valid: jax.Array,  # [N] bool
    k: int = 32,
    lam: float = 3.0,
    block: int = 1024,
) -> jax.Array:
    """Per-point LoOP in [0, 1]; 0 for invalid rows."""
    d2, idx = _knn_d2_and_idx(points, valid, k, block)
    sigma = jnp.sqrt(jnp.mean(d2, axis=-1))  # [N]
    # mean neighbor sigma (the "expected" density around p)
    nb_sigma = jnp.mean(sigma[idx], axis=-1)
    plof = sigma / jnp.maximum(nb_sigma, 1e-12) - 1.0
    plof = jnp.where(valid, plof, 0.0)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    nplof = lam * jnp.sqrt(jnp.sum(plof * plof) / n_valid)
    z = plof / jnp.maximum(nplof * jnp.sqrt(2.0), 1e-12)
    prob = jnp.maximum(jax.lax.erf(z), 0.0)
    return jnp.where(valid, prob, 0.0)


def outlier_mask(
    points: jax.Array,
    valid: jax.Array,
    prob: float = 0.8,
    k: int = 32,
    block: int = 1024,
) -> jax.Array:
    """[N] bool — True where a valid point is a statistical outlier.

    Defaults track the reference call (prob=0.8); k defaults lower than
    the reference's 512 because LoOP stabilises long before that and the
    top_k cost scales with k (512 is supported, just slower). Handles any
    N by padding to the block size with invalid rows.
    """
    n = points.shape[0]
    block = min(block, max(8, n))
    pad = (-n) % block
    if pad:
        points = jnp.concatenate(
            [points, jnp.zeros((pad, 3), points.dtype)], axis=0
        )
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    k = min(k, n - 1)
    probs = loop_outlier_probability(points, valid, k=k, block=block)
    return (probs > prob)[:n]
