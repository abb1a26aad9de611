"""Multi-view keypoint triangulation (confidence-weighted DLT), pure jnp.

Geometric stage of the reference preprocessing pipeline
(/root/reference/preprocess/EasyMocap/myeasymocap/operations/triangulate.py:6-42
batch SVD DLT; "iterative" mode re-weights by reprojection error). The 2D
keypoint networks upstream are external producers; this consumes their
[V, J, 3] (x, y, conf) outputs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_triangulate(
    keypoints: jax.Array,  # [V, J, 3] (x, y, conf)
    P_all: jax.Array,  # [V, 3, 4] projection matrices (K @ [R|t])
    min_view: int = 2,
) -> jax.Array:
    """DLT triangulation of J joints from V views. Returns [J, 4]
    (xyz + mean confidence; zero row when seen by < min_view views)."""
    conf = keypoints[:, :, 2]  # [V, J]
    n_seen = jnp.sum(conf > 0, axis=0)  # [J]
    valid = n_seen >= min_view

    P0 = P_all[:, 0, :]  # [V, 4]
    P1 = P_all[:, 1, :]
    P2 = P_all[:, 2, :]
    u = keypoints[:, :, 0]  # [V, J]
    v = keypoints[:, :, 1]
    # rows: conf * (u * P2 - P0), conf * (v * P2 - P1)  -> [J, 2V, 4]
    Au = conf.T[:, :, None] * (u.T[:, :, None] * P2[None] - P0[None])
    Av = conf.T[:, :, None] * (v.T[:, :, None] * P2[None] - P1[None])
    A = jnp.concatenate([Au, Av], axis=1)  # [J, 2V, 4]

    # homogeneous least squares: eigvector of A^T A with smallest eigenvalue
    _, _, vt = jnp.linalg.svd(A)
    X = vt[:, -1, :]
    X = X / jnp.where(jnp.abs(X[:, 3:]) > 1e-12, X[:, 3:], 1.0)
    conf3d = jnp.sum(conf, axis=0) / jnp.maximum(n_seen, 1)
    out = jnp.concatenate([X[:, :3], conf3d[:, None]], axis=1)
    return jnp.where(valid[:, None], out, 0.0)


def reprojection_error(
    points3d: jax.Array,  # [J, 3]
    keypoints: jax.Array,  # [V, J, 3]
    P_all: jax.Array,  # [V, 3, 4]
) -> jax.Array:
    """Per-(view, joint) pixel reprojection error [V, J]."""
    homo = jnp.concatenate(
        [points3d, jnp.ones_like(points3d[:, :1])], axis=1
    )
    proj = jnp.einsum("vab,jb->vja", P_all, homo)
    z = proj[..., 2:]
    xy = proj[..., :2] / jnp.where(jnp.abs(z) > 1e-12, z, 1.0)
    return jnp.linalg.norm(xy - keypoints[..., :2], axis=-1)


def iterative_triangulate(
    keypoints: jax.Array,  # [V, J, 3]
    P_all: jax.Array,  # [V, 3, 4]
    min_view: int = 2,
    iterations: int = 3,
    error_threshold_px: float = 20.0,
) -> jax.Array:
    """Robust triangulation via greedy leave-one-out, the spirit of
    EasyMocap's 'iterative' mode. A gross outlier drags the confidence-
    weighted DLT toward itself, so residual thresholds reject the wrong
    views; instead, per pass and per joint, try dropping each view, keep
    the drop that minimises the worst remaining reprojection error, and
    accept it only if the baseline fit violates the threshold."""
    v = keypoints.shape[0]
    kp = keypoints

    def max_err(kp_local):
        p3d = batch_triangulate(kp_local, P_all, min_view)
        err = reprojection_error(p3d[:, :3], kp_local, P_all)  # [V, J]
        err = jnp.where(kp_local[:, :, 2] > 0, err, 0.0)
        return jnp.max(err, axis=0)  # [J]

    def body(kp, _):
        base_err = max_err(kp)  # [J]

        def try_drop(view):
            kp_d = kp.at[view, :, 2].set(0.0)
            return max_err(kp_d)

        cand_err = jax.vmap(try_drop)(jnp.arange(v))  # [V, J]
        best_view = jnp.argmin(cand_err, axis=0)  # [J]
        best_err = jnp.min(cand_err, axis=0)
        accept = (base_err > error_threshold_px) & (best_err < base_err)
        v_ids = jnp.arange(v)
        kill = (v_ids[:, None] == best_view[None, :]) & accept[None, :]
        new_conf = jnp.where(kill, 0.0, kp[:, :, 2])
        return kp.at[:, :, 2].set(new_conf), None

    kp, _ = jax.lax.scan(body, kp, None, length=iterations)
    return batch_triangulate(kp, P_all, min_view)
