"""Linear blend skinning of Gaussians, pure jnp einsums.

Replicates the articulation math of the reference hand module
(/root/reference/src/modules/hand_dynamic.py:86-137): per-bone transforms
relative to rest, per-point blended transforms from skinning weights,
posed means via homogeneous transform, and posed covariances via
R Sigma R^T — all shaped as batched einsums that XLA maps to the MXU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp



class SkinnedGaussians(NamedTuple):
    posed_xyz: jax.Array  # [N, 3]
    posed_cov: jax.Array  # [N, 6]
    tf: jax.Array  # [N, 4, 4] blended per-point transforms


def bone_deformation_transforms(
    posed_transforms: jax.Array,  # [J, 4, 4]
    rest_transforms: jax.Array,  # [J, 4, 4]
    append_identity: bool = False,
) -> jax.Array:
    """Per-bone rest->posed transforms: posed @ inv(rest).

    `append_identity` adds the background channel (voxel skinning mode,
    reference hand_dynamic.py:98-103).
    """
    tf = jnp.einsum(
        "nij,njk->nik", posed_transforms, jnp.linalg.inv(rest_transforms)
    )
    if append_identity:
        eye = jnp.eye(4, dtype=tf.dtype)[None]
        tf = jnp.concatenate([tf, eye], axis=0)
    return tf


def skin_gaussians(
    cano_xyz: jax.Array,  # [N, 3]
    cano_cov: jax.Array,  # [N, 6] upper-tri canonical covariance
    skin_weights: jax.Array,  # [N, B]
    transforms: jax.Array,  # [B, 4, 4]
) -> SkinnedGaussians:
    """LBS: blend bone transforms per point, pose means and covariances.

    Matches reference hand_dynamic.py:106-127.
    """
    # weight blend: a true [N, B] x [B, 16] matmul — MXU-friendly as-is
    b = transforms.shape[0]
    tf = jnp.matmul(
        skin_weights, transforms.reshape(b, 16),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1, 4, 4)

    # posed means + R Sigma R^T in explicit scalar form: batched [N,3,3]
    # matmuls pad 3 -> 128 on the MXU and cost ~10ms at 65k gaussians; the
    # unrolled VPU form is ~1ms.
    r00, r01, r02 = tf[:, 0, 0], tf[:, 0, 1], tf[:, 0, 2]
    r10, r11, r12 = tf[:, 1, 0], tf[:, 1, 1], tf[:, 1, 2]
    r20, r21, r22 = tf[:, 2, 0], tf[:, 2, 1], tf[:, 2, 2]
    x, y, z = cano_xyz[:, 0], cano_xyz[:, 1], cano_xyz[:, 2]
    posed_xyz = jnp.stack(
        [
            r00 * x + r01 * y + r02 * z + tf[:, 0, 3],
            r10 * x + r11 * y + r12 * z + tf[:, 1, 3],
            r20 * x + r21 * y + r22 * z + tf[:, 2, 3],
        ],
        axis=-1,
    )

    sxx, sxy, sxz, syy, syz, szz = jnp.moveaxis(cano_cov, -1, 0)

    def row_sigma(a, b_, c):  # (a,b,c) . Sigma -> 3-vector
        return (
            a * sxx + b_ * sxy + c * sxz,
            a * sxy + b_ * syy + c * syz,
            a * sxz + b_ * syz + c * szz,
        )

    m0 = row_sigma(r00, r01, r02)
    m1 = row_sigma(r10, r11, r12)
    m2 = row_sigma(r20, r21, r22)

    def dot_row(m, a, b_, c):
        return m[0] * a + m[1] * b_ + m[2] * c

    posed_cov = jnp.stack(
        [
            dot_row(m0, r00, r01, r02),
            dot_row(m0, r10, r11, r12),
            dot_row(m0, r20, r21, r22),
            dot_row(m1, r10, r11, r12),
            dot_row(m1, r20, r21, r22),
            dot_row(m2, r20, r21, r22),
        ],
        axis=-1,
    )
    return SkinnedGaussians(
        posed_xyz=posed_xyz,
        posed_cov=posed_cov,
        tf=tf,
    )
