"""Linear blend skinning of Gaussians, pure jnp einsums.

Replicates the articulation math of the reference hand module
(/root/reference/src/modules/hand_dynamic.py:86-137): per-bone transforms
relative to rest, per-point blended transforms from skinning weights,
posed means via homogeneous transform, and posed covariances via
R Sigma R^T — all shaped as batched einsums that XLA maps to the MXU.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from manus_tpu.utils.transforms import build_symmetric, strip_symmetric


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
    tf = jnp.einsum("nb,bij->nij", skin_weights, transforms,
                    precision=jax.lax.Precision.HIGHEST)  # [N, 4, 4]
    ones = jnp.ones_like(cano_xyz[:, :1])
    xyz_h = jnp.concatenate([cano_xyz, ones], axis=-1)
    posed_xyz = jnp.einsum("nij,nj->ni", tf, xyz_h)[:, :3]

    rot = tf[:, :3, :3]
    cov_full = build_symmetric(cano_cov)
    posed_cov = jnp.einsum("nij,njk,nlk->nil", rot, cov_full, rot,
                           precision=jax.lax.Precision.HIGHEST)
    return SkinnedGaussians(
        posed_xyz=posed_xyz,
        posed_cov=strip_symmetric(posed_cov),
        tf=tf,
    )
