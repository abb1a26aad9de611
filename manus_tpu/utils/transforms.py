"""Rotation / rigid-transform math and forward kinematics, pure jnp.

Semantics match the reference MANUS transform stack
(/root/reference/src/utils/transforms.py) so that recorded fixtures
transfer, but everything here is written batched-first and functional so XLA
can fuse it. All functions accept arbitrary leading batch dims.

Quaternions are (w, x, y, z), real part first.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Quaternion <-> matrix <-> axis-angle <-> euler
# ---------------------------------------------------------------------------


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """[..., 4] wxyz quaternion -> [..., 3, 3] rotation matrix.

    Mirrors reference transforms.py:103-131 (unnormalised input is scaled by
    2/|q|^2 like the reference; callers that need exact unit-quat behaviour
    should normalise first).
    """
    r, i, j, k = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with a zero subgradient at x == 0."""
    positive = x > 0
    x_safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(x_safe), 0.0)


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation matrix -> [..., 4] wxyz quaternion.

    Best-conditioned-candidate selection as in reference
    transforms.py:145-198.
    """
    batch = m.shape[:-2]
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(
        m.reshape(batch + (9,)), -1, 0
    )
    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))
    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    """[..., 3] axis*angle -> [..., 4] wxyz. Reference transforms.py:70-100."""
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    small = jnp.abs(angles) < 1e-6
    angles_safe = jnp.where(small, 1.0, angles)
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / angles_safe
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(q: jax.Array) -> jax.Array:
    """[..., 4] wxyz -> [..., 3] axis*angle. Reference transforms.py:7-35."""
    norms = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, q[..., :1])
    angles = 2.0 * half_angles
    small = jnp.abs(angles) < 1e-6
    angles_safe = jnp.where(small, 1.0, angles)
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half_angles) / angles_safe
    )
    return q[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(m: jax.Array) -> jax.Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(m))


def _single_axis_rotation(axis: str, angle: jax.Array) -> jax.Array:
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f"axis must be X, Y or Z, got {axis}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(
    euler: jax.Array, convention: str = "XYZ", intrinsic: bool = False
) -> jax.Array:
    """[..., 3] Euler angles (radians) -> [..., 3, 3].

    `intrinsic=True` matches the reference convention used for hand poses
    (transforms.py:489-530): reverse the convention string and flip the
    angle order.
    """
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"bad convention {convention}")
    if intrinsic:
        convention = convention[::-1]
        euler = jnp.flip(euler, axis=-1)
    mats = [
        _single_axis_rotation(c, euler[..., i]) for i, c in enumerate(convention)
    ]
    return mats[0] @ mats[1] @ mats[2]


def euler_angles_to_quats(euler: jax.Array) -> jax.Array:
    """Intrinsic-XYZ euler -> wxyz quats (reference transforms.py:478-486)."""
    return matrix_to_quaternion(euler_angles_to_matrix(euler, "XYZ", intrinsic=True))


# ---------------------------------------------------------------------------
# Homogeneous helpers
# ---------------------------------------------------------------------------


def homogenize_points(x: jax.Array) -> jax.Array:
    """[..., 3] points -> [..., 4] by appending 1."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def homogenize_matrix(x: jax.Array) -> jax.Array:
    """[..., 3, 4] -> [..., 4, 4] by appending the (0,0,0,1) row."""
    row = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=x.dtype), x.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([x, row], axis=-2)


def transform_points(mat: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply [..., 4, 4] (or [4,4]) transforms to [..., 3] points."""
    return jnp.einsum("...ij,...j->...i", mat, homogenize_points(pts))[..., :3]


def project_points(points: jax.Array, K: jax.Array, extrin: jax.Array) -> jax.Array:
    """Pinhole projection of [..., N, 3] world points -> [..., N, 2] pixels.

    K: [3,3], extrin: [3,4] world->camera (OpenCV convention). Matches
    reference transforms.py:304-311.
    """
    P = K @ extrin  # [3, 4]
    proj = jnp.einsum("ij,...j->...i", P, homogenize_points(points))
    return proj[..., :2] / proj[..., 2:3]


# ---------------------------------------------------------------------------
# Forward kinematics
# ---------------------------------------------------------------------------


def build_kintree(bnames, bnames_parent) -> dict:
    """Map bone index (str) -> parent index (-1 for roots).

    Same contract as reference transforms.py:609-623.
    """
    bnames = [str(b) for b in np.asarray(bnames).tolist()]
    parents = [
        None if p is None else str(p) for p in np.asarray(bnames_parent).tolist()
    ]
    kintree = {}
    for idx, parent in enumerate(parents):
        if parent is not None and parent != "None":
            kintree[str(idx)] = bnames.index(parent)
        else:
            kintree[str(idx)] = -1
    return kintree


def kintree_to_parent_array(kintree: dict) -> np.ndarray:
    """kintree dict -> int parent array (host-side, static)."""
    n = len(kintree)
    return np.asarray([kintree[str(i)] for i in range(n)], dtype=np.int32)


def get_pose_wrt_root(
    rest_pose: jax.Array,
    pose_param: jax.Array,
    global_pose: jax.Array,
    global_t: jax.Array,
    kintree: dict,
) -> jax.Array:
    """FK along the kinematic tree.

    Args:
      rest_pose:   [J, 4, 4] rest bone matrices (armature space).
      pose_param:  [B, J, 3, 3] local joint rotations.
      global_pose: [B, 3, 3] root rotation.
      global_t:    [B, 3] root translation.
      kintree:     dict {str(i): parent or -1} (static).

    Returns [B, J, 4, 4] posed bone matrices. Matches reference
    transforms.py:233-261. The per-bone loop is unrolled at trace time (J is
    tiny, ~20) and each step is a batched einsum, so XLA sees a static chain
    of small matmuls.
    """
    J = rest_pose.shape[0]
    parents = kintree_to_parent_array(kintree)
    global_trans = homogenize_matrix(
        jnp.concatenate([global_pose, global_t[..., None]], axis=-1)
    )  # [B, 4, 4]
    pose_h = homogenize_matrix(
        jnp.concatenate([pose_param, jnp.zeros_like(pose_param[..., :1])], axis=-1)
    )  # [B, J, 4, 4]

    rest_inv = jnp.linalg.inv(rest_pose)  # [J, 4, 4]
    out = [None] * J
    for i in range(J):
        p = int(parents[i])
        if p == -1:
            out[i] = global_trans @ rest_pose[i] @ pose_h[:, i]
    for i in range(J):
        p = int(parents[i])
        if p == -1:
            continue
        local = rest_inv[p] @ rest_pose[i]  # [4, 4]
        out[i] = out[p] @ (local @ pose_h[:, i])
    return jnp.stack(out, axis=1)


def get_keypoints(
    pose_matrix: jax.Array, rest_pose: jax.Array, rest_joints: jax.Array
) -> jax.Array:
    """Posed joint positions from bone matrices (reference transforms.py:294-301).

    pose_matrix: [B, J, 4, 4]; rest_pose: [J, 4, 4]; rest_joints: [J, 3].
    """
    rest_local = jnp.einsum(
        "jik,jk->ji", jnp.linalg.inv(rest_pose), homogenize_points(rest_joints)
    )
    posed = jnp.einsum("bjik,jk->bji", pose_matrix, rest_local)
    return posed[..., :3]


# ---------------------------------------------------------------------------
# Gaussian-specific rotation builders (quaternion -> R, R*S)
# ---------------------------------------------------------------------------


def build_rotation(q: jax.Array) -> jax.Array:
    """Normalise wxyz quats then convert to [N, 3, 3] rotation matrices.

    Matches reference gaussian_utils.py:279-302.
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quaternion_to_matrix(q)


def build_scaling_rotation(s: jax.Array, q: jax.Array) -> jax.Array:
    """L = R @ diag(s): [N, 3] scales + [N, 4] quats -> [N, 3, 3].

    Matches reference gaussian_utils.py:305-314.
    """
    R = build_rotation(q)
    return R * s[:, None, :]


def strip_symmetric(cov: jax.Array) -> jax.Array:
    """[N, 3, 3] symmetric -> [N, 6] upper triangular (xx,xy,xz,yy,yz,zz)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def build_symmetric(six: jax.Array) -> jax.Array:
    """[N, 6] upper triangular -> [N, 3, 3] symmetric."""
    xx, xy, xz, yy, yz, zz = jnp.moveaxis(six, -1, 0)
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def covariance_from_scaling_rotation(
    scaling: jax.Array, rotation: jax.Array, scaling_modifier: float = 1.0
) -> jax.Array:
    """3D covariance Sigma = (R S)(R S)^T, returned as [N, 6] upper-tri.

    Matches reference gaussian.py:49-53. Unrolled scalar form: Sigma_ij =
    sum_k s_k^2 R_ik R_jk — a batched [N,3,3] matmul pads onto the 128x128
    MXU (defaulting to bf16 inputs) and costs ~1.3 ms at 65k gaussians on
    v5e; the VPU form is ~50 us and stays fp32.
    """
    R = build_rotation(rotation)
    s2 = jnp.square(scaling_modifier * scaling)  # [N, 3]
    s0, s1, s2_ = s2[..., 0], s2[..., 1], s2[..., 2]

    def sig(i, j):
        return (
            s0 * R[..., i, 0] * R[..., j, 0]
            + s1 * R[..., i, 1] * R[..., j, 1]
            + s2_ * R[..., i, 2] * R[..., j, 2]
        )

    return jnp.stack(
        [sig(0, 0), sig(0, 1), sig(0, 2), sig(1, 1), sig(1, 2), sig(2, 2)],
        axis=-1,
    )
