"""In-repo novel-pose sequence generation.

Counterpart of the reference's Blender-side export
(scripts/process/export_novel_pose.py, driven by get_novel_pose.sh): the
reference animates a hand armature in a .blend file and dumps the
meta_data pkl contract (bnames, rest/pose matrixs/tails/heads, eulers,
root rotation/translation) that its TestDataset novel-pose modes consume.

Here the same contract is produced without Blender: differentiable FK
(utils/transforms.get_pose_wrt_root) over per-joint euler trajectories —
either procedurally generated flexion cycles bounded by the anatomical
DOF/limit tables (preprocess/ik.default_hand_dof) or interpolations
between user-supplied key poses (e.g. IK solutions from real frames).
The output pkl is loadable by data.synthetic.load_skeleton and by the
reference's own readers (identity armature->world matrices, so
world-space and armature-space transforms coincide).
"""
from __future__ import annotations

import os
import pickle
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from manus_tpu.utils.transforms import (
    build_kintree,
    euler_angles_to_matrix,
    get_keypoints,
    get_pose_wrt_root,
)


def flexion_eulers(
    num_frames: int,
    dof: np.ndarray,  # [J, 3] bool allowed axes (per-bone, no root row)
    limits: np.ndarray,  # [J, 3, 2] radians
    amplitude: float = 0.8,
    phase: Optional[np.ndarray] = None,  # [J] per-bone phase offset
    cycles: float = 1.0,
) -> np.ndarray:
    """[F, J, 3] euler trajectory: each allowed axis sweeps a sinusoid
    spanning `amplitude` of its limit range, so every generated frame is
    inside the anatomical limits (the grasp-like flexion the reference
    animates by hand in Blender)."""
    dof = np.asarray(dof, bool)
    limits = np.asarray(limits, np.float32)
    j = dof.shape[0]
    if phase is None:
        phase = np.linspace(0.0, np.pi / 2, j, dtype=np.float32)
    t = np.linspace(0.0, 2 * np.pi * cycles, num_frames, endpoint=False)
    # sin in [-1, 1] -> [0, 1] interpolant of [lo, hi]
    s = 0.5 * (1.0 + np.sin(t[:, None] + phase[None, :]))  # [F, J]
    lo, hi = limits[..., 0], limits[..., 1]
    mid = 0.5 * (lo + hi)
    half = 0.5 * (hi - lo) * amplitude
    ang = mid[None] + (s[..., None] * 2.0 - 1.0) * half[None]  # [F, J, 3]
    return np.where(dof[None], ang, 0.0).astype(np.float32)


def interpolate_eulers(
    key_eulers: np.ndarray,  # [K, J, 3] key poses (e.g. IK solutions)
    num_frames: int,
    ease: bool = True,
) -> np.ndarray:
    """[F, J, 3] piecewise interpolation through K key poses, cosine-
    eased per segment (Blender's default keyframe easing); endpoints hit
    the first/last key exactly."""
    keys = np.asarray(key_eulers, np.float32)
    k = keys.shape[0]
    if k == 1:
        return np.tile(keys, (num_frames, 1, 1))
    pos = np.linspace(0.0, k - 1.0, num_frames)
    seg = np.minimum(pos.astype(int), k - 2)
    t = (pos - seg).astype(np.float32)
    if ease:
        t = 0.5 * (1.0 - np.cos(np.pi * t))
    return (
        keys[seg] * (1.0 - t[:, None, None]) + keys[seg + 1] * t[:, None, None]
    ).astype(np.float32)


def generate_novel_pose(
    skeleton: dict,
    eulers: np.ndarray,  # [F, J, 3] per-bone local eulers (XYZ intrinsic)
    root_rotation: Optional[np.ndarray] = None,  # [F, 3]
    root_translation: Optional[np.ndarray] = None,  # [F, 3]
    out_path: Optional[str] = None,
) -> dict:
    """FK the euler trajectory over a rest skeleton into the reference
    meta_data pkl contract (export_novel_pose.py:340-355 key set).

    `skeleton` carries bnames, bnames_parent, rest_transforms [J, 4, 4]
    (world space), rest_heads/rest_tails [J, 3] — the shape returned by
    data.synthetic.load_skeleton / procedural_skeleton. Armature->world
    matrices are written as identity (FK is done directly in world
    space), so loaders that compose matrix_world @ matrixs reproduce the
    transforms unchanged.
    """
    rest_T = np.asarray(skeleton["rest_transforms"], np.float32)
    heads = np.asarray(skeleton["rest_heads"], np.float32)
    tails = np.asarray(skeleton["rest_tails"], np.float32)
    j = rest_T.shape[0]
    eulers = np.asarray(eulers, np.float32)
    f = eulers.shape[0]
    if root_rotation is None:
        root_rotation = np.zeros((f, 3), np.float32)
    if root_translation is None:
        root_translation = np.zeros((f, 3), np.float32)

    kintree = build_kintree(skeleton["bnames"], skeleton["bnames_parent"])
    pose_param = np.asarray(
        euler_angles_to_matrix(jnp.asarray(eulers), "XYZ", intrinsic=True)
    )  # [F, J, 3, 3]
    root_R = np.asarray(
        euler_angles_to_matrix(
            jnp.asarray(root_rotation), "XYZ", intrinsic=True
        )
    )  # [F, 3, 3]
    pose_T = np.asarray(
        get_pose_wrt_root(
            jnp.asarray(rest_T), jnp.asarray(pose_param),
            jnp.asarray(root_R), jnp.asarray(root_translation), kintree,
        )
    )  # [F, J, 4, 4]
    pose_heads = np.asarray(
        get_keypoints(jnp.asarray(pose_T), jnp.asarray(rest_T),
                      jnp.asarray(heads))
    )
    pose_tails = np.asarray(
        get_keypoints(jnp.asarray(pose_T), jnp.asarray(rest_T),
                      jnp.asarray(tails))
    )

    eye = np.tile(np.eye(4, dtype=np.float32), (j, 1, 1))
    out = {
        "bnames": np.asarray(skeleton["bnames"]),
        "bnames_parent": np.asarray(
            [str(p) for p in skeleton["bnames_parent"]]
        ),
        "rest_matrixs": rest_T,
        "rest_tails": tails,
        "rest_heads": heads,
        "pose_matrixs": pose_T.astype(np.float32),
        "pose_tails": pose_tails.astype(np.float32),
        "pose_heads": pose_heads.astype(np.float32),
        "pose_params": np.concatenate(
            [pose_param, np.zeros((f, j, 3, 1), np.float32)], axis=-1
        ),
        "rest_matrix_world": eye,
        "pose_matrix_world": np.tile(eye[None], (f, 1, 1, 1)),
        "eulers": eulers,
        "root_translation": np.asarray(root_translation, np.float32),
        "root_rotation": np.asarray(root_rotation, np.float32),
    }
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "wb") as fi:
            pickle.dump(out, fi)
    return out


def generate_flexion_sequence(
    skeleton: dict,
    num_frames: int = 60,
    amplitude: float = 0.6,
    out_path: Optional[str] = None,
) -> dict:
    """Convenience driver: anatomical flexion cycle when the skeleton is
    the 20-bone hand (uses default_hand_dof limits), generic x-axis
    flexion otherwise."""
    j = len(skeleton["bnames"])
    if j == 20:
        from manus_tpu.preprocess.ik import default_hand_dof

        dof, limits = default_hand_dof(j)
        # drop the root row: generate per-bone locals only
        eulers = flexion_eulers(num_frames, dof[1:], limits[1:], amplitude)
    else:
        dof = np.zeros((j, 3), bool)
        dof[1:, 0] = True  # flex children about x, keep the root bone still
        limits = np.zeros((j, 3, 2), np.float32)
        limits[..., 0], limits[..., 1] = -0.9, 0.3
        eulers = flexion_eulers(num_frames, dof, limits, amplitude)
    return generate_novel_pose(skeleton, eulers, out_path=out_path)
