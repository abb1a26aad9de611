"""Voxel skinning-weight grid construction.

Counterpart of the reference's build_voxel_grid + init_mano_weights
(/root/reference/src/datasets/brics_dynamic.py:99-144,
src/utils/train_utils.py:49-87): a regular grid over the canonical hand
bbox whose cells hold skinning weights initialised from the MANO mesh by
K-nearest-vertex averaging (with the reference's 16->20 bone remap), plus
a background channel for cells far from the hand surface.

The reference filters cells with a signed-distance test (pysdf); that
package isn't available here, so cells farther than `surface_margin` from
the nearest MANO vertex take the background role — same intent (label
off-surface space as background), watertightness-free.
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from manus_tpu.ops.grid_sample import maybe_brick_table
from manus_tpu.ops.knn import knn_indices, nearest_neighbor
from manus_tpu.train.workloads import VoxelGrid

MANO_REST = "/root/reference/data/mano/mano_rest.pkl"
# MANO's 16 weight columns -> our 20-bone ordering (reference
# train_utils.py:68)
MANO_TO_OURS = [13, 14, 14, 15, 0, 1, 2, 3, 0, 4, 5, 6, 0, 10, 11, 12, 0, 7, 8, 9]


def load_mano_rest(path: str = MANO_REST) -> Optional[dict]:
    if not os.path.exists(path):
        return None
    try:
        import joblib

        d = joblib.load(path)
    except Exception:
        try:
            with open(path, "rb") as f:
                d = pickle.load(f)
        except Exception:
            return None
    return dict(
        verts=np.asarray(d["vert"], np.float32),
        faces=np.asarray(d["faces"], np.int32),
        weights=np.asarray(d["weights"], np.float32),  # [778, 16]
    )


def build_voxel_grid(
    bones_keypoints: np.ndarray,  # [K, 3] canonical skeleton keypoints
    mano: Optional[dict] = None,
    res: int = 128,
    ratio=(1.1, 0.9, 0.65),
    offset=(0.0, 0.0, -0.03),
    neighbors: int = 20,
    surface_margin: float = 0.02,
    num_bones: int = 20,
) -> VoxelGrid:
    """Returns a VoxelGrid with [D, H, W, B+1] weights (bg channel last).

    Grid geometry mirrors reference brics_dynamic.py:99-144 (bbox center,
    half-diagonal scale with per-axis ratios, per-axis center offset);
    ratio/offset defaults are the consumed hand_model.yaml values
    (hand_dynamic.py:49-54).
    """
    keypts = np.asarray(bones_keypoints)
    cano_min, cano_max = keypts.min(0), keypts.max(0)
    center = (cano_max + cano_min) / 2 + np.asarray(offset, np.float64)
    x_r, y_r, z_r = ratio
    res_scaled = (res / np.array([x_r, y_r, z_r])).astype(np.int32)
    d, h, w = int(res_scaled[2]), int(res_scaled[1]), int(res_scaled[0])
    scale = np.linalg.norm(cano_max - cano_min) / 2
    # Reference ordering (brics_dynamic.py:125-128): the xyz world scale is
    # [z_r, y_r, x_r] — the x coordinate takes the *z* ratio. The same
    # swapped convention is preserved in ops/contacts.get_nocs_grid.
    scale = np.array([scale * z_r, scale * y_r, scale * x_r], np.float32)

    zs, ys, xs = np.meshgrid(
        np.linspace(-1, 1, d), np.linspace(-1, 1, h), np.linspace(-1, 1, w),
        indexing="ij",
    )
    # grid_sample convention: x indexes W, y indexes H, z indexes D
    pts = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3).astype(np.float32)
    world = pts * scale[None] + center[None].astype(np.float32)

    if mano is None:
        mano = load_mano_rest()
    if mano is not None and mano["weights"].shape[1] >= 16:
        verts = jnp.asarray(mano["verts"])
        init_w = mano["weights"][:, MANO_TO_OURS]  # [778, 20]
        idx = np.asarray(knn_indices(jnp.asarray(world), verts, neighbors))
        weights = init_w[idx].mean(axis=1)  # [M, 20]
        dist, _ = nearest_neighbor(jnp.asarray(world), verts)
        far = np.asarray(dist) > surface_margin
    else:
        # No MANO data: nearest-keypoint soft weights as a stand-in.
        kp = jnp.asarray(keypts[:num_bones] if len(keypts) >= num_bones
                         else np.pad(keypts, ((0, num_bones - len(keypts)), (0, 0)),
                                     mode="edge"))
        d2 = (
            np.sum(world**2, 1)[:, None]
            + np.asarray(jnp.sum(kp * kp, 1))[None, :]
            - 2 * world @ np.asarray(kp).T
        )
        weights = np.exp(-d2 / (2 * (0.02**2)))
        weights = weights / np.maximum(weights.sum(1, keepdims=True), 1e-8)
        dist, _ = nearest_neighbor(jnp.asarray(world), kp)
        far = np.asarray(dist) > surface_margin * 3

    bg = np.zeros((weights.shape[0], 1), np.float32)
    weights = np.concatenate([weights, bg], axis=1)
    weights[far] = 0.0
    weights[far, -1] = 1.0
    weights = weights / np.maximum(weights.sum(1, keepdims=True), 1e-8)

    weights = weights.reshape(d, h, w, -1).astype(np.float32)
    return VoxelGrid(
        center=jnp.asarray(center, jnp.float32),
        scale=jnp.asarray(scale),
        weights=jnp.asarray(weights),
        brick=maybe_brick_table(weights),
    )


def mano_skin_weights_20(mano: dict) -> np.ndarray:
    """MANO's per-vertex [778, 16] joint weights remapped onto the 20-bone
    capture rig and renormalized (reference train_utils.py:68 uses the
    same column mapping for the voxel grid; several rig bones share one
    MANO joint column, so rows must be rescaled to stay a convex blend)."""
    w = np.asarray(mano["weights"], np.float32)[:, MANO_TO_OURS]  # [778, 20]
    return w / np.maximum(w.sum(axis=1, keepdims=True), 1e-8)


def pose_mano_verts(
    mano: dict,
    pose_transforms: np.ndarray,  # [20, 4, 4] per-frame bone transforms
    rest_transforms: np.ndarray,  # [20, 4, 4] rest bone transforms
) -> np.ndarray:
    """LBS-pose the MANO rest mesh with captured per-frame bone transforms.

    In-repo replacement for the reference's manopth producer
    (/root/reference/scripts/dataset_helpers/load_videos.py:131: ManoLayer
    use_pca=True, ncomps=30 poses MANO from fitted PCA params to generate
    the baseline meshes mano_contacts.py consumes). The MANO model file
    (shapedirs/posedirs/hands_components) is not shipped offline, but the
    capture metadata already carries the fitted per-frame bone transforms
    (pose_matrixs/rest_matrixs), so the posed mesh is recovered by
    blending the SAME rest->posed deformation transforms the hand module
    skins with, using MANO's own vertex weights (16->20 remap). Known
    deviation: no pose-corrective blendshapes (posedirs needs the MANO
    model file) — mm-scale near joint creases, below the 4mm contact
    threshold the baseline chain consumes this mesh at.
    """
    from manus_tpu.ops.skinning import bone_deformation_transforms

    w = jnp.asarray(mano_skin_weights_20(mano))  # [778, 20]
    tf_bones = bone_deformation_transforms(
        jnp.asarray(pose_transforms, jnp.float32),
        jnp.asarray(rest_transforms, jnp.float32),
    )  # [20, 4, 4]
    tf = jnp.matmul(
        w, tf_bones.reshape(-1, 16), precision=jax.lax.Precision.HIGHEST
    ).reshape(-1, 4, 4)  # [778, 4, 4]
    v = jnp.asarray(mano["verts"], jnp.float32)
    posed = jnp.einsum("nij,nj->ni", tf[:, :3, :3], v) + tf[:, :3, 3]
    return np.asarray(posed, np.float32)


def pose_mano_sequence(mano: dict, bones_posed, bones_rest) -> list:
    """Posed MANO meshes for every captured frame — the posed_verts_seq
    input of train/baselines.mano_baseline_contacts. `bones_posed` is the
    per-frame Bones list a BricsDynamicDataset exposes; `bones_rest` its
    rest Bones."""
    rest_tf = np.asarray(bones_rest.transforms)
    return [
        pose_mano_verts(mano, np.asarray(b.transforms), rest_tf)
        for b in bones_posed
    ]


def visualize_skin_weights(skin_weights: np.ndarray, seed: int = 0) -> np.ndarray:
    """[N, B] weights -> [N, 3] blended per-bone colors (reference
    extra.py:172-182 semantics: distinct color per bone, weight-blended)."""
    rng = np.random.RandomState(seed)
    b = skin_weights.shape[1]
    palette = rng.uniform(0.1, 1.0, (b, 3)).astype(np.float32)
    w = np.asarray(skin_weights, np.float32)
    w = w / np.maximum(w.sum(1, keepdims=True), 1e-8)
    return w @ palette
