"""Hand-object contact estimation: NN distances, colormaps, NOCS grids.

TPU-native replacement for the reference's Taichi brute-force kernel and
NOCS machinery (/root/reference/src/utils/gaussian_utils.py:50-98,514-577):
the O(N*M) distance matrix rides the MXU blockwise (ops/knn.py), and the
distance -> colormap conversion is a jit-friendly LUT.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from manus_tpu.ops.grid_sample import grid_sample_trilinear
from manus_tpu.ops.knn import nearest_neighbor
from manus_tpu.utils.colormap import apply_colormap
from manus_tpu.utils.structures import Bones

CONTACT_THRESHOLD = 0.004  # meters; reference get_cmap c_thresh


def contact_map(
    pt1: jax.Array,
    pt2: jax.Array,
    pt1_valid: jax.Array | None = None,
    pt2_valid: jax.Array | None = None,
    c_thresh: float = CONTACT_THRESHOLD,
    cmap_type: str = "gray",
):
    """Per-point contact signal of pt1 against pt2.

    Returns (dist01 [N] in [0,1] where 1 = touching, indices [N] int32,
    colors [N, 3]). Matches reference get_cmap (gaussian_utils.py:571-577).
    """
    dist, idx = nearest_neighbor(pt1, pt2, pt2_valid=pt2_valid)
    d01 = 1.0 - jnp.clip(dist, 0.0, c_thresh) / c_thresh
    if pt1_valid is not None:
        d01 = jnp.where(pt1_valid, d01, 0.0)
    colors = apply_colormap(d01, cmap_type)
    return d01, idx, colors


class NocsGrid(NamedTuple):
    points: jax.Array  # [D, H, W, 3]
    colors: jax.Array  # [D, H, W, 3]
    center: jax.Array  # [3]
    scale: jax.Array  # [3]


def get_nocs_grid(
    bones_rest: Bones, res: int, ratio=(1.0, 1.0, 1.0)
) -> NocsGrid:
    """Normalized-object-coordinate color grid over the canonical hand bbox
    (reference get_nocs_grid, gaussian_utils.py:50-80)."""
    keypts = np.asarray(bones_rest.keypoints())
    cano_min = keypts.min(axis=0)
    cano_max = keypts.max(axis=0)
    center = (cano_max + cano_min) / 2 + np.array([0, 0, -0.03])
    x_r, y_r, z_r = ratio
    res_scaled = (res / np.array([x_r, y_r, z_r])).astype(np.int32)
    d, h, w = int(res_scaled[2]), int(res_scaled[1]), int(res_scaled[0])

    zs, ys, xs = np.meshgrid(
        np.linspace(-1, 1, d), np.linspace(-1, 1, h), np.linspace(-1, 1, w),
        indexing="ij",
    )
    pts = np.stack([xs, ys, zs], axis=-1).astype(np.float32)  # [D,H,W,3]
    colors = (pts + 1.0) / 2.0
    scale = np.linalg.norm(cano_max - cano_min) / 2
    scale = np.array([scale * z_r, scale * y_r, scale * x_r], np.float32)
    points = pts * scale + center.astype(np.float32)
    return NocsGrid(
        points=jnp.asarray(points),
        colors=jnp.asarray(colors),
        center=jnp.asarray(center, jnp.float32),
        scale=jnp.asarray(scale),
    )


def get_nocs_colors(xyz: jax.Array, grid: NocsGrid) -> jax.Array:
    """Trilinear NOCS color lookup at gaussian positions
    (reference get_nocs_colors, gaussian_utils.py:83-98)."""
    norm = (xyz - grid.center[None]) / grid.scale[None]
    return grid_sample_trilinear(grid.colors, norm)


def contact_iou_f1(
    pred_mask: jax.Array, gt_mask: jax.Array
):
    """IoU and F1 between binary contact masks (reference
    get_iou_ours.py:162-167, 221-232)."""
    pred = pred_mask.astype(bool)
    gt = gt_mask.astype(bool)
    inter = jnp.sum(pred & gt)
    union = jnp.sum(pred | gt)
    iou = inter / jnp.maximum(union, 1)
    tp = inter
    fp = jnp.sum(pred & ~gt)
    fn = jnp.sum(~pred & gt)
    precision = tp / jnp.maximum(tp + fp, 1)
    recall = tp / jnp.maximum(tp + fn, 1)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-9)
    return iou, f1
