"""Segmentation-mask based pruning signals, pure jnp.

Replicates /root/reference/src/utils/gaussian_utils.py:35-47,101-147:
project points into a camera, look up a (possibly dilated) segmentation
mask, and flag points that fall outside; a keypoint guard disables the
signal for frames where the skeleton itself projects outside the mask
(bad segmentation frames).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from manus_tpu.utils.camera import Camera
from manus_tpu.utils.transforms import project_points


def dilate_mask(mask: jax.Array, kernel_size: int = 11) -> jax.Array:
    """Binary dilation via max-pooling (equivalent to the reference's
    ones-kernel conv > 0). mask: [H, W] bool/float -> [H, W] bool."""
    m = mask.astype(jnp.float32)
    pad = kernel_size // 2
    out = jax.lax.reduce_window(
        m,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(kernel_size, kernel_size),
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
    )
    return out > 0


def points_outside_mask(
    camera: Camera,
    points: jax.Array,  # [N, 3] posed
    mask: jax.Array,  # [H, W] or [H, W, 1]
    keypoints: jax.Array | None = None,  # [K, 3]
    dilate: bool = False,
    active: jax.Array | None = None,
) -> jax.Array:
    """[N] bool: active points projecting outside the segmentation mask."""
    if mask.ndim == 3:
        mask = mask[..., 0]
    if dilate:
        mask = dilate_mask(mask)
    mask = mask.astype(bool)
    h, w = mask.shape

    extr34 = camera.extr[:3, :4]
    p2d = project_points(points, camera.K, extr34)
    xs = jnp.clip(p2d[:, 0], 0, w - 1).astype(jnp.int32)
    ys = jnp.clip(p2d[:, 1], 0, h - 1).astype(jnp.int32)
    outside = ~mask[ys, xs]

    if keypoints is not None:
        k2d = project_points(keypoints, camera.K, extr34)
        kx = jnp.clip(k2d[:, 0], 0, w - 1).astype(jnp.int32)
        ky = jnp.clip(k2d[:, 1], 0, h - 1).astype(jnp.int32)
        any_kp_outside = jnp.any(~mask[ky, kx])
        outside = jnp.where(any_kp_outside, jnp.zeros_like(outside), outside)

    if active is not None:
        outside = outside & active
    return outside
