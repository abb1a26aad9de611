"""OpenGL-convention camera model, matching the reference math exactly.

The reference (/root/reference/src/utils/cam_utils.py:19-78) uses row-vector
convention: world_view_transform = extr^T, full_proj = WVT @ P^T, and points
transform as p_row @ M. We keep the same matrices so recorded fixtures and
the rasterizer contract (SURVEY.md section 3.4) transfer unchanged.

`Camera` is a pytree dataclass whose width/height are static aux fields —
the rasterizer needs static image shapes under jit.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Z_NEAR = 0.01
Z_FAR = 100.0


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def get_projection_matrix(
    znear: float, zfar: float, fovx: float, fovy: float
) -> np.ndarray:
    """Z-forward OpenGL-style projection (reference cam_utils.py:19-39)."""
    tan_half_y = math.tan(fovy / 2)
    tan_half_x = math.tan(fovx / 2)
    top = tan_half_y * znear
    right = tan_half_x * znear
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def get_scene_extent(cam_centers: np.ndarray) -> float:
    """1.1 * max distance from mean camera center (cam_utils.py:10-16).

    cam_centers: [3, N] (column-per-camera, as the reference passes it).
    """
    center = np.mean(cam_centers, axis=1, keepdims=True)
    dist = np.linalg.norm(cam_centers - center, axis=0, keepdims=True)
    return float(np.max(dist) * 1.1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One pinhole camera in the reference's row-vector OpenGL convention.

    Array fields are pytree leaves; width/height are static metadata.
    """

    K: Any  # [3, 3]
    extr: Any  # [4, 4] world->camera (OpenCV), last row (0,0,0,1)
    world_view_transform: Any  # [4, 4] = extr^T
    projection_matrix: Any  # [4, 4] = P^T
    full_proj_transform: Any  # [4, 4] = WVT @ P^T
    camera_center: Any  # [3]
    fovx: Any  # scalar (radians)
    fovy: Any  # scalar
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @property
    def tanfovx(self):
        return jnp.tan(self.fovx * 0.5)

    @property
    def tanfovy(self):
        return jnp.tan(self.fovy * 0.5)

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tanfovy)


def make_camera(
    K: np.ndarray,
    extr: np.ndarray,
    width: int,
    height: int,
    znear: float = Z_NEAR,
    zfar: float = Z_FAR,
    resize_factor: float = 1.0,
    dtype=jnp.float32,
) -> Camera:
    """Build a Camera from OpenCV intrinsics + [3,4] or [4,4] extrinsics.

    Mirrors reference cam_utils.py:50-78 including the resize rounding.
    """
    K = np.array(K, dtype=np.float64)
    K[:2, :] *= resize_factor
    width = int(width * resize_factor + 0.5)
    height = int(height * resize_factor + 0.5)
    fovx = focal2fov(K[0, 0], width)
    fovy = focal2fov(K[1, 1], height)
    extr = np.array(extr, dtype=np.float64)
    if extr.shape == (3, 4):
        extr = np.concatenate([extr, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
    wvt = extr.T
    proj = get_projection_matrix(znear, zfar, fovx, fovy).T
    full = wvt @ proj
    cam_center = np.linalg.inv(wvt)[3, :3]
    return Camera(
        K=jnp.asarray(K, dtype),
        extr=jnp.asarray(extr, dtype),
        world_view_transform=jnp.asarray(wvt, dtype),
        projection_matrix=jnp.asarray(proj, dtype),
        full_proj_transform=jnp.asarray(full, dtype),
        camera_center=jnp.asarray(cam_center, dtype),
        fovx=jnp.asarray(fovx, dtype),
        fovy=jnp.asarray(fovy, dtype),
        width=width,
        height=height,
    )


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack same-resolution cameras into one batched Camera pytree."""
    assert len({(c.width, c.height) for c in cams}) == 1, "resolutions differ"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def index_camera(cams: Camera, i) -> Camera:
    """Select camera i from a batched Camera (static or traced index)."""
    return jax.tree.map(lambda x: x[i], cams)
