"""2D keypoint / skeleton visualization on images.

Counterpart of the reference vis_util.py:11-75 (plot_points_in_image,
project, plot_keypoints_2d) — the preprocess-stage debugging surface that
overlays triangulated / IK-solved skeletons on camera frames
(reference scripts/visualize_IK.py driven by preprocess/pose.py:33-37).
Pure numpy + cv2; no torch/plotly dependencies.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def plot_points_in_image(points, image, color=(0, 255, 0), radius=2,
                         thickness=-1):
    """Draw 2D points as filled circles. points: [N, 2+]."""
    import cv2

    image = np.ascontiguousarray(image).copy()
    for point in np.asarray(points):
        image = cv2.circle(
            image, tuple(point[:2].astype(np.int32)), radius, color,
            thickness,
        )
    return image


def project_points(keypoints3d: np.ndarray, P: np.ndarray) -> np.ndarray:
    """Pinhole projection. keypoints3d [N, 3], P [V, 3, 4] -> [V, N, 2]."""
    hom = np.hstack((keypoints3d, np.ones((keypoints3d.shape[0], 1))))
    projected = np.matmul(P, hom.T).transpose(0, 2, 1)
    return (projected / projected[:, :, -1:])[:, :, :-1]


def plot_keypoints_2d(
    joints: np.ndarray,  # [J, 3] world-space keypoints
    image: np.ndarray,  # [H, W, 3] uint8
    proj_mat: np.ndarray,  # [3, 4] K @ [R|t]
    kintree: Optional[dict] = None,  # {str(bone_idx): parent_idx}
    bone_color: Tuple[int, int, int] = (255, 0, 0),
    plot_bones: bool = True,
) -> np.ndarray:
    """Skeleton overlay (reference vis_util.plot_keypoints_2d): joints as
    circles, bones as lines following the kintree (keypoint 0 is the
    root/wrist; bone/parent ids are offset by +1 into the joint list)."""
    import cv2

    keypoints_2d = project_points(joints, np.asarray([proj_mat]))[0]
    res = np.ascontiguousarray(image).copy()
    joint_radius = max(1, min(*image.shape[:2]) // 150)
    for kp in keypoints_2d:
        cv2.circle(res, (int(kp[0]), int(kp[1])), joint_radius,
                   (0, 0, 255), -1)
    if plot_bones and kintree:
        for bone, parent in kintree.items():
            parent_id = int(parent) + 1
            bone_id = int(bone) + 1
            if parent_id <= 0 or bone_id >= len(keypoints_2d):
                continue
            cv2.line(
                res,
                (int(keypoints_2d[bone_id][0]), int(keypoints_2d[bone_id][1])),
                (int(keypoints_2d[parent_id][0]),
                 int(keypoints_2d[parent_id][1])),
                bone_color,
                max(1, joint_radius // 2),
            )
    return res


def visualize_ik_overlay(
    images: np.ndarray,  # [V, H, W, 3] uint8 camera frames
    joints: np.ndarray,  # [J, 3] solved keypoints for this frame
    proj_mats: np.ndarray,  # [V, 3, 4]
    kintree: Optional[dict] = None,
    max_views: int = 4,
) -> np.ndarray:
    """IK debugging strip (reference scripts/visualize_IK.py behaviour):
    the solved skeleton reprojected onto the first few camera views,
    concatenated horizontally."""
    panels = []
    for v in range(min(max_views, len(images))):
        panels.append(
            plot_keypoints_2d(joints, images[v], proj_mats[v], kintree)
        )
    return np.concatenate(panels, axis=1)


def camera_frustum(
    world_view_transform: np.ndarray,  # [4, 4] row-vector extr^T
    tanfovx: float,
    tanfovy: float,
    frustum_length: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Frustum wireframe for one camera: 5 world-space points (origin +
    4 image-corner rays at `frustum_length`) and 8 connecting edges
    (reference get_camera_frustum_opengl_coord, vis_cameras.py:27-57 —
    here in our raster's OpenCV-style camera space, +z forward, using the
    row-vector world_view_transform our Camera pytree carries)."""
    wvt = np.asarray(world_view_transform, np.float64)
    L = float(frustum_length)
    hw, hh = L * float(tanfovx), L * float(tanfovy)
    cam_pts = np.array(
        [
            [0.0, 0.0, 0.0, 1.0],
            [-hw, -hh, L, 1.0],  # top-left image corner
            [hw, -hh, L, 1.0],   # top-right
            [hw, hh, L, 1.0],    # bottom-right
            [-hw, hh, L, 1.0],   # bottom-left
        ]
    )
    # p_cam = p_world @ wvt  =>  p_world = p_cam @ inv(wvt)
    world = cam_pts @ np.linalg.inv(wvt)
    world = world[:, :3] / world[:, 3:4]
    edges = np.array(
        [[0, i] for i in range(1, 5)]
        + [[i, i + 1] for i in range(1, 4)]
        + [[4, 1]]
    )
    return world.astype(np.float32), edges.astype(np.int32)


def visualize_camera_rig(
    cameras,
    path: str,
    frustum_length: float = 0.5,
    color=(29 / 255.0, 53 / 255.0, 87 / 255.0),
    colors: Optional[np.ndarray] = None,  # [N, 3] per-camera override
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whole-rig frustum line set -> PLY with vertex+edge elements
    (reference vis_cameras.py frustums2lineset + draw_camera_frustum_
    geometry; open3d absent, so the PLY is the viewable artifact).

    `cameras` is a batched Camera pytree ([N, 4, 4] world_view_transform)
    or a list of single cameras. Returns (points, edges, edge_colors)."""
    if not isinstance(cameras, (list, tuple)):
        n = np.asarray(cameras.world_view_transform).shape[0]
        from manus_tpu.utils.camera import index_camera

        cameras = [index_camera(cameras, i) for i in range(n)]
    pts_all, edges_all, cols_all = [], [], []
    for i, cam in enumerate(cameras):
        pts, edges = camera_frustum(
            cam.world_view_transform, float(cam.tanfovx),
            float(cam.tanfovy), frustum_length,
        )
        pts_all.append(pts)
        edges_all.append(edges + 5 * i)
        c = np.asarray(colors[i] if colors is not None else color,
                       np.float32)
        cols_all.append(np.tile(c[None], (8, 1)))
    points = np.concatenate(pts_all)
    edges = np.concatenate(edges_all)
    edge_colors = np.concatenate(cols_all)
    from manus_tpu.utils.io import dump_lineset

    dump_lineset(path, points, edges, edge_colors)
    return points, edges, edge_colors
