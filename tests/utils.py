"""Shared test helpers: synthetic scenes and cameras."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from manus_tpu.utils.camera import Camera, make_camera
from manus_tpu.utils.transforms import covariance_from_scaling_rotation


def make_test_camera(width=64, height=64, dist=3.0, angle=0.0, fov_deg=50.0):
    """A camera on a circle around the origin, looking at the origin."""
    f = width / (2 * np.tan(np.radians(fov_deg) / 2))
    K = np.array(
        [[f, 0, (width - 1) / 2], [0, f, (height - 1) / 2], [0, 0, 1.0]]
    )
    # world->camera: camera at angle on XZ circle looking at origin
    cam_pos = np.array([dist * np.sin(angle), 0.0, -dist * np.cos(angle)])
    fwd = -cam_pos / np.linalg.norm(cam_pos)  # toward origin (+z in cam)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R = np.stack([right, up2, fwd], axis=0)  # world->cam rows
    t = -R @ cam_pos
    extr = np.concatenate([R, t[:, None]], axis=1)
    return make_camera(K, extr, width, height)


def random_scene(n=200, seed=0, spread=0.5, scale_range=(0.02, 0.12)):
    """Random gaussian cloud near the origin. Returns dict of np arrays."""
    rng = np.random.RandomState(seed)
    means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    cov6 = np.asarray(
        covariance_from_scaling_rotation(jnp.asarray(scales), jnp.asarray(quats))
    )
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacity = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    return dict(
        means=means, cov6=cov6, colors=colors, opacity=opacity,
        scales=scales, quats=quats,
    )
