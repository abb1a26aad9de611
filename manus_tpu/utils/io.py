"""Artifact IO: PLY point dumps, image/video writers, camera paths.

Counterpart of the reference vis/IO helpers (extra.py:125-165,281-289) and
the camera-path pkl contract produced by the Blender tooling
(scripts/process/bl_render.py) and consumed by the test datasets
(brics_static.py:200-258). Blender remains an offline producer; its pkl
outputs are the interface.
"""
from __future__ import annotations

import os
import pickle
import struct
from typing import Optional

import numpy as np


def dump_points(points, path: str, colors=None):
    """Write a point cloud as binary little-endian PLY."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    n = pts.shape[0]
    has_color = colors is not None
    if has_color:
        cols = np.asarray(colors)
        if cols.shape[-1] == 4:
            cols = cols[..., :3]
        if cols.max() <= 1.0 + 1e-6:
            cols = cols * 255
        cols = np.clip(cols, 0, 255).astype(np.uint8).reshape(-1, 3)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n}",
                  "property float x", "property float y", "property float z"]
        if has_color:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header.append("end_header")
        f.write(("\n".join(header) + "\n").encode("ascii"))
        for i in range(n):
            f.write(struct.pack("<fff", *pts[i]))
            if has_color:
                f.write(struct.pack("<BBB", *cols[i]))


def dump_mesh(path: str, verts, faces, colors=None):
    """Write a triangle mesh as binary little-endian PLY with optional
    per-vertex colors (reference extra.dump_mesh contract, consumed by
    the Blender-side contact renders)."""
    v = np.asarray(verts, np.float32).reshape(-1, 3)
    f = np.asarray(faces, np.int32).reshape(-1, 3)
    has_color = colors is not None
    if has_color:
        cols = np.asarray(colors)
        if cols.shape[-1] == 4:
            cols = cols[..., :3]
        if cols.max() <= 1.0 + 1e-6:
            cols = cols * 255
        cols = np.clip(cols, 0, 255).astype(np.uint8).reshape(-1, 3)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {v.shape[0]}",
                  "property float x", "property float y", "property float z"]
        if has_color:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header += [f"element face {f.shape[0]}",
                   "property list uchar int vertex_indices", "end_header"]
        fh.write(("\n".join(header) + "\n").encode("ascii"))
        for i in range(v.shape[0]):
            fh.write(struct.pack("<fff", *v[i]))
            if has_color:
                fh.write(struct.pack("<BBB", *cols[i]))
        for i in range(f.shape[0]):
            fh.write(struct.pack("<Biii", 3, *f[i]))


def dump_image(img, path: str):
    """img: [H, W, 3] float [0,1] or uint8, RGB."""
    import cv2

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))


def dump_video(frames, path: str, fps: int = 10):
    """frames: list of [H, W, 3] RGB uint8/float arrays."""
    import cv2

    if not frames:
        return
    arrs = []
    for fr in frames:
        a = np.asarray(fr)
        if a.dtype != np.uint8:
            a = (np.clip(a, 0, 1) * 255).astype(np.uint8)
        arrs.append(a)
    h, w = arrs[0].shape[:2]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for a in arrs:
        vw.write(cv2.cvtColor(a, cv2.COLOR_RGB2BGR))
    vw.release()


def concat_images(*imgs, axis: int = 1):
    return np.concatenate([np.asarray(i) for i in imgs], axis=axis)


def generate_camera_path(
    out_path: str,
    num_frames: int = 60,
    center=(0.0, 0.0, 0.0),
    dist: float = 2.0,
    elevation_deg: float = 30.0,
    fov_deg: float = 50.0,
    width: int = 1080,
    height: int = 1080,
    spiral: float = 0.0,  # elevation sweep over the orbit (deg)
):
    """Generate an orbiting camera path and write it in the Blender pkl
    contract ({intrs: [(fx,fy,cx,cy)], extrs: [[3,4]]}) that
    load_camera_path / the test datasets consume.

    The reference produces these offline in Blender (bl_render.py); this
    is the in-repo generator for new paths (orbit or spiral around a
    look-at center), matching the look-at convention of the BRICS-style
    rigs (data/synthetic.hemisphere_cameras).
    """
    center = np.asarray(center, np.float64)
    f = width / (2 * np.tan(np.radians(fov_deg) / 2))
    intr = (f, f, (width - 1) / 2.0, (height - 1) / 2.0)
    intrs, extrs = [], []
    for i in range(num_frames):
        theta = 2 * np.pi * i / num_frames
        phi = np.radians(elevation_deg + spiral * i / max(num_frames - 1, 1))
        pos = center + dist * np.array(
            [np.cos(theta) * np.cos(phi), np.sin(phi),
             np.sin(theta) * np.cos(phi)]
        )
        fwd = center - pos
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right) + 1e-9
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd], axis=0)
        t = -R @ pos
        intrs.append(intr)
        extrs.append(np.concatenate([R, t[:, None]], axis=1))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as fh:
        pickle.dump({"intrs": intrs, "extrs": extrs}, fh)
    return out_path


def load_camera_path(path: str, width: int, height: int):
    """Load a Blender camera-path pkl ({intrs: [...], extrs: [...]}) into a
    list of Camera objects (reference data/camera_paths contract)."""
    from manus_tpu.utils.camera import make_camera

    try:
        import joblib

        data = joblib.load(path)
    except Exception:
        with open(path, "rb") as f:
            data = pickle.load(f)
    cams = []
    for K, extr in zip(data["intrs"], data["extrs"]):
        K = np.asarray(K, np.float64)
        if K.ndim == 1:  # Blender export: (fx, fy, cx, cy)
            fx, fy, cx, cy = K
            K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        extr = np.asarray(extr, np.float64)
        if extr.shape[0] == 4:
            extr = extr[:3]
        cams.append(make_camera(K, extr, width, height))
    return cams


def dump_lineset(path: str, points, edges, colors=None):
    """Write a line set as binary little-endian PLY with vertex + edge
    elements (viewable in MeshLab/CloudCompare — the open3d-free stand-in
    for the reference's o3d.geometry.LineSet, vis_cameras.py:7-24).

    points [P, 3] float; edges [E, 2] int vertex indices; colors
    optional [E, 3] per-edge RGB in [0,1] or [0,255]."""
    import struct

    pts = np.asarray(points, np.float32).reshape(-1, 3)
    edg = np.asarray(edges, np.int32).reshape(-1, 2)
    has_color = colors is not None
    if has_color:
        cols = np.asarray(colors, np.float32).reshape(-1, 3)
        if cols.max() <= 1.0 + 1e-6:
            cols = cols * 255
        cols = np.clip(cols, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        header = [
            "ply", "format binary_little_endian 1.0",
            f"element vertex {len(pts)}",
            "property float x", "property float y", "property float z",
            f"element edge {len(edg)}",
            "property int vertex1", "property int vertex2",
        ]
        if has_color:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header.append("end_header")
        f.write(("\n".join(header) + "\n").encode("ascii"))
        for p in pts:
            f.write(struct.pack("<fff", *p))
        for i, e in enumerate(edg):
            f.write(struct.pack("<ii", *e))
            if has_color:
                f.write(struct.pack("<BBB", *cols[i]))


def load_lineset(path: str):
    """Read back a dump_lineset PLY -> (points, edges, edge_colors|None)."""
    import struct

    with open(path, "rb") as f:
        n_v = n_e = 0
        has_color = False
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n_v = int(line.split()[-1])
            elif line.startswith("element edge"):
                n_e = int(line.split()[-1])
            elif line == "property uchar red":
                has_color = True
            elif line == "end_header":
                break
        pts = np.frombuffer(f.read(12 * n_v), "<f4").reshape(n_v, 3)
        edges, cols = [], []
        for _ in range(n_e):
            edges.append(struct.unpack("<ii", f.read(8)))
            if has_color:
                cols.append(struct.unpack("<BBB", f.read(3)))
    return (pts, np.asarray(edges, np.int32),
            np.asarray(cols, np.uint8) if has_color else None)
