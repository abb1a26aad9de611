"""Synthetic scenes: self-supervised fixtures for tests and benchmarks.

The BRICS capture data the reference trains on is not shipped; these
generators produce equivalent-shaped problems — a ground-truth gaussian
cloud rendered from hemisphere cameras (static), and an articulated
bone-skinned cloud driven by real skeleton poses when
/root/reference/data/meta_data/novel_pose.pkl is available (dynamic) —
so the full train/val/densify pipeline runs end-to-end and recovers the
known scene.
"""
from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from manus_tpu.ops.rasterizer.api import RasterConfig, render_gaussians
from manus_tpu.utils.camera import Camera, make_camera, stack_cameras
from manus_tpu.utils.structures import Bones
from manus_tpu.utils.transforms import covariance_from_scaling_rotation

REFERENCE_POSES = "/root/reference/data/meta_data/novel_pose.pkl"


def hemisphere_cameras(
    num: int, width: int, height: int, dist: float = 3.0, fov_deg: float = 50.0,
    seed: int = 0, center=(0.0, 0.0, 0.0),
) -> list[Camera]:
    """Cameras on a hemisphere looking at `center` (BRICS-rig-like)."""
    rng = np.random.RandomState(seed)
    f = width / (2 * np.tan(np.radians(fov_deg) / 2))
    K = np.array(
        [[f, 0, (width - 1) / 2], [0, f, (height - 1) / 2], [0, 0, 1.0]]
    )
    center = np.asarray(center, np.float64)
    cams = []
    for i in range(num):
        theta = 2 * np.pi * i / num + rng.uniform(0, 0.1)
        phi = np.radians(rng.uniform(15, 75))
        pos = center + dist * np.array(
            [np.cos(theta) * np.cos(phi), np.sin(phi), np.sin(theta) * np.cos(phi)]
        )
        fwd = center - pos
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right) + 1e-9
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd], axis=0)
        t = -R @ pos
        extr = np.concatenate([R, t[:, None]], axis=1)
        cams.append(make_camera(K.copy(), extr, width, height))
    return cams


def gt_object_gaussians(n: int = 800, seed: int = 0):
    """A colorful blobby object: gaussians on a deformed sphere surface."""
    rng = np.random.RandomState(seed)
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    radius = 0.5 * (1.0 + 0.25 * np.sin(4 * u[:, 0]) * np.cos(3 * u[:, 1]))
    means = (u * radius[:, None]).astype(np.float32)
    scales = rng.uniform(0.02, 0.06, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    colors = (0.5 + 0.5 * np.stack(
        [np.sin(3 * means[:, 0]), np.cos(5 * means[:, 1]), np.sin(2 * means[:, 2])],
        axis=1,
    )).astype(np.float32)
    opacity = rng.uniform(0.7, 0.98, (n,)).astype(np.float32)
    cov6 = np.asarray(
        covariance_from_scaling_rotation(jnp.asarray(scales), jnp.asarray(quats))
    )
    return dict(means=means, cov6=cov6, colors=colors, opacity=opacity)


def load_reference_skeleton() -> Optional[dict]:
    """Real 20-bone hand skeleton + 251 posed frames from the reference data
    directory (read-only data, not code). None if unavailable."""
    if not os.path.exists(REFERENCE_POSES):
        return None
    with open(REFERENCE_POSES, "rb") as f:
        d = pickle.load(f)
    # armature -> world (reference transforms.py:561-590 semantics)
    rest_T = np.einsum("bij,bjk->bik", d["rest_matrix_world"], d["rest_matrixs"])
    pose_T = np.einsum(
        "fbij,fbjk->fbik", d["pose_matrix_world"], d["pose_matrixs"]
    )
    def _world(mw, pts):
        h = np.concatenate([pts, np.ones_like(pts[..., :1])], axis=-1)
        return np.einsum("...ij,...j->...i", mw, h)[..., :3]
    return dict(
        bnames=[str(b) for b in d["bnames"]],
        bnames_parent=[str(b) for b in d["bnames_parent"]],
        rest_heads=_world(d["rest_matrix_world"], d["rest_heads"]),
        rest_tails=_world(d["rest_matrix_world"], d["rest_tails"]),
        rest_transforms=rest_T.astype(np.float32),
        pose_heads=_world(d["pose_matrix_world"], d["pose_heads"]),
        pose_tails=_world(d["pose_matrix_world"], d["pose_tails"]),
        pose_transforms=pose_T.astype(np.float32),
    )


def procedural_skeleton(num_frames: int = 8, scale: float = 0.25) -> dict:
    """Fallback skeleton: 4 fingers x 3 bones + palm root, flexing.

    `scale` shrinks it to real-hand size (~0.25 world units) so distance
    thresholds tuned for MANUS data (e.g. the 0.2 skeleton-distance prune)
    behave the same on synthetic scenes."""
    bones = []
    parents = []
    heads, tails = [], []
    idx = 0
    # palm root bone
    bones.append("bone_root"); parents.append("None")
    heads.append([0, 0, 0]); tails.append([0, 0.3, 0])
    for f in range(4):
        x = -0.15 + 0.1 * f
        parent = "bone_root"
        base = np.array([x, 0.3, 0.0])
        for j in range(3):
            name = f"bone_{f}_{j}"
            bones.append(name); parents.append(parent)
            heads.append(list(base + np.array([0, 0.15 * j, 0])))
            tails.append(list(base + np.array([0, 0.15 * (j + 1), 0])))
            parent = name
    heads = np.asarray(heads, np.float32) * scale
    tails = np.asarray(tails, np.float32) * scale
    j = len(bones)
    rest_T = np.tile(np.eye(4, dtype=np.float32), (j, 1, 1))
    rest_T[:, :3, 3] = heads
    pose_T = np.tile(rest_T[None], (num_frames, 1, 1, 1))
    for fidx in range(num_frames):
        ang = 0.6 * np.sin(2 * np.pi * fidx / num_frames)
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
        for b in range(1, j):
            pose_T[fidx, b, :3, :3] = rot @ pose_T[fidx, b, :3, :3]
    pose_heads = np.tile(heads[None], (num_frames, 1, 1))
    pose_tails = np.einsum(
        "fbij,bj->fbi", pose_T[:, :, :3, :3], tails - heads
    ) + pose_T[:, :, :3, 3]
    return dict(
        bnames=bones, bnames_parent=parents,
        rest_heads=heads, rest_tails=tails, rest_transforms=rest_T,
        pose_heads=pose_heads, pose_tails=pose_tails,
        pose_transforms=pose_T.astype(np.float32),
    )


def sample_gaussians_on_bones(
    heads: np.ndarray, tails: np.ndarray, transforms: np.ndarray,
    samples_per_bone: int, seed: int = 0,
):
    """Anisotropic gaussian sampling along bones + joints, the reference
    init scheme (train_utils.py:104-139)."""
    rng = np.random.RandomState(seed)
    j = heads.shape[0]
    mid = (heads + tails) / 2
    length = np.linalg.norm(tails - heads, axis=1, keepdims=True)
    rot = transforms[:, :3, :3]

    def draw(centers, scale_diag, count):
        S = np.zeros((j, 3, 3), np.float32)
        S[:, 0, 0], S[:, 1, 1], S[:, 2, 2] = (
            scale_diag[:, 0], scale_diag[:, 1], scale_diag[:, 2]
        )
        cov = rot @ S @ S.transpose(0, 2, 1) @ rot.transpose(0, 2, 1)
        L = np.linalg.cholesky(cov + 1e-12 * np.eye(3))
        z = rng.normal(size=(count, j, 3)).astype(np.float32)
        pts = centers[None] + np.einsum("jik,cjk->cji", L, z)
        return pts.reshape(-1, 3)

    scale_bones = np.concatenate([length / 5, length / 4, length / 4], axis=1)
    pts1 = draw(mid, scale_bones, samples_per_bone)
    scale_joints = np.concatenate([length / 6, length / 4, length / 6], axis=1)
    pts2 = draw(heads, scale_joints, samples_per_bone // 2)
    points = np.concatenate([pts1, pts2], axis=0).astype(np.float32)
    colors = rng.uniform(0, 1, points.shape).astype(np.float32)
    return points, colors


@dataclasses.dataclass
class SyntheticStaticDataset:
    """Static object scene: GT gaussians + hemisphere cameras + rendered GT."""

    cameras: Camera  # stacked [V]
    images: np.ndarray  # [V, H, W, 3]
    masks: np.ndarray  # [V, H, W, 1]
    bg_color: str
    extent: float
    gt: dict
    width: int
    height: int

    @property
    def num_views(self) -> int:
        return self.images.shape[0]

    def get_batch(self, frame: int, views):
        return dict(rgb=self.images[views], mask=self.masks[views])

    def sample_gaussians(self, n: int, seed: int = 1):
        """Noisy init cloud near the GT surface (reference samples an NGP
        mesh + noise; we perturb GT means)."""
        rng = np.random.RandomState(seed)
        idx = rng.randint(0, self.gt["means"].shape[0], n)
        pts = self.gt["means"][idx] + rng.normal(0, 0.05, (n, 3))
        cols = np.clip(
            self.gt["colors"][idx] + rng.normal(0, 0.2, (n, 3)), 0, 1
        )
        return pts.astype(np.float32), cols.astype(np.float32)


def build_synthetic_static(
    width=128, height=128, num_cameras=20, n_gaussians=800, seed=0,
    bg_color="black",
) -> SyntheticStaticDataset:
    cams = hemisphere_cameras(num_cameras, width, height, seed=seed)
    gt = gt_object_gaussians(n_gaussians, seed=seed)
    bg = np.zeros(3, np.float32) if bg_color == "black" else np.ones(3, np.float32)
    cfg = RasterConfig(backend="xla" if jax.default_backend() != "tpu" else "pallas")

    @jax.jit
    def render_one(cam_tree):
        out = render_gaussians(
            jnp.asarray(gt["means"]), jnp.asarray(gt["cov6"]),
            jnp.asarray(gt["means"]), jnp.zeros((gt["means"].shape[0], 16, 3)),
            jnp.asarray(gt["opacity"]), cam_tree, jnp.asarray(bg),
            colors_precomp=jnp.asarray(gt["colors"]), config=cfg,
        )
        return out.render, out.t_final

    images, masks = [], []
    for c in cams:
        img, t_fin = render_one(c)
        images.append(np.asarray(img))
        masks.append(np.asarray(t_fin < 0.5)[..., None])
    centers = np.stack([np.asarray(c.camera_center) for c in cams], axis=1)
    from manus_tpu.utils.camera import get_scene_extent

    return SyntheticStaticDataset(
        cameras=stack_cameras(cams),
        images=np.stack(images).astype(np.float32),
        masks=np.stack(masks),
        bg_color=bg_color,
        extent=get_scene_extent(centers),
        gt=gt,
        width=width,
        height=height,
    )


@dataclasses.dataclass
class SyntheticDynamicDataset:
    """Articulated hand scene: skeleton frames + GT skinned cloud renders."""

    cameras: Camera  # stacked [V]
    images: np.ndarray  # [F, V, H, W, 3]
    masks: np.ndarray  # [F, V, H, W, 1]
    bones_rest: Bones
    bones_posed: list  # list of Bones (per frame)
    bg_color: str
    extent: float
    gt: dict
    width: int
    height: int

    @property
    def num_views(self):
        return self.images.shape[1]

    @property
    def num_frames(self):
        return self.images.shape[0]

    def get_batch(self, frame: int, views):
        return dict(rgb=self.images[frame, views], mask=self.masks[frame, views])

    def sample_gaussians_on_bones(self, samples_per_bone: int, seed: int = 1):
        return sample_gaussians_on_bones(
            np.asarray(self.bones_rest.heads),
            np.asarray(self.bones_rest.tails),
            np.asarray(self.bones_rest.transforms),
            samples_per_bone,
            seed=seed,
        )


def build_synthetic_dynamic(
    width=128, height=128, num_cameras=8, num_frames=4,
    samples_per_bone_gt=60, seed=0, bg_color="black",
    use_reference_skeleton=True,
) -> SyntheticDynamicDataset:
    skel = load_reference_skeleton() if use_reference_skeleton else None
    if skel is None:
        skel = procedural_skeleton(max(num_frames, 2))
    f_total = skel["pose_transforms"].shape[0]
    frame_ids = np.linspace(0, f_total - 1, num_frames).astype(int)

    center = skel["rest_heads"].mean(axis=0)
    span = np.linalg.norm(
        skel["rest_tails"] - skel["rest_heads"], axis=1
    ).sum()
    cam_dist = max(1.0, 2.5 * span / 4)
    cams = hemisphere_cameras(
        num_cameras, width, height, dist=cam_dist, seed=seed, center=center
    )

    # GT: gaussians rigidly attached to bones (hard skinning), rendered per
    # frame via LBS so images are consistent with an articulated model.
    pts, cols = sample_gaussians_on_bones(
        skel["rest_heads"], skel["rest_tails"], skel["rest_transforms"],
        samples_per_bone_gt, seed=seed,
    )
    rng = np.random.RandomState(seed + 1)
    n = pts.shape[0]
    scale0 = span / 120.0
    scales = rng.uniform(0.5 * scale0, 1.2 * scale0, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    cov6 = np.asarray(
        covariance_from_scaling_rotation(jnp.asarray(scales), jnp.asarray(quats))
    )
    opacity = rng.uniform(0.7, 0.98, (n,)).astype(np.float32)
    # hard skin weights: nearest bone segment
    from manus_tpu.ops.knn import nearest_neighbor

    seg_pts, seg_ids = [], []
    for b in range(skel["rest_heads"].shape[0]):
        t_vals = np.linspace(0.05, 0.95, 16)[:, None]
        seg = skel["rest_heads"][b][None] * (1 - t_vals) + skel["rest_tails"][b][None] * t_vals
        seg_pts.append(seg)
        seg_ids.append(np.full(16, b))
    seg_pts = np.concatenate(seg_pts).astype(np.float32)
    seg_ids = np.concatenate(seg_ids)
    _, nn_idx = nearest_neighbor(jnp.asarray(pts), jnp.asarray(seg_pts))
    bone_of = seg_ids[np.asarray(nn_idx)]
    j = skel["rest_heads"].shape[0]
    skin = np.zeros((n, j), np.float32)
    skin[np.arange(n), bone_of] = 1.0

    bones_rest = Bones(
        heads=jnp.asarray(skel["rest_heads"], jnp.float32),
        tails=jnp.asarray(skel["rest_tails"], jnp.float32),
        transforms=jnp.asarray(skel["rest_transforms"], jnp.float32),
    )
    gt = dict(
        means=pts, cov6=cov6, colors=cols, opacity=opacity, skin=skin,
        scales=scales, quats=quats,
    )

    bg = np.zeros(3, np.float32) if bg_color == "black" else np.ones(3, np.float32)
    cfg = RasterConfig(backend="xla" if jax.default_backend() != "tpu" else "pallas")

    from manus_tpu.ops.skinning import bone_deformation_transforms, skin_gaussians

    @jax.jit
    def render_one(pose_T, cam_tree):
        tf_b = bone_deformation_transforms(pose_T, bones_rest.transforms)
        sk = skin_gaussians(
            jnp.asarray(pts), jnp.asarray(cov6), jnp.asarray(skin), tf_b
        )
        out = render_gaussians(
            sk.posed_xyz, sk.posed_cov, jnp.asarray(pts),
            jnp.zeros((n, 16, 3)), jnp.asarray(opacity), cam_tree,
            jnp.asarray(bg), colors_precomp=jnp.asarray(cols), config=cfg,
        )
        return out.render, out.t_final

    images = np.zeros((num_frames, num_cameras, height, width, 3), np.float32)
    masks = np.zeros((num_frames, num_cameras, height, width, 1), bool)
    bones_posed = []
    for fi, fid in enumerate(frame_ids):
        pose_T = jnp.asarray(skel["pose_transforms"][fid])
        bones_posed.append(
            Bones(
                heads=jnp.asarray(skel["pose_heads"][fid], jnp.float32),
                tails=jnp.asarray(skel["pose_tails"][fid], jnp.float32),
                transforms=jnp.asarray(skel["pose_transforms"][fid], jnp.float32),
            )
        )
        for vi, c in enumerate(cams):
            img, t_fin = render_one(pose_T, c)
            images[fi, vi] = np.asarray(img)
            masks[fi, vi] = np.asarray(t_fin < 0.5)[..., None]

    centers = np.stack([np.asarray(c.camera_center) for c in cams], axis=1)
    from manus_tpu.utils.camera import get_scene_extent

    return SyntheticDynamicDataset(
        cameras=stack_cameras(cams),
        images=images,
        masks=masks,
        bones_rest=bones_rest,
        bones_posed=bones_posed,
        bg_color=bg_color,
        extent=get_scene_extent(centers),
        gt=gt,
        width=width,
        height=height,
    )


def _slice_cameras(cams: Camera, idx: np.ndarray) -> Camera:
    from manus_tpu.utils.camera import index_camera

    return index_camera(cams, jnp.asarray(idx))


def split_synthetic_static(ds: SyntheticStaticDataset, n_val: int = 2):
    """Held-out camera split, reference semantics (brics_static.py:61-66):
    first `n_val` cameras validate, the rest train. Returns (train, val)."""
    n_val = min(n_val, ds.num_views - 1)  # always keep >=1 train camera
    tr_idx = np.arange(n_val, ds.num_views)
    va_idx = np.arange(n_val)

    def take(idx):
        return dataclasses.replace(
            ds,
            cameras=_slice_cameras(ds.cameras, idx),
            images=ds.images[idx],
            masks=ds.masks[idx],
        )

    return take(tr_idx), take(va_idx)


def split_synthetic_dynamic(ds: SyntheticDynamicDataset, split_ratio: float = 0.1):
    """Held-out FRAME split for dynamic scenes (reference brics_dynamic
    splits its flat index list by split_ratio): the head frames train, the
    tail frames validate. split_ratio is the VAL fraction — same semantics
    as data/brics.py:245 (train fraction = 1 - split_ratio).
    Returns (train, val)."""
    n_train = max(
        1,
        min(ds.num_frames - 1, int(round((1.0 - split_ratio) * ds.num_frames))),
    )

    def take(sl):
        return dataclasses.replace(
            ds,
            images=ds.images[sl],
            masks=ds.masks[sl],
            bones_posed=ds.bones_posed[sl],
        )

    return take(slice(0, n_train)), take(slice(n_train, ds.num_frames))
