"""BRICS capture-rig dataset loaders (static PNG layout + dynamic HDF5).

Re-implements the data contracts of the reference loaders:
  * static (/root/reference/src/datasets/brics_static.py): per-camera
    segmented PNGs under images/refined_seg/<cam>/, calibration from
    optim_params.txt, undistortion, alpha compositing over the bg color,
    train/val camera split [2:] / [:2], hemisphere skip list;
  * dynamic (/root/reference/src/datasets/brics_dynamic.py): per-action
    HDF5 files with frames/<fno>/{images,bbox,metadata}, K/, extr/,
    mano_rest; bbox crops pasted back into full frames; per-frame
    rest/posed Bones from the metadata blocks.

Both classes expose the framework dataset protocol consumed by
train/trainer.py: cameras (stacked Camera pytree), extent, bg_color,
num_views/num_frames, get_batch(frame, views), plus the gaussian-init
samplers.
"""
from __future__ import annotations

import glob
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from manus_tpu.data import params as param_utils
from manus_tpu.data.synthetic import sample_gaussians_on_bones
from manus_tpu.utils.camera import get_scene_extent, make_camera, stack_cameras
from manus_tpu.utils.structures import Bones
from manus_tpu.utils.transforms import build_kintree


def _bg_color(name: str, rng=None) -> np.ndarray:
    if name == "white":
        return np.ones(3, np.float32)
    if name == "random":
        rng = rng or np.random
        return rng.rand(3).astype(np.float32)
    return np.zeros(3, np.float32)


class BricsStaticDataset:
    """Static object scene from segmented multi-view PNGs."""

    def __init__(
        self,
        root_dir: str,
        params_dir: str,
        width: int,
        height: int,
        split: str = "train",
        bg_color: str = "black",
        resize_factor: float = 1.0,
        skip_cameras=param_utils.STATIC_SKIP_CAMERAS,
        image_subdir: str = os.path.join("images", "refined_seg"),
    ):
        import cv2

        self.bg_color = bg_color
        image_dir = os.path.join(root_dir, image_subdir)
        cam_file = os.path.join(params_dir, "optim_params.txt")
        cameras = param_utils.read_params(cam_file)
        cameras = [c for c in cameras if c["cam_name"] not in skip_cameras]
        # reference split: first two cameras for val, rest for train
        cameras = cameras[2:] if split == "train" else cameras[:2]

        cams, images, masks = [], [], []
        self.root_dir = root_dir
        for cam in cameras:
            extr = param_utils.get_extr(cam)
            K, dist = param_utils.get_intr(cam)
            img_paths = sorted(
                glob.glob(os.path.join(image_dir, str(cam["cam_name"]), "*"))
            )
            if not img_paths:
                continue
            image = cv2.imread(img_paths[0], cv2.IMREAD_UNCHANGED)
            new_K, _ = param_utils.get_undistort_params(K, dist, (width, height))
            image = param_utils.undistort_image(K, new_K, dist, image)
            cams.append(
                make_camera(new_K, extr, width, height,
                            resize_factor=resize_factor)
            )
            if image.shape[-1] == 4:
                b, g, r, alpha = cv2.split(image)
                alpha = alpha[..., None] / 255.0
            else:
                b, g, r = cv2.split(image)
                alpha = np.ones_like(b, np.float32)[..., None]
            rgb = np.stack([r, g, b], axis=-1) / 255.0
            bg = _bg_color(bg_color)
            rgb = rgb * alpha + bg * (1.0 - alpha)
            if resize_factor != 1.0:
                rgb = cv2.resize(rgb, (cams[-1].width, cams[-1].height),
                                 interpolation=cv2.INTER_AREA)
                alpha = cv2.resize(alpha, (cams[-1].width, cams[-1].height),
                                   interpolation=cv2.INTER_AREA)[..., None]
            images.append(rgb.astype(np.float32))
            masks.append(alpha.astype(np.float32))

        self.images = np.stack(images)
        self.masks = np.stack(masks)
        self.cameras = stack_cameras(cams)
        centers = np.stack([np.asarray(c.camera_center) for c in cams], axis=1)
        self.extent = get_scene_extent(centers)
        self.width = cams[0].width
        self.height = cams[0].height

    @property
    def num_views(self) -> int:
        return self.images.shape[0]

    def get_batch(self, frame: int, views):
        return dict(rgb=self.images[views], mask=self.masks[views])

    def sample_gaussians(self, sample_size: int, seed: int = 0,
                         mesh_path: Optional[str] = None):
        """Init cloud from the NGP mesh when present (reference
        brics_static.py:130-150), else random points in the scene core."""
        rng = np.random.RandomState(seed)
        if mesh_path is None:
            candidates = glob.glob(
                os.path.join(self.root_dir, "mesh", "ngp_mesh", "*.ply")
            )
            mesh_path = candidates[0] if candidates else None
        if mesh_path and os.path.exists(mesh_path):
            verts = _load_ply_vertices(mesh_path)
            idx = rng.randint(0, len(verts), sample_size)
            pts = verts[idx] + rng.normal(0, 0.005, (sample_size, 3))
        else:
            pts = rng.uniform(-0.15, 0.15, (sample_size, 3))
        colors = rng.uniform(0, 1, (sample_size, 3))
        return pts.astype(np.float32), colors.astype(np.float32)


def _load_ply_vertices(path: str) -> np.ndarray:
    """Minimal binary/ascii PLY vertex reader (trimesh isn't available)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        n_verts = 0
        fmt = "ascii"
        props = []
        in_vertex = False
        for line in header:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                in_vertex = parts[1] == "vertex"
                if in_vertex:
                    n_verts = int(parts[2])
            elif parts[0] == "property" and in_vertex:
                props.append((parts[2], parts[1]))
        type_map = {
            "float": "f4", "float32": "f4", "double": "f8",
            "uchar": "u1", "uint8": "u1", "int": "i4", "uint": "u4",
            "short": "i2", "ushort": "u2", "char": "i1",
        }
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n_verts)
            cols = [i for i, (nm, _) in enumerate(props) if nm in "xyz"]
            return data[:, cols[:3]].astype(np.float32)
        endian = "<" if "little" in fmt else ">"
        dtype = np.dtype([(nm, endian + type_map[t]) for nm, t in props])
        data = np.frombuffer(f.read(n_verts * dtype.itemsize), dtype=dtype)
        return np.stack(
            [data["x"], data["y"], data["z"]], axis=-1
        ).astype(np.float32)


class BricsDynamicDataset:
    """Articulated hand sequences from per-action HDF5 files."""

    def __init__(
        self,
        root_dir: str,
        width: int,
        height: int,
        split: str = "train",
        bg_color: str = "black",
        resize_factor: float = 1.0,
        num_time_steps: int = -1,
        split_ratio: float = 0.1,
        sequences="all",
        n_bones: int = 20,
    ):
        import h5py

        self.root_dir = root_dir
        self.bg_color = bg_color
        self.resize_factor = resize_factor
        self.n_bones = n_bones
        self.full_width, self.full_height = width, height

        actions = sorted(
            f for f in os.listdir(root_dir) if f.endswith(".hdf5")
        )
        if sequences != "all":
            actions = [f"{a}.hdf5" for a in sequences if f"{a}.hdf5" in actions]
        assert actions, f"no .hdf5 actions under {root_dir}"
        self.actions = [a.split(".")[0] for a in actions]
        self.action = self.actions[0]

        # The flat frame index spans all actions (reference index_list over
        # (action, frame, view) triples); cameras/rig are shared across an
        # entire subject's actions, so they come from the first file.
        self._frame_index = []  # list of (action, fno)
        self._metadata = {}
        cams = None
        for action_file in actions:
            action = action_file.split(".")[0]
            h5_path = os.path.join(root_dir, action_file)
            with h5py.File(h5_path, "r") as f:
                frame_nos = sorted(f["frames"].keys(), key=lambda s: int(s))
                if 0 < num_time_steps < len(frame_nos):
                    frame_nos = frame_nos[:: len(frame_nos) // num_time_steps]
                for fno in frame_nos:
                    self._frame_index.append((action, fno))
                    self._metadata[(action, fno)] = self._fetch_metadata(
                        f["frames"][fno]["metadata"]
                    )
                if cams is None:
                    self.cam_names = list(f["K"].keys())
                    cams = [
                        make_camera(
                            f["K"][c][:], f["extr"][c][:], width, height,
                            resize_factor=resize_factor,
                        )
                        for c in self.cam_names
                    ]
                    self.mano_data = {
                        k: v[:] for k, v in (f.get("mano_rest") or {}).items()
                    }

        # frame split (reference splits the flat index list; we split
        # frames, which matches split_by_action=False at view batch 1)
        n_val = max(1, int((1 - split_ratio) * len(self._frame_index))) \
            if split_ratio > 0 else len(self._frame_index)
        self._frame_index = (
            self._frame_index[:n_val] if split == "train"
            else self._frame_index[n_val:]
        ) or self._frame_index

        self.cameras = stack_cameras(cams)
        centers = np.stack([np.asarray(c.camera_center) for c in cams], axis=1)
        self.extent = get_scene_extent(centers)
        self.width = cams[0].width
        self.height = cams[0].height
        self.bones_rest = self._metadata[self._frame_index[0]]["bones_rest"]
        self.bones_posed = [
            self._metadata[key]["bones_posed"] for key in self._frame_index
        ]
        self._h5 = {}

    # -- metadata ---------------------------------------------------------
    def _fetch_metadata(self, md) -> dict:
        """Bones from an HDF5 metadata block (reference
        brics_dynamic.py:280-327)."""
        def names(key):
            return [
                n[0].decode() if isinstance(n, (list, np.ndarray)) else
                (n.decode() if isinstance(n, bytes) else str(n))
                for n in md[key][:].tolist()
            ]

        bnames = names("bnames")
        bnames_parent = names("bnames_parent")
        ids = np.arange(self.n_bones)
        kintree = build_kintree(bnames, bnames_parent)
        rest = Bones(
            heads=jnp.asarray(md["rest_heads"][:][ids], jnp.float32),
            tails=jnp.asarray(md["rest_tails"][:][ids], jnp.float32),
            transforms=jnp.asarray(md["rest_matrixs"][:][ids], jnp.float32),
            kintree=kintree,
            bnames=tuple(bnames),
        )
        posed = Bones(
            heads=jnp.asarray(md["pose_heads"][:][ids], jnp.float32),
            tails=jnp.asarray(md["pose_tails"][:][ids], jnp.float32),
            transforms=jnp.asarray(md["pose_matrixs"][:][ids], jnp.float32),
            eulers=jnp.asarray(md["eulers"][:], jnp.float32),
            root_translation=jnp.asarray(md["root_translation"][:], jnp.float32),
            root_rotation=jnp.asarray(md["root_rotation"][:], jnp.float32),
            kintree=kintree,
            bnames=tuple(bnames),
        )
        return dict(bones_rest=rest, bones_posed=posed)

    # -- images -----------------------------------------------------------
    @property
    def num_views(self) -> int:
        return len(self.cam_names)

    @property
    def num_frames(self) -> int:
        return len(self._frame_index)

    def _file(self, action: str):
        import h5py

        if action not in self._h5:
            self._h5[action] = h5py.File(
                os.path.join(self.root_dir, f"{action}.hdf5"), "r"
            )
        return self._h5[action]

    def get_batch(self, frame: int, views):
        """Read bbox crops from HDF5, then assemble full frames (paste +
        composite + box resize) in the native C++ image-ops path
        (reference fetch_images, brics_dynamic.py:343-373)."""
        from manus_tpu.data.prefetch import assemble_batch_native

        action, fno = self._frame_index[frame]
        f = self._file(action)
        grp = f["frames"][fno]
        crops, bboxes = [], []
        for v in np.atleast_1d(views):
            cam = self.cam_names[int(v)]
            crops.append(grp["images"][cam][:])
            bboxes.append(grp["bbox"][cam][:])
        downscale = max(1, int(round(1.0 / self.resize_factor)))
        rgb, mask = assemble_batch_native(
            crops, np.asarray(bboxes, np.int32),
            self.full_height, self.full_width,
            _bg_color(self.bg_color), downscale=downscale,
        )
        return dict(rgb=rgb, mask=mask)

    # -- init sampling ----------------------------------------------------
    def sample_gaussians_on_bones(self, samples_per_bone: int, seed: int = 0):
        rest = self.bones_rest
        return sample_gaussians_on_bones(
            np.asarray(rest.heads), np.asarray(rest.tails),
            np.asarray(rest.transforms), samples_per_bone, seed=seed,
        )
