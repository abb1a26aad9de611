"""BRICS calibration file parsing + undistortion.

Same file contract as /root/reference/src/utils/params.py:62-105
(optim_params.txt: one row per camera with intrinsics, distortion, and a
wxyz quaternion + translation extrinsic), sorted by camera name.
"""
from __future__ import annotations

import numpy as np

PARAM_DTYPE = [
    ("cam_id", int),
    ("width", int),
    ("height", int),
    ("fx", float),
    ("fy", float),
    ("cx", float),
    ("cy", float),
    ("k1", float),
    ("k2", float),
    ("p1", float),
    ("p2", float),
    ("cam_name", "<U22"),
    ("qvecw", float),
    ("qvecx", float),
    ("qvecy", float),
    ("qvecz", float),
    ("tvecx", float),
    ("tvecy", float),
    ("tvecz", float),
]


def read_params(params_path: str) -> np.ndarray:
    params = np.loadtxt(params_path, dtype=PARAM_DTYPE)
    return np.sort(np.atleast_1d(params), order="cam_name")


def qvec2rotmat(q) -> np.ndarray:
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
            [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def get_intr(param):
    K = np.eye(3)
    K[0, 0], K[1, 1] = param["fx"], param["fy"]
    K[0, 2], K[1, 2] = param["cx"], param["cy"]
    dist = np.asarray([param["k1"], param["k2"], param["p1"], param["p2"]])
    return K, dist


def get_extr(param) -> np.ndarray:
    q = [param["qvecw"], param["qvecx"], param["qvecy"], param["qvecz"]]
    t = np.asarray([param["tvecx"], param["tvecy"], param["tvecz"]])
    return np.hstack([qvec2rotmat(q), t[:, None]])  # [3, 4]


def get_undistort_params(K, dist, img_size):
    import cv2

    new_K, roi = cv2.getOptimalNewCameraMatrix(
        K, dist, img_size, alpha=0, centerPrincipalPoint=True
    )
    return new_K, roi


def undistort_image(K, new_K, dist, img):
    import cv2

    return cv2.undistort(img, K, dist, None, new_K)


# Lower-hemisphere cameras excluded from training (reference
# brics_static.py:33-53).
STATIC_SKIP_CAMERAS = (
    "brics-sbc-003_cam0",
    "brics-sbc-003_cam1",
    "brics-sbc-004_cam1",
    "brics-sbc-008_cam0",
    "brics-sbc-008_cam1",
    "brics-sbc-009_cam0",
    "brics-sbc-013_cam0",
    "brics-sbc-013_cam1",
    "brics-sbc-014_cam0",
    "brics-sbc-018_cam0",
    "brics-sbc-018_cam1",
    "brics-sbc-019_cam0",
)
