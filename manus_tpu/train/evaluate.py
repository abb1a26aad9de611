"""Contact evaluation: paint-transfer IoU/F1 between ground-truth contact
masks and rendered accumulated-contact images.

Counterpart of the reference eval pipeline (scripts/train/eval.sh ->
scripts/process/get_iou_ours.py / get_evaluation_numbers_ours.py): the
rendered `acc_gt_eval` images are thresholded into binary contact masks,
compared per camera against GT masks, and aggregated to CSV. GT masks for
real MANUS-Grasps data come from painted-hand color segmentation — that
color-keying stage consumes camera images and is provided here as a
configurable HSV range keyer with nearest-neighbor hole filling
(get_iou_ours.py:74-151 behaviour) without the Blender-side tooling.
"""
from __future__ import annotations

import csv
import os
from typing import Optional

import numpy as np

from manus_tpu.ops.contacts import contact_iou_f1


def contact_mask_from_render(
    render: np.ndarray,  # [H, W, 3] accumulated-contact grayscale render
    threshold: float = 0.1,
) -> np.ndarray:
    """Binary contact mask from a gray-colormapped contact render."""
    gray = np.asarray(render).mean(axis=-1)
    return gray > threshold


def skin_mask_from_color(
    image: np.ndarray,  # [H, W, 3] float [0,1] RGB photo of painted hand
    hsv_low=(0.45, 0.25, 0.2),
    hsv_high=(0.75, 1.0, 1.0),
    fill_holes: bool = True,
) -> np.ndarray:
    """Color-range contact (paint) segmentation with hole filling.

    The reference keys painted regions by color range and fills holes by
    nearest-neighbor vote (get_iou_ours.py:74-151). Ranges are data-
    dependent; defaults target a blue/cyan paint.
    """
    import cv2

    img8 = (np.clip(image, 0, 1) * 255).astype(np.uint8)
    hsv = cv2.cvtColor(img8, cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 0] /= 179.0
    hsv[..., 1:] /= 255.0
    mask = np.all((hsv >= np.asarray(hsv_low)) & (hsv <= np.asarray(hsv_high)),
                  axis=-1)
    if fill_holes:
        mask = cv2.morphologyEx(
            mask.astype(np.uint8), cv2.MORPH_CLOSE,
            np.ones((5, 5), np.uint8),
        ).astype(bool)
    return mask


def evaluate_contact_dir(
    pred_dir: str,
    gt_dir: str,
    out_csv: Optional[str] = None,
    threshold: float = 0.1,
) -> dict:
    """IoU/F1 over matching PNG pairs in two directories.

    pred images are acc_gt_eval renders; gt images are binary (or color-
    keyable) contact masks with the same filenames. Returns the aggregate
    and writes a per-camera CSV (reference eval_metric.csv shape).
    """
    import cv2

    names = sorted(
        f for f in os.listdir(pred_dir)
        if f.endswith(".png") and os.path.exists(os.path.join(gt_dir, f))
    )
    rows = []
    ious, f1s = [], []
    for name in names:
        pred_img = cv2.cvtColor(
            cv2.imread(os.path.join(pred_dir, name)), cv2.COLOR_BGR2RGB
        ) / 255.0
        gt_img = cv2.imread(
            os.path.join(gt_dir, name), cv2.IMREAD_GRAYSCALE
        )
        pred_mask = contact_mask_from_render(pred_img, threshold)
        gt_mask = gt_img > 127
        iou, f1 = contact_iou_f1(pred_mask, gt_mask)
        iou, f1 = float(iou), float(f1)
        rows.append([name, iou, f1])
        ious.append(iou)
        f1s.append(f1)

    summary = dict(
        mean_iou=float(np.mean(ious)) if ious else float("nan"),
        mean_f1=float(np.mean(f1s)) if f1s else float("nan"),
        num_images=len(rows),
    )
    if out_csv:
        os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
        with open(out_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["camera", "iou", "f1"])
            w.writerows(rows)
            w.writerow(["mean", summary["mean_iou"], summary["mean_f1"]])
    return summary


def aggregate_subject_csvs(csv_paths: list[str], out_csv: str) -> dict:
    """Cross-subject averaging (reference get_evaluation_numbers_ours.py)."""
    all_iou, all_f1 = [], []
    for path in csv_paths:
        with open(path) as f:
            for row in csv.reader(f):
                if row and row[0] == "mean":
                    all_iou.append(float(row[1]))
                    all_f1.append(float(row[2]))
    summary = dict(
        mean_iou=float(np.mean(all_iou)) if all_iou else float("nan"),
        mean_f1=float(np.mean(all_f1)) if all_f1 else float("nan"),
        num_subjects=len(all_iou),
    )
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metric", "value"])
        for k, v in summary.items():
            w.writerow([k, v])
    return summary
