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


def calibrate_hsv_range(
    images,  # iterable of [H, W, 3] float [0,1] RGB frames
    paint_masks,  # iterable of [H, W] bool masks marking known paint pixels
    coverage: float = 0.98,
    margin: float = 0.02,
    sv_margin: float = 0.15,
) -> tuple:
    """Fit (hsv_low, hsv_high) for skin_mask_from_color from labeled paint
    samples — the calibration step real MANUS-Grasps deployments need
    (the range is rig/paint-dependent; the library default is only a
    blue/cyan guess). Scribble or box a few paint regions on one or two
    frames, pass them here, use the returned range everywhere.

    Hue is circular: samples are centered on their circular mean before
    the percentile cut, so paints near the red wrap (h~0/1) calibrate
    correctly. Returns plain-float tuples suitable for config files.
    """
    import cv2

    hs, ss, vs = [], [], []
    for img, m in zip(images, paint_masks):
        img8 = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        hsv = cv2.cvtColor(img8, cv2.COLOR_RGB2HSV).astype(np.float32)
        sel = np.asarray(m).astype(bool)
        if not sel.any():
            continue
        hs.append(hsv[..., 0][sel] / 179.0)
        ss.append(hsv[..., 1][sel] / 255.0)
        vs.append(hsv[..., 2][sel] / 255.0)
    assert hs, "no paint pixels in any provided mask"
    h = np.concatenate(hs)
    s = np.concatenate(ss)
    v = np.concatenate(vs)

    # circular-mean-centered hue percentiles
    ang = h * 2 * np.pi
    mean = np.arctan2(np.sin(ang).mean(), np.cos(ang).mean()) / (2 * np.pi)
    h_cent = (h - mean + 0.5) % 1.0  # paint cluster now sits near 0.5
    qlo, qhi = (1 - coverage) * 100, coverage * 100
    h_lo, h_hi = np.percentile(h_cent, [qlo, qhi])
    # back to absolute hue; clamp (callers with wrap-straddling paints get
    # the widest non-wrapping range, conservative but valid)
    h_lo = max(0.0, float(h_lo - 0.5 + mean) - margin)
    h_hi = min(1.0, float(h_hi - 0.5 + mean) + margin)
    # hue is the lighting-stable channel; saturation/value swing with
    # illumination between capture sessions, so their cut gets a much
    # wider guard band (sv_margin) than hue does
    s_lo, s_hi = np.percentile(s, [qlo, qhi])
    v_lo, v_hi = np.percentile(v, [qlo, qhi])
    low = (h_lo, max(0.0, float(s_lo) - sv_margin),
           max(0.0, float(v_lo) - sv_margin))
    high = (h_hi, min(1.0, float(s_hi) + sv_margin),
            min(1.0, float(v_hi) + sv_margin))
    return low, high


# The reference's 16 per-bone paint colors (get_iou_ours.py:93-110) — a
# fixed palette constant shared with its Blender-side skin renders.
BONE_COLORS = np.asarray(
    [
        [43, 159, 43], [31, 119, 178], [173, 198, 231], [254, 186, 119],
        [151, 222, 137], [213, 38, 39], [254, 151, 149], [196, 175, 212],
        [139, 85, 74], [195, 155, 147], [246, 181, 209], [126, 126, 126],
        [198, 199, 198], [218, 218, 140], [25, 190, 206], [156, 217, 228],
    ],
    np.float32,
)


def skin_bone_masks(
    image: np.ndarray,  # [H, W, 3] uint8/float RGB skin-weight render
    gt_mask: np.ndarray,  # [H, W] bool/0-1 hand silhouette
    color_offset: float = 10.0,
) -> np.ndarray:
    """Per-bone label image from a painted/skin-colored hand render with
    nearest-neighbor hole filling (reference get_skin_mask,
    get_iou_ours.py:74-151).

    Each of the 16 bone colors is keyed within +-offset, eroded+dilated
    (3x3 ellipse) to kill speckle, argmax'd into a label map (0 =
    background), masked to the hand silhouette — then every silhouette
    pixel that got NO label votes takes the label of its nearest labeled
    pixel (the reference's brute-force 2D NN vote, here on the MXU kNN).
    Returns [H, W] int labels in [0, 16].
    """
    import cv2

    from manus_tpu.ops.knn import nearest_neighbor

    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    img = img.astype(np.float32)
    gt = np.asarray(gt_mask).astype(bool)

    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    layers = [np.zeros(gt.shape, np.uint8)]  # background layer
    for c in BONE_COLORS:
        lo = np.asarray(c - color_offset, np.float32)
        hi = np.asarray(c + color_offset, np.float32)
        m = cv2.inRange(img, lo, hi)
        m = cv2.dilate(cv2.erode(m, kernel, 1), kernel, 1)
        layers.append(m)
    labels = np.argmax(np.stack(layers, axis=-1), axis=-1)
    labels = labels * gt

    residual = np.logical_xor(gt, labels > 0)
    res_coord = np.argwhere(residual)
    lab_coord = np.argwhere(labels > 0)
    if len(res_coord) and len(lab_coord):
        # 2D NN vote (pad z=0 for the 3D kernel)
        q = np.concatenate(
            [res_coord.astype(np.float32), np.zeros((len(res_coord), 1),
                                                    np.float32)], axis=1
        )
        r = np.concatenate(
            [lab_coord.astype(np.float32), np.zeros((len(lab_coord), 1),
                                                    np.float32)], axis=1
        )
        import jax.numpy as jnp

        _, idx = nearest_neighbor(jnp.asarray(q), jnp.asarray(r))
        src = lab_coord[np.asarray(idx)]
        labels[res_coord[:, 0], res_coord[:, 1]] = labels[
            src[:, 0], src[:, 1]
        ]
    return labels


def per_bone_iou_f1(
    skin_labels: np.ndarray,  # [H, W] int in [0, B]
    gt_mask: np.ndarray,  # [H, W] binary gt contact
    pred_mask: np.ndarray,  # [H, W] binary predicted contact
    n_bones: int = 16,
):
    """Per-bone contact IoU/F1 by restricting both masks to each bone's
    skin region (reference calculate_per_bone_iou, get_iou_ours.py:189-218).
    Returns (iou[B], f1[B]) with NaN where a bone has no contact pixels."""
    ious, f1s = [], []
    gt = np.asarray(gt_mask).astype(bool)
    pred = np.asarray(pred_mask).astype(bool)
    for b in range(1, n_bones + 1):
        region = skin_labels == b
        g = gt & region
        p = pred & region
        inter = np.logical_and(g, p).sum()
        union = np.logical_or(g, p).sum()
        ious.append(inter / union if union else float("nan"))
        denom = g.sum() + p.sum()
        f1s.append(2 * inter / denom if denom else float("nan"))
    return np.asarray(ious), np.asarray(f1s)


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


def evaluate_metric(
    skin_labels: np.ndarray,  # [H, W] int labels in [0, B]
    gt_mask: np.ndarray,
    pred_mask: np.ndarray,
    n_bones: int = 16,
):
    """Per-bone + combined IoU/F1 for one method on one frame (reference
    evaluate_metric + calculate_per_bone_iou, get_iou.py:189-232).
    Returns (iou[B], f1[B], iou_combined, f1_combined)."""
    iou_b, f1_b = per_bone_iou_f1(skin_labels, gt_mask, pred_mask, n_bones)
    iou, f1 = contact_iou_f1(np.asarray(pred_mask), np.asarray(gt_mask))
    return iou_b, f1_b, float(iou), float(f1)


def blend_masks(
    rgb: np.ndarray,  # [H, W, 3] float [0,1]
    alpha: np.ndarray,  # [H, W, 1] 0/1 hand silhouette
    mask: np.ndarray,  # [H, W] binary contact
    weight: float = 0.5,
    color=(0.0, 0.5, 0.0),
) -> np.ndarray:
    """Green contact overlay on a white-backgrounded photo (reference
    blend_masks, get_iou_ours.py:269-277)."""
    overlay = mask[..., None] * np.asarray(color, np.float32)
    final = rgb * weight + (1.0 - weight) * overlay
    return final * alpha + (1.0 - alpha) * 1.0


def combine_images(
    rgba: np.ndarray,  # [H, W, 4] uint8 photo with alpha silhouette
    gt_mask: np.ndarray,  # [H, W] binary
    method_masks: "dict[str, np.ndarray]",
) -> np.ndarray:
    """One collage row: [photo | gt blend | per-method blends] as uint8
    (reference combine_images, get_iou.py:277-296)."""
    alpha = (rgba[..., -1:] > 128).astype(np.float32)
    rgb = rgba[..., :3].astype(np.float32) / 255.0
    panels = [rgb * alpha + (1.0 - alpha) * 1.0,
              blend_masks(rgb, alpha, np.asarray(gt_mask, np.float32))]
    for m in method_masks.values():
        panels.append(blend_masks(rgb, alpha, np.asarray(m, np.float32)))
    row = np.concatenate(panels, axis=1)
    return np.clip(row * 255.0, 0, 255).astype(np.uint8)


def write_eval_table(
    out_csv: str,
    iou_rows: "dict[str, np.ndarray]",  # method -> [B+1] (bones..., combined)
    f1_rows: "dict[str, np.ndarray]",
    n_bones: int = 16,
) -> None:
    """eval_metric.csv in the reference shape (get_iou.py:366-378):
    header ["", bone1..boneB, combined], one row per method, then the
    matching `<method>_f1` rows, all rounded to 3 decimals."""
    os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([""] + [f"bone{i + 1}" for i in range(n_bones)]
                   + ["combined"])
        for name, row in iou_rows.items():
            w.writerow([name] + np.around(np.asarray(row, float), 3).tolist())
        for name, row in f1_rows.items():
            w.writerow([f"{name}_f1"]
                       + np.around(np.asarray(row, float), 3).tolist())


def evaluate_composite(
    exp_dir: str,
    gt_seg_dir: str,
    gt_img_dir: str,
    n_bones: int = 16,
    mask_threshold: float = 0.5,
) -> dict:
    """Three-way contact evaluation table over a composite run's outputs
    (reference get_iou.py / get_iou_ours.py main):

      ours renders:  {exp_dir}/results/eval_results/ours/*.png — the
        acc_gt_eval side-by-side layout [skin-weight colors | accumulated
        contact] produced by run_composite;
      baselines:     {exp_dir}/results/eval_results/{mano,harp}/
        acc_eval_rendered/*.png — plain contact renders (train/baselines.py
        mano_baseline_contacts output), included when present;
      ground truth:  gt_seg_dir/*.png binary contact masks + gt_img_dir/
        *.png RGBA photos (alpha = hand silhouette), same basenames.

    Writes results/eval_results/eval_metric.csv (per-bone + combined
    IoU/F1 rows per method, frame-averaged) and eval_collage.png, and
    returns {method: {"iou": ..., "f1": ...}} combined scores.
    """
    import cv2

    res_dir = os.path.join(exp_dir, "results", "eval_results")
    ours_dir = os.path.join(res_dir, "ours")
    names = sorted(
        f for f in os.listdir(ours_dir)
        if f.endswith(".png")
        and os.path.exists(os.path.join(gt_seg_dir, f))
        and os.path.exists(os.path.join(gt_img_dir, f))
    )
    if not names:
        raise FileNotFoundError(
            f"no matching (ours, gt_seg, gt_img) PNG triples between "
            f"{ours_dir} and {gt_seg_dir}"
        )
    methods = ["ours"] + [
        m for m in ("mano", "harp")
        if os.path.isdir(os.path.join(res_dir, m, "acc_eval_rendered"))
    ]

    acc_iou = {m: [] for m in methods}
    acc_f1 = {m: [] for m in methods}
    collage = []
    for name in names:
        gt_rgba = cv2.cvtColor(
            cv2.imread(os.path.join(gt_img_dir, name), cv2.IMREAD_UNCHANGED),
            cv2.COLOR_BGRA2RGBA,
        )
        gt_mask = (
            cv2.imread(os.path.join(gt_seg_dir, name), cv2.IMREAD_GRAYSCALE)
            > 255 * mask_threshold
        )
        ours_img = cv2.cvtColor(
            cv2.imread(os.path.join(ours_dir, name)), cv2.COLOR_BGR2RGB
        )
        half = ours_img.shape[1] // 2
        skin_img, ours_contact = ours_img[:, :half], ours_img[:, half:]
        skin_labels = skin_bone_masks(skin_img, gt_rgba[..., -1] > 128)

        masks = {"ours": ours_contact.mean(axis=-1) > 255 * mask_threshold}
        for m in methods[1:]:
            img = cv2.imread(
                os.path.join(res_dir, m, "acc_eval_rendered", name),
                cv2.IMREAD_GRAYSCALE,
            )
            masks[m] = img > 255 * mask_threshold
        for m in methods:
            iou_b, f1_b, iou, f1 = evaluate_metric(
                skin_labels, gt_mask, masks[m], n_bones
            )
            acc_iou[m].append(np.concatenate([iou_b, [iou]]))
            acc_f1[m].append(np.concatenate([f1_b, [f1]]))
        collage.append(combine_images(gt_rgba, gt_mask, masks))

    # frame-average; per-bone NaNs (bone never in contact) excluded like
    # the reference's fillna(0) downstream
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN bones
        iou_rows = {m: np.nan_to_num(np.nanmean(acc_iou[m], axis=0))
                    for m in methods}
        f1_rows = {m: np.nan_to_num(np.nanmean(acc_f1[m], axis=0))
                   for m in methods}
    write_eval_table(
        os.path.join(res_dir, "eval_metric.csv"), iou_rows, f1_rows, n_bones
    )
    cv2.imwrite(
        os.path.join(res_dir, "eval_collage.png"),
        cv2.cvtColor(np.vstack(collage), cv2.COLOR_RGB2BGR),
    )
    return {
        m: dict(iou=float(iou_rows[m][-1]), f1=float(f1_rows[m][-1]))
        for m in methods
    }


def aggregate_eval_tables(csv_paths: "list[str]", out_csv: Optional[str] = None) -> dict:
    """Average eval_metric.csv rows key-wise across grasp sequences
    (reference get_evaluation_numbers_ours.py): returns
    {row_name: averaged values[B+1]} over the CSVs that exist."""
    sums: dict = {}
    count = 0
    for path in csv_paths:
        if not os.path.exists(path):
            continue
        count += 1
        with open(path) as f:
            rows = list(csv.reader(f))
        for row in rows[1:]:
            vals = np.nan_to_num(np.asarray(row[1:], float))
            sums[row[0]] = sums.get(row[0], 0.0) + vals
    avg = {k: v / max(count, 1) for k, v in sums.items()}
    if out_csv:
        with open(out_csv, "w", newline="") as f:
            w = csv.writer(f)
            for k, v in avg.items():
                w.writerow([k] + np.around(v, 3).tolist())
    return avg
