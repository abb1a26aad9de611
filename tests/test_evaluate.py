"""Contact evaluation + profiling utility tests."""
import os

import numpy as np
import pytest

from manus_tpu.train.evaluate import (
    aggregate_subject_csvs,
    contact_mask_from_render,
    evaluate_contact_dir,
)
from manus_tpu.utils.profiling import StepTimer, tree_all_finite

cv2 = pytest.importorskip("cv2")


def test_contact_eval_roundtrip(tmp_path):
    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    os.makedirs(pred_dir)
    os.makedirs(gt_dir)
    rng = np.random.RandomState(0)
    for i in range(3):
        gt = np.zeros((32, 32), np.uint8)
        gt[8:20, 8:20] = 255
        cv2.imwrite(str(gt_dir / f"cam{i}.png"), gt)
        # pred: same square plus small noise region
        pred = np.zeros((32, 32, 3), np.float32)
        pred[8:20, 8:20] = 0.8
        pred[25:27, 25:27] = 0.5
        cv2.imwrite(str(pred_dir / f"cam{i}.png"),
                    (pred * 255).astype(np.uint8))
    out_csv = str(tmp_path / "eval.csv")
    summary = evaluate_contact_dir(str(pred_dir), str(gt_dir), out_csv)
    assert summary["num_images"] == 3
    assert 0.9 < summary["mean_iou"] <= 1.0
    assert 0.9 < summary["mean_f1"] <= 1.0

    agg = aggregate_subject_csvs([out_csv, out_csv], str(tmp_path / "agg.csv"))
    assert agg["num_subjects"] == 2
    np.testing.assert_allclose(agg["mean_iou"], summary["mean_iou"])


def test_contact_mask_threshold():
    render = np.zeros((8, 8, 3))
    render[2, 2] = 0.5
    mask = contact_mask_from_render(render, threshold=0.1)
    assert mask[2, 2] and mask.sum() == 1


def test_tree_all_finite():
    import jax.numpy as jnp

    good = {"a": jnp.ones(3), "b": jnp.zeros((2, 2))}
    bad = {"a": jnp.asarray([1.0, jnp.nan])}
    assert bool(tree_all_finite(good))
    assert not bool(tree_all_finite(bad))


def test_step_timer():
    t = StepTimer(sync_every=2)
    t.tick()
    ips = t.tick()
    assert ips > 0
