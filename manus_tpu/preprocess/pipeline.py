"""Preprocess orchestrator: 2D keypoints -> skeleton pose sequence.

Counterpart of /root/reference/preprocess/pose.py:45-62, which chains the
stages through os.system; here they are importable functions driven by one
entry point. The 2D keypoint networks (AlphaPose) and the Blender armature
export remain external producers/consumers, exactly as in the reference —
the contracts are:

  input:  keypoints2d [F, V, J, 3] (x, y, confidence) + projection
          matrices P [V, 3, 4] (K @ [R|t])
  output: per-frame IK joint angles [F, J+1, 3] (+ translations), smoothed
          with a one-euro filter, plus triangulated keypoints3d [F, J, 4].

Usage:
  python -m manus_tpu.preprocess.pipeline kp2d.npz out.npz \
      [--no-constraint] [--max-iter 300]
where kp2d.npz holds `keypoints2d`, `projections`, and the skeleton
(`bnames`, `parents`, `rest_matrices`, `heads`, `tails`).
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from manus_tpu.preprocess.ik import (
    HandChain,
    make_chain,
    solve_ik,
    update_bone_lengths,
)
from manus_tpu.preprocess.one_euro import filter_sequence
from manus_tpu.preprocess.triangulate import iterative_triangulate


def triangulate_sequence(
    keypoints2d: np.ndarray,  # [F, V, J, 3]
    projections: np.ndarray,  # [V, 3, 4]
    min_view: int = 2,
) -> np.ndarray:
    """[F, J, 4] robust triangulated keypoints (xyz + confidence)."""
    out = []
    P = jnp.asarray(projections)
    for f in range(keypoints2d.shape[0]):
        out.append(
            np.asarray(
                iterative_triangulate(
                    jnp.asarray(keypoints2d[f]), P, min_view=min_view
                )
            )
        )
    return np.stack(out)


def fit_sequence(
    chain: HandChain,
    keypoints3d: np.ndarray,  # [F, J+1, 4]
    constraint: bool = True,
    limit: bool = True,
    lr: float = 1e-1,
    max_iter: int = 300,
):
    """Per-frame warm-started IK (reference get_joint_angles semantics).

    Returns (trans [F, 3], angles [F, J+1, 3], losses [F]).
    """
    f_total = keypoints3d.shape[0]
    all_trans, all_angles, losses = [], [], []
    trans_prev, angles_prev = None, None
    for f in range(f_total):
        target = jnp.asarray(keypoints3d[f, :, :3])
        to_use = jnp.asarray(keypoints3d[f, :, 3] > 0)
        trans, angles, loss = solve_ik(
            chain, target, to_use, constraint=constraint, limit=limit,
            lr=lr, trans_init=trans_prev, angles_init=angles_prev,
            max_iter=max_iter,
        )
        trans_prev, angles_prev = trans, angles  # warm start the next frame
        all_trans.append(np.asarray(trans))
        all_angles.append(np.asarray(angles))
        losses.append(loss)
    return np.stack(all_trans), np.stack(all_angles), np.asarray(losses)


def smooth_sequence(angles: np.ndarray, min_cutoff: float = 0.6,
                    beta: float = 0.1) -> np.ndarray:
    """One-euro smoothing over the frame axis (reference one_euro.py)."""
    ts = jnp.arange(angles.shape[0], dtype=jnp.float32)
    return np.asarray(
        filter_sequence(ts, jnp.asarray(angles), min_cutoff=min_cutoff,
                        beta=beta)
    )


def run_pipeline(
    keypoints2d: np.ndarray,
    projections: np.ndarray,
    chain: HandChain,
    constraint: bool = True,
    max_iter: int = 300,
) -> dict:
    """Full geometric pipeline (reference pose.py stages 3d/bone/IK/euro)."""
    kp3d = triangulate_sequence(keypoints2d, projections)
    chain = update_bone_lengths(chain, kp3d)
    trans, angles, losses = fit_sequence(
        chain, kp3d, constraint=constraint, max_iter=max_iter
    )
    angles_smooth = smooth_sequence(angles)
    return dict(
        keypoints3d=kp3d,
        trans=trans,
        angles=angles,
        angles_smooth=angles_smooth,
        ik_losses=losses,
        bone_lengths=chain.bone_lengths,
    )


# Finger keypoint groups of the 21-joint halpe hand layout: thumb chain
# [2..4] then four 4-joint chains; fingertips at every 4th joint.
# (reference preprocess/scripts/filter_poses.py:44-48)
_FINGER_IDX = [list(range(2, 5))] + [list(range(i, i + 4)) for i in range(5, 18, 4)]
_TIP_IDX = [4, 8, 12, 16, 20]


def filter_pose_frames(
    keypoints3d: np.ndarray,  # [F, J, 4] (xyz + confidence)
    frame_ids: np.ndarray | None = None,  # [F] global ids (default 0..F-1)
    bin_size: int = 5,
    ignore_missing_tip: bool = False,
    start_frame: int = 0,
) -> list[int]:
    """Bin-based frame selection (reference filter_poses.py:50-81).

    Walks the sequence in bins of `bin_size` frames and keeps at most one
    frame per bin: frames missing an entire finger (no keypoint in the
    chain detected) are rejected, frames missing any fingertip are
    rejected unless `ignore_missing_tip`, and the survivor with the most
    detected keypoints wins (ties -> earliest, matching np.argmin).
    `start_frame` drops leading frames first (the reference's
    start_frame_for_grasp cut). Returns chosen global frame ids.
    """
    kyps = np.asarray(keypoints3d)
    if frame_ids is None:
        frame_ids = np.arange(kyps.shape[0])
    frame_ids = np.asarray(frame_ids)
    keep = frame_ids >= start_frame
    kyps, frame_ids = kyps[keep], frame_ids[keep]

    chosen: list[int] = []
    for i in range(0, kyps.shape[0], bin_size):
        conf = kyps[i : i + bin_size, :, 3]  # [B, J]
        to_use = np.ones(conf.shape[0], dtype=bool)
        for idx in _FINGER_IDX:
            to_use &= np.any(conf[:, idx], axis=1)
        if not ignore_missing_tip:
            to_use &= np.all(conf[:, _TIP_IDX], axis=1)
            if not np.any(to_use):
                continue
        unfound = conf.shape[1] * np.ones(conf.shape[0])
        unfound[to_use] = np.count_nonzero(
            np.isclose(conf[to_use], 0.0), axis=1
        )
        chosen.append(int(frame_ids[i + int(np.argmin(unfound))]))
    return chosen


def sequence_is_faulty(
    chosen_frames: list[int], last_capture_frame: int,
    diff_ratio: float = 0.8,
) -> bool:
    """Flag a sequence whose filtered poses stop early (reference
    find_bad_sequences.py: a capture is faulty when the last chosen frame
    covers less than `diff_ratio` of the recorded frame range — the hand
    left the rig or tracking collapsed partway through)."""
    if not chosen_frames or last_capture_frame <= 0:
        return True
    return (chosen_frames[-1] / last_capture_frame) <= diff_ratio


def visualize_ik_frames(
    result: dict,
    images: np.ndarray,  # [F, V, H, W, 3] uint8
    projections: np.ndarray,  # [V, 3, 4]
    out_dir: str,
    kintree: dict | None = None,
    max_views: int = 4,
):
    """Reprojection-overlay stage (reference preprocess/pose.py:33-37 ->
    scripts/visualize_IK.py): dump the solved skeleton over the camera
    frames for eyeball QA of the IK fits."""
    import os

    from manus_tpu.utils.io import dump_image
    from manus_tpu.utils.vis import visualize_ik_overlay

    os.makedirs(out_dir, exist_ok=True)
    for f in range(min(len(images), result["keypoints3d"].shape[0])):
        strip = visualize_ik_overlay(
            images[f], result["keypoints3d"][f], projections, kintree,
            max_views=max_views,
        )
        dump_image(strip, os.path.join(out_dir, f"ik_{f:04d}.png"))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("input_npz")
    parser.add_argument("output_npz")
    parser.add_argument("--no-constraint", action="store_true")
    parser.add_argument("--max-iter", type=int, default=300)
    args = parser.parse_args(argv)

    data = np.load(args.input_npz, allow_pickle=True)
    chain = make_chain(
        [str(b) for b in data["bnames"]], data["parents"],
        data["rest_matrices"], data["heads"], data["tails"],
    )
    out = run_pipeline(
        data["keypoints2d"], data["projections"], chain,
        constraint=not args.no_constraint, max_iter=args.max_iter,
    )
    np.savez_compressed(args.output_npz, **out)
    print(
        f"pipeline: {out['angles'].shape[0]} frames, "
        f"mean IK loss {out['ik_losses'].mean():.2e} -> {args.output_npz}"
    )


if __name__ == "__main__":
    main()
