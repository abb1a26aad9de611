"""Preprocess pipeline tests: triangulation, one-euro, IK."""
import numpy as np
import jax.numpy as jnp

from manus_tpu.preprocess.ik import (
    chain_forward,
    make_chain,
    solve_ik,
    update_bone_lengths,
)
from manus_tpu.preprocess.one_euro import OneEuroFilter, filter_sequence
from manus_tpu.preprocess.triangulate import (
    batch_triangulate,
    iterative_triangulate,
)


def _projection_setup(num_views=6, seed=0):
    rng = np.random.RandomState(seed)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    Ps, Rs, ts = [], [], []
    for i in range(num_views):
        theta = 2 * np.pi * i / num_views
        pos = 3.0 * np.array([np.sin(theta), 0.3, np.cos(theta)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd])
        t = -R @ pos
        Ps.append(K @ np.concatenate([R, t[:, None]], axis=1))
    return np.stack(Ps)


def test_triangulation_recovers_points():
    P = _projection_setup()
    rng = np.random.RandomState(1)
    pts = rng.uniform(-0.3, 0.3, (21, 3))
    homo = np.concatenate([pts, np.ones((21, 1))], axis=1)
    proj = np.einsum("vab,jb->vja", P, homo)
    xy = proj[..., :2] / proj[..., 2:]
    kp = np.concatenate([xy, np.ones((P.shape[0], 21, 1))], axis=-1)
    out = np.asarray(batch_triangulate(jnp.asarray(kp), jnp.asarray(P)))
    np.testing.assert_allclose(out[:, :3], pts, atol=1e-4)
    np.testing.assert_allclose(out[:, 3], 1.0)


def test_iterative_triangulation_rejects_outliers():
    P = _projection_setup()
    rng = np.random.RandomState(2)
    pts = rng.uniform(-0.3, 0.3, (21, 3))
    homo = np.concatenate([pts, np.ones((21, 1))], axis=1)
    proj = np.einsum("vab,jb->vja", P, homo)
    xy = proj[..., :2] / proj[..., 2:]
    xy[0] += 300.0  # corrupt one view badly
    kp = np.concatenate([xy, np.ones((P.shape[0], 21, 1))], axis=-1)
    naive = np.asarray(batch_triangulate(jnp.asarray(kp), jnp.asarray(P)))
    robust = np.asarray(iterative_triangulate(jnp.asarray(kp), jnp.asarray(P)))
    err_naive = np.abs(naive[:, :3] - pts).max()
    err_robust = np.abs(robust[:, :3] - pts).max()
    assert err_robust < 1e-3
    assert err_robust < err_naive


def test_one_euro_smooths():
    rng = np.random.RandomState(0)
    t = np.arange(100, dtype=np.float64)
    clean = np.sin(t / 30)[:, None]
    noisy = clean + rng.normal(0, 0.2, (100, 1))
    smoothed = np.asarray(
        filter_sequence(jnp.asarray(t), jnp.asarray(noisy),
                        min_cutoff=0.1, beta=0.0)
    )
    assert np.abs(smoothed - clean).mean() < np.abs(noisy - clean).mean()

    # streaming variant agrees with the scan variant
    f = OneEuroFilter(t[:1], noisy[0:1], min_cutoff=0.1)
    stream = [noisy[0:1]]
    for i in range(1, 100):
        stream.append(f(t[i : i + 1], noisy[i : i + 1]))
    stream = np.concatenate(stream)
    np.testing.assert_allclose(stream, smoothed, atol=1e-4)


def _two_finger_chain():
    # 1 root bone + one 2-bone finger, all along +Y
    bnames = ["bone_0", "bone_1", "bone_2"]
    parents = [-1, 0, 1]
    rest = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    heads = np.array([[0, 0, 0], [0, 0.3, 0], [0, 0.5, 0]], np.float32)
    tails = np.array([[0, 0.3, 0], [0, 0.5, 0], [0, 0.7, 0]], np.float32)
    rest[:, :3, 3] = heads
    return make_chain(bnames, parents, rest, heads, tails)


def test_chain_forward_identity():
    chain = _two_finger_chain()
    kp, heads, tails = chain_forward(
        chain, jnp.zeros(3), jnp.zeros((4, 3))
    )
    np.testing.assert_allclose(np.asarray(heads), chain.heads, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tails), chain.tails, atol=1e-5)


def test_ik_recovers_pose():
    chain = _two_finger_chain()
    # target: bend bone_2 about z by 0.5 rad, translate root
    gt_angles = np.zeros((4, 3), np.float32)
    gt_angles[3, 2] = -0.5
    gt_trans = np.array([0.05, -0.02, 0.03], np.float32)
    target, _, _ = chain_forward(
        chain, jnp.asarray(gt_trans), jnp.asarray(gt_angles)
    )
    to_use = jnp.ones(target.shape[0], bool)
    trans, angles, loss = solve_ik(
        chain, target, to_use, constraint=False, limit=False,
        lr=5e-2, max_iter=400,
    )
    pred, _, _ = chain_forward(chain, trans, angles)
    assert loss < 1e-5
    np.testing.assert_allclose(np.asarray(pred), np.asarray(target), atol=5e-3)


def test_update_bone_lengths():
    chain = _two_finger_chain()
    kp = np.zeros((2, 4, 4), np.float32)
    kp[:, :, 3] = 1.0
    kp[:, 1, 1] = 0.6  # tail of bone_0 twice as far
    kp[:, 2, 1] = 0.8
    kp[:, 3, 1] = 1.0
    chain2 = update_bone_lengths(chain, kp)
    np.testing.assert_allclose(chain2.bone_lengths, [0.6, 0.2, 0.2], atol=1e-5)


def test_full_pipeline_recovers_motion():
    """2D projections of a moving chain -> triangulate -> IK -> smooth."""
    from manus_tpu.preprocess.pipeline import run_pipeline

    chain = _two_finger_chain()
    P = _projection_setup(num_views=5)
    f_total = 3
    kp2d = np.zeros((f_total, 5, 4, 3), np.float32)
    gt_kp3d = []
    for f in range(f_total):
        angles = np.zeros((4, 3), np.float32)
        angles[3, 2] = -0.2 * f
        kp, _, _ = chain_forward(chain, jnp.zeros(3), jnp.asarray(angles))
        kp = np.asarray(kp)
        gt_kp3d.append(kp)
        homo = np.concatenate([kp, np.ones((4, 1))], axis=1)
        proj = np.einsum("vab,jb->vja", P, homo)
        xy = proj[..., :2] / proj[..., 2:]
        kp2d[f, :, :, :2] = xy
        kp2d[f, :, :, 2] = 1.0

    out = run_pipeline(kp2d, P, chain, constraint=False, max_iter=250)
    np.testing.assert_allclose(
        out["keypoints3d"][:, :, :3], np.stack(gt_kp3d), atol=1e-3
    )
    assert out["ik_losses"].max() < 1e-4
    assert out["angles_smooth"].shape == out["angles"].shape


def test_novel_pose_generation(tmp_path):
    """generate_novel_pose: zero pose == rest; FK consistency of
    heads/tails; pkl round-trips through load_skeleton; flexion stays
    within the DOF limits."""
    import pickle

    from manus_tpu.data.synthetic import load_skeleton, procedural_skeleton
    from manus_tpu.preprocess.novel_pose import (
        flexion_eulers, generate_flexion_sequence, generate_novel_pose,
        interpolate_eulers,
    )

    skel = procedural_skeleton(num_frames=2)
    j = len(skel["bnames"])

    # zero eulers -> every posed frame equals rest
    zero = np.zeros((3, j, 3), np.float32)
    d = generate_novel_pose(skel, zero)
    np.testing.assert_allclose(
        d["pose_matrixs"], np.tile(skel["rest_transforms"][None], (3, 1, 1, 1)),
        atol=1e-5,
    )
    np.testing.assert_allclose(d["pose_tails"][0], skel["rest_tails"], atol=1e-5)

    # flexed sequence: pkl contract + load_skeleton round trip
    path = str(tmp_path / "novel_pose.pkl")
    d = generate_flexion_sequence(skel, num_frames=6, out_path=path)
    for key in ("bnames", "bnames_parent", "rest_matrixs", "rest_tails",
                "rest_heads", "pose_matrixs", "pose_tails", "pose_heads",
                "pose_params", "rest_matrix_world", "pose_matrix_world",
                "eulers", "root_translation", "root_rotation"):
        assert key in d, key
    assert d["pose_matrixs"].shape == (6, j, 4, 4)
    loaded = load_skeleton(path)
    np.testing.assert_allclose(loaded["pose_transforms"], d["pose_matrixs"],
                               atol=1e-6)
    np.testing.assert_allclose(loaded["pose_tails"], d["pose_tails"],
                               atol=1e-6)

    # FK consistency: posed tail == pose_matrix applied to rest-local tail
    rest_T = d["rest_matrixs"]
    local = np.einsum(
        "jik,jk->ji", np.linalg.inv(rest_T),
        np.concatenate([d["rest_tails"], np.ones((j, 1))], axis=1),
    )
    posed = np.einsum("fjik,jk->fji", d["pose_matrixs"], local)[..., :3]
    np.testing.assert_allclose(posed, d["pose_tails"], atol=1e-4)
    # bones actually moved
    assert np.abs(d["pose_tails"][1:] - d["pose_tails"][:1]).max() > 1e-3

    # flexion respects limits
    dof = np.zeros((j, 3), bool); dof[:, 0] = True
    limits = np.zeros((j, 3, 2), np.float32)
    limits[..., 0], limits[..., 1] = -0.5, 0.2
    eul = flexion_eulers(12, dof, limits, amplitude=1.0)
    assert eul.min() >= -0.5 - 1e-5 and eul.max() <= 0.2 + 1e-5
    assert np.all(eul[:, :, 1:] == 0)

    # interpolation endpoints hit the keys
    keys = np.stack([zero[0], eul[3]], axis=0)
    interp = interpolate_eulers(keys, 5)
    np.testing.assert_allclose(interp[0], keys[0], atol=1e-6)
    np.testing.assert_allclose(interp[-1], keys[1], atol=1e-6)


def test_filter_pose_frames():
    from manus_tpu.preprocess.pipeline import filter_pose_frames

    rng = np.random.default_rng(0)
    F, J = 15, 21
    kyps = np.concatenate(
        [rng.normal(size=(F, J, 3)), np.ones((F, J, 1))], axis=-1
    )
    # bin 0 (frames 0-4): frame 2 has one missing non-tip keypoint, others
    # clean -> frame 0 wins (earliest among equally-complete).
    kyps[2, 6, 3] = 0.0
    # bin 1 (frames 5-9): frame 5 missing a fingertip, frame 6 missing one
    # non-tip keypoint, frame 7 missing an ENTIRE finger -> frame 6 wins
    # over 8/9? no: 8 and 9 are fully clean -> frame 8 wins.
    kyps[5, 4, 3] = 0.0
    kyps[6, 6, 3] = 0.0
    kyps[7, 5:9, 3] = 0.0
    kyps[8, 9, 3] = 0.0
    kyps[9, 9, 3] = 0.0
    kyps[9, 10, 3] = 0.0
    # bin 2 (frames 10-14): every frame misses a fingertip -> bin skipped.
    kyps[10:15, 8, 3] = 0.0

    chosen = filter_pose_frames(kyps, bin_size=5)
    assert chosen == [0, 6]
    # with ignore_missing_tip the last bin keeps its most-complete frame,
    # and frame 5 (missing only a tip) ties frame 6 and wins by position
    chosen2 = filter_pose_frames(kyps, bin_size=5, ignore_missing_tip=True)
    assert chosen2 == [0, 5, 10]
    # start_frame drops leading frames before binning (grasp-sequence cut)
    chosen3 = filter_pose_frames(kyps, bin_size=5, start_frame=5)
    assert chosen3[0] == 6


def test_sequence_is_faulty():
    from manus_tpu.preprocess.pipeline import sequence_is_faulty

    assert not sequence_is_faulty([0, 5, 90], 100)   # covers 90% of capture
    assert sequence_is_faulty([0, 5, 70], 100)       # tracking died at 70%
    assert sequence_is_faulty([], 100)               # nothing survived
