"""CLI end-to-end coverage: train -> composite -> render_path via main.main."""
import os

import numpy as np
import pytest

import main as main_mod

cv2 = pytest.importorskip("cv2")

COMMON = [
    "dataset.width=64", "dataset.height=64", "dataset.num_cameras=3",
    "capacity=1024", "raster.backend=xla", "raster.max_pairs_per_tile=512",
    "model.remove_seg_end=0", "trainer.val_every=0",
]


@pytest.fixture(scope="module")
def cli_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli"))
    main_mod.main([
        "--config-name", "OBJ_GAUSSIAN", *COMMON,
        "trainer.max_steps=8", "trainer.checkpoint_every=5",
        "dataset.sample_size=150", "trainer.exp_name=obj",
        f"trainer.output_dir={out}",
    ])
    main_mod.main([
        "--config-name", "HAND_GAUSSIAN", *COMMON,
        "dataset.num_frames=2", "dataset.sample_size=20",
        "dataset.grid_res=24", "trainer.max_steps=8",
        "trainer.checkpoint_every=5", "trainer.exp_name=hand",
        f"trainer.output_dir={out}",
        "loss.losses=[rgb_loss,ssim_loss,isotropic_reg]",
        "loss.loss_weight=[0.8,0.2,0.1]",
    ])
    return out


def test_cli_training_artifacts(cli_out):
    base = os.path.join(cli_out, "manus_tpu", "synthetic")
    for exp in ("obj", "hand"):
        assert os.path.exists(os.path.join(base, exp, "config.json"))
        ckpts = os.listdir(os.path.join(base, exp, "checkpoints"))
        assert any(c.endswith(".npz") for c in ckpts)
        assert os.path.exists(
            os.path.join(base, exp, "logs", "train_metrics.csv")
        )


def test_cli_composite(cli_out):
    base = os.path.join(cli_out, "manus_tpu", "synthetic")
    main_mod.main([
        "--config-name", "COMPOSITE", *COMMON,
        "dataset.num_frames=2", "trainer.exp_name=comp",
        f"trainer.output_dir={cli_out}",
        f"hand_ckpt_dir={base}/hand/checkpoints",
        f"object_ckpt_dir={base}/obj/checkpoints",
    ])
    ours = os.path.join(base, "comp", "results", "eval_results", "ours")
    assert os.path.exists(os.path.join(ours, "acc_contacts.npy"))
    acc = np.load(os.path.join(ours, "acc_contacts.npy"))
    assert np.all(np.isfinite(acc))
    imgs = [f for f in os.listdir(ours) if f.endswith(".png")]
    assert len(imgs) == 2


def test_cli_render_path(cli_out, tmp_path):
    # generate a small camera path (Blender pkl contract)
    import pickle

    base = os.path.join(cli_out, "manus_tpu", "synthetic")
    intrs = [(80.0, 80.0, 32.0, 32.0)] * 3
    extrs = [np.hstack([np.eye(3), np.asarray([[0.0], [0.0], [1.0]])])] * 3
    path = str(tmp_path / "path.pkl")
    with open(path, "wb") as f:
        pickle.dump({"intrs": intrs, "extrs": extrs}, f)
    main_mod.main([
        "--config-name", "HAND_GAUSSIAN", *COMMON,
        "trainer.mode=render_path", "render_frames=2",
        "trainer.exp_name=novel", f"trainer.output_dir={cli_out}",
        f"camera_path={path}",
        f"render_ckpt_dir={base}/hand/checkpoints",
    ])
    assert os.path.exists(
        os.path.join(base, "novel", "results", "novel_path.mp4")
    )


def test_cli_composite_finetune(cli_out):
    """Composite fine-tuning surface (reference composite.py:27-35):
    optimize_hand=true runs the photometric fine-tune phase before
    contact capture and still produces the eval artifacts."""
    base = os.path.join(cli_out, "manus_tpu", "synthetic")
    main_mod.main([
        "--config-name", "COMPOSITE", *COMMON,
        "dataset.num_frames=2", "trainer.exp_name=compft",
        "optimize_hand=true", "finetune_steps=6",
        f"trainer.output_dir={cli_out}",
        f"hand_ckpt_dir={base}/hand/checkpoints",
        f"object_ckpt_dir={base}/obj/checkpoints",
    ])
    ours = os.path.join(base, "compft", "results", "eval_results", "ours")
    assert os.path.exists(os.path.join(ours, "acc_contacts.npy"))


def test_cli_test_modes(cli_out, tmp_path):
    """Reference TestDataset modes (brics_dynamic.py:485-696 +
    base.py:23-31,245-307): worst_cases test-on-train epoch with ranked
    json + strips video, and the canonical-pose camera-path sweep."""
    import json
    import pickle

    base = os.path.join(cli_out, "manus_tpu", "synthetic")
    # worst-cases epoch on the train dataset
    main_mod.main([
        "--config-name", "HAND_GAUSSIAN", *COMMON,
        "trainer.mode=test", "dataset.worst_cases=true",
        "dataset.num_frames=2", "dataset.grid_res=24",
        "trainer.exp_name=test_train_mode",
        f"trainer.output_dir={cli_out}",
        f"render_ckpt_dir={base}/hand/checkpoints",
    ])
    res = os.path.join(base, "test_train_mode", "results", "eval_results")
    assert os.path.exists(os.path.join(res, "test_train.mp4"))
    with open(os.path.join(res, "worst_cases.json")) as f:
        ranked = json.load(f)
    assert len(ranked) == 2
    assert ranked[0]["psnr"] <= ranked[-1]["psnr"]
    assert any(
        g.endswith("_posed.ply")
        for g in os.listdir(os.path.join(res, "gaussians"))
    )

    # canonical-pose path sweep
    intrs = [(80.0, 80.0, 32.0, 32.0)] * 2
    extrs = [np.hstack([np.eye(3), np.asarray([[0.0], [0.0], [1.0]])])] * 2
    path = str(tmp_path / "path_cano.pkl")
    with open(path, "wb") as f:
        pickle.dump({"intrs": intrs, "extrs": extrs}, f)
    main_mod.main([
        "--config-name", "HAND_GAUSSIAN", *COMMON,
        "trainer.mode=test", "dataset.test_on_canonical_pose=true",
        "render_frames=2", "trainer.exp_name=test_cano_mode",
        f"trainer.output_dir={cli_out}", f"camera_path={path}",
        f"render_ckpt_dir={base}/hand/checkpoints",
    ])
    assert os.path.exists(
        os.path.join(base, "test_cano_mode", "results", "test_cano.mp4")
    )


def test_cli_resume_from_run_dir(cli_out):
    """Resume a run by pointing --config-name at its run directory
    (reference --config-path $EXP_DIR --config-name config.yaml,
    inference_hand.sh:23-25): the snapshot supplies every override, the
    checkpoint resolves to `best`, and training continues."""
    base = os.path.join(cli_out, "manus_tpu", "synthetic")
    run_dir = os.path.join(base, "obj")
    n_ckpt = len(os.listdir(os.path.join(run_dir, "checkpoints")))
    main_mod.main([
        "--config-name", run_dir,
        # only the resume-specific refinements — the rest (scale, raster
        # backend, exp layout) comes from the snapshot (no COMMON here
        # by design); same exp_name = continue in the same run dir, so
        # checkpoint=best resolves against the previous run's checkpoints
        "trainer.max_steps=2", "trainer.checkpoint_every=0",
        "checkpoint=best",
    ])
    import json

    with open(os.path.join(run_dir, "config.json")) as f:
        snap = json.load(f)
    # values that only the obj snapshot (not defaults) could have supplied
    assert snap["dataset"]["width"] == 64
    assert snap["capacity"] == 1024
    assert snap["raster"]["backend"] == "xla"
    assert snap["trainer"]["max_steps"] == 2  # the refinement applied
    # the continued run saved its final checkpoint alongside the old ones
    assert len(os.listdir(os.path.join(run_dir, "checkpoints"))) > n_ckpt


def test_cli_make_path_roundtrip(cli_out, tmp_path):
    """In-repo camera-path generation (reference bl_render.py's role):
    make_path writes the pkl contract and render_path consumes it."""
    base = os.path.join(cli_out, "manus_tpu", "synthetic")
    path = str(tmp_path / "orbit.pkl")
    main_mod.main([
        "--config-name", "HAND_GAUSSIAN", *COMMON,
        "trainer.mode=make_path", "render_frames=4",
        f"camera_path={path}", "trainer.exp_name=mkpath",
        f"trainer.output_dir={cli_out}",
    ])
    assert os.path.exists(path)
    from manus_tpu.utils.io import load_camera_path

    cams = load_camera_path(path, 64, 64)
    assert len(cams) == 4
    # orbit cameras all look at the origin from the same distance
    centers = np.stack([np.asarray(c.camera_center) for c in cams])
    np.testing.assert_allclose(
        np.linalg.norm(centers, axis=1), 2.0, atol=1e-5
    )
    main_mod.main([
        "--config-name", "HAND_GAUSSIAN", *COMMON,
        "trainer.mode=render_path", "render_frames=2",
        "trainer.exp_name=mkpath_render", f"trainer.output_dir={cli_out}",
        f"camera_path={path}",
        f"render_ckpt_dir={base}/hand/checkpoints",
    ])
    assert os.path.exists(
        os.path.join(base, "mkpath_render", "results", "novel_path.mp4")
    )
