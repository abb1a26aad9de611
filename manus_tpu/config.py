"""Dataclass config tree with dotted CLI overrides.

Plays the role of the reference's Hydra/OmegaConf stack (SURVEY.md 5.6):
three experiment roots (object / hand / composite) composing trainer,
dataset and model options, `key.sub=value` overrides, and a config
snapshot into the run directory — without the Hydra dependency.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

from manus_tpu.models.gaussians import GaussianOpts


@dataclasses.dataclass
class TrainerConfig:
    seed: int = 42
    max_steps: int = 10000
    exp_name: str = "test"
    project: str = "manus_tpu"
    mode: str = "train"  # train | test | debug
    log_every: int = 50
    val_every: int = 1000
    checkpoint_every: int = 1000
    batch_views: int = 1  # views per step (= reference accum_iter)
    output_dir: str = "outputs"
    data_axis: int = 1  # data-parallel mesh size (1 = single chip)
    gauss_axis: int = 1  # gaussian-dim mesh size (projection/LBS sharding)
    # multi-host (parallel/distributed.py): jax.distributed bring-up + a
    # DCN-aware mesh (data axis across hosts, gauss axis inside a host)
    distributed: bool = False
    coordinator: str = ""  # coordinator_address; "" = auto-detect
    num_processes: int = -1  # -1 = auto
    process_id: int = -1  # -1 = auto
    log_losses: bool = True
    debug_nans: bool = False  # jax_debug_nans (reference anomaly detection)
    # Full validation epoch: sweep ALL held-out views x frames per val
    # (reference base.py:112-154 runs the whole val dataloader). Default
    # keeps the capped sample (2 views x <=4 frames) for cheap cadences.
    val_full_sweep: bool = False
    # Device-resident dataset cache cap (MiB; 0 = off). When the full
    # [F, V, H, W, rgb+mask] tensor fits, it is staged into HBM once and
    # per-step batches become on-device gathers — no per-step host->device
    # image transfers (the reference's pinned-memory DataLoader analogue,
    # one step further: TPU HBM is large enough to hold whole captures).
    device_cache_mb: int = 2048
    # metric sinks (reference trainer.yaml loggers + base.py:293): "csv"
    # always writes the train/val CSVs; "wandb" streams scalars when the
    # package is importable (warns and degrades to csv-only otherwise);
    # "jsonl" appends one JSON event per log step (offline TB-style feed)
    loggers: Tuple[str, ...] = ("csv",)


@dataclasses.dataclass
class DatasetConfig:
    kind: str = "synthetic"  # synthetic | brics_static | brics_dynamic
    root: str = ""
    subject: str = ""
    width: int = 128
    height: int = 128
    num_cameras: int = 20
    num_frames: int = 1  # dynamic only
    split_ratio: float = 0.1
    bg_color: str = "black"
    sample_size: int = 2000  # init points (per bone for hand)
    # hand voxel grid (defaults = consumed hand_model.yaml values,
    # reference hand_dynamic.py:49-54: ratio [1.1, 0.9, 0.65], per-axis
    # center offset [0, 0, -0.03])
    grid_res: int = 64
    grid_size: Tuple[float, float, float] = (1.1, 0.9, 0.65)
    grid_offset: Tuple[float, float, float] = (0.0, 0.0, -0.03)
    # test-epoch modes (reference TestDataset, brics_dynamic.py:485-696 +
    # base.py:23-31,245-307): trainer.mode=test consumes these
    test_on_train_dataset: bool = False  # re-render train frames w/ gt
    test_on_canonical_pose: bool = False  # path sweep at rest pose
    worst_cases: bool = False  # implies test_on_train; ranks frames by psnr
    frame_sample_rate: int = 1  # test-epoch frame subsampling


@dataclasses.dataclass
class LossConfig:
    losses: Tuple[str, ...] = ("rgb_loss", "ssim_loss", "isotropic_reg")
    loss_weight: Tuple[float, ...] = (0.8, 0.2, 0.1)
    # LPIPS weights npz (scripts/convert_lpips_weights.py). Empty + fallback
    # on -> seeded random-feature VGG16 (see train/lpips.py docstring).
    lpips_weights: str = ""
    # Separate AlexNet weights for the val/test METRIC (the reference
    # evaluates with AlexNet while training with VGG —
    # loss_utils.py:17-19). Empty + fallback on -> seeded random-feature
    # AlexNet; val_results.csv's lpips_mode column records which.
    lpips_eval_weights: str = ""
    lpips_fallback: bool = True
    # The canonical hand config turns lpips_loss on past start_lpips_iter
    # (reference base.py:333-341) — with PRETRAINED VGG features. Under
    # the random-feature fallback that term is a random-projection
    # feature loss with no evidence it helps, so the trainer strips it
    # from the TRAINING loss (the val metric column stays live) unless
    # this opt-in is set. Supplying real weights via lpips_weights makes
    # the loss live again with no knob change. (VERDICT r4 item 3.)
    lpips_random_in_loss: bool = False
    # OPT-IN perf knob (k>1 average-pools pred/gt kxk before the VGG;
    # reference runs LPIPS at full res — see losses.compute_losses)
    lpips_downsample: int = 1
    # conv engine for the VGG loss sweep:
    # auto | xla | xla_dx | xla_dx_bf16 | pallas (see utils/losses.py).
    # auto = bf16 XLA convs with the dx-only custom VJP on TPU (fastest
    # measured), fp32 XLA autodiff elsewhere.
    lpips_conv: str = "auto"
    # gt LPIPS feature-cache budget (MB). The trainer precomputes the
    # engine-matched VGG features of every device-cached gt image ONCE and
    # the train step skips the gt forward (~1/3 of the LPIPS f+b cost).
    # EXACT — the gt branch never carried gradient. Auto-disabled when over
    # budget, when the dataset device cache is off, or when
    # dataset.bg_color == "random" (gt changes per step). 0 = off.
    lpips_gt_cache_mb: int = 4096


@dataclasses.dataclass
class RasterOptions:
    tg_max: int = 64
    chunk: int = 64
    pallas_chunk: int = 128
    max_pairs_per_tile: int = 4096
    backend: str = "auto"
    lane_align: int = 128
    # Aligned pair-buffer cap as a multiple of N (0 = off). Quality-critical:
    # pairs beyond the budget drop whole trailing tile segments (highest
    # tile ids first — see binning.py; the PER-TILE max_pairs cap is the
    # farthest-first one) and are counted in the overflow diagnostic;
    # tune per experiment via `raster.pair_budget_factor=...`.
    pair_budget_factor: int = 8
    # two-tier binning: static multi-tile gaussian capacity as a fraction
    # of N (binning.py step 1). Multis beyond it keep top-left-cell
    # coverage only (overflow-counted). 1.0 = no capacity pressure.
    multi_frac: float = 1.0
    # Composite work split across the gauss mesh axis (api.py):
    #   owner     — static dealt-diagonal TILE ownership; bit-exact vs
    #               single device, but a clustered scene whose pairs
    #               concentrate in a few tiles cannot balance (a dense
    #               tile is indivisible);
    #   pairslice — each column composites an equal contiguous slice of
    #               the depth-sorted global pair array and the partial
    #               (rgb, T) segments over-compose across columns:
    #               near-perfect pair balance on ANY occupancy, at the
    #               cost of ~1e-4-bounded deviation at the transmittance
    #               termination boundary (not bit-exact).
    # Measured trade-off (scripts/balance_tpu.py, on-chip, clustered
    # 65k scene at 10/1024 tiles): owner time max/mean 1.23 with pair
    # skew 1.98; pairslice time max/mean 1.03 — but every pairslice
    # column sweeps the FULL tile grid (~1us/tile empty-tile dispatch),
    # so owner wins absolute wall time on SPARSE scenes while pairslice
    # wins when per-pair work dominates (dense captures, deep tiles).
    #   hybrid    — owner's dealt tiles PLUS the hot_split_tiles deepest
    #               tiles depth-split across columns (picked per frame by
    #               top_k on pair counts): owner's T/n sweep with
    #               pairslice's balance exactly where imbalance lives;
    #               only the split tiles carry the ~1e-4 deviation.
    tile_shard_mode: str = "owner"
    hot_split_tiles: int = 8  # "hybrid": how many deepest tiles to split


@dataclasses.dataclass
class ExperimentConfig:
    workload: str = "object"  # object | hand | composite
    capacity: int = 1 << 17  # N_max gaussian slots
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    dataset: DatasetConfig = dataclasses.field(default_factory=DatasetConfig)
    model: GaussianOpts = dataclasses.field(default_factory=GaussianOpts)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    raster: RasterOptions = dataclasses.field(default_factory=RasterOptions)
    # hand-specific
    skin_init: str = "mano_init_voxel"  # or mano_init_points
    # composite-specific
    hand_ckpt_dir: str = ""
    object_ckpt_dir: str = ""
    contact_render_type: str = "results"
    # Composite fine-tuning (reference composite.py:27-35): unfreeze one of
    # the two loaded models and continue photometric optimization on the
    # composite render before contact capture.
    optimize_hand: bool = False
    optimize_object: bool = False
    finetune_steps: int = 500
    checkpoint: Optional[str] = None
    # contact evaluation (trainer.mode=eval_contacts): directory holding
    # gt_contacts_seg/ (binary masks) + gt_contacts/ (RGBA photos)
    gt_contact_dir: str = ""
    # novel-pose generation (trainer.mode=make_pose): output pkl path
    novel_pose_path: str = ""
    # novel-view rendering (trainer.mode=render_path)
    camera_path: str = "/root/reference/data/camera_paths/real.pkl"
    render_ckpt_dir: str = ""
    render_frames: int = 60


def object_config() -> ExperimentConfig:
    """OBJ_GAUSSIAN equivalent (reference config/OBJ_GAUSSIAN.yaml +
    scripts/train/train_object.sh hyperparameters)."""
    cfg = ExperimentConfig(workload="object")
    cfg.model = dataclasses.replace(
        cfg.model, densify_grad_threshold=3e-5, sh_degree=3
    )
    cfg.loss = LossConfig(
        losses=("rgb_loss", "ssim_loss", "isotropic_reg"),
        loss_weight=(0.8, 0.2, 0.1),
    )
    cfg.trainer.max_steps = 10000
    cfg.raster = _tuned_raster(cfg.raster)
    return cfg


def _tuned_raster(raster: RasterOptions) -> RasterOptions:
    """Measured production raster settings (v5e, PARITY.md "Perf state"):
    full tg_max=64 rect coverage stays affordable because the two-tier
    binning only expands multi-tile gaussians (multi_frac capacity).

    pair_budget_factor=2: measured at flagship scale (131k/512^2, round
    3) the live pair set after the per-tile cap is IDENTICAL at 2N and 4N
    budgets (213k live, same overflow split), i.e. 2N still covers real
    scenes with ~20% headroom while the payload/binning passes scale with
    the PADDED budget — 4N paid ~2x for nothing. Overflow (`ovf=`/`far=`)
    stays a per-step diagnostic; raise for translucent/outlier scenes."""
    return dataclasses.replace(
        raster, tg_max=64, pair_budget_factor=2, multi_frac=0.25
    )


def hand_config() -> ExperimentConfig:
    """HAND_GAUSSIAN equivalent (config/HAND_GAUSSIAN.yaml +
    scripts/train/train_hands.sh)."""
    cfg = ExperimentConfig(workload="hand")
    cfg.loss = LossConfig(
        losses=("rgb_loss", "ssim_loss", "isotropic_reg", "lpips_loss"),
        loss_weight=(0.8, 0.2, 0.1, 0.1),
    )
    cfg.trainer.max_steps = 15000
    cfg.dataset.sample_size = 10000
    cfg.dataset.grid_res = 128
    cfg.raster = _tuned_raster(cfg.raster)
    return cfg


def composite_config() -> ExperimentConfig:
    cfg = ExperimentConfig(workload="composite")
    cfg.trainer.mode = "test"
    cfg.loss = LossConfig(
        losses=("rgb_loss", "ssim_loss"), loss_weight=(0.8, 0.2)
    )
    return cfg


CONFIGS = {
    "OBJ_GAUSSIAN": object_config,
    "HAND_GAUSSIAN": hand_config,
    "COMPOSITE": composite_config,
}


def _tuple_element_type(old: tuple, ftype: str):
    """Element type for a tuple override. A non-empty current value knows
    its own type; an EMPTY default must fall back to the field annotation
    (e.g. "Tuple[float, ...]") — previously old[0] was assumed to exist and
    empty-tuple overrides silently produced string tuples."""
    if old:
        return type(old[0])
    t = (ftype or "").lower()
    if "float" in t:
        return float
    if "int" in t:
        return int
    if "bool" in t:
        return lambda v: v.lower() in ("1", "true", "yes")
    return str


def _coerce(value: str, old: Any, ftype: str = "") -> Any:
    if isinstance(old, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(old, int):
        return int(value)
    if isinstance(old, float):
        return float(value)
    if isinstance(old, tuple):
        parts = [p for p in value.strip("[]()").split(",") if p]
        elt = _tuple_element_type(old, ftype)
        return tuple(elt(p.strip()) for p in parts)
    return value


def apply_overrides(cfg: ExperimentConfig, overrides: list[str]) -> ExperimentConfig:
    """Apply `a.b.c=value` dotted overrides in place (dataclasses are
    mutable here by design, mirroring Hydra CLI ergonomics)."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        key, value = ov.split("=", 1)
        parts = key.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        leaf = parts[-1]
        old = getattr(obj, leaf)
        if dataclasses.is_dataclass(obj) and obj.__dataclass_fields__[leaf].type:
            new = _coerce(value, old, str(obj.__dataclass_fields__[leaf].type))
        else:
            new = value
        try:
            object.__setattr__(obj, leaf, new)
        except Exception:
            setattr(obj, leaf, new)
    return cfg


def config_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def save_config(cfg: ExperimentConfig, path: str):
    with open(path, "w") as f:
        json.dump(config_to_dict(cfg), f, indent=2, default=str)


def _apply_dict(obj, data: dict):
    """Recursively restore a dataclass tree from a config_to_dict dict
    (tuples come back as JSON lists; nested dataclasses as dicts).
    Unknown keys are ignored so old snapshots keep loading after config
    fields are added."""
    for key, val in data.items():
        if not hasattr(obj, key):
            continue
        cur = getattr(obj, key)
        if dataclasses.is_dataclass(cur) and isinstance(val, dict):
            _apply_dict(cur, val)
            continue
        if isinstance(cur, tuple) and isinstance(val, list):
            val = tuple(val)
        try:
            object.__setattr__(obj, key, val)
        except Exception:
            setattr(obj, key, val)
    return obj


def load_config_snapshot(path: str) -> ExperimentConfig:
    """Resume a run from its config.json snapshot (the reference resumes
    with `--config-path $EXP_DIR --config-name config.yaml`,
    /root/reference/scripts/train/inference_hand.sh:23-25). Accepts the
    snapshot file or the run directory containing it."""
    if os.path.isdir(path):
        path = os.path.join(path, "config.json")
    with open(path) as f:
        data = json.load(f)
    cfg = ExperimentConfig()
    return _apply_dict(cfg, data)
