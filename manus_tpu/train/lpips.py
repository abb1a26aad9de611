"""LPIPS perceptual distance (VGG16 + AlexNet backbones) in pure JAX.

The reference uses the `lpips` package with TWO nets: AlexNet for the
val/test metric and VGG as the training loss after step 1000
(/root/reference/src/utils/loss_utils.py:17-19, base.py:333-341). This
module implements both: backbone conv features at the 5 ReLU stages,
unit-normalised along channels, squared differences reduced by learned
1x1 linear heads, spatially averaged and summed over stages.

Pretrained weights cannot ship in this offline environment; load them from
an .npz via `load_lpips_params` (keys: conv{i}_{j}_w/b, lin{k}_w) produced
by scripts/convert_lpips_weights.py wherever torchvision+lpips exist. When
no weights file is configured, `resolve_lpips_params` falls back to a
DETERMINISTIC random-feature net (seeded He init): random convolutional
features are a known-serviceable perceptual distance (they still measure
multi-scale structural disagreement), so the lpips_loss term trains and the
val metric is nonzero — but values are NOT comparable with published LPIPS
numbers until real weights are supplied. The fallback logs a loud warning,
and the trainer writes the mode into val_results.csv (`lpips_mode` column)
so fallback values can never be mistaken for real LPIPS.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Per-stage conv plans. Each stage is a list of conv specs
# (out_channels, kernel, stride, pad); `pool` is the pooling window/stride
# applied BEFORE every stage except the first. LPIPS taps the post-ReLU
# output of each stage.
# VGG16: 5 blocks of 3x3 convs, 2x2/2 maxpool between blocks.
VGG_PLAN = dict(
    stages=[
        [(64, 3, 1, 1)] * 2,
        [(128, 3, 1, 1)] * 2,
        [(256, 3, 1, 1)] * 3,
        [(512, 3, 1, 1)] * 3,
        [(512, 3, 1, 1)] * 3,
    ],
    pool=(2, 2),
    pool_before=(1, 2, 3, 4),
)
# AlexNet (torchvision features[0..11], the slices lpips.alexnet uses):
# conv1 11x11/4 p2 -> pool3/2 -> conv2 5x5 p2 -> pool3/2 -> conv3..5 3x3 p1
ALEX_PLAN = dict(
    stages=[
        [(64, 11, 4, 2)],
        [(192, 5, 1, 2)],
        [(384, 3, 1, 1)],
        [(256, 3, 1, 1)],
        [(256, 3, 1, 1)],
    ],
    pool=(3, 2),
    pool_before=(1, 2),
)
PLANS = {"vgg": VGG_PLAN, "alex": ALEX_PLAN}

# legacy alias (round-2 code/tests import VGG_STAGES)
VGG_STAGES = tuple((s[0][0], len(s)) for s in VGG_PLAN["stages"])

SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def infer_arch(params: dict) -> str:
    """Arch from the key scheme: VGG16's first stage has two convs
    (conv0_1_w exists), AlexNet's stages are single-conv."""
    return "vgg" if "conv0_1_w" in params else "alex"


def _conv(x, w, b, stride: int, pad: int):
    """NHWC conv + bias with explicit symmetric padding."""
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def backbone_features(params: dict, x: jax.Array, arch: str) -> list:
    """x: [N, H, W, 3] in [-1, 1] (LPIPS convention). Returns the 5
    post-ReLU stage outputs of the chosen backbone."""
    plan = PLANS[arch]
    x = (x - jnp.asarray(SHIFT)) / jnp.asarray(SCALE)
    pk, ps = plan["pool"]
    feats = []
    for si, stage in enumerate(plan["stages"]):
        if si in plan["pool_before"]:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, pk, pk, 1), (1, ps, ps, 1),
                "VALID",
            )
        for li, (_, _, stride, pad) in enumerate(stage):
            w = params[f"conv{si}_{li}_w"]
            b = params[f"conv{si}_{li}_b"]
            x = jax.nn.relu(_conv(x, w, b, stride, pad))
        feats.append(x)
    return feats


def vgg16_features(params: dict, x: jax.Array) -> list:
    return backbone_features(params, x, "vgg")


def _lpips_head(params: dict, f1: list, f2: list) -> jax.Array:
    """Unit-normalise stage features, squared diff, learned 1x1 heads,
    spatial mean, sum over stages (fp32 regardless of feature dtype)."""
    total = jnp.asarray(0.0)
    for k, (a, b) in enumerate(zip(f1, f2)):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        diff = (a - b) ** 2
        lin = params[f"lin{k}_w"]  # [C] nonnegative 1x1 head
        total = total + jnp.mean(jnp.sum(diff * lin, -1))
    return total


def lpips_distance(params: dict, img1: jax.Array, img2: jax.Array) -> jax.Array:
    """img1/img2: [H, W, 3] in [0, 1]. Returns scalar LPIPS distance using
    whichever backbone the params encode (VGG16 loss net or AlexNet eval
    net — reference loss_utils.py:17-19)."""
    arch = infer_arch(params)
    x1 = (img1[None] * 2.0 - 1.0).astype(jnp.float32)
    x2 = (img2[None] * 2.0 - 1.0).astype(jnp.float32)
    f1 = backbone_features(params, x1, arch)
    f2 = backbone_features(params, x2, arch)
    return _lpips_head(params, f1, f2)


def vgg16_features_pallas(params: dict, x: jax.Array,
                          interpret=None) -> list:
    """VGG16 stage features via the implicit-GEMM Pallas conv stack
    (ops/conv_pallas.py): bf16 MXU matmuls with fp32 accumulation, fused
    bias+ReLU, reshape-max pools. x: [H, W, 3] in [-1, 1] (no batch dim)."""
    from manus_tpu.ops.conv_pallas import make_lpips_conv, maxpool2x2

    x = (x - jnp.asarray(SHIFT)) / jnp.asarray(SCALE)
    feats = []
    for si, stage in enumerate(VGG_PLAN["stages"]):
        if si in VGG_PLAN["pool_before"]:
            x = maxpool2x2(x)
        for li in range(len(stage)):
            conv = make_lpips_conv(
                params[f"conv{si}_{li}_w"], params[f"conv{si}_{li}_b"],
                relu=True, interpret=interpret,
            )
            x = conv(x)
        feats.append(x)
    return feats


def lpips_distance_pallas(params: dict, img1: jax.Array, img2: jax.Array,
                          interpret=None) -> jax.Array:
    """lpips_distance with the VGG16 backbone on the Pallas conv stack —
    the training-loss hot path (the reference pays the same sweeps through
    cuDNN, loss_utils.py:111-117). bf16 features, fp32 head; values agree
    with the XLA path to bf16 tolerance (tests/test_conv_pallas.py).
    VGG-keyed params only."""
    assert infer_arch(params) == "vgg", "pallas LPIPS path is VGG-only"
    x1 = img1 * 2.0 - 1.0
    x2 = img2 * 2.0 - 1.0
    f1 = vgg16_features_pallas(params, x1, interpret)
    f2 = vgg16_features_pallas(params, x2, interpret)
    return _lpips_head(params, f1, f2)


def load_lpips_params(path: str) -> Optional[dict]:
    """Load LPIPS backbone weights from an npz. Returns None if unavailable."""
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def resolve_lpips_params(
    weights_path: str,
    allow_fallback: bool = True,
    seed: int = 0,
    log=print,
    arch: str = "vgg",
):
    """Trainer entry point: pretrained npz if available, else the seeded
    random-feature fallback (see module docstring), else None (disabled).

    Returns (params, mode) when called via `resolve_lpips_params_mode`;
    this function returns params only (back-compat)."""
    params, _ = resolve_lpips_params_mode(
        weights_path, allow_fallback, seed, log, arch
    )
    return params


def resolve_lpips_params_mode(
    weights_path: str,
    allow_fallback: bool = True,
    seed: int = 0,
    log=print,
    arch: str = "vgg",
):
    """Like resolve_lpips_params but also returns the provenance mode
    string written to val_results.csv: "<arch>:pretrained",
    "<arch>:random-feature", or "off"."""
    params = load_lpips_params(weights_path)
    if params is not None:
        arch = infer_arch(params)
        log(f"[lpips] loaded pretrained {arch} weights from {weights_path}")
        return params, f"{arch}:pretrained"
    if allow_fallback:
        log(
            f"[lpips] WARNING: no pretrained weights "
            f"({weights_path or 'weights path unset'}); using seeded "
            f"random-feature {arch}. The metric/loss is live but values "
            "are NOT comparable with published LPIPS — convert real "
            "weights via scripts/convert_lpips_weights.py. val_results.csv "
            "marks these rows lpips_mode=random-feature."
        )
        return random_lpips_params(seed, arch), f"{arch}:random-feature"
    log("[lpips] disabled: no weights and fallback off — lpips is 0")
    return None, "off"


def random_lpips_params(seed: int = 0, arch: str = "vgg") -> dict:
    """Seeded He-init backbone — the random-feature perceptual fallback
    used by resolve_lpips_params when pretrained weights are unavailable."""
    rng = np.random.RandomState(seed)
    params = {}
    c_in = 3
    for si, stage in enumerate(PLANS[arch]["stages"]):
        for li, (c_out, k, _, _) in enumerate(stage):
            fan = k * k * c_in
            params[f"conv{si}_{li}_w"] = jnp.asarray(
                rng.normal(0, np.sqrt(2.0 / fan), (k, k, c_in, c_out)),
                jnp.float32,
            )
            params[f"conv{si}_{li}_b"] = jnp.zeros((c_out,), jnp.float32)
            c_in = c_out
        params[f"lin{si}_w"] = jnp.asarray(
            rng.uniform(0, 1, (c_in,)) / c_in, jnp.float32
        )
    return params
