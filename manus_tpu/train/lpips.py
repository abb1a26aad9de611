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


# --- dx-only XLA conv engine -------------------------------------------------
# XLA's FORWARD conv lowering is fast on TPU, but the dx conv its autodiff
# emits (transposed dimension numbers + reversed windows) is several times
# slower than a forward conv — that gap, not the fp32 MXU roof, dominated
# the measured LPIPS f+b cost. For a stride-1 SAME 3x3 conv, dx is exactly
# a FORWARD-form conv with spatially-flipped, channel-transposed weights,
# so a custom VJP makes the backward cost equal the forward's. LPIPS
# weights are frozen (dw/db symbolic-zero), same contract as the pallas
# engine in ops/conv_pallas.py.

import functools as _functools


def _conv3x3_xla_raw(x, w, b, relu, dtype):
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(dtype)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3x3_xla(x, w, b, relu: bool, dtype):
    """[1, H, W, Ci] stride-1 SAME 3x3 conv + bias (+ReLU), activations in
    `dtype` (bf16 halves feature traffic; accumulation fp32 either way),
    dx-only custom VJP."""
    return _conv3x3_xla_raw(x, w, b, relu, dtype)


def _conv3x3_xla_fwd(x, w, b, relu, dtype):
    y = _conv3x3_xla_raw(x, w, b, relu, dtype)
    return y, (y, w, jnp.zeros((), x.dtype))


def _conv3x3_xla_bwd(relu, dtype, res, g):
    y, w, x_dt = res
    if relu:
        g = jnp.where(y > 0, g, jnp.zeros((), g.dtype))
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(
        g.astype(dtype), w_t.astype(dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (dx.astype(x_dt.dtype), jnp.zeros_like(w),
            jnp.zeros((w.shape[-1],), jnp.float32))


_conv3x3_xla.defvjp(_conv3x3_xla_fwd, _conv3x3_xla_bwd)


def vgg16_features_xla_dx(params: dict, x: jax.Array,
                          dtype=jnp.float32) -> list:
    """VGG16 stage features with XLA forward convs and the dx-only custom
    VJP above. x: [H, W, 3] in [-1, 1] (no batch dim). VGG only (stride-1
    pad-1 is what makes dx a forward-form conv)."""
    x = ((x - jnp.asarray(SHIFT)) / jnp.asarray(SCALE))[None].astype(dtype)
    feats = []
    for si, stage in enumerate(VGG_PLAN["stages"]):
        if si in VGG_PLAN["pool_before"]:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
        for li in range(len(stage)):
            x = _conv3x3_xla(
                x, params[f"conv{si}_{li}_w"], params[f"conv{si}_{li}_b"],
                True, dtype,
            )
        feats.append(x)
    return feats


def lpips_distance_xla_dx(params: dict, img1: jax.Array, img2: jax.Array,
                          dtype=jnp.float32) -> jax.Array:
    """lpips_distance on the dx-only XLA conv engine. dtype=bf16 runs the
    conv stack at the bf16 MXU rate with fp32 accumulation (values agree
    with fp32 to bf16 tolerance)."""
    assert infer_arch(params) == "vgg", "xla_dx LPIPS path is VGG-only"
    f1 = vgg16_features_xla_dx(params, img1 * 2.0 - 1.0, dtype)
    f2 = vgg16_features_xla_dx(params, img2 * 2.0 - 1.0, dtype)
    return _lpips_head_rows(params, f1, f2)


_HEAD_EPS = 1e-10


def _head_stage_math(a, b, lin, inv_npix):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    na = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + _HEAD_EPS)
    nb = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + _HEAD_EPS)
    return jnp.sum((na - nb) ** 2 * lin) * inv_npix


@jax.custom_vjp
def _head_stage(a, b, lin, inv_npix):
    """One LPIPS head stage: channel-unit-normalise a and b, squared diff,
    nonnegative 1x1 head `lin`, spatial mean (sum * inv_npix).

    Custom VJP with the closed-form normalize gradient: XLA autodiff of
    the normalize chain materialises several full-feature-map passes
    (measured ~3.2 ms of the 512^2 LPIPS f+b); the closed form recomputes
    the norms in ONE fused backward pass per stage:
      d/da = c * [ g/(r_a+eps) - a (a.g) / (r_a (r_a+eps)^2) ],
      g = 2 lin (n_a - n_b),  c = cotangent * inv_npix   (db symmetric).
    """
    return _head_stage_math(a, b, lin, inv_npix)


def _head_stage_fwd(a, b, lin, inv_npix):
    return _head_stage_math(a, b, lin, inv_npix), (a, b, lin, inv_npix)


def _head_stage_bwd(res, ct):
    a32, b32, lin, inv_npix = res
    a = a32.astype(jnp.float32)
    b = b32.astype(jnp.float32)
    ra = jnp.linalg.norm(a, axis=-1, keepdims=True)
    rb = jnp.linalg.norm(b, axis=-1, keepdims=True)
    na = a / (ra + _HEAD_EPS)
    nb = b / (rb + _HEAD_EPS)
    g = 2.0 * lin * (na - nb)  # [..., C]
    c = ct * inv_npix

    def d_normed(x, r, gg):
        # d/dx [x/(||x||+eps)] applied to gg, with the zero-vector guard
        # (zero features produce zero cotangents upstream anyway)
        dot = jnp.sum(x * gg, axis=-1, keepdims=True)
        safe_r = jnp.where(r > 0, r, 1.0)
        return gg / (r + _HEAD_EPS) - x * (
            dot / (safe_r * (r + _HEAD_EPS) ** 2)
        )

    da = (c * d_normed(a, ra, g)).astype(a32.dtype)
    db = (-c * d_normed(b, rb, g)).astype(b32.dtype)
    return da, db, jnp.zeros_like(lin), jnp.zeros((), jnp.float32)


_head_stage.defvjp(_head_stage_fwd, _head_stage_bwd)


def _lpips_head(params: dict, f1: list, f2: list) -> jax.Array:
    """Unit-normalise stage features, squared diff, learned 1x1 heads,
    spatial mean, sum over stages (fp32 regardless of feature dtype).
    Each stage runs through the fused custom-VJP _head_stage."""
    total = jnp.asarray(0.0)
    for k, (a, b) in enumerate(zip(f1, f2)):
        lin = params[f"lin{k}_w"]  # [C] nonnegative 1x1 head
        npix = float(np.prod(a.shape[:-1]))
        total = total + _head_stage(a, b, lin, 1.0 / npix)
    return total


def _head_stage_rows(a, b, lin, inv_npix, interpret=None):
    """_head_stage through the fused Pallas row kernel
    (ops/conv_pallas.head_stage_layout): [..., C] features flatten to
    rows, padded to a multiple of 8 with zero rows (zero norm, zero
    contribution; their cotangents are sliced off by the surrounding
    pad's autodiff). One read of a+b forward, one fused backward —
    the XLA head costs several fp32 feature-map passes per stage."""
    from manus_tpu.ops.conv_pallas import head_stage_layout

    c = a.shape[-1]
    ar = a.reshape(-1, c)
    br = b.reshape(-1, c)
    pad = (-ar.shape[0]) % 8
    if pad:
        ar = jnp.pad(ar, ((0, pad), (0, 0)))
        br = jnp.pad(br, ((0, pad), (0, 0)))
    lin_eff = (lin.astype(jnp.float32) * inv_npix).reshape(1, -1)
    return head_stage_layout(ar, br, lin_eff, interpret)


def _lpips_head_rows(params: dict, f1: list, f2: list,
                     interpret=None) -> jax.Array:
    """_lpips_head on the fused Pallas row kernel (same math)."""
    total = jnp.asarray(0.0)
    for k, (a, b) in enumerate(zip(f1, f2)):
        lin = params[f"lin{k}_w"]
        npix = float(np.prod(a.shape[:-1]))
        total = total + _head_stage_rows(a, b, lin, 1.0 / npix, interpret)
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


def _vgg_stage_layouts(h: int, w: int) -> list:
    """One StageLayout per VGG stage for an HxW input (static geometry)."""
    from manus_tpu.ops.conv_pallas import StageLayout

    layouts = []
    for si, stage in enumerate(VGG_PLAN["stages"]):
        if si in VGG_PLAN["pool_before"]:
            h, w = h // 2, w // 2
        c_max = max(c for c, *_ in stage)
        layouts.append(StageLayout(h, w, max(c_max, 128)))
    return layouts


def vgg16_features_pallas(params: dict, x: jax.Array,
                          interpret=None) -> list:
    """VGG16 stage features via the layout-persistent implicit-GEMM Pallas
    conv chain (ops/conv_pallas.py): bf16 MXU matmuls with fp32
    accumulation, fused bias+ReLU+border-masking; feature maps stay in the
    flat padded layout between convs so the only XLA glue is at the 4
    inter-stage maxpools. x: [H, W, 3] in [-1, 1] (no batch dim).

    Returns the 5 stage features as LAYOUT pairs [(feat, StageLayout),
    ...]; use `manus_tpu.ops.conv_pallas.unlayout(feat, L)` for [H, W, C]
    tensors."""
    from manus_tpu.ops.conv_pallas import (
        build_layout, conv3x3_layout, maxpool2x2_layout,
    )

    x = (x - jnp.asarray(SHIFT)) / jnp.asarray(SCALE)
    layouts = _vgg_stage_layouts(x.shape[0], x.shape[1])
    feats = []
    xl = None
    for si, stage in enumerate(VGG_PLAN["stages"]):
        L = layouts[si]
        if si in VGG_PLAN["pool_before"]:
            # direct layout->layout pool: no junk-column slice/pad copies
            xl = maxpool2x2_layout(xl, layouts[si - 1], L)
        elif xl is None:
            xl = build_layout(x, L)
        for li in range(len(stage)):
            xl = conv3x3_layout(
                xl, params[f"conv{si}_{li}_w"], params[f"conv{si}_{li}_b"],
                True, L, interpret,
            )
        feats.append((xl, L))
    return feats


def _lpips_head_layout(params: dict, f1: list, f2: list,
                       interpret=None) -> jax.Array:
    """LPIPS head on layout-form stage features: identical math to
    _lpips_head — border/junk rows and padding lanes are zero in BOTH
    feature sets so they contribute nothing, and the spatial mean divides
    by the true H*W (folded into the lin scaling; the head is linear in
    lin). Runs as a fused row-blocked Pallas pass per stage
    (ops/conv_pallas.head_stage_layout): one read of a+b forward, one
    backward."""
    from manus_tpu.ops.conv_pallas import head_stage_layout

    total = jnp.asarray(0.0)
    for k, ((a, L), (b, _)) in enumerate(zip(f1, f2)):
        lin = params[f"lin{k}_w"]  # [C] nonnegative 1x1 head
        lin = jnp.pad(lin, (0, a.shape[-1] - lin.shape[0]))
        lin_eff = (lin / float(L.h * L.w)).reshape(1, -1)
        total = total + head_stage_layout(a, b, lin_eff, interpret)
    return total


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
    return _lpips_head_layout(params, f1, f2, interpret)


# --- cached-gt LPIPS ---------------------------------------------------------
# The gt image of a (frame, view) never changes during training (unless the
# background is re-randomised per step), so its backbone features can be
# computed ONCE per image and reused every step: the gt forward is ~1/3 of
# the per-step LPIPS f+b cost (pred fwd + pred dx bwd + gt fwd). This is
# EXACT — the cached features are the same values the engine would have
# recomputed — not an approximation. The trainer builds the cache alongside
# its device-resident dataset cache (trainer._build_lpips_feat_cache).


def resolve_lpips_engine(lpips_conv: str, params: dict) -> str:
    """Conv-engine resolution shared by compute_losses and the trainer's
    gt-feature cache: 'auto' = the measured-fastest engine on TPU for VGG
    params, fp32 XLA autodiff elsewhere. Round-4 SAME-SESSION A/B
    (scripts/profile_lpips_stages.py, v5e, 512^2, 20-iter chains):
    layout-persistent Pallas chain 11.65 ms f+b vs xla_dx_bf16 14.63 ms —
    the round-3 cross-session numbers (13.5 vs 11.9) had the order
    reversed; tunnel throughput swings between sessions, so only
    same-session comparisons count (PARITY.md). The cache MUST be built
    with the same engine the loss uses: feature values (and layouts, for
    pallas) differ across engines."""
    if lpips_conv != "auto":
        return lpips_conv
    return (
        "pallas"
        if jax.default_backend() == "tpu" and infer_arch(params) == "vgg"
        else "xla"
    )


def pool_avg(img: jax.Array, k: int) -> jax.Array:
    """k x k average pool of [H, W, C] (the loss.lpips_downsample knob).
    Shared by compute_losses and the gt-feature cache so the cached
    features always match the loss's pooled inputs."""
    if k <= 1:
        return img
    h, w = img.shape[0] // k * k, img.shape[1] // k * k
    return img[:h, :w].reshape(
        h // k, k, w // k, k, img.shape[2]
    ).mean(axis=(1, 3))


def lpips_features(params: dict, img: jax.Array, engine: str,
                   interpret=None) -> list:
    """Engine-matched backbone stage features of img ([H, W, 3] in [0, 1]),
    batch dims stripped. For the 'pallas' engine the entries are layout
    arrays (their StageLayouts are static functions of the image shape)."""
    x = img * 2.0 - 1.0
    if engine == "pallas":
        return [f for f, _ in vgg16_features_pallas(params, x, interpret)]
    if engine == "xla_dx":
        return [f[0] for f in vgg16_features_xla_dx(params, x, jnp.float32)]
    if engine == "xla_dx_bf16":
        return [f[0] for f in vgg16_features_xla_dx(params, x, jnp.bfloat16)]
    return [f[0] for f in backbone_features(
        params, x[None].astype(jnp.float32), infer_arch(params)
    )]


def lpips_distance_cached(params: dict, img1: jax.Array, gt_feats: list,
                          engine: str, interpret=None) -> jax.Array:
    """LPIPS distance between img1 and a gt whose engine-matched features
    were precomputed by lpips_features. No gradient ever flowed to the gt
    branch, so this changes nothing but the cost."""
    gt_feats = [jax.lax.stop_gradient(f) for f in gt_feats]
    x1 = img1 * 2.0 - 1.0
    if engine == "pallas":
        f1 = vgg16_features_pallas(params, x1, interpret)
        layouts = [L for _, L in f1]
        return _lpips_head_layout(
            params, f1, list(zip(gt_feats, layouts)), interpret
        )
    if engine in ("xla_dx", "xla_dx_bf16"):
        dt = jnp.bfloat16 if engine == "xla_dx_bf16" else jnp.float32
        f1 = [f[0] for f in vgg16_features_xla_dx(params, x1, dt)]
        return _lpips_head_rows(params, f1, gt_feats, interpret)
    f1 = [f[0] for f in backbone_features(
        params, x1[None].astype(jnp.float32), infer_arch(params)
    )]
    return _lpips_head(params, f1, gt_feats)


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
