"""LPIPS perceptual loss (VGG16 backbone) in pure JAX.

The reference uses the `lpips` package (AlexNet for eval metrics, VGG as a
training loss after step 1000 — loss_utils.py:17-19, base.py:333-341).
This module implements the same computation: VGG16 conv features at the 5
ReLU stages, unit-normalised along channels, squared differences reduced
by learned 1x1 linear heads, spatially averaged and summed over stages.

Pretrained weights cannot ship in this offline environment; load them from
an .npz via `load_lpips_params` (keys: conv{i}_{j}_w/b, lin{k}_w) produced
by scripts/convert_lpips_weights.py wherever torchvision+lpips exist. When
no weights file is configured, `resolve_lpips_params` falls back to a
DETERMINISTIC random-feature VGG (seeded He init): random convolutional
features are a known-serviceable perceptual distance (they still measure
multi-scale structural disagreement), so the lpips_loss term trains and the
val metric is nonzero — but values are NOT comparable with published LPIPS
numbers until real weights are supplied. The fallback logs a loud warning.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, layers) per stage
VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    """NHWC conv, 3x3, SAME, + bias."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + b


def vgg16_features(params: dict, x: jax.Array) -> list[jax.Array]:
    """x: [N, H, W, 3] in [-1, 1] (LPIPS convention). Returns the 5 post-ReLU
    stage outputs."""
    x = (x - jnp.asarray(SHIFT)) / jnp.asarray(SCALE)
    feats = []
    for si, (_, n_layers) in enumerate(VGG_STAGES):
        for li in range(n_layers):
            w = params[f"conv{si}_{li}_w"]
            b = params[f"conv{si}_{li}_b"]
            x = jax.nn.relu(_conv(x, w, b))
        feats.append(x)
        if si < len(VGG_STAGES) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips_distance(params: dict, img1: jax.Array, img2: jax.Array) -> jax.Array:
    """img1/img2: [H, W, 3] in [0, 1]. Returns scalar LPIPS distance."""
    x1 = (img1[None] * 2.0 - 1.0).astype(jnp.float32)
    x2 = (img2[None] * 2.0 - 1.0).astype(jnp.float32)
    f1 = vgg16_features(params, x1)
    f2 = vgg16_features(params, x2)
    total = jnp.asarray(0.0)
    for k, (a, b) in enumerate(zip(f1, f2)):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
        diff = (a - b) ** 2
        lin = params[f"lin{k}_w"]  # [C] nonnegative 1x1 head
        total = total + jnp.mean(jnp.sum(diff * lin[None, None, None, :], -1))
    return total


def load_lpips_params(path: str) -> Optional[dict]:
    """Load LPIPS VGG weights from an npz. Returns None if unavailable."""
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def resolve_lpips_params(
    weights_path: str,
    allow_fallback: bool = True,
    seed: int = 0,
    log=print,
) -> Optional[dict]:
    """Trainer entry point: pretrained npz if available, else the seeded
    random-feature fallback (see module docstring), else None (disabled)."""
    params = load_lpips_params(weights_path)
    if params is not None:
        log(f"[lpips] loaded pretrained VGG16 weights from {weights_path}")
        return params
    if allow_fallback:
        log(
            "[lpips] WARNING: no pretrained weights "
            f"({weights_path or 'loss.lpips_weights unset'}); using seeded "
            "random-feature VGG16. The loss is live but values are not "
            "comparable with published LPIPS — convert real weights via "
            "scripts/convert_lpips_weights.py."
        )
        return random_lpips_params(seed)
    log("[lpips] disabled: no weights and fallback off — lpips_loss is 0")
    return None


def random_lpips_params(seed: int = 0) -> dict:
    """Seeded He-init VGG16 — the random-feature perceptual fallback used
    by resolve_lpips_params when pretrained weights are unavailable."""
    rng = np.random.RandomState(seed)
    params = {}
    c_in = 3
    for si, (c_out, n_layers) in enumerate(VGG_STAGES):
        for li in range(n_layers):
            fan = 3 * 3 * c_in
            params[f"conv{si}_{li}_w"] = jnp.asarray(
                rng.normal(0, np.sqrt(2.0 / fan), (3, 3, c_in, c_out)),
                jnp.float32,
            )
            params[f"conv{si}_{li}_b"] = jnp.zeros((c_out,), jnp.float32)
            c_in = c_out
        params[f"lin{si}_w"] = jnp.asarray(
            rng.uniform(0, 1, (c_out,)) / c_out, jnp.float32
        )
    return params
