"""Image losses and metrics: L1/L2, windowed SSIM, PSNR, isotropy regularizer.

Numerics match /root/reference/src/utils/loss_utils.py (Gaussian 11x11
window, sigma 1.5, C1=0.01^2, C2=0.03^2, same zero padding) so PSNR/SSIM
numbers are comparable with the reference runs. Images are [H, W, C] (the
layout our renderer emits) or [..., H, W, C].
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jax.Array, gt: jax.Array, mean: bool = True) -> jax.Array:
    loss = jnp.abs(pred - gt)
    return loss.mean() if mean else loss


def l2_loss(pred: jax.Array, gt: jax.Array, mean: bool = True) -> jax.Array:
    loss = (pred - gt) ** 2
    return loss.mean() if mean else loss


def psnr(pred: jax.Array, gt: jax.Array, valid_mask=None) -> jax.Array:
    """-10 log10(MSE). Matches reference loss_utils.py:100-108."""
    value = (pred - gt) ** 2
    if valid_mask is not None:
        value = jnp.where(valid_mask, value, 0.0)
        denom = jnp.maximum(jnp.sum(valid_mask), 1)
        mse = jnp.sum(value) / denom
    else:
        mse = jnp.mean(value)
    return -10.0 * jnp.log10(mse)


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    """Normalised 1D Gaussian kernel (loss_utils.py:38-54); the 2D window
    is its outer product, applied separably."""
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2)
    )
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _banded_blur_matrix(size: int, window_size: int, sigma: float) -> np.ndarray:
    """[size, size] banded Toeplitz matrix applying the 1D Gaussian with
    zero padding (rows near the border simply see fewer taps)."""
    g = _gaussian_window(window_size, sigma)
    half = window_size // 2
    m = np.zeros((size, size), np.float32)
    for off in range(-half, half + 1):
        diag = np.full(size - abs(off), g[off + half], np.float32)
        m += np.diag(diag, k=off)
    return m


def _depthwise_blur(img: jax.Array, window_size: int, sigma: float) -> jax.Array:
    """Per-channel separable Gaussian blur with zero padding ws//2.

    img: [H, W, C]. Runs as two banded-Toeplitz matmuls (rows then
    columns) — depthwise convs lower poorly on the MXU (~7ms fwd+bwd per
    SSIM at 512^2) while these are ordinary [512,512] matmuls.
    """
    h, w, _ = img.shape
    bw = jnp.asarray(_banded_blur_matrix(w, window_size, sigma))
    bh = jnp.asarray(_banded_blur_matrix(h, window_size, sigma))
    hi = jax.lax.Precision.HIGHEST
    out = jnp.einsum("hwc,wv->hvc", img, bw, precision=hi)
    out = jnp.einsum("hwc,hu->uwc", out, bh, precision=hi)
    return out


def ssim(
    img1: jax.Array, img2: jax.Array, window_size: int = 11, sigma: float = 1.5
) -> jax.Array:
    """Mean SSIM over the image, reference semantics (loss_utils.py:57-97).

    img1/img2: [H, W, C] in [0, 1].
    """
    mu1 = _depthwise_blur(img1, window_size, sigma)
    mu2 = _depthwise_blur(img2, window_size, sigma)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, window_size, sigma) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window_size, sigma) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window_size, sigma) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return ssim_map.mean()


def isotropic_regularizer(
    scaling: jax.Array, condition_number: float, active=None
) -> jax.Array:
    """mean((min_scale/max_scale - target_condition)^2) over active slots.

    Matches reference base.py:349-356. scaling: [N, 3] activated scales.
    """
    max_scale = jnp.max(scaling, axis=1)
    min_scale = jnp.min(scaling, axis=1)
    per_pt = (min_scale / (max_scale + 1e-8) - condition_number) ** 2
    if active is None:
        return per_pt.mean()
    per_pt = jnp.where(active, per_pt, 0.0)
    return jnp.sum(per_pt) / jnp.maximum(jnp.sum(active), 1)


def compute_losses(
    pred_image: jax.Array,
    gt_image: jax.Array,
    scaling: jax.Array,
    active: jax.Array,
    loss_names: tuple,
    loss_weights: tuple,
    condition_number: float = 0.4,
    lpips_params: dict | None = None,
    lpips_enabled: jax.Array | None = None,
    lpips_downsample: int = 1,
    lpips_conv: str = "auto",
    lpips_gt_feats: list | None = None,
) -> tuple[jax.Array, dict]:
    """Weighted multi-loss as in reference base.py:323-365.

    Returns (total, per_loss_dict). loss_names/weights are static tuples.
    lpips_params: VGG16 weight pytree (train/lpips.py); lpips_enabled is a
    traced bool implementing the reference's start_lpips_iter gate
    (base.py:333-341) — lax.cond skips the VGG forward before the gate.
    lpips_downsample k>1 average-pools pred/gt kxk before the VGG — an
    OPT-IN deviation from the reference (which runs LPIPS at full
    resolution): the batch-1 VGG f+b costs ~14.5 ms at 512^2 on v5e and
    scales ~1/k^2.
    lpips_gt_feats: precomputed engine-matched gt stage features
    (train/lpips.lpips_features, built by the trainer's gt-feature cache);
    when given, the gt forward is skipped — EXACT, not an approximation
    (the gt branch never carried gradient). Must match the resolved engine
    and the lpips_downsample setting.
    """
    losses = {}
    for name in loss_names:
        if name == "rgb_loss":
            losses[name] = l1_loss(pred_image, gt_image)
        elif name == "l2_loss":
            losses[name] = l2_loss(pred_image, gt_image)
        elif name == "ssim_loss":
            losses[name] = 1.0 - ssim(pred_image, gt_image)
        elif name == "isotropic_reg":
            losses[name] = isotropic_regularizer(scaling, condition_number, active)
        elif name == "lpips_loss":
            if lpips_params is None:
                # No weights resolved (trainer warned): zero contribution.
                losses[name] = jnp.asarray(0.0, pred_image.dtype)
            else:
                from manus_tpu.train.lpips import (
                    lpips_distance, lpips_distance_cached,
                    lpips_distance_pallas, lpips_distance_xla_dx, pool_avg,
                    resolve_lpips_engine,
                )

                # Conv engine for the VGG sweep (all engines share the
                # fused custom-VJP head; measured at 512^2 on v5e, see
                # PARITY.md round-3 notes):
                #   "xla"         fp32 conv_general_dilated, autodiff dx
                #   "xla_dx"      fp32 XLA convs, dx-only custom VJP
                #   "xla_dx_bf16" bf16 XLA convs (fp32 accum) — fastest
                #   "pallas"      implicit-GEMM layout kernels
                #                 (ops/conv_pallas.py)
                # "auto" = xla_dx_bf16 on TPU for VGG params, else xla.
                engine = resolve_lpips_engine(lpips_conv, lpips_params)
                if engine == "pallas":
                    dist = lpips_distance_pallas
                elif engine == "xla_dx":
                    dist = lpips_distance_xla_dx
                elif engine == "xla_dx_bf16":
                    def dist(p, a, b):
                        return lpips_distance_xla_dx(p, a, b, jnp.bfloat16)
                else:
                    dist = lpips_distance

                def _lpips(_):
                    p = pool_avg(pred_image, lpips_downsample)
                    if lpips_gt_feats is not None:
                        return lpips_distance_cached(
                            lpips_params, p, list(lpips_gt_feats), engine
                        )
                    return dist(
                        lpips_params, p, pool_avg(gt_image, lpips_downsample)
                    )

                if lpips_enabled is None:
                    losses[name] = _lpips(None)
                else:
                    losses[name] = jax.lax.cond(
                        lpips_enabled, _lpips,
                        lambda _: jnp.asarray(0.0, jnp.float32), None,
                    )
        else:
            raise ValueError(f"unknown loss {name}")
    total = jnp.asarray(0.0, pred_image.dtype)
    for name, w in zip(loss_names, loss_weights):
        total = total + w * losses[name]
    return total, losses
