"""Reference ("oracle") renderer: dense per-pixel compositing, pure jnp.

This is the correctness anchor for the fast tiled/Pallas paths. It
evaluates every (pixel, gaussian) pair, so it is O(N * H * W) — use it on
small scenes (tests, fixtures) only. Its numerics replicate the upstream
CUDA rasterizer semantics exactly (SURVEY.md section 3.4):

  * depth-stable ordering (ties resolved by gaussian index),
  * power > 0 skip, alpha = min(0.99, opacity * exp(power)),
  * alpha < 1/255 skip,
  * front-to-back termination *before* the gaussian that would push
    transmittance below 1e-4 (expressed here as the closed-form inclusion
    mask CP_k >= 1e-4 on the running cumprod, which is equivalent because
    the cumprod is monotone),
  * out = sum w_k c_k + T_final * bg.

Gradients come from JAX autodiff over this closed form. The 0.99 clamp is
straight-through (gradient flows as if unclamped) and the binary gates are
stop-gradiented, which is precisely what the CUDA backward implements.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from manus_tpu.ops.rasterizer.projection import TILE, ProjectedGaussians

ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _straight_through_min(x: jax.Array, cap: float) -> jax.Array:
    """min(x, cap) in the forward pass, identity in the backward pass."""
    return x + jax.lax.stop_gradient(jnp.minimum(x, cap) - x)


def composite_pixels(
    pix_xy: jax.Array,  # [P, 2] float pixel coords
    pix_tile: jax.Array,  # [P, 2] int tile coords of each pixel
    means2d: jax.Array,  # [K, 2] depth-sorted
    conic: jax.Array,  # [K, 3]
    colors: jax.Array,  # [K, 3]
    opacity: jax.Array,  # [K]
    tile_rect: jax.Array,  # [K, 4] int
    valid: jax.Array,  # [K] bool
    bg: jax.Array,  # [3]
    tile_culling: bool = True,
):
    """Composite K depth-sorted gaussians onto P pixels. Returns ([P,3], [P])."""
    d = pix_xy[:, None, :] - means2d[None, :, :]  # [P, K, 2]
    dx, dy = d[..., 0], d[..., 1]
    power = (
        -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy)
        - conic[None, :, 1] * dx * dy
    )
    alpha = opacity[None, :] * jnp.exp(power)
    alpha = _straight_through_min(alpha, ALPHA_MAX)

    gate = valid[None, :] & (power <= 0.0)
    if tile_culling:
        tr = tile_rect  # (tx0, ty0, tx1, ty1)
        in_tile = (
            (pix_tile[:, None, 0] >= tr[None, :, 0])
            & (pix_tile[:, None, 0] < tr[None, :, 2])
            & (pix_tile[:, None, 1] >= tr[None, :, 1])
            & (pix_tile[:, None, 1] < tr[None, :, 3])
        )
        gate = gate & in_tile
    gate = gate & jax.lax.stop_gradient(alpha >= ALPHA_EPS)
    alpha = jnp.where(gate, alpha, 0.0)

    log_one_minus = jnp.log1p(-alpha)  # 0 where alpha == 0
    log_cp = jnp.cumsum(log_one_minus, axis=1)  # [P, K] inclusive
    cp = jnp.exp(log_cp)  # transmittance *after* k
    t_before = jnp.exp(log_cp - log_one_minus)  # transmittance at k
    incl = jax.lax.stop_gradient(cp >= T_EPS)
    w = jnp.where(incl, alpha * t_before, 0.0)  # [P, K]
    rgb = jnp.matmul(w, colors, precision=jax.lax.Precision.HIGHEST)  # [P, 3]
    t_final = jnp.min(jnp.where(incl & (alpha > 0), cp, 1.0), axis=1)  # [P]
    out = rgb + t_final[:, None] * bg[None, :]
    return out, t_final


def render_oracle(
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacity: jax.Array,
    bg: jax.Array,
    width: int,
    height: int,
    tile_culling: bool = True,
    row_chunk: int = 16,
):
    """Render [H, W, 3] by dense compositing. colors [N,3], opacity [N]."""
    order = jnp.argsort(proj.depth, stable=True)
    means2d = proj.means2d[order]
    conic = proj.conic[order]
    colors_s = colors[order]
    opacity_s = opacity[order]
    rect_s = proj.tile_rect[order]
    valid_s = proj.visible[order]

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)

    def render_rows(y0):
        yy = y0 + jnp.arange(row_chunk, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(yy, xs, indexing="ij")
        pix = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)
        pt = (pix / TILE).astype(jnp.int32)
        out, t_final = composite_pixels(
            pix, pt, means2d, conic, colors_s, opacity_s, rect_s, valid_s, bg,
            tile_culling=tile_culling,
        )
        return out.reshape(row_chunk, width, 3), t_final.reshape(row_chunk, width)

    assert height % row_chunk == 0, "height must be divisible by row_chunk"
    y0s = jnp.arange(0, height, row_chunk, dtype=jnp.float32)
    imgs, t_finals = jax.lax.map(render_rows, y0s)
    return imgs.reshape(height, width, 3), t_finals.reshape(height, width)
