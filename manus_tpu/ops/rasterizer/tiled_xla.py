"""Tiled compositing in pure XLA (scan over pair chunks).

Same closed-form front-to-back math as the oracle, but organised per tile
over the binned pair segments, i.e. the exact computation the Pallas kernel
performs — minus per-tile early exit. Fully differentiable via autodiff.

This is the portable path: it runs on CPU (tests, 8-device virtual meshes)
and under shard_map for the multi-chip dry run, and it is the parity target
for the Pallas kernel.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from manus_tpu.ops.rasterizer import payload as payload_mod
from manus_tpu.ops.rasterizer.binning import TileBins
from manus_tpu.ops.rasterizer.oracle import ALPHA_EPS, ALPHA_MAX, T_EPS

LOG_T_EPS = math.log(T_EPS)  # host-side: no device work at import


def _straight_through_min(x, cap):
    return x + jax.lax.stop_gradient(jnp.minimum(x, cap) - x)


def tile_pixel_coords(num_tiles_x: int, num_tiles_y: int, tile: int):
    """Pixel-center coords per tile: two [T, Px] arrays (x, y)."""
    t = jnp.arange(num_tiles_x * num_tiles_y)
    tx = (t % num_tiles_x)[:, None]
    ty = (t // num_tiles_x)[:, None]
    i = jnp.arange(tile * tile)[None, :]
    px = (tx * tile + i % tile).astype(jnp.float32)
    py = (ty * tile + i // tile).astype(jnp.float32)
    return px, py


def composite_tiles_xla(
    payload: jax.Array,  # [16, P_pad]
    bins: TileBins,
    num_tiles_x: int,
    num_tiles_y: int,
    tile: int,
    max_pairs_per_tile: int,
    chunk: int = 64,
    tile_base: jax.Array | None = None,  # [] or [1] int32 global id of slot 0
    num_tiles_local: int | None = None,
    tile_ids: jax.Array | None = None,  # [T_local] int32 global ids
):
    """Composite tiles. Returns (rgb [T_local, 3, Px], t_final [T_local, Px]).

    max_pairs_per_tile is a static cap: tiles with more pairs are truncated
    back-to-front (farthest dropped first), which is graceful because
    segments are in depth order. Under tile-sharded rendering only a
    SUBSET of the tile grid is composited: local slot i is global tile
    `tile_ids[i]` (traced; e.g. the owner's dealt set from
    binning.tile_owner_tables), or `tile_base + i` for a contiguous
    block; bins.tile_offsets/counts must already be that subset's slices.
    """
    T = num_tiles_local or (num_tiles_x * num_tiles_y)
    px_x, px_y = tile_pixel_coords(num_tiles_x, num_tiles_y, tile)  # [Tg, Px]
    if tile_ids is not None:
        px_x = jnp.take(px_x, tile_ids, axis=0)
        px_y = jnp.take(px_y, tile_ids, axis=0)
    elif tile_base is not None:
        base_idx = jnp.reshape(tile_base, ())
        px_x = jax.lax.dynamic_slice_in_dim(px_x, base_idx, T)
        px_y = jax.lax.dynamic_slice_in_dim(px_y, base_idx, T)
    n_px = tile * tile
    n_chunks = max(1, -(-max_pairs_per_tile // chunk))
    p_pad = payload.shape[1]

    def body(carry, k):
        log_t, accum, t_min = carry
        base = bins.tile_offsets + k * chunk  # [T]
        cols = base[:, None] + jnp.arange(chunk)[None, :]
        cols = jnp.clip(cols, 0, p_pad - 1)
        # In-range mask: beyond-count slots already have opacity 0, but the
        # static cap can spill into the *next* tile's segment, so mask here.
        in_seg = (jnp.arange(chunk)[None, :] + k * chunk) < bins.tile_counts[:, None]
        f = payload[:, cols]  # [16, T, chunk]
        dx = px_x[:, None, :] - f[payload_mod.F_MEAN_X][:, :, None]  # [T, G, Px]
        dy = px_y[:, None, :] - f[payload_mod.F_MEAN_Y][:, :, None]
        ca = f[payload_mod.F_CONIC_A][:, :, None]
        cb = f[payload_mod.F_CONIC_B][:, :, None]
        cc = f[payload_mod.F_CONIC_C][:, :, None]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        op = jnp.where(in_seg, f[payload_mod.F_OPACITY], 0.0)[:, :, None]
        alpha = op * jnp.exp(power)
        alpha = _straight_through_min(alpha, ALPHA_MAX)
        gate = (power <= 0.0) & jax.lax.stop_gradient(alpha >= ALPHA_EPS)
        alpha = jnp.where(gate, alpha, 0.0)

        log1m = jnp.log1p(-alpha)
        log_cp = log_t[:, None, :] + jnp.cumsum(log1m, axis=1)  # [T, G, Px]
        t_before = jnp.exp(log_cp - log1m)
        incl = jax.lax.stop_gradient(log_cp >= LOG_T_EPS)
        w = jnp.where(incl, alpha * t_before, 0.0)
        colors = jnp.stack(
            [f[payload_mod.F_R], f[payload_mod.F_G], f[payload_mod.F_B]], axis=1
        )  # [T, 3, G]
        accum = accum + jnp.einsum("tcg,tgp->tcp", colors, w,
                                   precision=jax.lax.Precision.HIGHEST)
        t_min = jnp.minimum(
            t_min,
            jnp.min(jnp.where(incl & (alpha > 0), jnp.exp(log_cp), 1.0), axis=1),
        )
        log_t = log_cp[:, -1, :]
        return (log_t, accum, t_min), None

    init = (
        jnp.zeros((T, n_px), jnp.float32),
        jnp.zeros((T, 3, n_px), jnp.float32),
        jnp.ones((T, n_px), jnp.float32),
    )
    # remat: without this, autodiff through the scan stores every chunk's
    # [T, G, Px] intermediates (OOM at production scale); recomputing the
    # chunk math in the backward matches what the Pallas kernel does anyway.
    (log_t, accum, t_min), _ = jax.lax.scan(
        jax.checkpoint(body), init, jnp.arange(n_chunks), unroll=1
    )
    return accum, t_min


def tiles_to_image(
    rgb_tiles: jax.Array,  # [T, 3, Px]
    t_final: jax.Array,  # [T, Px]
    bg: jax.Array,  # [3]
    num_tiles_x: int,
    num_tiles_y: int,
    tile: int,
    width: int,
    height: int,
):
    """Assemble tile outputs into [H, W, 3] (+bg) and [H, W] t_final."""
    out = rgb_tiles + t_final[:, None, :] * bg[None, :, None]
    out = out.reshape(num_tiles_y, num_tiles_x, 3, tile, tile)
    out = out.transpose(0, 3, 1, 4, 2).reshape(
        num_tiles_y * tile, num_tiles_x * tile, 3
    )
    tf = t_final.reshape(num_tiles_y, num_tiles_x, tile, tile)
    tf = tf.transpose(0, 2, 1, 3).reshape(num_tiles_y * tile, num_tiles_x * tile)
    return out[:height, :width], tf[:height, :width]
