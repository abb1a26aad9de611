"""Trilinear voxel-grid sampling, matching torch.nn.functional.grid_sample
semantics (align_corners=True, padding_mode="zeros") as used by the
reference's voxel skinning grid (gaussian_utils.py:167-196).

The grid layout follows the reference: grid tensor [D, H, W, C] sampled at
normalized coords xyz in [-1, 1] where x indexes W, y indexes H, z indexes D
(torch grid_sample convention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_trilinear(grid: jax.Array, coords: jax.Array) -> jax.Array:
    """grid: [D, H, W, C]; coords: [N, 3] normalized (x, y, z) in [-1, 1].

    Returns [N, C]. Out-of-range samples fade to zero (padding_mode zeros).
    """
    d, h, w, c = grid.shape
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    # align_corners=True: -1 -> 0, +1 -> size-1
    fx = (x + 1.0) * 0.5 * (w - 1)
    fy = (y + 1.0) * 0.5 * (h - 1)
    fz = (z + 1.0) * 0.5 * (d - 1)

    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    z0 = jnp.floor(fz).astype(jnp.int32)
    tx = fx - x0
    ty = fy - y0
    tz = fz - z0

    out = jnp.zeros((coords.shape[0], c), grid.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi, yi, zi = x0 + dx, y0 + dy, z0 + dz
                inside = (
                    (xi >= 0) & (xi < w)
                    & (yi >= 0) & (yi < h)
                    & (zi >= 0) & (zi < d)
                )
                xi_c = jnp.clip(xi, 0, w - 1)
                yi_c = jnp.clip(yi, 0, h - 1)
                zi_c = jnp.clip(zi, 0, d - 1)
                vals = grid[zi_c, yi_c, xi_c]  # [N, C]
                wx = tx if dx else (1.0 - tx)
                wy = ty if dy else (1.0 - ty)
                wz = tz if dz else (1.0 - tz)
                wgt = jnp.where(inside, wx * wy * wz, 0.0)
                out = out + wgt[:, None] * vals
    return out


def skinning_weights_from_voxel_grid(
    xyz: jax.Array,
    grid_center: jax.Array,  # [3] or [1, 3]
    grid_scale: jax.Array,  # [3] or [1, 3]
    grid_weights: jax.Array,  # [D, H, W, B]
) -> jax.Array:
    """Sample + renormalize per-point skinning weights.

    Matches reference gaussian_utils.py:167-196 (trilinear sample of the
    weight grid at normalized coords, then sum-to-one normalization).
    """
    xyz_norm = (xyz - grid_center.reshape(1, 3)) / grid_scale.reshape(1, 3)
    wts = grid_sample_trilinear(grid_weights, xyz_norm)
    denom = jnp.sum(wts, axis=-1, keepdims=True)
    wts = wts / jnp.where(denom == 0.0, 1.0, denom)
    # Points outside the grid sample all-zero weights; route them to the
    # last (background/identity) channel so their blended transform stays
    # non-singular. (The reference leaves this as a TODO and lets NaNs
    # propagate; here the mask-prune phase removes such points cleanly.)
    bg = jnp.zeros((1, wts.shape[-1]), wts.dtype).at[0, -1].set(1.0)
    return jnp.where(denom == 0.0, bg, wts)


def offsets_from_voxel_grid(xyz, grid_center, grid_scale, grid_offsets):
    """Trilinear sample of an offset grid (reference gaussian_utils.py:150-164)."""
    xyz_norm = (xyz - grid_center.reshape(1, 3)) / grid_scale.reshape(1, 3)
    return grid_sample_trilinear(grid_offsets, xyz_norm)
