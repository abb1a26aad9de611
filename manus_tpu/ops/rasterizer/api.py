"""Public differentiable rendering API.

Mirrors the reference render bridge contract
(/root/reference/src/utils/gaussian_utils.py:349-449): precomputed 3D
covariances + precomputed (or SH-evaluated) colors go in, an [H, W, 3]
image and per-gaussian visibility/radii come out, and gradients flow to
means, covariances, colors and opacities. The densification "viewspace
gradient" signal is exposed functionally: pass a zeros [N, 2]
`means2d_offset` and differentiate the loss w.r.t. it (the reference's
means2D.retain_grad() trick, but functional).

Backends:
  * "oracle": dense per-pixel jnp compositing (tiny scenes, ground truth)
  * "xla":    binned tiles, lax.scan compositing (portable, differentiable)
  * "pallas": binned tiles, Pallas TPU kernel with per-tile early exit
  * "auto":   pallas on TPU, xla elsewhere
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from manus_tpu.ops.rasterizer import oracle as oracle_mod
from manus_tpu.ops.rasterizer import payload as payload_mod
from manus_tpu.ops.rasterizer import tiled_xla
from manus_tpu.ops.rasterizer.binning import bin_gaussians
from manus_tpu.ops.rasterizer.projection import TILE, project_gaussians
from manus_tpu.utils import sh as sh_mod
from manus_tpu.utils.camera import Camera


class RasterConfig(NamedTuple):
    """Static rasterizer configuration (hashable; safe as a jit static)."""

    tg_max: int = 64  # max tiles per gaussian in binning
    chunk: int = 64  # pairs per compositing chunk (xla backend)
    pallas_chunk: int = 128  # pairs per chunk DMA (pallas backend)
    max_pairs_per_tile: int = 4096  # per-tile pair cap (both tiled backends)
    backend: str = "auto"
    lane_align: int = 128
    pair_budget_factor: int = 8  # aligned pair buffer cap, x N (0 = off)
    # static capacity for multi-tile gaussians in the two-tier binning
    # expansion, x N (binning.py); 1.0 = every gaussian may be multi
    multi_frac: float = 1.0
    # gauss-axis composite split: "owner" (static tile ownership,
    # bit-exact) | "pairslice" (equal pair-slice per column + associative
    # segment combine — balanced on clustered scenes, ~1e-4 deviation at
    # the termination boundary) | "hybrid" (owner tiles + the
    # hot_split_tiles deepest tiles depth-split across columns — the T/n
    # grid sweep of owner with pairslice's pair balance where it
    # matters). See config.RasterOptions.
    tile_shard_mode: str = "owner"
    # "hybrid" mode: how many of the deepest tiles are depth-split
    # across the gauss columns (selected per frame by top_k on the tile
    # pair counts)
    hot_split_tiles: int = 8


class RenderOutput(NamedTuple):
    render: jax.Array  # [H, W, 3]
    radii: jax.Array  # [N] int32
    visible: jax.Array  # [N] bool  (radii > 0)
    t_final: jax.Array  # [H, W] final transmittance
    overflow: jax.Array  # [] int32 total pairs dropped in binning
    # portion of `overflow` from the per-tile max_pairs cap (farthest
    # pairs of depth-sorted segments — usually past the early-termination
    # horizon, so harmless in opaque scenes; the remainder is genuine
    # coverage loss worth acting on)
    overflow_far: jax.Array  # [] int32


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return backend


def calculate_colors_from_sh(
    posed_means: jax.Array,
    cano_features: jax.Array,  # [N, K, 3] (dc first, reference layout)
    cano_means: jax.Array,
    camera: Camera,
    sh_degree: int,
    tf: Optional[jax.Array] = None,
) -> jax.Array:
    """View-dependent RGB from SH; canonical-space view dirs when articulated.

    Matches reference gaussian_utils.py:431-449: for articulated models the
    camera center is pulled back through inv(tf) per gaussian so SH
    coefficients stay pose-invariant.
    """
    shs = jnp.swapaxes(cano_features, -1, -2)  # [N, 3, K]
    if tf is not None:
        # Pull the camera center back through inv(tf) per gaussian. tf is
        # affine, so solve R x = (c - t) with a closed-form 3x3 adjugate —
        # jnp.linalg.inv on [N,4,4] costs ~80ms/65k gaussians on TPU (LU
        # per matrix) vs ~1ms for the adjugate. Singular blends (zero skin
        # weights) fall back to the un-transformed camera center.
        R = tf[:, :3, :3]
        trans = tf[:, :3, 3]
        rhs = camera.camera_center[None, :] - trans  # [N, 3]
        a, b, c = R[:, 0, 0], R[:, 0, 1], R[:, 0, 2]
        d, e, f = R[:, 1, 0], R[:, 1, 1], R[:, 1, 2]
        g, h, i = R[:, 2, 0], R[:, 2, 1], R[:, 2, 2]
        co00 = e * i - f * h
        co01 = c * h - b * i
        co02 = b * f - c * e
        co10 = f * g - d * i
        co11 = a * i - c * g
        co12 = c * d - a * f
        co20 = d * h - e * g
        co21 = b * g - a * h
        co22 = a * e - b * d
        det = a * co00 + b * co10 + c * co20
        ok = jnp.abs(det) > 1e-12
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        x = (co00 * rhs[:, 0] + co01 * rhs[:, 1] + co02 * rhs[:, 2]) * inv_det
        y = (co10 * rhs[:, 0] + co11 * rhs[:, 1] + co12 * rhs[:, 2]) * inv_det
        z = (co20 * rhs[:, 0] + co21 * rhs[:, 1] + co22 * rhs[:, 2]) * inv_det
        cam_inv = jnp.where(
            ok[:, None], jnp.stack([x, y, z], axis=-1),
            camera.camera_center[None, :],
        )
        dirs = cano_means - cam_inv
    else:
        dirs = posed_means - camera.camera_center
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rgb = sh_mod.eval_sh(sh_degree, shs, dirs)
    return jnp.maximum(rgb + 0.5, 0.0)


def render_gaussians(
    posed_means: jax.Array,  # [N, 3]
    posed_cov: jax.Array,  # [N, 6] upper-tri
    cano_means: jax.Array,  # [N, 3] (SH view dirs for articulated models)
    cano_features: jax.Array,  # [N, K, 3] SH coeffs
    cano_opacity: jax.Array,  # [N, 1] or [N]
    camera: Camera,
    bg_color: jax.Array,  # [3]
    colors_precomp: Optional[jax.Array] = None,
    sh_degree: int = 3,
    tf: Optional[jax.Array] = None,
    active: Optional[jax.Array] = None,
    means2d_offset: Optional[jax.Array] = None,
    config: RasterConfig = RasterConfig(),
    gauss_axis: Optional[str] = None,
    gauss_axis_size: int = 1,
) -> RenderOutput:
    """Differentiable 3D Gaussian splat render. See module docstring.

    gauss_axis: name of a shard_map mesh axis the GAUSSIAN dimension is
    sharded over (SURVEY §5.7 tensor-parallel analogue). The N-heavy
    per-gaussian stages (SH eval + EWA projection, and upstream LBS) run
    on the local shard; the small projected fields are then all_gathered
    over the axis so binning sees the full cloud. When the tile count
    divides gauss_axis_size, the COMPOSITE is additionally tile-sharded:
    each mesh column rasterises its contiguous block of the tile grid and
    the tile outputs are all_gathered back — so the raster core scales
    over the axis instead of running replicated (SURVEY §5.7's
    "tile-space sharding"). Shard order is the global slot order (tiled
    gather concatenates shards in axis order), so depth-sort tie-breaking
    matches the unsharded run exactly. Outputs (render, radii, visible)
    are full-N / full-image on every device.
    """
    n = posed_means.shape[0]
    opacity = cano_opacity.reshape(n)
    if colors_precomp is None:
        colors = calculate_colors_from_sh(
            posed_means, cano_features, cano_means, camera, sh_degree, tf
        )
    else:
        colors = colors_precomp

    proj = project_gaussians(posed_means, posed_cov, camera, active=active)
    if gauss_axis is not None:
        gather = lambda x: jax.lax.all_gather(x, gauss_axis, tiled=True)
        proj = jax.tree.map(gather, proj)
        colors = gather(colors)
        opacity = gather(opacity)
    if means2d_offset is not None:
        proj = proj._replace(means2d=proj.means2d + means2d_offset)

    backend = _resolve_backend(config.backend)
    w, h = camera.width, camera.height
    bg = jnp.asarray(bg_color, posed_means.dtype)

    if backend == "oracle":
        # Dense path needs H divisible by its row chunk; pick a divisor.
        row_chunk = 16 if h % 16 == 0 else (8 if h % 8 == 0 else 1)
        img, t_final = oracle_mod.render_oracle(
            proj, colors, opacity, bg, w, h, row_chunk=row_chunk
        )
        overflow = jnp.zeros((), jnp.int32)
        overflow_far = jnp.zeros((), jnp.int32)
    else:
        ntx = (w + TILE - 1) // TILE
        nty = (h + TILE - 1) // TILE
        num_tiles = ntx * nty
        # Tile-sharded raster mid+back stages: each gauss-axis column
        # bins, payload-gathers and composites ONLY the tiles it owns
        # under the static dealt-diagonal interleave of
        # binning.tile_owner_tables (occupancy is heavily skewed toward
        # a few adjacent tiles, so contiguous blocks — and stripe-prone
        # flat round-robin — put most pairs on one column; SURVEY §5.7).
        # Outputs are gathered and un-permuted to global tile order below.
        pairslice = (
            gauss_axis is not None
            and gauss_axis_size > 1
            and config.tile_shard_mode == "pairslice"
        )
        hybrid = (
            gauss_axis is not None
            and gauss_axis_size > 1
            and config.tile_shard_mode == "hybrid"
            and config.hot_split_tiles > 0
            and num_tiles % gauss_axis_size == 0
        )
        shard_tiles = (
            gauss_axis is not None
            and gauss_axis_size > 1
            and not pairslice
            and not hybrid
            and num_tiles % gauss_axis_size == 0
        )
        bins = bin_gaussians(
            proj, ntx, nty, config.tg_max, lane_align=config.lane_align,
            pair_budget_factor=config.pair_budget_factor,
            max_pairs_per_tile=config.max_pairs_per_tile,
            multi_frac=config.multi_frac,
            tile_owner_axis=gauss_axis if shard_tiles else None,
            num_owners=gauss_axis_size if shard_tiles else 1,
        )
        if pairslice:
            # Pair-slice split (SURVEY §5.7 load-balance hard part, the
            # rebalance for clustered scenes): the depth-sorted global
            # pair array is cut into gauss_axis_size EQUAL contiguous
            # slices; each column payload-gathers and composites only its
            # slice (a tile whose segment straddles a cut appears in
            # several columns with partial depth ranges), and the
            # per-tile (rgb, T) partials over-compose across columns in
            # axis order below — the over operator is associative, and
            # slice order == depth order within every tile. Work per
            # column ≈ pairs/n regardless of tile occupancy; the tile
            # grid itself is not partitioned (empty/foreign tiles have
            # count 0 and hit the kernels' empty-tile skip).
            col = jax.lax.axis_index(gauss_axis)
            p = bins.pair_src.shape[0]
            # slice width rounded up to the lane alignment: the Pallas
            # composite DMAs chunk windows at 128-aligned offsets, so the
            # payload's last dim must stay a lane_align multiple
            la = max(config.lane_align, 1)
            s = -(-(-(-p // gauss_axis_size)) // la) * la
            pad = s * gauss_axis_size - p
            src_pad = bins.pair_src if pad == 0 else jnp.concatenate(
                [bins.pair_src, jnp.full((pad,), -1, jnp.int32)]
            )
            start = col * s
            src_local = jax.lax.dynamic_slice_in_dim(src_pad, start, s)
            off_local = jnp.clip(bins.tile_offsets - start, 0, s)
            end_local = jnp.clip(
                bins.tile_offsets + bins.tile_counts - start, 0, s
            )
            bins = bins._replace(
                pair_src=src_local,
                tile_offsets=off_local,
                tile_counts=end_local - off_local,
            )
        pay = payload_mod.build_payload(
            proj, colors, opacity, bins, config.tg_max
        )
        offs, cnts = bins.tile_offsets, bins.tile_counts
        tids = None
        if shard_tiles:
            from manus_tpu.ops.rasterizer.binning import tile_owner_tables

            _, _, owned_np, perm_np = tile_owner_tables(
                ntx, nty, gauss_axis_size
            )
            col = jax.lax.axis_index(gauss_axis)
            tids = jnp.asarray(owned_np)[col]  # [T_local] global ids
        hot_ids = None
        if hybrid:
            # Owner tiles + hot-tile depth split (the best of both
            # gauss-split modes, closing the measured trade-off: owner's
            # T/n grid sweep per column, pairslice's pair balance on the
            # tiles where imbalance lives). The K deepest tiles (top_k on
            # the budget-clamped counts — traced, re-picked every frame)
            # are zeroed out of their owner's normal slot and every
            # column instead composites an equal DEPTH RANGE of each; the
            # K partial segments over-compose across columns below.
            # Non-hot tiles keep the bit-exact owner path; hot tiles
            # carry pairslice's ~1e-4 termination-boundary deviation.
            from manus_tpu.ops.rasterizer.binning import tile_owner_tables

            _, _, owned_np, perm_np = tile_owner_tables(
                ntx, nty, gauss_axis_size
            )
            col = jax.lax.axis_index(gauss_axis)
            k_hot = min(config.hot_split_tiles, num_tiles)
            hot_cnt, hot_ids = jax.lax.top_k(bins.tile_counts, k_hot)
            hot_off = jnp.take(bins.tile_offsets, hot_ids)
            share = -(-hot_cnt // gauss_axis_size)  # ceil per-column
            sub_off = hot_off + jnp.minimum(col * share, hot_cnt)
            sub_end = hot_off + jnp.minimum((col + 1) * share, hot_cnt)
            owned_ids = jnp.asarray(owned_np)[col]  # [T_local]
            own_off = jnp.take(bins.tile_offsets, owned_ids)
            own_cnt = jnp.take(bins.tile_counts, owned_ids)
            own_cnt = jnp.where(
                jnp.any(owned_ids[:, None] == hot_ids[None, :], axis=1),
                0, own_cnt,
            )
            offs = jnp.concatenate([own_off, sub_off])
            cnts = jnp.concatenate([own_cnt, sub_end - sub_off])
            tids = jnp.concatenate([owned_ids, hot_ids])
        if backend == "pallas":
            from manus_tpu.ops.rasterizer import pallas_backend

            rgb_tiles, t_tiles = pallas_backend.composite_tiles_pallas(
                pay, offs, cnts, ntx, nty,
                tile=TILE, chunk=config.pallas_chunk, tile_ids=tids,
            )
        elif backend == "xla":
            rgb_tiles, t_tiles = tiled_xla.composite_tiles_xla(
                pay, bins._replace(tile_offsets=offs, tile_counts=cnts),
                ntx, nty, TILE, config.max_pairs_per_tile,
                chunk=config.chunk,
                num_tiles_local=(offs.shape[0]
                                 if shard_tiles or hybrid else None),
                tile_ids=tids,
            )
        else:
            raise ValueError(f"unknown backend {backend}")
        def _over_compose(rgb_parts, t_parts):
            # Ordered over-compose of per-column partial segments:
            # column order == global pair order == depth order within
            # every tile, and (rgb, T) composition is associative
            # (out = rgb_a + T_a * rgb_b, T = T_a * T_b). The 1e-4
            # transmittance termination is applied at part granularity
            # (a later column's contribution is dropped once the running
            # T has crossed it) — the in-kernel mid-slice cut cannot be
            # reproduced across columns, so split tiles deviate from the
            # bit-exact single-device image by at most ~1e-4-weighted
            # contributions (documented in RasterConfig).
            def comb(carry, xs):
                rgb_c, t_c = carry
                r2, t2 = xs
                go = t_c > 1e-4
                rgb_c = rgb_c + jnp.where(
                    go[:, None, :], t_c[:, None, :] * r2, 0.0
                )
                t_c = jnp.where(go, t_c * t2, t_c)
                return (rgb_c, t_c), None

            (rgb_c, t_c), _ = jax.lax.scan(
                comb, (rgb_parts[0], t_parts[0]),
                (rgb_parts[1:], t_parts[1:]),
            )
            return rgb_c, t_c

        if pairslice:
            rgb_tiles, t_tiles = _over_compose(
                jax.lax.all_gather(rgb_tiles, gauss_axis),
                jax.lax.all_gather(t_tiles, gauss_axis),
            )
        if hybrid:
            # owned slots reassemble exactly like owner mode; the K hot
            # slots over-compose across columns and overwrite their
            # tiles' (empty) owner results
            t_loc = owned_np.shape[1]
            own_rgb = jax.lax.all_gather(
                rgb_tiles[:t_loc], gauss_axis, tiled=True
            )
            own_t = jax.lax.all_gather(
                t_tiles[:t_loc], gauss_axis, tiled=True
            )
            perm = jnp.asarray(perm_np)
            own_rgb = jnp.take(own_rgb, perm, axis=0)
            own_t = jnp.take(own_t, perm, axis=0)
            hot_rgb, hot_t = _over_compose(
                jax.lax.all_gather(rgb_tiles[t_loc:], gauss_axis),
                jax.lax.all_gather(t_tiles[t_loc:], gauss_axis),
            )
            rgb_tiles = own_rgb.at[hot_ids].set(hot_rgb)
            t_tiles = own_t.at[hot_ids].set(hot_t)
        if shard_tiles:
            rgb_tiles = jax.lax.all_gather(rgb_tiles, gauss_axis, tiled=True)
            t_tiles = jax.lax.all_gather(t_tiles, gauss_axis, tiled=True)
            # gathered position of global tile t is perm[t] (owner-major,
            # rank within owner) — un-permute with the static table
            perm = jnp.asarray(perm_np)
            rgb_tiles = jnp.take(rgb_tiles, perm, axis=0)
            t_tiles = jnp.take(t_tiles, perm, axis=0)
        img, t_final = tiled_xla.tiles_to_image(
            rgb_tiles, t_tiles, bg, ntx, nty, TILE, w, h
        )
        overflow = bins.overflow_count
        overflow_far = bins.overflow_far

    return RenderOutput(
        render=img,
        radii=proj.radius,
        visible=proj.visible,
        t_final=jax.lax.stop_gradient(t_final),
        overflow=overflow,
        overflow_far=overflow_far,
    )
