"""Gaussian projection: world-space means + 3D covariances -> screen space.

Implements the upstream-3DGS forward projection contract consumed by the
reference through `diff-gaussian-rasterization` (see SURVEY.md section 3.4
and /root/reference/src/utils/gaussian_utils.py:349-428):

  * row-vector view/proj transforms (p_row @ M),
  * frustum cull at view-space z <= 0.2,
  * EWA 2D covariance  cov2d = J R Sigma R^T J^T  with the 1.3*tanfov
    clamp on view-space x/z, y/z and the +0.3 screen-space dilation,
  * conic (inverse cov2d), 3-sigma radius from the max eigenvalue,
  * NDC -> pixel mapping ((v+1)*S - 1)/2.

Everything is batched [N] jnp so XLA vectorises it; the whole stage is
differentiable (radius/tile outputs are stop-gradiented — they only steer
binning, matching the CUDA kernel which does not differentiate them).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from manus_tpu.utils.camera import Camera

FRUSTUM_NEAR_Z = 0.2
COV2D_DILATION = 0.3
TILE = 16  # pixels per tile side (matches upstream 3DGS binning granularity)


class ProjectedGaussians(NamedTuple):
    """Per-gaussian screen-space quantities, all [N, ...]."""

    means2d: jax.Array  # [N, 2] pixel coords
    conic: jax.Array  # [N, 3] inverse 2D covariance (a, b, c): [[a,b],[b,c]]
    depth: jax.Array  # [N] view-space z
    radius: jax.Array  # [N] int32 3-sigma pixel radius (0 => culled)
    tile_rect: jax.Array  # [N, 4] int32 (tx0, ty0, tx1, ty1), exclusive max
    visible: jax.Array  # [N] bool: touches >=1 tile


def project_gaussians(
    means3d: jax.Array,
    cov3d: jax.Array,
    camera: Camera,
    active: jax.Array | None = None,
) -> ProjectedGaussians:
    """Project [N, 3] means and [N, 6] upper-tri covariances.

    `active` masks out padded slots (treated as culled).
    """
    n = means3d.shape[0]
    w, h = camera.width, camera.height
    tanfovx, tanfovy = camera.tanfovx, camera.tanfovy
    focal_x = w / (2.0 * tanfovx)
    focal_y = h / (2.0 * tanfovy)

    # Row-vector camera transforms in unrolled scalar form: [N,4] @ [4,4]
    # matmuls pad their 4-wide contraction onto the MXU (and their VJPs
    # again on the backward); the VPU form is a handful of fused fma rows.
    x, y, z = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    WV = camera.world_view_transform  # [4, 4], row-vector convention
    FP = camera.full_proj_transform

    def row_xform(M, j):
        return x * M[0, j] + y * M[1, j] + z * M[2, j] + M[3, j]

    pv_x, pv_y, pv_z = (row_xform(WV, j) for j in range(3))
    ph = [row_xform(FP, j) for j in range(4)]
    p_w = 1.0 / (ph[3] + 1e-7)
    p_proj_x, p_proj_y = ph[0] * p_w, ph[1] * p_w

    in_frustum = pv_z > FRUSTUM_NEAR_Z
    depth = pv_z
    depth_safe = jnp.where(in_frustum, depth, 1.0)

    # EWA: clamp the view-space direction to 1.3x the frustum, then build the
    # 2x3 perspective Jacobian.
    txtz = jnp.clip(pv_x / depth_safe, -1.3 * tanfovx, 1.3 * tanfovx)
    tytz = jnp.clip(pv_y / depth_safe, -1.3 * tanfovy, 1.3 * tanfovy)
    tx = txtz * depth_safe
    ty = tytz * depth_safe
    tz = depth_safe
    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz

    # EWA in explicit scalar form: the [N,2,3]x[3,3] batched matmuls pad
    # their tiny contraction dims onto the MXU (~10ms at 65k gaussians);
    # the unrolled VPU form is ~1ms. J rows: (fx/tz, 0, -fx*tx/tz^2) and
    # (0, fy/tz, -fy*ty/tz^2); R is the world->camera rotation.
    R = camera.extr[:3, :3]
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz2
    # JR[0,:] = j00*R[0,:] + j02*R[2,:];  JR[1,:] = j11*R[1,:] + j12*R[2,:]
    a0 = j00 * R[0, 0] + j02 * R[2, 0]
    a1 = j00 * R[0, 1] + j02 * R[2, 1]
    a2 = j00 * R[0, 2] + j02 * R[2, 2]
    b0 = j11 * R[1, 0] + j12 * R[2, 0]
    b1 = j11 * R[1, 1] + j12 * R[2, 1]
    b2 = j11 * R[1, 2] + j12 * R[2, 2]
    sxx, sxy, sxz, syy, syz, szz = jnp.moveaxis(cov3d, -1, 0)
    # u = a . Sigma, v = b . Sigma
    u0 = a0 * sxx + a1 * sxy + a2 * sxz
    u1 = a0 * sxy + a1 * syy + a2 * syz
    u2 = a0 * sxz + a1 * syz + a2 * szz
    v0 = b0 * sxx + b1 * sxy + b2 * sxz
    v1 = b0 * sxy + b1 * syy + b2 * syz
    v2 = b0 * sxz + b1 * syz + b2 * szz
    cxx = u0 * a0 + u1 * a1 + u2 * a2 + COV2D_DILATION
    cxy = u0 * b0 + u1 * b1 + u2 * b2
    cyy = v0 * b0 + v1 * b1 + v2 * b2 + COV2D_DILATION

    det = cxx * cyy - cxy * cxy
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=-1)

    mid = 0.5 * (cxx + cyy)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))
    # Pixel centers sit at integer coordinates (upstream ndc2Pix).
    means2d = jnp.stack(
        [
            ((p_proj_x + 1.0) * w - 1.0) * 0.5,
            ((p_proj_y + 1.0) * h - 1.0) * 0.5,
        ],
        axis=-1,
    )

    valid = in_frustum & det_ok
    if active is not None:
        valid = valid & active

    # Tile AABB, clamped to the grid; a gaussian touching zero tiles is
    # culled (radius forced to 0), matching upstream getRect + "tiles==0".
    grid_x = (w + TILE - 1) // TILE
    grid_y = (h + TILE - 1) // TILE
    m2d = jax.lax.stop_gradient(means2d)
    r = jax.lax.stop_gradient(radius_f)
    tx0 = jnp.clip(((m2d[:, 0] - r) / TILE).astype(jnp.int32), 0, grid_x)
    ty0 = jnp.clip(((m2d[:, 1] - r) / TILE).astype(jnp.int32), 0, grid_y)
    tx1 = jnp.clip(
        ((m2d[:, 0] + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x
    )
    ty1 = jnp.clip(
        ((m2d[:, 1] + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y
    )
    touches = (tx1 - tx0) * (ty1 - ty0) > 0
    visible = valid & touches
    radius = jnp.where(visible, r, 0.0).astype(jnp.int32)
    tile_rect = jnp.stack([tx0, ty0, tx1, ty1], axis=-1)

    # Sanitize screen-space values of culled gaussians: a near-zero clip-space
    # w produces inf means2d, and `0 * inf = nan` would poison autodiff even
    # though the contribution is masked. Invisible slots contribute nothing,
    # so park them at benign constants (zero cotangents flow to them).
    vis = jax.lax.stop_gradient(visible)[:, None]
    means2d = jnp.where(vis, means2d, 0.0)
    conic = jnp.where(vis, conic, jnp.asarray([1.0, 0.0, 1.0], conic.dtype))

    return ProjectedGaussians(
        means2d=means2d,
        conic=conic,
        depth=depth,
        radius=jax.lax.stop_gradient(radius),
        tile_rect=jax.lax.stop_gradient(tile_rect),
        visible=jax.lax.stop_gradient(visible),
    )
