"""Baseline contact capture: MANO / HARP mesh contacts vs a trained object.

Counterpart of the reference's baseline comparison script
(/root/reference/scripts/process/mano_contacts.py:30-116): posed baseline
hand meshes (MANO fits or HARP reconstructions) are subdivided, their
vertex-to-object contact distances computed with the same 4mm map as the
"ours" path, and the REST-pose mesh is dumped per frame colored by the
per-frame and accumulated contact maps — the inputs to the paint-transfer
IoU table. trimesh is absent in this environment, so the (midpoint)
subdivision it relied on is implemented here directly.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from manus_tpu.ops.contacts import contact_map
from manus_tpu.utils.io import dump_image, dump_mesh


def render_contact_images(
    points: np.ndarray,  # [N, 3] subdivided-mesh vertices
    colors: np.ndarray,  # [N, 3] contact colormap in [0, 1]
    cameras,  # list of utils.camera.Camera pytrees
    out_dir: str,
    names: Optional[Sequence[str]] = None,
    point_scale: Optional[float] = None,
    raster_config=None,
) -> list:
    """Flat-shaded renders of a contact-colored point cloud, one PNG per
    camera — the in-repo replacement for the reference's Blender contact
    mesh renders (/root/reference/scripts/process/bl_render_mano.py:1-297,
    invoked by mano_contacts.py:122-123). Each vertex becomes a small
    isotropic gaussian with its color precomputed (a subdivided mesh is
    dense enough that the splat footprints tile the surface, which is all
    the downstream IoU thresholding needs from Blender's flat shading).

    Returns the list of written paths ({out_dir}/{name}.png).
    """
    import jax

    from manus_tpu.ops.rasterizer.api import RasterConfig, render_gaussians

    pts = jnp.asarray(points, jnp.float32)
    cols = jnp.asarray(colors, jnp.float32)
    if point_scale is None:
        from manus_tpu.ops.knn import knn_self_distances

        # same footprint rule as gaussian init: sqrt(mean sq dist to the
        # 3 nearest neighbours) — splats just touch their neighbours
        d2 = knn_self_distances(pts)
        s = jnp.sqrt(jnp.maximum(d2, 1e-12))
    else:
        s = jnp.full((pts.shape[0],), point_scale, jnp.float32)
    z = jnp.zeros_like(s)
    s2 = s * s
    cov = jnp.stack([s2, z, z, s2, z, s2], axis=-1)  # isotropic upper-tri
    opac = jnp.full((pts.shape[0], 1), 0.99, jnp.float32)
    feats = jnp.zeros((pts.shape[0], 1, 3), jnp.float32)  # unused (precomp)
    active = jnp.ones((pts.shape[0],), bool)
    cfg = raster_config or RasterConfig(backend="auto")

    @jax.jit
    def one(cam):
        out = render_gaussians(
            pts, cov, pts, feats, opac, cam, jnp.zeros(3), sh_degree=0,
            active=active, colors_precomp=cols, config=cfg,
        )
        return out.render

    paths = []
    for i, cam in enumerate(cameras):
        name = names[i] if names is not None else f"{i:04d}"
        img = np.clip(np.asarray(one(cam)), 0.0, 1.0)
        path = os.path.join(out_dir, f"{name}.png")
        dump_image(img, path)
        paths.append(path)
    return paths


def subdivide_mesh(verts: np.ndarray, faces: np.ndarray):
    """One midpoint subdivision: every face splits into 4, edge midpoints
    are shared (trimesh.Trimesh.subdivide topology). Returns (verts, faces).

    Deterministic vertex order: original verts first, then unique edge
    midpoints sorted by (min_idx, max_idx) — applying the same operator to
    rest and posed copies of one topology keeps them in correspondence,
    which is what mano_contacts.py relies on.
    """
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    uniq, inv = np.unique(edges, axis=0, return_inverse=True)
    mid = 0.5 * (verts[uniq[:, 0]] + verts[uniq[:, 1]])
    new_verts = np.concatenate([verts, mid], axis=0)
    n0 = verts.shape[0]
    f = faces.shape[0]
    m01 = n0 + inv[:f]
    m12 = n0 + inv[f : 2 * f]
    m20 = n0 + inv[2 * f :]
    a, b, c = faces[:, 0], faces[:, 1], faces[:, 2]
    new_faces = np.concatenate(
        [
            np.stack([a, m01, m20], 1),
            np.stack([m01, b, m12], 1),
            np.stack([m20, m12, c], 1),
            np.stack([m01, m12, m20], 1),
        ],
        axis=0,
    )
    return new_verts.astype(np.float32), new_faces.astype(np.int32)


def mano_baseline_contacts(
    rest_verts: np.ndarray,
    faces: np.ndarray,
    posed_verts_seq: Sequence[np.ndarray],  # per-frame posed copies
    object_pts: np.ndarray,  # trained object gaussian means (active)
    out_dir: str,
    cmap_type: str = "gray",
    subdiv_iters: int = 3,  # reference: 3 for MANO, 2 for HARP
    frame_ids: Optional[Sequence[int]] = None,
    cameras=None,  # eval cameras: render acc contacts to PNGs when given
    camera_names: Optional[Sequence[str]] = None,
    raster_config=None,
) -> np.ndarray:
    """Per-frame + accumulated baseline contacts (mano_contacts.py:92-116).

    Writes `{out_dir}/gt_eval/{frame}.ply` (per-frame contact colors on the
    rest mesh) and `{out_dir}/acc_eval/{frame}.ply` (running accumulated
    contacts). With `cameras`, additionally renders the final accumulated
    contact map on the REST mesh to `{out_dir}/acc_eval_rendered/*.png` —
    the images evaluate_composite's three-way IoU table consumes (the
    reference produces them with Blender, bl_render_mano.py; here the own
    rasterizer renders the subdivided vertices as small gaussians).
    Returns the final accumulated distance map [V_subdiv].
    """
    rest_v, f = np.asarray(rest_verts, np.float32), np.asarray(faces)
    for _ in range(subdiv_iters):
        rest_v, f = subdivide_mesh(rest_v, f)

    obj = jnp.asarray(object_pts, jnp.float32)
    per_dir = os.path.join(out_dir, "gt_eval")
    acc_dir = os.path.join(out_dir, "acc_eval")
    acc = None
    ids = frame_ids if frame_ids is not None else range(len(posed_verts_seq))
    for fid, posed in zip(ids, posed_verts_seq):
        pv, pf = np.asarray(posed, np.float32), np.asarray(faces)
        for _ in range(subdiv_iters):
            pv, pf = subdivide_mesh(pv, pf)
        dist, _, cmap = contact_map(
            jnp.asarray(pv), obj, cmap_type=cmap_type
        )
        dist = np.asarray(dist)
        acc = dist if acc is None else acc + dist
        dump_mesh(os.path.join(per_dir, f"{fid}.ply"), rest_v, f,
                  colors=np.asarray(cmap))
        from manus_tpu.utils.colormap import apply_colormap

        acc_cmap = np.asarray(
            apply_colormap(jnp.clip(jnp.asarray(acc), 0, 1), cmap_type)
        )
        dump_mesh(os.path.join(acc_dir, f"{fid}.ply"), rest_v, f,
                  colors=acc_cmap)
    if acc is None:
        acc = np.zeros(rest_v.shape[0], np.float32)
    if cameras is not None:
        from manus_tpu.utils.colormap import apply_colormap

        acc_cmap = np.asarray(
            apply_colormap(jnp.clip(jnp.asarray(acc), 0, 1), cmap_type)
        )
        render_contact_images(
            rest_v, acc_cmap, cameras,
            os.path.join(out_dir, "acc_eval_rendered"),
            names=camera_names, raster_config=raster_config,
        )
    return acc
