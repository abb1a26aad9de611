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
from manus_tpu.utils.io import dump_mesh


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
) -> np.ndarray:
    """Per-frame + accumulated baseline contacts (mano_contacts.py:92-116).

    Writes `{out_dir}/gt_eval/{frame}.ply` (per-frame contact colors on the
    rest mesh) and `{out_dir}/acc_eval/{frame}.ply` (running accumulated
    contacts). Returns the final accumulated distance map [V_subdiv].
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
    return acc if acc is not None else np.zeros(rest_v.shape[0], np.float32)
