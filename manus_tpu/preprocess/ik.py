"""Inverse kinematics for the 20-bone hand skeleton, JAX + optax.

Functional port of the reference KinematicChain
(/root/reference/preprocess/src/IK/skeleton.py): anatomical DOF masks and
joint limits (14-107), differentiable FK with bone-length rescaling
(forward, 252-287), keypoint + hinge-limit loss (144-177), bone-length
estimation from triangulated keypoints (289-305), and an
AdaBelief-optimised IK solve with warm starting and early stopping
(IK, 307-378). The per-frame solve is one jitted optax loop.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from manus_tpu.utils.transforms import (
    euler_angles_to_matrix,
    get_keypoints,
    get_pose_wrt_root,
)

TIP_JOINTS = (4, 8, 12, 16, 20)  # fingertip keypoints get 2x loss weight


@dataclasses.dataclass
class HandChain:
    """Static chain description (host side)."""

    bnames: list
    parents: np.ndarray  # [J]
    rest_matrices: np.ndarray  # [J, 4, 4]
    heads: np.ndarray  # [J, 3]
    tails: np.ndarray  # [J, 3]
    bone_lengths: np.ndarray  # [J]
    dof: np.ndarray  # [J+1, 3] bool (root + per-bone euler dof)
    limits: np.ndarray  # [J+1, 3, 2]

    @property
    def kintree(self) -> dict:
        return {str(i): int(p) for i, p in enumerate(self.parents)}

    @property
    def num_bones(self) -> int:
        return len(self.bnames)


def default_hand_dof(n_bones: int = 20):
    """Anatomical DOF + limits (reference skeleton.py:38-88).

    Returns (dof [J+1, 3] bool, limits [J+1, 3, 2]).
    Joint 0 is the global root (full dof); bones follow the reference
    indexing: 1-2 thumb CMC (xz), 3 thumb MCP (xz), 4 thumb IP (z),
    then per finger MCP (xz) / PIP (z) / DIP (z) at strides of 4.
    """
    j1 = n_bones + 1
    dof = np.zeros((j1, 3), bool)
    limits = np.zeros((j1, 3, 2), np.float32)
    limits[:, :, 0] = -np.pi
    limits[:, :, 1] = np.pi
    xz = [True, False, True]

    dof[0, :] = True  # root: all
    if j1 > 1:
        dof[1, xz] = True  # thumb CMC*
        limits[1, 0] = (-np.pi / 9, np.pi / 9)
    if j1 > 2:
        dof[2, xz] = True
        limits[2, 0] = (-np.pi / 9, np.pi / 9)
    if j1 > 3:
        dof[3, xz] = True  # thumb MCP
    if j1 > 4:
        dof[4, 2] = True  # thumb IP
    if j1 > 6:
        dof[6:19:4, xz] = True  # finger MCP
        limits[6:19:4, 0] = (-np.pi / 6, np.pi / 6)
        limits[6:19:4, 2] = (-np.pi / 2, np.pi / 9)
        dof[7:20:4, 2] = True  # PIP
        limits[7:20:4, 2] = (-np.pi / 2, np.pi / 9)
        dof[8:21:4, 2] = True  # DIP
        limits[8:21:4, 2] = (-np.pi / 2, 0.0)
    return dof, limits


def make_chain(bnames, parents, rest_matrices, heads, tails,
               bone_lengths=None) -> HandChain:
    parents = np.asarray(parents, np.int32)
    heads = np.asarray(heads, np.float32)
    tails = np.asarray(tails, np.float32)
    if bone_lengths is None:
        bone_lengths = np.linalg.norm(tails - heads, axis=1)
    dof, limits = default_hand_dof(len(bnames))
    return HandChain(
        bnames=list(bnames), parents=parents,
        rest_matrices=np.asarray(rest_matrices, np.float32),
        heads=heads, tails=tails,
        bone_lengths=np.asarray(bone_lengths, np.float32),
        dof=dof, limits=limits,
    )


def chain_forward(chain: HandChain, trans: jax.Array, angles: jax.Array):
    """FK -> [J+1, 3] keypoints (root head + scaled bone tails).

    angles: [J+1, 3] full euler set (root first). Bone directions from the
    posed matrices, lengths rescaled to the estimated bone lengths
    (reference skeleton.py:252-287).
    """
    pose_m = euler_angles_to_matrix(angles, "XYZ", intrinsic=True)
    matrix = get_pose_wrt_root(
        jnp.asarray(chain.rest_matrices),
        pose_m[1:][None],
        pose_m[:1],
        trans[None],
        chain.kintree,
    )  # [1, J, 4, 4]
    heads = get_keypoints(
        matrix, jnp.asarray(chain.rest_matrices), jnp.asarray(chain.heads)
    )[0]
    tails = get_keypoints(
        matrix, jnp.asarray(chain.rest_matrices), jnp.asarray(chain.tails)
    )[0]

    j = chain.num_bones
    lengths = jnp.asarray(chain.bone_lengths)
    dirs = tails - heads
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    # chain rescaling: each bone starts at its (scaled) parent's tail
    scaled_heads = [None] * j
    scaled_tails = [None] * j
    for i in range(j):
        p = int(chain.parents[i])
        scaled_heads[i] = heads[i] if p == -1 else scaled_tails[p]
        scaled_tails[i] = scaled_heads[i] + dirs[i] * lengths[i]
    scaled_heads = jnp.stack(scaled_heads)
    scaled_tails = jnp.stack(scaled_tails)
    keypoints = jnp.concatenate([scaled_heads[:1], scaled_tails], axis=0)
    return keypoints, scaled_heads, scaled_tails


def ik_loss(chain: HandChain, trans, angles_full, target, to_use,
            limit: bool = True):
    """Weighted keypoint loss + hinge limit penalty (skeleton.py:144-177)."""
    pred, _, _ = chain_forward(chain, trans, angles_full)
    err = jnp.sum((pred - target) ** 2, axis=1)
    tip_w = jnp.ones(pred.shape[0]).at[jnp.asarray(TIP_JOINTS)].set(
        2.0, mode="drop"
    )
    err = err * tip_w
    err = jnp.where(to_use, err, 0.0)
    kp_loss = jnp.sum(err) / jnp.maximum(jnp.sum(to_use), 1)
    out = {"keypoint_loss": kp_loss}
    if limit:
        lim = jnp.asarray(chain.limits)
        hi = jnp.maximum(0.0, angles_full - lim[..., 1]) ** 2
        lo = jnp.maximum(0.0, lim[..., 0] - angles_full) ** 2
        out["limit_loss"] = jnp.sum((hi + lo) * jnp.asarray(chain.dof))
    return out


def update_bone_lengths(chain: HandChain, keypoints: np.ndarray) -> HandChain:
    """Mean observed bone length over frames with confident endpoints
    (skeleton.py:289-305). keypoints: [F, J+1, 4] (xyz + conf)."""
    lengths = chain.bone_lengths.copy()
    for i in range(chain.num_bones):
        cur, par = i + 1, int(chain.parents[i]) + 1
        ok = ~(
            np.isclose(keypoints[:, cur, 3], 0)
            | np.isclose(keypoints[:, par, 3], 0)
        )
        if not ok.any():
            raise ValueError(f"no frame has length of bone {chain.bnames[i]}")
        vecs = keypoints[ok, cur, :3] - keypoints[ok, par, :3]
        lengths[i] = float(np.linalg.norm(vecs, axis=1).mean())
    return dataclasses.replace(chain, bone_lengths=lengths)


def solve_ik(
    chain: HandChain,
    target: jax.Array,  # [J+1, 3]
    to_use: jax.Array,  # [J+1] bool
    constraint: bool = True,
    limit: bool = True,
    lr: float = 1e-1,
    trans_init: Optional[jax.Array] = None,
    angles_init: Optional[jax.Array] = None,
    max_iter: int = 500,
):
    """One frame's IK via AdaBelief. Returns (trans [3], angles [J+1, 3]).

    With constraint=True only the anatomical DOF entries are optimised
    (the reference's compressed parameterisation); others stay 0.
    """
    dof = jnp.asarray(chain.dof)
    trans0 = trans_init if trans_init is not None else jnp.zeros(3)
    angles0 = (
        angles_init if angles_init is not None
        else jnp.zeros((chain.num_bones + 1, 3))
    )

    def expand(angles_p):
        if constraint:
            return jnp.where(dof, angles_p, 0.0)
        return angles_p

    def total_loss(params):
        trans, angles_p = params
        losses = ik_loss(chain, trans, expand(angles_p), target, to_use,
                         limit)
        return losses["keypoint_loss"] + losses.get("limit_loss", 0.0)

    opt = optax.adabelief(lr, b1=0.9, b2=0.999, eps=1e-16)
    params = (trans0, angles0)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(total_loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def body(carry, _):
        params, opt_state, best = carry
        params, opt_state, loss = step(params, opt_state)
        best_loss, best_params = best
        improved = loss < best_loss
        best = (
            jnp.minimum(loss, best_loss),
            jax.tree.map(
                lambda a, b: jnp.where(improved, a, b), params, best_params
            ),
        )
        return (params, opt_state, best), loss

    init = (params, opt_state, (jnp.inf, params))
    (params, _, (best_loss, best_params)), losses = jax.lax.scan(
        jax.jit(body), init, None, length=max_iter
    )
    trans, angles_p = best_params
    return trans, expand(angles_p), float(best_loss)
