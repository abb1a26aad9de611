"""Gaussian parameter store: a padded, fixed-capacity pytree.

TPU-native counterpart of the reference GaussianModel
(/root/reference/src/models/gaussian.py): the same six parameter groups and
activations, but instead of reallocating tensors on densify/prune (which
would force an XLA recompile every topology change), we keep a static
capacity of N_max slots plus an `active` mask. Densify/prune/clone/split
flip mask bits and scatter into free slots (models/densify.py); everything
downstream (render, losses, optimizer) is masked by `active`.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from manus_tpu.ops.knn import knn_self_distances, knn_self_distances_host
from manus_tpu.utils import sh as sh_mod
from manus_tpu.utils.transforms import covariance_from_scaling_rotation


@dataclasses.dataclass(frozen=True)
class GaussianOpts:
    """Hyperparameters, mirroring config/model/gaussian/gaussian.yaml."""

    sh_degree: int = 3
    position_lr_init: float = 0.0016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    skinning_lr: float = 0.001
    # The reference declares skinning_lr (gaussian.yaml:12) and an
    # optimizing_skin_weights mode (hand_gaussian.py:60) but never adds the
    # weights to an optimizer group; here the mode is actually wired:
    # per-point skin weights (skin_init=mano_init_points) train with their
    # own masked Adam, clamped >=0 and renormalized each step.
    optimize_skin_weights: bool = False
    percent_dense: float = 0.000001
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify: bool = True
    densify_from_step: int = 100
    densify_until_step: int = 50000
    densify_grad_threshold: float = 0.0002
    min_opacity_threshold: float = 0.005
    size_threshold: int = 20
    remove_outliers_step: int = -1
    isotropic_scaling: bool = False
    remove_seg_start: int = 0
    remove_seg_end: int = 1000
    condition_number: float = 0.4
    start_lpips_iter: int = 1000
    skeleton_dist_threshold: float = 0.2  # hand far-point prune (m)
    # Reference quirk (SURVEY.md 3.6): spatial_lr_scale is 0, so xyz never
    # moves through its optimizer. Expose it; default keeps parity.
    spatial_lr_scale: float = 0.0


class GaussianParams(NamedTuple):
    """Differentiable parameter leaves, all padded to [N_max, ...]."""

    xyz: jax.Array  # [N, 3]
    features_dc: jax.Array  # [N, 1, 3]
    features_rest: jax.Array  # [N, K-1, 3]
    scaling: jax.Array  # [N, S] log-scales (S=1 if isotropic else 3)
    rotation: jax.Array  # [N, 4] wxyz (unnormalized)
    opacity: jax.Array  # [N, 1] logits


class GaussianModel(NamedTuple):
    """Parameters + topology mask + optional skinning weights."""

    params: GaussianParams
    active: jax.Array  # [N] bool
    skin_weights: Optional[jax.Array] = None  # [N, B] (hand model)

    @property
    def capacity(self) -> int:
        return self.active.shape[0]

    def num_active(self) -> jax.Array:
        return jnp.sum(self.active)


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def get_scaling(params: GaussianParams, isotropic: bool = False) -> jax.Array:
    s = jnp.exp(params.scaling)
    if isotropic or s.shape[-1] == 1:
        s = jnp.broadcast_to(s[:, :1], (s.shape[0], 3))
    return s


def get_rotation(params: GaussianParams) -> jax.Array:
    return params.rotation / jnp.linalg.norm(
        params.rotation, axis=-1, keepdims=True
    )


def get_opacity(params: GaussianParams) -> jax.Array:
    return jax.nn.sigmoid(params.opacity)


def get_features(params: GaussianParams) -> jax.Array:
    """[N, K, 3] SH coefficients, dc first (reference layout)."""
    return jnp.concatenate([params.features_dc, params.features_rest], axis=1)


def get_covariance(
    params: GaussianParams,
    scaling_modifier: float = 1.0,
    isotropic: bool = False,
) -> jax.Array:
    """[N, 6] upper-tri 3D covariance (reference gaussian.py:84-93)."""
    return covariance_from_scaling_rotation(
        get_scaling(params, isotropic), params.rotation, scaling_modifier
    )


def init_gaussian_model(
    points: jax.Array,  # [N0, 3]
    colors: jax.Array,  # [N0, 3] in [0, 1]
    capacity: int,
    opts: GaussianOpts = GaussianOpts(),
    skin_weights: Optional[jax.Array] = None,  # [N0, B]
) -> GaussianModel:
    """Build a padded model from an initial point cloud.

    Matches reference initialize_parameters (gaussian.py:99-126): dc
    features from RGB2SH, log-scales from sqrt(mean 3-NN squared distance),
    identity rotations, opacity logit of 0.1.
    """
    n0 = points.shape[0]
    assert n0 <= capacity, f"init points {n0} exceed capacity {capacity}"
    k = (opts.sh_degree + 1) ** 2
    s_dim = 1 if opts.isotropic_scaling else 3

    # Scale init runs on the HOST: it is init-time-only (SURVEY.md 2.9)
    # and was the most fragile device-facing op of every cold start on the
    # tunneled platform (VERDICT r3 weak 8). Tracers (init under jit) keep
    # the device path.
    if isinstance(points, jax.core.Tracer):
        dist2 = jnp.maximum(knn_self_distances(points, k=3), 1e-7)
    else:
        dist2 = jnp.maximum(
            jnp.asarray(knn_self_distances_host(points, k=3)), 1e-7
        )
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None]
    scales = jnp.broadcast_to(log_scale, (n0, s_dim))

    def pad(x, fill=0.0):
        shape = (capacity - n0,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=0)

    params = GaussianParams(
        xyz=pad(jnp.asarray(points, jnp.float32)),
        features_dc=pad(sh_mod.rgb_to_sh(jnp.asarray(colors, jnp.float32))[:, None, :]),
        features_rest=pad(jnp.zeros((n0, k - 1, 3), jnp.float32)),
        scaling=pad(scales.astype(jnp.float32), fill=-10.0),
        rotation=pad(
            jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (n0, 1)),
            fill=0.0,
        )
        .at[n0:, 0]
        .set(1.0),
        opacity=pad(
            jnp.full((n0, 1), inverse_sigmoid(0.1), jnp.float32), fill=-9.21
        ),
    )
    active = jnp.arange(capacity) < n0
    sw = None
    if skin_weights is not None:
        sw = jnp.concatenate(
            [
                jnp.asarray(skin_weights, jnp.float32),
                jnp.zeros((capacity - n0, skin_weights.shape[1]), jnp.float32),
            ],
            axis=0,
        )
    return GaussianModel(params=params, active=active, skin_weights=sw)
