"""Jit-friendly colormaps via LUT interpolation.

The reference colors contact maps with matplotlib colormaps on the host
(vis_util.get_colors_from_cmap); here the LUTs are baked once (from
matplotlib when available, with hardcoded fallbacks) and sampled with a
differentiable-free gather inside jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LUT_SIZE = 256


@functools.lru_cache(maxsize=16)
def _lut(name: str) -> np.ndarray:
    if name == "gray":
        g = np.linspace(0, 1, _LUT_SIZE)
        return np.stack([g, g, g], axis=1).astype(np.float32)
    try:
        import matplotlib

        cmap = matplotlib.colormaps[name].resampled(_LUT_SIZE)
        return cmap(np.linspace(0, 1, _LUT_SIZE))[:, :3].astype(np.float32)
    except Exception:
        # perceptually-reasonable two-ramp fallback
        g = np.linspace(0, 1, _LUT_SIZE)
        return np.stack([g, g**2, g**0.5], axis=1).astype(np.float32)


def apply_colormap(values: jax.Array, name: str = "magma") -> jax.Array:
    """values in [0, 1] (any shape) -> [..., 3] RGB."""
    lut = jnp.asarray(_lut(name))
    idx = jnp.clip(values * (_LUT_SIZE - 1), 0, _LUT_SIZE - 1).astype(jnp.int32)
    return lut[idx]
