"""One-Euro filter over joint-angle sequences.

Same math as /root/reference/preprocess/src/IK/one_euro_filter.py:13-45,
expressed both as a stateful filter (streaming) and a lax.scan over a full
sequence (batch smoothing, jit-friendly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def smoothing_factor(t_e, cutoff):
    r = 2.0 * jnp.pi * cutoff * t_e
    return r / (r + 1.0)


def filter_sequence(
    ts: jax.Array,  # [F] timestamps (or frame indices)
    xs: jax.Array,  # [F, ...] signal
    min_cutoff: float = 1.0,
    beta: float = 0.0,
    d_cutoff: float = 1.0,
) -> jax.Array:
    """Smooth a whole sequence; element 0 passes through unchanged."""
    flat = xs.reshape(xs.shape[0], -1)

    def step(carry, inp):
        x_prev, dx_prev, t_prev = carry
        t, x = inp
        t_e = jnp.maximum(t - t_prev, 1e-9)
        a_d = smoothing_factor(t_e, d_cutoff)
        dx = (x - x_prev) / t_e
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dx_hat = a_d * dx + (1 - a_d) * dx_prev
        cutoff = min_cutoff + beta * jnp.abs(dx_hat)
        a = smoothing_factor(t_e, cutoff)
        x_hat = a * x + (1 - a) * x_prev
        return (x_hat, dx_hat, t), x_hat

    init = (flat[0], jnp.zeros_like(flat[0]), ts[0])
    _, out = jax.lax.scan(step, init, (ts[1:], flat[1:]))
    out = jnp.concatenate([flat[:1], out], axis=0)
    return out.reshape(xs.shape)


class OneEuroFilter:
    """Streaming variant matching the reference class interface."""

    def __init__(self, t0, x0, dx0=None, min_cutoff=1.0, beta=0.0,
                 d_cutoff=1.0):
        self.min_cutoff = float(min_cutoff)
        self.beta = float(beta)
        self.d_cutoff = float(d_cutoff)
        self.x_prev = np.array(x0, np.float64)
        self.dx_prev = (
            np.array(dx0, np.float64) if dx0 is not None
            else np.zeros_like(self.x_prev)
        )
        self.t_prev = np.array(t0, np.float64)

    def __call__(self, t, x):
        t = np.asarray(t, np.float64)
        x = np.asarray(x, np.float64)
        t_e = t - self.t_prev
        a_d = np.asarray(smoothing_factor(t_e, self.d_cutoff))
        dx = (x - self.x_prev) / t_e[..., None]
        dx[~np.isfinite(dx)] = 0
        dx_hat = a_d[..., None] * dx + (1 - a_d[..., None]) * self.dx_prev
        cutoff = self.min_cutoff + self.beta * np.abs(dx_hat)
        a = np.asarray(smoothing_factor(t_e[..., None], cutoff))
        x_hat = a * x + (1 - a) * self.x_prev
        self.x_prev = x_hat.copy()
        self.dx_prev = dx_hat.copy()
        self.t_prev = t.copy()
        return x_hat
