"""Profiling + numerical-debugging utilities.

The reference has almost no tracing (wall-clock render timing only,
SURVEY.md 5.1) and leans on torch anomaly detection (5.2). Here:

  * `trace(...)`: context manager wrapping jax.profiler traces (view in
    TensorBoard / xprof) with step annotations;
  * `annotate(name)`: named trace region for host-side phases;
  * `enable_nan_debugging()`: jax_debug_nans (the analogue of
    torch.autograd.set_detect_anomaly, reference main.py:17);
  * `assert_finite(tree, name)`: jittable finiteness check via
    equinox-style error on the update step (checkify-free: returns a bool
    you can branch or log on).
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler region (shows up in xprof timelines)."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_debugging(enable: bool = True):
    """Fail loudly on NaN production anywhere under jit (slow; debug only).

    The TPU-native analogue of the reference's globally-on
    torch.autograd.set_detect_anomaly (main.py:17) — off by default here
    because it disables async dispatch.
    """
    jax.config.update("jax_debug_nans", enable)


def tree_all_finite(tree) -> jax.Array:
    """Scalar bool: every leaf of the pytree is finite. Jit-safe."""
    ok = jnp.asarray(True)
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            ok = ok & jnp.all(jnp.isfinite(leaf))
    return ok


class StepTimer:
    """Host-side rolling iters/s with device sync on sample boundaries."""

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self._t0 = time.perf_counter()
        self._count = 0
        self.iters_per_s = 0.0

    def tick(self, sync_obj=None) -> float:
        self._count += 1
        if self._count % self.sync_every == 0:
            if sync_obj is not None:
                jax.block_until_ready(sync_obj)
            now = time.perf_counter()
            self.iters_per_s = self.sync_every / (now - self._t0)
            self._t0 = now
        return self.iters_per_s
