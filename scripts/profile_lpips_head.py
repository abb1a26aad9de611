"""Isolate the LPIPS f+b cost centers on hardware: conv stack vs head.

Same-session probes (chained-fori_loop timing):
  1. feats-only f+b (XLA convs):   d/dx of sum(mean(stage feats(x1)))
  2. feats-only f+b (xla_dx):      same through the dx-only custom VJP
  3. lpips fwd-only (XLA):         2 images + head, no backward
  4. lpips f+b with head REPLACED by plain mean-square stage diffs
     (no channel-normalize): isolates the normalize VJP cost.

If (1) is small and (4) much cheaper than the known full f+b (~13.4 ms),
the unit-normalize head backward is the dominant cost, not the convs.

Run: python scripts/profile_lpips_head.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from manus_tpu.train.lpips import (  # noqa: E402
    lpips_distance,
    random_lpips_params,
    vgg16_features,
    vgg16_features_xla_dx,
)

H = W = 512


def chain_time(name, fn, params, img1, img2):
    @jax.jit
    def chain(n, p, x1, x2):
        def body(_, carry):
            v = fn(p, carry, x2)
            return carry + 1e-9 * v

        return jax.lax.fori_loop(0, n, body, x1)

    t0 = time.time()
    np.asarray(chain(jnp.asarray(2), params, img1, img2)[0, 0])
    tc = time.time() - t0

    def timed(n):
        t = time.time()
        np.asarray(chain(jnp.asarray(n), params, img1, img2)[0, 0])
        return time.time() - t

    t2 = min(timed(2) for _ in range(2))
    t22 = min(timed(22) for _ in range(2))
    per = (t22 - t2) / 20 * 1e3
    print(f"{name:32s} {per:7.2f} ms/iter (compile {tc:.0f}s)", flush=True)
    return per


def main():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    params = random_lpips_params(0)
    rng = np.random.RandomState(3)
    img1 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    def feats_fb_xla(p, x1, x2):
        def s(a):
            fs = vgg16_features(p, (a * 2 - 1)[None])
            return sum(jnp.mean(f) for f in fs)

        v, g = jax.value_and_grad(s)(x1)
        return v + 1e-6 * jnp.mean(g)

    def feats_fb_dx(p, x1, x2):
        def s(a):
            fs = vgg16_features_xla_dx(p, a * 2 - 1)
            return sum(jnp.mean(f.astype(jnp.float32)) for f in fs)

        v, g = jax.value_and_grad(s)(x1)
        return v + 1e-6 * jnp.mean(g)

    def lpips_fwd(p, x1, x2):
        return lpips_distance(p, x1, x2)

    def lpips_fb_nonorm(p, x1, x2):
        def d(a):
            f1 = vgg16_features(p, (a * 2 - 1)[None])
            f2 = vgg16_features(p, (x2 * 2 - 1)[None])
            return sum(
                jnp.mean((u - v) ** 2) for u, v in zip(f1, f2)
            )

        v, g = jax.value_and_grad(d)(x1)
        return v + 1e-6 * jnp.mean(g)

    chain_time("feats-only f+b (xla)", feats_fb_xla, params, img1, img2)
    chain_time("feats-only f+b (xla_dx)", feats_fb_dx, params, img1, img2)
    chain_time("lpips fwd-only (xla)", lpips_fwd, params, img1, img2)
    chain_time("lpips f+b no-normalize head", lpips_fb_nonorm, params,
               img1, img2)


if __name__ == "__main__":
    main()
