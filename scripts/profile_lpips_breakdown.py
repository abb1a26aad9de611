"""Decompose the pallas LPIPS cost on hardware: fwd vs bwd vs head vs convs.

Four chained-fori_loop timings (CLAUDE.md methodology), each one tunnel
compile:
  1. lpips f+b            (the train-step cost)
  2. lpips fwd only       (isolates the custom-VJP dx sweeps)
  3. vgg features fwd, 1 image, no head (isolates the head + second image)
  4. same via XLA fp32 convs (the baseline per-component comparison)

Run: python scripts/profile_lpips_breakdown.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from manus_tpu.train.lpips import (  # noqa: E402
    lpips_distance_pallas,
    random_lpips_params,
    vgg16_features_pallas,
    vgg16_features,
)

H = W = 512


def chain_time(name, fn, params, img1, img2):
    """fn(params, x1, x2) -> scalar-ish; chained with a tiny carry nudge."""

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
    print(f"{name:28s} {per:7.2f} ms/iter (compile {tc:.0f}s)", flush=True)
    return per


def main():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    params = random_lpips_params(0)
    rng = np.random.RandomState(3)
    img1 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    def fb(p, x1, x2):
        v, g = jax.value_and_grad(
            lambda a: lpips_distance_pallas(p, a, x2)
        )(x1)
        return v + 1e-6 * jnp.mean(g)

    def fwd(p, x1, x2):
        return lpips_distance_pallas(p, x1, x2)

    def feats1(p, x1, x2):
        fs = vgg16_features_pallas(p, x1 * 2.0 - 1.0)
        return sum(jnp.mean(f.astype(jnp.float32)) for f, _L in fs)

    def feats1_xla(p, x1, x2):
        fs = vgg16_features(p, (x1 * 2.0 - 1.0)[None])
        return sum(jnp.mean(f) for f in fs)

    r = {}
    r["fb"] = chain_time("lpips pallas f+b", fb, params, img1, img2)
    r["fwd"] = chain_time("lpips pallas fwd", fwd, params, img1, img2)
    r["feats1"] = chain_time("vgg feats pallas fwd x1", feats1, params,
                             img1, img2)
    r["feats1_xla"] = chain_time("vgg feats xla fp32 fwd x1", feats1_xla,
                                 params, img1, img2)
    print(f"\nderived: bwd = {r['fb'] - r['fwd']:.2f} ms, "
          f"head+2nd-image = {r['fwd'] - 2 * r['feats1']:.2f} ms "
          f"(head alone if images symmetric: "
          f"{r['fwd'] - 2 * r['feats1']:.2f}), "
          f"per-image conv stack = {r['feats1']:.2f} ms "
          f"(xla {r['feats1_xla']:.2f})", flush=True)


if __name__ == "__main__":
    main()
