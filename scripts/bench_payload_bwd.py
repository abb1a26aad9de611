"""Microbench: payload fwd+bwd at bench scale on the real chip.

Times _gather_pairs (payload.py) forward and forward+backward with the
chained-fori_loop methodology (CLAUDE.md): traced loop bound, per-iter =
(t(n=22) - t(n=2)) / 20, host readback inside the timed region.

History: the round-2 pair-major backward ([P+N, 16] arrays) measured
~1.7 ms bwd / 2.3 ms f+b at 65k gaussians x 262k pair budget; rank-2 f32
with a 16-lane minor dim is physically padded to 128 lanes by the TPU
(8, 128) tiling, so every pass moved ~8x the live bytes. The field-major
rewrite carries the 9 live fields through the sorts as extra operands.

Run: python scripts/bench_payload_bwd.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from utils import make_test_camera, random_scene  # noqa: E402

from manus_tpu.ops.rasterizer import payload as pm  # noqa: E402
from manus_tpu.ops.rasterizer.binning import bin_gaussians  # noqa: E402
from manus_tpu.ops.rasterizer.projection import TILE, project_gaussians  # noqa: E402

N = 65536
RES = 512
TG_MAX = 64


def chain_time(name, fn, *args):
    @jax.jit
    def chain(n, *a):
        def body(_, carry):
            return carry + 1e-12 * fn(*a)

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0))

    t0 = time.time()
    np.asarray(chain(jnp.asarray(2), *args))
    tc = time.time() - t0

    def timed(k):
        t = time.time()
        np.asarray(chain(jnp.asarray(k), *args))
        return time.time() - t

    t2 = min(timed(2) for _ in range(2))
    t22 = min(timed(22) for _ in range(2))
    per = (t22 - t2) / 20 * 1e3
    print(f"{name:24s} {per:7.3f} ms/iter (compile {tc:.0f}s)", flush=True)
    return per


def main():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    scene = random_scene(N, seed=7)
    cam = make_test_camera(RES, RES)
    means = jnp.asarray(scene["means"])
    cov6 = jnp.asarray(scene["cov6"])
    colors = jnp.asarray(scene["colors"])
    opacity = jnp.asarray(scene["opacity"])

    proj = jax.jit(project_gaussians)(means, cov6, cam)
    nt = RES // TILE
    bins = jax.jit(
        lambda p: bin_gaussians(p, nt, nt, TG_MAX, 128, 4, 4096)
    )(proj)
    print(f"pairs budget: {bins.pair_src.shape[0]}", flush=True)
    src = bins.pair_src

    def fwd(m2d, con, col, op):
        pay = pm._gather_pairs(TG_MAX, m2d, con, col, op, src)
        return jnp.sum(pay * 1e-6)

    def fb(m2d, con, col, op):
        v, g = jax.value_and_grad(fwd, argnums=(0, 1, 2, 3))(
            m2d, con, col, op
        )
        return v + sum(jnp.sum(x) * 1e-9 for x in g)

    t_f = chain_time("payload fwd", fwd, proj.means2d, proj.conic,
                     colors, opacity)
    t_fb = chain_time("payload fwd+bwd", fb, proj.means2d, proj.conic,
                      colors, opacity)
    print(f"derived bwd: {t_fb - t_f:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
