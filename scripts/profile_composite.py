"""Composite-kernel profiling on hardware: fwd and f+b per chunk-visit.

VERDICT r4 item 2: the r3 roofline measured the composite BACKWARD at
~4-5 us/chunk against a ~1.7 us VPU/MXU work estimate, and the
cotangent-fusion commit (ea4fa74) landed without a post-fusion
re-measurement. This script times the composite stage alone (chained
fori_loop, loop-carried payload perturbation, host readback fence) on
the bench scene (65k/512^2) and reports per-chunk-visit numbers the
PARITY roofline table can be updated from.

Run: python scripts/profile_composite.py [--cap 65536] [--res 512]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

from manus_tpu.ops.rasterizer.binning import bin_gaussians  # noqa: E402
from manus_tpu.ops.rasterizer.pallas_backend import (  # noqa: E402
    composite_tiles_pallas,
)
from manus_tpu.ops.rasterizer.payload import build_payload  # noqa: E402
from manus_tpu.ops.rasterizer.projection import (  # noqa: E402
    TILE,
    project_gaussians,
)
from manus_tpu.models.gaussians import (  # noqa: E402
    get_covariance, get_features, get_opacity,
)
from manus_tpu.ops.rasterizer.api import (  # noqa: E402
    calculate_colors_from_sh,
)
from manus_tpu.train.workloads import forward_gaussians  # noqa: E402
from manus_tpu.utils.camera import index_camera  # noqa: E402


ITERS = 100


def chain_time(name, fn, payload, *args, iters=None):
    """Chained loop with a loop-carried payload perturbation (CLAUDE.md:
    `carry + eps*fn(const)` is LICM-hoistable and times nothing)."""

    @jax.jit
    def chain(k, payload, *a):
        def body(_, carry):
            p = payload + (carry * 1e-30)
            return carry + fn(p, *a) * 1e-12

        return jax.lax.fori_loop(0, k, body, jnp.asarray(0.0))

    t0 = time.time()
    np.asarray(chain(jnp.asarray(2), payload, *args))
    tc = time.time() - t0

    def timed(k):
        t = time.time()
        np.asarray(chain(jnp.asarray(k), payload, *args))
        return time.time() - t

    iters = iters or ITERS
    t2 = min(timed(2) for _ in range(2))
    thi = min(timed(2 + iters) for _ in range(2))
    per = (thi - t2) / iters * 1e3
    print(f"{name:28s} {per:8.4f} ms/iter (compile {tc:.0f}s)", flush=True)
    return per


def main():
    global ITERS
    cap = 1 << 16
    res = 512
    if "--cap" in sys.argv:
        cap = int(sys.argv[sys.argv.index("--cap") + 1])
    if "--res" in sys.argv:
        res = int(sys.argv[sys.argv.index("--res") + 1])
    if "--iters" in sys.argv:
        ITERS = int(sys.argv[sys.argv.index("--iters") + 1])
    print(f"platform: {jax.devices()[0].platform}  cap={cap} res={res}",
          flush=True)

    step, state, batch = bench.build_workload("pallas", cap, res, res, 1)
    from manus_tpu.config import hand_config

    cfg = hand_config()
    rc = cfg.raster
    params = state.model.params
    active = state.model.active
    opts = cfg.model
    cam = index_camera(batch["cameras"], 0)
    sw = state.model.skin_weights
    posed_xyz, posed_cov, tf = jax.jit(
        lambda p: forward_gaussians(p, active, sw, batch["bone_tf"], opts)
    )(params)
    feats = get_features(params)
    opac = get_opacity(params)
    colors = jax.jit(lambda: calculate_colors_from_sh(
        posed_xyz, feats, params.xyz, cam, opts.sh_degree, tf=tf))()
    proj = jax.jit(lambda a, b: project_gaussians(a, b, cam, active=active))(
        posed_xyz, posed_cov
    )
    nt = res // TILE
    bins = jax.jit(lambda p: bin_gaussians(
        p, nt, nt, 64, 128, 2, 4096, 0.25
    ))(proj)
    pay = jax.jit(lambda: build_payload(
        proj, colors, opac[:, 0] if opac.ndim == 2 else opac, bins, 64
    ))()

    offs = np.asarray(bins.tile_offsets)
    cnts = np.asarray(bins.tile_counts)
    chunk = 128
    first = offs // chunk
    endc = -(-(offs + cnts) // chunk)
    visits = np.where(cnts > 0, endc - first, 0)
    n_visits = int(visits.sum())
    n_tiles_nonempty = int((cnts > 0).sum())
    print(f"pairs={int(cnts.sum())} chunk-visits={n_visits} "
          f"non-empty tiles={n_tiles_nonempty}/{nt * nt}", flush=True)

    def fwd(payload, offs, cnts):
        rgb, tfin = composite_tiles_pallas(
            payload, offs, cnts, nt, nt, tile=TILE, chunk=chunk
        )
        return (jnp.sum(rgb) + jnp.sum(tfin)) * 1e-9

    t_fwd = chain_time("composite fwd", fwd, pay, bins.tile_offsets,
                       bins.tile_counts)

    def fb(payload, offs, cnts):
        v, g = jax.value_and_grad(fwd)(payload, offs, cnts)
        return v + jnp.sum(g) * 1e-9

    t_fb = chain_time("composite f+b", fb, pay, bins.tile_offsets,
                      bins.tile_counts)

    t_bwd = t_fb - t_fwd
    print(
        f"per chunk-visit: fwd {t_fwd / n_visits * 1e3:.3f} us, "
        f"f+b {t_fb / n_visits * 1e3:.3f} us, "
        f"bwd-only {t_bwd / n_visits * 1e3:.3f} us "
        f"(bwd walks only k<=k_stop chunks; treat as upper bound)",
        flush=True,
    )


if __name__ == "__main__":
    main()
