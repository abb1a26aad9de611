"""Same-session A/B: composite backward pre- vs post-cotangent-fusion.

VERDICT r4 item 2 asks for a same-session before/after chained-loop
table for the ea4fa74 fusion (the r3 roofline's "~2-3x kernel headroom"
candidate). Cross-session absolute numbers are meaningless on the
tunneled platform (throughput swings >4x between sessions), so this
script times BOTH kernel versions in one process on one scene:
  * "fused":    the current pallas_backend (5 shared reductions);
  * "prefused": the pre-ea4fa74 file, materialized from git into a
    sibling module (the only diff between the two is the cotangent
    block — verified: git log shows exactly one commit on the file).
Also prints a 2048^2 chained-matmul probe so the session's throughput
is on record next to the numbers.

Run: python scripts/ab_composite_fusion.py
"""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

from manus_tpu.config import hand_config  # noqa: E402
from manus_tpu.models.gaussians import (  # noqa: E402
    get_features, get_opacity,
)
from manus_tpu.ops.rasterizer import pallas_backend as fused_mod  # noqa: E402
from manus_tpu.ops.rasterizer.api import (  # noqa: E402
    calculate_colors_from_sh,
)
from manus_tpu.ops.rasterizer.binning import bin_gaussians  # noqa: E402
from manus_tpu.ops.rasterizer.payload import build_payload  # noqa: E402
from manus_tpu.ops.rasterizer.projection import (  # noqa: E402
    TILE, project_gaussians,
)
from manus_tpu.train.workloads import forward_gaussians  # noqa: E402
from manus_tpu.utils.camera import index_camera  # noqa: E402

PREFUSION_REV = "ea4fa748d128a035343fd6c2743b8b9c81944180~1"


def load_prefusion_module():
    src = subprocess.check_output(
        ["git", "show",
         f"{PREFUSION_REV}:manus_tpu/ops/rasterizer/pallas_backend.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).decode()
    path = "/tmp/pallas_backend_prefusion.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(
        "pallas_backend_prefusion", path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def probe():
    n = 2048
    a = jnp.asarray(
        np.random.RandomState(0).normal(0, 1.0 / n, (n, n)), jnp.float32
    )

    @jax.jit
    def chain(y, k):
        return jax.lax.fori_loop(0, k, lambda i, y: y @ a, y)

    y0 = jnp.ones((n, n), jnp.float32)
    np.asarray(chain(y0, jnp.asarray(4)))
    t0 = time.perf_counter()
    np.asarray(chain(y0, jnp.asarray(4)))
    tlo = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(chain(y0, jnp.asarray(68)))
    thi = time.perf_counter() - t0
    per = (thi - tlo) / 64
    print(f"session probe: 2048^2 matmul {per * 1e3:.3f} ms/iter "
          f"({2 * 2048**3 / per / 1e12:.1f} TFLOP/s)", flush=True)


def chain_time(name, fn, payload, *args, iters=100):
    @jax.jit
    def chain(k, payload, *a):
        def body(_, carry):
            p = payload + (carry * 1e-30)
            return carry + fn(p, *a) * 1e-12

        return jax.lax.fori_loop(0, k, body, jnp.asarray(0.0))

    np.asarray(chain(jnp.asarray(2), payload, *args))

    def timed(k):
        t = time.perf_counter()
        np.asarray(chain(jnp.asarray(k), payload, *args))
        return time.perf_counter() - t

    t2 = min(timed(2) for _ in range(2))
    thi = min(timed(2 + iters) for _ in range(2))
    per = (thi - t2) / iters * 1e3
    print(f"{name:34s} {per:8.4f} ms/iter", flush=True)
    return per


def main():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    probe()
    cap, res = 1 << 16, 512

    step, state, batch = bench.build_workload("pallas", cap, res, res, 1)
    cfg = hand_config()
    params = state.model.params
    active = state.model.active
    opts = cfg.model
    cam = index_camera(batch["cameras"], 0)
    sw = state.model.skin_weights
    posed_xyz, posed_cov, tf = jax.jit(
        lambda p: forward_gaussians(p, active, sw, batch["bone_tf"], opts)
    )(params)
    colors = jax.jit(lambda: calculate_colors_from_sh(
        posed_xyz, get_features(params), params.xyz, cam, opts.sh_degree,
        tf=tf))()
    opac = get_opacity(params)
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
    first = offs // 128
    endc = -(-(offs + cnts) // 128)
    n_visits = int(np.where(cnts > 0, endc - first, 0).sum())
    print(f"pairs={int(cnts.sum())} chunk-visits={n_visits}", flush=True)

    prefused_mod = load_prefusion_module()
    results = {}
    for label, mod in (("fused (HEAD)", fused_mod),
                       ("prefused (ea4fa74~1)", prefused_mod)):
        def fwd(payload, offs, cnts, _mod=mod):
            rgb, tfin = _mod.composite_tiles_pallas(
                payload, offs, cnts, nt, nt, tile=TILE, chunk=128
            )
            return (jnp.sum(rgb) + jnp.sum(tfin)) * 1e-9

        def fb(payload, offs, cnts, _fwd=fwd):
            v, g = jax.value_and_grad(_fwd)(payload, offs, cnts)
            return v + jnp.sum(g) * 1e-9

        t_fwd = chain_time(f"{label} fwd", fwd, pay, bins.tile_offsets,
                           bins.tile_counts)
        t_fb = chain_time(f"{label} f+b", fb, pay, bins.tile_offsets,
                          bins.tile_counts)
        results[label] = (t_fwd, t_fb)
        print(f"{label}: bwd-only {(t_fb - t_fwd) / n_visits * 1e3:.3f} "
              f"us/chunk-visit", flush=True)

    (f_fwd, f_fb) = results["fused (HEAD)"]
    (p_fwd, p_fb) = results["prefused (ea4fa74~1)"]
    print(
        f"SUMMARY (same session): bwd-only fused "
        f"{(f_fb - f_fwd) * 1e3 / n_visits:.3f} vs prefused "
        f"{(p_fb - p_fwd) * 1e3 / n_visits:.3f} us/chunk-visit "
        f"(ratio {(f_fb - f_fwd) / max(p_fb - p_fwd, 1e-9):.2f})",
        flush=True,
    )
    probe()  # session drift check


if __name__ == "__main__":
    main()
