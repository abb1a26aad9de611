"""Stage-level breakdown of the FLAGSHIP hand train step on hardware.

Times each stage of the 131k/512^2/96^3-voxel step (the canonical train
CLI config) as its own chained-fori_loop program on the SAME scene, so the
next optimization target is measured, not guessed:

  full step | voxel resample | LBS f+b | SH colors f+b | projection f+b |
  binning | payload f+b | losses (L1+SSIM+iso) f+b | adam update

Run: python scripts/profile_flagship_step.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

from manus_tpu.models.gaussians import (  # noqa: E402
    get_covariance, get_features, get_opacity, get_scaling,
)
from manus_tpu.ops.rasterizer.api import calculate_colors_from_sh  # noqa: E402
from manus_tpu.ops.rasterizer.binning import bin_gaussians  # noqa: E402
from manus_tpu.ops.rasterizer.payload import build_payload  # noqa: E402
from manus_tpu.ops.rasterizer.projection import TILE, project_gaussians  # noqa: E402
from manus_tpu.ops.grid_sample import skinning_weights_from_voxel_grid  # noqa: E402
from manus_tpu.train import optim  # noqa: E402
from manus_tpu.train.workloads import forward_gaussians  # noqa: E402
from manus_tpu.utils import losses as loss_mod  # noqa: E402
from manus_tpu.utils.camera import index_camera  # noqa: E402

CAP = 1 << 17
RES = 512
VOX = 96


def chain_time(name, fn, *args):
    """Loop-carried chain: the scalar carry perturbs the float leaves of
    the FIRST argument each iteration (x + carry*1e-30), so no iteration
    is loop-invariant — XLA LICM hoists `carry + eps*fn(const_args)`
    chains entirely out of the loop and times nothing (CLAUDE.md)."""

    @jax.jit
    def chain(k, *a):
        def body(_, carry):
            a0 = jax.tree.map(
                lambda x: x + (carry * 1e-30).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                a[0],
            )
            return carry + fn(a0, *a[1:]) * 1e-12

        return jax.lax.fori_loop(0, k, body, jnp.asarray(0.0))

    t0 = time.time()
    np.asarray(chain(jnp.asarray(2), *args))
    tc = time.time() - t0

    def timed(k):
        t = time.time()
        np.asarray(chain(jnp.asarray(k), *args))
        return time.time() - t

    t2 = min(timed(2) for _ in range(2))
    t102 = min(timed(102) for _ in range(2))
    per = (t102 - t2) / 100 * 1e3
    print(f"{name:26s} {per:7.3f} ms/iter (compile {tc:.0f}s)", flush=True)
    return per


def main():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    step, state, batch, parts = bench.build_workload(
        "pallas", CAP, RES, RES, 1, voxel_res=VOX, return_parts=True,
    )
    cfg, vg = parts["cfg"], parts["voxel_grid"]
    opts = cfg.model
    params = state.model.params
    active = state.model.active
    bone_tf = batch["bone_tf"]
    cam = index_camera(batch["cameras"], 0)
    gt = batch["rgb"][0]

    # full step reference (fresh copy of state; step donates)
    t_full = None
    try:
        import copy

        st = jax.tree.map(jnp.copy, state)
        for _ in range(3):
            st, _m = step(st, batch)
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(10):
                st, _m = step(st, batch)
            np.asarray(_m["loss"])
            ts.append((time.time() - t0) / 10)
        t_full = min(ts) * 1e3
        print(f"{'full step':26s} {t_full:7.3f} ms/iter", flush=True)
        del st, copy
    except Exception as e:
        print(f"full step failed: {type(e).__name__}: {e}", flush=True)

    # 1. voxel resample (fwd only; it re-runs inside LBS f+b below).
    # The grid arrays travel as TRACED ARGS: the brick table is ~0.6 GB
    # and a closure capture lands in the tunnel compile request (413).
    def resample(xyz, c, s, w, bk):
        return jnp.sum(skinning_weights_from_voxel_grid(
            xyz, c, s, w, brick=bk
        )) * 1e-9

    chain_time("voxel resample fwd", resample, params.xyz,
               vg.center, vg.scale, vg.weights, vg.brick)

    def resample_fb(xyz, c, s, w, bk):
        v, g = jax.value_and_grad(resample)(xyz, c, s, w, bk)
        return v + jnp.sum(g) * 1e-9

    chain_time("voxel resample f+b", resample_fb, params.xyz,
               vg.center, vg.scale, vg.weights, vg.brick)

    # precompute skin weights (the step computes them OUTSIDE the grad,
    # matching the reference's zero-xyz-lr quirk)
    sw = jax.jit(skinning_weights_from_voxel_grid, static_argnames=())(
        params.xyz, vg.center, vg.scale, vg.weights, brick=vg.brick
    )

    # 2. LBS (skinning + covariance) f+b wrt params, sw constant
    def lbs(p, s):
        xyz, cov, tf = forward_gaussians(p, active, s, bone_tf, opts)
        return (jnp.sum(xyz) + jnp.sum(cov) + jnp.sum(tf)) * 1e-9

    def lbs_fb(p, s):
        v, g = jax.value_and_grad(lbs)(p, s)
        return v + sum(jnp.sum(x) * 1e-9 for x in jax.tree.leaves(g))

    chain_time("LBS+cov f+b", lbs_fb, params, sw)
    posed_xyz, posed_cov, tf = jax.jit(
        lambda p: forward_gaussians(p, active, sw, bone_tf, opts)
    )(params)
    feats = get_features(params)
    opac = get_opacity(params)

    # 3. SH colors f+b (canonical view dirs through inv(tf))
    def sh_fb(px, ft, ttf):
        def f(a, b, c):
            return jnp.sum(calculate_colors_from_sh(
                a, b, params.xyz, cam, opts.sh_degree, tf=c
            )) * 1e-9

        v, g = jax.value_and_grad(f, argnums=(0, 1, 2))(px, ft, ttf)
        return v + sum(jnp.sum(x) * 1e-9 for x in g)

    chain_time("SH colors f+b", sh_fb, posed_xyz, feats, tf)

    # 4. projection f+b
    def proj_fb(px, pc):
        def f(a, b):
            pr = project_gaussians(a, b, cam, active=active)
            return (jnp.sum(pr.means2d) + jnp.sum(pr.conic)
                    + jnp.sum(pr.depth)) * 1e-9

        v, g = jax.value_and_grad(f, argnums=(0, 1))(px, pc)
        return v + sum(jnp.sum(x) * 1e-9 for x in g)

    chain_time("projection f+b", proj_fb, posed_xyz, posed_cov)

    # 5. binning (int, fwd only)
    proj = jax.jit(lambda a, b: project_gaussians(a, b, cam, active=active))(
        posed_xyz, posed_cov
    )
    nt = RES // TILE
    rc = cfg.raster

    def binning(p):
        bins = bin_gaussians(p, nt, nt, rc.tg_max, 128,
                             rc.pair_budget_factor, rc.max_pairs_per_tile,
                             rc.multi_frac)
        # consume EVERY output: summing only tile_counts lets XLA DCE the
        # expensive pair_src sort and the probe under-measures
        return sum(
            jnp.sum(x).astype(jnp.float32) * 1e-9
            for x in jax.tree.leaves(bins)
        )

    chain_time("binning fwd", binning, proj)

    bins = jax.jit(
        lambda p: bin_gaussians(p, nt, nt, rc.tg_max, 128,
                                rc.pair_budget_factor,
                                rc.max_pairs_per_tile, rc.multi_frac)
    )(proj)
    print(f"  pair budget {bins.pair_src.shape[0]}", flush=True)

    # 6. payload f+b
    colors = jax.jit(lambda: calculate_colors_from_sh(
        posed_xyz, feats, params.xyz, cam, opts.sh_degree, tf=tf))()

    def payload_fb(m2d, con, col, op):
        def f(*a):
            return jnp.sum(build_payload(
                proj._replace(means2d=a[0], conic=a[1]), a[2], a[3],
                bins, rc.tg_max
            )) * 1e-9

        v, g = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(m2d, con, col, op)
        return v + sum(jnp.sum(x) * 1e-9 for x in g)

    chain_time("payload f+b", payload_fb, proj.means2d, proj.conic,
               colors, opac[:, 0] if opac.ndim == 2 else opac)

    # 7. losses (L1 + SSIM + isotropy) f+b at 512^2
    scaling = get_scaling(params, opts.isotropic_scaling)

    def losses_fb(img):
        def f(a):
            total, _ = loss_mod.compute_losses(
                a, gt, scaling, active,
                ("rgb_loss", "ssim_loss", "isotropic_reg"), (0.8, 0.2, 0.1),
                opts.condition_number,
            )
            return total

        v, g = jax.value_and_grad(f)(img)
        return v + jnp.sum(g) * 1e-9

    img0 = jnp.clip(gt + 0.01, 0, 1)
    chain_time("losses f+b", losses_fb, img0)

    # 8. adam update over the full param pytree
    opt = state.opt
    grads = jax.tree.map(jnp.ones_like, params)
    lrs = optim.group_learning_rates(opts, jnp.asarray(100, jnp.int32))

    def adam(p, g, o):
        newp, newo = optim.adam_update(p, g, o, lrs, active)
        return sum(jnp.sum(x) * 1e-12 for x in jax.tree.leaves(newp))

    try:
        chain_time("adam update", adam, params, grads, opt)
    except Exception as e:
        print(f"adam probe skipped: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
