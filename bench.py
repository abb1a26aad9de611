"""Benchmark: hand-module training-step throughput on real TPU hardware.

Fixed workload across rounds so the driver's BENCH_r{N}.json history is
comparable: articulated hand model (LBS + SH + differentiable tiled
raster + masked Adam), 65,536 active gaussians, 512x512 render, one view
per step, fp32 — the flagship configuration of this framework
(BASELINE.md: rays/s/chip + train iters/s on the MANUS hand module).

Prints ONE JSON line on EVERY exit path (BENCH_r03 regression: the
process died with rc 1 and no JSON when the device threw):
  {"metric": "hand_train_iters_per_s", "value": ..., "unit": "iters/s",
   "vs_baseline": ...}
On total measurement failure `value` is null and `error` says why.

vs_baseline = measured speedup of the Pallas raster path over the pure-XLA
fallback path on the same workload (the reference's CUDA numbers are not
published — BASELINE.md — so the in-repo XLA implementation is the
baseline the kernel work is judged against). When the XLA fallback was
not measured this session, vs_baseline is null (a stale cross-session
constant drifted as kernels changed; VERDICT r3 weak 6).

Architecture (VERDICT r3 item 1 + r4 item 1): the orchestrator (default
entry) runs every measurement in a FRESH SUBPROCESS (`bench.py --section
NAME`). BENCH_r03's failure tail showed instant repeat failures after the
first device error — a poisoned in-process device context that sleep()
cannot fix; process isolation can. Sections are ordered by DECISION VALUE
(round-5 reorder — the driver killed two rounds' runs at ~1800s while the
plan assumed 3900s, losing vs_baseline + flagship every time):

  probe -> [primary pallas -> xla fallback]   (one child; vs_baseline)
        -> [flagship voxel -> flagship lpips] (one child)
        -> object -> 720p (LAST: the most expensive compile, ~840s, and
                           the least decision-relevant number)

Chained children emit PARTIAL result lines as each measurement lands, and
run_sub recovers those partials from the pipe buffer even when the child
is killed on timeout — a mid-chain timeout keeps everything already
measured. The default budget (1650s) now fits the driver's observed
~1800s window; a shorter outer window just truncates the chain (the
SIGTERM handler flushes the snapshot as the JSON line).
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

_T0 = time.perf_counter()

# Progressive snapshot (round 4): every measured field lands in _STATE as
# soon as its section completes (round 5: including partial results
# recovered from timed-out chained children). A SIGTERM/SIGINT from the
# driver's outer timeout triggers _emit_and_exit, which prints the
# snapshot as THE json line — so even a killed bench reports everything
# measured so far instead of nothing (BENCH_r01-r03 each lost fields to
# exactly this).
_STATE: dict = {}
_CURRENT_CHILD = None
_GT_JOBS: dict = {}
_FINAL_EMITTED = False
_HANDLED_SIGS = (signal.SIGTERM, signal.SIGINT, signal.SIGHUP)


@contextlib.contextmanager
def _signals_blocked():
    """Mask the handled signals for a critical section (ADVICE r4: a
    signal landing between Popen() and the child-handle assignment leaked
    a live TPU child; one landing mid-final-print truncated the JSON
    line). No-op where pthread_sigmask is unavailable."""
    try:
        old = signal.pthread_sigmask(signal.SIG_BLOCK, set(_HANDLED_SIGS))
    except (AttributeError, ValueError, OSError):
        old = None
    try:
        yield
    finally:
        if old is not None:
            signal.pthread_sigmask(signal.SIG_SETMASK, old)


def _emit_snapshot(extra_error: str | None = None) -> None:
    global _FINAL_EMITTED
    if _FINAL_EMITTED:
        return
    st = dict(_STATE) if _STATE else {"on_tpu": False, "errors": []}
    if extra_error:
        st.setdefault("errors", []).append(extra_error)
    print(json.dumps(assemble(st)), flush=True)
    # flag AFTER the print completes (ADVICE r4: setting it first meant a
    # signal arriving mid-print skipped emission entirely in the handler)
    _FINAL_EMITTED = True


def _emit_and_exit(signum, frame):  # noqa: ARG001
    # block further handled signals so a second kill cannot re-enter the
    # handler mid-print or mid-reap
    try:
        signal.pthread_sigmask(signal.SIG_BLOCK, set(_HANDLED_SIGS))
    except (AttributeError, ValueError, OSError):
        pass
    _emit_snapshot(f"killed by signal {signum} at t={time.perf_counter() - _T0:.0f}s")
    try:
        child = _CURRENT_CHILD
        if child is not None and child.poll() is None:
            child.kill()  # exact PID we spawned, never a pattern
        for p in list(_GT_JOBS.values()):  # CPU-only GT renders; same rule
            if p.poll() is None:
                p.kill()
    except Exception:
        pass  # the contract line is already out; never abort the exit path
    os._exit(0)


def note(msg: str) -> None:
    print(f"[bench] {msg} (t={time.perf_counter() - _T0:.0f}s)",
          file=sys.stderr, flush=True)


def emit_partial(**kv) -> None:
    """Child-side: flush one completed measurement to stdout immediately.
    The orchestrator merges these into its snapshot even if this child is
    later killed on timeout (run_sub scans the buffered pipe output)."""
    print(json.dumps({"partial": kv}), flush=True)


# ---------------------------------------------------------------------------
# Workload builders (run inside section subprocesses)
# ---------------------------------------------------------------------------


def build_object_workload(backend: str, capacity: int, width: int,
                          height: int, views: int):
    """Static object module at the same scale (BASELINE configs 1-2)."""
    import jax.numpy as jnp

    from manus_tpu.config import object_config
    from manus_tpu.data.synthetic import hemisphere_cameras
    from manus_tpu.models.gaussians import init_gaussian_model
    from manus_tpu.train.workloads import init_train_state, make_train_step
    from manus_tpu.utils.camera import index_camera, stack_cameras

    rng = np.random.RandomState(0)
    u = rng.normal(size=(capacity, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pts = (u * rng.uniform(0.3, 0.5, (capacity, 1))).astype(np.float32)
    cols = rng.uniform(0, 1, (capacity, 3)).astype(np.float32)

    cfg = object_config()
    cfg.capacity = capacity
    cfg.dataset.width, cfg.dataset.height = width, height
    cfg.model = dataclasses.replace(cfg.model, remove_seg_end=0)
    cfg.raster = dataclasses.replace(
        cfg.raster, backend=backend, tg_max=64, max_pairs_per_tile=4096,
        chunk=64, pallas_chunk=128, pair_budget_factor=2, multi_frac=0.25,
    )
    model = init_gaussian_model(pts, cols, capacity)
    cams = stack_cameras(
        hemisphere_cameras(max(views, 4), width, height, dist=2.0)
    )
    gt = render_gt(model, cams, views, width, height, None, backend)
    state = init_train_state(perturb_model(model))
    train_step = make_train_step(cfg, extent=1.0, articulated=False)
    batch = {
        "rgb": gt,
        "mask": jnp.ones((views, height, width, 1), jnp.float32),
        "cameras": index_camera(cams, np.arange(views)),
        "bg": jnp.zeros(3, jnp.float32),
    }
    return train_step, state, batch


def render_gt(model, cameras, views, width, height, bone_tf, backend,
              voxel_grid=None):
    """Render a real synthetic GT image set from the UNPERTURBED model so
    the bench loss landscape (and backward sparsity / early-exit
    behaviour) matches a converging scene instead of a constant field."""
    import jax
    import jax.numpy as jnp

    from manus_tpu.models.gaussians import (
        get_covariance, get_features, get_opacity,
    )
    from manus_tpu.ops.rasterizer.api import RasterConfig, render_gaussians
    from manus_tpu.ops.skinning import skin_gaussians
    from manus_tpu.train.workloads import resolve_skin_weights
    from manus_tpu.utils.camera import index_camera

    cfg = RasterConfig(backend=backend, tg_max=64, max_pairs_per_tile=4096,
                       chunk=64, pallas_chunk=128, pair_budget_factor=4,
                       multi_frac=0.25)

    # voxel grid as traced arg, not closure (compile payload size)
    @jax.jit
    def one(cam, vg):
        params = model.params
        cov = get_covariance(params)
        if bone_tf is not None:
            skin_w = resolve_skin_weights(model, vg)
            sk = skin_gaussians(params.xyz, cov, skin_w, bone_tf)
            posed, cov, tf = sk.posed_xyz, sk.posed_cov, sk.tf
        else:
            posed, tf = params.xyz, None
        out = render_gaussians(
            posed, cov, params.xyz, get_features(params),
            get_opacity(params), cam, jnp.zeros(3), sh_degree=3, tf=tf,
            active=model.active, config=cfg,
        )
        return out.render

    imgs = [
        np.asarray(one(index_camera(cameras, i), voxel_grid))
        for i in range(views)
    ]
    return jnp.asarray(np.clip(np.stack(imgs), 0, 1), jnp.float32)


def perturb_model(model, seed=1, pos_sigma=0.004, col_sigma=0.1):
    """Jitter the benched model away from the GT renderer's params so the
    photometric loss and its gradients are realistically nonzero."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    params = model.params._replace(
        xyz=model.params.xyz
        + jnp.asarray(rng.normal(0, pos_sigma, model.params.xyz.shape),
                      jnp.float32),
        features_dc=model.params.features_dc
        + jnp.asarray(
            rng.normal(0, col_sigma, model.params.features_dc.shape),
            jnp.float32,
        ),
    )
    return model._replace(params=params)


def build_workload(backend: str, capacity: int, width: int, height: int,
                   views: int, gt=None, voxel_res: int = 0,
                   lpips_params=None, return_parts: bool = False,
                   voxel_grid=None):
    """Hand-module training workload.

    voxel_res > 0 builds the FLAGSHIP configuration: a res^3 MANO voxel
    skinning grid (brick table included) resampled every step — the
    canonical train-CLI hand config at 131k/512^2/96^3. lpips_params
    additionally turns the VGG LPIPS loss on from step 0 (the canonical
    loss past start_lpips_iter), routed through the Pallas conv stack.
    return_parts additionally returns the cfg/model/voxel grid pieces so
    profiling scripts can time individual step stages on the same scene.
    """
    import jax
    import jax.numpy as jnp

    from manus_tpu.config import hand_config
    from manus_tpu.data.synthetic import (
        load_reference_skeleton,
        procedural_skeleton,
        sample_gaussians_on_bones,
    )
    from manus_tpu.models.gaussians import init_gaussian_model
    from manus_tpu.train.workloads import init_train_state, make_train_step
    from manus_tpu.utils.camera import index_camera, stack_cameras
    from manus_tpu.data.synthetic import hemisphere_cameras
    from manus_tpu.ops.skinning import bone_deformation_transforms
    from manus_tpu.utils.structures import Bones

    skel = None
    if voxel_res:
        # flagship uses the reference's real 20-bone skeleton so the MANO
        # voxel grid geometry matches the canonical hand config
        skel = load_reference_skeleton()
    if skel is None:
        skel = procedural_skeleton(8)
    j = len(skel["bnames"])
    per_bone = capacity // (j + j // 2)  # bones + joints sampling ratio
    pts, cols = sample_gaussians_on_bones(
        skel["rest_heads"], skel["rest_tails"], skel["rest_transforms"],
        per_bone, seed=0,
    )
    pts, cols = pts[:capacity], cols[:capacity]
    rng = np.random.RandomState(0)
    skin = rng.dirichlet(np.ones(j) * 0.1, size=pts.shape[0]).astype(np.float32)

    cfg = hand_config()
    cfg.capacity = capacity
    cfg.dataset.width, cfg.dataset.height = width, height
    losses = ("rgb_loss", "ssim_loss", "isotropic_reg")
    weights = (0.8, 0.2, 0.1)
    if lpips_params is not None:
        losses += ("lpips_loss",)
        weights += (0.1,)
    cfg.loss = dataclasses.replace(
        cfg.loss, losses=losses, loss_weight=weights,
    )
    cfg.model = dataclasses.replace(
        cfg.model, remove_seg_end=0, start_lpips_iter=0
    )
    cfg.raster = dataclasses.replace(
        cfg.raster, backend=backend, tg_max=64, max_pairs_per_tile=4096,
        chunk=64, pallas_chunk=128, pair_budget_factor=2, multi_frac=0.25,
    )

    if voxel_res:
        if voxel_grid is None:
            # EXPENSIVE on the tunneled device (~900s measured round 5:
            # a ~1M-point KNN + 0.6GB brick staging): the orchestrator's
            # host GT child pre-builds the grid and ships it in the npz
            from manus_tpu.data.voxel import build_voxel_grid

            kp_rest = np.concatenate(
                [skel["rest_heads"][:1], skel["rest_tails"]]
            )
            voxel_grid = build_voxel_grid(
                kp_rest, res=voxel_res, num_bones=j
            )
        skin = None  # voxel mode resamples weights from the grid per step
    else:
        voxel_grid = None
    model = init_gaussian_model(pts, cols, capacity, skin_weights=skin)

    center = skel["rest_heads"].mean(axis=0)
    span = np.linalg.norm(skel["rest_tails"] - skel["rest_heads"], axis=1).sum()
    cams = hemisphere_cameras(
        max(views, 4), width, height, dist=max(1.0, 2.0 * span / 4),
        center=center,
    )
    cameras = stack_cameras(cams)
    frame = 3 % skel["pose_transforms"].shape[0]
    bone_tf = bone_deformation_transforms(
        jnp.asarray(skel["pose_transforms"][frame]),
        jnp.asarray(skel["rest_transforms"]),
        append_identity=voxel_grid is not None,
    )
    kp = np.concatenate(
        [skel["pose_heads"][frame][:1], skel["pose_tails"][frame]]
    )

    # GT rendered from the clean model; the benched model is perturbed so
    # the loss landscape matches a real training scene (VERDICT r1).
    # Callers benchmarking a second backend on the same scene pass the
    # previous build's gt through: the target image is backend-agnostic
    # and each skipped GT render saves a full jit compile (~30-200s on
    # the tunneled platform, where compile latency varies wildly).
    if gt is None:
        gt = render_gt(model, cameras, views, width, height, bone_tf,
                       backend, voxel_grid=voxel_grid)
    state = init_train_state(perturb_model(model))
    train_step = make_train_step(
        cfg, extent=1.0, articulated=True, voxel_grid=voxel_grid,
        lpips_params=lpips_params,
    )
    batch = {
        "rgb": gt,
        "mask": jnp.ones((views, height, width, 1), jnp.float32),
        "cameras": index_camera(cameras, np.arange(views)),
        "bg": jnp.zeros(3, jnp.float32),
        "bone_tf": bone_tf,
        "keypoints": jnp.asarray(kp, jnp.float32),
    }
    if lpips_params is not None:
        # production trainers cache the gt LPIPS features (exact; see
        # trainer._build_lpips_feat_cache) — the bench measures the same
        from manus_tpu.train.lpips import (
            lpips_features, resolve_lpips_engine,
        )

        eng = resolve_lpips_engine(cfg.loss.lpips_conv, lpips_params)
        feat_fn = jax.jit(lambda p, im: lpips_features(p, im, eng))
        per_view = [feat_fn(lpips_params, gt[i]) for i in range(views)]
        batch["lpips_gt_feats"] = tuple(
            jnp.stack([per_view[i][s] for i in range(views)])
            for s in range(len(per_view[0]))
        )
    if return_parts:
        parts = dict(cfg=cfg, voxel_grid=voxel_grid, model=model,
                     cameras=cameras, bone_tf=bone_tf, extent=1.0)
        return train_step, state, batch, parts
    return train_step, state, batch


def time_iters(train_step, state, batch, warmup: int, iters: int,
               want_mem: bool = False):
    """Time the serially-dependent step chain; optionally AOT-compile via
    jit.lower().compile() first so the executable's memory_analysis()
    fills peak_hbm_mb (VERDICT r4 missing #4 — runtime memory_stats()
    returns nothing through the axon tunnel, but the compile-side
    analysis is server-computed and always available). The AOT compile IS
    the one compile (the timed calls reuse it); on any AOT failure we
    fall back to the plain jitted path (second compile — callers pass
    want_mem only on first attempts).

    NOTE: force actual host readbacks around the timed region —
    block_until_ready does not reliably synchronize on the tunneled
    axon TPU platform, and async dispatch would otherwise make the
    loop measure enqueue time only. Steps are serially dependent
    (state feeds state), so one trailing readback fences all of them.

    Returns (iters_per_s, mem_mb_or_None)."""
    mem_mb = None
    fn = train_step
    if want_mem:
        jitted = getattr(train_step, "_jitted", None)
        extra = getattr(train_step, "_extra_args", ())
        if jitted is not None:
            try:
                compiled = jitted.lower(state, batch, *extra).compile()
                ma = compiled.memory_analysis()
                live = (getattr(ma, "argument_size_in_bytes", 0)
                        + getattr(ma, "output_size_in_bytes", 0)
                        + getattr(ma, "temp_size_in_bytes", 0)
                        - getattr(ma, "alias_size_in_bytes", 0))
                if live > 0:
                    mem_mb = round(live / (1 << 20))

                def fn(s, b):
                    return compiled(s, b, *extra)
            except Exception as e:  # AOT unsupported -> plain jit path
                note(f"aot memory_analysis unavailable: "
                     f"{type(e).__name__}: {e}")
                fn, mem_mb = train_step, None
    for _ in range(warmup):
        state, metrics = fn(state, batch)
    np.asarray(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = fn(state, batch)
    loss = float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), "non-finite loss in bench"
    return iters / dt, mem_mb


# ---------------------------------------------------------------------------
# Sections (child-process mode): each measures one thing and prints one
# JSON line {"ok": true, "results": {...}} / {"ok": false, "error": "..."}.
# Chained sections additionally emit {"partial": {...}} lines as each
# inner measurement completes.
# ---------------------------------------------------------------------------


def section_probe(opts):
    """Trivial device op + host readback proves the tunnel/chip is alive
    before the expensive workloads compile, then a chained 2048^2 matmul
    loop (traced fori_loop bound; loop-carried dependency) measures this
    SESSION's device throughput — the normalizer that makes artifact
    numbers comparable across rounds despite the tunnel's documented
    ±20% session swings (VERDICT r4 weak 6)."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256), jnp.float32)
    v = float(np.asarray(x @ x)[0, 0])
    assert abs(v - 256.0) < 1e-3, f"probe matmul wrong: {v}"
    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0])}
    if out["backend"] != "tpu":
        return out  # the normalizer is a TPU-session number; skip on CPU

    try:
        n = 2048
        a = jnp.asarray(
            np.random.RandomState(0).normal(0, 1.0 / n, (n, n)), jnp.float32
        )

        @jax.jit
        def chain(y, k):
            return jax.lax.fori_loop(0, k, lambda i, y: y @ a, y)

        # the timed region must dwarf the 40-80ms tunnel readback noise:
        # 4096 iters x ~50-900us each = 0.2-4s. 64-iter versions measured
        # NEGATIVE repeatedly (round-5 probes).
        y0 = jnp.ones((n, n), jnp.float32)
        k_lo, k_hi = jnp.asarray(64), jnp.asarray(64 + 4096)
        np.asarray(chain(y0, k_lo))  # compile + warm
        t_lo = t_hi = None
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(chain(y0, k_lo))
            t_lo = min(t_lo or 1e9, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(chain(y0, k_hi))
            t_hi = min(t_hi or 1e9, time.perf_counter() - t0)
        out["matmul_ms"] = round(1e3 * (t_hi - t_lo) / 4096, 4)
    except Exception as e:
        note(f"probe matmul normalizer failed: {type(e).__name__}: {e}")
    return out


def section_hand(opts):
    """Hand-module train step (reduced / 720p / xla-retry sections).

    gt_only builds the scene and saves the GT render without timing —
    run with force_cpu it pre-renders the GT on the host so the TPU
    attempts skip one tunnel compile each (the GT image is
    backend-agnostic; compile latency through the tunnel swings
    20-900s per session)."""
    step, state, batch = build_workload(
        opts["backend"], opts["capacity"], opts["width"], opts["height"],
        opts["views"], gt=_load_gt(opts.get("gt_in"),
                                   opts.get("gt_wait", 0.0)),
    )
    if opts.get("gt_out"):
        _save_gt(opts["gt_out"], batch["rgb"])
    if opts.get("gt_only"):
        return {"gt": "saved"}
    ips, mem = time_iters(step, state, batch, opts["warmup"], opts["iters"],
                          want_mem=opts.get("want_mem", False))
    return {"ips": round(ips, 3), "hbm_mb": mem}


def section_hand_chain(opts):
    """Round-5 primary: pallas primary THEN the xla fallback in ONE child
    on the SAME scene (the in-memory GT is reused — no second GT compile,
    no second process startup). The primary result is flushed as a
    partial line the moment it lands, so a timeout during the xla compile
    cannot lose the headline number. On CPU the primary already IS the
    xla backend, so the fallback leg is skipped (vs_baseline=1 by
    construction in assemble())."""
    step, state, batch = build_workload(
        opts["backend"], opts["capacity"], opts["width"], opts["height"],
        opts["views"], gt=_load_gt(opts.get("gt_in"),
                                   opts.get("gt_wait", 0.0)),
    )
    if opts.get("gt_out"):
        _save_gt(opts["gt_out"], batch["rgb"])
    ips, mem = time_iters(step, state, batch, opts["warmup"], opts["iters"],
                          want_mem=opts.get("want_mem", False))
    results = {"pallas_ips": round(ips, 3), "prim_hbm": mem}
    note(f"primary landed in child: {results['pallas_ips']} it/s")
    emit_partial(**results)
    if opts["backend"] != "xla" and not opts.get("skip_xla"):
        note("starting xla fallback leg")
        step2, state2, batch2 = build_workload(
            "xla", opts["capacity"], opts["width"], opts["height"],
            opts["views"], gt=batch["rgb"],
        )
        ips2, _ = time_iters(step2, state2, batch2, 1,
                             max(opts["iters"] // 4, 2))
        results["xla_ips"] = round(ips2, 3)
        emit_partial(xla_ips=results["xla_ips"])
        note(f"xla fallback landed in child: {results['xla_ips']} it/s")
    return results


def section_flagship(opts):
    """Canonical train-CLI hand config: 131k gaussians, 512^2, 96^3 MANO
    voxel skinning grid resampled per step (part="voxel"); part="lpips"
    is the same config with the canonical VGG LPIPS loss on
    (post-step-1000 behaviour) through the production conv engine;
    part="both" chains them in one child (round 5) — same scene build,
    one process startup, with the voxel number flushed as a partial line
    before the ~30-Mosaic-kernel LPIPS compile starts. All parts reuse
    the host-pre-rendered GT (gt_in)."""
    part = opts.get("part", "voxel")
    backend = "pallas" if not opts.get("force_cpu") else "xla"
    gt = _load_gt(opts.get("gt_in"), opts.get("gt_wait", 0.0))
    results = {}

    vg = _load_voxel_grid(opts.get("gt_in"))
    if part in ("voxel", "both"):
        note("starting flagship voxel leg (131k/512^2/96^3)"
             + (" [host-built voxel grid]" if vg is not None else ""))
        step, state, batch, parts = build_workload(
            backend, opts["capacity"], opts["width"], opts["height"],
            opts["views"], voxel_res=opts["voxel_res"], gt=gt,
            voxel_grid=vg, return_parts=True,
        )
        vg = parts["voxel_grid"]
        note("flagship voxel scene staged; compiling step")
        if opts.get("gt_out"):
            _save_gt(opts["gt_out"], batch["rgb"], voxel_grid=vg)
        if opts.get("gt_only"):
            return {"gt": "saved"}
        gt = batch["rgb"]  # reuse for the lpips leg
        ips, mem = time_iters(step, state, batch, opts["warmup"],
                              opts["iters"],
                              want_mem=opts.get("want_mem", False))
        results["flag_ips"] = round(ips, 3)
        results["flag_hbm"] = mem
        emit_partial(**results)
        note(f"flagship voxel landed in child: {results['flag_ips']} it/s")
        del step, state, batch

    if part in ("lpips", "both"):
        note("starting flagship lpips leg")
        from manus_tpu.train.lpips import random_lpips_params

        lpips_params = random_lpips_params(0, arch="vgg")
        step, state, batch = build_workload(
            backend, opts["capacity"], opts["width"], opts["height"],
            opts["views"], voxel_res=opts["voxel_res"], gt=gt,
            lpips_params=lpips_params, voxel_grid=vg,
        )
        ips, _ = time_iters(step, state, batch, opts["warmup"],
                            opts["iters"])
        results["flag_lpips_ips"] = round(ips, 3)
        emit_partial(flag_lpips_ips=results["flag_lpips_ips"])
    return results


def section_object(opts):
    step, state, batch = build_object_workload(
        opts["backend"], opts["capacity"], opts["width"], opts["height"],
        opts["views"],
    )
    ips, _ = time_iters(step, state, batch, opts["warmup"], opts["iters"])
    return {"ips": round(ips, 3)}


def section_tpu_all(opts):
    """Round-5 main TPU chain: primary+xla -> flagship voxel+lpips ->
    object, ALL in one child that the orchestrator gives the whole
    remaining budget. Per-section timeout guessing lost the flagship two
    validation runs in a row (the orchestrator cannot know whether this
    session's compiles take 250s or 900s); with partial-result lines the
    right policy is one child, one big window — whatever lands before
    the window closes is kept. The primary raising aborts the chain
    (device errors poison the process context; the orchestrator's
    degradation ladder takes over in fresh processes); later sections
    fail independently (err_* partials surface in the artifact's error
    list) and the orchestrator can re-attempt the missing ones."""
    results = dict(section_hand_chain(opts["primary"]))
    for name, key in (("flagship", None), ("object", "obj_ips")):
        try:
            if name == "flagship":
                r = section_flagship(opts["flagship"])
            else:
                r = {"obj_ips": section_object(opts["object"])["ips"]}
                emit_partial(**r)
                note(f"object landed in child: {r['obj_ips']} it/s")
            results.update(r)
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"
            note(f"tpu_all {name} failed: {msg}")
            emit_partial(**{f"err_{name}": msg})
    return results


def _load_gt(path, wait_s: float = 0.0):
    """Load a host-pre-rendered GT npz. wait_s > 0 polls for a file still
    being produced by the parallel CPU render job (rendering on the TPU
    instead costs a full tunnel compile, so waiting a few minutes is the
    cheaper branch). Writers use _save_gt (atomic), so an existing file
    is always complete."""
    if not path:
        return None
    t0 = time.perf_counter()
    while not os.path.exists(path):
        if time.perf_counter() - t0 >= wait_s:
            return None
        time.sleep(5.0)
    import jax.numpy as jnp

    return jnp.asarray(np.load(path)["gt"])


def _save_gt(path, arr, voxel_grid=None) -> None:
    fields = {"gt": np.asarray(arr)}
    if voxel_grid is not None:
        fields.update(
            vg_center=np.asarray(voxel_grid.center),
            vg_scale=np.asarray(voxel_grid.scale),
            vg_weights=np.asarray(voxel_grid.weights),
        )
        if voxel_grid.brick is not None:
            fields["vg_brick"] = np.asarray(voxel_grid.brick)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **fields)
    os.replace(tmp, path)


def _load_voxel_grid(path):
    """Voxel grid shipped by the host GT child (see _save_gt). Returns a
    VoxelGrid with on-device leaves, or None."""
    if not (path and os.path.exists(path)):
        return None
    data = np.load(path)
    if "vg_weights" not in data.files:
        return None
    import jax.numpy as jnp

    from manus_tpu.train.workloads import VoxelGrid

    return VoxelGrid(
        center=jnp.asarray(data["vg_center"]),
        scale=jnp.asarray(data["vg_scale"]),
        weights=jnp.asarray(data["vg_weights"]),
        brick=jnp.asarray(data["vg_brick"])
        if "vg_brick" in data.files else None,
    )


SECTIONS = {
    "probe": section_probe,
    "hand": section_hand,
    "hand_chain": section_hand_chain,
    "flagship": section_flagship,
    "object": section_object,
    "tpu_all": section_tpu_all,
}


def child_main(section: str, opts: dict) -> int:
    # graceful SIGTERM: run finalizers (jax client teardown closes the
    # tunnel connection) instead of dying mid-RPC; a child stuck inside
    # a C call won't see it and the parent escalates to SIGKILL after
    # its grace window
    try:
        signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))
    except (ValueError, OSError):
        pass
    if opts.get("force_cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    try:
        results = SECTIONS[section](opts)
        print(json.dumps({"ok": True, "results": results}), flush=True)
    except Exception as e:
        print(json.dumps({"ok": False,
                          "error": f"{type(e).__name__}: {e}"}),
              flush=True)
    return 0


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------


def parse_child_output(out: str, fallback_error: str) -> dict:
    """Scan a child's stdout for partial lines and the final result line.
    Partials are merged under "partials" so a killed/timed-out chained
    child still reports every measurement that completed."""
    partials: dict = {}
    final = None
    for line in out.strip().splitlines():
        try:
            obj = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(obj, dict) and "partial" in obj:
            partials.update(obj["partial"])
        elif isinstance(obj, dict) and "ok" in obj:
            final = obj
    if final is None:
        final = {"ok": False, "error": fallback_error}
    if partials:
        final["partials"] = partials
    return final


def run_sub(section: str, opts: dict, timeout: float) -> dict:
    """Run one section in a FRESH subprocess. BENCH_r03's tail showed the
    in-process device context stays poisoned after the first failure
    (instant repeat failures after 60s sleeps); a new process gets a new
    tunnel connection. stderr passes straight through for the driver tail.
    The child handle is tracked so the signal handler can kill it (exact
    PID) before exiting; the Popen+assignment is signal-masked so no kill
    window can orphan a live TPU child (ADVICE r4)."""
    global _CURRENT_CHILD
    cmd = [sys.executable, os.path.abspath(__file__),
           "--section", section, "--opts", json.dumps(opts)]
    with _signals_blocked():
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
        _CURRENT_CHILD = proc
    timed_out = False
    try:
        out, _ = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        # SIGTERM first with a short grace: a SIGKILLed client leaves the
        # tunnel/device wedged for minutes (CLAUDE.md), and round-5 runs
        # saw the NEXT session's probes time out right after hard kills.
        # A terminated child closes its connection cleanly.
        proc.terminate()
        try:
            out, _ = proc.communicate(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
        timed_out = True
    finally:
        _CURRENT_CHILD = None
    text = (out or b"").decode("utf-8", "replace")
    if timed_out:
        r = parse_child_output(text, f"timeout after {timeout:.0f}s")
        r.update(ok=False, timed_out=True,
                 error=f"timeout after {timeout:.0f}s")
        return r
    return parse_child_output(
        text, f"child produced no JSON (rc={proc.returncode})"
    )


def assemble(st: dict) -> dict:
    """Build the contract JSON from whatever has been measured so far.
    Called both at normal completion and from the signal handler, so a
    driver-side kill still reports every completed section."""
    on_tpu = st.get("on_tpu", False)
    pallas_ips = st.get("pallas_ips")
    xla_ips = st.get("xla_ips")
    degraded = st.get("degraded")
    flag_ips = st.get("flag_ips")
    flag_lpips_ips = st.get("flag_lpips_ips")
    width, height = st.get("width", 0), st.get("height", 0)
    views = st.get("views", 1)
    # vs_baseline = speedup over the in-repo XLA fallback renderer,
    # same-session measurements only (a stale cross-session constant
    # drifted as kernels changed; VERDICT r3 weak 6). Null when the
    # budget forced the fallback to be skipped. On CPU the primary IS
    # the xla backend, so vs_baseline is 1 by construction.
    if on_tpu and pallas_ips and xla_ips:
        vs_baseline = round(pallas_ips / xla_ips, 3)
    elif not on_tpu and pallas_ips:
        vs_baseline = 1.0
    else:
        vs_baseline = None
    errors = st.get("errors") or None
    return {
        "metric": "hand_train_iters_per_s",
        "value": pallas_ips,
        "unit": "iters/s",
        "vs_baseline": vs_baseline,
        "extra": {
            "workload_degraded": degraded,
            "rays_per_s": round(pallas_ips * width * height * views)
            if pallas_ips and not degraded else None,
            "xla_fallback_iters_per_s": xla_ips,
            "object_train_iters_per_s": st.get("obj_ips"),
            "hand_720p_131k_iters_per_s": st.get("hd_ips"),
            # FLAGSHIP canonical config (131k/512^2/96^3 voxel)
            "flagship_voxel_ms": round(1e3 / flag_ips, 2)
            if flag_ips else None,
            "flagship_voxel_iters_per_s": flag_ips,
            "flagship_voxel_lpips_ms": round(1e3 / flag_lpips_ips, 2)
            if flag_lpips_ips else None,
            "gaussians": st.get("capacity"),
            "resolution": [height, width],
            "peak_hbm_mb_primary": st.get("prim_hbm"),
            "peak_hbm_mb_flagship": st.get("flag_hbm"),
            # same-session device-throughput normalizer (chained 2048^2
            # matmul, ms/iter): artifact numbers from different rounds are
            # only comparable after dividing out this session factor
            "session_probe_matmul_ms": st.get("probe_ms"),
            "device": st.get("device"),
            "errors": errors,
        },
    }


def orchestrate() -> dict:
    # Wall-clock budget: jit compile latency on the tunneled platform
    # swings between ~20s and ~900s per program session-to-session, and
    # the driver runs bench under a finite window. Round-5 calibration:
    # the driver has now killed at ~1800s twice (BENCH_r03/r04), so the
    # default PLANS for ~1650s — sections are ordered by decision value
    # (primary+xla -> flagship voxel+lpips -> object -> 720p LAST) and
    # chained children flush partial results, so a truncated chain keeps
    # every number that landed. A longer window can be granted with
    # BENCH_BUDGET_S; the driver-kill snapshot path stays as the backstop.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1650"))
    force_cpu = bool(os.environ.get("BENCH_FORCE_CPU"))

    def remaining():
        return budget_s - (time.perf_counter() - _T0)

    tmpdir = tempfile.mkdtemp(prefix="bench_gt_")
    gt_path = os.path.join(tmpdir, "gt_primary.npz")
    gt_hd_path = os.path.join(tmpdir, "gt_720p.npz")
    gt_flag_path = os.path.join(tmpdir, "gt_flagship.npz")
    gt_jobs = _GT_JOBS  # module-level: the signal handler reaps these too

    def spawn_gt(name, section, opts):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--section", section, "--opts", json.dumps(opts)]
        with _signals_blocked():
            gt_jobs[name] = subprocess.Popen(
                cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
            )

    # --- pre-render every section's GT on the HOST, at t=0 and in
    # PARALLEL with the device probe (CPU children touch no device):
    # each saved GT removes one tunnel compile from its TPU section, and
    # in a wedged-queue session the probe retries alone can eat 400-700s
    # that the host renders now overlap (observed round 5).
    if not force_cpu:
        tpu_w = {"capacity": 1 << 16, "width": 512, "height": 512}
        gt_cpu = {"force_cpu": True, "backend": "xla", "views": 1,
                  "warmup": 0, "iters": 0, "gt_only": True}
        spawn_gt("primary", "hand", dict(gt_cpu, **tpu_w, gt_out=gt_path))
        spawn_gt("flag", "flagship", dict(gt_cpu, capacity=1 << 17,
                                          width=512, height=512,
                                          voxel_res=96, part="voxel",
                                          gt_out=gt_flag_path))
        spawn_gt("hd", "hand", dict(gt_cpu, capacity=1 << 17, width=1280,
                                    height=720, gt_out=gt_hd_path))

    # --- device probe (retry; a SIGKILLed predecessor can wedge the chip
    # for a minute or two — CLAUDE.md) ---
    probe = None
    for attempt in range(2):  # 3 x 240s timeouts ate 720s of a wedged
        # session (round 5); two failures already say the queue is gone
        r = run_sub("probe", {"force_cpu": force_cpu},
                    timeout=max(60.0, min(240.0, remaining())))
        if r.get("ok"):
            probe = r["results"]
            note(f"probe ok: backend={probe['backend']} "
                 f"matmul={probe.get('matmul_ms')}ms")
            break
        note(f"probe failed: {r.get('error')}")
        # a timed-out attempt already waited its full window; only
        # non-timeout failures (wedged chip after a SIGKILL) back off
        if attempt < 1 and remaining() > 150 and not r.get("timed_out"):
            time.sleep(30 * (attempt + 1))
    on_tpu = (probe or {}).get("backend") == "tpu"
    if probe is None:
        note("device probe never succeeded; attempting primary anyway")
        on_tpu = not force_cpu

    if on_tpu:
        capacity, width, height, views = 1 << 16, 512, 512, 1
        warmup, iters = 3, 20
    else:  # tiny CPU workload so the bench line always prints
        capacity, width, height, views = 2048, 128, 128, 1
        warmup, iters = 1, 3
    backend = "pallas" if on_tpu else "xla"
    _STATE.update(on_tpu=on_tpu, capacity=capacity, width=width,
                  height=height, views=views,
                  device=(probe or {}).get("device"),
                  probe_ms=(probe or {}).get("matmul_ms"))

    base = {"force_cpu": force_cpu, "views": views,
            "warmup": warmup, "iters": iters}

    errors = []
    degraded = None
    _STATE["errors"] = errors  # same list object: mutations land in the snapshot

    def await_gt(name, path, timeout):
        p = gt_jobs.get(name)
        if p is None:
            return os.path.exists(path)
        try:
            p.wait(timeout=max(0.0, timeout))
        except subprocess.TimeoutExpired:
            return False
        return p.returncode == 0 and os.path.exists(path)

    have_gt = False
    if on_tpu and remaining() > 300:
        have_gt = await_gt("primary", gt_path,
                           max(60.0, min(remaining() - 120, 300.0)))
        note("primary GT pre-rendered on host" if have_gt
             else "host GT not ready; primary renders its own")

    # --- main TPU chain: ONE child (primary+xla -> flagship voxel+lpips
    # -> object) holding the whole remaining window minus a small
    # reserve. Two round-5 validation runs proved that per-section
    # timeout splitting loses the flagship whenever the session's
    # compile latency lands on the wrong side of a guess; with partial
    # lines, whatever completes before the window closes is kept, and
    # the orchestrator only patches holes afterwards. ---
    prim_ips = None
    if on_tpu:
        opts_all = {
            "primary": dict(base, backend=backend, capacity=capacity,
                            width=width, height=height, gt_out=gt_path,
                            want_mem=True,
                            gt_in=gt_path if have_gt else None),
            "flagship": dict(base, capacity=1 << 17, width=512,
                             height=512, voxel_res=96,
                             iters=max(iters // 2, 4), part="both",
                             want_mem=True, gt_in=gt_flag_path,
                             gt_wait=300.0),
            "object": dict(base, backend=backend, capacity=capacity,
                           width=width, height=height),
        }
        # reserve a 120s tail: enough for the CPU-fallback number that
        # must always land (a 60s reserve left 58s and the gate missed)
        r = run_sub("tpu_all", opts_all,
                    timeout=max(120.0, remaining() - 120))
        got = dict(r.get("partials") or {})
        if r.get("ok"):
            got.update(r["results"])
        for k, v in got.items():
            if k.startswith("err_"):
                errors.append(f"{k[4:]}: {v}")
            elif v is not None:
                _STATE[k] = v
        prim_ips = _STATE.get("pallas_ips")
        if not r.get("ok"):
            errors.append(f"tpu_all: {r.get('error')}")
        if not r.get("ok") and prim_ips is None and remaining() > 120:
            # total chain failure before the primary landed: one fresh
            # primary-only retry (fresh process = fresh tunnel context)
            note(f"tpu_all failed with no primary: {r.get('error')}")
            r2 = run_sub(
                "hand_chain",
                dict(base, backend=backend, capacity=capacity,
                     width=width, height=height, gt_out=gt_path,
                     skip_xla=True,
                     gt_in=gt_path if os.path.exists(gt_path) else None),
                timeout=max(90.0, remaining() - 30))
            got2 = dict(r2.get("partials") or {})
            if r2.get("ok"):
                got2.update(r2["results"])
            _STATE.update({k: v for k, v in got2.items()
                           if v is not None and not k.startswith("err_")})
            prim_ips = _STATE.get("pallas_ips")
            if prim_ips is None:
                errors.append(f"primary retry: {r2.get('error')}")

    if not on_tpu and remaining() > 90:
        # CPU-forced run: the tiny workload is the primary (not a
        # degradation), matching the sizes chosen above
        r = run_sub("hand_chain",
                    dict(base, backend=backend, capacity=capacity,
                         width=width, height=height, want_mem=True),
                    timeout=max(90.0, min(remaining() - 30, 600.0)))
        got = dict(r.get("partials") or {})
        if r.get("ok"):
            got.update(r["results"])
        _STATE.update({k: v for k, v in got.items() if v is not None})
        prim_ips = _STATE.get("pallas_ips")
        if prim_ips is None:
            errors.append(f"cpu primary: {r.get('error')}")

    # --- degradation ladder: reduced capacity on TPU, then CPU, so some
    # hardware-adjacent number always lands (loudly flagged) ---
    if prim_ips is None and on_tpu and remaining() > 120:
        note("degrading to reduced-capacity workload (16k gaussians, 256^2)")
        r = run_sub("hand", dict(base, backend=backend, capacity=1 << 14,
                                 width=256, height=256, iters=10),
                    timeout=max(90.0, min(remaining() - 30, 300.0)))
        if r.get("ok"):
            prim_ips = r["results"]["ips"]
            degraded = "tpu_16384g_256px"
        else:
            errors.append(f"reduced: {r.get('error')}")
    if prim_ips is None and remaining() > 20:
        note("degrading to CPU workload")
        r = run_sub("hand", {"force_cpu": True, "backend": "xla",
                             "capacity": 2048, "width": 128, "height": 128,
                             "views": 1, "warmup": 1, "iters": 3},
                    timeout=max(60.0, min(remaining() - 5, 240.0)))
        if r.get("ok"):
            prim_ips = r["results"]["ips"]
            degraded = "cpu_xla_2048g_128px"
        else:
            errors.append(f"cpu fallback: {r.get('error')}")

    _STATE.update(pallas_ips=prim_ips, degraded=degraded)
    xla_ips = _STATE.get("xla_ips")
    if prim_ips:
        note(f"hand {backend}{' [' + degraded + ']' if degraded else ''}: "
             f"{prim_ips:.1f} it/s"
             + (f", xla fallback {xla_ips:.2f} it/s "
                f"({prim_ips / xla_ips:.1f}x)" if xla_ips else ""))
    healthy = prim_ips is not None and degraded is None

    def attempt_section(name, section, opts, min_budget, attempts=2,
                        gt=None, cap=1000.0, partial_keys=()):
        """Run an optional section with up to `attempts` fresh processes.
        The flagship/720p compiles swing 200-900s between sessions; a
        single timed-out attempt in a bad queue does not mean the next
        fresh process (often landing in a drained queue) will too. `gt`
        is a (job_name, path) pair: a host GT render that missed the
        first attempt's await is picked up by the retry instead of
        burning a tunnel compile on a TPU-side GT render. `cap` bounds
        each attempt (per-section: the 720p compile alone measured ~840s
        on a CLEAR queue — ADVICE r4 #3). Partial results (chained
        sections) merge into _STATE immediately; an attempt that lands
        all `partial_keys` counts as success."""
        for k in range(attempts):
            if remaining() < min_budget:
                if k == 0:
                    note(f"skipping {name} (budget)")
                return None
            if gt and not opts.get("gt_in") and await_gt(gt[0], gt[1], 0.0):
                opts = dict(opts, gt_in=gt[1])
            r = run_sub(section, opts,
                        timeout=max(90.0, min(remaining() - 30, cap)))
            got = dict(r.get("partials") or {})
            if r.get("ok"):
                got.update(r["results"])
            _STATE.update({k2: v for k2, v in got.items() if v is not None})
            if r.get("ok"):
                return r["results"]
            if partial_keys and all(_STATE.get(k2) is not None
                                    for k2 in partial_keys):
                return got
            errors.append(f"{name} attempt {k + 1}: {r.get('error')}")
            note(f"{name} attempt {k + 1} failed: {r.get('error')}")
            if got:
                # something landed; retrying the whole chain would redo it
                return got
            if k + 1 < attempts and remaining() > min_budget + 60:
                time.sleep(60)  # a killed TPU child can wedge the chip briefly
        return None

    # --- patch holes (fresh processes) in the same priority order the
    # chain ran: xla fallback (vs_baseline), flagship voxel, flagship
    # lpips, object. Normally the chain landed these; retries only fire
    # when it died early with budget left. ---
    if on_tpu and healthy:
        if _STATE.get("xla_ips") is None and remaining() > 300:
            r = run_sub("hand",
                        dict(base, backend="xla", capacity=capacity,
                             width=width, height=height,
                             iters=max(iters // 4, 2), gt_in=gt_path),
                        timeout=max(90.0, min(remaining() - 20, 600.0)))
            if r.get("ok"):
                _STATE["xla_ips"] = r["results"]["ips"]
            else:
                errors.append(f"xla retry: {r.get('error')}")
        flag_opts = dict(base, capacity=1 << 17, width=512, height=512,
                         voxel_res=96, iters=max(iters // 2, 4),
                         want_mem=True, gt_in=gt_flag_path, gt_wait=60.0)
        if _STATE.get("flag_ips") is None and remaining() > 300:
            attempt_section("flagship retry", "flagship",
                            dict(flag_opts, part="both"), min_budget=300,
                            attempts=1, cap=900.0)
        elif (_STATE.get("flag_ips") and
              _STATE.get("flag_lpips_ips") is None and remaining() > 250):
            attempt_section("flagship lpips retry", "flagship",
                            dict(flag_opts, part="lpips"), min_budget=250,
                            attempts=1, cap=900.0)
        if _STATE.get("obj_ips") is None and remaining() > 240:
            r = run_sub("object",
                        dict(base, backend=backend, capacity=capacity,
                             width=width, height=height),
                        timeout=max(90.0, min(remaining() - 30, 600.0)))
            if r.get("ok"):
                _STATE["obj_ips"] = r["results"]["ips"]
            else:
                errors.append(f"object retry: {r.get('error')}")
    elif healthy and remaining() > 240:
        # CPU path: object only (the tpu_all chain did not run)
        r = run_sub("object", dict(base, backend=backend, capacity=capacity,
                                   width=width, height=height),
                    timeout=max(90.0, min(remaining() - 30, 600.0)))
        if r.get("ok"):
            _STATE["obj_ips"] = r["results"]["ips"]
        else:
            errors.append(f"object: {r.get('error')}")

    xla_ips = _STATE.get("xla_ips")
    for key, label, fmt in (("xla_ips", "xla fallback", "{:.2f} it/s"),
                            ("flag_ips", "flagship voxel", "{:.1f} it/s"),
                            ("flag_lpips_ips", "flagship + lpips",
                             "{:.1f} it/s"),
                            ("obj_ips", "object", "{:.1f} it/s")):
        if _STATE.get(key) is not None:
            note(f"{label}: {fmt.format(_STATE[key])}")

    # --- 720p LAST (VERDICT r4 item 1): the most expensive compile
    # (~840s on a clear queue) and the least decision-relevant number;
    # it lands only when the session is fast enough to leave room ---
    if on_tpu and healthy and remaining() > 300:
        hd_gt = await_gt("hd", gt_hd_path, min(remaining() * 0.1, 60.0))
        r = attempt_section(
            "720p", "hand",
            dict(base, backend="pallas", capacity=1 << 17, width=1280,
                 height=720, iters=max(iters // 2, 4),
                 gt_in=gt_hd_path if hd_gt else None),
            min_budget=300, attempts=1, gt=("hd", gt_hd_path), cap=1000.0)
        if r and r.get("ips"):
            _STATE["hd_ips"] = r["ips"]
            note(f"hand 720p: {r['ips']:.1f} it/s")
    else:
        note("skipping 720p (budget/health)")

    # reap any host GT renders that outlived their usefulness (CPU-only
    # children; killing them cannot wedge the tunnel)
    for p in list(gt_jobs.values()):
        try:
            if p.poll() is None:
                p.kill()
        except Exception:
            pass

    return assemble(_STATE)


def main() -> int:
    global _FINAL_EMITTED
    if "--section" in sys.argv:
        i = sys.argv.index("--section")
        opts = {}
        if "--opts" in sys.argv:
            opts = json.loads(sys.argv[sys.argv.index("--opts") + 1])
        return child_main(sys.argv[i + 1], opts)
    # Orchestrator mode: a driver-side timeout kill (SIGTERM/SIGINT/HUP)
    # flushes the snapshot as the JSON line instead of dying silently.
    for sig in _HANDLED_SIGS:
        try:
            signal.signal(sig, _emit_and_exit)
        except (ValueError, OSError):
            pass
    # The JSON line prints on EVERY exit path (VERDICT r3 item 1a).
    try:
        out = orchestrate()
    except BaseException as e:  # noqa: BLE001 — the contract is the line
        err = f"{type(e).__name__}: {e}"
        _STATE.setdefault("errors", []).append(f"orchestrator: {err}")
        out = assemble(_STATE)
        out["error"] = err
    with _signals_blocked():
        if not _FINAL_EMITTED:
            print(json.dumps(out), flush=True)
            _FINAL_EMITTED = True
    return 0


if __name__ == "__main__":
    sys.exit(main())
