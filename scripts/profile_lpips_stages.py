"""Fine-grained decomposition of the layout-persistent Pallas LPIPS chain.

Answers VERDICT r4 item 2 ("win or delete") with data: the per-layer conv
kernels measure ~151 TFLOP/s (77% of bf16 peak; bench_conv_kernel_variants),
which projects the 3-pass conv work at ~6 ms — yet the end-to-end chain
measured 13.5 ms vs 11.9 for xla_dx_bf16. This script locates the ~7 ms gap:

  1. full pallas f+b / fwd        (the train-step / eval costs)
  2. per-stage conv-chain times   (layout convs only, no pools/head)
  3. pool boundary transitions    (unlayout -> maxpool2x2 -> build_layout)
  4. head on layout features
  5. xla_dx_bf16 f+b              (the competitor, same session)

All chained-fori_loop timings (CLAUDE.md methodology: loop-carried data
dependency + enough iterations to clear the 40-80 ms readback noise).

Run on hardware: python scripts/profile_lpips_stages.py [iters]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from manus_tpu.ops.conv_pallas import (  # noqa: E402
    build_layout,
    conv3x3_layout,
    head_stage_layout,
    maxpool2x2,
    unlayout,
)
from manus_tpu.train.lpips import (  # noqa: E402
    VGG_PLAN,
    _vgg_stage_layouts,
    lpips_distance_pallas,
    lpips_distance_xla_dx,
    random_lpips_params,
    vgg16_features_pallas,
)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
# section filter: any of e2e,stages,pools,head,xla (comma list) or all.
# Sub-ms probes (stages/pools/head) need ITERS >= 200 to clear the
# 40-80 ms tunnel readback noise (CLAUDE.md); the ~12 ms e2e probes are
# fine at 20.
WHICH = set((sys.argv[3] if len(sys.argv) > 3 else "all").split(","))


def want(name):
    return "all" in WHICH or name in WHICH


def chain_time(name, body_fn, carry0):
    """body_fn(carry) -> next carry (same pytree); chained fori_loop."""

    @jax.jit
    def chain(n, c0):
        return jax.lax.fori_loop(0, n, lambda _, c: body_fn(c), c0)

    def timed(n):
        t = time.time()
        jax.tree.map(lambda a: np.asarray(a).ravel()[0], chain(n, carry0))
        return time.time() - t

    t0 = time.time()
    timed(2)
    tc = time.time() - t0
    t2 = min(timed(2) for _ in range(2))
    tn = min(timed(2 + ITERS) for _ in range(2))
    per = (tn - t2) / ITERS * 1e3
    print(f"{name:36s} {per:7.2f} ms/iter (compile {tc:.0f}s)", flush=True)
    return per


def main():
    print(f"platform: {jax.devices()[0].platform}, iters={ITERS}", flush=True)
    params = random_lpips_params(0)
    rng = np.random.RandomState(3)
    img1 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    layouts = _vgg_stage_layouts(H, W)

    # representative per-stage layout inputs (values don't matter);
    # stage si's first conv consumes the previous stage's channel count
    stage_cin = [3, 64, 128, 256, 512]

    def stage_input(si):
        L = layouts[si]
        x = jnp.asarray(
            rng.uniform(0, 1, (L.h, L.w, stage_cin[si])), jnp.float32
        )
        return build_layout(x, L)

    r = {}

    # 1. end-to-end
    def fb(c):
        x1, acc = c
        v, g = jax.value_and_grad(
            lambda a: lpips_distance_pallas(params, a, img2)
        )(x1)
        return x1 + 1e-9 * g, acc + v

    def fwd(c):
        x1, acc = c
        v = lpips_distance_pallas(params, x1 + 1e-12 * acc, img2)
        return x1, acc + v

    if want("e2e"):
        r["fb"] = chain_time("pallas lpips f+b", fb,
                             (img1, jnp.asarray(0.0)))
        r["fwd"] = chain_time("pallas lpips fwd", fwd,
                              (img1, jnp.asarray(0.0)))

    # 2. per-stage conv chains, fwd and f+b
    for si, stage in enumerate(VGG_PLAN["stages"]):
        if not want("stages"):
            break
        L = layouts[si]
        xl0 = stage_input(si)
        ci = xl0.shape[1]

        def stage_apply(x, si=si, L=L, stage=stage):
            for li in range(len(stage)):
                x = conv3x3_layout(
                    x, params[f"conv{si}_{li}_w"],
                    params[f"conv{si}_{li}_b"], True, L, None,
                )
            return x

        def stage_body(c, xl0=xl0, ci=ci, apply=stage_apply):
            return apply(xl0 + 1e-9 * c[:, :ci])

        def stage_body_fb(c, xl0=xl0, ci=ci, apply=stage_apply):
            x0 = xl0 + 1e-9 * c[:, :ci]
            v, g = jax.value_and_grad(
                lambda x: jnp.sum(apply(x).astype(jnp.float32))
            )(x0)
            return jnp.pad(
                g.astype(c.dtype), ((0, 0), (0, c.shape[1] - g.shape[1]))
            ) + v.astype(c.dtype)

        co = max(stage[-1][0], 128)
        label = (f"stage {si} ({len(stage)}x{stage[0][0]}ch "
                 f"{L.h}x{L.w})")
        r[f"s{si}"] = chain_time(
            f"  {label} fwd", stage_body,
            jnp.zeros((L.rows, co), jnp.bfloat16),
        )
        r[f"s{si}fb"] = chain_time(
            f"  {label} f+b", stage_body_fb,
            jnp.zeros((L.rows, co), jnp.bfloat16),
        )

    # 3. pool boundaries, fwd and f+b. "pools" times the composed
    # unlayout -> pool -> build_layout form; "poolsnew" the direct
    # layout->layout maxpool2x2_layout (the production path).
    from manus_tpu.ops.conv_pallas import maxpool2x2_layout

    for si in (1, 2, 3, 4):
        mode = ("pools" if want("pools") else
                "poolsnew" if want("poolsnew") else None)
        if mode is None:
            break
        La, Lb = layouts[si - 1], layouts[si]
        xl0 = stage_input(si - 1)

        if mode == "poolsnew":
            def pool_apply(x, La=La, Lb=Lb):
                return maxpool2x2_layout(x, La, Lb)
        else:
            def pool_apply(x, La=La, Lb=Lb):
                return build_layout(maxpool2x2(unlayout(x, La)), Lb)

        def pool_body(c, xl0=xl0, apply=pool_apply):
            x = xl0 + 1e-9 * jnp.mean(c)
            return jnp.mean(apply(x).astype(jnp.float32))[None]

        def pool_body_fb(c, xl0=xl0, apply=pool_apply):
            x0 = xl0 + (c[0] * 1e-9).astype(xl0.dtype)
            v, g = jax.value_and_grad(
                lambda x: jnp.sum(apply(x).astype(jnp.float32))
            )(x0)
            return (v + jnp.sum(g.astype(jnp.float32)))[None] * 1e-12

        r[f"p{si}"] = chain_time(
            f"  pool {si - 1}->{si} ({La.h}x{La.w}) fwd",
            pool_body, jnp.zeros((1,), jnp.float32),
        )
        r[f"p{si}fb"] = chain_time(
            f"  pool {si - 1}->{si} ({La.h}x{La.w}) f+b",
            pool_body_fb, jnp.zeros((1,), jnp.float32),
        )

    # 4. head on layout features (both feature sets fixed)
    if want("head"):
        f1 = [
            (jax.lax.stop_gradient(f), L)
            for f, L in vgg16_features_pallas(params, img1 * 2 - 1)
        ]
        f2 = [
            (jax.lax.stop_gradient(f), L)
            for f, L in vgg16_features_pallas(params, img2 * 2 - 1)
        ]

        def head_apply(c):
            total = jnp.asarray(0.0)
            for k, ((a, L), (b, _)) in enumerate(zip(f1, f2)):
                lin = params[f"lin{k}_w"]
                lin = jnp.pad(lin, (0, a.shape[-1] - lin.shape[0]))
                lin_eff = (lin / float(L.h * L.w)).reshape(1, -1)
                total = total + head_stage_layout(
                    a + c.astype(a.dtype), b, lin_eff, None
                )
            return total

        def head_body(c):
            return 1e-12 * head_apply(c)[None]

        def head_body_fb(c):
            v, g = jax.value_and_grad(
                lambda cc: head_apply(cc[0])
            )(c)
            return 1e-12 * (v + jnp.sum(g))[None]

        r["head"] = chain_time(
            "  head x5 stages fwd", head_body, jnp.zeros((1,), jnp.float32)
        )
        r["headfb"] = chain_time(
            "  head x5 stages f+b", head_body_fb,
            jnp.zeros((1,), jnp.float32),
        )

    # 5. competitor
    if want("xla"):
        def fb_xla(c):
            x1, acc = c
            v, g = jax.value_and_grad(
                lambda a: lpips_distance_xla_dx(params, a, img2,
                                                jnp.bfloat16)
            )(x1)
            return x1 + 1e-9 * g, acc + v

        r["fb_xla"] = chain_time(
            "xla_dx_bf16 lpips f+b", fb_xla, (img1, jnp.asarray(0.0))
        )

    if "all" in WHICH:
        convs = sum(r[f"s{i}"] for i in range(5))
        pools = sum(r[f"p{i}"] for i in (1, 2, 3, 4))
        print(
            f"\nderived: bwd = {r['fb'] - r['fwd']:.2f} ms | "
            f"fwd decomposition: 2x convs {2 * convs:.2f} + 2x pools "
            f"{2 * pools:.2f} + head {r['head']:.2f} = "
            f"{2 * (convs + pools) + r['head']:.2f} vs measured fwd "
            f"{r['fwd']:.2f} (gap = glue/dispatch) | competitor f+b "
            f"{r['fb_xla']:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
