"""Microbenchmark: VGG-LPIPS conv lowering strategies on the real TPU.

The flagship hand step pays for the LPIPS VGG16 fwd+bwd at 512^2 once the
canonical loss turns it on (reference base.py:333-341). Measured history
(PARITY.md "Perf state"): fp32 XLA conv ~13.4 ms f+b = the fp32 MXU roof;
bf16 XLA conv WORSE (lowering-bound); 9-shifted-matmul im2col loses to
HBM accumulate traffic. The implicit-GEMM Pallas stack
(manus_tpu/ops/conv_pallas.py) keeps the 9-tap accumulation in VMEM at
bf16 MXU rate — this script measures all of them like-for-like.

Timing follows CLAUDE.md: traced-bound fori_loop chains, per-iter =
(t(n=22) - t(n=2)) / 20 with a host readback inside the timed region
(block_until_ready is unreliable through the tunnel). Params travel as
traced arguments (closure arrays are serialized into tunnel compile
requests). A one-shot allclose gate checks every variant against the fp32
XLA forward before its timing runs.

Run: python scripts/bench_lpips_conv.py [--all]
  default: fp32 XLA (baseline) + pallas; --all adds bf16 XLA + im2col.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from manus_tpu.train.lpips import (  # noqa: E402
    VGG_STAGES,
    SHIFT,
    SCALE,
    lpips_distance_pallas,
    random_lpips_params,
)

H = W = 512


def conv_xla(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + b


def conv_xla_bf16(x, w, b):
    """bf16 inputs, fp32 accumulation via preferred_element_type
    (ADVICE r2: the variant PARITY.md cited but the script lacked)."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out + b


def make_conv_mm(dtype):
    def conv_mm(x, w, b):
        n, h, ww, ci = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        wd = w.astype(dtype)
        acc = jnp.zeros((n, h, ww, co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xs = xp[:, dy : dy + h, dx : dx + ww, :]
                acc = acc + jax.lax.dot_general(
                    xs,
                    wd[dy, dx],
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        return acc + b

    return conv_mm


def make_lpips(conv):
    def vgg_feats(params, x):
        x = (x - jnp.asarray(SHIFT)) / jnp.asarray(SCALE)
        feats = []
        for si, (_, n_layers) in enumerate(VGG_STAGES):
            for li in range(n_layers):
                x = jax.nn.relu(conv(x, params[f"conv{si}_{li}_w"], params[f"conv{si}_{li}_b"]))
            feats.append(x)
            if si < len(VGG_STAGES) - 1:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        return feats

    def dist(params, img1, img2):
        f1 = vgg_feats(params, (img1[None] * 2 - 1).astype(jnp.float32))
        f2 = vgg_feats(params, (img2[None] * 2 - 1).astype(jnp.float32))
        total = jnp.asarray(0.0)
        for k, (a, b) in enumerate(zip(f1, f2)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            total = total + jnp.mean(
                jnp.sum((a - b) ** 2 * params[f"lin{k}_w"][None, None, None, :], -1)
            )
        return total

    return dist


def check_agreement(name, dist_fn, ref_fn, params, rtol=0.03):
    """One-shot value gate on a small input so a mis-indexed variant can
    never be silently benchmarked (ADVICE r2)."""
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.rand(64, 64, 3), jnp.float32)
    b = jnp.asarray(rng.rand(64, 64, 3), jnp.float32)
    got = float(jax.jit(dist_fn)(params, a, b))
    ref = float(jax.jit(ref_fn)(params, a, b))
    ok = abs(got - ref) <= rtol * max(abs(ref), 1e-6)
    print(f"  agreement[{name}]: {got:.6f} vs ref {ref:.6f} "
          f"({'ok' if ok else 'FAIL'})", flush=True)
    if not ok:
        raise AssertionError(f"{name} disagrees with fp32 XLA forward")


def bench(name, dist_fn, params, img1, img2):
    grad_fn = jax.value_and_grad(dist_fn, argnums=1)

    # params as a traced argument — closure arrays land in the tunnel
    # compile request (ADVICE r2)
    @jax.jit
    def chain(n, p, x1, x2):
        def body(_, carry):
            v, g = grad_fn(p, carry, x2)
            return carry + 1e-6 * g + 1e-9 * v

        return jax.lax.fori_loop(0, n, body, x1)

    t0 = time.time()
    np.asarray(chain(jnp.asarray(2), params, img1, img2)[0, 0])  # compile
    t_compile = time.time() - t0

    def timed(n):
        t = time.time()
        np.asarray(chain(jnp.asarray(n), params, img1, img2)[0, 0])
        return time.time() - t

    t2 = min(timed(2) for _ in range(2))
    t22 = min(timed(42) for _ in range(2))
    per = (t22 - t2) / 40 * 1e3
    print(f"{name:28s} {per:7.2f} ms/iter (compile {t_compile:.0f}s)", flush=True)
    return per


def main():
    run_all = "--all" in sys.argv
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    params = random_lpips_params(0)
    rng = np.random.RandomState(3)
    img1 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    from manus_tpu.train.lpips import (
        lpips_distance, lpips_distance_cached, lpips_distance_xla_dx,
        lpips_features,
    )

    ref = make_lpips(conv_xla)  # raw autodiff fp32 + autodiff head
    # Default contenders (every production engine uses the fused
    # custom-VJP head in train/lpips.py; measured history in PARITY.md):
    variants = [
        ("xla_fused_fp32", lambda p, a, b: lpips_distance(p, a, b)),
        ("xla_dx_bf16", lambda p, a, b: lpips_distance_xla_dx(
            p, a, b, jnp.bfloat16)),
        ("pallas_igemm_bf16", lambda p, a, b: lpips_distance_pallas(p, a, b)),
    ]

    # cached-gt variants (the production train-step path: the trainer's
    # gt-feature cache removes the gt forward). The cached features ride
    # inside the params dict so the bench chain signature stays (p, a, b).
    def make_cached(engine):
        feats = jax.jit(
            lambda p, im: lpips_features(p, im, engine)
        )(params, img2)
        aug = dict(params)
        for i, f in enumerate(feats):
            aug[f"__gtfeat{i}"] = f
        n_f = len(feats)

        def dist(p, a, b):
            core = {k: v for k, v in p.items()
                    if not k.startswith("__gtfeat")}
            fs = [p[f"__gtfeat{i}"] for i in range(n_f)]
            return lpips_distance_cached(core, a, fs, engine)

        return dist, aug

    cached_variants = [
        ("xla_dx_bf16_gtcache", "xla_dx_bf16"),
        ("pallas_gtcache", "pallas"),
    ]
    if "--ref" in sys.argv or run_all:
        # the round-2 baseline: XLA autodiff end to end (its f+b compile
        # alone can take ~15 min through the tunnel, hence opt-in)
        variants.insert(0, ("xla_conv_fp32", ref))
    if run_all:
        variants += [
            ("xla_dx_fp32", lambda p, a, b: lpips_distance_xla_dx(p, a, b)),
            ("xla_conv_bf16", make_lpips(conv_xla_bf16)),
            ("mm_fp32", make_lpips(make_conv_mm(jnp.float32))),
            ("mm_bf16", make_lpips(make_conv_mm(jnp.bfloat16))),
        ]

    r = {}
    for name, fn in variants:
        if name != "xla_conv_fp32":
            check_agreement(name, fn, ref, params)
        r[name] = bench(name, fn, params, img1, img2)
    for name, engine in cached_variants:
        fn, aug = make_cached(engine)
        r[name] = bench(name, fn, aug, img1, img2)
    best = min(r, key=r.get)
    base = r.get("xla_conv_fp32")
    base_s = f"{base:.2f} ms" if base is not None else "13.4 ms (r2 record)"
    print(f"best: {best}  ({r[best]:.2f} ms vs raw-autodiff fp32 {base_s})")


if __name__ == "__main__":
    main()
