"""Parity tests for the implicit-GEMM LPIPS conv stack (ops/conv_pallas.py).

The Pallas kernels run in interpret mode on CPU (same math, no Mosaic);
the references are XLA convs with IDENTICAL casting (bf16 inputs, fp32
accumulation, bf16 outputs) so forward differences are pure accumulation
order, plus a looser fp32 cross-check for the end-to-end distance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manus_tpu.ops.conv_pallas import conv3x3_raw, make_lpips_conv, maxpool2x2


def xla_conv_bf16(x, w, b, relu):
    """XLA reference with the pallas path's exact casting contract."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16)[None], w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )[0] + b.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(jnp.bfloat16)


@pytest.mark.parametrize(
    "h,w,ci,co",
    [(13, 9, 3, 8), (8, 16, 8, 16), (33, 6, 16, 8), (4, 4, 4, 4)],
)
def test_conv3x3_forward_parity(h, w, ci, co):
    rng = np.random.RandomState(h * 100 + w)
    x = jnp.asarray(rng.normal(0, 1, (h, w, ci)), jnp.float32)
    wk = jnp.asarray(rng.normal(0, 0.3, (3, 3, ci, co)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (co,)), jnp.float32)
    for relu in (True, False):
        got = np.asarray(conv3x3_raw(x, wk, b, relu, interpret=True),
                         np.float32)
        ref = np.asarray(xla_conv_bf16(x, wk, b, relu), np.float32)
        np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


def test_conv3x3_grad_parity():
    """Custom VJP (flipped-weight conv of the ReLU-masked cotangent) vs
    an independent fp32 XLA autodiff reference.

    relu=False is the exact-formula check (bf16 rounding only). For
    relu=True, a pre-activation within bf16 epsilon of zero can flip the
    mask between the two precisions (an O(1) but legitimate difference),
    so that case compares against a reference using the pallas forward's
    own mask."""
    rng = np.random.RandomState(0)
    h, w, ci, co = 11, 7, 6, 10
    x = jnp.asarray(rng.normal(0, 1, (h, w, ci)), jnp.float32)
    wk = jnp.asarray(rng.normal(0, 0.3, (3, 3, ci, co)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (co,)), jnp.float32)
    r = jnp.asarray(rng.normal(0, 1, (h, w, co)), jnp.float32)

    def xla_conv_fp32(xx, wkk):
        return jax.lax.conv_general_dilated(
            xx[None], wkk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]

    # exact formula: no relu
    conv_lin = make_lpips_conv(wk, b, relu=False, interpret=True)
    g_pallas = jax.grad(
        lambda xx: jnp.sum(conv_lin(xx).astype(jnp.float32) * r)
    )(x)
    g_xla = jax.grad(
        lambda xx: jnp.sum((xla_conv_fp32(xx, wk) + b) * r)
    )(x)
    g_pallas, g_xla = np.asarray(g_pallas), np.asarray(g_xla)
    scale = np.abs(g_xla).max()
    np.testing.assert_allclose(g_pallas, g_xla, atol=0.02 * scale, rtol=0.05)

    # relu: mask taken from the pallas forward itself, dx formula in fp32
    conv = make_lpips_conv(wk, b, relu=True, interpret=True)
    y = conv(x)
    g_pl_relu = np.asarray(jax.grad(
        lambda xx: jnp.sum(conv(xx).astype(jnp.float32) * r)
    )(x))
    gm = jnp.where(y > 0, r, 0.0)
    w_t = jnp.flip(wk, axis=(0, 1)).transpose(0, 1, 3, 2)
    g_ref = np.asarray(xla_conv_fp32(gm, w_t))
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_pl_relu, g_ref, atol=0.02 * scale,
                               rtol=0.05)


def test_maxpool2x2_matches_reduce_window():
    rng = np.random.RandomState(1)
    for h, w in ((16, 16), (17, 9)):  # odd dims drop the trailing row/col
        x = jnp.asarray(rng.normal(0, 1, (h, w, 5)), jnp.float32)
        ref = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (2, 2, 1), (2, 2, 1), "VALID"
        )
        np.testing.assert_array_equal(np.asarray(maxpool2x2(x)),
                                      np.asarray(ref))
    # VJP is well-defined and mass-preserving for distinct maxima
    x = jnp.asarray(rng.normal(0, 1, (8, 8, 2)), jnp.float32)
    g = jax.grad(lambda xx: jnp.sum(maxpool2x2(xx)))(x)
    assert float(jnp.sum(g)) == pytest.approx(4 * 4 * 2)


def test_maxpool2x2_layout_matches_composed():
    """Direct layout->layout pool == build_layout(maxpool(unlayout)) in
    values AND cotangents, including an odd-height boundary (720p-style
    45 -> 22 drops the trailing row)."""
    from manus_tpu.ops.conv_pallas import (
        StageLayout, build_layout, maxpool2x2_layout, unlayout,
    )

    rng = np.random.RandomState(2)
    for h, w in ((32, 32), (45, 64)):
        La = StageLayout(h, w, 128)
        Lb = StageLayout(h // 2, w // 2, 128)
        x = jnp.asarray(rng.normal(0, 1, (h, w, 7)), jnp.float32)
        xl = build_layout(x, La)

        def composed(a):
            return build_layout(maxpool2x2(unlayout(a, La)), Lb)

        def direct(a):
            return maxpool2x2_layout(a, La, Lb)

        ref, ref_vjp = jax.vjp(composed, xl)
        got, got_vjp = jax.vjp(direct, xl)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        # cotangents agree under the chain invariant that junk/border
        # rows carry ZERO cotangent (the head and conv kernels zero
        # them): the direct pool would otherwise route junk-column
        # cotangent into the junk input pair that the composed form's
        # pad-transpose discards
        ct = jnp.asarray(rng.normal(0, 1, ref.shape), ref.dtype)
        q = jnp.arange(Lb.rows)[:, None]
        w2b = Lb.w + 2
        valid = (
            (q >= Lb.m_blk)
            & (q < Lb.m_blk + Lb.h * w2b)
            & ((q - Lb.m_blk) % w2b < Lb.w)
        )
        ct = jnp.where(valid, ct, 0.0)
        np.testing.assert_allclose(
            np.asarray(got_vjp(ct)[0]), np.asarray(ref_vjp(ct)[0]),
            atol=1e-5,
        )


@pytest.mark.parametrize(
    "h,w,ci,co",
    [
        (13, 9, 3, 8),     # tiny, odd width (tile_h granule 16)
        (16, 16, 8, 16),   # even width (granule 8)
        (45, 45, 16, 8),   # the 720p stage-4 odd-width case, scaled down
        (7, 4, 4, 4),      # W+2 even, multiple blocks
    ],
)
def test_conv3x3_layout_chain_parity(h, w, ci, co):
    """The layout-persistent conv (build_layout -> conv3x3_layout x2 ->
    unlayout) matches two chained XLA convs: the producer's layout output
    must BE the consumer's input (zero borders, junk columns zeroed by the
    in-kernel mask, W+3-shift offset algebra)."""
    from manus_tpu.ops.conv_pallas import (
        StageLayout, build_layout, conv3x3_layout, unlayout,
    )

    rng = np.random.RandomState(h * 31 + w)
    x = jnp.asarray(rng.normal(0, 1, (h, w, ci)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.3, (3, 3, ci, co)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.2, (co,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.3, (3, 3, co, co)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.2, (co,)), jnp.float32)

    L = StageLayout(h, w, max(ci, co, 128))
    xl = build_layout(x, L)
    yl = conv3x3_layout(xl, w1, b1, True, L, True)
    zl = conv3x3_layout(yl, w2, b2, True, L, True)
    got = np.asarray(unlayout(zl, L)[:, :, :co], np.float32)

    ref1 = xla_conv_bf16(x, w1, b1, True)
    ref2 = np.asarray(xla_conv_bf16(ref1, w2, b2, True), np.float32)
    np.testing.assert_allclose(got, ref2, atol=0.08, rtol=0.08)

    # gradient flows through the chained layout convs (dx-only VJP)
    r = jnp.asarray(rng.normal(0, 1, got.shape), jnp.float32)

    def loss_layout(xx):
        al = build_layout(xx, L)
        bl = conv3x3_layout(al, w1, b1, True, L, True)
        cl = conv3x3_layout(bl, w2, b2, True, L, True)
        return jnp.sum(unlayout(cl, L)[:, :, :co].astype(jnp.float32) * r)

    def loss_xla(xx):
        y1 = jax.nn.relu(jax.lax.conv_general_dilated(
            xx[None], w1, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + b1)
        y2 = jax.nn.relu(jax.lax.conv_general_dilated(
            y1[None], w2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + b2)
        return jnp.sum(y2 * r)

    g_l = np.asarray(jax.grad(loss_layout)(x)).ravel()
    g_x = np.asarray(jax.grad(loss_xla)(x)).ravel()
    cos = np.dot(g_l, g_x) / (np.linalg.norm(g_l) * np.linalg.norm(g_x)
                              + 1e-12)
    assert cos > 0.99, f"layout-chain gradient diverged: cos={cos}"


def test_build_unlayout_roundtrip():
    from manus_tpu.ops.conv_pallas import StageLayout, build_layout, unlayout

    rng = np.random.RandomState(5)
    for h, w, c in ((9, 5, 3), (16, 32, 64), (45, 45, 8)):
        L = StageLayout(h, w, 128)
        x = jnp.asarray(rng.normal(0, 1, (h, w, c)), jnp.float32)
        xl = build_layout(x, L)
        assert xl.shape == (L.rows, max(c, 128))
        back = np.asarray(unlayout(xl, L), np.float32)
        np.testing.assert_allclose(back[:, :, :c],
                                   np.asarray(x, np.float32), atol=0.02)
        # padding lanes and borders are zero
        assert float(jnp.abs(back[:, :, c:]).max() if c < 128 else 0.0) == 0
        core = np.asarray(xl, np.float32)
        core[L.m_blk + np.arange(h)[:, None] * (w + 2)
             + np.arange(w)[None, :]] = 0  # zero the pixel rows
        assert np.abs(core).max() == 0, "non-pixel rows must be zero"


def test_lpips_distance_pallas_parity():
    """End-to-end: the pallas VGG LPIPS agrees with the fp32 XLA path to
    bf16 tolerance in value AND gradient direction (the VERDICT r2 done
    criterion for the conv stack)."""
    from manus_tpu.train.lpips import (
        lpips_distance, lpips_distance_pallas, random_lpips_params,
    )

    params = random_lpips_params(0, arch="vgg")
    rng = np.random.RandomState(2)
    img1 = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
    img2 = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)

    d_xla, g_xla = jax.value_and_grad(
        lambda a: lpips_distance(params, a, img2)
    )(img1)
    d_pl, g_pl = jax.value_and_grad(
        lambda a: lpips_distance_pallas(params, a, img2, interpret=True)
    )(img1)
    d_xla, d_pl = float(d_xla), float(d_pl)
    assert d_pl > 0
    assert abs(d_pl - d_xla) < 0.05 * max(d_xla, 1e-3)
    g_xla, g_pl = np.asarray(g_xla).ravel(), np.asarray(g_pl).ravel()
    cos = np.dot(g_xla, g_pl) / (
        np.linalg.norm(g_xla) * np.linalg.norm(g_pl) + 1e-12
    )
    assert cos > 0.99, f"gradient direction diverged: cos={cos}"
    # identical images -> zero distance
    assert float(lpips_distance_pallas(params, img1, img1,
                                       interpret=True)) < 1e-5


def test_lpips_xla_dx_engine_parity():
    """The dx-only XLA conv engine (forward-form flipped-weight dx conv,
    train/lpips.py) matches the autodiff XLA path in value and gradient
    direction, in fp32 (tight) and bf16 (tolerance)."""
    from manus_tpu.train.lpips import (
        lpips_distance, lpips_distance_xla_dx, random_lpips_params,
    )

    params = random_lpips_params(0, arch="vgg")
    rng = np.random.RandomState(2)
    img1 = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
    img2 = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
    d0, g0 = jax.value_and_grad(
        lambda a: lpips_distance(params, a, img2)
    )(img1)
    g0 = np.asarray(g0).ravel()
    for dt, dtol, ctol in ((jnp.float32, 1e-4, 0.9999),
                           (jnp.bfloat16, 0.05, 0.99)):
        d1, g1 = jax.value_and_grad(
            lambda a: lpips_distance_xla_dx(params, a, img2, dt)
        )(img1)
        assert abs(float(d1) - float(d0)) < dtol * max(float(d0), 1e-3)
        g1 = np.asarray(g1).ravel()
        cos = np.dot(g0, g1) / (np.linalg.norm(g0) * np.linalg.norm(g1)
                                + 1e-12)
        assert cos > ctol, f"{dt}: cos={cos}"


def test_compute_losses_pallas_backend():
    """The lpips_conv='pallas' knob routes compute_losses through the
    pallas stack under jit and stays consistent with the xla route."""
    from manus_tpu.train.lpips import random_lpips_params
    from manus_tpu.utils import losses as L

    params = random_lpips_params(0, arch="vgg")
    rng = np.random.RandomState(3)
    pred = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    sc = jnp.asarray(rng.rand(10, 3), jnp.float32)
    ac = jnp.ones(10, bool)

    vals = {}
    for backend in ("xla", "pallas", "xla_dx", "xla_dx_bf16"):
        @jax.jit
        def f(p, g):
            return L.compute_losses(
                p, g, sc, ac, ("rgb_loss", "lpips_loss"), (0.8, 0.1),
                lpips_params=params, lpips_enabled=jnp.asarray(True),
                lpips_conv=backend,
            )[1]["lpips_loss"]

        vals[backend] = float(f(pred, gt))
    assert vals["pallas"] > 0
    for backend in ("pallas", "xla_dx", "xla_dx_bf16"):
        assert abs(vals[backend] - vals["xla"]) < 0.05 * vals["xla"], backend
