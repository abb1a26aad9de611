"""Loss numerics: SSIM matmul-blur vs direct 2D convolution reference."""
import numpy as np
import jax
import jax.numpy as jnp

from manus_tpu.utils import losses as L


def _reference_ssim(img1, img2, ws=11, sigma=1.5):
    """Direct NumPy port of the reference SSIM (loss_utils.py:38-97):
    2D Gaussian window, per-channel zero-padded conv."""
    g = np.exp(-((np.arange(ws) - ws // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    w2d = np.outer(g, g)
    h, w, c = img1.shape
    pad = ws // 2

    def conv(img):
        out = np.zeros_like(img)
        padded = np.pad(img, ((pad, pad), (pad, pad), (0, 0)))
        for i in range(ws):
            for j in range(ws):
                out += w2d[i, j] * padded[i : i + h, j : j + w]
        return out

    mu1, mu2 = conv(img1), conv(img2)
    s1 = conv(img1 * img1) - mu1 * mu1
    s2 = conv(img2 * img2) - mu2 * mu2
    s12 = conv(img1 * img2) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 * mu1 + mu2 * mu2 + C1) * (s1 + s2 + C2)
    )
    return m.mean()


def test_ssim_matches_direct_convolution():
    rng = np.random.RandomState(0)
    a = rng.rand(40, 48, 3).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ours = float(L.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = float(_reference_ssim(a.astype(np.float64), b.astype(np.float64)))
    assert abs(ours - ref) < 1e-5
    assert float(L.ssim(jnp.asarray(a), jnp.asarray(a))) > 0.999


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    assert abs(float(L.psnr(a, b)) - 20.0) < 1e-4


def test_ssim_gradient_finite():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    g = jax.grad(lambda x: L.ssim(x, b))(a)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0


def test_lpips_alexnet_arch():
    """AlexNet eval backbone (reference evaluates LPIPS with alexnet,
    loss_utils.py:17-19): feature pyramid shapes match torchvision's
    features[0..11] slices, the distance is a proper premetric, and arch
    inference distinguishes the two key schemes."""
    import jax.numpy as jnp

    from manus_tpu.train import lpips as lp

    alex = lp.random_lpips_params(0, arch="alex")
    vgg = lp.random_lpips_params(0, arch="vgg")
    assert lp.infer_arch(alex) == "alex"
    assert lp.infer_arch(vgg) == "vgg"
    # torchvision AlexNet feature map sizes at 64x64 input:
    # conv1 11/4 p2 -> 15; pool3/2 -> 7; conv2 -> 7; pool -> 3; conv3..5 -> 3
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    feats = lp.backbone_features(alex, x, "alex")
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 15, 15, 64), (1, 7, 7, 192), (1, 3, 3, 384),
        (1, 3, 3, 256), (1, 3, 3, 256),
    ]
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(64, 64, 3), jnp.float32)
    b = jnp.asarray(rng.rand(64, 64, 3), jnp.float32)
    d_ab = float(lp.lpips_distance(alex, a, b))
    d_aa = float(lp.lpips_distance(alex, a, a))
    assert d_ab > 0.0 and abs(d_aa) < 1e-6
    # the two backbones are genuinely different computations
    assert abs(d_ab - float(lp.lpips_distance(vgg, a, b))) > 1e-6
    # provenance modes
    _, mode = lp.resolve_lpips_params_mode("", True, log=lambda *a: None,
                                           arch="alex")
    assert mode == "alex:random-feature"
    _, mode_off = lp.resolve_lpips_params_mode("", False,
                                               log=lambda *a: None)
    assert mode_off == "off"


def test_lpips_downsample_knob():
    """lpips_downsample k>1 pools before the VGG: values stay close to the
    full-res distance and the default k=1 path is untouched."""
    import jax.numpy as jnp

    from manus_tpu.train.lpips import resolve_lpips_params
    from manus_tpu.utils import losses as L

    params = resolve_lpips_params("", allow_fallback=True,
                                  log=lambda *a: None)
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.rand(64, 64, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(64, 64, 3), jnp.float32)
    sc = jnp.asarray(rng.rand(10, 3), jnp.float32)
    ac = jnp.ones(10, bool)
    vals = {}
    for k in (1, 2):
        _, parts = L.compute_losses(
            pred, gt, sc, ac, ("rgb_loss", "lpips_loss"), (0.8, 0.1),
            lpips_params=params, lpips_enabled=jnp.asarray(True),
            lpips_downsample=k,
        )
        vals[k] = float(parts["lpips_loss"])
    assert vals[1] > 0 and vals[2] > 0
    assert abs(vals[1] - vals[2]) < 0.5 * vals[1]


def test_lpips_gt_feature_cache_parity():
    """compute_losses with precomputed gt features (the trainer's
    gt-feature cache) matches the recomputed-gt path for every engine —
    the cache is exact, not an approximation."""
    from manus_tpu.train.lpips import lpips_features, resolve_lpips_params

    params = resolve_lpips_params("", allow_fallback=True,
                                  log=lambda *a: None)
    rng = np.random.RandomState(3)
    pred = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
    sc = jnp.asarray(rng.rand(10, 3), jnp.float32)
    ac = jnp.ones(10, bool)

    for engine, tol in (("xla", 1e-6), ("xla_dx", 1e-6),
                        ("xla_dx_bf16", 1e-6), ("pallas", 1e-6)):
        feats = jax.jit(
            lambda p, g: lpips_features(p, g, engine)
        )(params, gt)

        def run(gt_feats):
            _, parts = L.compute_losses(
                pred, gt, sc, ac, ("rgb_loss", "lpips_loss"), (0.8, 0.1),
                lpips_params=params, lpips_enabled=jnp.asarray(True),
                lpips_conv=engine, lpips_gt_feats=gt_feats,
            )
            return float(parts["lpips_loss"])

        base = run(None)
        cached = run(list(feats))
        assert base > 0
        assert abs(cached - base) < tol + 1e-4 * base, (
            f"{engine}: cached {cached} vs recomputed {base}")


def test_lpips_gt_feature_cache_gradient():
    """The pred gradient through the cached-gt path matches the
    recomputed-gt path (gt never carried gradient)."""
    from manus_tpu.train.lpips import lpips_features, resolve_lpips_params

    params = resolve_lpips_params("", allow_fallback=True,
                                  log=lambda *a: None)
    rng = np.random.RandomState(4)
    pred = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
    sc = jnp.asarray(rng.rand(10, 3), jnp.float32)
    ac = jnp.ones(10, bool)
    feats = lpips_features(params, gt, "xla_dx")

    def loss(p, gt_feats):
        total, _ = L.compute_losses(
            p, gt, sc, ac, ("rgb_loss", "lpips_loss"), (0.8, 0.1),
            lpips_params=params, lpips_enabled=jnp.asarray(True),
            lpips_conv="xla_dx", lpips_gt_feats=gt_feats,
        )
        return total

    g0 = np.asarray(jax.grad(loss)(pred, None)).ravel()
    g1 = np.asarray(jax.grad(loss)(pred, list(feats))).ravel()
    np.testing.assert_allclose(g1, g0, atol=1e-6, rtol=1e-4)
