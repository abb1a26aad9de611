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
