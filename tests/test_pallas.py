"""Pallas kernel parity vs the oracle/XLA paths (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from manus_tpu.ops.rasterizer.api import RasterConfig, render_gaussians
from tests.utils import make_test_camera, random_scene


def _cfg(backend):
    return RasterConfig(backend=backend, tg_max=64, max_pairs_per_tile=1024,
                        chunk=32, pallas_chunk=64)


def _render(scene, cam, backend, m2d=None):
    return render_gaussians(
        jnp.asarray(scene["means"]),
        jnp.asarray(scene["cov6"]),
        jnp.asarray(scene["means"]),
        jnp.zeros((scene["means"].shape[0], 16, 3)),
        jnp.asarray(scene["opacity"]),
        cam,
        jnp.asarray([0.15, 0.25, 0.35]),
        colors_precomp=jnp.asarray(scene["colors"]),
        config=_cfg(backend),
        means2d_offset=m2d,
    )


def test_pallas_matches_xla_forward():
    cam = make_test_camera(64, 64)
    scene = random_scene(250, seed=3)
    out_x = _render(scene, cam, "xla")
    out_p = _render(scene, cam, "pallas")
    np.testing.assert_allclose(
        np.asarray(out_p.render), np.asarray(out_x.render), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_p.t_final), np.asarray(out_x.t_final), atol=2e-5
    )
    assert float(out_p.t_final.min()) < 0.5  # scene actually covers pixels


def test_pallas_matches_xla_gradients():
    cam = make_test_camera(48, 48)
    scene = random_scene(120, seed=5)
    target = np.random.RandomState(1).uniform(0, 1, (48, 48, 3)).astype(np.float32)
    n = 120

    def loss_fn(means, cov6, colors, opacity, m2d, backend):
        out = render_gaussians(
            means, cov6, means, jnp.zeros((n, 16, 3)), opacity, cam,
            jnp.asarray([0.3, 0.1, 0.2]), colors_precomp=colors,
            config=_cfg(backend), means2d_offset=m2d,
        )
        return jnp.sum(jnp.abs(out.render - target))

    args = (
        jnp.asarray(scene["means"]),
        jnp.asarray(scene["cov6"]),
        jnp.asarray(scene["colors"]),
        jnp.asarray(scene["opacity"]),
        jnp.zeros((n, 2)),
    )
    g_x = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(*args, "xla")
    g_p = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(*args, "pallas")
    for name, a, b in zip(["means", "cov", "colors", "op", "m2d"], g_x, g_p):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4,
                                   err_msg=f"grad mismatch: {name}")
        assert np.abs(a).max() > 0


def test_pallas_saturated_tile_early_exit_grads():
    # Heavily saturated scene: early exit must still produce correct grads
    # (zero for fully occluded gaussians).
    cam = make_test_camera(32, 32)
    n = 40
    rng = np.random.RandomState(9)
    means = np.concatenate(
        [rng.uniform(-0.1, 0.1, (n - 1, 2)), np.linspace(0, 0.5, n - 1)[:, None]],
        axis=1,
    ).astype(np.float32)
    means = np.concatenate([means, [[0.0, 0.0, 2.0]]], axis=0)  # far behind
    s = 0.3
    cov6 = np.tile([[s * s, 0, 0, s * s, 0, s * s]], (n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacity = np.full((n,), 0.98, np.float32)

    def loss(colors_in, backend):
        out = render_gaussians(
            jnp.asarray(means), jnp.asarray(cov6), jnp.asarray(means),
            jnp.zeros((n, 16, 3)), jnp.asarray(opacity), cam, jnp.zeros(3),
            colors_precomp=colors_in, config=_cfg(backend),
        )
        return jnp.sum(out.render)

    g_x = np.asarray(jax.grad(loss)(jnp.asarray(colors), "xla"))
    g_p = np.asarray(jax.grad(loss)(jnp.asarray(colors), "pallas"))
    scale = np.abs(g_x).max()
    np.testing.assert_allclose(g_x / scale, g_p / scale, atol=1e-4)
    # the far gaussian is occluded over the saturated gaussian core (only
    # faint falloff pixels see it) — its gradient must be tiny vs the front
    assert np.abs(g_p[-1]).max() < 0.01 * scale


def test_tile_block_composite_matches_full():
    """Tile-sharded composite building block: rasterising a BLOCK of the
    tile grid with tile_base must reproduce the corresponding slice of
    the full-grid outputs (pallas interpret + xla paths)."""
    from manus_tpu.ops.rasterizer import pallas_backend, payload as pm, tiled_xla
    from manus_tpu.ops.rasterizer.binning import bin_gaussians
    from manus_tpu.ops.rasterizer.projection import TILE, project_gaussians

    scene = random_scene(300, seed=5)
    cam = make_test_camera(64, 64)
    proj = project_gaussians(
        jnp.asarray(scene["means"]), jnp.asarray(scene["cov6"]), cam
    )
    ntx = nty = 64 // TILE
    bins = bin_gaussians(proj, ntx, nty, 64, 128, 8, 1024)
    pay = pm.build_payload(
        proj, jnp.asarray(scene["colors"]), jnp.asarray(scene["opacity"]),
        bins, 64,
    )
    rgb_full, t_full = pallas_backend.composite_tiles_pallas(
        pay, bins.tile_offsets, bins.tile_counts, ntx, nty, tile=TILE,
        chunk=64, interpret=True,
    )
    T = ntx * nty
    for base, count in ((0, T // 2), (T // 2, T // 2)):
        rgb_b, t_b = pallas_backend.composite_tiles_pallas(
            pay, bins.tile_offsets[base : base + count],
            bins.tile_counts[base : base + count], ntx, nty, tile=TILE,
            chunk=64, interpret=True,
            tile_base=jnp.asarray([base], jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(rgb_b), np.asarray(rgb_full)[base : base + count],
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(t_b), np.asarray(t_full)[base : base + count],
            atol=1e-6,
        )
        # xla path too
        rgb_x, t_x = tiled_xla.composite_tiles_xla(
            pay,
            bins._replace(
                tile_offsets=bins.tile_offsets[base : base + count],
                tile_counts=bins.tile_counts[base : base + count],
            ),
            ntx, nty, TILE, 1024, chunk=32,
            tile_base=jnp.asarray(base, jnp.int32), num_tiles_local=count,
        )
        np.testing.assert_allclose(
            np.asarray(rgb_x), np.asarray(rgb_full)[base : base + count],
            atol=1e-5,
        )


def test_pallas_clustered_scene_empty_programs():
    """Clustered scene at 128^2 (64 tiles, 8 grid programs): most tile
    programs are fully empty — exercises the empty-tile constant-write
    branch and the kstop==0 backward skip against the xla path, fwd+grad."""
    cam = make_test_camera(128, 128)
    scene = random_scene(250, seed=9, spread=0.08)  # tight cluster
    scene["means"] = scene["means"] + np.array([-0.35, -0.35, 0.0],
                                               np.float32)  # off-center

    def loss(backend, means):
        s = dict(scene, means=means)
        out = _render(s, cam, backend)
        return (out.render * jnp.cos(jnp.arange(3.0))).sum(), out

    for backend in ("xla", "pallas"):
        (val, out), g = jax.value_and_grad(
            lambda m: loss(backend, m), has_aux=True
        )(jnp.asarray(scene["means"]))
        if backend == "xla":
            ref_val, ref_out, ref_g = val, out, g
    # some tiles must actually be empty for this test to mean anything
    assert float(np.asarray(ref_out.t_final).max()) == 1.0
    np.testing.assert_allclose(np.asarray(out.render),
                               np.asarray(ref_out.render), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.t_final),
                               np.asarray(ref_out.t_final), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g),
                               atol=5e-5)
