"""SVGP layer and DSVI deep GP."""

import numpy as np
import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.models.svgp import SVGPLayer
from nonstationary_precip_tpu.models.deep_gp import DeepGP
from nonstationary_precip_tpu.train import fit


def test_svgp_init_kl_is_zero(key):
    layer = SVGPLayer.create(key, input_dims=2, output_dims=3, num_inducing=10)
    np.testing.assert_allclose(float(layer.kl()), 0.0, atol=1e-6)


def test_svgp_prior_marginals_at_init(key, rng):
    """With m=0, S=I the posterior equals the prior: mean = μ(x), var = s²."""
    layer = SVGPLayer.create(key, 2, 2, num_inducing=15, dtype=jnp.float64)
    x = jnp.asarray(rng.normal(size=(9, 2)))
    mean, var = layer.marginals(x)
    np.testing.assert_allclose(np.asarray(mean), 0.0, atol=1e-6)
    s2 = float(jnp.logaddexp(0.0, 0.0))  # softplus(0)
    np.testing.assert_allclose(np.asarray(var), s2, rtol=1e-4)


def test_svgp_marginals_oracle(key, rng):
    """Whitened marginals vs direct numpy algebra."""
    layer = SVGPLayer.create(key, 1, 1, num_inducing=8, dtype=jnp.float64)
    # randomise variational params
    k1, k2 = jax.random.split(key)
    layer = layer.replace(
        var_mean=jax.random.normal(k1, layer.var_mean.shape, dtype=jnp.float64),
        var_chol=layer.var_chol
        + 0.1 * jnp.tril(jax.random.normal(k2, layer.var_chol.shape, dtype=jnp.float64)),
    )
    x = jnp.asarray(rng.normal(size=(6, 1)))
    mean, var = layer.marginals(x)

    ell = float(jnp.logaddexp(layer.raw_lengthscale[0, 0], 0.0))
    s2 = float(jnp.logaddexp(layer.raw_outputscale[0], 0.0))
    z = np.asarray(layer.z[0])
    xs = np.asarray(x)

    def k(a, b):
        return s2 * np.exp(-0.5 * (a[:, None, 0] - b[None, :, 0]) ** 2 / ell**2)

    kzz = k(z, z) + 1e-5 * np.eye(8)
    lzz = np.linalg.cholesky(kzz)
    a = k(xs, z) @ np.linalg.inv(lzz).T
    m = np.asarray(layer.var_mean[0])
    s = np.tril(np.asarray(layer.var_chol[0]))
    mean_ref = a @ m
    var_ref = s2 - (a**2).sum(-1) + ((a @ s) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(mean[0]), mean_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var[0]), var_ref, rtol=1e-5)


def test_svgp_kl_oracle(key):
    layer = SVGPLayer.create(key, 2, 1, num_inducing=6, dtype=jnp.float64)
    m = jnp.asarray(np.linspace(-1, 1, 6))[None, :]
    s = jnp.asarray(np.tril(0.2 * np.ones((6, 6)) + np.eye(6)))[None, :, :]
    layer = layer.replace(var_mean=m, var_chol=s)
    ours = float(layer.kl())
    s_np = np.tril(np.asarray(s[0]))
    cov = s_np @ s_np.T
    ref = 0.5 * (np.trace(cov) + np.asarray(m[0]) @ np.asarray(m[0]) - 6 - np.linalg.slogdet(cov)[1])
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_deep_gp_elbo_and_training(key, rng):
    x = jnp.asarray(rng.normal(size=(32, 2)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), jnp.float32)
    model = DeepGP.create(key, input_dims=2, num_layers=2, num_inducing=8)
    k0 = jax.random.PRNGKey(0)
    l0 = float(model.loss(k0, x, y, num_data=32, num_samples=3))
    assert np.isfinite(l0)

    def loss_fn(m, kk, xx, yy):
        return m.loss(kk, xx, yy, num_data=32, num_samples=3)

    # few steps of Adam with a fixed key (deterministic smoke test)
    res = fit(model, loss_fn, k0, x, y, lr=0.01, num_steps=40)
    assert float(res.losses[-1]) < l0


def test_deep_gp_predict_shapes(key, rng):
    x = jnp.asarray(rng.normal(size=(16, 2)), jnp.float32)
    model = DeepGP.create(key, input_dims=2, num_layers=2, num_inducing=8)
    dist, means, variances = model.predict(jax.random.PRNGKey(1), x, num_samples=5)
    assert dist.mean.shape == (16,)
    assert dist.var.shape == (16,)
    assert means.shape == (5, 16)
    assert np.all(np.asarray(dist.var) > 0)


def test_svgp_joint_consistent_with_marginals(key, rng):
    """diag(joint cov) must equal the marginal variances."""
    layer = SVGPLayer.create(key, 2, 2, num_inducing=9, dtype=jnp.float64)
    k1, k2 = jax.random.split(key)
    layer = layer.replace(
        var_mean=jax.random.normal(k1, layer.var_mean.shape, dtype=jnp.float64),
        var_chol=layer.var_chol
        + 0.1 * jnp.tril(jax.random.normal(k2, layer.var_chol.shape, dtype=jnp.float64)),
    )
    x = jnp.asarray(rng.normal(size=(7, 2)))
    mean_m, var_m = layer.marginals(x)
    mean_j, cov_j = layer.joint(x)
    np.testing.assert_allclose(np.asarray(mean_j), np.asarray(mean_m), rtol=1e-8)
    np.testing.assert_allclose(
        np.diagonal(np.asarray(cov_j), axis1=-2, axis2=-1), np.asarray(var_m), rtol=1e-6
    )


def test_deep_gp_full_cov_loss_finite(key, rng):
    x = jnp.asarray(rng.normal(size=(12, 2)), jnp.float32)
    y = jnp.zeros((12,), jnp.float32)
    model = DeepGP.create(key, input_dims=2, num_layers=2, num_inducing=6)
    l = float(model.loss(jax.random.PRNGKey(3), x, y, num_data=12, num_samples=2, full_cov=True))
    assert np.isfinite(l)


def test_deep_gp_shared_hidden_replicates_reference_tying(key, rng):
    """share_hidden=True reapplies one layer (the reference's dgps.py:88
    ModuleList-of-the-same-object quirk)."""
    model = DeepGP.create(
        key, input_dims=2, num_layers=3, num_inducing=6, share_hidden=True
    )
    assert len(model.layers) == 1
    stack = model._hidden_stack()
    assert len(stack) == 3
    assert all(s is stack[0] for s in stack)
    x = jnp.asarray(rng.normal(size=(8, 2)), jnp.float32)
    y = jnp.zeros((8,), jnp.float32)
    l = float(model.loss(jax.random.PRNGKey(2), x, y, num_data=8, num_samples=2))
    assert np.isfinite(l)


def test_precompute_layers_matches_per_layer(key, rng):
    """Stacked batched precompute == per-layer precompute (same M), and
    mixed-M DeepGP construction falls back cleanly."""
    import jax.numpy as jnp

    from nonstationary_precip_tpu.models.svgp import SVGPLayer, precompute_layers

    k1, k2 = jax.random.split(key)
    a = SVGPLayer.create(k1, 2, 2, num_inducing=12)
    b = SVGPLayer.create(k2, 2, 1, num_inducing=12)
    stacked = precompute_layers([a, b])
    for layer, pre_s in zip([a, b], stacked):
        pre_1 = precompute_layers([layer])[0]
        for x, y in zip(pre_s, pre_1):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6)


def test_deepgp_mixed_inducing_counts_fallback(key):
    """propagate's batched-precompute path requires equal M; a DeepGP with
    mixed M must still run via the per-layer fallback."""
    import jax.numpy as jnp

    from nonstationary_precip_tpu.models import DeepGP
    from nonstationary_precip_tpu.models.svgp import SVGPLayer

    model = DeepGP.create(key, input_dims=2, num_layers=1, num_inducing=8)
    small_head = SVGPLayer.create(jax.random.PRNGKey(9), 2, 1, num_inducing=6)
    model = model.replace(head=small_head)
    x = jnp.zeros((5, 2), jnp.float32)
    y = jnp.zeros(5, jnp.float32)
    loss = model.loss(jax.random.PRNGKey(1), x, y, num_data=5, num_samples=2)
    assert np.isfinite(float(loss))


def test_deepgp_spatial_shared_flag_ties_layers():
    """--model shared must actually construct the tied-hidden-layer DeepGP
    (the reference's dgps.py:88 quirk) — it was silently ignored."""
    from nonstationary_precip_tpu.data.datasets import load_uib_spatial
    from nonstationary_precip_tpu.experiments.deepgp_spatial import prep_split
    from nonstationary_precip_tpu.train.config import ExperimentConfig

    data, _, _ = load_uib_spatial()
    import numpy as np
    import pandas as pd  # noqa: F401 (dataset helper returns arrays)

    from nonstationary_precip_tpu.data.dataprep import load_csv
    from nonstationary_precip_tpu.utils.config import DATASET_DIR

    raw = load_csv(DATASET_DIR / "uib_spatial.csv")
    cfg = ExperimentConfig(model="shared", num_layers=2, num_inducing=16)
    model, *_ = prep_split(raw, 0, cfg)
    assert model.share_hidden
    cfg2 = ExperimentConfig(model="", num_layers=2, num_inducing=16)
    model2, *_ = prep_split(raw, 0, cfg2)
    assert not model2.share_hidden
