"""Spatio-temporal models and the multivariate-Gibbs GP models."""

import numpy as np
import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.models import (
    MultivariateGibbsGP,
    SparseMultivariateGibbsGP,
    SparseSpatioTemporalNonstationary,
    SpatioTemporalStationary,
)
from nonstationary_precip_tpu.priors import LogNormalProcess
from nonstationary_precip_tpu.train import fit


def _st_toy(rng, n=40):
    t = rng.uniform(-1, 1, size=(n, 1))
    lonlat = rng.normal(size=(n, 2))
    x = np.concatenate([t, lonlat], axis=1)
    y = np.sin(3 * t[:, 0]) + 0.3 * lonlat[:, 0] + 0.05 * rng.normal(size=n)
    return jnp.asarray(x, jnp.float64), jnp.asarray(y, jnp.float64)


def test_stationary_st_model_trains_and_predicts(rng):
    x, y = _st_toy(rng)
    model = SpatioTemporalStationary.create(dtype=jnp.float64)
    assert float(model.kernel.kernels[0].outputscale) > 7.0  # GreaterThan(7)
    l0 = float(model.loss(x, y))
    res = fit(model, lambda m, xx, yy: m.loss(xx, yy), x, y, lr=0.05, num_steps=40)
    assert float(res.losses[-1]) < l0
    post = res.model.posterior(x, y, x[:5])
    assert post.mean.shape == (5,)


def test_nonstationary_st_model(rng, key):
    x, y = _st_toy(rng, n=36)
    z = np.asarray(x)[::4]
    prior = LogNormalProcess.create(2, mean=np.log(0.3), outputscale=1.0, lengthscale=1.3, dtype=jnp.float64)
    model = SparseSpatioTemporalNonstationary.create(z, prior, dtype=jnp.float64)
    l0 = float(model.loss(x, y))
    assert np.isfinite(l0)

    mask = model.trainable()
    res = fit(
        model, lambda m, xx, yy: m.loss(xx, yy), x, y, lr=0.02, num_steps=30, mask=mask
    )
    assert float(res.losses[-1]) < l0
    # frozen z and prior unchanged
    np.testing.assert_allclose(np.asarray(res.model.z), np.asarray(model.z))
    np.testing.assert_allclose(
        np.asarray(res.model.prior.raw_lengthscale), np.asarray(model.prior.raw_lengthscale)
    )
    post = res.model.posterior(x, y, x[:7])
    assert post.mean.shape == (7,)
    assert np.all(np.asarray(post.var) > -1e-6)


def test_nonstationary_st_approx_kernel_psd(rng):
    x, y = _st_toy(rng, n=30)
    z = np.asarray(x)[::3]
    prior = LogNormalProcess.create(2, dtype=jnp.float64)
    model = SparseSpatioTemporalNonstationary.create(z, prior, dtype=jnp.float64)
    k = np.asarray(model._approx_kernel(x))
    evs = np.linalg.eigvalsh(k)
    assert evs.min() > -1e-7


# -- multivariate Gibbs models ------------------------------------------------


def test_multivariate_gibbs_gp(rng, key):
    n = 20
    x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float64)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), jnp.float64)
    model = MultivariateGibbsGP.create(key, x, noise=0.05, dtype=jnp.float64)
    l0 = float(model.loss(x, y))
    assert np.isfinite(l0)

    res = fit(
        model,
        lambda m, xx, yy: m.loss(xx, yy),
        x,
        y,
        lr=0.02,
        num_steps=25,
        mask=model.trainable(),
    )
    assert float(res.losses[-1]) < l0
    xs = jnp.asarray(rng.normal(size=(6, 2)), jnp.float64)
    post = res.model.posterior(x, y, xs)
    assert post.mean.shape == (6,)
    assert np.all(np.asarray(post.var) > 0)


def test_multivariate_gibbs_detach_h_blocks_likelihood_grad(rng, key):
    """detach_h=True replicates the reference (multivariate_gibbs_kernel.py:85):
    H's gradient must come only from the prior term."""
    n = 12
    x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float64)
    y = jnp.asarray(rng.normal(size=n), jnp.float64)
    m_det = MultivariateGibbsGP.create(key, x, noise=0.05, detach_h=True, dtype=jnp.float64)

    g_full = jax.grad(lambda m: m.loss(x, y))(m_det)
    g_prior = jax.grad(lambda m: -m.h_prior.log_prob(m.h) / n)(m_det)
    np.testing.assert_allclose(np.asarray(g_full.h), np.asarray(g_prior.h), rtol=1e-8)


def test_sparse_multivariate_gibbs_gp(rng, key):
    n, m = 24, 8
    x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float64)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), jnp.float64)
    z = jnp.asarray(rng.normal(size=(m, 2)), jnp.float64)
    model = SparseMultivariateGibbsGP.create(key, z, noise=0.05, dtype=jnp.float64)
    l0 = float(model.loss(x, y))
    assert np.isfinite(l0)
    res = fit(
        model,
        lambda m_, xx, yy: m_.loss(xx, yy),
        x,
        y,
        lr=0.02,
        num_steps=20,
        mask=model.trainable(),
    )
    assert float(res.losses[-1]) < l0
    post = res.model.posterior(x, y, x[:4])
    assert post.mean.shape == (4,)
