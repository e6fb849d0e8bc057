"""GP model objectives and predictions vs numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.stats

from nonstationary_precip_tpu.kernels import RBF, Scale
from nonstationary_precip_tpu.models import ExactGP, GibbsExactGP, GibbsSparseGP
from nonstationary_precip_tpu.models.sgpr import SGPR
from nonstationary_precip_tpu.priors import LogNormalProcess
from nonstationary_precip_tpu.train import rmse_rescaled, rmse_raw, nlpd_joint, fit


def _rbf_np(x1, x2, ell, s2=1.0):
    d2 = ((x1[:, None, :] - x2[None, :, :]) / ell) ** 2
    return s2 * np.exp(-0.5 * d2.sum(-1))


def _toy(rng, n=25, d=2, noise=0.05):
    x = rng.normal(size=(n, d))
    f = np.sin(x[:, 0]) + 0.5 * np.cos(2 * x[:, 1] if d > 1 else x[:, 0])
    y = f + noise * rng.normal(size=n)
    return x, y


# -- ExactGP ----------------------------------------------------------------


def test_exact_gp_mll_matches_scipy(rng):
    x, y = _toy(rng)
    ell, s2, noise = 0.9, 1.4, 0.1
    model = ExactGP.create(
        Scale.create(RBF.create(2, lengthscale=ell, dtype=jnp.float64), outputscale=s2, dtype=jnp.float64),
        noise=noise,
        mean_type="zero",
        dtype=jnp.float64,
    )
    ours = float(model.mll(jnp.asarray(x), jnp.asarray(y)))
    k = _rbf_np(x, x, np.full(2, ell), s2) + float(model.likelihood.noise) * np.eye(len(x))
    ref = scipy.stats.multivariate_normal(np.zeros(len(x)), k).logpdf(y) / len(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_exact_gp_posterior_matches_numpy(rng):
    x, y = _toy(rng)
    xs = rng.normal(size=(7, 2))
    ell, s2 = 0.9, 1.4
    model = ExactGP.create(
        Scale.create(RBF.create(2, lengthscale=ell, dtype=jnp.float64), outputscale=s2, dtype=jnp.float64),
        noise=0.1,
        mean_type="zero",
        dtype=jnp.float64,
    )
    post = model.posterior(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xs))
    noise = float(model.likelihood.noise)
    k_xx = _rbf_np(x, x, np.full(2, ell), s2) + noise * np.eye(len(x))
    k_sx = _rbf_np(xs, x, np.full(2, ell), s2)
    k_ss = _rbf_np(xs, xs, np.full(2, ell), s2)
    mean_ref = k_sx @ np.linalg.solve(k_xx, y)
    cov_ref = k_ss - k_sx @ np.linalg.solve(k_xx, k_sx.T)
    np.testing.assert_allclose(np.asarray(post.mean), mean_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(post.cov), cov_ref, rtol=1e-5, atol=1e-8)


def test_exact_gp_fit_reduces_loss(rng):
    x, y = _toy(rng, n=30)
    model = ExactGP.create(
        Scale.create(RBF.create(2, dtype=jnp.float32), dtype=jnp.float32),
        mean_type="zero",
        dtype=jnp.float32,
    )
    res = fit(
        model,
        lambda m, xx, yy: m.loss(xx, yy),
        jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32),
        lr=0.05,
        num_steps=60,
    )
    assert float(res.losses[-1]) < float(res.losses[0]) - 0.05


# -- SGPR --------------------------------------------------------------------


def test_sgpr_with_all_inducing_equals_exact(rng):
    """Titsias bound is tight (== exact MLL) when Z = X."""
    x, y = _toy(rng, n=20)
    kernel = Scale.create(RBF.create(2, lengthscale=1.1, dtype=jnp.float64), outputscale=0.8, dtype=jnp.float64)
    exact = ExactGP.create(kernel, noise=0.15, mean_type="zero", dtype=jnp.float64)
    sparse = SGPR.create(kernel, z=x, noise=0.15, dtype=jnp.float64)
    l_exact = float(exact.loss(jnp.asarray(x), jnp.asarray(y)))
    l_sparse = float(sparse.loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(l_sparse, l_exact, rtol=1e-5)


def test_sgpr_predictive_with_all_inducing_matches_exact(rng):
    x, y = _toy(rng, n=20)
    xs = rng.normal(size=(5, 2))
    kernel = Scale.create(RBF.create(2, lengthscale=1.1, dtype=jnp.float64), outputscale=0.8, dtype=jnp.float64)
    exact = ExactGP.create(kernel, noise=0.15, mean_type="zero", dtype=jnp.float64)
    sparse = SGPR.create(kernel, z=x, noise=0.15, dtype=jnp.float64)
    p_exact = exact.posterior(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xs))
    p_sparse = sparse.posterior(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(p_sparse.mean), np.asarray(p_exact.mean), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(p_sparse.var), np.asarray(p_exact.var), rtol=1e-4, atol=1e-7
    )


def test_sgpr_bound_below_exact_mll(rng):
    """Collapsed bound ≤ exact MLL for any Z (loss = −bound ≥ −mll)."""
    x, y = _toy(rng, n=30)
    kernel = Scale.create(RBF.create(2, lengthscale=1.1, dtype=jnp.float64), outputscale=0.8, dtype=jnp.float64)
    exact = ExactGP.create(kernel, noise=0.15, mean_type="zero", dtype=jnp.float64)
    sparse = SGPR.create(kernel, z=x[:8], noise=0.15, dtype=jnp.float64)
    assert float(sparse.loss(jnp.asarray(x), jnp.asarray(y))) >= float(
        exact.loss(jnp.asarray(x), jnp.asarray(y))
    ) - 1e-8


# -- Gibbs models -----------------------------------------------------------


def _gibbs_setup(rng, n=18):
    x, y = _toy(rng, n=n)
    prior = LogNormalProcess.create(
        2, mean=np.log(0.3), outputscale=1.0, lengthscale=1.3, dtype=jnp.float64
    )
    return jnp.asarray(x), jnp.asarray(y), prior


def test_gibbs_exact_gp_loss_oracle(rng):
    x, y, prior = _gibbs_setup(rng)
    model = GibbsExactGP.create(x, prior, noise=0.011, outputscale=0.644, dtype=jnp.float64)
    ours = float(model.loss(x, y))

    # oracle: Gibbs gram with constant field exp(log 0.3) == RBF(0.3)
    n = y.shape[0]
    k = 0.644 * _rbf_np(np.asarray(x), np.asarray(x), np.full(2, 0.3), 1.0)
    k += float(model.likelihood.noise) * np.eye(n)
    logp = scipy.stats.multivariate_normal(np.zeros(n), k).logpdf(np.asarray(y))
    prior_term = float(prior.log_prob(x, model.log_ell))
    np.testing.assert_allclose(ours, -(logp + prior_term) / n, rtol=1e-6)


def test_gibbs_exact_gp_hoisted_prior_chols_equivalent(rng):
    """loss with precomputed prior factorisations == loss without."""
    x, y, prior = _gibbs_setup(rng)
    model = GibbsExactGP.create(x, prior, noise=0.011, outputscale=0.644, dtype=jnp.float64)
    chols = prior.gram_chol(x)
    np.testing.assert_allclose(
        float(model.loss(x, y)), float(model.loss(x, y, chols)), rtol=1e-12
    )


def test_gibbs_exact_gp_grad_flows_to_field(rng):
    x, y, prior = _gibbs_setup(rng)
    model = GibbsExactGP.create(x, prior, noise=0.011, outputscale=0.644, dtype=jnp.float64)
    grads = jax.grad(lambda m: m.loss(x, y))(model)
    assert float(jnp.abs(grads.log_ell).max()) > 0

    mask = model.trainable()
    from nonstationary_precip_tpu.utils.struct import mask_grads

    masked = mask_grads(grads, mask)
    # frozen: prior hypers, noise, outputscale
    assert float(jnp.abs(masked.prior.raw_lengthscale).max()) == 0
    assert float(jnp.abs(masked.likelihood.raw_noise).max()) == 0
    assert float(jnp.abs(masked.raw_outputscale).max()) == 0
    assert float(jnp.abs(masked.log_ell).max()) > 0


def test_gibbs_exact_gp_predict_shapes_and_sanity(rng):
    x, y, prior = _gibbs_setup(rng)
    xs = jnp.asarray(rng.normal(size=(6, 2)))
    model = GibbsExactGP.create(x, prior, noise=0.011, outputscale=0.644, dtype=jnp.float64)
    post = model.posterior(x, y, xs)
    assert post.mean.shape == (6,)
    assert post.cov.shape == (6, 6)
    assert np.all(np.asarray(post.var) > 0)
    # predicting at the training points reproduces y (low noise)
    post_tr = model.posterior(x, y, x)
    np.testing.assert_allclose(np.asarray(post_tr.mean), np.asarray(y), atol=0.35)


def test_gibbs_exact_gp_training_improves(rng):
    x, y, prior = _gibbs_setup(rng)
    model = GibbsExactGP.create(x, prior, noise=0.011, outputscale=0.644, dtype=jnp.float64)
    res = fit(
        model,
        lambda m, xx, yy: m.loss(xx, yy),
        x,
        y,
        lr=0.01,
        num_steps=50,
        mask=model.trainable(),
    )
    assert float(res.losses[-1]) < float(res.losses[0])
    # frozen leaves unchanged
    np.testing.assert_allclose(
        np.asarray(res.model.raw_outputscale), np.asarray(model.raw_outputscale)
    )


def test_gibbs_sparse_gp_all_inducing_close_to_exact(rng):
    """With Z = X the Gibbs SGPR bound should approach the exact Gibbs MLL
    (equality up to the conditional-mean lengthscale reconstruction)."""
    x, y, prior = _gibbs_setup(rng, n=16)
    exact = GibbsExactGP.create(x, prior, noise=0.05, outputscale=0.7, dtype=jnp.float64)
    sparse = GibbsSparseGP.create(x, prior, noise=0.05, outputscale=0.7, dtype=jnp.float64)
    le = float(exact.loss(x, y))
    ls = float(sparse.loss(x, y))
    np.testing.assert_allclose(ls, le, rtol=0.05)


def test_gibbs_sparse_gp_predict_and_train(rng):
    x, y, prior = _gibbs_setup(rng, n=24)
    z = np.asarray(x)[::3]
    model = GibbsSparseGP.create(z, prior, noise=0.05, outputscale=0.7, dtype=jnp.float64)
    xs = jnp.asarray(rng.normal(size=(5, 2)))
    post = model.posterior(x, y, xs)
    assert post.mean.shape == (5,)
    assert np.all(np.asarray(post.var) > 0)
    res = fit(
        model,
        lambda m, xx, yy: m.loss(xx, yy),
        x,
        y,
        lr=0.01,
        num_steps=40,
        mask=model.trainable(),
    )
    assert float(res.losses[-1]) < float(res.losses[0])


# -- metrics ------------------------------------------------------------------


def test_distribution_helpers(rng):
    from nonstationary_precip_tpu.models.distributions import DiagNormal, MVN

    mean = jnp.asarray(rng.normal(size=5))
    var = jnp.asarray(np.abs(rng.normal(size=5)) + 0.5)
    y = jnp.asarray(rng.normal(size=5))
    d = DiagNormal(mean, var)
    ref = scipy.stats.norm(np.asarray(mean), np.sqrt(np.asarray(var))).logpdf(np.asarray(y))
    np.testing.assert_allclose(np.asarray(d.log_prob(y)), ref, rtol=1e-8)
    d2 = d.add_noise(0.3)
    np.testing.assert_allclose(np.asarray(d2.var), np.asarray(var) + 0.3)

    a = rng.normal(size=(5, 5))
    cov = jnp.asarray(a @ a.T + 5 * np.eye(5))
    m = MVN(mean, cov)
    np.testing.assert_allclose(np.asarray(m.var), np.diag(np.asarray(cov)))
    marg = m.marginals()
    np.testing.assert_allclose(np.asarray(marg.var), np.asarray(m.var))
    m2 = m.add_noise(0.2)
    np.testing.assert_allclose(np.asarray(m2.cov), np.asarray(cov) + 0.2 * np.eye(5))


def test_metrics_conventions(rng):
    y = jnp.asarray(rng.normal(size=10))
    pred = y + 0.1
    np.testing.assert_allclose(float(rmse_raw(pred, y)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(rmse_rescaled(pred, y, 2.0)), 0.2, rtol=1e-5)

    from nonstationary_precip_tpu.models.distributions import MVN

    cov = jnp.eye(10) * 0.5
    dist = MVN(pred, cov)
    ref = scipy.stats.multivariate_normal(np.asarray(pred), np.asarray(cov) + 1e-5*np.eye(10)).logpdf(
        np.asarray(y)
    )
    ours = float(nlpd_joint(dist, y, 1.0))
    np.testing.assert_allclose(ours, -ref / 10, rtol=2e-4)
