"""Latent priors vs scipy/numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.stats

from nonstationary_precip_tpu.priors import LogNormalProcess, MatrixNormalPrior, LatentGpPrior
from nonstationary_precip_tpu.priors.matrix_normal import latent_rbf_row_cov


def _rbf_np(x1, x2, ell, s2):
    d2 = ((x1[:, None, :] - x2[None, :, :]) / ell) ** 2
    return s2 * np.exp(-0.5 * d2.sum(-1))


def test_lognormal_log_prob_matches_scipy(rng):
    x = rng.normal(size=(15, 2))
    proc = LogNormalProcess.create(2, mean=np.log(0.3), outputscale=1.0, lengthscale=1.3, dtype=jnp.float64)
    log_ell = rng.normal(size=(15, 2)) * 0.2 + np.log(0.3)

    ours = float(proc.log_prob(jnp.asarray(x), jnp.asarray(log_ell)))

    # oracle: per-dim MVN with K + 1e-4 I, summed, / N
    total = 0.0
    for d in range(2):
        k = _rbf_np(x, x, np.full(2, 1.3), 1.0) + 1e-4 * np.eye(15)
        total += scipy.stats.multivariate_normal(np.full(15, np.log(0.3)), k).logpdf(
            log_ell[:, d]
        )
    np.testing.assert_allclose(ours, total / 15, rtol=1e-8)


def test_lognormal_conditional_mean_interpolates(rng):
    """At the conditioning points themselves the conditional mean must
    reproduce the given field (up to the 1e-4 jitter)."""
    x = rng.normal(size=(12, 2))
    proc = LogNormalProcess.create(2, mean=0.0, outputscale=1.0, lengthscale=1.0, dtype=jnp.float64)
    ell_g = np.exp(rng.normal(size=(12, 2)) * 0.3)
    out = np.asarray(proc.conditional_mean(jnp.asarray(x), (jnp.asarray(x), jnp.asarray(ell_g))))
    np.testing.assert_allclose(out, ell_g, rtol=2e-2)


def test_lognormal_conditional_mean_oracle(rng):
    """Off-sample conditional mean against a direct numpy GP-regression."""
    xg = rng.normal(size=(10, 2))
    xs = rng.normal(size=(6, 2))
    mean_c, s2, ell = 0.4, 1.2, 0.9
    proc = LogNormalProcess.create(2, mean=mean_c, outputscale=s2, lengthscale=ell, dtype=jnp.float64)
    ell_g = np.exp(rng.normal(size=(10, 2)) * 0.3)

    ours = np.asarray(proc.conditional_mean(jnp.asarray(xs), (jnp.asarray(xg), jnp.asarray(ell_g))))

    k_gg = _rbf_np(xg, xg, np.full(2, ell), s2) + 1e-4 * np.eye(10)
    k_sg = _rbf_np(xs, xg, np.full(2, ell), s2)
    for d in range(2):
        mu = mean_c + k_sg @ np.linalg.solve(k_gg, np.log(ell_g[:, d]) - mean_c)
        np.testing.assert_allclose(ours[:, d], np.exp(mu), rtol=1e-7)


def test_lognormal_sample_positive_and_shaped(key, rng):
    x = jnp.asarray(rng.normal(size=(9, 2)))
    proc = LogNormalProcess.create(2, dtype=jnp.float64)
    s = np.asarray(proc.sample(key, x))
    assert s.shape == (9, 2)
    assert (s > 0).all()


def test_matrix_normal_log_prob_matches_kron_mvn(rng):
    """Coherent matrix-normal density == MVN with kron(V, U) on vec_c(H)."""
    n, d = 7, 2
    x = rng.normal(size=(n, 2))
    u = _rbf_np(x, x, np.array([0.2, 0.2]), 1.0)
    v = 5.0 * np.eye(d)
    prior = MatrixNormalPrior(
        jnp.zeros((n, d)), jnp.asarray(u), jnp.asarray(v)
    )
    h = rng.normal(size=(n, d))
    ours = float(prior.log_prob(jnp.asarray(h)))

    u_j = u + 1e-5 * np.eye(n)
    cov = np.kron(v, u_j)  # vec_c convention: cov of [H[:,0]; H[:,1]]
    vec = h.T.reshape(-1)  # column stacking
    ref = scipy.stats.multivariate_normal(np.zeros(n * d), cov).logpdf(vec)
    np.testing.assert_allclose(ours, ref, rtol=1e-8)


def test_matrix_normal_conditional_mean(rng):
    n, m = 8, 5
    z = rng.normal(size=(m, 2))
    xs = rng.normal(size=(n, 2))
    u = _rbf_np(z, z, np.array([0.5, 0.5]), 1.0)
    k_xz = _rbf_np(xs, z, np.array([0.5, 0.5]), 1.0)
    prior = MatrixNormalPrior(jnp.zeros((m, 2)), jnp.asarray(u), jnp.eye(2))
    h = rng.normal(size=(m, 2))
    ours = np.asarray(prior.conditional_mean(jnp.asarray(k_xz), jnp.asarray(h)))
    ref = k_xz @ np.linalg.solve(u + 1e-5 * np.eye(m), h)
    np.testing.assert_allclose(ours, ref, rtol=1e-7)


def test_matrix_normal_sample_moments(key):
    """L_U Z L_Vᵀ sampling has the right row/col covariance structure."""
    n, d = 4, 2
    u = np.array([[2.0, 0.5, 0, 0], [0.5, 1.0, 0, 0], [0, 0, 1.5, 0.3], [0, 0, 0.3, 1.0]])
    v = np.array([[1.0, 0.2], [0.2, 0.5]])
    prior = MatrixNormalPrior(jnp.zeros((n, d)), jnp.asarray(u), jnp.asarray(v), jitter=0.0)
    keys = jax.random.split(key, 4000)
    samples = np.stack([np.asarray(prior.sample(k)) for k in keys[:400]])
    # E[H V^{-1} Hᵀ] = tr(V^{-1} V) U = d·U  (matrix-normal second moment)
    est = np.einsum("sij,jk,slk->il", samples, np.linalg.inv(v), samples) / 400
    np.testing.assert_allclose(est, d * u, rtol=0.35, atol=0.3)


def test_latent_gp_prior(rng, key):
    x = jnp.asarray(rng.normal(size=(10, 1)))
    prior = LatentGpPrior.create(x, sig_f=2.0, ls=1.0)
    vals = prior.sample(key)
    assert vals.shape == (10,)
    lp = float(prior.log_prob(vals))
    assert np.isfinite(lp)

    cov = _rbf_np(np.asarray(x), np.asarray(x), np.array([1.0]), 2.0) + 1e-5 * np.eye(10)
    ref = scipy.stats.multivariate_normal(np.zeros(10), cov).logpdf(np.asarray(vals))
    np.testing.assert_allclose(lp, ref, rtol=1e-6)


def test_latent_rbf_row_cov(rng):
    x = rng.normal(size=(6, 2))
    ours = np.asarray(latent_rbf_row_cov(jnp.asarray(x), [0.2, 0.2]))
    np.testing.assert_allclose(ours, _rbf_np(x, x, np.array([0.2, 0.2]), 1.0), rtol=1e-7)


def test_log_prob_gram_pre_matches_chol_path():
    """gram_pre (hoisted inverse + logdet) must reproduce the Cholesky-path
    prior log-density — it is the solve-free fast path for frozen priors."""
    import numpy as np
    from nonstationary_precip_tpu.priors import LogNormalProcess

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(40, 2)), jnp.float32)
    prior = LogNormalProcess.create(input_dim=2, mean=0.3, outputscale=0.5, lengthscale=1.2)
    log_ell = jnp.asarray(rng.normal(size=(40, 2)) * 0.2 + 0.3, jnp.float32)

    lp_chol = prior.log_prob(x, log_ell, prior.gram_chol(x))
    lp_pre = prior.log_prob(x, log_ell, prior.gram_pre(x))
    lp_none = prior.log_prob(x, log_ell)
    assert abs(float(lp_chol - lp_none)) < 1e-6
    assert abs(float(lp_pre - lp_chol)) < 1e-4

    # gradients w.r.t. the field agree between the two hoisted forms
    g_chol = jax.grad(lambda f: prior.log_prob(x, f, prior.gram_chol(x)))(log_ell)
    g_pre = jax.grad(lambda f: prior.log_prob(x, f, prior.gram_pre(x)))(log_ell)
    assert float(jnp.max(jnp.abs(g_chol - g_pre))) < 1e-4
