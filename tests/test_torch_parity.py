"""Cross-framework parity: our exact-GP pipeline vs an independent torch
float64 oracle (GPyTorch itself is not installed in this image, so the
oracle reimplements the same math in torch — an independent AD framework
checking values AND gradients)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.kernels import RBF, Scale
from nonstationary_precip_tpu.models import ExactGP


def _torch_softplus(x):
    return torch.nn.functional.softplus(x)


def _torch_exact_gp_loss(raw_ell, raw_scale, raw_noise, mean_c, x, y):
    ell = _torch_softplus(raw_ell)
    s2 = _torch_softplus(raw_scale)
    noise = _torch_softplus(raw_noise) + 1e-4
    xs = x / ell
    d2 = torch.cdist(xs, xs) ** 2
    k = s2 * torch.exp(-0.5 * d2) + noise * torch.eye(len(x), dtype=x.dtype)
    dist = torch.distributions.MultivariateNormal(
        mean_c * torch.ones(len(x), dtype=x.dtype), covariance_matrix=k
    )
    return -dist.log_prob(y) / len(x)


def test_exact_gp_loss_and_grads_match_torch(rng):
    n, d = 30, 2
    x = rng.normal(size=(n, d))
    y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=n)
    raw_ell = rng.normal(size=d) * 0.3
    raw_scale, raw_noise, mean_c = 0.2, -1.1, 0.15

    # ours (f64)
    kernel = Scale(
        base=RBF(raw_lengthscale=jnp.asarray(raw_ell)),
        raw_outputscale=jnp.asarray(raw_scale),
    )
    from nonstationary_precip_tpu.models.likelihoods import GaussianLikelihood

    model = ExactGP(
        kernel=kernel,
        likelihood=GaussianLikelihood(raw_noise=jnp.asarray(raw_noise)),
        mean_const=jnp.asarray(mean_c),
        mean_type="constant",
    )
    ours = float(model.loss(jnp.asarray(x), jnp.asarray(y)))
    grads = jax.grad(lambda m: m.loss(jnp.asarray(x), jnp.asarray(y)))(model)

    # torch oracle (f64)
    t_ell = torch.tensor(raw_ell, dtype=torch.float64, requires_grad=True)
    t_scale = torch.tensor(raw_scale, dtype=torch.float64, requires_grad=True)
    t_noise = torch.tensor(raw_noise, dtype=torch.float64, requires_grad=True)
    t_mean = torch.tensor(mean_c, dtype=torch.float64, requires_grad=True)
    loss_t = _torch_exact_gp_loss(
        t_ell,
        t_scale,
        t_noise,
        t_mean,
        torch.tensor(x, dtype=torch.float64),
        torch.tensor(y, dtype=torch.float64),
    )
    loss_t.backward()

    np.testing.assert_allclose(ours, float(loss_t), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(grads.kernel.base.raw_lengthscale), t_ell.grad.numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(grads.kernel.raw_outputscale), float(t_scale.grad), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(grads.likelihood.raw_noise), float(t_noise.grad), rtol=1e-6
    )
    np.testing.assert_allclose(float(grads.mean_const), float(t_mean.grad), rtol=1e-6)


def test_gibbs_map_objective_matches_torch(rng):
    """Full MAP objective of the Gibbs exact GP — MLL + per-N-normalised
    log-normal process prior — value and d/d(log_ell) against torch f64."""
    from nonstationary_precip_tpu.models import GibbsExactGP
    from nonstationary_precip_tpu.priors import LogNormalProcess

    n, d = 16, 2
    x = rng.normal(size=(n, d))
    y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=n)
    log_ell0 = rng.normal(size=(n, d)) * 0.2 + np.log(0.3)
    noise, s2 = 0.011, 0.644
    pm, ps2, pell = np.log(0.3), 1.0, 1.3

    prior = LogNormalProcess.create(d, mean=pm, outputscale=ps2, lengthscale=pell, dtype=jnp.float64)
    model = GibbsExactGP.create(jnp.asarray(x), prior, noise=noise, outputscale=s2, dtype=jnp.float64)
    model = model.replace(log_ell=jnp.asarray(log_ell0))
    ours = float(model.loss(jnp.asarray(x), jnp.asarray(y)))
    g_ours = np.asarray(jax.grad(lambda m: m.loss(jnp.asarray(x), jnp.asarray(y)))(model).log_ell)

    # torch oracle
    tx = torch.tensor(x, dtype=torch.float64)
    ty = torch.tensor(y, dtype=torch.float64)
    t_log_ell = torch.tensor(log_ell0, dtype=torch.float64, requires_grad=True)

    ell = torch.exp(t_log_ell)
    ss = ell[:, None, :] ** 2 + ell[None, :, :] ** 2
    pref = torch.prod(torch.sqrt(2 * ell[:, None, :] * ell[None, :, :] / ss), dim=-1)
    quad = torch.sum((tx[:, None, :] - tx[None, :, :]) ** 2 / ss, dim=-1)
    k = s2 * pref * torch.exp(-quad) + noise * torch.eye(n, dtype=torch.float64)
    logp = torch.distributions.MultivariateNormal(
        torch.zeros(n, dtype=torch.float64), covariance_matrix=k
    ).log_prob(ty)

    # prior: per-dim MVN on log-ell with RBF(1.3) scale-1 gram + 1e-4 I, /N
    dist2 = torch.cdist(tx / pell, tx / pell) ** 2
    kp = ps2 * torch.exp(-0.5 * dist2) + 1e-4 * torch.eye(n, dtype=torch.float64)
    prior_lp = 0.0
    for dd in range(d):
        prior_lp = prior_lp + torch.distributions.MultivariateNormal(
            pm * torch.ones(n, dtype=torch.float64), covariance_matrix=kp
        ).log_prob(t_log_ell[:, dd])
    loss_t = -(logp + prior_lp / n) / n
    loss_t.backward()

    np.testing.assert_allclose(ours, float(loss_t), rtol=1e-8)
    np.testing.assert_allclose(g_ours, t_log_ell.grad.numpy(), rtol=1e-5, atol=1e-9)


def test_gibbs_predict_path_matches_torch(rng):
    """Full DiagonalExactGP.predict algebra (nonstationary_models.py:45-62)
    against torch f64: conditional-mean lengthscales at test points, manual
    GP conditioning, +1e-4·I stabiliser."""
    from nonstationary_precip_tpu.models import GibbsExactGP
    from nonstationary_precip_tpu.priors import LogNormalProcess

    n, m, d = 14, 6, 2
    x = rng.normal(size=(n, d))
    xs = rng.normal(size=(m, d))
    y = np.sin(x[:, 0])
    log_ell = rng.normal(size=(n, d)) * 0.2 + np.log(0.3)
    noise, s2 = 0.011, 0.644
    pm, ps2, pell = np.log(0.3), 1.0, 1.3

    prior = LogNormalProcess.create(d, mean=pm, outputscale=ps2, lengthscale=pell, dtype=jnp.float64)
    model = GibbsExactGP.create(jnp.asarray(x), prior, noise=noise, outputscale=s2, dtype=jnp.float64)
    model = model.replace(log_ell=jnp.asarray(log_ell))
    post = model.posterior(jnp.asarray(x), jnp.asarray(y), jnp.asarray(xs))

    # torch oracle
    tx, txs = torch.tensor(x), torch.tensor(xs)
    ell1 = torch.exp(torch.tensor(log_ell))

    def prior_gram(a, b):
        return ps2 * torch.exp(-0.5 * (torch.cdist(a / pell, b / pell) ** 2))

    # conditional-mean lengthscales at xs
    kg = prior_gram(tx, tx) + 1e-4 * torch.eye(n, dtype=torch.float64)
    ksg = prior_gram(txs, tx)
    ell2 = torch.exp(
        pm + ksg @ torch.linalg.solve(kg, torch.log(ell1) - pm)
    )

    def gibbs(a, ea, b, eb):
        ss = ea[:, None, :] ** 2 + eb[None, :, :] ** 2
        pref = torch.prod(torch.sqrt(2 * ea[:, None, :] * eb[None, :, :] / ss), dim=-1)
        quad = torch.sum((a[:, None, :] - b[None, :, :]) ** 2 / ss, dim=-1)
        return s2 * pref * torch.exp(-quad)

    k_xx = gibbs(tx, ell1, tx, ell1) + noise * torch.eye(n, dtype=torch.float64)
    k_sx = gibbs(txs, ell2, tx, ell1)
    k_ss = gibbs(txs, ell2, txs, ell2)
    mu = k_sx @ torch.linalg.solve(k_xx, torch.tensor(y))
    sigma = k_ss - k_sx @ torch.linalg.solve(k_xx, k_sx.T) + 1e-4 * torch.eye(m, dtype=torch.float64)

    np.testing.assert_allclose(np.asarray(post.mean), mu.numpy(), rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(post.cov), sigma.numpy(), rtol=1e-5, atol=1e-10)


def test_gibbs_gram_matches_torch(rng):
    """Gibbs kernel values against a torch implementation of R&W 4.32."""
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram

    n1, n2, d = 14, 9, 2
    x1 = rng.normal(size=(n1, d))
    x2 = rng.normal(size=(n2, d))
    e1 = np.exp(rng.normal(size=(n1, d)) * 0.3)
    e2 = np.exp(rng.normal(size=(n2, d)) * 0.3)

    tx1, tx2 = torch.tensor(x1), torch.tensor(x2)
    te1, te2 = torch.tensor(e1), torch.tensor(e2)
    ss = te1[:, None, :] ** 2 + te2[None, :, :] ** 2
    pref = torch.prod(torch.sqrt(2 * te1[:, None, :] * te2[None, :, :] / ss), dim=-1)
    quad = torch.sum((tx1[:, None, :] - tx2[None, :, :]) ** 2 / ss, dim=-1)
    ref = (pref * torch.exp(-quad)).numpy()

    ours = np.asarray(gibbs_gram(jnp.asarray(x1), jnp.asarray(e1), jnp.asarray(x2), jnp.asarray(e2)))
    np.testing.assert_allclose(ours, ref, rtol=1e-10)
