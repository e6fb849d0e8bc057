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
