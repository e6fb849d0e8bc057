"""Lightweight predictive distributions (pytree NamedTuples).

The reference passes ``gpytorch.distributions.MultivariateNormal`` objects
around; here predictions are plain pytrees so they cross jit boundaries and
feed metrics directly.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from nonstationary_precip_tpu.ops.linalg import mvn_logpdf_from_chol, safe_cholesky


class DiagNormal(NamedTuple):
    """Independent Gaussians: predictive marginals."""

    mean: jnp.ndarray
    var: jnp.ndarray

    def log_prob(self, y):
        """Per-point log densities."""
        return -0.5 * ((y - self.mean) ** 2 / self.var + jnp.log(2 * math.pi * self.var))

    def add_noise(self, noise):
        return DiagNormal(self.mean, self.var + noise)

    def sample(self, key, num_samples: int = 1):
        import jax

        eps = jax.random.normal(key, (num_samples,) + self.mean.shape, self.mean.dtype)
        return self.mean + jnp.sqrt(self.var) * eps


class MVN(NamedTuple):
    """Full-covariance joint predictive."""

    mean: jnp.ndarray
    cov: jnp.ndarray

    def log_prob(self, y):
        """Joint log density (used by the reference's ``nlpd`` metric,
        /root/reference/utils/metrics.py:40-45)."""
        chol = safe_cholesky(self.cov)
        return mvn_logpdf_from_chol(y, self.mean, chol)

    @property
    def var(self):
        return jnp.diagonal(self.cov, axis1=-2, axis2=-1)

    def add_noise(self, noise):
        eye = jnp.eye(self.cov.shape[-1], dtype=self.cov.dtype)
        return MVN(self.mean, self.cov + noise * eye)

    def marginals(self) -> DiagNormal:
        return DiagNormal(self.mean, self.var)

    def sample(self, key, num_samples: int = 1):
        """Joint posterior function draws (the reference's visual-check
        demos sample fields this way, multivariate_gibbs_kernel.py:166)."""
        import jax

        chol = safe_cholesky(self.cov)
        eps = jax.random.normal(key, (num_samples,) + self.mean.shape, self.mean.dtype)
        return self.mean + eps @ chol.T
