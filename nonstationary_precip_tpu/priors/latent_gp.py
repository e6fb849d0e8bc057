"""Fixed-hyperparameter latent GP prior.

Analogue of ``LatentGpPrior`` (/root/reference/models/latent_priors.py:66-98):
a zero-mean GP with frozen Scale(RBF-ARD) hyperparameters evaluated at a
fixed input set, used as the prior over a lengthscale/amplitude process of
product Gibbs kernels.  The covariance is precomputed once (the reference
detaches it; here it is simply a constant array) with jitter 1e-5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.kernels.stationary import _sq_dist as sq_dist
from nonstationary_precip_tpu.ops.linalg import mvn_logpdf_from_chol, safe_cholesky
from nonstationary_precip_tpu.utils.struct import pytree_dataclass

_JITTER = 1e-5


@pytree_dataclass
class LatentGpPrior:
    x: jnp.ndarray  # (N, D) fixed inputs
    cov: jnp.ndarray  # (N, N) frozen covariance (incl. jitter)

    @classmethod
    def create(cls, x: jnp.ndarray, sig_f: float, ls) -> "LatentGpPrior":
        ell = jnp.asarray(ls, dtype=x.dtype)
        a = x / ell
        cov = sig_f * jnp.exp(-0.5 * sq_dist(a, a)) + _JITTER * jnp.eye(x.shape[0], dtype=x.dtype)
        return cls(x=x, cov=cov)

    def log_prob(self, values: jnp.ndarray) -> jnp.ndarray:
        chol = safe_cholesky(self.cov)
        mean = jnp.zeros_like(values)
        return mvn_logpdf_from_chol(values, mean, chol)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        chol = safe_cholesky(self.cov)
        eps = jax.random.normal(key, (self.x.shape[0],), dtype=self.x.dtype)
        return chol @ eps
