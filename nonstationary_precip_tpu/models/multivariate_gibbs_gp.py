"""Exact and sparse GP models with the multivariate (Paciorek–Schervish)
Gibbs kernel and a matrix-normal prior on the latent H matrix.

Counterparts of /root/reference/models/multivariate_gibbs_kernel.py and
sparse_multivariate_gibbs_kernel.py (the latter is unrunnable as committed —
broken ``kernels.latent_priors`` import, SURVEY.md §2.1 — so this module
implements the model those files describe).

Reference-semantics notes:
  * the reference detaches H inside the Gram
    (multivariate_gibbs_kernel.py:85,93), so H learns only through its
    matrix-normal prior term and decays toward the prior mean; that is an
    accidental no-learning mode.  ``detach_h=False`` (default) lets the
    marginal likelihood drive H; set True to reproduce the reference.
  * the H-prior's row covariance is a frozen RBF (lengthscale [0.2, 0.2]);
    the column covariance is 5·I (multivariate_gibbs_kernel.py:46-54).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.kernels.multivariate_gibbs import (
    paciorek_schervish_gram_2d,
    sigma_components_2d,
)
from nonstationary_precip_tpu.models.distributions import MVN
from nonstationary_precip_tpu.models.likelihoods import GaussianLikelihood
from nonstationary_precip_tpu.ops.linalg import (
    cho_solve,
    mvn_logpdf_from_chol,
    safe_cholesky,
    tri_solve,
)
from nonstationary_precip_tpu.priors.matrix_normal import (
    MatrixNormalPrior,
    latent_rbf_row_cov,
)
from nonstationary_precip_tpu.utils.struct import pytree_dataclass, trainable_mask


@pytree_dataclass(static=("detach_h",))
class MultivariateGibbsGP:
    """Exact GP, zero mean, multivariate Gibbs covariance over D=2 inputs."""

    likelihood: GaussianLikelihood
    h: jnp.ndarray  # (N, 2) latent matrix at training inputs
    d_mat: jnp.ndarray  # (2, 2) learnable offset
    h_prior: MatrixNormalPrior
    x_anchor: jnp.ndarray  # training inputs the prior/row-cov is anchored at
    detach_h: bool = False

    ROW_LS = (0.2, 0.2)  # frozen row-cov RBF lengthscale (reference :46)
    COL_COV = 5.0  # column covariance 5·I (reference :54)

    @classmethod
    def create(cls, key: jax.Array, x: jnp.ndarray, noise=None, detach_h=False, dtype=jnp.float32):
        x = jnp.asarray(x, dtype=dtype)
        n = x.shape[0]
        row_cov = latent_rbf_row_cov(x, jnp.asarray(cls.ROW_LS, dtype=dtype))
        col_cov = cls.COL_COV * jnp.eye(2, dtype=dtype)
        prior = MatrixNormalPrior(jnp.zeros((n, 2), dtype=dtype), row_cov, col_cov)
        k_h, k_d = jax.random.split(key)
        h0 = prior.sample(k_h)
        d0 = jnp.diag(jax.random.normal(k_d, (2,), dtype=dtype))
        return cls(
            likelihood=GaussianLikelihood.create(noise, dtype=dtype),
            h=h0,
            d_mat=d0,
            h_prior=prior,
            x_anchor=x,
            detach_h=detach_h,
        )

    def trainable(self, train_noise=True):
        def pred(path):
            if path.startswith("h_prior/") or path == "x_anchor":
                return False
            if "raw_noise" in path:
                return train_noise
            return True

        return trainable_mask(self, pred)

    def _h_at(self, x_new):
        """Matrix-normal conditional mean of H at new points:
        H* = K_*x U⁻¹ H (Kronecker-collapsed; multivariate_gibbs_kernel.py:65-75)."""
        ell = jnp.asarray(self.ROW_LS, dtype=x_new.dtype)
        a = x_new / ell
        b = self.x_anchor / ell
        a_sq = jnp.sum(a * a, axis=-1)[:, None]
        b_sq = jnp.sum(b * b, axis=-1)[None, :]
        k_xz = jnp.exp(-0.5 * jnp.maximum(a_sq + b_sq - 2.0 * a @ b.T, 0.0))
        return self.h_prior.conditional_mean(k_xz, self.h)

    def gram(self, x1, h1, x2=None, h2=None):
        if self.detach_h:
            h1 = jax.lax.stop_gradient(h1)
            h2 = None if h2 is None else jax.lax.stop_gradient(h2)
        sig1 = sigma_components_2d(h1, self.d_mat)
        if x2 is None:
            return paciorek_schervish_gram_2d(x1, sig1, x1, sig1)
        sig2 = sigma_components_2d(h2, self.d_mat)
        return paciorek_schervish_gram_2d(x1, sig1, x2, sig2)

    def loss(self, x, y):
        """−(log N(y; 0, K + σ²I) + log MN(H)) / N (GPyTorch prior harvesting)."""
        n = y.shape[-1]
        k = self.gram(x, self.h)
        k_noisy = k + self.likelihood.noise * jnp.eye(n, dtype=k.dtype)
        chol = safe_cholesky(k_noisy)
        logp = mvn_logpdf_from_chol(y, jnp.zeros_like(y), chol)
        prior_term = self.h_prior.log_prob(self.h)
        return -(logp + prior_term) / n

    def posterior(self, x_train, y_train, x_new, *, noiseless: bool = True) -> MVN:
        n = y_train.shape[-1]
        h_new = self._h_at(x_new)
        k_xx = self.gram(x_train, self.h)
        k_sx = self.gram(x_new, h_new, x_train, self.h)
        k_ss = self.gram(x_new, h_new)
        a = k_xx + self.likelihood.noise * jnp.eye(n, dtype=k_xx.dtype)
        chol = safe_cholesky(a)
        mean = k_sx @ cho_solve(chol, y_train)
        v = tri_solve(chol, k_sx.T)
        cov = k_ss - v.T @ v + 1e-4 * jnp.eye(k_ss.shape[-1], dtype=k_ss.dtype)
        if not noiseless:
            cov = cov + self.likelihood.noise * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        return MVN(mean, cov)

    def predictive(self, x_train, y_train, x_new) -> MVN:
        return self.posterior(x_train, y_train, x_new, noiseless=False)


@pytree_dataclass(static=("detach_h",))
class SparseMultivariateGibbsGP:
    """Sparse variant: H lives at M inducing locations Z; H at data points
    is the matrix-normal conditional mean given H(Z)
    (sparse_multivariate_gibbs_kernel.py:20-154, repaired)."""

    likelihood: GaussianLikelihood
    z: jnp.ndarray  # (M, 2)
    h_z: jnp.ndarray  # (M, 2)
    d_mat: jnp.ndarray
    h_prior: MatrixNormalPrior
    detach_h: bool = False

    ROW_LS = (1.3, 1.1)  # reference :44 (Scale(RBF) with these lengthscales)
    COL_COV = 1.0  # reference :56 — identity column covariance

    @classmethod
    def create(cls, key: jax.Array, z: jnp.ndarray, noise=None, detach_h=False, dtype=jnp.float32):
        z = jnp.asarray(z, dtype=dtype)
        m = z.shape[0]
        row_cov = latent_rbf_row_cov(z, jnp.asarray(cls.ROW_LS, dtype=dtype))
        col_cov = cls.COL_COV * jnp.eye(2, dtype=dtype)
        prior = MatrixNormalPrior(jnp.zeros((m, 2), dtype=dtype), row_cov, col_cov)
        k_h, k_d = jax.random.split(key)
        return cls(
            likelihood=GaussianLikelihood.create(noise, dtype=dtype),
            z=z,
            h_z=prior.sample(k_h),
            d_mat=jnp.diag(jax.random.normal(k_d, (2,), dtype=dtype)),
            h_prior=prior,
            detach_h=detach_h,
        )

    def trainable(self, train_noise=True, train_z=True):
        def pred(path):
            if path.startswith("h_prior/"):
                return False
            if path == "z":
                return train_z
            if "raw_noise" in path:
                return train_noise
            return True

        return trainable_mask(self, pred)

    def _h_at(self, x):
        ell = jnp.asarray(self.ROW_LS, dtype=x.dtype)
        a = x / ell
        b = self.z / ell
        a_sq = jnp.sum(a * a, axis=-1)[:, None]
        b_sq = jnp.sum(b * b, axis=-1)[None, :]
        k_xz = jnp.exp(-0.5 * jnp.maximum(a_sq + b_sq - 2.0 * a @ b.T, 0.0))
        return self.h_prior.conditional_mean(k_xz, self.h_z)

    def gram(self, x1, h1, x2=None, h2=None):
        if self.detach_h:
            h1 = jax.lax.stop_gradient(h1)
            h2 = None if h2 is None else jax.lax.stop_gradient(h2)
        sig1 = sigma_components_2d(h1, self.d_mat)
        if x2 is None:
            return paciorek_schervish_gram_2d(x1, sig1, x1, sig1)
        sig2 = sigma_components_2d(h2, self.d_mat)
        return paciorek_schervish_gram_2d(x1, sig1, x2, sig2)

    def loss(self, x, y):
        n = y.shape[-1]
        h_x = self._h_at(x)
        k = self.gram(x, h_x)
        k_noisy = k + self.likelihood.noise * jnp.eye(n, dtype=k.dtype)
        chol = safe_cholesky(k_noisy)
        logp = mvn_logpdf_from_chol(y, jnp.zeros_like(y), chol)
        prior_term = self.h_prior.log_prob(self.h_z)
        return -(logp + prior_term) / n

    def posterior(self, x_train, y_train, x_new, *, noiseless: bool = True) -> MVN:
        n = y_train.shape[-1]
        h_x = self._h_at(x_train)
        h_s = self._h_at(x_new)
        k_xx = self.gram(x_train, h_x)
        k_sx = self.gram(x_new, h_s, x_train, h_x)
        k_ss = self.gram(x_new, h_s)
        a = k_xx + self.likelihood.noise * jnp.eye(n, dtype=k_xx.dtype)
        chol = safe_cholesky(a)
        mean = k_sx @ cho_solve(chol, y_train)
        v = tri_solve(chol, k_sx.T)
        cov = k_ss - v.T @ v + 1e-4 * jnp.eye(k_ss.shape[-1], dtype=k_ss.dtype)
        if not noiseless:
            cov = cov + self.likelihood.noise * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        return MVN(mean, cov)

    def predictive(self, x_train, y_train, x_new) -> MVN:
        return self.posterior(x_train, y_train, x_new, noiseless=False)
