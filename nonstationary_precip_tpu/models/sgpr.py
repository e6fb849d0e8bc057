"""Generic SGPR: Titsias (2009) collapsed-bound sparse GP regression.

Kernel-agnostic counterpart of the reference's ``SparseGPR``
(/root/reference/archive/SGP/sgpr.py:21-92) and of GPyTorch's
``InducingPointKernel`` wrapping used by the stationary spatio-temporal
models (/root/reference/models/spatio_temporal_models.py:26).  Everything
is Woodbury on the (N, M) Nyström root — no N×N materialisation — with the
added trace term harvested into the objective exactly as GPyTorch's
``InducingPointKernelAddedLossTerm`` does.
"""

from __future__ import annotations

import jax.numpy as jnp

from nonstationary_precip_tpu.kernels.inducing import nystrom_root
from nonstationary_precip_tpu.models.distributions import MVN
from nonstationary_precip_tpu.models.likelihoods import GaussianLikelihood
from nonstationary_precip_tpu.ops.linalg import cho_solve, safe_cholesky, tri_solve, diag_part
from nonstationary_precip_tpu.utils.struct import pytree_dataclass, trainable_mask


def collapsed_bound_terms(root: jnp.ndarray, y: jnp.ndarray, noise):
    """(log N(y; 0, RRᵀ + σ²I), B-cholesky, A) via Woodbury."""
    n = y.shape[-1]
    a = root.T / jnp.sqrt(noise)  # (M, N)
    b = jnp.eye(a.shape[0], dtype=a.dtype) + a @ a.T
    lb = safe_cholesky(b)
    ay = a @ y / jnp.sqrt(noise)
    w = tri_solve(lb, ay)
    quad = (y @ y) / noise - w @ w
    logdet = n * jnp.log(noise) + 2.0 * jnp.sum(jnp.log(diag_part(lb)))
    logp = -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi).astype(y.dtype))
    return logp, lb, a


def sgpr_predict(root_x, root_s, k_ss_diag, y, noise, *, noiseless=True) -> MVN:
    """SGPR predictive from train/test Nyström roots; exact marginals."""
    a = root_x.T / jnp.sqrt(noise)
    b = jnp.eye(a.shape[0], dtype=a.dtype) + a @ a.T
    lb = safe_cholesky(b)
    ay = a @ y / jnp.sqrt(noise)
    mean = root_s @ cho_solve(lb, ay)
    v = tri_solve(lb, root_s.T)
    cov = v.T @ v
    corr = jnp.clip(k_ss_diag - jnp.sum(root_s * root_s, axis=-1), 0.0, None)
    cov = cov + jnp.diag(corr)
    if not noiseless:
        cov = cov + noise * jnp.eye(cov.shape[-1], dtype=cov.dtype)
    return MVN(mean, cov)


@pytree_dataclass
class SGPR:
    """Sparse GP regression with a stationary (or any parametric) kernel."""

    kernel: object
    likelihood: GaussianLikelihood
    z: jnp.ndarray  # (M, D)

    @classmethod
    def create(cls, kernel, z, noise=None, dtype=jnp.float32):
        return cls(
            kernel=kernel,
            likelihood=GaussianLikelihood.create(noise, dtype=dtype),
            z=jnp.asarray(z, dtype=dtype),
        )

    def trainable(self, train_z: bool = True):
        return trainable_mask(
            self, lambda p: True if not p.endswith("z") else train_z
        )

    def _root(self, x):
        k_xz = self.kernel(x, self.z)
        k_zz = self.kernel(self.z)
        root, _ = nystrom_root(k_xz, k_zz)
        return root

    def loss(self, x, y):
        """−(collapsed bound)/N: log N(y; 0, Q + σ²I) − ½Σ(diag K − diag Q)/σ²."""
        n = y.shape[-1]
        noise = self.likelihood.noise
        root = self._root(x)
        logp, _, _ = collapsed_bound_terms(root, y, noise)
        k_diag = self.kernel.diag(x)
        q_diag = jnp.sum(root * root, axis=-1)
        added = -0.5 * jnp.sum(k_diag - q_diag) / noise
        return -(logp + added) / n

    def posterior(self, x_train, y_train, x_new, *, noiseless: bool = True) -> MVN:
        root_x = self._root(x_train)
        root_s = self._root(x_new)
        return sgpr_predict(
            root_x,
            root_s,
            self.kernel.diag(x_new),
            y_train,
            self.likelihood.noise,
            noiseless=noiseless,
        )

    def predictive(self, x_train, y_train, x_new) -> MVN:
        return self.posterior(x_train, y_train, x_new, noiseless=False)
