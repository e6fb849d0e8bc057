"""Generic exact GP regression: MLL training + closed-form prediction.

TPU-native replacement for the reference's ``ExactGPModel`` +
``gpytorch.mlls.ExactMarginalLogLikelihood`` stack
(/root/reference/models/dgps.py:113-122 and every stationary baseline).
The marginal likelihood is computed by direct blocked Cholesky (not CG —
at N ≤ 6k a single factorisation on the MXU beats iterative BBMM; see
SURVEY.md §2.5).  GPyTorch convention preserved: the objective is scaled
by 1/N and prior terms are added before scaling.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from nonstationary_precip_tpu.models.distributions import MVN
from nonstationary_precip_tpu.models.likelihoods import GaussianLikelihood
from nonstationary_precip_tpu.ops.linalg import (
    cho_solve,
    mvn_logpdf_from_chol,
    safe_cholesky,
    tri_solve,
)
from nonstationary_precip_tpu.utils.struct import pytree_dataclass


@pytree_dataclass(static=("mean_type",))
class ExactGP:
    """kernel + likelihood (+ constant mean).  mean_type: 'zero'|'constant'."""

    kernel: object
    likelihood: GaussianLikelihood
    mean_const: Optional[jnp.ndarray] = None
    mean_type: str = "constant"

    @classmethod
    def create(cls, kernel, noise: float = None, mean_type: str = "constant", dtype=jnp.float32):
        mc = jnp.zeros((), dtype=dtype) if mean_type == "constant" else None
        return cls(
            kernel=kernel,
            likelihood=GaussianLikelihood.create(noise, dtype=dtype),
            mean_const=mc,
            mean_type=mean_type,
        )

    def mean(self, x):
        n = x.shape[-2]
        if self.mean_type == "constant":
            return jnp.broadcast_to(self.mean_const, (n,))
        return jnp.zeros((n,), dtype=x.dtype)

    # -- training objective --------------------------------------------------

    def mll(
        self,
        x: jnp.ndarray,
        y: jnp.ndarray,
        *,
        solver: str = "chol",
        key=None,
        num_probes: int = 16,
        max_iters: int = 1000,
        precond_rank: int = 0,
    ) -> jnp.ndarray:
        """log N(y; m, K + σ²I) / N — GPyTorch's ExactMarginalLogLikelihood
        scaling (loss = −mll).

        ``solver='chol'`` (default) is the direct blocked-Cholesky path —
        fastest on TPU at this workload's N.  ``solver='cg'`` is the BBMM
        large-N parity path (``ops/bbmm.py``): mBCG solves + stochastic
        Lanczos-quadrature logdet, the regime the reference trains in under
        ``gpytorch.settings.max_cg_iterations`` (reference
        ``experiments/spatial_exp.py:199``); requires ``key``;
        ``precond_rank > 0`` enables the pivoted-Cholesky preconditioner."""
        if solver not in ("chol", "cg"):
            raise ValueError(
                f"solver must be 'chol' or 'cg', got {solver!r}"
            )
        n = y.shape[-1]
        k = self.kernel(x)
        k_noisy = k + self.likelihood.noise * jnp.eye(n, dtype=k.dtype)
        if solver == "cg":
            if key is None:
                raise ValueError("solver='cg' requires a PRNG key")
            from nonstationary_precip_tpu.ops.bbmm import cg_mll

            resid = y - self.mean(x)
            return (
                cg_mll(
                    k_noisy,
                    resid,
                    key,
                    self.likelihood.noise,
                    num_probes=num_probes,
                    max_iters=max_iters,
                    precond_rank=precond_rank,
                )
                / n
            )
        chol = safe_cholesky(k_noisy)
        return mvn_logpdf_from_chol(y, self.mean(x), chol) / n

    def loss(self, x, y, **solver_kwargs):
        return -self.mll(x, y, **solver_kwargs)

    # -- prediction ------------------------------------------------------------

    def posterior(self, x_train, y_train, x_test, *, noiseless: bool = True) -> MVN:
        """Exact GP posterior p(f* | y) (add_noise for the predictive)."""
        n = y_train.shape[-1]
        k_xx = self.kernel(x_train) + self.likelihood.noise * jnp.eye(
            n, dtype=x_train.dtype
        )
        k_sx = self.kernel(x_test, x_train)
        k_ss = self.kernel(x_test)
        chol = safe_cholesky(k_xx)
        resid = y_train - self.mean(x_train)
        alpha = cho_solve(chol, resid)
        mean = self.mean(x_test) + k_sx @ alpha
        v = tri_solve(chol, k_sx.T)  # (N, N*)
        cov = k_ss - v.T @ v
        if not noiseless:
            cov = cov + self.likelihood.noise * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        return MVN(mean, cov)

    def predictive(self, x_train, y_train, x_test) -> MVN:
        """likelihood(posterior): what the reference evaluates metrics on
        (e.g. /root/reference/experiments/seard_spatial_benchmark.py:94)."""
        return self.posterior(x_train, y_train, x_test, noiseless=False)
