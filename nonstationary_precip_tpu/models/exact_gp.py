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

import jax
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
        block: Optional[int] = None,
        matvec_builder=None,
    ) -> jnp.ndarray:
        """log N(y; m, K + σ²I) / N — GPyTorch's ExactMarginalLogLikelihood
        scaling (loss = −mll).

        ``solver='chol'`` (default) is the direct blocked-Cholesky path —
        fastest on TPU at this workload's N.  ``solver='cg'`` is the BBMM
        large-N parity path (``ops/bbmm.py``): mBCG solves + stochastic
        Lanczos-quadrature logdet, the regime the reference trains in under
        ``gpytorch.settings.max_cg_iterations`` (reference
        ``experiments/spatial_exp.py:199``); requires ``key``;
        ``precond_rank > 0`` enables the pivoted-Cholesky preconditioner.
        ``block`` (cg only) switches to the MATRIX-FREE path
        (``ops/lazy_cg.py``): the N×N Gram is never materialised, only
        (block, N) row panels — same estimator, O(block·N) memory, for N
        past the dense Gram's HBM wall.  ``matvec_builder`` (matrix-free
        only) swaps the panel matvec for a fused Gram·v kernel — pass
        ``ops.pallas_matvec.stationary_matvec_builder`` for RBF /
        Scale(RBF) on TPU; even the (block, N) panel then never touches
        HBM."""
        if solver not in ("chol", "cg"):
            raise ValueError(
                f"solver must be 'chol' or 'cg', got {solver!r}"
            )
        if block is not None and solver != "cg":
            raise ValueError("block= (matrix-free) requires solver='cg'")
        n = y.shape[-1]
        if solver == "cg":
            if key is None:
                raise ValueError("solver='cg' requires a PRNG key")
            resid = y - self.mean(x)
            if block is not None:
                from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_mll

                return (
                    lazy_cg_mll(
                        self.kernel,
                        x,
                        resid,
                        key,
                        self.likelihood.noise,
                        block=block,
                        num_probes=num_probes,
                        max_iters=max_iters,
                        precond_rank=precond_rank,
                        matvec_builder=matvec_builder,
                    )
                    / n
                )
            from nonstationary_precip_tpu.ops.bbmm import cg_mll

            k = self.kernel(x)
            k_noisy = k + self.likelihood.noise * jnp.eye(n, dtype=k.dtype)
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
        k = self.kernel(x)
        k_noisy = k + self.likelihood.noise * jnp.eye(n, dtype=k.dtype)
        chol = safe_cholesky(k_noisy)
        return mvn_logpdf_from_chol(y, self.mean(x), chol) / n

    def loss(self, x, y, **solver_kwargs):
        return -self.mll(x, y, **solver_kwargs)

    # -- prediction ------------------------------------------------------------

    def posterior(
        self,
        x_train,
        y_train,
        x_test,
        *,
        noiseless: bool = True,
        solver: str = "chol",
        max_iters: int = 1000,
        tol: float = 1e-6,
        precond_rank: int = 0,
        block: Optional[int] = None,
        matvec_builder=None,
    ) -> MVN:
        """Exact GP posterior p(f* | y) (add_noise for the predictive).

        ``solver='cg'`` routes the train-train solves through mBCG
        (``ops/bbmm.py``) instead of a Cholesky factorisation — the
        large-N regime GPyTorch predicts in under the same
        ``max_cg_iterations`` settings it trains with (reference
        ``experiments/spatial_exp.py:199``).  Prediction needs no logdet,
        so the CG path is deterministic (no probes/key): one batched solve
        K⁻¹[resid, K_x*] with all 1+N* right-hand sides riding the lane
        dimension of a single fixed-length scan.  ``precond_rank > 0``
        enables the pivoted-Cholesky/Woodbury preconditioner."""
        if solver not in ("chol", "cg"):
            raise ValueError(f"solver must be 'chol' or 'cg', got {solver!r}")
        if block is not None:
            # matrix-free route (ops/lazy_cg.py): the train Gram never
            # materialises — only (block, N) row panels inside the solve
            if solver != "cg":
                raise ValueError("block= (matrix-free) requires solver='cg'")
            from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_posterior

            mean_f, cov = lazy_cg_posterior(
                self.kernel,
                x_train,
                y_train - self.mean(x_train),
                x_test,
                self.likelihood.noise,
                block=block,
                max_iters=max_iters,
                tol=tol,
                precond_rank=precond_rank,
                matvec_builder=matvec_builder,
            )
            mean = self.mean(x_test) + mean_f
            if not noiseless:
                cov = cov + self.likelihood.noise * jnp.eye(
                    cov.shape[-1], dtype=cov.dtype
                )
            return MVN(mean, cov)
        n = y_train.shape[-1]
        k_xx = self.kernel(x_train) + self.likelihood.noise * jnp.eye(
            n, dtype=x_train.dtype
        )
        k_sx = self.kernel(x_test, x_train)
        k_ss = self.kernel(x_test)
        resid = y_train - self.mean(x_train)
        if solver == "cg":
            from nonstationary_precip_tpu.ops.bbmm import (
                mbcg,
                pivoted_cholesky,
                woodbury_precond,
            )

            minv = None
            if precond_rank > 0:
                s2 = jax.lax.stop_gradient(self.likelihood.noise)
                lpc, _ = pivoted_cholesky(
                    k_xx - s2 * jnp.eye(n, dtype=k_xx.dtype), precond_rank
                )
                minv = woodbury_precond(jax.lax.stop_gradient(lpc), s2)
            rhs = jnp.concatenate([resid[:, None], k_sx.T], axis=1)
            res = mbcg(k_xx.__matmul__, rhs, max_iters=max_iters, tol=tol, precond=minv)
            alpha = res.x[:, 0]
            solves = res.x[:, 1:]  # K⁻¹ K_x* , (N, N*)
            mean = self.mean(x_test) + k_sx @ alpha
            cov = k_ss - k_sx @ solves
            cov = 0.5 * (cov + cov.T)
            # CG breakdown (k_xx not SPD under the preconditioner) means the
            # frozen solves are wrong — poison rather than return plausibly.
            bad = jnp.any(res.broke)
            mean = jnp.where(bad, jnp.nan, mean)
            cov = jnp.where(bad, jnp.nan, cov)
        else:
            chol = safe_cholesky(k_xx)
            alpha = cho_solve(chol, resid)
            mean = self.mean(x_test) + k_sx @ alpha
            v = tri_solve(chol, k_sx.T)  # (N, N*)
            cov = k_ss - v.T @ v
        if not noiseless:
            cov = cov + self.likelihood.noise * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        return MVN(mean, cov)

    def predictive(self, x_train, y_train, x_test, **solver_kwargs) -> MVN:
        """likelihood(posterior): what the reference evaluates metrics on
        (e.g. /root/reference/experiments/seard_spatial_benchmark.py:94).
        ``solver_kwargs`` forward to :meth:`posterior` (e.g. solver='cg')."""
        return self.posterior(
            x_train, y_train, x_test, noiseless=False, **solver_kwargs
        )
