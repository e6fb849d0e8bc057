"""Matrix-normal prior on an N×D latent matrix, Kronecker-free.

Redesign of ``MatrixVariateNormalPrior``
(/root/reference/models/latent_priors.py:27-64).  The reference
materialises both kron(K_row + jitter·I, K_col) and its inverse (an
(ND)×(ND) pair — 620k×620k-entry matrices at N=394) and then evaluates the
MVN density on an inconsistently-ordered vectorisation (column-stacked vec
against a row-stacked Kronecker; documented defect, SURVEY.md §7).  Here we
use the Kronecker identities throughout:

  log p(H) = −½ [ tr(V⁻¹ Hᵀ U⁻¹ H) + N log|V| + D log|U| + ND log 2π ]
  sample   =  M + L_U Z L_Vᵀ,  Z ~ N(0, I_{N×D})
  E[H* | H] = K_*z U⁻¹ H           (column covariance cancels:
              kron(C, K_*z) kron(C, U)⁻¹ vec(H) = vec(K_*z U⁻¹ H))

with U = K_row + jitter·I (N×N), V = K_col (D×D).  Cost O(N²D) not O(N²D²).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.kernels.stationary import _sq_dist as sq_dist
from nonstationary_precip_tpu.ops.linalg import cho_solve, safe_cholesky, tri_solve, diag_part

_JITTER = 1e-5  # reference: latent_priors.py:14


@jax.tree_util.register_pytree_node_class
class MatrixNormalPrior:
    """MN(loc, U=row_cov + jitter·I, V=col_cov) over N×D matrices."""

    def __init__(self, loc, row_cov, col_cov, jitter: float = _JITTER):
        self.loc = loc
        self.row_cov = row_cov
        self.col_cov = col_cov
        self.jitter = jitter

    # pytree plumbing (jitter is static metadata)
    def tree_flatten(self):
        return (self.loc, self.row_cov, self.col_cov), self.jitter

    @classmethod
    def tree_unflatten(cls, jitter, children):
        return cls(*children, jitter=jitter)

    @property
    def n(self):
        return self.row_cov.shape[-1]

    @property
    def d(self):
        return self.col_cov.shape[-1]

    def _chol_u(self):
        u = self.row_cov + self.jitter * jnp.eye(self.n, dtype=self.row_cov.dtype)
        return safe_cholesky(u, self.jitter)

    def _chol_v(self):
        return safe_cholesky(self.col_cov, self.jitter)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        """One exact draw H = loc + L_U Z L_Vᵀ (replaces the reference's
        (ND)-dimensional MVN sample_n, latent_priors.py:59-61)."""
        z = jax.random.normal(key, (self.n, self.d), dtype=self.loc.dtype)
        return self.loc + self._chol_u() @ z @ self._chol_v().T

    def log_prob(self, h: jnp.ndarray) -> jnp.ndarray:
        """Coherent matrix-normal log-density (the reference's vec-ordering
        mismatch is deliberately NOT replicated — SURVEY.md §7 item 3)."""
        lu = self._chol_u()
        lv = self._chol_v()
        diff = h - self.loc
        # tr(V⁻¹ diffᵀ U⁻¹ diff) = ‖L_U⁻¹ diff L_V⁻ᵀ‖_F²
        a = tri_solve(lu, diff)  # U^{-1/2} diff : (N, D)
        b = tri_solve(lv, a.T)  # V^{-1/2} (·)ᵀ : (D, N)
        quad = jnp.sum(b * b)
        logdet_u = 2.0 * jnp.sum(jnp.log(diag_part(lu)))
        logdet_v = 2.0 * jnp.sum(jnp.log(diag_part(lv)))
        n, d = self.n, self.d
        return -0.5 * (quad + d * logdet_u + n * logdet_v + n * d * math.log(2 * math.pi))

    def conditional_mean(
        self, k_xz: jnp.ndarray, h: jnp.ndarray, loc_new: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """E[H(x*) | H] = M* + K_*z U⁻¹ (H − M) — the Kronecker-collapsed
        form of ``expectation_conditional_matrix_variate_dist``
        (multivariate_gibbs_kernel.py:65-75).

        ``loc_new`` is the prior mean M* at the query rows; it defaults to
        zeros, which is exact for the zero-loc priors every current model
        constructs.  ``self.loc`` (the anchor-row mean M) is subtracted
        from the conditioning H regardless, so a nonzero-mean prior is no
        longer silently mis-conditioned."""
        mu = k_xz @ cho_solve(self._chol_u(), h - self.loc)
        return mu if loc_new is None else loc_new + mu


def latent_rbf_row_cov(x: jnp.ndarray, lengthscale, outputscale: Optional[float] = None):
    """Frozen RBF row covariance for the H prior (the reference freezes an
    RBF with lengthscale [0.2, 0.2], multivariate_gibbs_kernel.py:46-53)."""
    ell = jnp.asarray(lengthscale, dtype=x.dtype)
    a = x / ell
    k = jnp.exp(-0.5 * sq_dist(a, a))
    if outputscale is not None:
        k = outputscale * k
    return k
