"""Inducing-point (Nyström / SGPR) covariance building blocks.

The reference wraps GPyTorch's ``InducingPointKernel`` machinery
(/root/reference/models/gibbs_kernels.py:171-266): cached Kzz inverse
root, Nyström low-rank covariance, SGPR diagonal correction, and the
Titsias added loss term.  Here those become three pure functions over a
root matrix R with Q = R Rᵀ — models own caching by construction (pure
functions recompute under jit, and XLA CSEs repeated subexpressions).
"""

from __future__ import annotations

import jax.numpy as jnp

from nonstationary_precip_tpu.ops.linalg import safe_cholesky, tri_solve
from nonstationary_precip_tpu.utils.config import EPSILON


def nystrom_root(k_xz: jnp.ndarray, k_zz: jnp.ndarray, jitter: float = EPSILON):
    """R = K_xz L_zz⁻ᵀ  such that  Q = K_xz K_zz⁻¹ K_zx = R Rᵀ.

    Replaces the reference's ``_inducing_inv_root`` upper-Cholesky solve
    (gibbs_kernels.py:197-208) with a single triangular solve against the
    lower factor — no M×M inverse is materialised.
    Returns (R, L_zz) with R (N, M), L_zz lower (M, M).
    """
    l_zz = safe_cholesky(k_zz, jitter)
    # R = K_xz L^{-T}  ⇔  Rᵀ = L^{-1} K_zx
    r_t = tri_solve(l_zz, jnp.swapaxes(k_xz, -1, -2), lower=True)
    return jnp.swapaxes(r_t, -1, -2), l_zz


def sgpr_diag_correction(k_diag: jnp.ndarray, root: jnp.ndarray) -> jnp.ndarray:
    """clamp(diag(K) − diag(Q), 0, ∞) — the SGPR predictive diagonal
    correction (gibbs_kernels.py:230)."""
    q_diag = jnp.sum(root * root, axis=-1)
    return jnp.clip(k_diag - q_diag, 0.0, None)


def inducing_added_loss_term(
    k_diag: jnp.ndarray, root: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Titsias collapsed-bound trace term: −½ Σ (diag(K) − diag(Q)) / σ².

    GPyTorch's ``InducingPointKernelAddedLossTerm`` as harvested by the MLL
    (gibbs_kernels.py:252-261).  Added (un-normalised) to the data log
    probability before the final /N scaling.
    """
    q_diag = jnp.sum(root * root, axis=-1)
    return -0.5 * jnp.sum((k_diag - q_diag) / noise)
