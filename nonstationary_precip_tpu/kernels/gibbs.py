"""Diagonal (per-dimension) Gibbs nonstationary kernel.

Math (eq. 4.32, Rasmussen & Williams; reference implementation at
/root/reference/models/gibbs_kernels.py:135-162):

    k(x, x') = ∏_d sqrt( 2 ℓ_d(x) ℓ_d(x') / (ℓ_d(x)² + ℓ_d(x')²) )
               · exp( − Σ_d (x_d − x'_d)² / (ℓ_d(x)² + ℓ_d(x')²) )

The lengthscale field ℓ(·) is supplied explicitly: in this framework the
latent field is a model parameter and conditional lengthscales at new
points are produced by the prior process (priors/lognormal_process.py) —
the reference's sample-if-absent fallback (gibbs_kernels.py:144-153) is a
stateful quirk that does not survive functional purity, deliberately.

Layout convention: x is (N, D), ell is (N, D) — row per point.  (The
reference carries ell as (D, N); we transpose at the model boundary.)

TPU path: the fused Pallas Gram kernel (ops/pallas_gram.py) computes the
prefactor product and quadratic sum in one VMEM pass per (128, 128) tile,
avoiding the (N², D) HBM intermediates of the broadcast formulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp

from nonstationary_precip_tpu.utils.struct import pytree_dataclass


def gibbs_gram(
    x1: jnp.ndarray,
    ell1: jnp.ndarray,
    x2: jnp.ndarray,
    ell2: jnp.ndarray,
    *,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Gibbs cross-Gram matrix (N1, N2).

    x1 (N1, D), ell1 (N1, D), x2 (N2, D), ell2 (N2, D).
    """
    if use_pallas is None:
        use_pallas = _pallas_eligible(x1, x2)
    if use_pallas:
        from nonstationary_precip_tpu.ops.pallas_gram import gibbs_gram_pallas

        return gibbs_gram_pallas(x1, ell1, x2, ell2)
    return gibbs_gram_reference(x1, ell1, x2, ell2)


def gibbs_gram_reference(x1, ell1, x2, ell2):
    """Pure-jnp formulation (oracle for the Pallas kernel, and the f64 path)."""
    # (N1, 1, D) + (1, N2, D)
    sq_sum = ell1[:, None, :] ** 2 + ell2[None, :, :] ** 2
    prod = ell1[:, None, :] * ell2[None, :, :]
    pref = jnp.prod(jnp.sqrt(2.0 * prod / sq_sum), axis=-1)
    diff = x1[:, None, :] - x2[None, :, :]
    quad = jnp.sum(diff**2 / sq_sum, axis=-1)
    return pref * jnp.exp(-quad)


@functools.lru_cache(maxsize=8)
def packed_gibbs_cross(d: int):
    """cross_fn (stable identity — the lazy/sharded CG machinery caches on
    it) for the packed-payload convention those paths use: rows are
    ``x_aug = concat([x, log_ell], 1)`` with the split point ``d`` static.

    ``kernel`` is the RAW outputscale (softplus-raw scalar, may be None for
    the unscaled Gram): passing it as the lazy path's kernel pytree makes
    s² trainable through ``lazy_cg_mll``'s panel pullback, while the
    per-point lengthscale field trains through the x-cotangent (it rides
    the payload columns).  Counterpart of the fused forward matvec
    ``ops.pallas_matvec.scaled_packed_gibbs_matvec_builder`` — the two MUST
    compute the same operator (the lazy backward rebuilds panels through
    this function)."""

    def cross(raw_s2, xa, xb):
        from nonstationary_precip_tpu.utils.transforms import positive

        k = gibbs_gram_reference(
            xa[:, :d], jnp.exp(xa[:, d:]), xb[:, :d], jnp.exp(xb[:, d:])
        )
        if raw_s2 is None:
            return k
        return positive(raw_s2) * k

    return cross


def gibbs_diag(x: jnp.ndarray, ell: jnp.ndarray) -> jnp.ndarray:
    """Diagonal of the Gibbs Gram: identically 1 (prefactor and quad both
    collapse when x1 == x2 and ell1 == ell2)."""
    return jnp.ones(x.shape[:-1], dtype=x.dtype)


def _pallas_eligible(x1, x2) -> bool:
    try:
        import nonstationary_precip_tpu.ops.pallas_gram as pg

        return pg.eligible(x1, x2)
    except Exception:
        return False


@pytree_dataclass(static=("active_dims",))
class GibbsKernel:
    """Object wrapper binding a lengthscale field to the Gibbs Gram.

    ``ell1``/``ell2`` are (N, D) positive lengthscales at the respective
    inputs.  ``active_dims`` slices input columns as in the reference's
    spatio-temporal composition (gibbs_kernels.py active_dims usage).
    """

    active_dims: Optional[tuple] = None

    def _slice(self, x):
        if self.active_dims is None:
            return x
        return x[..., jnp.asarray(self.active_dims)]

    def _check_ell(self, xs, ell):
        # ell is supplied pre-sliced (one column per *active* dim); a
        # full-width ell would broadcast silently into a wrong Gram, so
        # reject the mismatch at trace time (shapes are static under jit)
        if ell.shape[-1] != xs.shape[-1]:
            raise ValueError(
                f"ell has {ell.shape[-1]} columns but the kernel operates on "
                f"{xs.shape[-1]} active dims ({self.active_dims}); pass ell "
                "sliced to the active dims"
            )

    def __call__(self, x1, ell1, x2=None, ell2=None, *, use_pallas=None):
        xs1 = self._slice(x1)
        self._check_ell(xs1, ell1)
        if x2 is None:
            xs2, ell2 = xs1, ell1
        else:
            xs2 = self._slice(x2)
            self._check_ell(xs2, ell2)
        return gibbs_gram(xs1, ell1, xs2, ell2, use_pallas=use_pallas)

    def diag(self, x, ell):
        xs = self._slice(x)
        self._check_ell(xs, ell)
        return gibbs_diag(xs, ell)
