"""Stationary kernels: SE-ARD (RBF), Periodic, Matérn-5/2.

TPU-first Gram construction: squared distances are computed with the
``‖a‖² + ‖b‖² − 2·a@bᵀ`` identity so the O(N²D) work is one matmul on the
MXU instead of an O(N²D) broadcast subtract (the torch kernels the
reference relies on materialise the (N, N, D) difference tensor).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from nonstationary_precip_tpu.kernels.base import Kernel
from nonstationary_precip_tpu.utils.struct import pytree_dataclass
from nonstationary_precip_tpu.utils.transforms import positive, raw_init


def _sq_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances via the matmul identity, clamped at 0."""
    a_sq = jnp.sum(a * a, axis=-1)[..., :, None]
    b_sq = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = jnp.matmul(a, jnp.swapaxes(b, -1, -2), preferred_element_type=a.dtype)
    return jnp.maximum(a_sq + b_sq - 2.0 * ab, 0.0)


@pytree_dataclass(static=("active_dims",))
class RBF(Kernel):
    """SE-ARD: k = exp(-0.5 Σ_d (x1_d - x2_d)² / ℓ_d²).

    Matches GPyTorch ``RBFKernel(ard_num_dims=D)`` with softplus raw
    lengthscales (used throughout the reference, e.g.
    /root/reference/experiments/seard_spatial_benchmark.py:51).
    """

    raw_lengthscale: jnp.ndarray  # (D,)
    active_dims: Optional[Tuple[int, ...]] = None

    @classmethod
    def create(cls, ard_dims: int = 1, lengthscale=None, active_dims=None, dtype=jnp.float32):
        if lengthscale is None:
            raw = jnp.zeros((ard_dims,), dtype=dtype)  # softplus(0) ≈ 0.6931, GPyTorch init
        else:
            raw = raw_init(jnp.broadcast_to(jnp.asarray(lengthscale, dtype=dtype), (ard_dims,)))
        return cls(raw_lengthscale=raw, active_dims=active_dims)

    @property
    def lengthscale(self):
        return positive(self.raw_lengthscale)

    def gram(self, x1, x2):
        ell = self.lengthscale
        d2 = _sq_dist(x1 / ell, x2 / ell)
        return jnp.exp(-0.5 * d2)

    def _diag(self, x):
        return jnp.ones(x.shape[:-1], dtype=x.dtype)


@pytree_dataclass(static=("active_dims",))
class Matern52(Kernel):
    """Matérn-5/2 ARD kernel."""

    raw_lengthscale: jnp.ndarray
    active_dims: Optional[Tuple[int, ...]] = None

    @classmethod
    def create(cls, ard_dims: int = 1, lengthscale=None, active_dims=None, dtype=jnp.float32):
        if lengthscale is None:
            raw = jnp.zeros((ard_dims,), dtype=dtype)
        else:
            raw = raw_init(jnp.broadcast_to(jnp.asarray(lengthscale, dtype=dtype), (ard_dims,)))
        return cls(raw_lengthscale=raw, active_dims=active_dims)

    @property
    def lengthscale(self):
        return positive(self.raw_lengthscale)

    def gram(self, x1, x2):
        ell = self.lengthscale
        d = jnp.sqrt(_sq_dist(x1 / ell, x2 / ell) + 1e-20)
        sqrt5_d = jnp.sqrt(5.0) * d
        return (1.0 + sqrt5_d + (5.0 / 3.0) * d * d) * jnp.exp(-sqrt5_d)

    def _diag(self, x):
        return jnp.ones(x.shape[:-1], dtype=x.dtype)


@pytree_dataclass(static=("active_dims",))
class Periodic(Kernel):
    """Periodic kernel, GPyTorch convention:

        k = exp(-2 Σ_d sin²(π (x1_d - x2_d) / p_d) / ℓ_d)

    (GPyTorch divides by the lengthscale, not its square — replicated here
    since the reference composes GPyTorch's PeriodicKernel directly,
    /root/reference/models/spatio_temporal_models.py:22.)
    """

    raw_lengthscale: jnp.ndarray  # (D,)
    raw_period: jnp.ndarray  # (D,)
    active_dims: Optional[Tuple[int, ...]] = None

    @classmethod
    def create(cls, ard_dims: int = 1, lengthscale=None, period=None, active_dims=None, dtype=jnp.float32):
        def mk(v):
            if v is None:
                return jnp.zeros((ard_dims,), dtype=dtype)
            return raw_init(jnp.broadcast_to(jnp.asarray(v, dtype=dtype), (ard_dims,)))

        return cls(raw_lengthscale=mk(lengthscale), raw_period=mk(period), active_dims=active_dims)

    @property
    def lengthscale(self):
        return positive(self.raw_lengthscale)

    @property
    def period(self):
        return positive(self.raw_period)

    def gram(self, x1, x2):
        # (N1, 1, D) - (1, N2, D): D here is tiny (1 for the temporal axis),
        # so the broadcast form is fine — no MXU opportunity exists for sin².
        diff = x1[..., :, None, :] - x2[..., None, :, :]
        arg = jnp.pi * diff / self.period
        exp_term = jnp.sum(jnp.sin(arg) ** 2 / self.lengthscale, axis=-1)
        return jnp.exp(-2.0 * exp_term)

    def _diag(self, x):
        return jnp.ones(x.shape[:-1], dtype=x.dtype)
