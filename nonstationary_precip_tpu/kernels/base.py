"""Kernel algebra: composable covariance functions as pytree dataclasses.

A kernel is a frozen dataclass whose array fields are its (raw,
unconstrained) hyperparameters.  ``k(x1, x2)`` builds the cross-Gram,
``k(x)`` the symmetric Gram, ``k.diag(x)`` the diagonal — always as pure
functions of the pytree, so the same object flows through
``jit``/``grad``/``vmap`` and is optimised directly by optax.

``active_dims`` reproduces the reference's column-slicing composition
(e.g. /root/reference/models/spatio_temporal_models.py:22-24: a temporal
kernel on column 0 summed with a spatial kernel on columns (1, 2)).

Algebra: ``k1 + k2`` → Sum, ``k1 * k2`` → Product, ``Scale(k)`` → s² · k
(GPyTorch ScaleKernel analogue with softplus-positive outputscale).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from nonstationary_precip_tpu.utils.struct import pytree_dataclass
from nonstationary_precip_tpu.utils.transforms import positive, raw_init


class Kernel:
    """Mixin giving kernels call conventions and algebra."""

    active_dims: Optional[Tuple[int, ...]] = None

    def _slice(self, x):
        if x is None or self.active_dims is None:
            return x
        return x[..., jnp.asarray(self.active_dims)]

    def __call__(self, x1, x2=None):
        xs1 = self._slice(x1)
        xs2 = xs1 if x2 is None else self._slice(x2)
        return self.gram(xs1, xs2)

    def diag(self, x):
        xs = self._slice(x)
        return self._diag(xs)

    def gram(self, x1, x2):  # pragma: no cover - abstract
        raise NotImplementedError

    def _diag(self, x):
        # generic fallback; subclasses override with O(N) forms
        return jnp.diagonal(self.gram(x, x))

    def __add__(self, other):
        return Sum(kernels=(self, other))

    def __mul__(self, other):
        return Product(kernels=(self, other))


@pytree_dataclass
class Sum(Kernel):
    kernels: tuple

    def __call__(self, x1, x2=None):
        return sum(k(x1, x2) for k in self.kernels)

    def diag(self, x):
        return sum(k.diag(x) for k in self.kernels)


@pytree_dataclass
class Product(Kernel):
    kernels: tuple

    def __call__(self, x1, x2=None):
        out = None
        for k in self.kernels:
            g = k(x1, x2)
            out = g if out is None else out * g
        return out

    def diag(self, x):
        out = None
        for k in self.kernels:
            g = k.diag(x)
            out = g if out is None else out * g
        return out


@pytree_dataclass(static=("lower_bound",))
class Scale(Kernel):
    """outputscale * base(x1, x2).

    ``lower_bound`` reproduces GPyTorch's ``GreaterThan`` constraint used at
    /root/reference/models/spatio_temporal_models.py:22 (outputscale > 7):
    constrained = softplus(raw) + lower_bound.
    """

    base: Kernel
    raw_outputscale: jnp.ndarray
    lower_bound: float = 0.0

    @classmethod
    def create(cls, base: Kernel, outputscale=1.0, lower_bound: float = 0.0, dtype=jnp.float32):
        value = jnp.maximum(jnp.asarray(outputscale, dtype=dtype) - lower_bound, 1e-6)
        return cls(base=base, raw_outputscale=raw_init(value), lower_bound=lower_bound)

    @property
    def outputscale(self):
        return positive(self.raw_outputscale) + self.lower_bound

    def __call__(self, x1, x2=None):
        return self.outputscale * self.base(x1, x2)

    def diag(self, x):
        return self.outputscale * self.base.diag(x)
