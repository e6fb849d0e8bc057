"""Gaussian observation likelihood.

GPyTorch parameterisation: noise = softplus(raw_noise) + 1e-4 (the
``GreaterThan(1e-4)`` default noise constraint), raw init 0 →
noise ≈ 0.6932.  The reference freezes noise at 0.011 for the Gibbs
spatial runs (/root/reference/experiments/spatial_exp.py:79,179-182).
"""

from __future__ import annotations

import jax.numpy as jnp

from nonstationary_precip_tpu.utils.struct import pytree_dataclass
from nonstationary_precip_tpu.utils.transforms import positive, raw_init

_NOISE_FLOOR = 1e-4


@pytree_dataclass
class GaussianLikelihood:
    raw_noise: jnp.ndarray

    @classmethod
    def create(cls, noise: float = None, dtype=jnp.float32):
        if noise is None:
            raw = jnp.zeros((), dtype=dtype)
        else:
            raw = raw_init(jnp.maximum(jnp.asarray(noise, dtype=dtype) - _NOISE_FLOOR, 1e-8))
        return cls(raw_noise=raw)

    @property
    def noise(self):
        return positive(self.raw_noise) + _NOISE_FLOOR
