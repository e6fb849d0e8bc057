"""Positivity transforms for raw (unconstrained) parameters.

GPyTorch's default ``Positive`` constraint is softplus; the reference's
kernels/likelihoods inherit it implicitly everywhere (lengthscales,
outputscales, noise).  We reproduce the same parameterisation so that
hyperparameter trajectories under Adam are comparable:

    constrained = softplus(raw),   raw = inv_softplus(constrained)

``LearnedSoftPlus`` mirrors /root/reference/models/latent_priors.py:16-25
(a softplus with learnable log-beta and a linearisation threshold of 20).
"""

from __future__ import annotations

import jax.numpy as jnp

from nonstationary_precip_tpu.utils.struct import pytree_dataclass


def softplus(x):
    return jnp.logaddexp(x, 0.0)


def inv_softplus(y):
    """Inverse of softplus: log(exp(y) - 1), stable for large y."""
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


def positive(raw):
    """Constrained value of a raw parameter (softplus, GPyTorch default)."""
    return softplus(raw)


def raw_init(value, dtype=None):
    """Raw parameter whose constrained value equals ``value``."""
    v = jnp.asarray(value, dtype=dtype)
    return inv_softplus(v)


@pytree_dataclass(static=("threshold",))
class LearnedSoftPlus:
    """Softplus with learnable beta (log-parameterised), threshold 20.

    forward(x) = log1p(exp(beta*x)) / beta  for beta*x < threshold, else x.
    Reference: /root/reference/models/latent_priors.py:16-25.
    """

    log_beta: jnp.ndarray
    threshold: float = 20.0

    @classmethod
    def create(cls, init_beta: float = 1.0, dtype=jnp.float32):
        return cls(log_beta=jnp.log(jnp.asarray(init_beta, dtype=dtype)))

    def __call__(self, x):
        beta = jnp.exp(self.log_beta)
        beta_x = beta * x
        small = beta_x < self.threshold
        # clamp the UNSELECTED branch's input: where's VJP evaluates both
        # branches, and for beta*x > ~88 (f32) exp overflows to inf, whose
        # d(log1p∘exp) = inf/inf = NaN then poisons the gradient through
        # the 0·NaN trap even though the branch isn't selected
        safe_bx = jnp.where(small, beta_x, 0.0)
        return jnp.where(small, jnp.log1p(jnp.exp(safe_bx)) / beta, x)
