"""Evaluation metrics: RMSE (both reference conventions) and NLPD.

The reference ships two ``rmse`` variants that differ silently:
  * utils/metrics.py:36-38  — rescaled by Y_std  → ``rmse_rescaled``
  * utils/metrics2.py:36-38 — no rescale         → ``rmse_raw``
Both are kept, named explicitly (SURVEY.md §7 build plan item 5).

``nlpd_joint`` matches utils/metrics.py:40-45 (joint log-prob / N, minus
log Y_std); ``nlpd_marginal`` matches per-point
``negative_log_predictive_density`` (utils/metrics.py:48-52).
"""

from __future__ import annotations

import jax.numpy as jnp


def rmse_rescaled(y_pred_mean, y_test, y_std) -> jnp.ndarray:
    return y_std * jnp.sqrt(jnp.mean((y_pred_mean - y_test) ** 2))


def rmse_raw(y_pred_mean, y_test) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean((y_pred_mean - y_test) ** 2))


def nlpd_joint(pred_dist, y_test, y_std) -> jnp.ndarray:
    """−(joint log p(y) / N − log Y_std): ``pred_dist`` is an MVN (or any
    object with .log_prob returning the joint density)."""
    lpd = pred_dist.log_prob(y_test)
    return -(lpd / y_test.shape[-1] - jnp.log(y_std))


def nlpd_marginal(y_test, pred_mean, pred_var) -> jnp.ndarray:
    """Mean per-point Gaussian negative log density."""
    import math

    lpd = -0.5 * ((y_test - pred_mean) ** 2 / pred_var + jnp.log(2 * math.pi * pred_var))
    return -jnp.mean(lpd)
