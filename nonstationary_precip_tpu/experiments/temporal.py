#!/usr/bin/env python3
"""1-D temporal extrapolation at a single Khyber grid point.

TPU-native counterpart of /root/reference/experiments/temporal_exp.py:
khyber_time_series.csv (342 monthly obs) → Box-Cox y → contiguous last-20%
extrapolation split (no shuffle) → exact GP with
Scale(RBF·Periodic, outputscale > 7) → Adam lr 0.01 × 2000 → RMSE/NLPD.

Run: python -m nonstationary_precip_tpu.experiments.temporal
"""

from __future__ import annotations

import numpy as np
import scipy.stats

from nonstationary_precip_tpu.data.datasets import load_khyber_time_series
from nonstationary_precip_tpu.data.dataprep import train_test_split
from nonstationary_precip_tpu.kernels import RBF, Periodic, Scale
from nonstationary_precip_tpu.models import ExactGP
from nonstationary_precip_tpu.train import fit, nlpd_joint, rmse_rescaled
from nonstationary_precip_tpu.train.config import ExperimentConfig


def make_temporal_kernel(dtype):
    """Scale(RBF(t)·Periodic(t), outputscale>7) — temporal_exp.py:39-40."""
    return Scale.create(
        RBF.create(1, dtype=dtype) * Periodic.create(1, dtype=dtype),
        outputscale=7.6931,
        lower_bound=7.0,
        dtype=dtype,
    )


def main(argv=None):
    import jax.numpy as jnp

    cfg = ExperimentConfig(lr=0.01, max_iters=2000).parse_args(argv)
    dtype = jnp.float32

    t, tp = load_khyber_time_series()
    meanx, stdx = t.mean(), t.std(ddof=1)
    x_norm = ((t - meanx) / stdx)[:, None]
    y_tr, lmbda = scipy.stats.boxcox(tp)

    train_x, train_y, test_x, test_y = train_test_split(x_norm, y_tr, 0.8)

    model = ExactGP.create(make_temporal_kernel(dtype), mean_type="constant", dtype=dtype)
    res = fit(
        model,
        lambda m, xx, yy: m.loss(xx, yy),
        jnp.asarray(train_x, dtype),
        jnp.asarray(train_y, dtype),
        lr=cfg.lr,
        num_steps=cfg.max_iters,
        log_every=500,
        chunk=500,
        aot_key="temporal",
    )
    import jax

    # predict + metrics as one jitted program (eager ops pay ~28 ms axon
    # dispatch each; see train.vmapped.eval_splits rationale)
    p_mean, r, nl = jax.jit(
        lambda m, xtr, ytr, xte, yte: (
            lambda p: (
                p.mean,
                rmse_rescaled(p.mean, yte, 1.0),
                nlpd_joint(p, yte, 1.0),
            )
        )(m.predictive(xtr, ytr, xte))
    )(
        res.model,
        jnp.asarray(train_x, dtype),
        jnp.asarray(train_y, dtype),
        jnp.asarray(test_x, dtype),
        jnp.asarray(test_y, dtype),
    )
    r, nl = float(r), float(nl)
    print(f"RMSE test (box-cox space) = {r:.4f}")
    print(f"NLPD test = {nl:.4f}")

    # raw-space RMSE via inverse Box-Cox (spatiotemporal_stationary.py:99-101)
    from scipy.special import inv_boxcox

    raw_pred = inv_boxcox(np.asarray(p_mean), lmbda)
    raw_true = inv_boxcox(test_y, lmbda)
    print(f"RMSE test (raw mm/day)    = {np.sqrt(np.mean((raw_pred - raw_true) ** 2)):.4f}")
    return r, nl


if __name__ == "__main__":
    main()
