#!/usr/bin/env python3
"""Exact-GP stationary spatio-temporal baseline with Box-Cox outputs.

TPU-native counterpart of
/root/reference/experiments/spatiotemporal_stationary.py: first 5 months of
the 2000-2010 Khyber cube (the reference points at a missing
``uib_2000_2010_tp.csv``; the shipped ``khyber_2000_2010_tp.csv`` ≡
``uib_spatio_temporal.csv`` substitutes, SURVEY.md §7), kernel
Scale(RBF(lat,lon)) + Scale(RBF(t)·Periodic(t)), constant mean, Box-Cox y,
Adam lr 0.1 × 200, predictions inverse-Box-Cox'd for raw-space RMSE.

Run: python -m nonstationary_precip_tpu.experiments.spatiotemporal_stationary
"""

from __future__ import annotations

import numpy as np
import scipy.stats
from scipy.special import inv_boxcox

from nonstationary_precip_tpu.data.datasets import load_uib_spatio_temporal
from nonstationary_precip_tpu.kernels import RBF, Periodic, Scale
from nonstationary_precip_tpu.models import ExactGP
from nonstationary_precip_tpu.train import fit, nlpd_marginal, rmse_raw
from nonstationary_precip_tpu.train.config import ExperimentConfig


def make_kernel(dtype):
    """Scale(RBF(lon,lat)) + Scale(RBF(t)·Periodic(t)) over (t, lon, lat)."""
    spatial = Scale.create(RBF.create(2, active_dims=(1, 2), dtype=dtype), dtype=dtype)
    temporal = Scale.create(
        RBF.create(1, active_dims=(0,), dtype=dtype)
        * Periodic.create(1, active_dims=(0,), dtype=dtype),
        dtype=dtype,
    )
    return spatial + temporal


def main(argv=None):
    import jax.numpy as jnp

    cfg = ExperimentConfig(lr=0.1, max_iters=200).parse_args(argv)
    dtype = jnp.float32

    df, x, y = load_uib_spatio_temporal()
    sites = df.groupby("time").size().iloc[0]
    n5 = int(sites) * 5  # first five months
    x, y = x[:n5], y[:n5]

    meanx, stdx = x.mean(0), x.std(0, ddof=1)
    x_norm = (x - meanx) / stdx
    y_tr, lmbda = scipy.stats.boxcox(y)

    n_train = int(sites) * 4
    train_x, train_y = x_norm[:n_train], y_tr[:n_train]
    test_x, test_y = x_norm[n_train:], y_tr[n_train:]

    model = ExactGP.create(make_kernel(dtype), mean_type="constant", dtype=dtype)
    res = fit(
        model,
        lambda m, xx, yy: m.loss(xx, yy),
        jnp.asarray(train_x, dtype),
        jnp.asarray(train_y, dtype),
        lr=cfg.lr,
        num_steps=cfg.max_iters,
        log_every=50,
        chunk=50,
        aot_key="st_stat_exact",
    )
    import jax

    # predict + metrics as one jitted program (eager ops pay ~28 ms axon
    # dispatch each; see train.vmapped.eval_splits rationale)
    p_mean, r_bc, nl = jax.jit(
        lambda m, xtr, ytr, xte, yte: (
            lambda p: (
                p.mean,
                rmse_raw(p.mean, yte),
                nlpd_marginal(yte, p.mean, p.var),
            )
        )(m.predictive(xtr, ytr, xte))
    )(
        res.model,
        jnp.asarray(train_x, dtype),
        jnp.asarray(train_y, dtype),
        jnp.asarray(test_x, dtype),
        jnp.asarray(test_y, dtype),
    )
    raw_pred = inv_boxcox(np.asarray(p_mean), lmbda)
    raw_true = inv_boxcox(test_y, lmbda)
    r_raw = float(np.sqrt(np.mean((raw_pred - raw_true) ** 2)))
    r_bc, nl = float(r_bc), float(nl)
    print(f"RMSE (raw mm/day) = {r_raw:.4f}")
    print(f"RMSE (box-cox)    = {r_bc:.4f}")
    print(f"NLPD (box-cox)    = {nl:.4f}")
    return r_raw, nl


if __name__ == "__main__":
    main()
