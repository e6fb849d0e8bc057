#!/usr/bin/env python3
"""UIB spatio-temporal precipitation: stationary vs nonstationary.

TPU-native counterpart of /root/reference/experiments/spatio_temporal_exp.py:
uib_spatio_temporal.csv, year-2000 months 1-4 train / month 5 test,
``--model Stationary`` (exact GP, separable sum kernel) or
``--model Non-Stationary`` (sparse spatial Gibbs + sparse temporal, shared
frozen inducing points — kmeans-initialised, repairing the committed
``z = None`` crash at spatio_temporal_exp.py:106).
Adam lr 0.015 × 500; RMSE (std-rescaled) + per-point NLPD.

Run: python -m nonstationary_precip_tpu.experiments.spatio_temporal --model Non-Stationary
"""

from __future__ import annotations

import math

import numpy as np

from nonstationary_precip_tpu.data.datasets import spatio_temporal_month_split
from nonstationary_precip_tpu.models import (
    SparseSpatioTemporalNonstationary,
    SpatioTemporalStationary,
)
from nonstationary_precip_tpu.ops.kmeans import kmeans_inducing_points
from nonstationary_precip_tpu.priors import LogNormalProcess
from nonstationary_precip_tpu.train import fit, nlpd_marginal, rmse_rescaled
from nonstationary_precip_tpu.train.config import ExperimentConfig
from nonstationary_precip_tpu.utils.config import BASE_SEED


def main(argv=None):
    import jax
    import jax.numpy as jnp

    cfg = ExperimentConfig(
        model="Stationary", lr=0.015, max_iters=500, num_inducing=500
    ).parse_args(argv)
    dtype = jnp.float32

    x_train, y_train, x_test, y_test, meany, stdy, x_norm, y_raw = (
        spatio_temporal_month_split()
    )
    x_train = jnp.asarray(x_train, dtype)
    y_train = jnp.asarray(y_train, dtype)
    x_test = jnp.asarray(x_test, dtype)
    y_test = jnp.asarray(y_test, dtype)

    nonstationary = cfg.model.lower().startswith("non")
    if nonstationary:
        prior = LogNormalProcess.create(
            input_dim=2,
            mean=math.log(cfg.prior_mean),
            outputscale=cfg.prior_scale,
            lengthscale=cfg.prior_ell,
            dtype=dtype,
        )
        z = kmeans_inducing_points(
            jax.random.PRNGKey(BASE_SEED), x_train, cfg.num_inducing
        )
        model = SparseSpatioTemporalNonstationary.create(z, prior, dtype=dtype)
        mask = model.trainable()
    else:
        model = SpatioTemporalStationary.create(dtype=dtype)
        mask = None

    res = fit(
        model,
        lambda m, xx, yy: m.loss(xx, yy),
        x_train,
        y_train,
        lr=cfg.lr,
        num_steps=cfg.max_iters,
        mask=mask,
        log_every=50,
        chunk=50,
        aot_key="st_nonstat" if nonstationary else "st_stat",
    )
    model = res.model

    # predict + metrics as one jitted program (eager ops pay ~28 ms axon
    # dispatch each; see train.vmapped.eval_splits rationale)
    r, nl = jax.jit(
        lambda m, xtr, ytr, xte, yte: (
            lambda p: (
                rmse_rescaled(p.mean, yte, stdy),
                nlpd_marginal(yte, p.mean, p.var),
            )
        )(m.predictive(xtr, ytr, xte))
    )(model, x_train, y_train, x_test, y_test)
    r, nl = float(r), float(nl)
    print(f"RMSE test = {r:.4f}")
    print(f"NLPD test = {nl:.4f}")

    # full-field prediction for the 5-month facet maps; CSV schema mirrors
    # results/dgp2_spatio_temporal_means_sigmas.csv (pred/std/time/lon/lat)
    import pandas as pd

    from nonstationary_precip_tpu.utils.config import RESULTS_DIR

    RESULTS_DIR.mkdir(parents=True, exist_ok=True)
    pf_mean, pf_var = jax.jit(
        lambda m, xtr, ytr, xa: (lambda p: (p.mean, p.var))(
            m.predictive(xtr, ytr, xa)
        )
    )(model, x_train, y_train, jnp.asarray(x_norm, dtype))
    pd.DataFrame(
        {
            "pred": np.asarray(pf_mean),
            "std": np.sqrt(np.asarray(pf_var)),
            "time": np.asarray(x_norm)[:, 0],
            "lon": np.asarray(x_norm)[:, 1],
            "lat": np.asarray(x_norm)[:, 2],
        }
    ).to_csv(RESULTS_DIR / f"st_{cfg.model.lower()}_means_sigmas.csv", index=False)

    # 5-month facet map of predicted fields (spatio_temporal_exp.py:195-217)
    try:
        from nonstationary_precip_tpu.utils.plotting import facetgrid_plot

        xs = np.asarray(x_norm)
        mean_f = np.asarray(pf_mean) * stdy + meany
        months = sorted(np.unique(xs[:, 0]))
        per_month = [mean_f[xs[:, 0] == t] for t in months]
        lon = xs[xs[:, 0] == months[0], 1]
        lat = xs[xs[:, 0] == months[0], 2]
        facetgrid_plot(
            lon,
            lat,
            per_month,
            suptitle=f"{cfg.model} predictive mean (mm/day)",
            savepath=RESULTS_DIR / f"st_{cfg.model.lower()}_facets.png",
        )
    except Exception:
        pass
    return r, nl


if __name__ == "__main__":
    main()
