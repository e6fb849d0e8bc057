#!/usr/bin/env python3
"""Deep GP (DSVI) on the spatio-temporal precipitation cube.

Counterpart of /root/reference/experiments/spatiotemporal_dgp.py — which
is unrunnable as committed (selects nonexistent ``DeepGP2/3/5`` classes,
uses undefined metric variables, and loads a missing CSV; SURVEY.md §2.3).
This driver implements the workflow that script describes: spatio-temporal
(t, lon, lat) inputs, 2-layer DSVI deep GP, minibatch 1024, 10 likelihood
samples, months 1-4 of year 2000 train / month 5 test (the working split
from spatio_temporal_exp.py), predictions via minibatched mixture
marginals.

Run: python -m nonstationary_precip_tpu.experiments.spatiotemporal_dgp
"""

from __future__ import annotations

import math

import numpy as np

from nonstationary_precip_tpu.data.datasets import spatio_temporal_month_split
from nonstationary_precip_tpu.models import DeepGP
from nonstationary_precip_tpu.train.optim import fit_minibatched
from nonstationary_precip_tpu.train.config import ExperimentConfig
from nonstationary_precip_tpu.utils.config import BASE_SEED


def main(argv=None):
    import jax
    import jax.numpy as jnp

    cfg = ExperimentConfig(
        lr=0.01,
        num_epochs=200,
        num_samples=10,
        num_layers=2,
        batch_size=1024,
        num_inducing=250,
    ).parse_args(argv)
    dtype = jnp.float32

    x_train, y_train, x_test, y_test, meany, stdy, _, _ = spatio_temporal_month_split()
    n = len(y_train)
    batch = min(cfg.batch_size, n)
    x_train = jnp.asarray(x_train, dtype)
    y_train = jnp.asarray(y_train, dtype)
    x_test = jnp.asarray(x_test, dtype)
    y_test = jnp.asarray(y_test, dtype)

    key = jax.random.PRNGKey(BASE_SEED)
    k_init, k_train, k_pred = jax.random.split(key, 3)
    model = DeepGP.create(
        k_init, input_dims=3, num_layers=cfg.num_layers, num_inducing=cfg.num_inducing
    )

    def loss_fn(m, kk, xb, yb):
        return m.loss(kk, xb, yb, num_data=n, num_samples=cfg.num_samples)

    res = fit_minibatched(
        model,
        loss_fn,
        x_train,
        y_train,
        key=k_train,
        num_epochs=cfg.num_epochs,
        batch_size=batch,
        lr=cfg.lr,
        seed=BASE_SEED,
        aot_key="st_dgp",
        log_every_epochs=max(cfg.num_epochs // 10, 1),
    )

    # predict + metrics as one jitted program (eager ops pay ~28 ms axon
    # dispatch each; see train.vmapped.eval_splits rationale)
    d_mean, d_var, r, nl = jax.jit(
        lambda m, kp, xte, yte: (
            lambda d: (
                d[0].mean,
                d[0].var,
                stdy * jnp.sqrt(jnp.mean((d[0].mean - yte) ** 2)),
                -jnp.mean(
                    -0.5
                    * (
                        (yte - d[0].mean) ** 2 / d[0].var
                        + jnp.log(2 * math.pi * d[0].var)
                    )
                )
                + jnp.log(stdy),
            )
        )(m.predict(kp, xte, num_samples=cfg.num_samples))
    )(res.model, k_pred, x_test, y_test)
    r, nl = float(r), float(nl)
    print(f"RMSE test = {r:.4f}")
    print(f"NLPD test = {nl:.4f}")

    from nonstationary_precip_tpu.utils.config import RESULTS_DIR

    # RESULTS_DIR (NSGP_RESULTS_DIR-overridable), never the CWD: smoke
    # runs must not clobber shipped artifacts, and the CWD may not be
    # writable at all
    RESULTS_DIR.mkdir(parents=True, exist_ok=True)
    np.save(RESULTS_DIR / "results_st_dgp_mean.npy", np.asarray(d_mean))
    np.save(RESULTS_DIR / "results_st_dgp_var.npy", np.asarray(d_var))
    return r, nl


if __name__ == "__main__":
    main()
