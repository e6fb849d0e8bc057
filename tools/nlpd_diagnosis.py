#!/usr/bin/env python3
"""Diagnose the two NLPD anomalies flagged in VERDICT.md (round 1):

(a) gibbs_spatial_exact_10split NLPD 1.16 vs gibbs_spatial_sparse_10split
    −0.11 at similar RMSE (0.319 / 0.262);
(b) spatio_temporal nonstationary NLPD 4.85 vs stationary 3.74 despite
    better RMSE (2.11 vs 2.22).

Method: train the benchmark configs (split 0 for the spatial pair; the
month-5 split for the ST pair), then decompose the joint NLPD
  nlpd = −(log p(y*)/N − log σ_y)
       = (quad/2 + logdet/2 + N·log(2π)/2)/N + log σ_y
into its quadratic (calibration of the mean) and logdet (claimed
confidence) terms; report per-point marginal NLPD and the predictive
variance distribution; and re-evaluate the SAME trained parameters through
an independent torch float64 implementation of the reference predict
algebra (nonstationary_models.py:45-62 / :91-153) to rule out f32 or
implementation error.

Run on CPU:  python tools/nlpd_diagnosis.py [spatial|st]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable jax_enable_x64 — the benchmarks train in f32 and
# flipping the global dtype changes the trained program (measured: the
# sparse split-0 run goes NaN under global x64 via f32/f64 mixing in the
# prior construction).  The f64 cross-check is the torch oracle.

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402


def decompose_joint_nlpd(mean, cov, y, y_std):
    """Return dict of the joint-NLPD pieces (all already /N)."""
    n = y.shape[-1]
    l = np.linalg.cholesky(cov)
    alpha = np.linalg.solve(l, y - mean)
    quad = float(alpha @ alpha)
    logdet = float(2 * np.sum(np.log(np.diag(l))))
    nlpd = 0.5 * (quad + logdet + n * math.log(2 * math.pi)) / n + math.log(y_std)
    if not np.all(np.isfinite(cov)):
        raise ValueError("non-finite predictive covariance")
    eig = np.linalg.eigvalsh(cov)
    return {
        "nlpd_joint": nlpd,
        "quad/2N": 0.5 * quad / n,
        "logdet/2N": 0.5 * logdet / n,
        "const": 0.5 * math.log(2 * math.pi) + math.log(y_std),
        "min_eig": float(eig.min()),
        "max_eig": float(eig.max()),
        "mean_marg_var": float(np.mean(np.diag(cov))),
        "min_marg_var": float(np.min(np.diag(cov))),
    }


def marginal_nlpd(mean, var, y, y_std):
    z = (y - mean) ** 2 / var
    return float(np.mean(0.5 * (z + np.log(2 * math.pi * var))) + math.log(y_std))


def report(tag, mean, cov, y, y_std):
    d = decompose_joint_nlpd(mean, cov, y, y_std)
    mn = marginal_nlpd(mean, np.diag(cov), y, y_std)
    rmse = y_std * float(np.sqrt(np.mean((mean - y) ** 2)))
    print(f"\n== {tag} ==")
    print(f"  RMSE(rescaled)      {rmse:.4f}")
    for k, v in d.items():
        print(f"  {k:18s} {v: .6g}")
    print(f"  nlpd_marginal       {mn:.4f}")
    # calibration: fraction of |standardised residual| < 1 and < 2
    zr = np.abs(mean - y) / np.sqrt(np.diag(cov))
    print(f"  P(|z|<1) {np.mean(zr < 1):.3f}  P(|z|<2) {np.mean(zr < 2):.3f}  max|z| {zr.max():.2f}")
    return d


# ---------------------------------------------------------------------------
# torch f64 oracle of the reference exact predict path
# ---------------------------------------------------------------------------


def torch_exact_predictive(x, y, xs, log_ell, noise, s2, pm, ps2, pell):
    tx = torch.tensor(np.asarray(x), dtype=torch.float64)
    txs = torch.tensor(np.asarray(xs), dtype=torch.float64)
    ty = torch.tensor(np.asarray(y), dtype=torch.float64)
    ell1 = torch.exp(torch.tensor(np.asarray(log_ell), dtype=torch.float64))

    def prior_gram(a, b):
        return ps2 * torch.exp(-0.5 * (torch.cdist(a / pell, b / pell) ** 2))

    n = len(tx)
    kg = prior_gram(tx, tx) + 1e-4 * torch.eye(n, dtype=torch.float64)
    ksg = prior_gram(txs, tx)
    ell2 = torch.exp(pm + ksg @ torch.linalg.solve(kg, torch.log(ell1) - pm))

    def gibbs(a, ea, b, eb):
        ss = ea[:, None, :] ** 2 + eb[None, :, :] ** 2
        pref = torch.prod(torch.sqrt(2 * ea[:, None, :] * eb[None, :, :] / ss), dim=-1)
        quad = torch.sum((a[:, None, :] - b[None, :, :]) ** 2 / ss, dim=-1)
        return s2 * pref * torch.exp(-quad)

    k_xx = gibbs(tx, ell1, tx, ell1) + noise * torch.eye(n, dtype=torch.float64)
    k_sx = gibbs(txs, ell2, tx, ell1)
    k_ss = gibbs(txs, ell2, txs, ell2)
    m = len(txs)
    mu = k_sx @ torch.linalg.solve(k_xx, ty)
    sigma = (
        k_ss
        - k_sx @ torch.linalg.solve(k_xx, k_sx.T)
        + 1e-4 * torch.eye(m, dtype=torch.float64)
        + noise * torch.eye(m, dtype=torch.float64)
    )
    return mu.numpy(), sigma.numpy()


def run_spatial():
    from nonstationary_precip_tpu.experiments.spatial_gibbs import make_split
    from nonstationary_precip_tpu.data.datasets import load_uib_spatial
    from nonstationary_precip_tpu.train.config import ExperimentConfig
    from nonstationary_precip_tpu.train.vmapped import fit_splits, unstack_pytree

    _, x, y = load_uib_spatial()
    meanx, stdx = x.mean(0), x.std(0, ddof=1)
    x_norm = (x - meanx) / stdx
    meany, stdy = y.mean(), float(y.std(ddof=1))
    y_norm = (y - meany) / stdy

    results = {}
    for inference in ["exact", "sparse"]:
        # benchmark configs: exact 5000 iters, sparse 2000 (RESULTS.json).
        # NOTE: on CPU f32 the sparse trajectory diverges shortly before
        # 2000 iters (trained z walks K_zz past safe_cholesky's retry
        # ceiling); the TPU benchmark run at 2000 stays finite — the config
        # rides the stability edge and rounding decides.  1500 is safely
        # inside the stable regime on both backends and the calibration
        # decomposition is already converged there.
        iters = 5000 if inference == "exact" else 1500
        cfg = ExperimentConfig(lr=0.01, max_iters=iters, inference=inference)
        dtype = jnp.float32
        model, mask, args, datas = make_split(x_norm, y_norm, 0, cfg, dtype)
        if inference == "sparse":
            loss_fn = lambda m, xx, yy: m.loss(xx, yy)  # noqa: E731
        else:
            # frozen-prior hoist (done batched in the experiment's main())
            args = args + (model.prior.gram_pre(args[0]),)
            loss_fn = lambda m, xx, yy, pc: m.loss(xx, yy, pc)  # noqa: E731
        res = fit_splits([model], loss_fn, *[(a,) for a in args], lr=cfg.lr, num_steps=cfg.max_iters, masks=[mask])
        trained = unstack_pytree(res.model, 1)[0]
        x_train, y_train, x_test, y_test = datas
        pred = trained.predictive(x_train, y_train, x_test)
        d = report(
            f"spatial {inference} (split 0, f32 train, jax predict)",
            np.asarray(pred.mean, np.float64),
            np.asarray(pred.cov, np.float64),
            np.asarray(y_test, np.float64),
            stdy,
        )
        results[inference] = (trained, datas, d)

        if inference == "exact":
            # same trained params through the torch f64 reference algebra
            mu_t, cov_t = torch_exact_predictive(
                x_train,
                y_train,
                x_test,
                trained.log_ell,
                float(trained.likelihood.noise),
                float(trained.outputscale),
                math.log(0.3),
                1.0,
                1.3,
            )
            report(
                "spatial exact — SAME params, torch f64 reference algebra",
                mu_t,
                cov_t,
                np.asarray(y_test, np.float64),
                stdy,
            )
    return results


def run_st_decomposed():
    """Train both ST models once and print the marginal-NLPD decomposition."""
    import math as _math

    import jax
    import jax.numpy as jnp

    from nonstationary_precip_tpu.data.datasets import spatio_temporal_month_split
    from nonstationary_precip_tpu.models import (
        SparseSpatioTemporalNonstationary,
        SpatioTemporalStationary,
    )
    from nonstationary_precip_tpu.ops.kmeans import kmeans_inducing_points
    from nonstationary_precip_tpu.priors import LogNormalProcess
    from nonstationary_precip_tpu.train import fit
    from nonstationary_precip_tpu.utils.config import BASE_SEED

    dtype = jnp.float32
    x_train, y_train, x_test, y_test, meany, stdy, x_norm, y_raw = (
        spatio_temporal_month_split()
    )
    x_train = jnp.asarray(x_train, dtype)
    y_train = jnp.asarray(y_train, dtype)
    x_test = jnp.asarray(x_test, dtype)
    y_test_j = jnp.asarray(y_test, dtype)

    for name in ["Stationary", "Non-Stationary"]:
        if name.startswith("Non"):
            prior = LogNormalProcess.create(
                input_dim=2, mean=_math.log(0.3), outputscale=1.0, lengthscale=1.3, dtype=dtype
            )
            # benchmark config: --num_inducing 100 (run_benchmarks.py)
            z = kmeans_inducing_points(jax.random.PRNGKey(BASE_SEED), x_train, 100)
            model = SparseSpatioTemporalNonstationary.create(z, prior, dtype=dtype)
            mask = model.trainable()
        else:
            model = SpatioTemporalStationary.create(dtype=dtype)
            mask = None
        res = fit(
            model, lambda m, xx, yy: m.loss(xx, yy), x_train, y_train,
            lr=0.015, num_steps=500, mask=mask, chunk=500,
        )
        model = res.model
        pred = model.predictive(x_train, y_train, x_test)
        mean = np.asarray(pred.mean, np.float64)
        var = np.asarray(pred.var, np.float64)
        yt = np.asarray(y_test, np.float64)
        z2 = (yt - mean) ** 2 / var
        print(f"\n== ST {name} (month-5) ==")
        print(f"  RMSE(rescaled)   {float(stdy)*np.sqrt(np.mean((mean-yt)**2)):.4f}")
        print(f"  marginal NLPD    {marginal_nlpd(mean, var, yt, float(stdy)):.4f}")
        print(f"  mean z²/2        {0.5*np.mean(z2):.4f}   (mean-calibration term)")
        print(f"  mean log(var)/2  {0.5*np.mean(np.log(var)):.4f}   (confidence term)")
        print(f"  var: min {var.min():.4g} med {np.median(var):.4g} max {var.max():.4g}")
        print(f"  noise {float(model.likelihood.noise):.5f}")
        print(f"  P(|z|<1) {np.mean(z2 < 1):.3f}  P(|z|<2) {np.mean(z2 < 4):.3f}  max z² {z2.max():.1f}")
        worst = np.argsort(z2)[-5:][::-1]
        print(f"  worst points (idx, z², var, |err|·σy):")
        for i in worst:
            print(f"    {i:3d}  {z2[i]:8.1f}  {var[i]:.4g}  {float(stdy)*abs(mean[i]-yt[i]):.2f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "spatial"
    if which == "spatial":
        run_spatial()
    else:
        run_st_decomposed()
