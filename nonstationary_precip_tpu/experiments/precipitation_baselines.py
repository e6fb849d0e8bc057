#!/usr/bin/env python3
"""Production-style training driver: config → split → train → observe →
checkpoint → early-stop.

TPU-native counterpart of
/root/reference/experiments/precipitation_baselines.py (the reference's
most framework-like driver, :105-397): full CLI config, censored-region or
random test split, kmeans inducing init, TensorBoard/JSONL logging of
hypers + metrics, rolling best/best-RMSE/best-NLPD checkpoints, early stop
on |Δloss| < threshold, final checkpoint.

Data: the reference targets a CONUS NWS netCDF file that is not shipped
(and an out-of-repo ``src`` layout — it does not run as committed,
SURVEY.md §2.3).  This driver runs the same workflow against any CSV with
columns [x..., y]; ``--data`` defaults to the bundled UIB spatial field.
netCDF input is supported when a netCDF reader is importable.

Run: python -m nonstationary_precip_tpu.experiments.precipitation_baselines \
       --model DiagonalGibbs --inference sparse --max_iters 2000
"""

from __future__ import annotations

import math
import time
from pathlib import Path

import numpy as np

from nonstationary_precip_tpu.data.dataprep import load_csv
from nonstationary_precip_tpu.kernels import RBF, Scale
from nonstationary_precip_tpu.models import ExactGP, GibbsExactGP, GibbsSparseGP
from nonstationary_precip_tpu.ops.kmeans import kmeans_inducing_points
from nonstationary_precip_tpu.priors import LogNormalProcess
from nonstationary_precip_tpu.train import nlpd_joint, rmse_rescaled, rmse_raw
from nonstationary_precip_tpu.train.checkpoint import BestCheckpointer
from nonstationary_precip_tpu.train.config import ExperimentConfig
from nonstationary_precip_tpu.train.logging import MetricsLogger, param_table
from nonstationary_precip_tpu.train.optim import fit
from nonstationary_precip_tpu.utils.config import BASE_SEED, DATASET_DIR


def censored_split(x: np.ndarray, y: np.ndarray, rng, frac=0.2):
    """Censored-region test split: hold out a spatially contiguous box
    around a random centre (the reference's 'censored' test_type,
    precipitation_baselines.py:170-204)."""
    centre = x[rng.integers(len(x))]
    d = np.linalg.norm(x[:, :2] - centre[:2], axis=-1)
    n_test = int(frac * len(x))
    test_idx = np.argsort(d)[:n_test]
    mask = np.ones(len(x), dtype=bool)
    mask[test_idx] = False
    return x[mask], y[mask], x[~mask], y[~mask]


def random_split(x, y, rng, frac=0.2):
    idx = rng.permutation(len(x))
    n_test = int(frac * len(x))
    te, tr = idx[:n_test], idx[n_test:]
    return x[tr], y[tr], x[te], y[te]


def main(argv=None):
    import jax
    import jax.numpy as jnp

    cfg = ExperimentConfig(
        data=str(DATASET_DIR / "uib_spatial.csv"),
        model="DiagonalGibbs",
        max_iters=2000,
        log_interval=50,
        test_interval=200,
    ).parse_args(argv)
    dtype = jnp.float32

    name = cfg.name or f"{cfg.model}_{cfg.inference}_{int(time.time())}"
    logdir = Path(cfg.logdir) / name
    cfg.dump(logdir / "config.json")
    logger = MetricsLogger(logdir, name="train")
    ckpt = BestCheckpointer(logdir)

    # -- data ---------------------------------------------------------------
    # route .nc files to the gated netCDF loader the docstring promises
    # (reference input path, precipitation_baselines.py:150-168); it
    # raises a clear ImportError without xarray instead of feeding the
    # binary to the CSV parser
    if str(cfg.data).endswith((".nc", ".nc4", ".cdf")):
        from nonstationary_precip_tpu.data.dataprep import load_netcdf_precip

        data = load_netcdf_precip(cfg.data)
    else:
        data = load_csv(cfg.data)
    x, y = data[:, :-1], data[:, -1]
    meanx, stdx = x.mean(0), x.std(0, ddof=1)
    x = (x - meanx) / stdx
    meany, stdy = y.mean(), y.std(ddof=1)
    y = (y - meany) / stdy

    rng = np.random.default_rng(cfg.seed)
    split = censored_split if cfg.test_type == "censored" else random_split
    x_tr, y_tr, x_te, y_te = split(x, y, rng, frac=1 - cfg.train_percent / 100)
    x_train = jnp.asarray(x_tr, dtype)
    y_train = jnp.asarray(y_tr, dtype)
    x_test = jnp.asarray(x_te, dtype)
    y_test = jnp.asarray(y_te, dtype)
    d = x_train.shape[-1]

    # -- model ----------------------------------------------------------------
    noise = cfg.noise if cfg.noise > 0 else None
    scale = cfg.scale if cfg.scale > 0 else 1.0
    if cfg.model == "DiagonalGibbs":
        prior = LogNormalProcess.create(
            d,
            mean=math.log(cfg.prior_mean),
            outputscale=cfg.prior_scale,
            lengthscale=cfg.prior_ell,
            dtype=dtype,
        )
        if cfg.inference == "sparse":
            z = kmeans_inducing_points(
                jax.random.PRNGKey(BASE_SEED), x_train, cfg.num_inducing
            )
            model = GibbsSparseGP.create(z, prior, noise=noise, outputscale=scale, dtype=dtype)
        else:
            model = GibbsExactGP.create(x_train, prior, noise=noise, outputscale=scale, dtype=dtype)
        mask = model.trainable(train_noise=cfg.noise == 0, train_scale=cfg.scale == 0)
    else:  # stationary SE-ARD baseline
        model = ExactGP.create(
            Scale.create(RBF.create(d, dtype=dtype), dtype=dtype), mean_type="zero", dtype=dtype
        )
        mask = None

    if cfg.resume:
        # the reference writes checkpoints but has no resume path
        # (SURVEY.md §5); here restore is first-class
        from nonstationary_precip_tpu.train.checkpoint import restore_pytree

        model = restore_pytree(Path(cfg.resume) / "model", model)
        print(f"resumed model from {cfg.resume}")

    print(param_table(model, mask))
    (logdir / "params.txt").write_text(param_table(model, mask))
    # initial-model checkpoint (the reference's init_model.pt dill dump,
    # precipitation_baselines.py:248)
    from nonstationary_precip_tpu.train.checkpoint import save_pytree

    save_pytree(logdir / "init_model" / "model", model)

    # -- train/observe/checkpoint loop -----------------------------------------
    eval_fn = jax.jit(
        lambda m: m.predictive(x_train, y_train, x_test)
    )
    # metrics ride the same jitted program — eager metric math (incl. the
    # joint-NLPD Cholesky) paid ~28 ms axon dispatch per op at every
    # test_interval (train.vmapped.eval_splits rationale)
    metrics_fn = jax.jit(
        lambda m: (
            lambda p: (
                p,
                rmse_rescaled(p.mean, y_test, stdy),
                rmse_raw(p.mean, y_test),
                nlpd_joint(p, y_test, stdy),
            )
        )(m.predictive(x_train, y_train, x_test))
    )

    state = {"model": model}

    def callback(steps_done, m, losses):
        state["model"] = m
        loss = float(losses[-1])
        scalars = {"objective": loss, "noise": float(m.likelihood.noise)}
        if hasattr(m, "outputscale"):
            scalars["outputscale"] = float(m.outputscale)
        # per-dim kernel lengthscales (reference precipitation_baselines.py:296-304)
        kern = getattr(m, "kernel", None)
        base = getattr(kern, "base", None)
        if base is not None and hasattr(base, "lengthscale"):
            for i, v in enumerate(np.asarray(base.lengthscale).ravel()):
                scalars[f"lengthscale_{i}"] = float(v)
        if steps_done % cfg.test_interval == 0 or steps_done >= cfg.max_iters:
            _, r, rr, nl = metrics_fn(m)
            scalars["rmse"] = float(r)
            scalars["rmse_raw"] = float(rr)
            scalars["nlpd"] = float(nl)
            ckpt.update(steps_done, m, objective=loss, rmse=scalars["rmse"], nlpd=scalars["nlpd"])
        if cfg.plot_interval and (
            steps_done % cfg.plot_interval == 0 or steps_done >= cfg.max_iters
        ):
            # mean/σ (+ lengthscale) field figures to TensorBoard
            # (reference precipitation_baselines.py:342-377)
            try:
                from nonstationary_precip_tpu.utils.plotting import simple_plot

                pred = eval_fn(m)
                lon = np.asarray(x_te)[:, 0] * stdx[0] + meanx[0]
                lat = np.asarray(x_te)[:, 1] * stdx[1] + meanx[1]
                logger.figure(steps_done, "pred_mean", simple_plot(lon, lat, np.asarray(pred.mean), "mean"))
                logger.figure(steps_done, "pred_std", simple_plot(lon, lat, np.sqrt(np.asarray(pred.var)), "std"))
                if hasattr(m, "lengthscale_field"):
                    ell = np.asarray(m.lengthscale_field(x_train, x_test))
                    logger.figure(steps_done, "lengthscale_0", simple_plot(lon, lat, ell[:, 0], "ell0"))
            except Exception:
                pass
        logger.scalars(steps_done, **scalars)

    res = fit(
        model,
        lambda m, xx, yy: m.loss(xx, yy),
        x_train,
        y_train,
        lr=cfg.lr,
        num_steps=cfg.max_iters,
        mask=mask,
        threshold=cfg.threshold,
        chunk=cfg.log_interval,
        callback=callback,
    )
    ckpt.save_final(res.steps, res.model)

    # reuse the already-compiled metrics program: the eager path would pay
    # the ~28 ms axon dispatch per metric op AND duplicate the predictive
    # solve eval_fn/metrics_fn already perform
    _, r, _, nl = metrics_fn(res.model)
    r, nl = float(r), float(nl)
    print(f"final: steps {res.steps}  loss {float(res.losses[-1]):.4f}  RMSE {r:.4f}  NLPD {nl:.4f}")
    logger.close()
    return r, nl


if __name__ == "__main__":
    main()
