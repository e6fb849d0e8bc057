#!/usr/bin/env python3
"""Regenerate TPU-framework counterparts of EVERY figure the reference
ships in its results/ directory (11 PNGs, /root/reference/results/):

  spatial_gt.png                 ground-truth Jan precip field
  spatial_gibbs.png              Gibbs nonstationary predicted field
  spatial_dgp.png                DGP2 predicted field
  spatial_se_ard.png             SE-ARD predicted field (mean)
  spatial_se_ard_sigma.png       SE-ARD predictive sigma
  ls1.png / ls2.png              lengthscale-process fields (dims 0/1)
  spatio_temporal_gt.png         5-month ground-truth facets
  spatio_temporal_baseline.png   5-month stationary-baseline facets
  temporal_model.png             temporal fit over the full series
  temporal_model_extrapolation.png  contiguous-split extrapolation view

Field figures come from the benchmark CSVs already regenerated in
results/ (no device work); the SE-ARD and temporal figures retrain their
tiny models on CPU (seconds).  Run:
    python tools/regenerate_figures.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

RESULTS = Path(__file__).resolve().parent.parent / "results"


def spatial_fields():
    from nonstationary_precip_tpu.data.datasets import load_uib_spatial
    from nonstationary_precip_tpu.utils.plotting import simple_plot

    _, x, y = load_uib_spatial()
    simple_plot(x[:, 0], x[:, 1], y, title="Ground truth (mm/day)",
                savepath=RESULTS / "spatial_gt.png")

    gdf = pd.read_csv(RESULTS / "gibbs_spatial_f_mean_sigma.csv")
    simple_plot(gdf["lon"], gdf["lat"], gdf["pred"],
                title="Gibbs nonstationary GP mean (standardised)",
                savepath=RESULTS / "spatial_gibbs.png")
    # lengthscale-process fields, both dims (reference ls1/ls2)
    simple_plot(gdf["lon"], gdf["lat"], gdf["ell0"],
                title="Lengthscale process (dim 0)",
                savepath=RESULTS / "ls1.png")
    simple_plot(gdf["lon"], gdf["lat"], gdf["ell1"],
                title="Lengthscale process (dim 1)",
                savepath=RESULTS / "ls2.png")

    ddf = pd.read_csv(RESULTS / "f_mean_sigma_dgp2_tpu.csv")
    simple_plot(ddf["lon"], ddf["lat"], ddf["pred"],
                title="DGP2 mean (mm/day)",
                savepath=RESULTS / "spatial_dgp.png")
    print("spatial field figures written", flush=True)


def se_ard_fields(max_iters=400):
    """Full-data SE-ARD fit → posterior mean/sigma over the basin
    (reference spatial_se_ard[_sigma].png)."""
    import jax.numpy as jnp

    from nonstationary_precip_tpu.data.datasets import load_uib_spatial
    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models import ExactGP
    from nonstationary_precip_tpu.train import fit
    from nonstationary_precip_tpu.utils.plotting import simple_plot

    _, x, y = load_uib_spatial()
    meanx, stdx = x.mean(0), x.std(0, ddof=1)
    meany, stdy = y.mean(), y.std(ddof=1)
    xn = jnp.asarray((x - meanx) / stdx, jnp.float32)
    yn = jnp.asarray((y - meany) / stdy, jnp.float32)

    model = ExactGP.create(Scale.create(RBF.create(2)), mean_type="constant")
    res = fit(model, lambda m, xx, yy: m.loss(xx, yy), xn, yn,
              lr=0.01, num_steps=max_iters)
    post = jax.jit(lambda m: m.predictive(xn, yn, xn))(res.model)
    mean_raw = np.asarray(post.mean) * stdy + meany
    sigma_raw = np.sqrt(np.asarray(post.var)) * stdy
    simple_plot(x[:, 0], x[:, 1], mean_raw, title="SE-ARD mean (mm/day)",
                savepath=RESULTS / "spatial_se_ard.png")
    simple_plot(x[:, 0], x[:, 1], sigma_raw, title="SE-ARD sigma (mm/day)",
                savepath=RESULTS / "spatial_se_ard_sigma.png")
    print("SE-ARD figures written", flush=True)


def spatio_temporal_facets():
    from nonstationary_precip_tpu.data.datasets import load_uib_spatio_temporal
    from nonstationary_precip_tpu.utils.plotting import facetgrid_plot

    df, xst, yst = load_uib_spatio_temporal()
    months = np.unique(xst[:, 0])[:5]
    gt, lon, lat = [], None, None
    for mo in months:
        sel = xst[:, 0] == mo
        lon, lat = xst[sel, 1], xst[sel, 2]
        gt.append(yst[sel])
    facetgrid_plot(lon, lat, gt, suptitle="Ground truth (mm/day)",
                   savepath=RESULTS / "spatio_temporal_gt.png")

    sdf = pd.read_csv(RESULTS / "st_stationary_means_sigmas.csv")
    smonths = np.unique(sdf["time"])[:5]
    preds, slon, slat = [], None, None
    for mo in smonths:
        sel = sdf["time"] == mo
        slon, slat = sdf["lon"][sel], sdf["lat"][sel]
        preds.append(sdf["pred"][sel])
    vmax = float(np.max([np.max(p) for p in preds]))
    facetgrid_plot(slon, slat, preds, suptitle="Stationary baseline mean",
                   vmin=None, vmax=vmax,
                   savepath=RESULTS / "spatio_temporal_baseline.png")
    print("spatio-temporal facet figures written", flush=True)


def temporal_figures(max_iters=2000):
    """Temporal fit + extrapolation line plots (reference
    temporal_model[_extrapolation].png)."""
    import jax.numpy as jnp
    import scipy.stats
    from scipy.special import inv_boxcox

    from nonstationary_precip_tpu.data.datasets import load_khyber_time_series
    from nonstationary_precip_tpu.data.dataprep import train_test_split
    from nonstationary_precip_tpu.experiments.temporal import make_temporal_kernel
    from nonstationary_precip_tpu.models import ExactGP
    from nonstationary_precip_tpu.train import fit
    from nonstationary_precip_tpu.utils.plotting import temporal_series_plot

    t, tp = load_khyber_time_series()
    meanx, stdx = t.mean(), t.std(ddof=1)
    x_norm = ((t - meanx) / stdx)[:, None]
    y_tr, lmbda = scipy.stats.boxcox(tp)
    train_x, train_y, test_x, test_y = train_test_split(x_norm, y_tr, 0.8)
    n_train = len(train_y)

    model = ExactGP.create(make_temporal_kernel(jnp.float32), mean_type="constant")
    res = fit(model, lambda m, xx, yy: m.loss(xx, yy),
              jnp.asarray(train_x, jnp.float32), jnp.asarray(train_y, jnp.float32),
              lr=0.01, num_steps=max_iters)

    full = jax.jit(lambda m: m.predictive(
        jnp.asarray(train_x, jnp.float32), jnp.asarray(train_y, jnp.float32),
        jnp.asarray(x_norm, jnp.float32)
    ))(res.model)
    f_mean = inv_boxcox(np.asarray(full.mean), lmbda)
    # delta-method sigma in raw space
    grad = np.maximum(np.asarray(full.mean) * lmbda + 1.0, 1e-6) ** (1.0 / lmbda - 1.0)
    f_sigma = np.sqrt(np.asarray(full.var)) * np.abs(grad)

    temporal_series_plot(t, tp, f_mean, f_sigma,
                         title="Temporal Kernel",
                         savepath=RESULTS / "temporal_model.png")
    temporal_series_plot(t, tp, f_mean, f_sigma, test_start=n_train,
                         test_mean=f_mean[n_train:],
                         title="Temporal Kernel (extrapolation)",
                         savepath=RESULTS / "temporal_model_extrapolation.png")
    print("temporal figures written", flush=True)


def main():
    RESULTS.mkdir(exist_ok=True)
    spatial_fields()
    spatio_temporal_facets()
    se_ard_fields()
    temporal_figures()
    print("all reference-counterpart figures regenerated", flush=True)


if __name__ == "__main__":
    main()
