#!/usr/bin/env python3
"""Deep GP (DSVI) spatial benchmark over 10 shuffled splits.

TPU-native counterpart of /root/reference/experiments/deepgp_spatial_bench.py:
uib_spatial.csv → whitening (or Box-Cox) → DeepGP (default 2 distinct
hidden layers; ``--model shared`` ties them like the reference's
dgps.py:88 quirk) → 400 epochs × batch 315 × 3 likelihood samples, Adam
lr 0.01 → RMSE/NLPD aggregated mean ± stderr.

Metric semantics match the reference: RMSE over the S-sample-expanded
predictive means (deepgp_spatial_bench.py:113 broadcasts (S, N) − (N));
NLPD is the mean per-point Gaussian log density under the S-mixture.

Run: python -m nonstationary_precip_tpu.experiments.deepgp_spatial
"""

from __future__ import annotations

import numpy as np

from nonstationary_precip_tpu.data.dataprep import (
    box_cox_transform,
    load_csv,
    sklearn_style_shuffle,
    train_test_split,
    whitening_transform,
)
from nonstationary_precip_tpu.models import DeepGP
from nonstationary_precip_tpu.train import rmse_rescaled
from nonstationary_precip_tpu.train.optim import fit_minibatched
from nonstationary_precip_tpu.train.config import ExperimentConfig
from nonstationary_precip_tpu.utils.config import BASE_SEED, DATASET_DIR


def prep_split(data, random_state: int, cfg: ExperimentConfig):
    """Host-side per-split prep: shuffle/whiten/split (numpy), model init,
    per-phase PRNG keys.  Shapes are identical across splits, so the K
    prepped splits batch into one training and one eval program."""
    import jax
    import jax.numpy as jnp

    dtype = jnp.float32
    shuffled = sklearn_style_shuffle(data, random_state)
    if cfg.model == "boxcox":
        bc = box_cox_transform(shuffled)
        x_tr, y_tr, stdy = bc.x, bc.y, 1.0
    else:
        w = whitening_transform(shuffled)
        x_tr, y_tr, stdy = w.x, w.y, w.stdy
    train_x, train_y, test_x, test_y = train_test_split(x_tr, y_tr, cfg.train_percent / 100)
    train_x = jnp.asarray(train_x, dtype)
    train_y = jnp.asarray(train_y, dtype)
    test_x = jnp.asarray(test_x, dtype)
    test_y = jnp.asarray(test_y, dtype)

    key = jax.random.PRNGKey(BASE_SEED + random_state)
    k_init, k_train, k_pred = jax.random.split(key, 3)
    model = DeepGP.create(
        k_init,
        input_dims=train_x.shape[-1],
        num_layers=cfg.num_layers,
        num_inducing=cfg.num_inducing,
        # --model shared ties the hidden layers (the reference's dgps.py:88
        # layer-aliasing quirk); anything else trains distinct layers
        share_hidden=cfg.model == "shared",
    )
    return model, (train_x, train_y, test_x, test_y), jnp.asarray(stdy, dtype), k_train, k_pred


def run_one_split(data, random_state: int, cfg: ExperimentConfig):
    """Sequential single-split fit — the parity oracle for the batched
    ``main`` path (tests/test_dgp.py) and ad-hoc single-split runs."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    model, (train_x, train_y, test_x, test_y), stdy, k_train, k_pred = prep_split(
        data, random_state, cfg
    )
    n = train_x.shape[0]

    def loss_fn(m, kk, xb, yb):
        return m.loss(kk, xb, yb, num_data=n, num_samples=cfg.num_samples)

    res = fit_minibatched(
        model,
        loss_fn,
        train_x,
        train_y,
        key=k_train,
        num_epochs=cfg.num_epochs,
        batch_size=cfg.batch_size,
        lr=cfg.lr,
        seed=random_state,
        aot_key="deepgp_spatial",
    )

    # predict + metrics as ONE jitted program (compiled once, reused by
    # every split — the eager version paid ~28 ms axon dispatch per op)
    r, nl = _predict_metrics(res.model, k_pred, test_x, test_y, stdy)
    return float(r), float(nl), res


def _metrics_fn(m, kp, xte, yte, sy):
    """RMSE/NLPD with the reference's metric semantics
    (deepgp_spatial_bench.py:113: RMSE over (S, N) sample-expanded means;
    NLPD as the mean per-point Gaussian density over the S mixture)."""
    import math

    import jax.numpy as jnp

    dist, means, variances = m.predict(kp, xte, num_samples=10)
    r = rmse_rescaled(means, yte[None, :], sy)
    lpd = -0.5 * (
        (yte[None, :] - means) ** 2 / variances
        + jnp.log(2 * math.pi * variances)
    )
    nl = -(jnp.mean(lpd)) + jnp.log(sy)
    return r, nl


def _predict_metrics(model, k_pred, test_x, test_y, stdy):
    import jax

    # jax.jit caches on the callable identity — keep ONE jitted wrapper on
    # the function object so every split reuses the compiled program
    if not hasattr(_predict_metrics, "_jitted"):
        _predict_metrics._jitted = jax.jit(_metrics_fn)
    return jax.block_until_ready(
        _predict_metrics._jitted(model, k_pred, test_x, test_y, stdy)
    )


def main(argv=None):
    cfg = ExperimentConfig(
        model="whitening",
        lr=0.01,
        num_epochs=400,
        num_samples=3,
        num_layers=2,
        batch_size=315,
        num_inducing=250,
    ).parse_args(argv)
    data = load_csv(DATASET_DIR / "uib_spatial.csv")

    import jax
    import jax.numpy as jnp

    from nonstationary_precip_tpu.train.optim import fit_minibatched_splits

    # all K splits prepped host-side (identical shapes), then trained in
    # lockstep as ONE compiled scan and evaluated as ONE batched program —
    # the sequential per-split loop paid pin-load/lower/dispatch overhead
    # ~10× around ~0.25 s of real DSVI compute each
    preps = [prep_split(data, rs, cfg) for rs in range(cfg.num_splits)]
    models = [p[0] for p in preps]
    xs = [p[1][0] for p in preps]
    ys = [p[1][1] for p in preps]
    n = xs[0].shape[0]

    def loss_fn(m, kk, xb, yb):
        return m.loss(kk, xb, yb, num_data=n, num_samples=cfg.num_samples)

    res = fit_minibatched_splits(
        models,
        loss_fn,
        xs,
        ys,
        keys=[p[3] for p in preps],
        num_epochs=cfg.num_epochs,
        batch_size=cfg.batch_size,
        lr=cfg.lr,
        seeds=list(range(cfg.num_splits)),
        aot_key="deepgp_spatial",
    )

    # batched predict+metrics: one program over all K trained models
    from nonstationary_precip_tpu.train.vmapped import Stacked, eval_splits

    rmses_a, nlpds_a = eval_splits(
        res.model,
        _metrics_fn,
        [p[4] for p in preps],                      # k_pred
        Stacked(jnp.stack([p[1][2] for p in preps])),  # test_x
        Stacked(jnp.stack([p[1][3] for p in preps])),  # test_y
        Stacked(jnp.stack([p[2] for p in preps])),     # stdy
        aot_key="deepgp_spatial",
    )
    last = np.asarray(res.losses[-1])
    rmses, nlpds = [], []
    for rs in range(cfg.num_splits):
        r, nl = float(rmses_a[rs]), float(nlpds_a[rs])
        print(f"split {rs}: final loss {last[rs]:.4f}  RMSE {r:.4f}  NLPD {nl:.4f}")
        rmses.append(r)
        nlpds.append(nl)

    k = len(rmses)
    print(f"{np.mean(rmses):.4f} ± {np.std(rmses)/np.sqrt(k):.4f}")
    print(f"{np.mean(nlpds):.4f} ± {np.std(nlpds)/np.sqrt(k):.4f}")
    return np.mean(rmses), np.mean(nlpds)


if __name__ == "__main__":
    main()
