#!/usr/bin/env python3
"""SE-ARD exact GP spatial baseline over 10 shuffled splits.

TPU-native counterpart of
/root/reference/experiments/seard_spatial_benchmark.py: uib_spatial.csv →
whitening (or Box-Cox) → Scale(RBF-ARD-2) exact GP, Adam lr 0.01 × 400 per
split, RMSE (std-rescaled) + joint NLPD aggregated as mean ± stderr.

Run: python -m nonstationary_precip_tpu.experiments.seard_spatial
"""

from __future__ import annotations

import numpy as np

from nonstationary_precip_tpu.data.dataprep import (
    load_csv,
    sklearn_style_shuffle,
    whitening_transform,
    box_cox_transform,
    train_test_split,
)
from nonstationary_precip_tpu.kernels import RBF, Scale
from nonstationary_precip_tpu.models import ExactGP
from nonstationary_precip_tpu.train import nlpd_joint, rmse_rescaled
from nonstationary_precip_tpu.train.config import ExperimentConfig
from nonstationary_precip_tpu.utils.config import DATASET_DIR


def make_split(data: np.ndarray, random_state: int, cfg: ExperimentConfig, dtype):
    shuffled = sklearn_style_shuffle(data, random_state)
    if cfg.model == "boxcox":
        bc = box_cox_transform(shuffled)
        x_tr, y_tr, stdy = bc.x, bc.y, 1.0
    else:
        w = whitening_transform(shuffled)
        x_tr, y_tr, stdy = w.x, w.y, w.stdy
    train_x, train_y, test_x, test_y = train_test_split(x_tr, y_tr, cfg.train_percent / 100)
    model = ExactGP.create(
        Scale.create(RBF.create(2, dtype=dtype), dtype=dtype),
        mean_type="constant",
        dtype=dtype,
    )
    return model, (train_x, train_y), (test_x, test_y, stdy)


def main(argv=None):
    import jax.numpy as jnp

    from nonstationary_precip_tpu.train.vmapped import fit_splits

    cfg = ExperimentConfig(model="whitening", lr=0.01, max_iters=400).parse_args(argv)
    data = load_csv(DATASET_DIR / "uib_spatial.csv")
    dtype = jnp.float32

    splits = [make_split(data, rs, cfg, dtype) for rs in range(cfg.num_splits)]
    models = [s[0] for s in splits]
    args_per_split = tuple(zip(*[s[1] for s in splits]))

    # identical shapes across splits → one batched training program
    # aot_key pins the compiled fit executable to disk: this row is the
    # one the axon compile service pathologically fresh-compiles per
    # process (8.8-881 s measured) — loading the pinned executable
    # bypasses the service entirely (train/aot_cache.py)
    res = fit_splits(
        models,
        lambda m, xx, yy: m.loss(xx, yy),
        *args_per_split,
        lr=cfg.lr,
        num_steps=cfg.max_iters,
        aot_key="seard10",
    )
    # one jitted vmapped evaluation over all splits (eager per-split
    # predicts paid ~28 ms axon dispatch per op; train.vmapped.eval_splits)
    from nonstationary_precip_tpu.train.vmapped import eval_splits

    def to_f(a):
        return jnp.asarray(a, dtype)

    eval_args = tuple(
        zip(
            *[
                (
                    to_f(splits[rs][1][0]),
                    to_f(splits[rs][1][1]),
                    to_f(splits[rs][2][0]),
                    to_f(splits[rs][2][1]),
                    jnp.asarray(splits[rs][2][2], dtype),
                )
                for rs in range(cfg.num_splits)
            ]
        )
    )

    def eval_one(m, xtr, ytr, xte, yte, stdy_s):
        pred = m.predictive(xtr, ytr, xte)
        return (
            rmse_rescaled(pred.mean, yte, stdy_s),
            nlpd_joint(pred, yte, stdy_s),
        )

    rmses_a, nlpds_a = eval_splits(res.model, eval_one, *eval_args, aot_key="seard10")
    rmses, nlpds = [], []
    for rs in range(cfg.num_splits):
        r, n = float(rmses_a[rs]), float(nlpds_a[rs])
        print(f"split {rs}: RMSE {r:.4f}  NLPD {n:.4f}")
        rmses.append(r)
        nlpds.append(n)

    k = len(rmses)
    print(f"RMSE: {np.mean(rmses):.4f} ± {np.std(rmses) / np.sqrt(k):.4f}")
    print(f"NLPD: {np.mean(nlpds):.4f} ± {np.std(nlpds) / np.sqrt(k):.4f}")
    return np.mean(rmses), np.mean(nlpds)


if __name__ == "__main__":
    main()
