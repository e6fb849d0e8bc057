#!/usr/bin/env python3
"""Nonstationary Gibbs spatial GP over 10 random splits (UIB basin).

TPU-native counterpart of /root/reference/experiments/spatial_exp.py:
uib_spatial.csv → standardise → per-split 80/20 shuffle (seeded
BASE_SEED + i) → frozen LogNormal lengthscale-process prior (scale 1,
ℓ 1.3, mean log 0.3) → GibbsExactGP (noise fixed 0.011, outputscale fixed
0.644) or GibbsSparseGP (kmeans-initialised inducing points) → Adam × 5000
→ RMSE/NLPD per split, mean ± stderr, optional full-field prediction +
lengthscale map.

Eval note: the reference computes test metrics via ``likelihood(model(x_test))``
(spatial_exp.py:217), which crashes for this model class under GPyTorch's
eval-mode joint forward (the latent field has train-set shape; see
SURVEY.md §7).  We evaluate through the model's own predict path — the
conditional-lengthscale GP conditioning the reference implements at
nonstationary_models.py:45-62 — with observation noise added.

Run: python -m nonstationary_precip_tpu.experiments.spatial_gibbs [--inference sparse]
"""

from __future__ import annotations

import math

import numpy as np

from nonstationary_precip_tpu.data.dataprep import shuffle_split
from nonstationary_precip_tpu.data.datasets import load_uib_spatial
from nonstationary_precip_tpu.models import GibbsExactGP, GibbsSparseGP
from nonstationary_precip_tpu.ops.kmeans import kmeans_inducing_points
from nonstationary_precip_tpu.priors import LogNormalProcess
from nonstationary_precip_tpu.train import nlpd_joint, rmse_rescaled
from nonstationary_precip_tpu.train.config import ExperimentConfig
from nonstationary_precip_tpu.utils.config import BASE_SEED


def build_prior(cfg: ExperimentConfig, dtype):
    """Frozen LogNormal process prior with the CLI-settable hypers
    (spatial_exp.py:157-167)."""
    return LogNormalProcess.create(
        input_dim=2,
        mean=math.log(cfg.prior_mean),
        outputscale=cfg.prior_scale,
        lengthscale=cfg.prior_ell,
        dtype=dtype,
    )


def make_split(x_norm, y_norm, split: int, cfg: ExperimentConfig, dtype):
    """Per-split model/mask/training-args (identical shapes across splits,
    so the K splits vmap into one batched training run)."""
    import jax
    import jax.numpy as jnp

    # the shared split harness (same default_rng(seed) + ceil convention),
    # so split membership can never desynchronise from the other benchmarks
    x_tr, y_tr, x_te, y_te = shuffle_split(
        x_norm, y_norm, cfg.train_percent / 100, BASE_SEED + split
    )
    x_train = jnp.asarray(x_tr, dtype)
    y_train = jnp.asarray(y_tr, dtype)
    x_test = jnp.asarray(x_te, dtype)
    y_test = jnp.asarray(y_te, dtype)

    prior = build_prior(cfg, dtype)
    noise = cfg.noise if cfg.noise > 0 else None
    scale = cfg.scale if cfg.scale > 0 else 1.0

    if cfg.inference == "sparse":
        z = kmeans_inducing_points(
            jax.random.PRNGKey(BASE_SEED + split), x_train, cfg.num_inducing
        )
        model = GibbsSparseGP.create(z, prior, noise=noise, outputscale=scale, dtype=dtype)
        args = (x_train, y_train)
    else:
        model = GibbsExactGP.create(x_train, prior, noise=noise, outputscale=scale, dtype=dtype)
        # the frozen prior's Gram algebra is loop-invariant; the hoisted
        # INVERSE + logdet (gram_pre) is computed in main() as ONE vmapped
        # jitted program over all K splits (not here: eager per-split
        # gram_pre pays ~6 axon dispatches × K splits)
        args = (x_train, y_train)
    mask = model.trainable(train_noise=cfg.noise == 0, train_scale=cfg.scale == 0)
    return model, mask, args, (x_train, y_train, x_test, y_test)


def main(argv=None):
    import jax.numpy as jnp

    from nonstationary_precip_tpu.train.vmapped import fit_splits, unstack_pytree

    cfg = ExperimentConfig(lr=0.01, max_iters=5000).parse_args(argv)
    dtype = jnp.float32

    _, x, y = load_uib_spatial()
    meanx, stdx = x.mean(0), x.std(0, ddof=1)
    x_norm = (x - meanx) / stdx
    meany, stdy = y.mean(), y.std(ddof=1)
    y_norm = (y - meany) / stdy

    splits = [make_split(x_norm, y_norm, s, cfg, dtype) for s in range(cfg.num_splits)]
    models = [s[0] for s in splits]
    masks = [s[1] for s in splits]
    args_per_split = tuple(zip(*[s[2] for s in splits]))

    if cfg.inference == "sparse":
        loss_fn = lambda m, xx, yy: m.loss(xx, yy)  # noqa: E731 — z trains, no hoist
        batched_loss = None
    else:
        loss_fn = lambda m, xx, yy, pc: m.loss(xx, yy, pc)  # noqa: E731
        # frozen-prior (K⁻¹, logdet) hoist for ALL splits as ONE vmapped
        # jitted program (the prior is identical across splits; only
        # x_train varies) — pre-stacked, so fit_splits skips restacking
        import jax

        from nonstationary_precip_tpu.train.vmapped import Stacked

        prior = build_prior(cfg, dtype)
        xs_stacked = jnp.stack(list(args_per_split[0]))
        # pinned executable: the axon compile service's persistent cache
        # refuses this program (fresh 60-500 s compile EVERY process,
        # measured via tools/probe_gibbs_phases.py while fit/eval pins
        # loaded fine) — same pathology as the seard row, same fix
        from nonstationary_precip_tpu.train.aot_cache import cached_compile

        pre = cached_compile(
            "gibbs_grampre", jax.jit(jax.vmap(prior.gram_pre)), xs_stacked
        )(xs_stacked)
        args_per_split = (args_per_split[0], args_per_split[1], Stacked(pre))
        # hand-batched MAP loss: one 3-level Pallas (chol, inv) launch for
        # all K splits, alpha + MLL pullback as batched GEMMs against the
        # exported L⁻¹ (falls back to vmap(loss) off-TPU)
        from nonstationary_precip_tpu.models.gibbs_gp import gibbs_map_loss_batched

        batched_loss = gibbs_map_loss_batched

    # all splits train simultaneously as one batched program; chunk=500
    # keys the compiled scan to a fixed length so changing --max_iters
    # never triggers a fresh 3-20 min axon compile (the chunk boundary
    # costs one ~30 ms dispatch per 500 steps)
    res = fit_splits(
        models,
        loss_fn,
        *args_per_split,
        lr=cfg.lr,
        num_steps=cfg.max_iters,
        masks=masks,
        chunk=min(500, cfg.max_iters),
        aot_key=f"gibbs_{cfg.inference}",
        batched_loss=batched_loss,
    )
    trained = unstack_pytree(res.model, cfg.num_splits)

    # evaluation is ONE batched jitted program over all K splits (shapes
    # are identical across splits) — see train.vmapped.eval_splits
    import jax

    from nonstationary_precip_tpu.train.vmapped import eval_splits

    eval_stack = [splits[s][3] for s in range(cfg.num_splits)]

    def eval_one(m, xtr, ytr, xte, yte):
        pred = m.predictive(xtr, ytr, xte)
        return rmse_rescaled(pred.mean, yte, stdy), nlpd_joint(pred, yte, stdy)

    rmses_a, nlpds_a = eval_splits(
        res.model, eval_one, *tuple(zip(*eval_stack)),
        aot_key=f"gibbs_{cfg.inference}",
    )
    rmses, nlpds = [], []
    for split in range(cfg.num_splits):
        r, nl = float(rmses_a[split]), float(nlpds_a[split])
        print(f"split {split}: RMSE {r:.4f}  NLPD {nl:.4f}")
        rmses.append(r)
        nlpds.append(nl)
    last = (trained[-1], eval_stack[-1][0], eval_stack[-1][1])

    k = len(rmses)
    print(f"Final RMSE across splits: {np.mean(rmses):.4f} ± {np.std(rmses)/np.sqrt(k):.4f}")
    print(f"Final NLPD across splits: {np.mean(nlpds):.4f} ± {np.std(nlpds)/np.sqrt(k):.4f}")

    # full-field prediction + lengthscale field (spatial_exp.py:243-274);
    # CSV schema matches the reference's results artifacts
    # (results/f_mean_sigma_dgp2.csv: pred/std/lat/lon)
    import pandas as pd

    from nonstationary_precip_tpu.utils.config import RESULTS_DIR

    RESULTS_DIR.mkdir(parents=True, exist_ok=True)
    model, x_train, y_train = last
    x_all = jnp.asarray(x_norm, dtype)
    # single jitted program for the full-field posterior (same eager-
    # dispatch reasoning as eval_all above)
    field_mean, field_var = jax.jit(
        lambda m, xtr, ytr, xa: (lambda p: (p.mean, p.var))(
            m.posterior(xtr, ytr, xa)
        )
    )(model, x_train, y_train, x_all)
    out = pd.DataFrame(
        {
            "pred": np.asarray(field_mean),
            "std": np.sqrt(np.asarray(field_var)),
            "lon": x[:, 0],
            "lat": x[:, 1],
        }
    )
    if cfg.inference == "exact":
        ell_field = np.asarray(
            jax.jit(lambda m, xtr, xa: m.lengthscale_field(xtr, xa))(
                model, x_train, x_all
            )
        )
        out["ell0"] = ell_field[:, 0]
        out["ell1"] = ell_field[:, 1]
        try:
            from nonstationary_precip_tpu.utils.plotting import lengthscale_map

            lengthscale_map(x[:, 0], x[:, 1], ell_field, savepath=RESULTS_DIR / "gibbs_lengthscale_map.png")
        except Exception:
            pass
    out.to_csv(RESULTS_DIR / "gibbs_spatial_f_mean_sigma.csv", index=False)
    return np.mean(rmses), np.mean(nlpds)


if __name__ == "__main__":
    main()
