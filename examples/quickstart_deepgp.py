#!/usr/bin/env python3
"""Quickstart 3/4 — deep GP trained with DSVI.

One split of the UIB spatial data → 2-layer whitened-SVGP ``DeepGP`` →
epoch-shuffled minibatch Adam on the doubly-stochastic ELBO, the whole
loop one compiled scan (the reference's deepgp_spatial_bench.py:45-139
workflow).

Run: python examples/quickstart_deepgp.py [epochs]  (CPU, ~1 min at 40 epochs)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(num_epochs=40):
    import jax
    import jax.numpy as jnp

    from nonstationary_precip_tpu.data.dataprep import (
        load_csv,
        sklearn_style_shuffle,
        train_test_split,
        whitening_transform,
    )
    from nonstationary_precip_tpu.models import DeepGP
    from nonstationary_precip_tpu.train.metrics import nlpd_marginal, rmse_raw
    from nonstationary_precip_tpu.train.optim import fit_minibatched
    from nonstationary_precip_tpu.utils.config import DATASET_DIR

    data = load_csv(DATASET_DIR / "uib_spatial.csv")
    w = whitening_transform(sklearn_style_shuffle(data, 0))
    train_x, train_y, test_x, test_y = train_test_split(w.x, w.y, 0.8)
    train_x, train_y = jnp.asarray(train_x, jnp.float32), jnp.asarray(train_y, jnp.float32)
    test_x, test_y = jnp.asarray(test_x, jnp.float32), jnp.asarray(test_y, jnp.float32)
    n = train_x.shape[0]

    key = jax.random.PRNGKey(173)
    k_init, k_train, k_pred = jax.random.split(key, 3)
    model = DeepGP.create(k_init, input_dims=2, num_layers=2, num_inducing=64)

    res = fit_minibatched(
        model,
        lambda m, kk, xb, yb: m.loss(kk, xb, yb, num_data=n, num_samples=3),
        train_x,
        train_y,
        key=k_train,
        num_epochs=num_epochs,
        batch_size=158,
        lr=0.01,
    )
    print(f"final ELBO loss: {float(res.losses[-1]):.4f}")

    @jax.jit
    def metrics(m, kk):
        mix = m.predict(kk, test_x, num_samples=10)[0]
        return rmse_raw(mix.mean, test_y), nlpd_marginal(test_y, mix.mean, mix.var)

    r, nl = metrics(res.model, k_pred)
    print(f"RMSE(σ): {float(r):.4f}   NLPD: {float(nl):.4f}")
    print("ok")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
