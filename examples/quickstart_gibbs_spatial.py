#!/usr/bin/env python3
"""Quickstart 2/4 — nonstationary Gibbs GP with a latent lengthscale field.

One 80/20 split of the bundled UIB spatial dataset → ``GibbsExactGP``
(MAP over MLL + LogNormal-process prior on the log-lengthscale field,
the reference's DiagonalExactGP workflow,
/root/reference/experiments/spatial_exp.py:95-239) → posterior metrics +
the learned per-point lengthscale field.

Run: python examples/quickstart_gibbs_spatial.py   (CPU, ~1 min at 300 iters)
"""

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main(max_iters=300):
    import jax
    import jax.numpy as jnp

    from nonstationary_precip_tpu.data.dataprep import load_csv, train_test_split
    from nonstationary_precip_tpu.models import GibbsExactGP
    from nonstationary_precip_tpu.priors import LogNormalProcess
    from nonstationary_precip_tpu.train import fit, nlpd_joint, rmse_rescaled
    from nonstationary_precip_tpu.utils.config import BASE_SEED, DATASET_DIR

    data = load_csv(DATASET_DIR / "uib_spatial.csv")  # lon, lat, tp (394 pts)
    x, y = data[:, :2], data[:, 2]
    x_norm = (x - x.mean(0)) / x.std(0)
    y_norm = (y - y.mean()) / y.std()

    rng = np.random.default_rng(BASE_SEED)
    idx = rng.permutation(len(y_norm))
    x_norm, y_norm = x_norm[idx], y_norm[idx]
    train_x, train_y, test_x, test_y = train_test_split(x_norm, y_norm, 0.8)
    train_x, train_y = jnp.asarray(train_x, jnp.float32), jnp.asarray(train_y, jnp.float32)
    test_x, test_y = jnp.asarray(test_x, jnp.float32), jnp.asarray(test_y, jnp.float32)

    # frozen prior over the log-lengthscale field (spatial_exp.py defaults)
    prior = LogNormalProcess.create(
        input_dim=2, mean=math.log(0.3), outputscale=1.0, lengthscale=1.3
    )
    # noise/outputscale frozen at the reference's CLI defaults
    model = GibbsExactGP.create(train_x, prior, noise=0.011, outputscale=0.644)

    res = fit(
        model,
        lambda m, xx, yy: m.loss(xx, yy),
        train_x,
        train_y,
        lr=0.01,
        num_steps=max_iters,
        mask=model.trainable(),  # only the latent log-ell field trains
        log_every=100,
    )

    r, nl = jax.jit(
        lambda m: (
            lambda p: (rmse_rescaled(p.mean, test_y, 1.0), nlpd_joint(p, test_y, 1.0))
        )(m.predictive(train_x, train_y, test_x))
    )(res.model)
    print(f"split RMSE(σ): {float(r):.4f}   NLPD: {float(nl):.4f}")

    # the learned nonstationary lengthscale field at the training points
    ell = res.model.lengthscale_field(train_x)
    print(
        "lengthscale field: shape", tuple(ell.shape),
        " range [%.3f, %.3f]" % (float(ell.min()), float(ell.max())),
    )
    print("ok")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
