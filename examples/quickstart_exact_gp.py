#!/usr/bin/env python3
"""Quickstart 1/4 — exact GP regression in ~20 lines.

Synthetic 1-D data → ``ExactGP`` with a Scale(RBF) kernel → Adam MLL fit
as ONE compiled ``lax.scan`` → posterior predictions.  This is the
framework's counterpart of the reference's ``ExactGPModel`` workflow
(/root/reference/models/dgps.py:113-122 + any of its experiment loops).

Run: python examples/quickstart_exact_gp.py   (CPU-friendly, a few seconds)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main(num_steps=300):
    import jax
    import jax.numpy as jnp

    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models import ExactGP
    from nonstationary_precip_tpu.train import fit, nlpd_joint, rmse_rescaled

    # --- data: noisy sine, last 20% held out -------------------------------
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 6.0, 200)[:, None]
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(200)
    xtr, ytr = jnp.asarray(x[:160], jnp.float32), jnp.asarray(y[:160], jnp.float32)
    xte, yte = jnp.asarray(x[160:], jnp.float32), jnp.asarray(y[160:], jnp.float32)

    # --- model: pytree dataclass; params ARE the array fields --------------
    model = ExactGP.create(Scale.create(RBF.create(1)), mean_type="constant")

    # --- train: whole Adam loop is one jit-compiled scan --------------------
    res = fit(model, lambda m, xx, yy: m.loss(xx, yy), xtr, ytr, lr=0.05, num_steps=num_steps)
    print(f"final -MLL/N: {float(res.losses[-1]):.4f}  ({res.steps} steps)")

    # --- predict: one jitted program for posterior + metrics ----------------
    post, r, nl = jax.jit(
        lambda m: (
            lambda p: (p, rmse_rescaled(p.mean, yte, 1.0), nlpd_joint(p, yte, 1.0))
        )(m.predictive(xtr, ytr, xte))
    )(res.model)
    print(f"extrapolation RMSE: {float(r):.4f}   NLPD: {float(nl):.4f}")
    if num_steps >= 300:
        assert float(r) < 0.5, "quickstart sanity bound"
    print("ok")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
