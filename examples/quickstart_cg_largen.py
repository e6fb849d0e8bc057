#!/usr/bin/env python3
"""Quickstart 5 — large-N exact GP with the iterative BBMM/CG solver.

At N ≲ 6k a single blocked Cholesky on the MXU is the fastest exact-GP
MLL on TPU (the framework's default).  Past that, materialised
factorisations stop paying and GPyTorch's regime — modified
batched conjugate gradients + stochastic Lanczos quadrature for the
logdet (the settings the reference trains under via
``gpytorch.settings.max_cg_iterations``,
/root/reference/experiments/spatial_exp.py:199) — takes over.  This
demo runs that path end to end on synthetic data:

  1. value parity: ``mll(solver='cg')`` vs the exact Cholesky MLL,
  2. training: Adam on the CG objective as one compiled ``lax.scan``
     (gradients flow through the custom-VJP trace identity — no
     differentiation through the CG iterations themselves),
  3. prediction quality after the fit.

A fixed probe key across steps gives common random numbers — the SLQ
noise is frozen into the objective, so the optimiser sees a smooth
surface.  ``precond_rank`` enables the pivoted-Cholesky/Woodbury
preconditioner (rank-R, Harbrecht et al. 2012 as in GPyTorch).

Run: python examples/quickstart_cg_largen.py   (CPU-friendly, ~a minute)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main(n=2000, num_steps=60):
    import jax
    import jax.numpy as jnp

    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models import ExactGP
    from nonstationary_precip_tpu.train import fit, rmse_rescaled

    # --- data: noisy 2-D bumps, random 80/20 split -------------------------
    rng = np.random.default_rng(7)
    x = rng.uniform(-3.0, 3.0, size=(n, 2))
    f = np.sin(2.0 * x[:, 0]) * np.cos(x[:, 1]) + 0.5 * x[:, 1]
    y = f + 0.15 * rng.normal(size=n)
    perm = rng.permutation(n)
    tr, te = perm[: int(0.8 * n)], perm[int(0.8 * n) :]
    x_tr = jnp.asarray(x[tr], jnp.float32)
    y_tr = jnp.asarray(y[tr], jnp.float32)
    x_te = jnp.asarray(x[te], jnp.float32)
    y_te = jnp.asarray(y[te], jnp.float32)

    model = ExactGP.create(Scale.create(RBF.create(2)), noise=0.1)
    key = jax.random.PRNGKey(0)

    # --- 1. the stochastic CG objective sits on top of the exact one -------
    mll_cg = float(
        model.mll(
            x_tr, y_tr, solver="cg", key=key, num_probes=16,
            max_iters=200, precond_rank=15,
        )
    )
    mll_chol = float(model.mll(x_tr, y_tr))
    print(f"MLL  cholesky {mll_chol:+.4f}   cg/SLQ {mll_cg:+.4f}   "
          f"|Δ| {abs(mll_cg - mll_chol):.4f}  (SLQ probe noise)")

    # --- 2. train ON the CG objective (same fit() as every other model) ----
    def loss_cg(m, xx, yy):
        return m.loss(
            xx, yy, solver="cg", key=key, num_probes=8,
            max_iters=150, precond_rank=15,
        )

    result = fit(model, loss_cg, x_tr, y_tr, lr=0.05, num_steps=num_steps)
    model = result.model
    print(f"trained {num_steps} steps on the CG objective: "
          f"loss {float(result.losses[0]):.4f} -> {float(result.losses[-1]):.4f}")

    # --- 3. predict on the CG path too (deterministic: no probes — one
    #        batched solve K⁻¹[resid, K_x*] with every RHS in one scan) ----
    pred = model.predictive(
        x_tr, y_tr, x_te, solver="cg", max_iters=300, precond_rank=15
    )
    pred_chol = model.predictive(x_tr, y_tr, x_te)
    dmean = float(jnp.max(jnp.abs(pred.mean - pred_chol.mean)))
    rmse = float(rmse_rescaled(pred.mean, y_te, jnp.std(y_te)))
    print(f"test RMSE {rmse:.3f} (σ units)   CG vs Cholesky predict "
          f"max|Δmean| {dmean:.1e}")
    assert np.isfinite(rmse)
    assert dmean < 1e-2
    if num_steps >= 60:
        assert rmse < 0.6, "quickstart sanity bound"
    print("ok")
    return rmse


if __name__ == "__main__":
    main()
