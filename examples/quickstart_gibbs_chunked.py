#!/usr/bin/env python3
"""Quickstart 11 — training PAST the execution wall: the host-chunked
product path (N ≥ ~512k on a real chip; tiny here so it runs anywhere).

One axon device program executing ≳60–90 s crashes the TPU worker
(DESIGN.md §27), so at N = 524288+ no single program can hold a full CG
budget — the regime where the reference would just raise
``gpytorch.settings.max_cg_iterations`` (reference
experiments/spatial_exp.py:199).  The product surface for that regime:

  * ``models.gibbs_gp.make_chunked_map_loss`` — the SAME MAP estimand as
    ``GibbsExactGP.loss_matrixfree`` (matrix-free MLL + frozen-prior
    term), split into host-driven phases: preconditioner setup, mBCG
    chunks of ``chunk_iters`` iterations (early-stopped), one fused
    panel backward, per-dim prior solves.  No device program exceeds the
    wall; the estimator is the monolithic scan re-entered (bitwise the
    same ops, tests/test_chunked_api.py).
  * ``train.optim.fit_chunked`` — Adam on the host over that loss:
    masks, |Δloss| early stop, nan guard, per-step relres EVIDENCE.
  * ``posterior_state_matrixfree(chunk_iters=...)`` — serving state with
    a host-chunked α solve; mean-only queries then need NO solve at all.

Measured flagship (tools/bench_cg.json): N = 1,048,576 trains at
~338 s/step on one v5e chip with Nyström rank 1024 / shift 10 /
8-iteration chunks — a dense Gram would be 4.4 TB.  The same config via
the CLI:

    python -m nonstationary_precip_tpu serve --model gibbs_exact \
        --matrixfree true --chunked true --precond_rank 1024 \
        --precond nystrom --precond_shift 10 --train_csv big.csv

Run: python examples/quickstart_gibbs_chunked.py   (CPU, ~1 min)
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main(n=384, num_steps=10, block=128, fused=False):
    import jax

    # default to CPU WITHOUT initialising the backend (never share the
    # chip with a running benchmark); NSGP_ON_TPU=1 runs on chip — pass
    # fused=True there for the Pallas matvec + panel-backward path
    if not os.environ.get("NSGP_ON_TPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nonstationary_precip_tpu.models.gibbs_gp import (
        GibbsExactGP,
        make_chunked_map_loss,
    )
    from nonstationary_precip_tpu.priors.lognormal_process import (
        LogNormalProcess,
    )
    from nonstationary_precip_tpu.train.optim import fit_chunked

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    y = jnp.sin(2.0 * x[:, 0] * (1.0 + 0.4 * jnp.tanh(x[:, 1]))) + 0.1 * (
        jnp.asarray(rng.normal(size=n), jnp.float32)
    )
    xs = jnp.asarray(rng.uniform(-3, 3, size=(64, 2)), jnp.float32)

    prior = LogNormalProcess.create(
        2, mean=float(np.log(0.5)), outputscale=1.0, lengthscale=1.5
    )
    model = GibbsExactGP.create(x, prior, noise=0.05, outputscale=1.0)

    # frozen-prior hoist, once per fit (O(N·rank))
    prior_pre = model.prior_pre_matrixfree(
        x, jax.random.PRNGKey(1), rank=min(32, n // 4), block=block,
        max_iters=96, tol=1e-8,
    )

    # the product loss: at a real 1M run use the flagship defaults
    # (rank 1024 nystrom, shift 10, chunk_iters sized to the wall);
    # here everything is tiny so CI exercises the identical code path
    loss = make_chunked_map_loss(
        2, block=block, num_probes=8, chunk_iters=8, n_chunks=4,
        tol=1e-6, precond_rank=min(64, n // 4), precond="pivchol",
        precond_shift=1.0, include_prior=True,
        prior_chunk_iters=16, prior_n_chunks=8, fused_matvec=fused,
    )

    res = fit_chunked(
        model, loss, x, y, prior_pre,
        key=jax.random.PRNGKey(0), num_steps=num_steps, lr=2e-2,
        mask=model.trainable(train_noise=True, train_scale=True),
        log_every=5,
    )
    print(
        f"chunked fit at N={n}: loss {float(res.losses[0]):.4f} -> "
        f"{float(res.losses[-1]):.4f} over {res.steps} steps, "
        f"worst relres {float(jnp.max(res.relres)):.2e}"
    )
    assert np.all(np.isfinite(np.asarray(res.losses)))
    assert float(res.losses[-1]) < float(res.losses[0])
    assert float(jnp.max(res.relres)) < 1e-2  # every step's solves converged
    model = res.model

    # serving state via the host-chunked α solve — the only way to build
    # it past the wall; mean-only queries are then solve-free
    state = model.posterior_state_matrixfree(
        x, y, prior_pre, block=block, tol=1e-8,
        precond_rank=min(64, n // 4), fused_matvec=fused,
        chunk_iters=8, n_chunks=16,
    )
    print(f"state alpha solve relres {float(state[0].alpha_relres):.2e}")
    mean, info = model.posterior_matrixfree_from_state(
        state, xs, mean_only=True, block=block, fused_matvec=fused,
        chunk_iters=8, n_chunks=16, return_info=True,
    )
    rmse = float(jnp.sqrt(jnp.mean((mean - jnp.sin(
        2.0 * xs[:, 0] * (1.0 + 0.4 * jnp.tanh(xs[:, 1]))
    )) ** 2)))
    print(f"mean-only serving over {xs.shape[0]} points: rmse {rmse:.3f} "
          f"(relres evidence {float(info['relres_max']):.2e})")
    assert np.isfinite(rmse) and rmse < 1.0
    print("ok")
    return rmse


if __name__ == "__main__":
    main()
