#!/usr/bin/env python3
"""Quickstart 8 — the FLAGSHIP nonstationary kernel at large N, matrix-free.

``GibbsExactGP`` is the model the reference trains in
``experiments/spatial_exp.py`` (DiagonalExactGP + GibbsKernel + a frozen
LogNormal lengthscale-process prior).  Its per-point lengthscale FIELD
is an (N, d) parameter, so large N is exactly where the nonstationary
story gets interesting — and exactly where dense algebra dies (on a
v5e the dense Cholesky compile-fails at N = 32768 and the Gram OOMs at
65536, tools/bench_cg.json).  ``loss_matrixfree`` trains the SAME MAP
estimand with no N×N residency, data Gram or prior Gram:

  * mBCG solves ride the fused Gram·v Pallas matvec (the row panel
    never exists in HBM, ops/pallas_matvec.py — 2× XLA on this kernel),
  * a rank-150 pivoted-Cholesky/Woodbury preconditioner makes the
    32-iteration budget actually converge (unpreconditioned CG stalls
    at relres ~0.2 for N ≥ 4096 on the trained pose),
  * the frozen prior's machinery is HOISTED once per fit
    (``prior_pre_matrixfree``: per-dim factors + its constant logdet),
  * the data-Gram preconditioner factor can be hoisted too
    (``precond_factor`` → ``precond_lpc=``): the estimator is unbiased
    for ANY fixed SPD P, so a nested scan can refresh it every k steps
    — the stale-preconditioner pattern below.  Measured perf-NEUTRAL at
    rank 150 (the build is noise next to the O(N²) matvecs); shown here
    because it is the natural shape when the factor is also wanted
    outside the step (sharded replication, diagnostics).

Measured on one v5e chip (tools/bench_cg.json): 47.9 ms/step at
N = 16384, 1.35 s/step at 65536, 5.4 s/step at
131072 (Nyström rank-1024 factor, Woodbury shift 10).  This demo runs
the identical code tiny on CPU so it works anywhere; on TPU nothing
changes but the sizes (keep ``fused=True`` there for the Pallas path —
it must be off on CPU, where Mosaic kernels cannot lower).

Run: python examples/quickstart_gibbs_largen.py   (CPU, ~1 min)
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main(n=512, num_steps=12, refresh=4, block=128, fused=False):
    import jax

    # default to CPU WITHOUT initialising the backend (the axon plugin
    # would otherwise claim the TPU — and the chip must never be shared
    # with a running benchmark); set NSGP_ON_TPU=1 to run on chip, and
    # pass fused=True there for the Pallas matvec path
    if not os.environ.get("NSGP_ON_TPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from nonstationary_precip_tpu.models.gibbs_gp import GibbsExactGP
    from nonstationary_precip_tpu.priors.lognormal_process import (
        LogNormalProcess,
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    # amplitude varies across space -> a nonstationary lengthscale pays off
    y = jnp.sin(2.0 * x[:, 0] * (1.0 + 0.4 * jnp.tanh(x[:, 1]))) + 0.1 * (
        jnp.asarray(rng.normal(size=n), jnp.float32)
    )
    xs = jnp.asarray(rng.uniform(-3, 3, size=(96, 2)), jnp.float32)

    prior = LogNormalProcess.create(
        2, mean=float(np.log(0.5)), outputscale=1.0, lengthscale=1.5
    )
    model = GibbsExactGP.create(x, prior, noise=0.05, outputscale=1.0)

    # --- hoists: once per fit, both O(N·rank) ------------------------------
    key = jax.random.PRNGKey(0)
    prior_pre = model.prior_pre_matrixfree(
        x, jax.random.PRNGKey(1), rank=min(32, n // 4), block=block,
        max_iters=96, tol=1e-8,
    )
    rank = min(64, n // 4)

    opt = optax.adam(1e-2)
    mask = model.trainable(train_noise=True, train_scale=True)

    def loss(m, lpc, i):
        return m.loss_matrixfree(
            x, y, jax.random.fold_in(key, i), prior_pre,
            block=block, num_probes=8, max_iters=48, tol=1e-6,
            precond_lpc=lpc, fused_matvec=fused, prior_max_iters=96,
        )

    # --- stale-preconditioner training: nested scan ------------------------
    # outer step = rebuild the (N, rank) factor at the current pose;
    # inner scan = `refresh` Adam steps reusing it.  Unbiased for any
    # fixed SPD P — staleness only moves estimator variance and the CG
    # convergence margin, and the field moves slowly under Adam.
    @jax.jit
    def fit(m):
        st = opt.init(m)

        def inner(carry, i):
            mm, s = carry
            val, g = jax.value_and_grad(loss)(mm[0], mm[1], i)
            g = jax.tree.map(lambda gr, tr: jnp.where(tr, gr, 0.0), g, mask)
            up, s = opt.update(g, s)
            return ((optax.apply_updates(mm[0], up), mm[1]), s), val

        def outer(carry, w):
            mm, s = carry
            lpc = mm.precond_factor(x, rank=rank)
            ((mm, _), s), vals = jax.lax.scan(
                inner, ((mm, lpc), s), w * refresh + jnp.arange(refresh)
            )
            return (mm, s), vals

        (m, _), vals = jax.lax.scan(
            outer, (m, st), jnp.arange(num_steps // refresh)
        )
        return m, vals.reshape(-1)

    model, vals = fit(model)
    print(
        f"trained {len(vals)} steps matrix-free at N={n} "
        f"(factor refreshed every {refresh}): "
        f"loss {float(vals[0]):.4f} -> {float(vals[-1]):.4f}"
    )
    assert np.all(np.isfinite(np.asarray(vals)))

    # --- sanity: matrix-free loss matches the dense MAP loss ---------------
    dense = float(model.loss(x, y, prior_chols=None))
    mf = float(loss(model, model.precond_factor(x, rank=rank), 0))
    print(f"dense MAP loss {dense:.4f} vs matrix-free estimate {mf:.4f}")
    assert abs(mf - dense) < 0.05 * max(1.0, abs(dense))

    # --- predict matrix-free (no N×N residency either) ---------------------
    post = model.posterior_matrixfree(
        x, y, xs, prior_pre, block=block, max_iters=96, tol=1e-8,
        precond_rank=rank, fused_matvec=fused,
    )
    rmse = float(jnp.sqrt(jnp.mean((post.mean - jnp.sin(
        2.0 * xs[:, 0] * (1.0 + 0.4 * jnp.tanh(xs[:, 1]))
    )) ** 2)))
    var = jnp.diagonal(post.cov)
    print(f"posterior over {xs.shape[0]} test points: rmse {rmse:.3f}, "
          f"mean var {float(jnp.mean(var)):.4f}")
    assert np.isfinite(rmse)

    # --- amortized serving: build the state once, query cheaply ------------
    # posterior_matrixfree above re-solves EVERYTHING per call; for
    # repeated queries hoist alpha = K^-1 y + the preconditioner + the
    # lengthscale-conditioning solves into a state, then each batch pays
    # only the cross build (+ one auto-budget variance solve, skipped
    # entirely under mean_only=True)
    state = model.posterior_state_matrixfree(
        x, y, prior_pre, block=block, max_iters=96, tol=1e-8,
        precond_rank=rank, fused_matvec=fused,
    )
    mean_fast = model.posterior_matrixfree_from_state(
        state, xs, mean_only=True, block=block, fused_matvec=fused,
    )
    drift = float(jnp.max(jnp.abs(mean_fast - post.mean)))
    print(f"amortized mean-only serving: max |drift| vs one-shot {drift:.2e}")
    assert drift < 1e-3
    print("ok")
    return rmse


if __name__ == "__main__":
    main()
