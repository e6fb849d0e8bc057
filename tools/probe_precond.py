#!/usr/bin/env python3
"""Iterations-to-tolerance probe for pivoted-Cholesky-preconditioned mBCG
on the large-N bench problems (tools/bench_cg.py's RBF and Gibbs configs).

Iteration counts are hardware-independent — this runs on CPU with the
dense Gram so every (rank, tol) cell is cheap.  The payoff model on chip:
a fused-matvec CG step is ~(iters x matvec_ms) + fixed backward, so
halving iterations-to-tol nearly halves the large-N training step.

Also reports the preconditioner's own cost proxy (rank) and the final
relative residual at the fixed 64-iteration budget the r3 bench used,
so "same budget, how much closer" and "same tol, how much cheaper" are
both visible.

Run: python tools/probe_precond.py [N ...]   (default 4096)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nonstationary_precip_tpu.ops.bbmm import (  # noqa: E402
    mbcg,
    pivoted_cholesky,
    sample_precond_probes,
    woodbury_precond,
)
from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference  # noqa: E402


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    y = jnp.sin(2 * x[:, 0]) * jnp.cos(x[:, 1]) + 0.1 * jnp.asarray(
        rng.normal(size=n), jnp.float32
    )
    return x, y


def probe(n: int, trained: bool):
    x, y = _data(n)
    # "trained" pose: a non-constant lengthscale field and a noise level
    # an optimiser typically reaches on this synthetic (smaller than the
    # init -2) — conditioning worsens as training proceeds, so both poses
    # matter.
    if trained:
        log_ell = 0.5 * jnp.sin(x)  # smooth per-point field in [-0.5, 0.5]
        s2 = jnp.asarray(np.exp(-4.0), jnp.float32)
    else:
        log_ell = jnp.zeros_like(x)
        s2 = jnp.asarray(np.exp(-2.0), jnp.float32)
    kf = gibbs_gram_reference(x, jnp.exp(log_ell), x, jnp.exp(log_ell))
    k = kf + s2 * jnp.eye(n, dtype=jnp.float32)
    matvec = lambda v: k @ v  # noqa: E731
    key = jax.random.PRNGKey(5)
    pose = "trained" if trained else "init"
    print(f"\n== gibbs N={n} pose={pose} sigma2={float(s2):.4f} ==")
    print(f"{'rank':>5} {'iters(y)':>9} {'iters(max)':>10} {'relres@64':>10}")
    ranks = (0, 10, 20, 50) if n <= 8192 else (50, 100)
    for rank in ranks:
        if rank == 0:
            minv = None
            probes = jax.random.rademacher(key, (n, 8), dtype=jnp.float32)
        else:
            lpc, _ = pivoted_cholesky(kf, rank)
            minv = woodbury_precond(lpc, s2)
            probes = sample_precond_probes(key, lpc, s2, 8)
        rhs = jnp.concatenate([y[:, None], probes], axis=1)
        res = mbcg(matvec, rhs, max_iters=200, tol=1e-6, precond=minv)
        res64 = mbcg(matvec, rhs, max_iters=64, tol=1e-6, precond=minv)
        iters = np.asarray(res.iters)
        print(
            f"{rank:>5} {int(iters[0]):>9} {int(iters.max()):>10} "
            f"{float(np.max(np.asarray(res64.residnorm))):>10.2e}"
            + ("   (not converged in 200)" if iters.max() >= 200 else "")
        )


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [4096]
    for n in sizes:
        for trained in (False, True):
            probe(n, trained)
