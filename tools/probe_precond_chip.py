#!/usr/bin/env python3
"""ON-CHIP iterations-to-tolerance probe for the preconditioned lazy CG
path at flagship sizes (tools/probe_precond.py's question, answered with
the fused Gram·v matvec on the TPU so N=32768/65536 are cheap — the
dense CPU probe caps out around 8192 on this 1-core host).

For each (N, pose, rank) cell: ONE mbcg at max_iters=200 records the
full relative-residual history (CGResult.resnorm_hist), so one program
answers both "iterations to 1e-6/1e-2" and "relres at the shipped
budgets {16, 24, 32, 48, 64}".  Decision input for the fixed-budget
choice in GibbsExactGP.loss_matrixfree (32-iter rank-50 shipped,
DESIGN.md §16): if rank 100 cuts iters-to-accuracy enough at large N,
drop the budget; each saved iteration is ~40 ms/step at 65536.

Run ALONE (never share the TPU):  python tools/probe_precond_chip.py [N ...]
Writes tools/probe_precond_chip.json (merging, like bench_cg).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference  # noqa: E402
from nonstationary_precip_tpu.ops.bbmm import (  # noqa: E402
    mbcg,
    sample_precond_probes,
    woodbury_precond,
)
from nonstationary_precip_tpu.ops.lazy_cg import (  # noqa: E402
    lazy_nystrom_factor,
    lazy_pivoted_cholesky,
)
from nonstationary_precip_tpu.ops.pallas_matvec import (  # noqa: E402
    packed_gibbs_matvec_builder,
)

OUT = Path(__file__).parent / "probe_precond_chip.json"
results = json.loads(OUT.read_text()) if OUT.exists() else {}
D = 2
CHECKPOINTS = (16, 24, 32, 48, 64)


def _cross(kern, xa, xb):
    return gibbs_gram_reference(
        xa[:, :D], jnp.exp(xa[:, D:]), xb[:, :D], jnp.exp(xb[:, D:])
    )


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    y = jnp.sin(2 * x[:, 0]) * jnp.cos(x[:, 1]) + 0.1 * jnp.asarray(
        rng.normal(size=n), jnp.float32
    )
    return x, y


def _cell(aug, y, s2, rank, key, rpc=False, nystrom=False, shift=1.0,
          budget=200):
    """iters-to-tol + residual checkpoints, all on chip in one program.

    ``shift``: preconditioner ridge multiplier — P = LLᵀ + shift·σ²I.
    shift > 1 trades conditioning (κ(P⁻¹K̂) grows ~shift) for f32
    stability of the Woodbury apply (its noise/signal is ε·λmax(P)/c;
    at N = 131072 with c = σ² that ratio crosses ~0.5 and mBCG breaks
    down immediately)."""

    def run(aug, y, s2, key):
        matvec = packed_gibbs_matvec_builder(D)(None, aug, s2)
        c = shift * s2
        if rank > 0:
            if nystrom:
                lpc = lazy_nystrom_factor(
                    None, aug, rank, _cross, key=jax.random.PRNGKey(17)
                )
            else:
                pkey = jax.random.PRNGKey(17) if rpc else None
                lpc = lazy_pivoted_cholesky(None, aug, rank, _cross, key=pkey)
            minv = woodbury_precond(lpc, c)
            probes = sample_precond_probes(key, lpc, c, 8)
        else:
            minv = None
            probes = jax.random.rademacher(key, (aug.shape[0], 8), jnp.float32)
        rhs = jnp.concatenate([y[:, None], probes], axis=1)
        res = mbcg(matvec, rhs, max_iters=budget, tol=1e-6, precond=minv)
        hist_max = jnp.max(res.resnorm_hist, axis=1)  # worst column per iter
        return res.iters, hist_max

    iters, hist = jax.jit(run)(aug, y, s2, key)
    iters = np.asarray(iters)
    hist = np.asarray(hist)
    return {
        "iters_y": int(iters[0]),
        "iters_max": int(iters.max()),
        "relres_at": {
            str(k): float(hist[k - 1]) for k in CHECKPOINTS if k <= len(hist)
        },
        "relres_final": float(hist[-1]),
    }


def probe(n: int, trained: bool, ranks=None, rpc=False, nystrom=False,
          shift=1.0, budget=200):
    x, y = _data(n)
    if trained:
        log_ell = 0.5 * jnp.sin(x)
        s2 = jnp.asarray(np.exp(-4.0), jnp.float32)
    else:
        log_ell = jnp.zeros_like(x)
        s2 = jnp.asarray(np.exp(-2.0), jnp.float32)
    aug = jnp.concatenate([x, log_ell], axis=1)
    key = jax.random.PRNGKey(5)
    pose = "trained" if trained else "init"
    if ranks is None:
        ranks = (50, 100, 150) if n <= 16384 else (50, 100, 150, 200)
    for rank in ranks:
        cell = _cell(aug, y, s2, rank, key, rpc=rpc, nystrom=nystrom,
                     shift=shift, budget=budget)
        name = f"{n}-{pose}-r{rank}" + ("-rpc" if rpc else "") + (
            "-nys" if nystrom else ""
        ) + (f"-s{shift:g}" if shift != 1.0 else "") + (
            f"-i{budget}" if budget != 200 else ""
        )
        results[name] = cell
        print(name, cell, flush=True)
        OUT.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    # usage: probe_precond_chip.py [N ...] [rNNN ...] [trained|init] [rpc]
    #        [iNN = mBCG budget, default 200 — keep programs SHORT at very
    #         large N: a multi-minute single on-chip program can crash the
    #         axon worker (observed at 262144 with i200)]
    # rank args (r300 r400) and a pose filter restrict the sweep;
    # 'rpc' switches the factor to randomly-pivoted Cholesky
    args = sys.argv[1:]
    sizes = [int(a) for a in args if a.isdigit()] or [16384]
    ranks = tuple(
        int(a[1:]) for a in args
        if a.startswith("r") and a not in ("rpc",) and a[1:].isdigit()
    ) or None
    rpc = "rpc" in args
    nystrom = "nystrom" in args
    shift = next(
        (float(a[1:]) for a in args
         if a.startswith("s") and a[1:].replace(".", "").isdigit()),
        1.0,
    )
    budget = next(
        (int(a[1:]) for a in args if a.startswith("i") and a[1:].isdigit()),
        200,
    )
    poses = [a == "trained" for a in args if a in ("trained", "init")] or [
        False,
        True,
    ]
    for n in sizes:
        for trained in poses:
            probe(n, trained, ranks=ranks, rpc=rpc, nystrom=nystrom,
                  shift=shift, budget=budget)
