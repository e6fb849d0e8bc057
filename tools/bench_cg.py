#!/usr/bin/env python3
"""Large-N exact-GP training-step timing on chip: blocked-Cholesky MLL vs
the BBMM/CG + SLQ objective (ops/bbmm.py), the regime the reference
trains in under ``gpytorch.settings.max_cg_iterations``
(/root/reference/experiments/spatial_exp.py:199).

One Adam step on (log-lengthscale, log-outputscale, raw noise) of an RBF
GP, Gram rebuilt every step — the realistic per-iteration program.  Each
(N, path) is timed DIFFERENTIALLY (CLAUDE.md rule): jitted scans of
length S and 2S, ms/step = (T₂ − T₁)/S over best-of-3, which cancels the
~28 ms axon dispatch exactly instead of amortising it.
CG runs a fixed 64-iteration mBCG with 8 Rademacher probes (fixed key:
common random numbers), no preconditioner — the synthetic problem is
well-conditioned, so 64 iterations converge to ~1e-6.

Writes tools/bench_cg.json.  Run alone (never share the TPU).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from nonstationary_precip_tpu.ops.bbmm import cg_mll  # noqa: E402
from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_mll  # noqa: E402
from nonstationary_precip_tpu.ops.linalg import (  # noqa: E402
    mvn_logpdf_from_chol,
    safe_cholesky,
)

OUT = Path(__file__).parent / "bench_cg.json"
LAZY_BLOCK = 2048
# merge into prior rows so a single-size rerun never clobbers the file
results = json.loads(OUT.read_text()) if OUT.exists() else {}


def _steps(n):
    # large N: fewer in-scan steps (a 65k CG step is seconds, and the
    # differential S/2S pair still cancels dispatch exactly)
    return 10 if n <= 16384 else (4 if n <= 32768 else 2)


def log(name, **kw):
    results[name] = kw
    print(name, kw, flush=True)
    OUT.write_text(json.dumps(results, indent=2))


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    y = jnp.sin(2 * x[:, 0]) * jnp.cos(x[:, 1]) + 0.1 * jnp.asarray(
        rng.normal(size=n), jnp.float32
    )
    return x, y


def _gram(params, x):
    ell = jnp.exp(params["log_ell"])
    s = jnp.exp(params["log_s"])
    sq = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    return s * jnp.exp(-0.5 * sq / ell**2)


def _loss_chol(params, x, y):
    n = y.shape[0]
    k = _gram(params, x) + jnp.exp(params["log_noise"]) * jnp.eye(n, dtype=x.dtype)
    return -mvn_logpdf_from_chol(y, jnp.zeros_like(y), safe_cholesky(k)) / n


def _loss_cg(params, x, y, key):
    n = y.shape[0]
    s2 = jnp.exp(params["log_noise"])
    k = _gram(params, x) + s2 * jnp.eye(n, dtype=x.dtype)
    return -cg_mll(k, y, key, s2, num_probes=8, max_iters=64, tol=1e-6) / n


def _rbf_cross(params, xa, xb):
    # module-level cross_fn (stable identity — see lazy_cg docstring):
    # same RBF as _gram, built per (block, N) panel
    ell = jnp.exp(params["log_ell"])
    s = jnp.exp(params["log_s"])
    sq = jnp.sum((xa[:, None, :] - xb[None, :, :]) ** 2, axis=-1)
    return s * jnp.exp(-0.5 * sq / ell**2)


def _loss_lazy(params, x, y, key):
    # matrix-free: K never materialises, only (LAZY_BLOCK, N) row panels
    n = y.shape[0]
    kp = {"log_ell": params["log_ell"], "log_s": params["log_s"]}
    return (
        -lazy_cg_mll(
            kp, x, y, key, jnp.exp(params["log_noise"]),
            block=LAZY_BLOCK, num_probes=8, max_iters=64, tol=1e-6,
            cross_fn=_rbf_cross,
        )
        / n
    )


def _rbf_matvec_builder(params, x, sigma2):
    # fused Gram·v (ops/pallas_matvec.py): even the row panel never
    # touches HBM — module-level so its identity is cache-stable
    from nonstationary_precip_tpu.ops.pallas_matvec import rbf_gram_matvec

    ell = jnp.broadcast_to(jnp.exp(params["log_ell"]), (x.shape[1],))
    s = jnp.exp(params["log_s"])

    def matvec(v):
        return s * rbf_gram_matvec(x, x, ell, v) + sigma2 * v

    return matvec


def _loss_lazyf(params, x, y, key):
    n = y.shape[0]
    kp = {"log_ell": params["log_ell"], "log_s": params["log_s"]}
    return (
        -lazy_cg_mll(
            kp, x, y, key, jnp.exp(params["log_noise"]),
            block=LAZY_BLOCK, num_probes=8, max_iters=64, tol=1e-6,
            cross_fn=_rbf_cross, matvec_builder=_rbf_matvec_builder,
        )
        / n
    )


# --- nonstationary Gibbs rows: trainable PER-POINT lengthscale field, the
# flagship kernel (reference models/gibbs_kernels.py) at large N ----------

_GIBBS_D = 2


def _gibbs_cross(kern, xa, xb):
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference

    d = _GIBBS_D
    return gibbs_gram_reference(
        xa[:, :d], jnp.exp(xa[:, d:]), xb[:, :d], jnp.exp(xb[:, d:])
    )


def _loss_lazyg(params, x, y, key, matvec_builder=None, precond_rank=0,
                max_iters=64):
    n = y.shape[0]
    aug = jnp.concatenate([x, params["log_ell_pp"]], axis=1)
    return (
        -lazy_cg_mll(
            None, aug, y, key, jnp.exp(params["log_noise"]),
            block=LAZY_BLOCK, num_probes=8, max_iters=max_iters, tol=1e-6,
            cross_fn=_gibbs_cross, matvec_builder=matvec_builder,
            precond_rank=precond_rank,
        )
        / n
    )


def _loss_lazygf(params, x, y, key):
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        packed_gibbs_matvec_builder,
    )

    return _loss_lazyg(
        params, x, y, key, matvec_builder=packed_gibbs_matvec_builder(_GIBBS_D)
    )


def _loss_lazygfp(params, x, y, key):
    # rank-50 pivoted-Cholesky/Woodbury preconditioner, SAME 64-iteration
    # budget as lazygf: the unpreconditioned rows are materially
    # unconverged at this budget for N >= 4096 (tools/probe_precond.py:
    # relres@64 = 0.18 at 8192 vs 9e-7 preconditioned at iteration 24),
    # so this row is both the honest estimator and — via lazygfp32 — the
    # cheaper one.
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        packed_gibbs_matvec_builder,
    )

    return _loss_lazyg(
        params, x, y, key, matvec_builder=packed_gibbs_matvec_builder(_GIBBS_D),
        precond_rank=50,
    )


def _loss_lazygfp32(params, x, y, key):
    # equal-ACCURACY speed row: rank 50 converges by iteration ~14-32
    # (2048-16384, init pose), so a 32-iteration budget already beats the
    # 64-iteration unpreconditioned row on both axes there
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        packed_gibbs_matvec_builder,
    )

    return _loss_lazyg(
        params, x, y, key, matvec_builder=packed_gibbs_matvec_builder(_GIBBS_D),
        precond_rank=50, max_iters=32,
    )


def _loss_lazygfp32b(params, x, y, key):
    # lazygfp32 + the fused Pallas BACKWARD panel sweep (panel_vjp):
    # the jax.vjp panel scan (26-28% of the step, tools/probe_lazy_bwd)
    # replaced by one kernel that assembles the rank-17 cotangent in VMEM
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        packed_gibbs_matvec_builder,
        packed_gibbs_panel_vjp,
    )

    n = y.shape[0]
    aug = jnp.concatenate([x, params["log_ell_pp"]], axis=1)
    return (
        -lazy_cg_mll(
            None, aug, y, key, jnp.exp(params["log_noise"]),
            block=LAZY_BLOCK, num_probes=8, max_iters=32, tol=1e-6,
            cross_fn=_gibbs_cross,
            matvec_builder=packed_gibbs_matvec_builder(_GIBBS_D),
            panel_vjp=packed_gibbs_panel_vjp(_GIBBS_D),
            precond_rank=50,
        )
        / n
    )


import functools  # noqa: E402


@functools.lru_cache(maxsize=16)
def _loss_lazygfpb_rb(rank: int, iters: int, precond: str = "pivchol",
                      shift: float = 1.0):
    # (rank, budget)-parameterised lazygfp32b: the on-chip convergence
    # probe (tools/probe_precond_chip.py) showed iterations-to-tolerance
    # scales with N at fixed rank (16384 trained pose: rank-50 needs 135
    # iters, rank-100 23, rank-150 9) — so the honest converged config is
    # N-dependent.  lru_cache keeps the function identity jit-stable.
    def loss(params, x, y, key):
        from nonstationary_precip_tpu.ops.pallas_matvec import (
            packed_gibbs_matvec_builder,
            packed_gibbs_panel_vjp,
        )

        n = y.shape[0]
        aug = jnp.concatenate([x, params["log_ell_pp"]], axis=1)
        return (
            -lazy_cg_mll(
                None, aug, y, key, jnp.exp(params["log_noise"]),
                block=LAZY_BLOCK, num_probes=8, max_iters=iters, tol=1e-6,
                cross_fn=_gibbs_cross,
                matvec_builder=packed_gibbs_matvec_builder(_GIBBS_D),
                panel_vjp=packed_gibbs_panel_vjp(_GIBBS_D),
                precond_rank=rank,
                precond=precond,
                precond_shift=shift,
                precond_key=(
                    jax.random.PRNGKey(17) if precond == "nystrom" else None
                ),
            )
            / n
        )

    return loss


@functools.lru_cache(maxsize=16)
def _loss_lazyg_stale(iters: int, shift: float = 1.0):
    # hoisted-factor loss: the (N, rank) preconditioner factor arrives
    # PREBUILT (stale-preconditioner hoist, ops/lazy_cg.lazy_cg_mll
    # precond_lpc) — the per-step rank-sequential pivoted recursion is
    # amortised over a refresh window by the nested scan in bench()
    def loss(params, lpc, x, y, key):
        from nonstationary_precip_tpu.ops.pallas_matvec import (
            packed_gibbs_matvec_builder,
            packed_gibbs_panel_vjp,
        )

        n = y.shape[0]
        aug = jnp.concatenate([x, params["log_ell_pp"]], axis=1)
        return (
            -lazy_cg_mll(
                None, aug, y, key, jnp.exp(params["log_noise"]),
                block=LAZY_BLOCK, num_probes=8, max_iters=iters, tol=1e-6,
                cross_fn=_gibbs_cross,
                matvec_builder=packed_gibbs_matvec_builder(_GIBBS_D),
                panel_vjp=packed_gibbs_panel_vjp(_GIBBS_D),
                precond_lpc=lpc,
                precond_shift=shift,
            )
            / n
        )

    return loss


def _loss_lazygfp32h3(params, x, y, key):
    # lazygfp32 with the 'high3' matvec contraction — after the d=2 tile
    # fast path it measures 1.12x on the matvec but only 1.06x end-to-end
    # (107.3 vs 113.6 ms at 16384, DESIGN §18): too marginal to change
    # the numerics default, kept runnable for re-probing
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        packed_gibbs_matvec_builder,
    )

    return _loss_lazyg(
        params, x, y, key,
        matvec_builder=packed_gibbs_matvec_builder(_GIBBS_D, "high3"),
        precond_rank=50, max_iters=32,
    )


# mBCG convergence gate (VERDICT r3 #1): every lazy row records the final
# relative residual of the solves it timed, AT THE TRAINED POSE the scan
# reached.  A perf row with relres ≳ 0.1 is timing an unconverged
# estimator (the failure DESIGN.md §16 documents shipping once) — flagged
# converged=false and printed loudly; run_benchmarks.py's banded
# gibbs_largen row turns the same check into a hard --check failure.
RELRES_GATE = 1e-2


def _diag_settings(name):
    """(precond_rank, iters, precond, shift, fused, family) per row name;
    None for rows with no mBCG solve (chol) or a dense one (cg)."""
    if name in ("chol", "cg"):
        return None
    if name in ("lazy", "lazyf"):
        return (0, 64, "pivchol", 1.0, name == "lazyf", "rbf")
    if name == "lazyg":
        return (0, 64, "pivchol", 1.0, False, "gibbs")
    if name == "lazygf":
        return (0, 64, "pivchol", 1.0, True, "gibbs")
    if name == "lazygfp":
        return (50, 64, "pivchol", 1.0, True, "gibbs")
    if name in ("lazygfp32", "lazygfp32b", "lazygfp32h3"):
        return (50, 32, "pivchol", 1.0, True, "gibbs")
    if name.startswith("lazygfpb-r") or name.startswith("lazygnys-r"):
        pre = "nystrom" if name.startswith("lazygnys") else "pivchol"
        parts = name.split("-")[1:]
        rank, iters = int(parts[0][1:]), int(parts[1][1:])
        shift = float(parts[2][1:]) if len(parts) > 2 else 1.0
        return (rank, iters, pre, shift, True, "gibbs")
    return None


def _make_diag(name, x, y, key):
    cfg = _diag_settings(name)
    if cfg is None:
        return None
    rank, iters, pre, shift, fused, family = cfg
    from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_diagnostics
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        packed_gibbs_matvec_builder,
    )

    def diag(params):
        if family == "gibbs":
            aug = jnp.concatenate([x, params["log_ell_pp"]], axis=1)
            return lazy_cg_diagnostics(
                None, aug, y, key, jnp.exp(params["log_noise"]),
                block=LAZY_BLOCK, num_probes=8, max_iters=iters, tol=1e-6,
                precond_rank=rank, precond=pre, precond_shift=shift,
                precond_key=(
                    jax.random.PRNGKey(17) if pre == "nystrom" else None
                ),
                cross_fn=_gibbs_cross,
                matvec_builder=(
                    packed_gibbs_matvec_builder(_GIBBS_D) if fused else None
                ),
            )
        kp = {"log_ell": params["log_ell"], "log_s": params["log_s"]}
        return lazy_cg_diagnostics(
            kp, x, y, key, jnp.exp(params["log_noise"]),
            block=LAZY_BLOCK, num_probes=8, max_iters=iters, tol=1e-6,
            cross_fn=_rbf_cross,
            matvec_builder=_rbf_matvec_builder if fused else None,
        )

    return diag


def bench(n, only=None):
    x, y = _data(n)
    params0 = {
        "log_ell": jnp.asarray(0.0, jnp.float32),
        "log_s": jnp.asarray(0.0, jnp.float32),
        "log_noise": jnp.asarray(-2.0, jnp.float32),
    }
    # gibbs rows train an (N, D) per-point lengthscale FIELD
    params0_g = {
        "log_ell_pp": jnp.zeros((n, _GIBBS_D), jnp.float32),
        "log_noise": jnp.asarray(-2.0, jnp.float32),
    }
    opt = optax.adam(1e-2)
    key = jax.random.PRNGKey(5)

    def scanned(loss_fn, steps):
        @jax.jit
        def run(params):
            st = opt.init(params)

            def body(carry, _):
                p, s = carry
                val, g = jax.value_and_grad(loss_fn)(p)
                up, s = opt.update(g, s)
                return (optax.apply_updates(p, up), s), val

            (p, _), vals = jax.lax.scan(body, (params, st), None, length=steps)
            return p, vals

        return run

    def timed(run, p0):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(p0)[1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    losses = {
        # lazy first: if a dense row OOMs at large N the lazy number —
        # the row that CAN exist there — is already on disk
        "lazy": lambda p: _loss_lazy(p, x, y, key),
        "lazyf": lambda p: _loss_lazyf(p, x, y, key),
        "lazyg": lambda p: _loss_lazyg(p, x, y, key),
        "lazygf": lambda p: _loss_lazygf(p, x, y, key),
        "lazygfp": lambda p: _loss_lazygfp(p, x, y, key),
        "lazygfp32": lambda p: _loss_lazygfp32(p, x, y, key),
        "lazygfp32b": lambda p: _loss_lazygfp32b(p, x, y, key),
        "lazygfp32h3": lambda p: _loss_lazygfp32h3(p, x, y, key),
        "chol": lambda p: _loss_chol(p, x, y),
        "cg": lambda p: _loss_cg(p, x, y, key),
    }
    # (rank, budget)-tuned rows, named lazygfpb-r<rank>-i<iters>: run only
    # when named explicitly, e.g.  python tools/bench_cg.py 16384 lazygfpb-r100-i24
    # nystrom rows: lazygnys-r<rank>-i<iters>[-s<shift>] (stable
    # high-rank factor + optional Woodbury ridge multiplier, DESIGN §22)
    # stale-precond rows: lazygstale-r<rank>-i<iters>-k<refresh>[-s<shift>]
    # (factor hoisted out of the step, rebuilt every <refresh> steps by a
    # nested scan — the differential pair then amortises exactly one
    # build per window)
    # posterior rows: lazygpost-r<rank>-i<iters>[-s<shift>][-nys][-t<ntest>]
    # — the matrix-free PREDICTION path (lazy_cg_posterior: one mBCG with
    # 1+N* right-hand sides, deterministic), timed per posterior CALL
    # amortized-posterior rows (VERDICT r3 #4):
    # lazygpst-r<rank>-i<iters|auto>[-t<ntest>][-mo]
    # — state (alpha, factor) built ONCE outside the timed region
    # (logged as state_build_s), each timed call = cross build + mean
    # contraction [+ the auto-budget variance solve unless -mo]
    stale_rows = []
    post_rows = []
    pst_rows = []
    for req in only or ():
        if req.startswith("lazygpst-r"):
            parts = req.split("-")[1:]
            rank = int(parts[0][1:])
            iters = None if parts[1] == "iauto" else int(parts[1][1:])
            ntest, mean_only, pre, shift = 256, False, "pivchol", 1.0
            for p in parts[2:]:
                if p == "mo":
                    mean_only = True
                elif p == "nys":
                    pre = "nystrom"
                elif p.startswith("t"):
                    ntest = int(p[1:])
                elif p.startswith("s"):
                    shift = float(p[1:])
            pst_rows.append((req, rank, iters, ntest, mean_only, pre, shift))
        elif req.startswith("lazygpost-r"):
            parts = req.split("-")[1:]
            rank, iters = int(parts[0][1:]), int(parts[1][1:])
            shift, pre, ntest = 1.0, "pivchol", 256
            for p in parts[2:]:
                if p == "nys":
                    pre = "nystrom"
                elif p.startswith("s"):
                    shift = float(p[1:])
                elif p.startswith("t"):
                    ntest = int(p[1:])
            post_rows.append((req, rank, iters, shift, pre, ntest))
        elif req.startswith("lazygfpb-r") or req.startswith("lazygnys-r"):
            pre = "nystrom" if req.startswith("lazygnys") else "pivchol"
            parts = req.split("-")[1:]
            rank, iters = int(parts[0][1:]), int(parts[1][1:])
            shift = float(parts[2][1:]) if len(parts) > 2 else 1.0
            fn = _loss_lazygfpb_rb(rank, iters, precond=pre, shift=shift)
            losses[req] = (
                lambda p, fn=fn: fn(p, x, y, key)
            )
        elif req.startswith("lazygstale-r"):
            parts = req.split("-")[1:]
            rank, iters, refresh = (
                int(parts[0][1:]), int(parts[1][1:]), int(parts[2][1:])
            )
            shift = float(parts[3][1:]) if len(parts) > 3 else 1.0
            stale_rows.append((req, rank, iters, refresh, shift))
    steps = _steps(n)
    for name, loss_fn in losses.items():
        if only and name not in only:
            continue
        if name == "lazygfp32h3" and not only:
            continue  # known-slower re-probe row: runs only when named
        p0 = params0_g if name.startswith("lazyg") else params0

        def single(loss_fn, p0):
            @jax.jit
            def step(p, s):
                val, g = jax.value_and_grad(loss_fn)(p)
                up, s = opt.update(g, s)
                return optax.apply_updates(p, up), s, val

            return step, opt.init(p0)

        try:
            _bench_row(name, n, loss_fn, scanned, timed, steps, p0,
                       single=single, diagnose=_make_diag(name, x, y, key))
        except Exception as e:  # e.g. dense-row RESOURCE_EXHAUSTED
            log(f"error-{name}-{n}", error=repr(e)[:300])

    for name, rank, iters, refresh, shift in stale_rows:
        if n >= SINGLE_STEP_N:
            # scan-of-steps programs reproducibly fault on the compile
            # service at this N (DESIGN.md §23) and these row families
            # have no single-step fallback — skip loudly instead of
            # logging a guaranteed error row
            log(f"skip-{name}-{n}", method="skipped",
                reason="scanned program faults at n >= SINGLE_STEP_N "
                       "(DESIGN.md §23); no single-step form for "
                       "windowed stale rows")
            continue
        loss = _loss_lazyg_stale(iters, shift)

        def scanned_stale(windows):
            # outer scan: rebuild the factor at the CURRENT pose, then
            # run <refresh> hoisted steps on it — one compiled program
            @jax.jit
            def run(params):
                st = opt.init(params)

                def inner(carry, _):
                    p, s, lpc = carry
                    val, g = jax.value_and_grad(loss)(p, lpc, x, y, key)
                    up, s = opt.update(g, s)
                    return (optax.apply_updates(p, up), s, lpc), val

                def outer(carry, _):
                    p, s = carry
                    from nonstationary_precip_tpu.ops.lazy_cg import (
                        build_precond_factor,
                    )

                    aug = jnp.concatenate([x, p["log_ell_pp"]], axis=1)
                    lpc = jax.lax.stop_gradient(
                        build_precond_factor(
                            "pivchol", None, aug, rank, _gibbs_cross
                        )
                    )
                    (p, s, _), vals = jax.lax.scan(
                        inner, (p, s, lpc), None, length=refresh
                    )
                    return (p, s), vals

                (p, _), vals = jax.lax.scan(
                    outer, (params, st), None, length=windows
                )
                return p, vals.reshape(-1)

            return run

        try:
            # differential pair in WINDOWS: (T₂ − T₁)/refresh = one
            # window = refresh steps + exactly one factor build
            run1, run2 = scanned_stale(1), scanned_stale(2)
            t0 = time.perf_counter()
            _, vals = run1(params0_g)
            jax.block_until_ready(vals)
            jax.block_until_ready(run2(params0_g)[1])
            t_compile = time.perf_counter() - t0
            ms = (timed(run2, params0_g) - timed(run1, params0_g)) / refresh * 1e3
            log(
                f"{name}-{n}",
                method="differential-window-scan",
                ms_per_step=round(ms, 3),
                first_call_s=round(t_compile, 1),
                loss0=float(vals[0]),
                lossT=float(vals[-1]),
                finite=bool(np.all(np.isfinite(np.asarray(vals)))),
            )
        except Exception as e:
            log(f"error-{name}-{n}", error=repr(e)[:300])

    for name, rank, iters, ntest, mean_only, pre, shift in pst_rows:
        if n >= SINGLE_STEP_N:
            log(f"skip-{name}-{n}", method="skipped",
                reason="scanned program faults at n >= SINGLE_STEP_N "
                       "(DESIGN.md §23)")
            continue
        from nonstationary_precip_tpu.ops.lazy_cg import (
            lazy_posterior_query,
            lazy_posterior_state,
        )
        from nonstationary_precip_tpu.ops.pallas_matvec import (
            packed_gibbs_matvec_builder,
        )

        rngt = np.random.default_rng(1)
        xt = jnp.asarray(rngt.uniform(-3, 3, size=(ntest, 2)), jnp.float32)
        aug = jnp.concatenate([x, params0_g["log_ell_pp"]], axis=1)
        aug_t = jnp.concatenate(
            [xt, jnp.zeros((ntest, _GIBBS_D), jnp.float32)], axis=1
        )
        s2 = jnp.exp(params0_g["log_noise"])
        builder = packed_gibbs_matvec_builder(_GIBBS_D)

        build = jax.jit(
            lambda aug, y, s2: lazy_posterior_state(
                None, aug, y, s2, block=LAZY_BLOCK, tol=1e-8,
                precond_rank=rank, precond=pre,
                precond_key=(
                    jax.random.PRNGKey(17) if pre == "nystrom" else None
                ),
                precond_shift=shift, cross_fn=_gibbs_cross,
                matvec_builder=builder,
            )
        )

        def query_once(carry, _, iters=iters, mean_only=mean_only,
                       aug_t=aug_t):
            # denormal-scale perturbation of the QUERY POINTS: every
            # per-batch component (cross build, mean contraction, the
            # variance mBCG) depends on aug_t, so none of it can hoist
            # out of the scan — perturbing state.alpha instead measured
            # 2.1 ms/call at 65536 because the alpha-independent variance
            # solve hoisted wholesale (2026-08-20)
            c, st = carry
            mean, cov = lazy_posterior_query(
                st, aug_t + jnp.float32(1e-30) * c,
                mean_only=mean_only, block=LAZY_BLOCK,
                max_iters=iters, tol=1e-6, precond_shift=shift,
                cross_fn=_gibbs_cross, matvec_builder=builder,
            )
            s = jnp.sum(mean) + (0.0 if cov is None else jnp.sum(cov))
            return (s, st), s

        def scanned_pst(calls):
            @jax.jit
            def run(z, st):
                _, vals = jax.lax.scan(
                    query_once, (z, st), None, length=calls
                )
                return vals

            return run

        try:
            t0 = time.perf_counter()
            state = build(aug, y, s2)
            jax.block_until_ready(state.alpha)
            t_build = time.perf_counter() - t0
            run1, run2 = scanned_pst(1), scanned_pst(2)
            z0 = jnp.float32(0.0)
            t0 = time.perf_counter()
            vals = run1(z0, state)
            jax.block_until_ready(vals)
            jax.block_until_ready(run2(z0, state))
            t_compile = time.perf_counter() - t0

            def timed_pst(run):
                ts = []
                for _ in range(3):
                    t1 = time.perf_counter()
                    jax.block_until_ready(run(z0, state))
                    ts.append(time.perf_counter() - t1)
                return min(ts)

            ms = (timed_pst(run2) - timed_pst(run1)) * 1e3
            # convergence evidence for the timed estimator (ADVICE r4):
            # one info-returning query at the SAME budget — a row whose
            # relres is O(0.1) is timing an unconverged estimator
            _, _, qinfo = jax.jit(
                lambda st, at: lazy_posterior_query(
                    st, at, mean_only=mean_only, block=LAZY_BLOCK,
                    max_iters=iters, tol=1e-6, precond_shift=shift,
                    cross_fn=_gibbs_cross, matvec_builder=builder,
                    return_info=True,
                )
            )(state, aug_t)
            relres_q = float(qinfo["relres_max"])
            log(
                f"{name}-{n}",
                method="differential-scan",
                ms_per_call=round(ms, 3),
                state_build_s=round(t_build, 2),
                first_call_s=round(t_compile, 1),
                ntest=ntest,
                mean_only=mean_only,
                relres_alpha=float(state.alpha_relres),
                relres_query_max=relres_q,
                converged=bool(relres_q <= 1e-2),
                finite=bool(np.all(np.isfinite(np.asarray(vals)))),
            )
        except Exception as e:
            log(f"error-{name}-{n}", error=repr(e)[:300])

    for name, rank, iters, shift, pre, ntest in post_rows:
        if n >= SINGLE_STEP_N:
            log(f"skip-{name}-{n}", method="skipped",
                reason="scanned program faults at n >= SINGLE_STEP_N "
                       "(DESIGN.md §23); time the posterior via "
                       "tools/probe_step_262144.py-style single calls")
            continue
        from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_posterior
        from nonstationary_precip_tpu.ops.pallas_matvec import (
            packed_gibbs_matvec_builder,
        )

        rngt = np.random.default_rng(1)
        xt = jnp.asarray(rngt.uniform(-3, 3, size=(ntest, 2)), jnp.float32)
        aug = jnp.concatenate([x, params0_g["log_ell_pp"]], axis=1)
        aug_t = jnp.concatenate(
            [xt, jnp.zeros((ntest, _GIBBS_D), jnp.float32)], axis=1
        )
        s2 = jnp.exp(params0_g["log_noise"])
        pkey = jax.random.PRNGKey(17) if pre == "nystrom" else None

        def post_once(c, _, iters=iters, rank=rank, shift=shift, pre=pre,
                      pkey=pkey, aug=aug, aug_t=aug_t, s2=s2):
            # thread the carry into the inputs (denormal-scale, flushes
            # to zero in f32) so XLA cannot hoist the loop-invariant
            # posterior out of the scan — same trick as the Adam rows,
            # where the params change per step
            mean, cov = lazy_cg_posterior(
                None, aug, y + jnp.float32(1e-30) * c, aug_t, s2,
                block=LAZY_BLOCK, max_iters=iters, tol=1e-8,
                precond_rank=rank, precond=pre, precond_key=pkey,
                precond_shift=shift, cross_fn=_gibbs_cross,
                matvec_builder=packed_gibbs_matvec_builder(_GIBBS_D),
            )
            s = jnp.sum(mean) + jnp.sum(cov)
            return s, s

        def scanned_post(calls):
            @jax.jit
            def run(z):
                out, vals = jax.lax.scan(post_once, z, None, length=calls)
                return out, vals

            return run

        try:
            run1, run2 = scanned_post(1), scanned_post(2)
            z0 = jnp.float32(0.0)
            t0 = time.perf_counter()
            _, vals = run1(z0)
            jax.block_until_ready(vals)
            jax.block_until_ready(run2(z0)[1])
            t_compile = time.perf_counter() - t0
            ms = (timed(run2, z0) - timed(run1, z0)) * 1e3
            log(
                f"{name}-{n}",
                method="differential-scan",
                ms_per_call=round(ms, 3),
                first_call_s=round(t_compile, 1),
                ntest=ntest,
                finite=bool(np.all(np.isfinite(np.asarray(vals)))),
            )
        except Exception as e:
            log(f"error-{name}-{n}", error=repr(e)[:300])


def _loss_dense_gibbs(params, x, y):
    """Exact dense-Cholesky counterpart of the lazyg* estimator: same
    kernel (unit-scale gibbs_gram_reference over the per-point field),
    same ridge, same 1/N scaling — the parity oracle for N small enough
    that the N×N Gram exists."""
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference

    n = y.shape[0]
    ell = jnp.exp(params["log_ell_pp"])
    k = gibbs_gram_reference(x, ell, x, ell) + jnp.exp(
        params["log_noise"]
    ) * jnp.eye(n, dtype=x.dtype)
    return -mvn_logpdf_from_chol(y, jnp.zeros_like(y), safe_cholesky(k)) / n


def parity_check(n, rank=150, iters=None, steps=10):
    """Matrix-free-vs-dense loss/grad parity at the shipped (rank, budget)
    config, evaluated at a pose reached by actually TRAINING the lazy
    estimator for a few steps (init is too easy).  Logged into
    bench_cg.json as parity-gibbs-<n> (VERDICT r3 #1).

    The MLL value differs by SLQ/trace estimator noise (8 probes), so the
    comparison is statistical: loss relative difference and gradient
    cosine/norm-ratio, not bitwise."""
    if iters is None:
        iters = 16 if n <= 32768 else 32
    assert n <= 16384, "dense oracle needs the N x N Gram to exist"
    x, y = _data(n)
    key = jax.random.PRNGKey(5)
    params = {
        "log_ell_pp": jnp.zeros((n, _GIBBS_D), jnp.float32),
        "log_noise": jnp.asarray(-2.0, jnp.float32),
    }
    opt = optax.adam(1e-2)
    loss_lazy = _loss_lazygfpb_rb(rank, iters)

    @jax.jit
    def train(p):
        st = opt.init(p)

        def body(carry, _):
            pp, s = carry
            val, g = jax.value_and_grad(loss_lazy)(pp, x, y, key)
            up, s = opt.update(g, s)
            return (optax.apply_updates(pp, up), s), val

        (p, _), vals = jax.lax.scan(body, (p, st), None, length=steps)
        return p, vals

    p, _ = train(params)
    jax.block_until_ready(p["log_noise"])

    lv, lg = jax.jit(jax.value_and_grad(
        lambda pp: loss_lazy(pp, x, y, key)
    ))(p)
    dv, dg = jax.jit(jax.value_and_grad(
        lambda pp: _loss_dense_gibbs(pp, x, y)
    ))(p)
    lf = jnp.concatenate([jnp.ravel(v) for v in jax.tree.leaves(lg)])
    df = jnp.concatenate([jnp.ravel(v) for v in jax.tree.leaves(dg)])
    cos = float(jnp.dot(lf, df) / (jnp.linalg.norm(lf) * jnp.linalg.norm(df)))
    ratio = float(jnp.linalg.norm(lf) / jnp.linalg.norm(df))
    rel = float(jnp.abs(lv - dv) / jnp.abs(dv))
    ok = rel < 0.05 and cos > 0.98 and 0.8 < ratio < 1.25
    log(
        f"parity-gibbs-{n}",
        method="parity",
        config=f"r{rank}-i{iters}",
        loss_lazy=float(lv),
        loss_dense=float(dv),
        loss_rel_diff=round(rel, 6),
        grad_cosine=round(cos, 6),
        grad_norm_ratio=round(ratio, 6),
        ok=ok,
    )
    if not ok:
        print(f"  WARNING: PARITY FAILURE at {n}", flush=True)
    return ok


# At N ≥ SINGLE_STEP_N the lax.scan-of-steps bench program reproducibly
# dies with UNAVAILABLE on the axon service (4/4 across sessions) while
# the IDENTICAL single-step program compiles and runs (probe_step_262144,
# DESIGN.md §23) — so time huge rows step-by-step instead: the ~28 ms
# dispatch is 0.1% noise against a ≥20 s step.
SINGLE_STEP_N = 262144


def _run_diag(diagnose, trained_params):
    """Convergence fields for a row (empty when not applicable).  The
    diagnosis runs at the pose the timed program actually reached, so it
    gates what was measured, not the easy init."""
    if diagnose is None:
        return {}
    try:
        d = diagnose(trained_params)
    except Exception as e:
        return {"relres_error": repr(e)[:200]}
    converged = (
        d["relres_solve"] <= RELRES_GATE and not d["broke"]
    )
    if not converged:
        print(
            f"  WARNING: UNCONVERGED at trained pose — relres_solve "
            f"{d['relres_solve']:.3g} (gate {RELRES_GATE}), broke={d['broke']}",
            flush=True,
        )
    return {
        "relres_solve": round(d["relres_solve"], 8),
        "relres_max": round(d["relres_max"], 8),
        "iters_max": d["iters_max"],
        "broke": d["broke"],
        "converged": converged,
    }


def _bench_row(name, n, loss_fn, scanned, timed, steps, params0,
               single=None, diagnose=None):
    if single is not None and n >= SINGLE_STEP_N:
        # multi-step, multi-RUN recording (VERDICT r3 #2): 1 warm-up step
        # + 10 timed consecutive steps per process; each process APPENDS
        # its run to the row's `runs` list, so three invocations build the
        # 3-consecutive-runs evidence the flagship scaling claim needs.
        step, st = single(loss_fn, params0)
        t0 = time.perf_counter()
        p, st, v = step(params0, st)
        vals = [float(v)]  # fetch forces the dispatch to complete
        t_compile = time.perf_counter() - t0
        ts = []
        for _ in range(10):
            t1 = time.perf_counter()
            p, st, v = step(p, st)
            vals.append(float(v))
            ts.append(time.perf_counter() - t1)
        prev = results.get(f"{name}-{n}", {})
        runs = list(prev.get("runs", [])) if "runs" in prev else []
        runs.append(
            {
                "ms_steps": [round(t * 1e3, 1) for t in ts],
                "ms_median": round(sorted(ts)[len(ts) // 2] * 1e3, 1),
                "first_call_s": round(t_compile, 1),
                "loss0": vals[0],
                "lossT": vals[-1],
                "finite": bool(np.all(np.isfinite(vals))),
            }
        )
        log(
            f"{name}-{n}",
            method="single-step",
            ms_per_step=round(min(min(r["ms_steps"]) for r in runs), 1),
            ms_per_step_median=runs[-1]["ms_median"],
            runs=runs,
            loss0=runs[0]["loss0"],
            lossT=vals[-1],
            finite=all(r["finite"] for r in runs),
            note="per-step wall timing incl. ~28 ms dispatch (0.1% at this "
                 "N); 10 consecutive steps per run, one run appended per "
                 "process (the scanned program faults at this N on the "
                 "compile service; DESIGN.md §23)",
            **_run_diag(diagnose, p),
        )
        return
    run1 = scanned(loss_fn, steps)
    run2 = scanned(loss_fn, 2 * steps)
    t_compile = time.perf_counter()
    p_trained, vals = run1(params0)
    jax.block_until_ready(vals)
    jax.block_until_ready(run2(params0)[1])  # warm the 2S program too
    t_compile = time.perf_counter() - t_compile
    ms_per_step = (timed(run2, params0) - timed(run1, params0)) / steps * 1e3
    log(
        f"{name}-{n}",
        method="differential-scan",
        ms_per_step=round(ms_per_step, 3),
        first_call_s=round(t_compile, 1),
        loss0=float(vals[0]),
        lossT=float(vals[-1]),
        finite=bool(np.all(np.isfinite(np.asarray(vals)))),
        **_run_diag(diagnose, p_trained),
    )


def main(sizes, only=None):
    from nonstationary_precip_tpu.utils.backend import wait_for_backend

    wait_for_backend()
    print("devices:", jax.devices(), flush=True)
    if only and "parity" in only:
        for n in sizes:
            parity_check(n)
        only = tuple(o for o in only if o != "parity") or None
        if only is None:
            return
    for n in sizes:
        # past ~32k the dense Gram (+ its autodiff copies) no longer fits
        # a v5e's HBM — only the matrix-free path can run there at all
        bench(n, only=only or (("lazy",) if n > 32768 else None))


if __name__ == "__main__":
    only = tuple(a for a in sys.argv[1:] if not a.isdigit()) or None
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [4096, 8192, 16384]
    main(sizes, only)
