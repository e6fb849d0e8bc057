#!/usr/bin/env python3
"""DEFAULT vs HIGHEST dot precision for the fused Gram·v CG matvec.

The fused kernels (ops/pallas_matvec.py) contract each VMEM Gram tile
into the output with an MXU dot whose precision is a knob: HIGHEST is
six bf16 passes (the package's pinned f32-exact default), DEFAULT is
one pass with the tile rounded to bf16 (~4e-3 relative error per
matvec).  mBCG is an inexact-Krylov method under a perturbed matvec: it
converges until the residual hits the matvec's error floor and stalls
there.  If the floor (~1e-3 relative) is below what the 32-iteration
equal-accuracy budget reaches anyway, DEFAULT is free accuracy-wise and
saves up to 5 of the 6 MXU passes of the contraction.

Two parts:

  cpu  — convergence + estimator quality, hardware-independent: emulate
         the DEFAULT contraction with a bf16-rounded dense Gram
         (kb.astype(bf16) @ v.astype(bf16) -> f32 accumulate is exactly
         what one MXU pass computes), run preconditioned mBCG at the
         32/64-iteration budgets, and compare solve error, SLQ logdet
         and the full MAP loss value + gradient against the exact-f32
         matvec and an f64 direct solve.  Run on CPU (forces platform).
  tpu  — wallclock: differential-time the raw fused Gibbs matvec and
         the full preconditioned Adam step (tools/bench_cg.py's lazygfp32
         row) at both precisions on chip.

Run:  python tools/probe_matvec_precision.py cpu [N ...]
      python tools/probe_matvec_precision.py tpu [N ...]    (alone!)
Writes tools/probe_matvec_precision.json (merged).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "probe_matvec_precision.json"


def _load():
    if OUT.exists():
        return json.loads(OUT.read_text())
    return {}


def _log(results, name, **kw):
    results[name] = kw
    print(name, kw, flush=True)
    OUT.write_text(json.dumps(results, indent=2))


def _data(n, seed=0):
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    y = jnp.sin(2 * x[:, 0]) * jnp.cos(x[:, 1]) + 0.1 * jnp.asarray(
        rng.normal(size=n), jnp.float32
    )
    # the harder trained pose from tools/probe_precond.py: smooth
    # per-point lengthscale field, small noise
    log_ell = 0.5 * jnp.sin(x)
    s2 = jnp.asarray(float(np.exp(-4.0)), jnp.float32)
    return x, y, log_ell, s2


# ---------------------------------------------------------------------------
# CPU: convergence + estimator quality with an emulated-DEFAULT matvec
# ---------------------------------------------------------------------------


def run_cpu(sizes):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference
    from nonstationary_precip_tpu.ops.bbmm import (
        lanczos_logdet,
        mbcg,
        pivoted_cholesky,
        sample_precond_probes,
        woodbury_precond,
        precond_logdet,
    )

    results = _load()
    for n in sizes:
        x, y, log_ell, s2 = _data(n)
        ell = jnp.exp(log_ell)
        k = gibbs_gram_reference(x, ell, x, ell)
        kmat = k + s2 * jnp.eye(n, dtype=jnp.float32)

        lpc, _ = pivoted_cholesky(k, rank=50)
        minv = woodbury_precond(lpc, s2)
        key = jax.random.PRNGKey(0)
        probes = sample_precond_probes(key, lpc, s2, 8)
        rhs = jnp.concatenate([y[:, None], probes], axis=1)

        exact_mv = lambda v: kmat @ v  # noqa: E731
        kb16 = kmat.astype(jnp.bfloat16)

        def default_mv(v):
            # one MXU pass: bf16 inputs, f32 accumulate
            return jnp.dot(
                kb16, v.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )

        k_hi = kmat.astype(jnp.bfloat16)
        k_lo = (kmat - k_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def high3_mv(v):
            # manual bf16x3 (XLA's 'high', which Mosaic cannot lower):
            # hi·hi + hi·lo + lo·hi, each one MXU pass, f32 accumulate
            vh = v.astype(jnp.bfloat16)
            vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
            f32 = jnp.float32
            return (
                jnp.dot(k_hi, vh, preferred_element_type=f32)
                + jnp.dot(k_hi, vl, preferred_element_type=f32)
                + jnp.dot(k_lo, vh, preferred_element_type=f32)
            )

        # ground truth in f64
        k64 = np.asarray(kmat, np.float64)
        sol64 = np.linalg.solve(k64, np.asarray(rhs, np.float64))
        sign, ld64 = np.linalg.slogdet(k64)
        assert sign > 0

        row = {}
        for iters in (32, 64):
            for tag, mv in (
                ("highest", exact_mv),
                ("default", default_mv),
                ("high3", high3_mv),
            ):
                res = mbcg(mv, rhs, max_iters=iters, tol=1e-10, precond=minv)
                xsol = np.asarray(res.x, np.float64)
                relerr = float(
                    np.linalg.norm(xsol - sol64) / np.linalg.norm(sol64)
                )
                # true residual through the EXACT operator (the estimand)
                relres = float(
                    np.linalg.norm(k64 @ xsol - np.asarray(rhs, np.float64))
                    / np.linalg.norm(np.asarray(rhs, np.float64))
                )
                probe_w = jnp.sum(probes * minv(probes), axis=0)
                ld = float(
                    precond_logdet(lpc, s2, n)
                    + lanczos_logdet(res.alphas[:, 1:], res.betas[:, 1:], probe_w)
                )
                quad = float(np.dot(np.asarray(y, np.float64), xsol[:, 0]))
                quad64 = float(np.dot(np.asarray(y, np.float64), sol64[:, 0]))
                row[f"{tag}@{iters}"] = {
                    "rel_solve_err": relerr,
                    "true_relres": relres,
                    "logdet_abs_err": abs(ld - ld64),
                    "quad_rel_err": abs(quad - quad64) / abs(quad64),
                    "broke": bool(np.any(np.asarray(res.broke))),
                }
        row["logdet_true"] = ld64
        _log(results, f"cpu-{n}", **row)


# ---------------------------------------------------------------------------
# TPU: wallclock at both precisions
# ---------------------------------------------------------------------------


def run_tpu(sizes):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from nonstationary_precip_tpu.ops.pallas_matvec import make_gibbs_matvec

    results = _load()

    def timeit_scanned(step_fn, carry0, steps=20):
        def make(length):
            @jax.jit
            def chunk(carry):
                def body(c, _):
                    return step_fn(c), None

                c, _ = jax.lax.scan(body, carry, None, length=length)
                return c

            return chunk

        c1, c2 = make(steps), make(2 * steps)
        jax.block_until_ready(c1(carry0))
        jax.block_until_ready(c2(carry0))

        def best_of(f, reps=3):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(f(carry0))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best_of(c2) - best_of(c1)) / steps * 1e3

    for n in sizes:
        x, y, log_ell, s2 = _data(n)
        ell = jnp.exp(log_ell)
        row = {}
        for tag in ("highest", "default", "high3", "vpu"):
            mv = make_gibbs_matvec(x, ell, x, ell, precision=tag)

            def step(v):
                out = mv(v) + s2 * v
                return out / jnp.linalg.norm(out, axis=0, keepdims=True)

            v0 = jnp.ones((n, 9), jnp.float32) / np.sqrt(n)
            ms = timeit_scanned(step, v0, steps=10)
            row[f"matvec_ms_{tag}"] = round(ms, 3)
            # parity of one matvec against the highest-precision kernel
            if tag != "highest":
                ref = make_gibbs_matvec(x, ell, x, ell, precision="highest")(v0)
                got = mv(v0)
                row[f"matvec_rel_err_{tag}"] = float(
                    jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref)
                )
                if ms > 0:
                    row[f"speedup_{tag}"] = round(
                        row["matvec_ms_highest"] / ms, 3
                    )
        _log(results, f"tpu-{n}", **row)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    sizes = [int(a) for a in sys.argv[2:]] or (
        [4096, 8192] if mode == "cpu" else [8192, 16384, 32768]
    )
    if mode == "cpu":
        run_cpu(sizes)
    else:
        run_tpu(sizes)
