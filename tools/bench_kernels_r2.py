#!/usr/bin/env python3
"""Round-2 TPU kernel measurements — scan-based timing (N iterations of
the op inside ONE jitted program, so per-call axon-tunnel dispatch
overhead doesn't contaminate the numbers; same methodology as bench.py):

  1. fused Gibbs MAP-loss kernel (ops/pallas_fused.py) vs the XLA+Pallas
     composition — forward AND full Adam training step, N = 512/1024/1536;
  2. streaming Cholesky v2 (GEMM formulation) vs v1 vs XLA,
     N = 2048/4096/8192;
  3. exactness spot checks on-chip.

Writes tools/bench_kernels_r2.json.  Run alone (never share the TPU).
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

OUT = Path(__file__).parent / "bench_kernels_r2.json"
results = {}
STEPS = 20


def timeit_scanned(step_fn, carry0, steps=STEPS):
    """ms per step of `carry -> carry`, DIFFERENTIAL: time scan programs of
    length `steps` and `2*steps` and divide the difference — cancels the
    per-program dispatch constant (measured ~25-30 ms through the axon
    tunnel, which swamps single-digit-ms kernels at small step counts)."""

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

    t1 = best_of(c1)
    t2 = best_of(c2)
    return (t2 - t1) / steps * 1e3


def log(name, **kw):
    results[name] = kw
    print(name, kw, flush=True)
    OUT.write_text(json.dumps(results, indent=2))


def bench_fused():
    import os

    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram
    from nonstationary_precip_tpu.models import GibbsExactGP
    from nonstationary_precip_tpu.ops.linalg import safe_cholesky, tri_solve
    from nonstationary_precip_tpu.priors import LogNormalProcess
    import nonstationary_precip_tpu.ops.pallas_fused as pf
    import optax

    rng = np.random.default_rng(0)
    for n in (512, 1024, 1536):
        d = 2
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        ell0 = jnp.asarray(np.exp(rng.normal(size=(n, d)) * 0.3) + 0.2, jnp.float32)
        y = jnp.asarray(rng.normal(size=n), jnp.float32)
        s2 = jnp.asarray(0.644, jnp.float32)
        noise = jnp.asarray(0.011, jnp.float32)

        # exactness on chip
        cf, af = jax.jit(pf.gibbs_chol_solve_fused)(x, ell0, y, s2, noise)

        def xla_fwd(ell):
            k = s2 * gibbs_gram(x, ell, x, ell, use_pallas=False) + noise * jnp.eye(n)
            chol = safe_cholesky(k)
            return chol, tri_solve(chol, y)

        cx, ax = jax.jit(xla_fwd)(ell0)
        maxdiff_c = float(jnp.max(jnp.abs(cf - cx)))
        maxdiff_a = float(jnp.max(jnp.abs(af - ax)))

        # forward-only: chain ell through the output to defeat CSE/DCE
        def fwd_fused_step(ell):
            l, a = pf.gibbs_chol_solve_fused(x, ell, y, s2, noise)
            return ell + 1e-30 * l[0, 0] + 1e-30 * a[0]

        def fwd_xla_step(ell):
            l, a = xla_fwd(ell)
            return ell + 1e-30 * l[0, 0] + 1e-30 * a[0]

        t_fused = timeit_scanned(fwd_fused_step, ell0)
        t_xla = timeit_scanned(fwd_xla_step, ell0)

        # full MAP-loss Adam step (the training hot path)
        prior = LogNormalProcess.create(
            d, mean=float(np.log(0.3)), outputscale=1.0, lengthscale=1.3
        )
        model0 = GibbsExactGP.create(x, prior, noise=0.011, outputscale=0.644)
        pc = prior.gram_chol(x)
        optimizer = optax.adam(0.01)

        def make_step():
            def step(carry):
                m, s = carry
                _, grads = jax.value_and_grad(lambda mm: mm.loss(x, y, pc))(m)
                updates, s = optimizer.update(grads, s, m)
                return optax.apply_updates(m, updates), s

            return step

        carry0 = (model0, optimizer.init(model0))
        t_step_fused = timeit_scanned(make_step(), carry0)
        os.environ["NSGP_PALLAS_FUSED"] = "0"
        t_step_xla = timeit_scanned(make_step(), carry0)
        os.environ["NSGP_PALLAS_FUSED"] = "1"

        log(
            f"fused_n{n}",
            fwd_fused_ms=round(t_fused, 3),
            fwd_xla_ms=round(t_xla, 3),
            step_fused_ms=round(t_step_fused, 3),
            step_xla_ms=round(t_step_xla, 3),
            maxdiff_chol=maxdiff_c,
            maxdiff_alpha=maxdiff_a,
        )


def bench_streaming():
    import nonstationary_precip_tpu.ops.pallas_chol as pc

    rng = np.random.default_rng(1)
    # r3 window re-measurement (VERDICT #2): 3072 and 6144 added — the
    # calm-session 2048-parity signal said the gates were tuned during
    # the volatile 2026-08-17 service and leave wins on the table
    for n in (2048, 3072, 4096, 6144, 8192):
        a = rng.normal(size=(n, 256)).astype(np.float32)
        mat0 = jnp.asarray(a @ a.T / 256 + 4.0 * np.eye(n, dtype=np.float32))

        l_xla = jax.jit(jnp.linalg.cholesky)(mat0)
        l_v2 = jax.jit(pc._forward_streaming2)(mat0)
        maxdiff = float(jnp.max(jnp.abs(jnp.tril(l_v2) - jnp.tril(l_xla))))

        def step_of(f):
            def step(mat):
                l = f(mat)
                return mat + (1e-30 * l[0, 0]) * jnp.eye(n, dtype=mat.dtype)

            return step

        t_xla = timeit_scanned(step_of(jnp.linalg.cholesky), mat0, steps=10)
        t_v2 = timeit_scanned(step_of(pc._forward_streaming2), mat0, steps=10)
        t_v1 = timeit_scanned(step_of(pc._forward_streaming), mat0, steps=10)

        log(
            f"stream_n{n}",
            xla_ms=round(t_xla, 3),
            v1_ms=round(t_v1, 3),
            v2_ms=round(t_v2, 3),
            maxdiff=maxdiff,
        )


def bench_vmem_chol():
    """Fair (differential) blocked_cholesky vs XLA chol at the dispatch
    window sizes — round-1's 2.1×@1024 claim was dispatch-contaminated."""
    import nonstationary_precip_tpu.ops.pallas_chol as pc

    rng = np.random.default_rng(2)
    for n in (768, 1024, 1280):
        a = rng.normal(size=(n, 128)).astype(np.float32)
        mat0 = jnp.asarray(a @ a.T / 128 + 4.0 * np.eye(n, dtype=np.float32))

        def step_of(f):
            def step(mat):
                l = f(mat)
                return mat + (1e-30 * l[0, 0]) * jnp.eye(n, dtype=mat.dtype)

            return step

        t_xla = timeit_scanned(step_of(jnp.linalg.cholesky), mat0, steps=50)
        t_pal = timeit_scanned(step_of(pc._forward), mat0, steps=50)
        maxdiff = float(
            jnp.max(jnp.abs(jax.jit(pc._forward)(mat0) - jax.jit(jnp.linalg.cholesky)(mat0)))
        )
        log(f"vmemchol_n{n}", xla_ms=round(t_xla, 3), pallas_ms=round(t_pal, 3), maxdiff=maxdiff)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), jax.devices())
    if which in ("all", "fused"):
        bench_fused()
    if which in ("all", "stream"):
        bench_streaming()
    if which in ("all", "vmemchol"):
        bench_vmem_chol()
