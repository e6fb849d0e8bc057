#!/usr/bin/env python3
"""Round-2 TPU kernel measurements, batched into one process:

  1. fused Gibbs MAP-loss kernel (ops/pallas_fused.py) vs the XLA+Pallas
     composition — forward AND value_and_grad step, N = 512/1024/1536;
  2. streaming Cholesky v2 (GEMM formulation) vs v1 vs XLA,
     N = 2048/4096/8192;
  3. exactness spot checks on-chip for both new kernels.

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


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def log(name, **kw):
    results[name] = kw
    print(name, kw, flush=True)
    OUT.write_text(json.dumps(results, indent=2))


def bench_fused():
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram
    from nonstationary_precip_tpu.ops.linalg import safe_cholesky, tri_solve
    import nonstationary_precip_tpu.ops.pallas_fused as pf

    rng = np.random.default_rng(0)
    for n in (512, 1024, 1536):
        d = 2
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        ell = jnp.asarray(np.exp(rng.normal(size=(n, d)) * 0.3) + 0.2, jnp.float32)
        y = jnp.asarray(rng.normal(size=n), jnp.float32)
        s2 = jnp.asarray(0.644, jnp.float32)
        noise = jnp.asarray(0.011, jnp.float32)

        @jax.jit
        def fwd_fused(x, ell, y, s2, noise):
            return pf.gibbs_chol_solve_fused(x, ell, y, s2, noise)

        @jax.jit
        def fwd_xla(x, ell, y, s2, noise):
            k = s2 * gibbs_gram(x, ell, x, ell, use_pallas=False) + noise * jnp.eye(n)
            chol = safe_cholesky(k)
            return chol, tri_solve(chol, y)

        # NOTE: fwd_xla IS the round-1 default mix — safe_cholesky's
        # dispatcher routes 768 ≤ N ≤ 1280 to the Pallas blocked kernel.

        # exactness on chip
        cf, af = fwd_fused(x, ell, y, s2, noise)
        cx, ax = fwd_xla(x, ell, y, s2, noise)
        maxdiff_c = float(jnp.max(jnp.abs(cf - cx)))
        maxdiff_a = float(jnp.max(jnp.abs(af - ax)))

        t_fused = timeit(fwd_fused, x, ell, y, s2, noise)
        t_xla = timeit(fwd_xla, x, ell, y, s2, noise)

        # full MAP-loss value_and_grad step (the training hot path)
        from nonstationary_precip_tpu.models import GibbsExactGP
        from nonstationary_precip_tpu.priors import LogNormalProcess

        prior = LogNormalProcess.create(d, mean=float(np.log(0.3)), outputscale=1.0, lengthscale=1.3)
        model = GibbsExactGP.create(x, prior, noise=0.011, outputscale=0.644)
        pc = prior.gram_chol(x)

        vag_fused = jax.jit(jax.value_and_grad(lambda m: m.loss(x, y, pc)))
        import os

        t_step_fused = timeit(vag_fused, model, iters=10)

        os.environ["NSGP_PALLAS_FUSED"] = "0"
        vag_xla = jax.jit(jax.value_and_grad(lambda m: m.loss(x, y, pc)))

        t_step_xla = timeit(vag_xla, model, iters=10)
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
    for n in (2048, 4096, 8192):
        a = rng.normal(size=(n, 256)).astype(np.float32)
        mat = jnp.asarray(a @ a.T / 256 + 4.0 * np.eye(n, dtype=np.float32))

        f_xla = jax.jit(jnp.linalg.cholesky)
        f_v1 = jax.jit(pc._forward_streaming)
        f_v2 = jax.jit(pc._forward_streaming2)

        l_xla = f_xla(mat)
        l_v2 = f_v2(mat)
        maxdiff = float(jnp.max(jnp.abs(jnp.tril(l_v2) - jnp.tril(l_xla))))

        t_xla = timeit(f_xla, mat, iters=10)
        t_v2 = timeit(f_v2, mat, iters=10)
        t_v1 = timeit(f_v1, mat, iters=10) if n <= pc.MAX_N_STREAM else None

        log(
            f"stream_n{n}",
            xla_ms=round(t_xla, 3),
            v1_ms=round(t_v1, 3) if t_v1 else None,
            v2_ms=round(t_v2, 3),
            maxdiff=maxdiff,
        )


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), jax.devices())
    if which in ("all", "fused"):
        bench_fused()
    if which in ("all", "stream"):
        bench_streaming()
