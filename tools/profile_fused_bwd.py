#!/usr/bin/env python3
"""Isolate where the fused-kernel TRAINING step loses time vs XLA.

Scan-based timings at N=1024 (ms/iter) for:
  A. vag of the loss through the dispatcher (cond + fused)   [current]
  B. vag of the loss calling gibbs_chol_solve_fused directly [no cond]
  C. vag of the loss on the pure-XLA path                    [baseline]
  D. forward-only fused kernel
  E. the backward pieces standalone: two (N,N)-RHS triangular solves,
     L^T@Lbar matmul, gram VJP
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N, D = 1024, 2
STEPS = 20


def timeit_scanned(step_fn, carry0, steps=STEPS):
    @jax.jit
    def chunk(carry):
        def body(c, _):
            return step_fn(c), None

        c, _ = jax.lax.scan(body, carry, None, length=steps)
        return c

    c = chunk(carry0)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = chunk(carry0)
    jax.block_until_ready(c)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    import nonstationary_precip_tpu.ops.pallas_fused as pf
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    ell0 = jnp.asarray(np.exp(rng.normal(size=(N, D)) * 0.3) + 0.2, jnp.float32)
    log_ell0 = jnp.log(ell0)
    y = jnp.asarray(rng.normal(size=N), jnp.float32)
    s2 = jnp.asarray(0.644, jnp.float32)
    noise = jnp.asarray(0.011, jnp.float32)

    def mll_from(l, a):
        quad = jnp.sum(a * a)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(l)))
        return 0.5 * (quad + logdet)

    def loss_dispatcher(log_ell):
        l, a = pf.gibbs_noisy_chol_alpha(x, jnp.exp(log_ell), y, s2, noise)
        return mll_from(l, a)

    def loss_direct(log_ell):
        l, a = pf.gibbs_chol_solve_fused(x, jnp.exp(log_ell), y, s2, noise)
        return mll_from(l, a)

    def loss_xla(log_ell):
        l, a = pf._reference(x, jnp.exp(log_ell), y, s2, noise)
        return mll_from(l, a)

    def vag_step(loss):
        def step(le):
            v, g = jax.value_and_grad(loss)(le)
            return le - 1e-9 * g + 1e-30 * v

        return step

    for name, loss in [("A_dispatcher", loss_dispatcher), ("B_direct", loss_direct), ("C_xla", loss_xla)]:
        t = timeit_scanned(vag_step(loss), log_ell0)
        print(f"{name}: {t:.3f} ms", flush=True)

    def fwd_step(le):
        l, a = pf.gibbs_chol_solve_fused(x, jnp.exp(le), y, s2, noise)
        return le + 1e-30 * l[0, 0] + 1e-30 * a[0]

    print(f"D_fused_fwd: {timeit_scanned(fwd_step, log_ell0):.3f} ms", flush=True)

    # E: backward pieces
    l0, a0 = jax.jit(pf._reference)(x, ell0, y, s2, noise)
    w = jnp.asarray(rng.normal(size=(N, N)), jnp.float32)

    def tsolve_step(m):
        out = jax.lax.linalg.triangular_solve(l0, m, left_side=True, lower=True, transpose_a=True)
        return m + 1e-30 * out[0, 0]

    print(f"E_tri_solve_NxN: {timeit_scanned(tsolve_step, w):.3f} ms", flush=True)

    def matmul_step(m):
        out = l0.T @ m
        return m + 1e-30 * out[0, 0]

    print(f"E_matmul_NxN: {timeit_scanned(matmul_step, w):.3f} ms", flush=True)

    def gramvjp_step(e):
        _, vjp = jax.vjp(lambda ee: gibbs_gram_reference(x, ee, x, ee), e)
        (g,) = vjp(w)
        return e + 1e-9 * g

    print(f"E_gram_vjp: {timeit_scanned(gramvjp_step, ell0):.3f} ms", flush=True)

    def gram_fwd_step(e):
        g = gibbs_gram_reference(x, e, x, e)
        return e + 1e-30 * g[0, 0]

    print(f"E_gram_fwd: {timeit_scanned(gram_fwd_step, ell0):.3f} ms", flush=True)

    def chol_step(m):
        l = jnp.linalg.cholesky(m + 4.0 * jnp.eye(N))
        return m + 1e-30 * l[0, 0]

    k0 = jnp.asarray(np.eye(N), jnp.float32)
    print(f"E_xla_chol: {timeit_scanned(chol_step, k0):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
