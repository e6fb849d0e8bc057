#!/usr/bin/env python3
"""On-chip validation + differential timing of chol_inv_batched_v2 (the
leading-dim-batched 3-level Pallas kernel) vs the XLA composition
(batched cholesky + batched triangular solve for the inverse) at the
gibbs-10-split shapes.  Run alone on the TPU."""

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

from nonstationary_precip_tpu.ops.pallas_chol import chol_inv_batched_v2  # noqa: E402

STEPS = 50


def timeit_scanned(step_fn, carry0, steps=STEPS):
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

    def med3(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(carry0))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    return (med3(c2) - med3(c1)) / steps * 1e3


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    for t, n in ((10, 316), (10, 384), (5, 256)):
        base = rng.normal(size=(t, n, n))
        spd = np.einsum("tij,tkj->tik", base, base) + n * np.eye(n)
        a = jnp.asarray(spd, jnp.float32)

        # exactness on chip
        l, li = jax.jit(chol_inv_batched_v2)(a)
        ref = np.linalg.cholesky(spd)
        err_l = np.max(np.abs(np.asarray(l) - ref)) / np.abs(ref).max()
        resid = np.einsum("tij,tjk->tik", np.asarray(li), ref) - np.eye(n)
        print(f"T={t} N={n}: on-chip L relerr {err_l:.2e}  X·L−I {np.max(np.abs(resid)):.2e}", flush=True)

        # differential timing: chained perturbation so scan can't hoist
        def pallas_step(carry):
            m, acc = carry
            m2 = m + acc * 1e-30
            l, li = chol_inv_batched_v2(m2)
            return m, acc + jnp.sum(l[:, :1, :1]) * 1e-20 + jnp.sum(li[:, :1, :1]) * 1e-20

        def xla_step(carry):
            m, acc = carry
            m2 = m + acc * 1e-30
            l = jnp.linalg.cholesky(m2)
            eye = jnp.broadcast_to(jnp.eye(n, dtype=m.dtype), l.shape)
            li = jax.lax.linalg.triangular_solve(l, eye, left_side=True, lower=True)
            return m, acc + jnp.sum(l[:, :1, :1]) * 1e-20 + jnp.sum(li[:, :1, :1]) * 1e-20

        carry0 = (a, jnp.asarray(0.0, jnp.float32))
        ms_p = timeit_scanned(pallas_step, carry0)
        ms_x = timeit_scanned(xla_step, carry0)
        print(f"T={t} N={n}: pallas {ms_p:.3f} ms  xla {ms_x:.3f} ms  ({ms_x/ms_p:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
