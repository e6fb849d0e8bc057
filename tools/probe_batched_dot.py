#!/usr/bin/env python3
"""Probe: does Mosaic lower a BATCHED dot_general ((T,p,q)@(T,q,r)) —
and if so, is it faster than the per-T python-loop stack that
``_bmm`` / ``_chol_inv_2level_b`` use today?

The fused SVGP precompute's 2-level path (M=250 → 256) chains ~9 batched
matmuls (Newton refinements, panel, Schur, blocked inverse), each
expanded to T=5 sequential 2-D MXU dots on the assumption that Mosaic
has no batched dot.  Each small dot carries ~150-200 ns fixed latency,
so if a batched form lowers, up to ~45 sequential latencies collapse.

Variants (T=5, 128³ each, chained reps, differential timing):
  loop_dot  — jnp.stack([dot(x[i], y[i]) for i])   (current _bmm)
  batch_dot — lax.dot_general with batch dims      (the probe)
  einsum    — jnp.einsum('tij,tjk->tik')           (same, via einsum)

Run: python tools/probe_batched_dot.py [reps]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

T = 5
B = 128


def loop_dot(x, y):
    return jnp.stack(
        [jnp.dot(x[i], y[i], preferred_element_type=jnp.float32) for i in range(T)]
    )


def batch_dot(x, y):
    return jax.lax.dot_general(
        x, y, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def einsum_dot(x, y):
    return jnp.einsum("tij,tjk->tik", x, y, preferred_element_type=jnp.float32)


VARIANTS = {"loop_dot": loop_dot, "batch_dot": batch_dot, "einsum": einsum_dot}


def make_kernel(fn, reps):
    def kernel(x_ref, y_ref, out_ref):
        def body(r, acc):
            return acc + 1e-6 * fn(acc, y_ref[:])

        acc = jax.lax.fori_loop(0, reps, body, x_ref[:])
        out_ref[:] = fn(acc, y_ref[:])

    return kernel


def run_variant(fn, x, y, reps):
    return pl.pallas_call(
        make_kernel(fn, reps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
    )(x, y)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, B, B)), jnp.float32) * 0.1
    y = jnp.asarray(rng.normal(size=(T, B, B)), jnp.float32) * 0.1
    ref = np.einsum("tij,tjk->tik", np.asarray(x), np.asarray(y))

    for name, fn in VARIANTS.items():
        try:
            out = np.asarray(jax.jit(functools.partial(run_variant, fn, reps=0))(x, y))
        except Exception as e:
            print(f"{name}: DOES NOT LOWER — {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            VARIANTS[name] = None
            continue
        err = np.max(np.abs(out - ref))
        print(f"{name}: on-chip maxdiff {err:.2e}", flush=True)

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    for name, fn in VARIANTS.items():
        if fn is None:
            continue
        f1 = jax.jit(functools.partial(run_variant, fn, reps=reps))
        f2 = jax.jit(functools.partial(run_variant, fn, reps=2 * reps))
        jax.block_until_ready(f1(x, y))
        jax.block_until_ready(f2(x, y))

        def best(f):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(f(x, y))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dt = (best(f2) - best(f1)) / reps * 1e6
        print(f"{name}: {dt:.2f} us per (T={T}) 128x128x128 batched matmul",
              flush=True)


if __name__ == "__main__":
    main()
