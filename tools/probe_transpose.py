#!/usr/bin/env python3
"""Probe: derive the batched recurrence's column extraction from a
TRANSPOSE of the row extraction (round-3 candidate; CLAUDE.md #6,
VERDICT #7).

In ``_chol_inv_fused_b`` (ops/pallas_svgp.py) each of the B steps pays
two (T,B,B) masked reductions (raw_col, raw_row) and two (T,B,B)
broadcast-and-reduce diagonal replications (d_col, d_row).  The trailing
matrix stays symmetric under the mask-free update — column j at
rows ≥ j equals row j at lanes ≥ j — so raw_col can be a (T,1,B)→(T,B,1)
``swapaxes`` of raw_row, and the uniform d_col a swapaxes of the uniform
d_row: 2 of the ~8 big per-step ops become small-vector relayouts,
IF Mosaic's relayout is cheaper than the (T,B,B) reduce.

Variants (each (T=5, 128, 128), chained reps, differential timing):
  AI_b_masked    — current _chol_inv_fused_b (baseline, copied verbatim)
  AI_b_transpose — raw_col/dvec/d_col derived by transposition

Run: python tools/probe_transpose.py [reps]
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

from nonstationary_precip_tpu.ops.pallas_svgp import _chol_inv_fused_b  # noqa: E402

T = 5
B = 128


def _chol_inv_fused_b_transpose(a):
    """Transpose-derived column variant of _chol_inv_fused_b."""
    t, b, _ = a.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, b, b), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, b, b), 2)
    eye = jnp.where(rows == cols, 1.0, 0.0).astype(a.dtype)

    def step(j, carry):
        a, x = carry
        colmask = cols == j
        rowmask = rows == j
        # ONE (T,B,B) masked reduce: the row extraction; the column is its
        # transpose (trailing symmetry: col j rows ≥ j == row j lanes ≥ j,
        # and both consumers mask to rows ≥ j)
        raw_row = jnp.sum(jnp.where(rowmask, a, 0.0), axis=-2, keepdims=True)
        raw_col = jnp.swapaxes(raw_row, -1, -2)  # (T,B,1)
        drow = jnp.where(cols[:, :1, :] == j, raw_row, 0.0)  # (T,1,B) one-hot
        # ONE broadcast-and-reduce replication; the other orientation is a
        # transpose of the (uniform) result
        dvec = jnp.swapaxes(drow, -1, -2)  # (T,B,1) one-hot
        d_row = jnp.sum(jnp.broadcast_to(dvec, (t, b, b)), axis=-2, keepdims=True)
        d_col = jnp.swapaxes(d_row, -1, -2)  # uniform → transpose is exact
        isq_col = jax.lax.rsqrt(d_col)
        isq_row = jax.lax.rsqrt(d_row)
        col = jnp.where(rows[:, :, :1] >= j, raw_col * isq_col, 0.0)
        rowv = jnp.where(cols[:, :1, :] >= j, raw_row * isq_row, 0.0)
        a = a - col * rowv
        a = jnp.where(colmask, col, a)

        lrow_lt = jnp.where(cols[:, :1, :] < j, raw_row, 0.0)
        e_j = jnp.where(cols[:, :1, :] == j, 1.0, 0.0).astype(a.dtype)
        prod = jnp.swapaxes(lrow_lt, -1, -2) * x
        contrib = jnp.sum(prod, axis=-2, keepdims=True)
        xrow = (e_j - contrib) * isq_row
        x = jnp.where(rowmask, xrow, x)
        return a, x

    a, x = jax.lax.fori_loop(0, b, step, (a, eye))
    return jnp.where(rows >= cols, a, 0.0), x


VARIANTS = {
    "AI_b_masked": _chol_inv_fused_b,
    "AI_b_transpose": _chol_inv_fused_b_transpose,
}


def make_kernel(fn, reps):
    def kernel(a_ref, out_ref):
        def body(r, acc):
            l, li = fn(acc)
            return acc + 1e-12 * (l + 1e-3 * li)

        acc = jax.lax.fori_loop(0, reps, body, a_ref[:])
        l, li = fn(acc)
        out_ref[:] = l + 1e-3 * li

    return kernel


def run_variant(fn, mat, reps):
    return pl.pallas_call(
        make_kernel(fn, reps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
    )(mat)


def main():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(T, B, B)).astype(np.float32)
    spd = np.einsum("tij,tkj->tik", base, base) / B + 2.0 * np.eye(B, dtype=np.float32)
    mat = jnp.asarray(spd)
    ref_l = np.linalg.cholesky(np.asarray(spd, np.float64))
    ref = ref_l + 1e-3 * np.linalg.inv(ref_l)

    for name, fn in VARIANTS.items():
        out = np.asarray(jax.jit(functools.partial(run_variant, fn, reps=0))(mat))
        err = np.max(np.abs(out - ref))
        print(f"{name}: on-chip maxdiff {err:.2e}", flush=True)
        assert err < 5e-4, name

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    for name, fn in VARIANTS.items():
        f1 = jax.jit(functools.partial(run_variant, fn, reps=reps))
        f2 = jax.jit(functools.partial(run_variant, fn, reps=2 * reps))
        jax.block_until_ready(f1(mat))
        jax.block_until_ready(f2(mat))

        def best(f):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(f(mat))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dt = (best(f2) - best(f1)) / reps * 1e6
        print(
            f"{name}: {dt:.2f} us per (T={T})-batched 128-chol+inv "
            f"({dt/B*1e3:.0f} ns/step)",
            flush=True,
        )


if __name__ == "__main__":
    main()
