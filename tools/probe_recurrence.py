#!/usr/bin/env python3
"""Probe per-step cost of the 128-wide Cholesky recurrence variants.

The streaming/fused kernels' wall-time floor is n sequential column steps
(~0.3 µs each) of the masked recurrence (_chol_inv_fused).  Candidates:

  A masked   — current: column/row extraction via masked lane/sublane
               reductions (ops/pallas_chol.py)
  B dynslice — row via dynamic sublane slice of the symmetric image +
               column via MXU matvec with a one-hot (B,1) selector
  C twocol   — two columns per iteration, rank-2 MXU trailing update
  D leftlu   — left-looking bordered steps, MXU one-hot row extraction
  L leafN    — recursive 2×2 blocking down to a (N,N) recurrence leaf

Each variant factorises a (128,128) tile REPS times inside one kernel
(sequentially chained through the input so steps can't be elided), timed
differentially.  Exactness asserted against numpy first.

MEASURED VERDICT (v5e, reps=200 best-of-5, 2026-08-16): the masked
recurrence is the floor.  Three independent attacks all fail to beat it:

  A_masked   36.4 us / 128-chol      AI_masked (chol+inv)  47.3 us
  C_twocol   ~= A (rank-2 doubles per-step work, halves steps — wash)
  D_leftlu   564-905 us — small sequential MXU matvecs carry ~150-200 ns
             fixed latency each; 4-5 dependent per step kill it
  AI_leaf64  49.0 us — sub-128-lane tiles do NOT halve op cost; the
             slice/concat relayouts of the recursion eat the savings
  AI_leaf32  40.5 us (1.17x) — real but far from the ~1.7x needed to
             flip the N=4096 streaming-chol window

Conclusion: XLA keeps the 2048-4096 dense-Cholesky window
(ops/pallas_chol.py dispatch); the Pallas streaming kernel's win starts
at ~6144 where its GEMM formulation amortises the recurrence.
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

from nonstationary_precip_tpu.ops.pallas_chol import _masked_chol_block  # noqa: E402

B = 128


def _chol_dynslice(a):
    """Variant B: dynamic sublane slices + MXU one-hot matvec."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

    def step(j, a):
        row = jax.lax.dynamic_slice(a, (j, 0), (1, B))  # (1, B) sublane-dyn
        diag = jnp.sum(jnp.where(cols[:1, :] == j, row, 0.0))
        inv_sqrt = jax.lax.rsqrt(diag)
        e_j = jnp.where(rows_c == j, 1.0, 0.0).astype(a.dtype)  # (B, 1)
        col = jnp.dot(a, e_j, preferred_element_type=a.dtype) * inv_sqrt
        col = jnp.where(rows_c >= j, col, 0.0)
        rowv = row * inv_sqrt
        rowv = jnp.where(cols[:1, :] >= j, rowv, 0.0)
        a = jnp.where(cols == j, col, a)
        trail = (rows > j) & (cols > j)
        return a - jnp.where(trail, col * rowv, 0.0)

    a = jax.lax.fori_loop(0, B, step, a)
    return jnp.where(rows >= cols, a, 0.0)


def _chol_twocol(a):
    """Variant C: two columns per iteration, rank-2 MXU trailing update."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

    def step(i, a):
        j = 2 * i
        # column j
        cmask_j = cols == j
        d_j = jnp.sum(jnp.where(cmask_j & (rows == j), a, 0.0))
        isq_j = jax.lax.rsqrt(d_j)
        col_j = jnp.sum(jnp.where(cmask_j, a, 0.0), axis=1, keepdims=True) * isq_j
        col_j = jnp.where(rows_c >= j, col_j, 0.0)
        # column j+1 gets col_j's rank-1 correction on the fly
        cmask_k = cols == j + 1
        colk_raw = jnp.sum(jnp.where(cmask_k, a, 0.0), axis=1, keepdims=True)
        lj_k = jnp.sum(jnp.where(rows_c == j + 1, col_j, 0.0))
        colk = colk_raw - lj_k * col_j
        d_k = jnp.sum(jnp.where(rows_c == j + 1, colk, 0.0))
        isq_k = jax.lax.rsqrt(d_k)
        col_k = jnp.where(rows_c >= j + 1, colk * isq_k, 0.0)
        # write both columns
        a = jnp.where(cmask_j, col_j, a)
        a = jnp.where(cmask_k, col_k, a)
        # rank-2 trailing update via MXU: P (B,2) @ P^T rows
        p = jnp.concatenate([col_j, col_k], axis=1)  # (B, 2)
        upd = jnp.dot(p, p.T, preferred_element_type=a.dtype)
        trail = (rows > j + 1) & (cols > j + 1)
        return a - jnp.where(trail, upd, 0.0)

    a = jax.lax.fori_loop(0, B // 2, step, a)
    return jnp.where(rows >= cols, a, 0.0)


def _chol_leftlooking_lu(a):
    """Variant D: LEFT-LOOKING bordered factorisation maintaining both L
    and U = Lᵀ.  The per-step trailing rank-1 update (the masked
    variant's dominant full-tile cost) disappears: column j is produced
    directly as  c = A[j,:] − L[j,:]·Uᵖʳᵉᵛ  via small MXU matvecs against
    the factor built so far.  Row extraction is an MXU one-hot matvec;
    the (1,B)→(B,1) transpose needed to write L's column goes through
    the diag-matrix trick  D = diag(urow), ucol = D·1  (no Mosaic vector
    transpose required)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    diag_mask = rows == cols
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    ones_col = jnp.ones((B, 1), jnp.float32)

    def step(j, carry):
        l, u = carry
        e_row = jnp.where(lane == j, 1.0, 0.0).astype(jnp.float32)  # (1,B)
        r = jnp.dot(e_row, l, preferred_element_type=jnp.float32)  # L[j,:] (<j)
        a_row = jnp.dot(e_row, a, preferred_element_type=jnp.float32)
        corr = jnp.dot(r, u, preferred_element_type=jnp.float32)
        c_row = a_row - corr
        d = jnp.sum(jnp.where(lane == j, c_row, 0.0))
        isq = jax.lax.rsqrt(d)
        urow = jnp.where(lane >= j, c_row * isq, 0.0)  # (1,B)
        u = jnp.where(rows == j, urow, u)
        dmat = jnp.where(diag_mask, urow, 0.0)  # broadcasts over rows
        ucol = jnp.dot(dmat, ones_col, preferred_element_type=jnp.float32)
        l = jnp.where(cols == j, ucol, l)
        return l, u

    zero = jnp.zeros((B, B), jnp.float32)
    l, _ = jax.lax.fori_loop(0, B, step, (zero, zero))
    return l


def _chol_inv_leftlooking_lu(a):
    """Variant DI: variant D with the L⁻¹ row recurrence riding along
    (one extra MXU matvec + one masked row write per step) — the drop-in
    candidate for ops/pallas_chol.py::_chol_inv_fused."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    diag_mask = rows == cols
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    ones_col = jnp.ones((B, 1), jnp.float32)

    def step(j, carry):
        l, u, x = carry
        e_row = jnp.where(lane == j, 1.0, 0.0).astype(jnp.float32)
        rowmask = rows == j
        r = jnp.dot(e_row, l, preferred_element_type=jnp.float32)
        a_row = jnp.dot(e_row, a, preferred_element_type=jnp.float32)
        corr = jnp.dot(r, u, preferred_element_type=jnp.float32)
        c_row = a_row - corr
        d = jnp.sum(jnp.where(lane == j, c_row, 0.0))
        isq = jax.lax.rsqrt(d)
        urow = jnp.where(lane >= j, c_row * isq, 0.0)
        u = jnp.where(rowmask, urow, u)
        dmat = jnp.where(diag_mask, urow, 0.0)
        ucol = jnp.dot(dmat, ones_col, preferred_element_type=jnp.float32)
        l = jnp.where(cols == j, ucol, l)
        # inverse row j: r holds exactly L[j, <j] (col j unwritten at read)
        contrib = jnp.dot(r, x, preferred_element_type=jnp.float32)
        xrow = (e_row - contrib) * isq
        x = jnp.where(rowmask, xrow, x)
        return l, u, x

    zero = jnp.zeros((B, B), jnp.float32)
    l, _, x = jax.lax.fori_loop(0, B, step, (zero, zero, zero))
    return l, x


def _ai_masked(a):
    from nonstationary_precip_tpu.ops.pallas_chol import _chol_inv_fused

    return _chol_inv_fused(a)


def _chol_inv_rec_leaf(d, leaf):
    """Variant L: recursive 2×2 blocking with a SMALLER recurrence leaf.
    Hypothesis from the D-variant probe: per-step cost is full-tile VPU
    throughput-bound (16 vregs for a (128,128) tile), so a (64,64) leaf
    halves per-step cost at the same total step count, trading a handful
    of extra small MXU matmuls in the block algebra."""
    from nonstationary_precip_tpu.ops.pallas_chol import _chol_inv_fused

    b = d.shape[0]
    if b <= leaf:
        return _chol_inv_fused(d)
    h = b // 2
    l11, i11 = _chol_inv_rec_leaf(d[:h, :h], leaf)
    l21 = jnp.dot(d[h:, :h], i11.T, preferred_element_type=jnp.float32)
    l22, i22 = _chol_inv_rec_leaf(
        d[h:, h:] - jnp.dot(l21, l21.T, preferred_element_type=jnp.float32), leaf
    )
    zero = jnp.zeros((h, h), jnp.float32)
    ilow = -jnp.dot(
        i22,
        jnp.dot(l21, i11, preferred_element_type=jnp.float32),
        preferred_element_type=jnp.float32,
    )
    l = jnp.concatenate(
        [jnp.concatenate([l11, zero], axis=1), jnp.concatenate([l21, l22], axis=1)],
        axis=0,
    )
    linv = jnp.concatenate(
        [jnp.concatenate([i11, zero], axis=1), jnp.concatenate([ilow, i22], axis=1)],
        axis=0,
    )
    return l, linv


VARIANTS = {
    "A_masked": _masked_chol_block,
    # B_dynslice is NOT Mosaic-lowerable: dynamic_slice on VALUES is an
    # unimplemented primitive (only refs support pl.ds indexing) — kept
    # above for the record
    "C_twocol": _chol_twocol,
    "D_leftlu": _chol_leftlooking_lu,
}

# (chol, inv) variants — measured separately because the baseline is
# _chol_inv_fused, the actual diagonal-work primitive of the streaming
# kernels
VARIANTS_INV = {
    "AI_masked": _ai_masked,
    "DI_leftlu": _chol_inv_leftlooking_lu,
    "AI_leaf64": functools.partial(_chol_inv_rec_leaf, leaf=64),
    "AI_leaf32": functools.partial(_chol_inv_rec_leaf, leaf=32),
    "AI_leaf16": functools.partial(_chol_inv_rec_leaf, leaf=16),
}


def make_kernel(fn, reps):
    def kernel(a_ref, out_ref):
        def body(r, acc):
            out = fn(acc)
            l = out[0] + 1e-3 * out[1] if isinstance(out, tuple) else out
            # chain: rebuild an SPD-ish input from the factor so reps are
            # sequentially dependent and can't be collapsed
            return acc + 1e-12 * l

        acc = jax.lax.fori_loop(0, reps, body, a_ref[:])
        out = fn(acc)
        out_ref[:] = out[0] + 1e-3 * out[1] if isinstance(out, tuple) else out

    return kernel


def run_variant(name, fn, mat, reps):
    out = pl.pallas_call(
        make_kernel(fn, reps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, B), jnp.float32),
    )(mat)
    return out


def main():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(B, B)).astype(np.float32)
    mat = jnp.asarray(a @ a.T / B + 2.0 * np.eye(B, dtype=np.float32))
    ref = np.linalg.cholesky(np.asarray(mat, np.float64))

    refinv = np.linalg.inv(ref)
    all_variants = {**VARIANTS, **VARIANTS_INV}

    # exactness ON CHIP (interpret mode through the axon backend would
    # round-trip every tiny op; CPU-interpret exactness is covered by the
    # standalone check in this file's development notes)
    for name, fn in VARIANTS.items():
        l = np.asarray(jax.jit(functools.partial(run_variant, name, fn, reps=0))(mat))
        err = np.max(np.abs(l - ref))
        print(f"{name}: on-chip maxdiff {err:.2e}", flush=True)
        assert err < 5e-4, name
    for name, fn in VARIANTS_INV.items():
        # the harness emits L + 1e-3·L⁻¹ (single-output probe kernel)
        l = np.asarray(jax.jit(functools.partial(run_variant, name, fn, reps=0))(mat))
        err = np.max(np.abs(l - (ref + 1e-3 * refinv)))
        print(f"{name}: on-chip maxdiff {err:.2e}", flush=True)
        assert err < 5e-4, name

    # differential timing on chip: reps vs 2*reps.  reps=200/best-of-5:
    # the original reps=50/best-of-3 showed inter-run variance larger
    # than the effects under test (one run measured A_masked NEGATIVE).
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    for name, fn in all_variants.items():
        if only and name not in only:
            continue
        f1 = jax.jit(functools.partial(run_variant, name, fn, reps=reps))
        f2 = jax.jit(functools.partial(run_variant, name, fn, reps=2 * reps))
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
        print(f"{name}: {dt:.2f} us per 128-chol ({dt/128*1e3:.0f} ns/step)", flush=True)


if __name__ == "__main__":
    main()
