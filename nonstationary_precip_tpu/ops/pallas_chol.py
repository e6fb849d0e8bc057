"""Blocked right-looking Cholesky as a single Pallas TPU kernel.

This is the explicit-native replacement for the factorisation GPyTorch's
``psd_safe_cholesky`` delegates to (SURVEY.md §2.5): at this workload's
sizes (N ≈ 300–1800) the entire matrix fits in VMEM, so the whole
factorisation runs as ONE kernel launch — no per-block HLO While-loop
round-trips like XLA's stock TPU lowering.

Algorithm (block size B = 128, K = N/B block steps, statically unrolled):
  1. factor the diagonal block with a 128-step masked column-Cholesky
     (fori_loop; columns/rows are extracted with masked lane/sublane
     reductions — no dynamic lane indexing, the trailing block stays
     symmetric so the row vector is read from the symmetric image);
  2. invert the 128×128 diagonal factor by masked forward substitution
     (fori_loop of (1,128)@(128,128) MXU matvecs);
  3. panel update  P ← P L_kk⁻ᵀ  — one MXU matmul;
  4. trailing update  A₂₂ ← A₂₂ − P Pᵀ — one big MXU matmul (the N³/3
     FLOPs live here).

N is padded to a 128 multiple with an identity diagonal
(exact: chol(diag(A, I)) = diag(chol(A), I)).

Differentiation: custom VJP that recomputes through XLA's factorisation —
numerically the standard Cholesky pullback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
# in + out f32 N² buffers must fit VMEM (~16 MB/core).  Input/output
# aliasing would halve this but miscompiles on Mosaic (validated 2026-08:
# aliased kernel NaNs on v5e, unaliased is exact) — so two buffers it is.
MAX_N = 1280


def eligible(mat) -> bool:
    """Opt-in gate (NSGP_PALLAS_CHOL_VMEM=1).

    Round-1 measured this kernel 2.1× XLA at n=1024, but that comparison
    carried the ~28 ms per-program axon dispatch in both numbers; fair
    differential timing (2026-08-16) shows XLA ahead standalone —
    n=1024: 0.205 vs 0.392 ms; n=1280: 0.279 vs 0.494.  The VMEM-resident
    factorisation still pays off where it FUSES with neighbours (the
    gram→chol→solve kernel in pallas_fused.py wins its training step
    1.49× at n=1024), so the standalone kernel stays opt-in as the
    building block and validated alternative."""
    import os

    if os.environ.get("NSGP_PALLAS_CHOL_VMEM", "0") != "1":
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    if mat.dtype != jnp.float32 or mat.ndim != 2:
        return False
    n = mat.shape[-1]
    return 768 <= n <= MAX_N


def stream2_eligible(mat) -> bool:
    """Dispatch gate for the GEMM-formulation streaming kernel (v2):
    f32, MIN_N_STREAM2 ≤ N ≤ MAX_N_STREAM, TPU backend
    (disable via NSGP_PALLAS_CHOL=0)."""
    import os

    if os.environ.get("NSGP_PALLAS_CHOL", "1") != "1":
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    if mat.dtype != jnp.float32 or mat.ndim != 2:
        return False
    n = mat.shape[-1]
    return MIN_N_STREAM2 <= n <= MAX_N_STREAM


def _masked_chol_block(a):
    """Unblocked Cholesky of a symmetric (B, B) tile via 128 masked
    right-looking rank-1 updates."""
    b = a.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)

    def step(j, a):
        colmask = col_ids == j
        rowmask = row_ids == j
        # shared raw extractions (see _chol_inv_fused): lane j of the raw
        # row is the pivot diagonal
        raw_col = jnp.sum(jnp.where(colmask, a, 0.0), axis=1, keepdims=True)
        raw_row = jnp.sum(jnp.where(rowmask, a, 0.0), axis=0, keepdims=True)
        diag = jnp.sum(jnp.where(col_ids[:1, :] == j, raw_row, 0.0))
        inv_sqrt = jax.lax.rsqrt(diag)
        # column j (rows ≥ j) and its symmetric row image (cols ≥ j)
        col = jnp.where(row_ids[:, :1] >= j, raw_col * inv_sqrt, 0.0)
        row = jnp.where(col_ids[:1, :] >= j, raw_row * inv_sqrt, 0.0)
        # mask-free trailing rank-1 update then column write (see
        # _chol_inv_fused for the read-after-write audit)
        a = a - col * row
        return jnp.where(colmask, col, a)

    a = jax.lax.fori_loop(0, b, step, a)
    return jnp.where(row_ids >= col_ids, a, 0.0)


def _tri_inv_block(l):
    """L⁻¹ for lower-triangular (B, B) via masked forward substitution."""
    b = l.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    eye = jnp.where(row_ids == col_ids, 1.0, 0.0).astype(l.dtype)

    def step(j, x):
        rowmask = row_ids == j
        lrow = jnp.sum(jnp.where(rowmask, l, 0.0), axis=0, keepdims=True)  # (1,B)
        diag = jnp.sum(jnp.where(col_ids[:1, :] == j, lrow, 0.0))
        lrow_lt = jnp.where(col_ids[:1, :] < j, lrow, 0.0)
        e_j = jnp.where(col_ids[:1, :] == j, 1.0, 0.0).astype(l.dtype)
        xrow = (e_j - jnp.dot(lrow_lt, x, preferred_element_type=l.dtype)) / diag
        return jnp.where(rowmask, xrow, x)

    return jax.lax.fori_loop(0, b, step, eye)


def _chol_inv_fused(a):
    """(chol(A), chol(A)⁻¹) of a symmetric (B, B) tile in ONE B-step loop.

    The forward substitution for L⁻¹ row j needs exactly the entries of L
    row j that the right-looking factorisation has finalised by step j
    (cols < j were written at their own steps; col j is written this
    step), so the inverse rides along and the sequential step count halves
    versus running `_masked_chol_block` + `_tri_inv_block` back to back —
    which is the dominant cost of the streaming kernel's diagonal work.
    """
    b = a.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    eye = jnp.where(row_ids == col_ids, 1.0, 0.0).astype(a.dtype)

    def step(j, carry):
        a, x = carry
        colmask = col_ids == j
        rowmask = row_ids == j
        # the raw row extraction is shared three ways (same structural
        # reuse as the batched recurrence in pallas_svgp, measured there
        # at 1627→1948 steps/s): its lane j holds the pivot diagonal,
        # its lanes < j are FINAL L entries (written at their own steps;
        # this step's column write and rows>j trailing update cannot
        # touch row j's lanes < j), so the diag extraction and the
        # post-update lrow re-extraction both collapse into it.
        raw_col = jnp.sum(jnp.where(colmask, a, 0.0), axis=1, keepdims=True)
        raw_row = jnp.sum(jnp.where(rowmask, a, 0.0), axis=0, keepdims=True)
        diag = jnp.sum(jnp.where(col_ids[:1, :] == j, raw_row, 0.0))
        inv_sqrt = jax.lax.rsqrt(diag)
        col = jnp.where(row_ids[:, :1] >= j, raw_col * inv_sqrt, 0.0)
        rowv = jnp.where(col_ids[:1, :] >= j, raw_row * inv_sqrt, 0.0)
        # mask-free trailing update (see pallas_svgp._chol_inv_fused_b):
        # col/rowv are zero below/left of j, column j is overwritten just
        # after, and row j's lanes >= j are never read again
        a = a - col * rowv
        a = jnp.where(colmask, col, a)

        # inverse row j: raw_row's lanes < j are final L entries
        lrow_lt = jnp.where(col_ids[:1, :] < j, raw_row, 0.0)
        e_j = jnp.where(col_ids[:1, :] == j, 1.0, 0.0).astype(a.dtype)
        xrow = (e_j - jnp.dot(lrow_lt, x, preferred_element_type=a.dtype)) * inv_sqrt
        x = jnp.where(rowmask, xrow, x)
        return a, x

    a, x = jax.lax.fori_loop(0, b, step, (a, eye))
    return jnp.where(row_ids >= col_ids, a, 0.0), x


def _chol_kernel(a_ref, out_ref, *, n: int):
    # copy-in seeds the factorisation (in and out are distinct buffers)
    out_ref[:] = a_ref[:]
    k_blocks = n // BLOCK
    for k in range(k_blocks):  # static unroll
        lo, hi = k * BLOCK, (k + 1) * BLOCK
        d = out_ref[lo:hi, lo:hi]
        if k + 1 == k_blocks:
            out_ref[lo:hi, lo:hi] = _masked_chol_block(d)
        else:
            l_kk, l_inv = _chol_inv_fused(d)
            out_ref[lo:hi, lo:hi] = l_kk
            p = out_ref[hi:n, lo:hi]  # (M, B)
            p = jnp.dot(p, l_inv.T, preferred_element_type=jnp.float32)
            out_ref[hi:n, lo:hi] = p
            t = out_ref[hi:n, hi:n]
            out_ref[hi:n, hi:n] = t - jnp.dot(
                p, p.T, preferred_element_type=jnp.float32
            )
            out_ref[lo:hi, hi:n] = jnp.zeros((BLOCK, n - hi), jnp.float32)


def _forward(mat: jnp.ndarray) -> jnp.ndarray:
    n = mat.shape[-1]
    n_pad = -(-n // BLOCK) * BLOCK
    if n_pad != n:
        pad = n_pad - n
        eye_pad = jnp.zeros((pad, pad), mat.dtype) + jnp.eye(pad, dtype=mat.dtype)
        mat = jnp.block(
            [
                [mat, jnp.zeros((n, pad), mat.dtype)],
                [jnp.zeros((pad, n), mat.dtype), eye_pad],
            ]
        )
    out = pl.pallas_call(
        functools.partial(_chol_kernel, n=n_pad),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_pad**3 // 3,
            bytes_accessed=8 * n_pad * n_pad,
            transcendentals=n_pad,
        ),
    )(mat)
    return out[:n, :n]


def _chol_pullback(chol, g):
    """Closed-form Cholesky pullback from the saved factor (Murray 2016):
    K̄ = sym(L⁻ᵀ Φ(LᵀL̄) L⁻¹), Φ = tril with halved diagonal — two
    triangular solves, no refactorisation."""
    lt = jnp.swapaxes(chol, -1, -2)
    p = lt @ g
    eye = jnp.eye(chol.shape[-1], dtype=chol.dtype)
    phi = jnp.tril(p) - 0.5 * p * eye

    def solve_t(b):
        return jax.lax.linalg.triangular_solve(
            chol, b, left_side=True, lower=True, transpose_a=True
        )

    kbar_t = solve_t(jnp.swapaxes(solve_t(phi), -1, -2))
    return (0.5 * (kbar_t + jnp.swapaxes(kbar_t, -1, -2)),)


@jax.custom_vjp
def blocked_cholesky(mat: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor via the single-launch Pallas kernel."""
    return _forward(mat)


def _fwd(mat):
    out = _forward(mat)
    return out, out


def _bwd(chol, g):
    return _chol_pullback(chol, g)


blocked_cholesky.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Batched (chol, chol⁻¹) for small matrices — the SVGP K_zz workhorse
# ---------------------------------------------------------------------------

MAX_N_CHOLINV = 512


def _chol_inv_kernel(a_ref, l_ref, li_ref, *, n: int):
    if n == BLOCK:
        l, li = _chol_inv_fused(a_ref[0])
    else:
        l, li = _chol_inv_rec(a_ref[0])
    l_ref[0] = l
    li_ref[0] = li


def _chol_inv_forward(mats: jnp.ndarray):
    b, n, _ = mats.shape
    n_pad = max(BLOCK, 1 << (n - 1).bit_length())  # next power of two ≥ 128
    if n_pad != n:
        pad = n_pad - n
        eye = jnp.eye(pad, dtype=mats.dtype)
        mats = jnp.concatenate(
            [
                jnp.concatenate([mats, jnp.zeros((b, n, pad), mats.dtype)], axis=2),
                jnp.concatenate(
                    [
                        jnp.zeros((b, pad, n), mats.dtype),
                        jnp.broadcast_to(eye, (b, pad, pad)),
                    ],
                    axis=2,
                ),
            ],
            axis=1,
        )
    l, li = pl.pallas_call(
        functools.partial(_chol_inv_kernel, n=n_pad),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, n_pad), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * n_pad**3,
            bytes_accessed=12 * b * n_pad * n_pad,
            transcendentals=b * n_pad,
        ),
    )(mats)
    return l[:, :n, :n], li[:, :n, :n]


def cholinv_eligible(mats) -> bool:
    """Opt-in (NSGP_PALLAS_CHOLINV=1): measured 2026-08-16 on v5e, the
    DSVI headline runs 874 steps/s on XLA's vectorized batched chol+solve
    vs 332 steps/s through this kernel — the grid dimension serialises
    the batch while XLA vectorises it across sublanes.  Kept as the
    validated single-launch alternative; revisit with an in-kernel
    batched (leading-dim) recurrence."""
    import os

    if os.environ.get("NSGP_PALLAS_CHOLINV", "0") != "1":
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    if mats.dtype != jnp.float32 or mats.ndim != 3:
        return False
    return BLOCK <= mats.shape[-1] <= MAX_N_CHOLINV


@jax.custom_vjp
def chol_inv_batched(mats: jnp.ndarray):
    """(L, L⁻¹) for a batch of small SPD matrices in ONE Pallas launch.

    Replaces the XLA chol + M-RHS triangular-solve pair on the SVGP
    K_zz path (models/svgp.py precompute) — both XLA ops are sequential
    block loops that dominate the DSVI step at M = 250.  The batch rides
    the Pallas grid; each element runs the fused 128-block recurrence
    (recursive 2×2 blocking above 128).

    Backward is matmul-only (no solves, no refactorisation) because L⁻¹
    is a primal output: with Φ = tril(LᵀL̄, diag halved),
      K̄  = sym(L⁻ᵀ Φ L⁻¹)           (Cholesky pullback, Murray 2016)
      L̄ += −tril(L⁻ᵀ Ī L⁻ᵀ)         (pullback of the inverse output).
    """
    return _chol_inv_forward(mats)


def _ci_fwd(mats):
    out = _chol_inv_forward(mats)
    return out, out


def _ci_bwd(res, g):
    l, li = res
    lbar, libar = g
    lbar = jnp.zeros_like(l) if lbar is None else lbar
    libar = jnp.zeros_like(li) if libar is None else libar
    lit = jnp.swapaxes(li, -1, -2)  # L⁻ᵀ
    # inverse-output pullback into L̄
    lbar = lbar - jnp.tril(lit @ libar @ lit)
    p = jnp.swapaxes(l, -1, -2) @ lbar
    eye = jnp.eye(l.shape[-1], dtype=l.dtype)
    phi = jnp.tril(p) - 0.5 * p * eye
    kbar_t = lit @ phi @ li
    return (0.5 * (kbar_t + jnp.swapaxes(kbar_t, -1, -2)),)


chol_inv_batched.defvjp(_ci_fwd, _ci_bwd)


# ---------------------------------------------------------------------------
# HBM-streaming variant: N beyond the VMEM cap
# ---------------------------------------------------------------------------

PANEL = 128
SPANEL = 256  # streaming-kernel panel width (two-level diagonal factor)
MAX_N_STREAM = 8192
# v2 (GEMM formulation) dispatch threshold: the r3 re-measurement sweep
# (2026-08-17, differential scan timing incl. the new 3072/6144 sizes)
# confirms the r2 shape of the window and moves its FLOOR to include
# 6144 itself: v2 5.99 vs XLA 6.79 ms at 6144 (1.13×) and 11.59 vs
# 13.03 at 8192 (1.12×); XLA still ahead at 2048 (0.51 vs 0.69),
# 3072 (1.21 vs 1.30) and 4096 (2.28 vs 2.38).  Gate: N ≥ 6144.
MIN_N_STREAM2 = 6144


def _chol_block_2level(d):
    """Cholesky + triangular inverse of a (2B, 2B) tile via two B-level
    masked factorisations and MXU block algebra:

        L = [[L11, 0], [D21 L11⁻ᵀ, chol(D22 − L21 L21ᵀ)]]
        L⁻¹ = [[L11⁻¹, 0], [−L22⁻¹ L21 L11⁻¹, L22⁻¹]]

    Halving the sequential-loop block size keeps the scalar recurrences at
    B=128 while the streaming panels get 2B wide (fewer, larger DMAs and
    K=256 MXU matmuls)."""
    b = d.shape[0] // 2
    d11 = d[:b, :b]
    d21 = d[b:, :b]
    d22 = d[b:, b:]
    l11, i11 = _chol_inv_fused(d11)
    l21 = jnp.dot(d21, i11.T, preferred_element_type=jnp.float32)
    d22s = d22 - jnp.dot(l21, l21.T, preferred_element_type=jnp.float32)
    l22, i22 = _chol_inv_fused(d22s)
    zero = jnp.zeros((b, b), jnp.float32)
    l = jnp.concatenate(
        [jnp.concatenate([l11, zero], axis=1), jnp.concatenate([l21, l22], axis=1)],
        axis=0,
    )
    ilow = -jnp.dot(
        i22, jnp.dot(l21, i11, preferred_element_type=jnp.float32),
        preferred_element_type=jnp.float32,
    )
    linv = jnp.concatenate(
        [jnp.concatenate([i11, zero], axis=1), jnp.concatenate([ilow, i22], axis=1)],
        axis=0,
    )
    return l, linv


def _stream_kernel(a_ref, out_ref, c_scr, k_scr, l_buf, sem_a, sem_k, sem_b, *, n: int, chunk: int):
    """Left-looking blocked Cholesky with the matrix resident in HBM.

    Measured 2026-08 on v5e (exact to 1e-6 vs XLA), with half-height
    updates, double-buffered per-chunk DMA, and 256-wide panels factored
    two-level: n=4096 5.8 ms vs XLA 4.6; n=8192 15.3 ms vs XLA 14.7 —
    parity at the top size (optimisation progression at 8192:
    40.8 → 29.2 → 18.9 → 15.3 ms).  XLA keeps the dispatch since it still
    edges ahead; this kernel is the validated out-of-VMEM reference and
    the base for multi-chip distributed factorisation work.

    Working set: two full-height (N, SPANEL) VMEM panels.  Per block-column
    j: stream previously-factored panels k < j from HBM and subtract their
    rank-SPANEL contribution (MXU matmuls), factor the diagonal block with
    the masked in-VMEM routines, scale the panel by L_kk⁻ᵀ, mask the upper
    rows to zero, and stream the finished column back.  Full-height
    updates waste the rows above the diagonal (~2× FLOPs) in exchange for
    fully static shapes — the stream stays DMA/MXU bound either way.
    """
    nb = n // SPANEL
    # all full-height work runs in (chunk, SPANEL) row tiles so live
    # temporaries stay bounded (the 16 MB scoped-VMEM stack is the
    # constraint at N ≥ 4096, not the resident panels)
    nch = n // chunk
    row_ids_c = jax.lax.broadcasted_iota(jnp.int32, (chunk, SPANEL), 0)
    col_ids_c = jax.lax.broadcasted_iota(jnp.int32, (chunk, SPANEL), 1)

    def copy_body(j, _):
        dma = pltpu.make_async_copy(
            a_ref.at[:, pl.ds(j * SPANEL, SPANEL)],
            out_ref.at[:, pl.ds(j * SPANEL, SPANEL)],
            sem_a,
        )
        dma.start()
        dma.wait()
        return 0

    jax.lax.fori_loop(0, nb, copy_body, 0)

    def col_body(j, _):
        dma_in = pltpu.make_async_copy(
            out_ref.at[:, pl.ds(j * SPANEL, SPANEL)], c_scr, sem_a
        )
        dma_in.start()
        dma_in.wait()

        first = j * SPANEL // chunk

        def k_body(k, _):
            # diag-row block of panel k: L[jP:(j+1)P, kP:(k+1)P]
            dma_l = pltpu.make_async_copy(
                out_ref.at[pl.ds(j * SPANEL, SPANEL), pl.ds(k * SPANEL, SPANEL)],
                l_buf,
                sem_b,
            )
            dma_l.start()

            # double-buffered half-height chunk stream of panel k: only
            # rows from the chunk containing j·SPANEL down are loaded —
            # halves HBM traffic and overlaps it with the MXU updates
            def get_dma(slot, c):
                return pltpu.make_async_copy(
                    out_ref.at[pl.ds(c * chunk, chunk), pl.ds(k * SPANEL, SPANEL)],
                    k_scr.at[slot],
                    sem_k.at[slot],
                )

            get_dma(0, first).start()
            dma_l.wait()

            def ch_sub(c, _):
                slot = jax.lax.rem(c - first, 2)
                nxt = jax.lax.rem(c - first + 1, 2)

                @pl.when(c + 1 < nch)
                def _():
                    get_dma(nxt, c + 1).start()

                get_dma(slot, c).wait()
                sl = pl.ds(c * chunk, chunk)
                c_scr[sl, :] = c_scr[sl, :] - jnp.dot(
                    k_scr[slot], l_buf[:].T, preferred_element_type=jnp.float32
                )
                return 0

            jax.lax.fori_loop(first, nch, ch_sub, 0)
            return 0

        jax.lax.fori_loop(0, j, k_body, 0)

        d = c_scr[pl.ds(j * SPANEL, SPANEL), :]
        l_kk, l_inv = _chol_block_2level(d)

        def ch_zero(c, _):
            sl = pl.ds(c * chunk, chunk)
            c_scr[sl, :] = jnp.zeros((chunk, SPANEL), jnp.float32)
            return 0

        def ch_scale(c, _):
            # rows ≥ jP of (C L⁻ᵀ) are the final column (diag rows give
            # D L⁻ᵀ = L); zero rows above and the diag block's strict
            # upper triangle so the stored factor is exactly lower
            sl = pl.ds(c * chunk, chunk)
            rows = row_ids_c + c * chunk
            upd = jnp.dot(c_scr[sl, :], l_inv.T, preferred_element_type=jnp.float32)
            in_diag_upper = (rows < (j + 1) * SPANEL) & (rows - j * SPANEL < col_ids_c)
            keep = (rows >= j * SPANEL) & jnp.logical_not(in_diag_upper)
            c_scr[sl, :] = jnp.where(keep, upd, 0.0)
            return 0

        jax.lax.fori_loop(0, first, ch_zero, 0)
        jax.lax.fori_loop(first, nch, ch_scale, 0)

        dma_out = pltpu.make_async_copy(
            c_scr, out_ref.at[:, pl.ds(j * SPANEL, SPANEL)], sem_a
        )
        dma_out.start()
        dma_out.wait()
        return 0

    jax.lax.fori_loop(0, nb, col_body, 0)


def _forward_streaming(mat: jnp.ndarray) -> jnp.ndarray:
    n = mat.shape[-1]
    n_pad = -(-n // SPANEL) * SPANEL
    if n_pad != n:
        pad = n_pad - n
        mat = jnp.block(
            [
                [mat, jnp.zeros((n, pad), mat.dtype)],
                [jnp.zeros((pad, n), mat.dtype), jnp.eye(pad, dtype=mat.dtype)],
            ]
        )
    nb_total = n_pad // SPANEL
    # chunk=2·SPANEL keeps the scoped-VMEM stack inside 16 MB at N=8192
    # and measured fastest (chunk=4·SPANEL at 4096: 5.96 ms vs 5.78)
    chunk_blocks = 2 if nb_total % 2 == 0 else 1
    chunk = SPANEL * chunk_blocks
    out = pl.pallas_call(
        functools.partial(_stream_kernel, n=n_pad, chunk=chunk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_pad, SPANEL), jnp.float32),
            pltpu.VMEM((2, chunk, SPANEL), jnp.float32),
            pltpu.VMEM((SPANEL, SPANEL), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad**3 // 3,
            bytes_accessed=4 * n_pad * n_pad * (n_pad // SPANEL) // 2,
            transcendentals=n_pad,
        ),
    )(mat)
    return out[:n, :n]


@jax.custom_vjp
def streaming_cholesky(mat: jnp.ndarray) -> jnp.ndarray:
    """HBM-streaming lower Cholesky for N up to MAX_N_STREAM."""
    return _forward_streaming(mat)


def _sfwd(mat):
    out = _forward_streaming(mat)
    return out, out


def _sbwd(chol, g):
    return _chol_pullback(chol, g)


streaming_cholesky.defvjp(_sfwd, _sbwd)


# ---------------------------------------------------------------------------
# HBM-streaming v2: GEMM-formulation left-looking factorisation
# ---------------------------------------------------------------------------


def _chol_inv_rec(d):
    """(chol(D), chol(D)⁻¹) for a (P, P) tile, P a power-of-two multiple of
    128, by recursive 2×2 blocking down to the 128-step fused recurrence."""
    b = d.shape[0]
    if b == BLOCK:
        return _chol_inv_fused(d)
    h = b // 2
    l11, i11 = _chol_inv_rec(d[:h, :h])
    l21 = jnp.dot(d[h:, :h], i11.T, preferred_element_type=jnp.float32)
    l22, i22 = _chol_inv_rec(
        d[h:, h:] - jnp.dot(l21, l21.T, preferred_element_type=jnp.float32)
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


def _stream2_kernel(
    a_ref, out_ref, c_scr, slab_scr, lrow_scr, li_scr, z_scr, sem_c, sem_s, sem_l, sem_o,
    *, n: int, p: int,
):
    """Left-looking blocked Cholesky, GEMM formulation, matrix in HBM.

    For block-column j the whole left-looking subtraction is ONE GEMM

        C = A[jp:, jp:jp+p] − L[jp:, :jp] @ L[jp:jp+p, :jp]ᵀ

    evaluated in (p × p) pieces: the L row-slab L[jp:jp+p, :jp] streams
    into VMEM once per column, every (p, p) tile of L[jp:, :jp] streams
    once (double-buffered), and each piece is a (p, p) @ (p, p) MXU
    matmul accumulated in registers — large-K GEMM work instead of the
    v1 kernel's rank-p updates with per-panel DMA waits.  Rows above jp
    are never read; the factor's upper triangle is zero-filled from a
    VMEM zero tile (the input is never copied wholesale — A tiles stream
    from HBM directly into the accumulation).

    Per column: the diagonal chunk accumulates and factors first via the
    recursive block recurrence; subsequent chunks scale by L_jj⁻ᵀ as
    their GEMMs finish and write back immediately.
    """
    nb = n // p

    def col_body(j, _):
        jp = j * p

        # -- zero-fill the upper rows of column j (rows < jp) -------------
        def zero_body(c, _):
            dma = pltpu.make_async_copy(
                z_scr, out_ref.at[pl.ds(c * p, p), pl.ds(jp, p)], sem_o
            )
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(0, j, zero_body, 0)

        # -- stream the L row-slab L[jp:jp+p, :jp] into VMEM (per tile:
        # only the finalized columns < jp are read) -----------------------
        def lrow_body(t, _):
            dma = pltpu.make_async_copy(
                out_ref.at[pl.ds(jp, p), pl.ds(t * p, p)],
                lrow_scr.at[:, pl.ds(t * p, p)],
                sem_l,
            )
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(0, j, lrow_body, 0)

        # -- per row-chunk: K-tiled GEMM accumulate, factor/scale, write --
        def a_dma(slot, c):
            return pltpu.make_async_copy(
                a_ref.at[pl.ds(c * p, p), pl.ds(jp, p)], c_scr.at[slot], sem_c.at[slot]
            )

        def slab_dma(slot, c, t):
            return pltpu.make_async_copy(
                out_ref.at[pl.ds(c * p, p), pl.ds(t * p, p)],
                slab_scr.at[slot],
                sem_s.at[slot],
            )

        a_dma(0, j).start()

        def chunk_body(c, _):
            cs = jax.lax.rem(c - j, 2)

            @pl.when(c + 1 < nb)
            def _():
                a_dma(jax.lax.rem(c - j + 1, 2), c + 1).start()

            @pl.when(j > 0)
            def _():
                slab_dma(0, c, 0).start()

            a_dma(cs, c).wait()

            def kt_body(t, acc):
                ts = jax.lax.rem(t, 2)

                @pl.when(t + 1 < j)
                def _():
                    slab_dma(jax.lax.rem(t + 1, 2), c, t + 1).start()

                slab_dma(ts, c, t).wait()
                lrow_t = lrow_scr[:, pl.ds(t * p, p)]
                return acc - jnp.dot(
                    slab_scr[ts], lrow_t.T, preferred_element_type=jnp.float32
                )

            acc = jax.lax.fori_loop(0, j, kt_body, c_scr[cs])

            @pl.when(c == j)
            def _():
                l_kk, l_inv = _chol_inv_rec(acc)
                li_scr[:] = l_inv
                c_scr[cs] = l_kk

            @pl.when(c != j)
            def _():
                c_scr[cs] = jnp.dot(
                    acc, li_scr[:].T, preferred_element_type=jnp.float32
                )

            dma_out = pltpu.make_async_copy(
                c_scr.at[cs], out_ref.at[pl.ds(c * p, p), pl.ds(jp, p)], sem_o
            )
            dma_out.start()
            dma_out.wait()
            return 0

        jax.lax.fori_loop(j, nb, chunk_body, 0)
        return 0

    z_scr[:] = jnp.zeros((p, p), jnp.float32)
    jax.lax.fori_loop(0, nb, col_body, 0)


def _forward_streaming2(mat: jnp.ndarray, p: int | None = None) -> jnp.ndarray:
    n = mat.shape[-1]
    if p is None:
        # p = 512 blows the 16 MB scoped-VMEM stack (measured 17.18 M at
        # n=2048: the (p,p) recursion temporaries + row-slab); p = 256
        # keeps the whole working set ≈ 11 MB up to n = 8192
        p = 256
    n_pad = -(-n // p) * p
    if n_pad != n:
        pad = n_pad - n
        mat = jnp.block(
            [
                [mat, jnp.zeros((n, pad), mat.dtype)],
                [jnp.zeros((pad, n), mat.dtype), jnp.eye(pad, dtype=mat.dtype)],
            ]
        )

    out = pl.pallas_call(
        functools.partial(_stream2_kernel, n=n_pad, p=p),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, p, p), jnp.float32),   # A/C chunks (dbl buf)
            pltpu.VMEM((2, p, p), jnp.float32),   # L slab tiles (dbl buf)
            pltpu.VMEM((p, n_pad), jnp.float32),  # L row-slab for column j
            pltpu.VMEM((p, p), jnp.float32),      # L_jj⁻¹
            pltpu.VMEM((p, p), jnp.float32),      # zero tile
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=n_pad**3 // 3,
            bytes_accessed=2 * n_pad**3 // (3 * p),
            transcendentals=n_pad,
        ),
    )(mat)
    return out[:n, :n]


@jax.custom_vjp
def streaming_cholesky2(mat: jnp.ndarray) -> jnp.ndarray:
    """GEMM-formulation HBM-streaming lower Cholesky (v2)."""
    return _forward_streaming2(mat)


def _s2fwd(mat):
    out = _forward_streaming2(mat)
    return out, out


def _s2bwd(chol, g):
    return _chol_pullback(chol, g)


streaming_cholesky2.defvjp(_s2fwd, _s2bwd)


# ---------------------------------------------------------------------------
# Leading-dim-batched (chol, inv) for T small matrices — in-kernel batching
# ---------------------------------------------------------------------------

MAX_N_CHOLINV_B = 3 * BLOCK  # 3-level block algebra over 128-wide panels


def _bmm(x, y):
    """(T, p, q) @ (T, q, r).  Mosaic DOES lower a batched dot_general
    (probed on chip 2026-08-17, tools/probe_batched_dot.py) but the real
    precompute kernel built on it compiled pathologically (>30 min) while
    runtime measured a wash (0.274 vs 0.267 ms) — so the per-T python-loop
    stack of 2-D dots SHIPS as the default and NSGP_BATCHED_DOT=1 opts in
    to the batched op for re-probing (DESIGN.md §13)."""
    import os

    if os.environ.get("NSGP_BATCHED_DOT", "0") == "1":
        return jax.lax.dot_general(
            x, y, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    t = x.shape[0]
    return jnp.stack(
        [jnp.dot(x[i], y[i], preferred_element_type=jnp.float32) for i in range(t)]
    )


def _chol_inv_nlevel_b(a, nlev):
    """Batched (chol(A), chol(A)⁻¹) for (T, nlev·B, nlev·B) SPD tiles by
    block algebra over B=128 panels: each diagonal block runs the batched
    broadcast-and-reduce recurrence (pallas_svgp._chol_inv_fused_b), the
    off-diagonal panels and the blocked triangular inverse are per-T MXU
    GEMMs.  One Newton refinement of each diagonal inverse and each panel
    (the pallas_svgp 2-level recipe) keeps the inverse-based panel math
    f32-accurate on ill-conditioned inputs."""
    from nonstationary_precip_tpu.ops.pallas_svgp import _chol_inv_fused_b

    t = a.shape[0]
    b = BLOCK
    eye = jnp.eye(b, dtype=jnp.float32)

    def refine_inv(l, x):
        return jnp.tril(_bmm(x, 2.0 * eye - _bmm(l, x)))

    lblk = [[None] * nlev for _ in range(nlev)]
    iblk = [[None] * nlev for _ in range(nlev)]
    for j in range(nlev):
        d = a[:, j * b : (j + 1) * b, j * b : (j + 1) * b]
        for k in range(j):
            d = d - _bmm(lblk[j][k], jnp.swapaxes(lblk[j][k], -1, -2))
        l_jj, i_jj = _chol_inv_fused_b(d)
        i_jj = refine_inv(l_jj, i_jj)
        lblk[j][j] = l_jj
        iblk[j][j] = i_jj
        for i in range(j + 1, nlev):
            p = a[:, i * b : (i + 1) * b, j * b : (j + 1) * b]
            for k in range(j):
                p = p - _bmm(lblk[i][k], jnp.swapaxes(lblk[j][k], -1, -2))
            l_ij = _bmm(p, jnp.swapaxes(i_jj, -1, -2))
            # one refinement: l_ij += (P − l_ij L_jjᵀ) I_jjᵀ
            l_ij = l_ij + _bmm(
                p - _bmm(l_ij, jnp.swapaxes(l_jj, -1, -2)),
                jnp.swapaxes(i_jj, -1, -2),
            )
            lblk[i][j] = l_ij
    # blocked lower-triangular inverse: X[i][j] = −I_ii Σ_{j≤k<i} L[i][k] X[k][j]
    for j in range(nlev):
        for i in range(j + 1, nlev):
            acc = None
            for k in range(j, i):
                term = _bmm(lblk[i][k], iblk[k][j])
                acc = term if acc is None else acc + term
            iblk[i][j] = -_bmm(iblk[i][i], acc)
    zero = jnp.zeros((t, b, b), jnp.float32)
    l = jnp.concatenate(
        [
            jnp.concatenate([lblk[i][j] if j <= i else zero for j in range(nlev)], axis=2)
            for i in range(nlev)
        ],
        axis=1,
    )
    linv = jnp.concatenate(
        [
            jnp.concatenate([iblk[i][j] if j <= i else zero for j in range(nlev)], axis=2)
            for i in range(nlev)
        ],
        axis=1,
    )
    return l, linv


def _chol_inv_b_kernel(a_ref, l_ref, li_ref, *, nlev: int):
    l, li = _chol_inv_nlevel_b(a_ref[:], nlev)
    l_ref[:] = l
    li_ref[:] = li


def _chol_inv_b_forward(mats: jnp.ndarray):
    t, n, _ = mats.shape
    n_pad = -(-n // BLOCK) * BLOCK
    if n_pad != n:
        pad = n_pad - n
        eye = jnp.eye(pad, dtype=mats.dtype)
        mats = jnp.concatenate(
            [
                jnp.concatenate([mats, jnp.zeros((t, n, pad), mats.dtype)], axis=2),
                jnp.concatenate(
                    [
                        jnp.zeros((t, pad, n), mats.dtype),
                        jnp.broadcast_to(eye, (t, pad, pad)),
                    ],
                    axis=2,
                ),
            ],
            axis=1,
        )
    nlev = n_pad // BLOCK
    l, li = pl.pallas_call(
        functools.partial(_chol_inv_b_kernel, nlev=nlev),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, n_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((t, n_pad, n_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=t * 2 * n_pad**3,
            bytes_accessed=4 * t * 3 * n_pad * n_pad,
            transcendentals=t * n_pad,
        ),
    )(mats)
    return l[:, :n, :n], li[:, :n, :n]


def cholinv_b_eligible(mats) -> bool:
    """Opt-in gate (NSGP_PALLAS_CHOLINV_B=1) for the leading-dim-batched
    (chol, inv) kernel: f32, (T ≤ 16, N ≤ 384) on TPU.  Unlike the
    grid-batched ``chol_inv_batched`` (which serialises the batch: 332 vs
    874 steps/s on the DSVI headline), the batch here rides INSIDE the
    recurrence, every masked column step operating on the full (T, B, B)
    tensor — the pallas_svgp technique generalised to 3 levels.  Kept
    opt-in until a caller-facing dispatch is measured to win."""
    import os

    if os.environ.get("NSGP_PALLAS_CHOLINV_B", "0") != "1":
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    if mats.dtype != jnp.float32 or mats.ndim != 3:
        return False
    t, n, _ = mats.shape
    return t <= 16 and BLOCK <= n <= MAX_N_CHOLINV_B


@jax.custom_vjp
def chol_inv_batched_v2(mats: jnp.ndarray):
    """(L, L⁻¹) for (T, N, N) SPD stacks, N ≤ 384, batch in-kernel.

    Backward is the matmul-only pullback of ``chol_inv_batched``
    (Murray-2016 Cholesky pullback + the inverse-output term, all GEMMs
    against the exported L⁻¹ — no solves, no refactorisation)."""
    return _chol_inv_b_forward(mats)


def _civ2_fwd(mats):
    out = _chol_inv_b_forward(mats)
    return out, out


def _civ2_bwd(res, g):
    l, li = res
    lbar, libar = g
    lbar = jnp.zeros_like(l) if lbar is None else lbar
    libar = jnp.zeros_like(li) if libar is None else libar
    lit = jnp.swapaxes(li, -1, -2)
    lbar = jnp.tril(lbar) - jnp.tril(lit @ libar @ lit)
    p = jnp.swapaxes(l, -1, -2) @ lbar
    eye = jnp.eye(l.shape[-1], dtype=l.dtype)
    phi = jnp.tril(p) - 0.5 * p * eye
    kbar_t = lit @ phi @ li
    return (0.5 * (kbar_t + jnp.swapaxes(kbar_t, -1, -2)),)


chol_inv_batched_v2.defvjp(_civ2_fwd, _civ2_bwd)


def gibbs_b_eligible(mats) -> bool:
    """Dispatch gate for the batched-(chol, inv) MAP-loss path
    (``chol_inv_batched_safe``, consumed by
    ``models.gibbs_gp.gibbs_map_loss_batched``): f32 (T ≤ 16, N ≤ 384)
    stacks on TPU, default ON (disable via NSGP_PALLAS_GIBBS_B=0).

    Unlike the standalone opt-in ``cholinv_b_eligible`` gate, this path
    is where the kernel's exported L⁻¹ pays: alpha and the whole MLL
    pullback become batched GEMMs with no triangular solves and no
    second factorisation."""
    import os

    if os.environ.get("NSGP_PALLAS_GIBBS_B", "1") != "1":
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    if mats.dtype != jnp.float32 or mats.ndim != 3:
        return False
    t, n, _ = mats.shape
    return t <= 16 and BLOCK <= n <= MAX_N_CHOLINV_B


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def chol_inv_batched_safe(mats: jnp.ndarray, jitter: float = 1e-5, max_tries: int = 6):
    """(L, L⁻¹) for (T, N, N) SPD stacks with escalating-jitter retry —
    the batched analogue of ``ops.linalg.safe_cholesky`` (GPyTorch
    ``psd_safe_cholesky`` semantics, reference
    ``experiments/spatial_exp.py:31``) built on the 3-level in-kernel
    batch.  Primal while_loop carries the (L, L⁻¹) pair (happy path =
    exactly one kernel launch); pullback is the matmul-only
    ``chol_inv_batched_v2`` form against the saved L⁻¹."""
    return _chol_inv_b_safe_impl(mats, jitter, max_tries)


def _chol_inv_b_safe_impl(mats, jitter, max_tries):
    n = mats.shape[-1]
    eye = jnp.eye(n, dtype=mats.dtype)
    base = jitter if jitter > 0 else 1e-5

    out0 = _chol_inv_b_forward(mats)

    def cond_fn(state):
        i, _, (l, _) = state
        return jnp.logical_and(
            i < max_tries, jnp.logical_not(jnp.all(jnp.isfinite(l)))
        )

    def body(state):
        # PER-MEMBER escalation, matching ops.linalg.safe_cholesky (and
        # GPyTorch, which jitters only failing batch entries): healthy
        # members refactor with their current jitter — 0 for never-failed
        # ones, reproducing their (L, L⁻¹) bit-exactly — so one bad split
        # in the 10-split stack cannot shift the other nine's losses or
        # gradients away from the vmap/sequential paths.
        i, j, (l, _) = state
        finite = jnp.all(jnp.isfinite(l), axis=(-1, -2))  # (T,)
        j_next = jnp.where(finite, j, jnp.where(j == 0, base, j * 10.0))
        return i + 1, j_next, _chol_inv_b_forward(
            mats + j_next[:, None, None] * eye
        )

    zeros = jnp.zeros(mats.shape[:-2], dtype=mats.dtype)
    _, _, out = jax.lax.while_loop(cond_fn, body, (jnp.asarray(0), zeros, out0))
    return out


def _cib_safe_fwd(mats, jitter, max_tries):
    out = _chol_inv_b_safe_impl(mats, jitter, max_tries)
    return out, out


def _cib_safe_bwd(jitter, max_tries, res, g):
    return _civ2_bwd(res, g)


chol_inv_batched_safe.defvjp(_cib_safe_fwd, _cib_safe_bwd)
