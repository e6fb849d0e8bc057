"""Fused SVGP K_zz precompute: gram → Cholesky → W = L⁻ᵀ[m|tril(S)|I]
for ALL layers' output dims in ONE Pallas launch.

The DSVI step's dominant cost is this sample-independent precompute
(ablation 2026-08-16: 0.535 ms of a 0.68 ms forward at M=250, T=5 output
dims across 3 layers).  XLA runs it as ~9 batched ops; here the whole
pipeline is one kernel, and — unlike the retired grid-batched
chol_inv_batched (grid SERIALISES the batch: 332 vs 874 steps/s) — the
Cholesky recurrence is batched INSIDE the kernel: every masked column
step operates on a (T, 128, 128) tensor, so the ~256-step sequential
chain is paid once for all T matrices instead of T times.

Layout: M padded to 256 (two-level 128-block recurrence), z lane-padded
to 128 features, W width 2M+1 padded to lanes.

Custom VJP (closed form, no refactorisation — validated f64-exact):
  W = L⁻ᵀ P         ⇒  P̄ = L⁻¹ W̄,   L̄ += −L⁻ᵀ W̄ Wᵀ
  L = chol(K)       ⇒  K̄ = sym(L⁻ᵀ Φ(Lᵀ L̄) L⁻¹)
  K = s²G(z/ℓ) + εI ⇒  z̄, ℓ̄, s̄² via the (cheap, O(TM²D)) gram VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nonstationary_precip_tpu.utils.config import EPSILON

_FEAT = 128
_MAX_D = 8
BLOCK = 128


def eligible(z_all) -> bool:
    """Dispatch gate (disable via NSGP_PALLAS_SVGP=0).

    History (2026-08-16): the first, retry-free version went NaN on the
    deepgp benchmark at its INIT — the DeepGP init K_zz (250 z ~ N(0,1)
    in 2-D, ε = 1e-5) is ill-conditioned enough that even XLA's plain
    f32 Cholesky NaNs on-chip at some inits, and the XLA path survives
    only via safe_cholesky's escalating-jitter retry.  The kernel now
    carries the SAME retry semantics IN-KERNEL (pl.when refactorisation
    at escalated jitter — a real runtime branch that the custom-VJP
    boundary hides from autodiff, so it is free on the happy path,
    unlike a jax-level lax.cond at +4.5 ms/step in backward)."""
    import os

    if os.environ.get("NSGP_PALLAS_SVGP", "1") != "1":
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    if z_all.dtype != jnp.float32 or z_all.ndim != 3:
        return False
    t, m, d = z_all.shape
    # m ≤ 256: the in-kernel recurrence is 1- or 2-level 128 blocks
    return t <= 16 and d <= _MAX_D and 64 <= m <= 256


# -- batched (leading-dim) masked recurrences --------------------------------


def _chol_inv_fused_b(a):
    """(chol(A), chol(A)⁻¹) for (T, B, B) symmetric tiles — the 128-step
    fused recurrence of ops/pallas_chol.py with every op batched over T."""
    t, b, _ = a.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, b, b), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, b, b), 2)
    eye = jnp.where(rows == cols, 1.0, 0.0).astype(a.dtype)

    def step(j, carry):
        a, x = carry
        colmask = cols == j
        rowmask = rows == j
        # Mosaic crashes on (T,1,1) and (T,) reductions (layout CHECK,
        # probed 2026-08-16/17), and cumsum has no TPU lowering — so the
        # per-T diagonal scalar is replicated by BROADCAST-AND-REDUCE:
        # the raw column/row extractions hold d = A[j,j] at sublane/lane
        # j; masking to a one-hot, broadcasting over the full tile, and
        # summing along the other axis lands d uniformly at every
        # sublane/lane.  This replaces the original 22-op per-T
        # scalar-extraction chain (rank-0 sums + rsqrt + full/stack
        # rebuilds) that serialised every recurrence step, and the raw
        # extractions are shared with the column/row updates and the
        # ride-along inverse (raw_row's lanes < j are final L entries —
        # written at their own steps, untouched by this step's column
        # write and rows->j trailing update).
        raw_col = jnp.sum(jnp.where(colmask, a, 0.0), axis=-1, keepdims=True)
        raw_row = jnp.sum(jnp.where(rowmask, a, 0.0), axis=-2, keepdims=True)
        dvec = jnp.where(rows[:, :, :1] == j, raw_col, 0.0)  # (T,B,1) one-hot
        drow = jnp.where(cols[:, :1, :] == j, raw_row, 0.0)  # (T,1,B) one-hot
        d_col = jnp.sum(jnp.broadcast_to(drow, (t, b, b)), axis=-1, keepdims=True)
        d_row = jnp.sum(jnp.broadcast_to(dvec, (t, b, b)), axis=-2, keepdims=True)
        isq_col = jax.lax.rsqrt(d_col)  # (T,B,1) uniform
        isq_row = jax.lax.rsqrt(d_row)  # (T,1,B) uniform
        col = jnp.where(rows[:, :, :1] >= j, raw_col * isq_col, 0.0)  # (T,B,1)
        rowv = jnp.where(cols[:, :1, :] >= j, raw_row * isq_row, 0.0)  # (T,1,B)
        # MASK-FREE trailing update: col/rowv are already zero at
        # rows<j/cols<j, so the subtraction only touches the inclusive
        # rows≥j, cols≥j region.  Of the cells the old (rows>j & cols>j)
        # mask excluded, column j is overwritten by the column write just
        # below, and row j's lanes ≥ j are never read again (raw_col at a
        # later step k masks to rows ≥ k > j; raw_row reads row k ≠ j;
        # this step's raw_row was extracted pre-update) — saves the two
        # iota compares, the and, and the where per step.
        a = a - col * rowv
        a = jnp.where(colmask, col, a)

        # inverse row j rides along: raw_row's lanes < j are final L entries
        lrow_lt = jnp.where(cols[:, :1, :] < j, raw_row, 0.0)
        e_j = jnp.where(cols[:, :1, :] == j, 1.0, 0.0).astype(a.dtype)
        # (T,1,B) @ (T,B,B) as a masked-multiply + sublane reduction (no
        # batched MXU dot in Mosaic): Σ_b lrow_lt[t,0,b] · x[t,b,c]
        prod = jnp.swapaxes(lrow_lt, -1, -2) * x  # (T,B,B): row b scaled
        contrib = jnp.sum(prod, axis=-2, keepdims=True)  # (T,1,B)
        xrow = (e_j - contrib) * isq_row
        x = jnp.where(rowmask, xrow, x)
        return a, x

    a, x = jax.lax.fori_loop(0, b, step, (a, eye))
    return jnp.where(rows >= cols, a, 0.0), x


def _chol_inv_2level_b(d):
    """Batched two-level (2B) factor+inverse: block algebra over (T,2B,2B)
    with per-T MXU matmuls (static python loop — Mosaic dots are 2-D).

    The real SVGP K_zz (M=250 random 2-D z, ε=1e-5 jitter) is numerically
    near-singular: ‖L₁₁⁻¹‖ ~ 3e2, so the inverse-based panel
    l21 = D21·I11ᵀ carries ~3e-4 error and the one-shot rank-128 Schur
    complement flips ~1e-5 diagonals negative (NaN).  One Newton
    refinement of each inverse (X ← X(2I − L X)) and of the panel
    (l21 += (D21 − l21 L11ᵀ)·I11ᵀ) — five extra MXU matmuls per T —
    squares the error away; validated against f64 on the ill-conditioned
    case in tests."""
    t, n, _ = d.shape
    b = n // 2
    d11 = d[:, :b, :b]
    d21 = d[:, b:, :b]
    d22 = d[:, b:, b:]
    eye = jnp.eye(b, dtype=d.dtype)

    # shared batched-matmul helper (per-T loop default, NSGP_BATCHED_DOT=1
    # opts into the batched dot_general — one implementation to keep the
    # probe findings/env semantics in sync across kernels)
    from nonstationary_precip_tpu.ops.pallas_chol import _bmm as bmm

    def refine_inv(l, x):
        # Newton: X ← X (2I − L X), keeps lower-triangular support
        return jnp.tril(bmm(x, 2.0 * eye - bmm(l, x)))

    l11, i11 = _chol_inv_fused_b(d11)
    i11 = refine_inv(l11, i11)
    l21 = bmm(d21, jnp.swapaxes(i11, -1, -2))
    l21 = l21 + bmm(d21 - bmm(l21, jnp.swapaxes(l11, -1, -2)), jnp.swapaxes(i11, -1, -2))
    l22, i22 = _chol_inv_fused_b(d22 - bmm(l21, jnp.swapaxes(l21, -1, -2)))
    i22 = refine_inv(l22, i22)
    zero = jnp.zeros((t, b, b), jnp.float32)
    ilow = -bmm(i22, bmm(l21, i11))
    l = jnp.concatenate(
        [
            jnp.concatenate([l11, zero], axis=2),
            jnp.concatenate([l21, l22], axis=2),
        ],
        axis=1,
    )
    linv = jnp.concatenate(
        [
            jnp.concatenate([i11, zero], axis=2),
            jnp.concatenate([ilow, i22], axis=2),
        ],
        axis=1,
    )
    return l, linv


def _svgp_kernel(
    z_ref,
    ell_ref,
    s2_ref,
    packed_ref,
    l_ref,
    w_ref,
    linv_ref,
    k_scr,
    *,
    t: int,
    m: int,
    mm: int,
):
    # -- gram: K = s2 * exp(-0.5 (|z|² + |z'|² - 2 z z'ᵀ)) + εI per t,
    # padded rows/cols masked to an identity block (exact, no reliance on
    # padded-z magnitudes) -------------------------------------------------
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    valid = (rows < mm) & (cols < mm)
    for i in range(t):
        z = z_ref[i]  # (m, 128): features in lanes [0, d)
        s2 = s2_ref[0, i]
        zs_full = z * ell_ref[i]  # ell_ref holds 1/ℓ in lanes [0, d), 0 beyond
        sq = jnp.sum(zs_full * zs_full, axis=-1, keepdims=True)  # (m, 1)
        cross = jnp.dot(zs_full, zs_full.T, preferred_element_type=jnp.float32)
        quad = jnp.maximum(sq + sq.T - 2.0 * cross, 0.0)
        k = s2 * jnp.exp(-0.5 * quad)
        k = jnp.where(valid, k, 0.0)
        k = jnp.where(rows == cols, s2 + EPSILON, k)
        k_scr[i] = k

    # -- batched factor + inverse with IN-KERNEL escalating-jitter retry.
    # The DeepGP init K_zz is ill-conditioned enough that even XLA's
    # plain f32 chol NaNs at some inits — the XLA path survives only via
    # safe_cholesky's retry, so the fused kernel needs the same
    # semantics.  pl.when is a real runtime branch and the custom-VJP
    # boundary hides it from autodiff, so (unlike a lax.cond at the jax
    # level, +4.5 ms/step in backward) retries are free on the happy
    # path.  The attempt loop is a fori_loop with the jitter as a TRACED
    # scalar so the factor code is instantiated ONCE — a python-unrolled
    # 3-way retry tripled Mosaic's scoped-VMEM stack peak to 18.4 MB and
    # failed to compile (v5e, 2026-08-16). ------------------------------------
    def factor_and_write(extra_jitter):
        # PER-GROUP escalation (parity with the composed path's
        # safe_cholesky / GPyTorch's psd_safe_cholesky, which jitter only
        # failing batch entries): groups whose previous factor came out
        # finite take no jitter, so their (L, L⁻¹, W) reproduce exactly
        # and only the bad group's trajectory moves.  The whole block is
        # pl.when-gated on extra_jitter > 0, so the happy path (attempt
        # 0, jitter 0) pays one scalar compare — no reductions, and the
        # then-uninitialised l/w refs are never read.  Mosaic-legal
        # shapes: per-t FULL-tile (m, m)→scalar reductions in the
        # existing python-loop idiom ((T,)-shaped reductions have no
        # lowering — CLAUDE.md dead-end list); the jittered K accumulates
        # in k_scr, preserving a group's accepted jitter level across
        # later attempts that escalate other groups.
        @pl.when(extra_jitter > 0.0)
        def _():
            eye_m = jnp.where(rows == cols, 1.0, 0.0).astype(jnp.float32)
            for i in range(t):
                bad_i = jnp.logical_not(
                    jnp.logical_and(
                        jnp.all(jnp.isfinite(l_ref[i])),
                        jnp.all(jnp.isfinite(w_ref[i])),
                    )
                )
                jit_i = jnp.where(bad_i, extra_jitter, 0.0).astype(jnp.float32)
                k_scr[i] = k_scr[i] + jit_i * eye_m

        k_all = k_scr[:]
        if m == BLOCK:
            l, linv = _chol_inv_fused_b(k_all)
        else:
            l, linv = _chol_inv_2level_b(k_all)
        l_ref[:] = l
        # L⁻¹ is a by-product of the in-kernel recurrence: exporting it
        # lets the custom VJP replace all four batched triangular solves
        # with MXU GEMMs (the solves were ~half the DSVI step's backward)
        linv_ref[:] = linv
        for i in range(t):
            w_ref[i] = jnp.dot(
                linv[i].T, packed_ref[i], preferred_element_type=jnp.float32
            )

    def attempt(i, carry):
        finite = jnp.logical_and(
            jnp.all(jnp.isfinite(l_ref[:])), jnp.all(jnp.isfinite(w_ref[:]))
        )
        extra = jnp.where(i == 1, 1e-4, jnp.where(i >= 2, 1e-2, 0.0)).astype(
            jnp.float32
        )

        @pl.when(jnp.logical_or(i == 0, jnp.logical_not(finite)))
        def _():
            factor_and_write(extra)

        return carry

    jax.lax.fori_loop(0, 3, attempt, 0)


def _forward(z_all, ell_all, s2_all, packed_all):
    """z_all (T,M,D), ell_all (T,D), s2_all (T,), packed_all (T,M,P) →
    (L (T,M,M), W (T,M,P), L⁻¹ (T,M,M))."""
    t, mm, d = z_all.shape
    p = packed_all.shape[-1]
    m_pad = BLOCK if mm <= BLOCK else 2 * BLOCK
    assert mm <= m_pad <= 2 * BLOCK
    w_pad = -(-p // _FEAT) * _FEAT

    # z lane-padded; inverse lengthscales broadcast into the lanes so the
    # kernel's zs = z * ell_inv is a single elementwise multiply
    z_p = jnp.zeros((t, m_pad, _FEAT), jnp.float32)
    z_p = jax.lax.dynamic_update_slice(z_p, z_all.astype(jnp.float32), (0, 0, 0))
    ell_inv = jnp.zeros((t, _FEAT), jnp.float32)
    ell_inv = jax.lax.dynamic_update_slice(
        ell_inv, (1.0 / ell_all).astype(jnp.float32), (0, 0)
    )
    ell_b = jnp.broadcast_to(ell_inv[:, None, :], (t, m_pad, _FEAT))

    packed_p = jnp.zeros((t, m_pad, w_pad), jnp.float32)
    packed_p = jax.lax.dynamic_update_slice(
        packed_p, packed_all.astype(jnp.float32), (0, 0, 0)
    )

    s2_p = s2_all.astype(jnp.float32)[None, :]  # (1, T) SMEM

    l, w, linv = pl.pallas_call(
        functools.partial(_svgp_kernel, t=t, m=m_pad, mm=mm),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, m_pad, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((t, m_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((t, m_pad, m_pad), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((t, m_pad, m_pad), jnp.float32)],
        # the retry adds one (T, M, M) jittered-K temp over the pre-retry
        # peak; the default 16 MB scoped limit was already near-full at
        # T=5, M=256 — raise it (v5e has 128 MB physical VMEM and this
        # kernel runs grid-less, so occupancy is not a concern)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=t * (2 * m_pad**3 + 2 * m_pad * m_pad * p),
            bytes_accessed=4 * t * (2 * m_pad * m_pad + 2 * m_pad * w_pad),
            transcendentals=t * m_pad * m_pad,
        ),
    )(z_p, ell_b, s2_p, packed_p)
    return l[:, :mm, :mm], w[:, :mm, :p], linv[:, :mm, :mm]


def _reference(z_all, ell_all, s2_all, packed_all):
    """Pure-jnp composition (oracle and VJP recompute for the gram)."""
    zs = z_all / ell_all[:, None, :]
    sq = jnp.sum(zs * zs, axis=-1)
    quad = jnp.maximum(
        sq[:, :, None] + sq[:, None, :] - 2.0 * jnp.einsum("tmd,tnd->tmn", zs, zs),
        0.0,
    )
    k = s2_all[:, None, None] * jnp.exp(-0.5 * quad)
    mm = z_all.shape[1]
    eye = jnp.eye(mm, dtype=z_all.dtype)
    k = k + EPSILON * eye
    l = jnp.linalg.cholesky(k)
    w = jax.lax.linalg.triangular_solve(
        l, packed_all, left_side=True, lower=True, transpose_a=True
    )
    linv = jax.lax.linalg.triangular_solve(
        l, jnp.broadcast_to(eye, l.shape), left_side=True, lower=True
    )
    return l, w, linv


@jax.custom_vjp
def svgp_precompute_fused(z_all, ell_all, s2_all, packed_all):
    """(L, W = L⁻ᵀ·packed, L⁻¹) for T layers' K_zz in one Pallas launch.

    L⁻¹ is a free by-product of the in-kernel recurrence; exporting it
    (a) gives ``precompute_layers`` a real L⁻ᵀ instead of a lazy
    recompute, and (b) lets the custom VJP run entirely on MXU GEMMs —
    the DSVI-step ablation (tools/profile_dsvi.py, v5e 2026-08-16)
    measured the backward at 0.46 ms of the 0.98 ms step, dominated by
    the four batched triangular solves this replaces."""
    return _forward(z_all, ell_all, s2_all, packed_all)


def _fwd(z_all, ell_all, s2_all, packed_all):
    out = _forward(z_all, ell_all, s2_all, packed_all)
    return out, (z_all, ell_all, s2_all, out)


def _bwd(res, g):
    z_all, ell_all, s2_all, (l, w, linv) = res
    lbar, wbar, linvbar = g
    lbar = jnp.zeros_like(l) if lbar is None else lbar
    wbar = jnp.zeros_like(w) if wbar is None else wbar
    linv_t = jnp.swapaxes(linv, -1, -2)

    # W = L⁻ᵀ P:  P̄ = L⁻¹ W̄;  L̄ += −W W̄ᵀ L⁻ᵀ = −(L⁻¹ W̄ Wᵀ)ᵀ,
    # restricted to the lower triangle (L's structural support).
    # All solves are GEMMs against the kernel-exported L⁻¹.
    pbar = linv @ wbar
    lbar = jnp.tril(lbar) - jnp.tril(
        jnp.swapaxes(linv @ (wbar @ jnp.swapaxes(w, -1, -2)), -1, -2)
    )

    # X = L⁻¹ pullback: L̄ += −Xᵀ X̄ Xᵀ.  NOTE: JAX instantiates zero
    # cotangents as real arrays (no symbolic_zeros here), so this always
    # computes — on the training path (linv unused) it is GEMMs against a
    # zero X̄ that XLA folds; an `is None` skip would be dead code.
    if linvbar is not None:
        lbar = lbar - jnp.tril(linv_t @ linvbar @ linv_t)

    # chol pullback from the saved factor
    lt = jnp.swapaxes(l, -1, -2)
    pmat = lt @ lbar
    eye = jnp.eye(l.shape[-1], dtype=l.dtype)
    phi = jnp.tril(pmat) - 0.5 * pmat * eye
    kbar_t = linv_t @ jnp.swapaxes(linv_t @ phi, -1, -2)
    kbar = 0.5 * (kbar_t + jnp.swapaxes(kbar_t, -1, -2))

    # gram VJP (recomputes the cheap O(TM²D) gram only)
    def gram(z, ell, s2):
        zs = z / ell[:, None, :]
        sq = jnp.sum(zs * zs, axis=-1)
        quad = jnp.maximum(
            sq[:, :, None] + sq[:, None, :] - 2.0 * jnp.einsum("tmd,tnd->tmn", zs, zs),
            0.0,
        )
        return s2[:, None, None] * jnp.exp(-0.5 * quad)

    _, vjp = jax.vjp(gram, z_all, ell_all, s2_all)
    zbar, ellbar, s2bar = vjp(kbar)
    return zbar, ellbar, s2bar, pbar


svgp_precompute_fused.defvjp(_fwd, _bwd)
