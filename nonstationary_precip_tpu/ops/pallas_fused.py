"""Fused Gibbs-MAP-loss Pallas kernel: Gram → +σ²I → blocked Cholesky →
forward substitution, in ONE TPU kernel launch.

This fuses the hot pair of the reference's MAP objective
(/root/reference/models/gibbs_kernels.py:154-162 Gram build feeding
``psd_safe_cholesky`` at :201, then the MLL solve) so the N×N covariance
never exists in HBM: it is built strip-by-strip straight into the VMEM
buffer the factorisation then runs in place on, and the y-solve rides the
factorisation (the classic fused right-looking solve: α_k = L_kk⁻¹ y_k,
y_trail −= P α_k).

Two structural wins over the XLA + blocked-chol composition:

* zero HBM traffic for K (the composition writes K once and reads it
  once — plus every op-launch boundary), and one kernel launch instead of
  four (gram, add-noise, cholesky, trsm);
* because there is no separate N² input buffer (the kernel's inputs are
  the (N, D) factors), the single-buffer VMEM cap rises from 1280 to
  1536+ — covering the workload's largest exact-GP size (N = 1576 padded
  to 1664 exceeds VMEM; 1536 fits).

Gram build: the per-dimension planes are produced by TINY MXU matmuls
(outer products / rank-≤3 products) instead of (TM,1)×(1,TN) broadcast
arithmetic — round-1 measurement showed Mosaic's broadcast lowering costs
0.6-0.9 ms where XLA's fused elementwise runs at the 20 µs HBM roofline;
routing the replication through the MXU sidesteps that lowering entirely:

    ss_d    = [ℓ1², 1] @ [[1],[ℓ2²]]           (K=2 matmul)
    diff2_d = [x1², −2x1, 1] @ [[1],[x2],[x2²]] (K=3 matmul)
    prod_d  = ℓ1 @ ℓ2                           (K=1 outer product)

Differentiation: custom VJP recomputing through the pure-jnp reference
(exact gradients for ℓ, x, y, σ², s²).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nonstationary_precip_tpu.ops.pallas_chol import _chol_block_2level

_FEAT = 128  # lane-aligned feature padding
_MAX_D = 8
_ELL_OFF = 8  # ℓ lane offset inside the packed (n, 128) factor buffer
PANEL = 256  # gram-strip height AND factorisation panel width (2-level)
MAX_N_FUSED = 1536  # N² out + (N,128)×4 factor inputs + strip planes ≤ 16 MB


def eligible(x, ell) -> bool:
    """Auto-dispatch gate for the fused MAP-loss path.

    RETIRED as a default in round 3 (set NSGP_PALLAS_FUSED=1 to re-enable
    the r2 window): three consecutive r3 sweeps (2026-08-17, differential
    scan timing) show the composed XLA path — which got ~1.8× faster
    during r2 via the safe_cholesky custom-VJP and constant-mask backward
    forms — now wins the training step at every size, including the old
    window's center:
        n=512:  fused 0.28/0.25/0.37 vs XLA 0.26/0.29/0.25 ms
        n=1024: fused 0.88/0.90/0.89 vs XLA 0.75/0.80/0.78 ms  (was
                0.945 vs 1.413 when the window was tuned in r2)
        n=1536: fused 1.65/1.60/1.61 vs XLA 1.61/1.62/1.59 ms
    Forward-only the kernel still wins ~n=512/1536 — the loss path is a
    train step, so the step number governs.  The kernel remains fully
    tested (tests/test_pallas.py, check-tpu) as the in-VMEM fusion
    building block."""
    import os

    if os.environ.get("NSGP_PALLAS_FUSED", "0") != "1":
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    if x.dtype != jnp.float32 or x.ndim != 2 or ell.ndim != 2:
        return False
    if x.shape[-1] > _MAX_D:
        return False
    n = x.shape[0]
    # the r2 window, kept for the opt-in path (see docstring for why the
    # default is now off); also keeps the vmapped 10-split trainer
    # (N=315/split) pure-XLA
    return 768 <= n <= 1280


def _gram_strip(xe_ref, xet_ref, lo, n, d, s2, noise):
    """One (PANEL, n) strip of s²·K_gibbs + σ²·I via MXU-packed planes.

    ``xe`` packs x in lanes [0, d) and ℓ in lanes [8, 8+d) of one
    (n, 128) buffer (and its transpose) — halves the factor-input VMEM
    vs separate x/ℓ buffers (the n=1536 budget was 44 KB over the 16 MB
    scoped limit with four buffers)."""
    ones_c = jnp.ones((PANEL, 1), jnp.float32)
    ones_r = jnp.ones((1, n), jnp.float32)
    ratio = None
    quad = None
    for k in range(d):
        l1 = xe_ref[lo : lo + PANEL, _ELL_OFF + k : _ELL_OFF + k + 1]  # (P, 1)
        l2 = xet_ref[_ELL_OFF + k : _ELL_OFF + k + 1, :]  # (1, n)
        x1 = xe_ref[lo : lo + PANEL, k : k + 1]
        x2 = xet_ref[k : k + 1, :]
        ss = jnp.dot(
            jnp.concatenate([l1 * l1, ones_c], axis=1),
            jnp.concatenate([ones_r, l2 * l2], axis=0),
            preferred_element_type=jnp.float32,
        )
        diff2 = jnp.dot(
            jnp.concatenate([x1 * x1, -2.0 * x1, ones_c], axis=1),
            jnp.concatenate([ones_r, x2, x2 * x2], axis=0),
            preferred_element_type=jnp.float32,
        )
        pr = jnp.dot(l1, l2, preferred_element_type=jnp.float32)
        inv = 1.0 / ss
        r = 2.0 * pr * inv
        q = diff2 * inv
        ratio = r if ratio is None else ratio * r
        quad = q if quad is None else quad + q
    strip = s2 * jnp.sqrt(ratio) * jnp.exp(-quad)
    rows = jax.lax.broadcasted_iota(jnp.int32, (PANEL, n), 0) + lo
    cols = jax.lax.broadcasted_iota(jnp.int32, (PANEL, n), 1)
    # the Gibbs diagonal is EXACTLY s² for any ℓ (prefactor and quad both
    # collapse at x1 == x2), so write it in closed form — this also makes
    # the diagonal immune to the f32 cancellation in the matmul-form
    # x² − 2xx' + x'² at large |x| (the padded rows sit at |x| ~ 1e4)
    return jnp.where(rows == cols, s2 + noise, strip)


def _fused_kernel(
    xe_ref, xet_ref, y_ref, sn_ref, out_ref, alpha_ref, *, n: int, d: int
):
    s2 = sn_ref[0, 0]
    noise = sn_ref[0, 1]
    kb = n // PANEL

    def build_and_factor(extra_jitter):
        # phase 1: build s²K + (σ²+extra)I strip-wise, straight into the
        # chol buffer
        for i in range(kb):
            lo = i * PANEL
            out_ref[lo : lo + PANEL, :] = _gram_strip(
                xe_ref, xet_ref, lo, n, d, s2, noise + extra_jitter
            )

        # phase 2: in-place blocked right-looking Cholesky (256-wide
        # panels, each factored by the 2-level 128-block recurrence) with
        # the forward substitution of y fused into the block recurrence
        alpha_ref[:] = y_ref[:]
        for k in range(kb):
            lo, hi = k * PANEL, (k + 1) * PANEL
            l_kk, l_inv = _chol_block_2level(out_ref[lo:hi, lo:hi])
            out_ref[lo:hi, lo:hi] = l_kk
            a_k = jnp.dot(
                l_inv, alpha_ref[lo:hi, :], preferred_element_type=jnp.float32
            )
            alpha_ref[lo:hi, :] = a_k
            if k + 1 < kb:
                p = out_ref[hi:n, lo:hi]
                p = jnp.dot(p, l_inv.T, preferred_element_type=jnp.float32)
                out_ref[hi:n, lo:hi] = p
                t = out_ref[hi:n, hi:n]
                out_ref[hi:n, hi:n] = t - jnp.dot(
                    p, p.T, preferred_element_type=jnp.float32
                )
                out_ref[lo:hi, hi:n] = jnp.zeros((PANEL, n - hi), jnp.float32)
                alpha_ref[hi:n, :] = alpha_ref[hi:n, :] - jnp.dot(
                    p, a_k, preferred_element_type=jnp.float32
                )

    # first attempt at the model's own noise level, then in-kernel
    # escalating-jitter retries matching safe_cholesky's semantics.
    # pl.when is a real runtime branch and the custom-VJP boundary hides
    # it from autodiff, so (unlike a jax-level lax.cond, measured
    # +4.5 ms/step in training backward) the retries are free on the
    # happy path — the same design as ops/pallas_svgp.py.  The attempt
    # loop is a fori_loop with the jitter as a TRACED scalar so the
    # build+factor code is instantiated ONCE: a python-unrolled retry
    # multiplies Mosaic's scoped-VMEM stack peak per copy (the svgp
    # kernel's unrolled version OOMed at 18.4 MB vs the 16 MB default).
    def attempt(i, carry):
        finite = jnp.logical_and(
            jnp.all(jnp.isfinite(out_ref[:])),
            jnp.all(jnp.isfinite(alpha_ref[:])),
        )
        extra = jnp.where(i == 1, 1e-4, jnp.where(i >= 2, 1e-2, 0.0)).astype(
            jnp.float32
        )

        @pl.when(jnp.logical_or(i == 0, jnp.logical_not(finite)))
        def _():
            build_and_factor(extra)

        return carry

    jax.lax.fori_loop(0, 3, attempt, 0)


def _forward(x, ell, y, s2, noise):
    n, d = x.shape
    n_pad = -(-n // PANEL) * PANEL
    # pad x with distinct far-apart rows (offset 1e4, spacing 50, SCALED by
    # the data's own magnitude) so every padded off-diagonal is exp(−quad)
    # ≈ 0 even after the f32 cancellation error of the matmul-form diff²
    # (both the true quad and the error grow quadratically in the scale,
    # so the ≳1e5 margin holds for ANY coordinate units — unscaled, raw
    # km-scale eastings at |x| ~ 1e4 would land within a few sqrt(ss) of
    # the pad rows and couple to them), while the padded diagonal is
    # written exactly as s² + σ² → chol(padding) = sqrt(s² + σ²)·I.  For
    # whitened data the scale is O(1) and the padded Gram entries flush to
    # exactly 0 either way — bit-identical to the unscaled layout.
    if n_pad != n:
        scale = jnp.maximum(jnp.max(jnp.abs(x)), jnp.max(jnp.abs(ell))) + 1.0
        extra = (
            jnp.arange(1, n_pad - n + 1, dtype=x.dtype)[:, None] * 50.0 + 1e4
        ) * scale
        x = jnp.concatenate([x, jnp.broadcast_to(extra, (n_pad - n, d))], axis=0)
        ell = jnp.concatenate([ell, jnp.ones((n_pad - n, d), ell.dtype)], axis=0)
        y = jnp.concatenate([y, jnp.zeros((n_pad - n,), y.dtype)], axis=0)

    # pack x (lanes [0, d)) and ℓ (lanes [8, 8+d)) into one (n, 128) buffer
    xe = jnp.zeros((n_pad, _FEAT), jnp.float32)
    xe = jax.lax.dynamic_update_slice(xe, x.astype(jnp.float32), (0, 0))
    xe = jax.lax.dynamic_update_slice(xe, ell.astype(jnp.float32), (0, _ELL_OFF))
    sn = jnp.stack(
        [jnp.asarray(s2, jnp.float32), jnp.asarray(noise, jnp.float32)]
    )[None, :]

    out, alpha = pl.pallas_call(
        functools.partial(_fused_kernel, n=n_pad, d=d),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ),
        # headroom over the 16 MB default for the retry's isfinite
        # reduction temps — the N=1536 budget was already within 44 KB of
        # the limit (v5e has 128 MB physical VMEM; grid-less kernel, so
        # occupancy is not a concern)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=n_pad**3 // 3 + 14 * n_pad * n_pad * d,
            bytes_accessed=4 * n_pad * n_pad,
            transcendentals=2 * n_pad * n_pad * d + n_pad,
        ),
    )(xe, xe.T, y[:, None], sn)
    return out[:n, :n], alpha[:n, 0]


def _reference(x, ell, y, s2, noise):
    """Pure-jnp oracle (and VJP recompute path)."""
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference

    n = x.shape[0]
    k = s2 * gibbs_gram_reference(x, ell, x, ell) + noise * jnp.eye(n, dtype=x.dtype)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.lax.linalg.triangular_solve(
        chol, y[:, None], left_side=True, lower=True
    )[:, 0]
    return chol, alpha


@jax.custom_vjp
def gibbs_chol_solve_fused(x, ell, y, s2, noise):
    """(L, α) with L = chol(s²·K_gibbs(x, ℓ) + σ²I) and α = L⁻¹y — one
    Pallas launch, K never in HBM."""
    return _forward(x, ell, y, s2, noise)


def _fwd(x, ell, y, s2, noise):
    out = _forward(x, ell, y, s2, noise)
    return out, (x, ell, y, s2, noise, out)


def _tri_solve_T(l, b):
    """Solve Lᵀ X = B for lower-triangular L."""
    return jax.lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=True
    )


def _bwd(res, g):
    """Closed-form pullback from the SAVED primal outputs — no
    refactorisation and no Gram-in-HBM recompute of the forward.

    α = L⁻¹y pullback: ȳ = L⁻ᵀᾱ, L̄ += −ȳ αᵀ (lower).
    Cholesky pullback (Murray 2016): with Φ = tril(Lᵀ L̄, diag halved),
    K̄ = sym(L⁻ᵀ Φ L⁻¹) — two triangular solves, no chol.
    Then K = s²·G(x, ℓ) + σ²I chains through the O(N²D) Gram VJP.
    """
    x, ell, y, s2, noise, (l, alpha) = res
    lbar, abar = g
    lbar = jnp.zeros_like(l) if lbar is None else lbar
    abar = jnp.zeros_like(alpha) if abar is None else abar

    # pullback of alpha = tri_solve(L, y)
    ybar = _tri_solve_T(l, abar[:, None])[:, 0]
    lbar = lbar - jnp.tril(jnp.outer(ybar, alpha))

    # pullback of L = chol(K)
    p = l.T @ lbar
    phi = jnp.tril(p) - 0.5 * jnp.diag(jnp.diagonal(p))
    w = _tri_solve_T(l, phi)  # L⁻ᵀ Φ
    kbar_t = _tri_solve_T(l, w.T)  # L⁻ᵀ (L⁻ᵀ Φ)ᵀ = (L⁻ᵀ Φ L⁻¹)ᵀ
    kbar = 0.5 * (kbar_t + kbar_t.T)

    # chain through K = s²·G + σ²I
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference

    gram, vjp_g = jax.vjp(lambda xx, ee: gibbs_gram_reference(xx, ee, xx, ee), x, ell)
    xbar, ellbar = vjp_g(jnp.asarray(s2, kbar.dtype) * kbar)
    s2bar = jnp.sum(kbar * gram).astype(jnp.asarray(s2).dtype)
    noisebar = jnp.trace(kbar).astype(jnp.asarray(noise).dtype)
    return xbar, ellbar, ybar, s2bar, noisebar


gibbs_chol_solve_fused.defvjp(_fwd, _bwd)


def gibbs_noisy_chol_alpha(x, ell, y, s2, noise, *, use_fused: bool | None = None):
    """Dispatcher used by GibbsExactGP.loss: (L, α = L⁻¹y) for
    s²K + σ²I, via the fused Pallas kernel when eligible.

    Both paths carry escalating-jitter retry semantics: the XLA path via
    ``safe_cholesky``'s primal while_loop, the fused path via IN-KERNEL
    ``pl.when`` refactorisation (jitter 1e-4 then 1e-2 on a non-finite
    factor) — a real runtime branch that the custom-VJP boundary hides
    from autodiff, so it is free on the happy path, unlike a jax-level
    ``lax.cond`` NaN-retry which measured +4.5 ms/step in the training
    backward (profile 2026-08-16: 6.75 ms with cond vs 2.19 without at
    N=1024).  In practice K carries the model's observation noise
    (σ² ≈ 1e-2 in every reference config) on a unit-diagonal Gibbs Gram,
    so the retries essentially never fire; ``fit(nan_guard=True)``
    remains the training-level backstop.
    """
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram
    from nonstationary_precip_tpu.ops.linalg import safe_cholesky, tri_solve

    if use_fused is None:
        use_fused = eligible(x, ell)

    if not use_fused:
        n = x.shape[0]
        k = s2 * gibbs_gram(x, ell, x, ell) + noise * jnp.eye(n, dtype=x.dtype)
        chol = safe_cholesky(k)
        return chol, tri_solve(chol, y)

    return gibbs_chol_solve_fused(x, ell, y, s2, noise)
