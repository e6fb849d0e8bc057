"""Black-box matrix-matrix (BBMM) inference: batched conjugate gradients,
stochastic Lanczos quadrature, and a CG-based exact-GP marginal
log-likelihood.

The reference leans on GPyTorch's BBMM machinery implicitly — every exact
model trains under ``gpytorch.settings.max_cg_iterations`` (reference
``experiments/spatial_exp.py:99,199``, ``precipitation_baselines.py:117-119``,
``spatio_temporal_exp.py:98``), which routes MLL solves/logdets through
modified batched CG + Lanczos quadrature (Gardner et al. 2018) instead of
Cholesky.  At this workload's sizes (N ≤ ~6k) direct blocked Cholesky is
faster on TPU (SURVEY.md §2.5 measured recommendation), so the direct path
stays the default everywhere; this module supplies the large-N parity
path as an opt-in.

TPU-first design decisions:
  * mBCG runs a FIXED ``max_iters``-length ``lax.scan`` with per-column
    convergence masks (static shapes; no data-dependent trip counts under
    jit).  All per-iteration math is one (N, R)-wide MXU matmul plus
    vector ops — R right-hand sides ride the lane dimension together.
  * The Lanczos tridiagonal coefficients fall out of the same scan (the
    CG α/β recurrence), so the logdet probes share the solve's matvecs.
  * The pivoted-Cholesky preconditioner's row gather is a one-hot MXU
    matvec (no dynamic row indexing on the sublane axis).
  * ``cg_mll`` wraps the whole estimator in a ``jax.custom_vjp`` whose
    pullback uses the standard trace identity
    dMLL/dK = ½(ααᵀ − E[probe · (K⁻¹probe)ᵀ]) with the probe solves saved
    from the forward — no differentiation through the iteration.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    """Solution and Lanczos data from ``mbcg``."""

    x: jnp.ndarray        # (N, R) solutions
    alphas: jnp.ndarray   # (T, R) CG step sizes (0 where converged/invalid)
    betas: jnp.ndarray    # (T, R) CG direction updates
    residnorm: jnp.ndarray  # (R,) final RELATIVE residual norms (/ ||b||)
    iters: jnp.ndarray    # (R,) iterations to convergence (= T if never)
    broke: jnp.ndarray    # (R,) True where CG hit pᵀKp ≤ 0 before converging
    resnorm_hist: jnp.ndarray  # (T, R) relative residual after each iteration


def mbcg(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    max_iters: int = 100,
    tol: float = 1e-6,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> CGResult:
    """Modified batched conjugate gradients (GPyTorch's mBCG).

    Solves ``K x = b`` for all R columns of ``b`` simultaneously and
    records the per-column CG coefficients (α, β) that define the Lanczos
    tridiagonal of the (preconditioned) operator — the input to
    ``lanczos_logdet``.

    ``matvec`` maps (N, R) → (N, R) (one fused MXU matmul for a dense K).
    ``precond`` applies P⁻¹ (same signature); omit for plain CG.
    Converged columns freeze: their updates are masked to zero, so the
    fixed-length scan is exact (bitwise) w.r.t. an early-exit loop.
    """
    b, safe_bnorm, init = mbcg_init(b, precond)
    step = _make_mbcg_step(matvec, precond, tol, safe_bnorm, b.dtype)
    (x, res, _, _, _, _, iters, broke), (alphas, betas, resnorms) = jax.lax.scan(
        step, init, None, length=max_iters
    )
    return CGResult(
        x=x,
        alphas=alphas,
        betas=betas,
        residnorm=jnp.linalg.norm(res, axis=0) / safe_bnorm,
        iters=iters,
        broke=broke,
        # already a scan output — XLA dead-code-eliminates it at every
        # call site that doesn't consume it (convergence probes do)
        resnorm_hist=resnorms / safe_bnorm[None, :],
    )


def mbcg_init(b: jnp.ndarray, precond=None):
    """(b, safe_bnorm, carry0) for the mBCG iteration — public so
    host-chunked callers (:func:`mbcg_chunk`) can build the same initial
    state :func:`mbcg` uses internally."""
    r = b.shape[1]
    minv = precond if precond is not None else (lambda v: v)
    bnorm = jnp.linalg.norm(b, axis=0)  # (R,)
    safe_bnorm = jnp.maximum(bnorm, 1e-30)
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = minv(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0, axis=0)  # (R,)
    init = (
        x0, r0, z0, p0, rz0,
        jnp.zeros((r,), bool), jnp.zeros((r,), jnp.int32), jnp.zeros((r,), bool),
    )
    return b, safe_bnorm, init


def mbcg_chunk(matvec, carry, length: int, tol: float, safe_bnorm, precond=None):
    """``length`` mBCG iterations from ``carry`` (from :func:`mbcg_init`
    or a previous chunk): (carry', (alphas, betas, resnorms)) — the same
    ops in the same order as :func:`mbcg`'s single scan, so a sequence of
    chunks is BITWISE the monolithic run.  Exists for the host-chunked
    regime (DESIGN.md §27): a single device program executing ≳60–90 s
    crashes the axon worker, so at N ≥ ~512k the CG budget must re-enter
    from the host every few iterations; jit this per chunk-length and
    drive it eagerly."""
    x0 = carry[0]
    step = _make_mbcg_step(matvec, precond, tol, safe_bnorm, x0.dtype)
    return jax.lax.scan(step, carry, None, length=length)


def _make_mbcg_step(matvec, precond, tol, safe_bnorm, dtype):
    minv = precond if precond is not None else (lambda v: v)

    def step(carry, _):
        x, res, z, p, rz, done, it, broke = carry
        kp = matvec(p)
        pkp = jnp.sum(p * kp, axis=0)
        # α = rᵀz / pᵀKp, masked on converged / degenerate columns.
        # pᵀKp ≤ 0 on a column whose residual is still LARGE means K (or
        # the preconditioned operator) is not SPD — record it so callers
        # can refuse the silently-frozen answer.  Near the dtype's
        # convergence floor, a non-positive pᵀKp from cancellation on an
        # ill-conditioned SPD K is benign stagnation (the column freezes
        # at rounding-level accuracy; GPyTorch tolerates this), not
        # breakdown — don't NaN-poison those.  Floor: max(10·tol,
        # 1000·eps) ≈ 1e-4 f32 / 2e-13 f64; a genuinely indefinite
        # operator trips pᵀKp ≤ 0 while the residual is still O(1).
        stall = jnp.maximum(10.0 * tol, 1e3 * float(jnp.finfo(dtype).eps))
        relres = jnp.linalg.norm(res, axis=0) / safe_bnorm
        broke = jnp.logical_or(
            broke,
            jnp.logical_and(
                jnp.logical_not(done),
                jnp.logical_and(pkp <= 0.0, relres > stall),
            ),
        )
        valid = jnp.logical_and(jnp.logical_not(done), pkp > 0.0)
        alpha = jnp.where(valid, rz / jnp.where(pkp > 0.0, pkp, 1.0), 0.0)
        x = x + alpha[None, :] * p
        res_new = res - alpha[None, :] * kp
        z_new = minv(res_new)
        rz_new = jnp.sum(res_new * z_new, axis=0)
        beta = jnp.where(valid, rz_new / jnp.where(rz > 0.0, rz, 1.0), 0.0)
        p_new = jnp.where(valid[None, :], z_new + beta[None, :] * p, p)
        resnorm = jnp.linalg.norm(res_new, axis=0)
        newly_done = resnorm / safe_bnorm < tol
        done_next = jnp.logical_or(done, newly_done)
        it = it + jnp.where(done, 0, 1)
        res = jnp.where(valid[None, :], res_new, res)
        z = jnp.where(valid[None, :], z_new, z)
        rz = jnp.where(valid, rz_new, rz)
        return (x, res, z, p_new, rz, done_next, it, broke), (alpha, beta, resnorm)

    return step


def lanczos_tridiag(alphas: jnp.ndarray, betas: jnp.ndarray) -> jnp.ndarray:
    """CG coefficients → Lanczos tridiagonal matrices, (R, T, T).

    Standard CG↔Lanczos correspondence:
      T[0,0]   = 1/α₀
      T[j,j]   = 1/αⱼ + βⱼ₋₁/αⱼ₋₁
      T[j,j−1] = T[j−1,j] = √βⱼ₋₁ / αⱼ₋₁
    Iterations past convergence carry α = 0; their rows/cols collapse to
    an identity pad (eigenvalue 1, weight 0 — they do not perturb the
    quadrature because the Lanczos weight vector e₁ has no mass there).
    """
    t, r = alphas.shape
    a = alphas.T  # (R, T)
    bt = betas.T
    safe_a = jnp.where(a > 0.0, a, 1.0)
    inv_a = 1.0 / safe_a
    # explicit dtype: argless jnp.zeros is f64 under jax_enable_x64 and
    # would silently upcast the whole SLQ estimate (and its cotangents)
    prev_inv_a = jnp.concatenate(
        [jnp.zeros((r, 1), a.dtype), inv_a[:, :-1]], axis=1
    )
    prev_b = jnp.concatenate([jnp.zeros((r, 1), a.dtype), bt[:, :-1]], axis=1)
    diag = jnp.where(a > 0.0, inv_a + prev_b * prev_inv_a, 1.0)
    off = jnp.where(
        (a > 0.0) & (prev_b > 0.0), jnp.sqrt(prev_b) * prev_inv_a, 0.0
    )[:, 1:]  # (R, T−1)
    tri = (
        jnp.zeros((r, t, t), a.dtype)
        .at[:, jnp.arange(t), jnp.arange(t)]
        .set(diag)
        .at[:, jnp.arange(1, t), jnp.arange(t - 1)]
        .set(off)
        .at[:, jnp.arange(t - 1), jnp.arange(1, t)]
        .set(off)
    )
    return tri


def lanczos_logdet(
    alphas: jnp.ndarray, betas: jnp.ndarray, probe_sqnorms: jnp.ndarray
) -> jnp.ndarray:
    """Stochastic Lanczos quadrature logdet estimate from mBCG coefficients.

    With unit-normalized probes z̃ᵢ (‖zᵢ‖² recorded in ``probe_sqnorms``),
      log det K ≈ mean_i ‖zᵢ‖² · e₁ᵀ log(Tᵢ) e₁
    where Tᵢ is probe i's Lanczos tridiagonal.  For Rademacher probes
    ‖zᵢ‖² = n exactly.  The T×T eigendecompositions are (R, t, t) — tiny.
    """
    tri = lanczos_tridiag(alphas, betas)
    evals, evecs = jnp.linalg.eigh(tri)
    w = evecs[:, 0, :] ** 2  # (R, T): first-row weights
    # Ritz values of the (preconditioned) SPD operator are strictly
    # positive; padded iterations contribute exactly 1 (decoupled identity
    # block).  But eigh's backward error is ~eps·‖T‖, so a genuinely
    # positive tiny Ritz value of an ill-conditioned operator (e.g.
    # trained-down sigma2 ~ 1e-6 with no preconditioner) can round
    # slightly negative.  Tolerate that band — floor the log at the
    # rounding scale rather than 1e-30, which would fold log(1e-30) ≈ -69
    # into the MLL — and NaN-poison only beyond it, where the cause is a
    # CG breakdown or an indefinite kmat, so nan_guard / callers can
    # detect estimator failure without false positives on valid fits.
    # NB: multiply the jnp array FIRST — `8.0 * finfo.eps` is Python-float ×
    # numpy-scalar, a STRONG numpy float64 under jax_enable_x64, which would
    # silently upcast tol → loge → the whole MLL (and its cotangents).
    tol = 8.0 * (
        jnp.finfo(evals.dtype).eps
        * jnp.max(jnp.abs(evals), axis=-1, keepdims=True)
    )
    loge = jnp.log(jnp.maximum(evals, jnp.maximum(tol, 1e-30)))
    quad = jnp.sum(w * loge, axis=-1)  # (R,)
    est = jnp.mean(probe_sqnorms * quad)
    return jnp.where(jnp.any(evals <= -tol), jnp.nan, est)


def pivoted_cholesky(k: jnp.ndarray, rank: int, jitter: float = 1e-8):
    """Rank-``rank`` pivoted (partial) Cholesky factor L with
    LLᵀ ≈ K — GPyTorch's CG preconditioner (Harbrecht et al. 2012).

    Greedy: each step picks the largest remaining diagonal entry and
    eliminates it.  The pivot row gather runs as a one-hot MXU matvec
    (eᵀK) so no dynamic sublane indexing is needed; ``rank`` is static
    (python loop — rank is small, ~5–20).
    Returns (L (N, rank), perm diag history for diagnostics).
    """
    n = k.shape[-1]
    d = jnp.diagonal(k)
    l = jnp.zeros((n, rank), k.dtype)
    hist = []
    for j in range(rank):
        piv = jnp.argmax(d)
        dmax = d[piv]
        onehot = jax.nn.one_hot(piv, n, dtype=k.dtype)
        krow = onehot @ k  # (N,) pivot row via MXU
        lrow = onehot @ l  # (rank,) L[piv]
        resid = krow - l @ lrow
        col = resid / jnp.sqrt(jnp.maximum(dmax, jitter))
        col = jnp.where(d > 0.0, col, 0.0)
        l = l.at[:, j].set(col)
        d = jnp.maximum(d - col * col, 0.0)
        d = d * (1.0 - onehot)  # pivot fully eliminated
        hist.append(dmax)
    return l, jnp.stack(hist)


def woodbury_precond(l: jnp.ndarray, sigma2) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """P⁻¹ for P = LLᵀ + σ²I via Woodbury:
    P⁻¹v = (v − L (σ²Iₖ + LᵀL)⁻¹ Lᵀ v) / σ².  The k×k Cholesky is done
    once; each application is two skinny MXU matmuls."""
    kk = l.shape[-1]
    inner = sigma2 * jnp.eye(kk, dtype=l.dtype) + l.T @ l
    cf = jax.scipy.linalg.cho_factor(inner, lower=True)

    def apply(v):
        return (v - l @ jax.scipy.linalg.cho_solve(cf, l.T @ v)) / sigma2

    return apply


def precond_logdet(l: jnp.ndarray, sigma2, n: int) -> jnp.ndarray:
    """log det(LLᵀ + σ²I) = Σ log(λᵢ(LᵀL) + σ²) + (n − k) log σ²."""
    kk = l.shape[-1]
    lam = jnp.linalg.eigvalsh(l.T @ l)
    return jnp.sum(jnp.log(lam + sigma2)) + (n - kk) * jnp.log(sigma2)


def sample_precond_probes(key, l: jnp.ndarray, sigma2, num: int) -> jnp.ndarray:
    """z ~ N(0, P) with P = LLᵀ + σ²I:  z = L u₁ + σ u₂ — exact, no
    factorisation of P."""
    n, kk = l.shape
    k1, k2 = jax.random.split(key)
    u1 = jax.random.normal(k1, (kk, num), l.dtype)
    u2 = jax.random.normal(k2, (n, num), l.dtype)
    return l @ u1 + jnp.sqrt(sigma2) * u2


# ---------------------------------------------------------------------------
# CG-based exact-GP marginal log-likelihood
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def cg_mll(
    kmat: jnp.ndarray,
    y: jnp.ndarray,
    key: jax.Array,
    sigma2: jnp.ndarray,
    num_probes: int = 8,
    max_iters: int = 100,
    tol: float = 1e-6,
    precond_rank: int = 0,
):
    """−½ yᵀK⁻¹y − ½ log det K − (n/2) log 2π, by mBCG + SLQ.

    The large-N parity path for GPyTorch's BBMM ExactMarginalLogLikelihood
    (reference trains every exact model under ``max_cg_iterations``).
    ``kmat`` must include the noise (K_f + σ²I); ``sigma2`` is that noise
    level, used ONLY to split the preconditioner P = L̃L̃ᵀ + σ²I (pivoted
    Cholesky runs on the PSD part K − σ²I) — it parameterises the
    estimator, not the estimand, so it carries no gradient.  The logdet
    is a stochastic estimate (``num_probes`` Rademacher probes, or
    N(0, P) probes when ``precond_rank > 0``); the GRADIENT uses the same
    probes through the standard unbiased trace identity, so optimisation
    sees a consistent estimator (exactly GPyTorch's training regime).
    """
    val, _ = _cg_mll_fwd(
        kmat, y, key, sigma2, num_probes, max_iters, tol, precond_rank
    )
    return val


def _cg_mll_fwd(kmat, y, key, sigma2, num_probes, max_iters, tol, precond_rank):
    n = y.shape[-1]
    matvec = lambda v: kmat @ v  # noqa: E731

    if precond_rank > 0:
        s2 = jax.lax.stop_gradient(sigma2)
        lpc, _ = pivoted_cholesky(
            kmat - s2 * jnp.eye(n, dtype=kmat.dtype), precond_rank
        )
        lpc = jax.lax.stop_gradient(lpc)
        minv = woodbury_precond(lpc, s2)
        probes = sample_precond_probes(key, lpc, s2, num_probes)
        logdet_p = precond_logdet(lpc, s2, n)
        # SLQ weight in the P⁻¹ inner product: for z ~ N(0, P),
        # E[zᵀP⁻¹ log(P⁻¹K) z] = tr log(P⁻¹K) = log det K − log det P
        minv_probes = minv(probes)
        probe_w = jnp.sum(probes * minv_probes, axis=0)
        # Right vectors for the gradient's trace estimator: with
        # z ~ N(0, P), E[z (P⁻¹z)ᵀ] = I, so pairing K⁻¹z with P⁻¹z keeps
        # E[(K⁻¹z)(P⁻¹z)ᵀ] = K⁻¹ — unbiased (pairing with z itself would
        # give K⁻¹P).
        probe_rights = minv_probes
    else:
        minv = None
        probes = jax.random.rademacher(key, (n, num_probes), dtype=kmat.dtype)
        logdet_p = jnp.asarray(0.0, kmat.dtype)
        probe_w = jnp.sum(probes * probes, axis=0)  # = n exactly
        probe_rights = probes  # E[z zᵀ] = I for Rademacher

    rhs = jnp.concatenate([y[:, None], probes], axis=1)  # (N, 1+R)
    res = mbcg(matvec, rhs, max_iters=max_iters, tol=tol, precond=minv)
    alpha = res.x[:, 0]             # K⁻¹ y
    probe_solves = res.x[:, 1:]     # K⁻¹ zᵢ
    logdet = logdet_p + lanczos_logdet(
        res.alphas[:, 1:], res.betas[:, 1:], probe_w
    )
    mll = -0.5 * jnp.dot(y, alpha) - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)
    # CG breakdown on any column (kmat not SPD under the preconditioner)
    # invalidates both the solve and the quadrature — NaN-poison so
    # nan_guard / callers see estimator failure, not a plausible number.
    mll = jnp.where(jnp.any(res.broke), jnp.nan, mll)
    return mll, (alpha, probe_rights, probe_solves, y, sigma2)


def _cg_mll_bwd(num_probes, max_iters, tol, precond_rank, saved, g):
    alpha, probe_rights, probe_solves, y, sigma2 = saved
    # dMLL/dK = ½ ααᵀ − ½ K⁻¹ ≈ ½ ααᵀ − ½ mean_i (K⁻¹zᵢ) rᵢᵀ  (Hutchinson
    # trace identity).  The right vectors rᵢ are chosen in the forward so
    # the estimator stays unbiased for either probe law: rᵢ = zᵢ for
    # Rademacher (E[z zᵀ] = I) and rᵢ = P⁻¹zᵢ for z ~ N(0, P)
    # (E[z (P⁻¹z)ᵀ] = I).  Symmetrised for exactness.
    kbar = 0.5 * jnp.outer(alpha, alpha) - 0.5 * (
        probe_solves @ probe_rights.T
    ) / probe_rights.shape[-1]
    kbar = 0.5 * (kbar + kbar.T)
    ybar = -alpha
    # sigma2 enters only through the (stop-gradient) preconditioner — its
    # cotangent is an exact zero, in sigma2's OWN dtype (a weak f64 zero
    # here poisons f32 grad accumulation under jax_enable_x64)
    return (g * kbar, g * ybar, None, jnp.zeros_like(sigma2))


cg_mll.defvjp(_cg_mll_fwd, _cg_mll_bwd)
