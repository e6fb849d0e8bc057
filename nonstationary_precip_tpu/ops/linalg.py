"""Dense linear algebra for GP inference: Cholesky-centric, jit-safe.

This is the layer the reference delegated to GPyTorch's compiled internals
(``psd_safe_cholesky`` at /root/reference/models/gibbs_kernels.py:201,
``torch.triangular_solve`` at :203, ``torch.linalg.solve`` in
/root/reference/utils/functional.py:29-43, ``robust_logdet`` at
utils/functional.py:152-162).  Design decisions, TPU-first:

* Everything is expressed through one primitive pair — ``cholesky`` +
  ``tri_solve`` — so swapping in the Pallas blocked implementations
  (ops/pallas_chol.py) changes one dispatch site.
* ``safe_cholesky`` implements the escalating-jitter retry *inside* jit as a
  ``lax.while_loop`` (no data-dependent Python control flow): recompute with
  10x jitter until the factorisation is finite, up to ``max_jitter``.
* Marginal likelihoods are computed directly from the factor
  (``mvn_logpdf_from_chol``) — at the N <= 6k sizes of this workload a direct
  blocked Cholesky beats GPyTorch's CG/BBMM path, so CG is deliberately not
  replicated (SURVEY.md §2.5).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.utils.config import EPSILON

__all__ = [
    "add_jitter",
    "cholesky",
    "safe_cholesky",
    "tri_solve",
    "cho_solve",
    "solve_psd",
    "mvn_logpdf_from_chol",
    "robust_logdet",
]


def add_jitter(mat: jnp.ndarray, jitter: float = EPSILON) -> jnp.ndarray:
    """K + jitter*I on the last two dims."""
    n = mat.shape[-1]
    return mat + jitter * jnp.eye(n, dtype=mat.dtype)


def cholesky(mat: jnp.ndarray, *, use_pallas: bool | None = None) -> jnp.ndarray:
    """Lower-triangular Cholesky factor.

    Dispatches on TPU for float32 operands: the single-launch VMEM kernel
    for 768 ≤ N ≤ 1280, the GEMM-formulation HBM-streaming kernel (v2,
    1.12–1.13× XLA at 6144–8192 per the r3 calm re-sweep; r2's 1.93× was
    a favourable-window artifact) from MIN_N_STREAM2 up; otherwise XLA.
    """
    auto = use_pallas is None
    if auto:
        use_pallas = _pallas_chol_eligible(mat)
    if use_pallas:
        from nonstationary_precip_tpu.ops.pallas_chol import blocked_cholesky

        return blocked_cholesky(mat)
    if auto:
        try:
            import nonstationary_precip_tpu.ops.pallas_chol as pc

            if pc.stream2_eligible(mat):
                return pc.streaming_cholesky2(mat)
        except Exception:
            pass
    return jnp.linalg.cholesky(mat)


def _pallas_chol_eligible(mat: jnp.ndarray) -> bool:
    try:
        import nonstationary_precip_tpu.ops.pallas_chol as pc

        return pc.eligible(mat)
    except Exception:
        return False


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def safe_cholesky(
    mat: jnp.ndarray, jitter: float = EPSILON, max_tries: int = 6
) -> jnp.ndarray:
    """Cholesky with escalating-jitter retry, jit-safe AND reverse-mode
    differentiable — ONE factorisation on the happy path, NO lax.cond.

    Reference semantics: GPyTorch's ``psd_safe_cholesky`` with
    ``cholesky_jitter(EPSILON)`` (/root/reference/experiments/spatial_exp.py:31):
    try the plain factorisation first, then jitter·10^i for i = 0.. on
    failure.

    Cost design (round-2, measured): a ``lax.cond``-gated retry costs
    +4.5 ms/step in training backward (jax's cond transpose), and the
    round-1 probe-then-factor design paid 2 factorisations always.  Here
    the WHOLE op is a custom-VJP primitive: the forward is a primal
    while_loop that carries the factor itself (happy path = exactly one
    Pallas-dispatched factorisation, retries only on non-finite), and the
    backward is the closed-form Cholesky pullback from the saved L (two
    triangular solves — identical cost to jax's own cholesky VJP, no
    refactorisation).  The jitter LEVEL is a non-differentiable choice,
    exactly as in GPyTorch where autograd flows through the jittered
    matrix, not the retry control flow.
    """
    return _safe_chol_fwd_impl(mat, jitter, max_tries)


def _safe_chol_fwd_impl(mat, jitter, max_tries):
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    base = jitter if jitter > 0 else EPSILON

    chol0 = cholesky(mat)

    def cond_fn(state):
        i, _, chol = state
        return jnp.logical_and(
            i < max_tries, jnp.logical_not(jnp.all(jnp.isfinite(chol)))
        )

    def body(state):
        # PER-MEMBER escalation (GPyTorch's psd_safe_cholesky jitters only
        # the failing batch entries): members whose factor is already
        # finite keep their current jitter — 0 for never-failed ones, so
        # the recompute reproduces their factor BIT-EXACTLY (same op, same
        # input) — while failing members escalate ×10.  One bad member in
        # a stacked batch (e.g. the lockstep 10-split trainers) therefore
        # cannot perturb the other nine's trajectories.
        i, j, chol = state
        finite = jnp.all(jnp.isfinite(chol), axis=(-1, -2))
        j_next = jnp.where(finite, j, jnp.where(j == 0, base, j * 10.0))
        chol = jnp.linalg.cholesky(mat + j_next[..., None, None] * eye)
        return i + 1, j_next, chol

    zeros = jnp.zeros(mat.shape[:-2], dtype=mat.dtype)
    _, _, chol = jax.lax.while_loop(cond_fn, body, (jnp.asarray(0), zeros, chol0))
    return chol


def _safe_chol_fwd(mat, jitter, max_tries):
    chol = _safe_chol_fwd_impl(mat, jitter, max_tries)
    return chol, chol


def _safe_chol_bwd(jitter, max_tries, chol, g):
    """Closed-form Cholesky pullback (Murray 2016) from the saved factor:
    K̄ = sym(L⁻ᵀ Φ(LᵀL̄) L⁻¹), Φ = tril with halved diagonal."""
    lt = jnp.swapaxes(chol, -1, -2)
    p = lt @ g
    eye = jnp.eye(chol.shape[-1], dtype=chol.dtype)
    phi = jnp.tril(p) - 0.5 * p * eye

    def solve_t(b):
        return jax.lax.linalg.triangular_solve(
            chol, b, left_side=True, lower=True, transpose_a=True
        )

    w = solve_t(phi)
    kbar_t = solve_t(jnp.swapaxes(w, -1, -2))
    return (0.5 * (kbar_t + jnp.swapaxes(kbar_t, -1, -2)),)


safe_cholesky.defvjp(_safe_chol_fwd, _safe_chol_bwd)


def tri_solve(
    chol: jnp.ndarray, rhs: jnp.ndarray, *, lower: bool = True, trans: bool = False
) -> jnp.ndarray:
    """Solve L x = rhs (or L^T x = rhs when trans) for triangular L.

    rhs may be a vector (..., n) or matrix (..., n, k).  The Pallas
    blocked TRSM serves the lower/no-transpose matrix case when opted in
    (NSGP_PALLAS_TRSM=1, ops/pallas_trsm.py).
    """
    if lower and not trans and rhs.ndim == 2 and chol.ndim == 2:
        try:
            import nonstationary_precip_tpu.ops.pallas_trsm as pt

            if pt.eligible(chol, rhs):
                return pt.blocked_trsm(chol, rhs)
        except Exception:
            pass
    vec = rhs.ndim == chol.ndim - 1
    if vec:
        rhs = rhs[..., None]
    out = jax.lax.linalg.triangular_solve(
        chol,
        rhs,
        left_side=True,
        lower=lower,
        transpose_a=trans,
    )
    return out[..., 0] if vec else out


def cho_solve(chol: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = rhs given lower-triangular L."""
    return tri_solve(chol, tri_solve(chol, rhs, lower=True), lower=True, trans=True)


def solve_psd(mat: jnp.ndarray, rhs: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Solve A x = rhs for PSD A via Cholesky (replaces the reference's
    ``fn.mv(..., invert=True)`` / ``torch.inverse`` compositions,
    /root/reference/utils/functional.py:29-43)."""
    a = add_jitter(mat, jitter) if jitter else mat
    return cho_solve(cholesky(a), rhs)


def diag_part(mat: jnp.ndarray) -> jnp.ndarray:
    """Diagonal of (…, N, N) via an eye-mask row reduction.

    Value-exact vs ``jnp.diagonal`` (the off-diagonal terms contribute
    exact f32 zeros to the sum) and gradient-identical — but where
    jnp.diagonal's BACKWARD is a scatter-add that materialises a full
    (…, N, N) buffer (plus layout copies inside training while-loops on
    TPU; device trace 2026-08-17), this form's backward is a fused
    eye-masked broadcast.  Use in every DIFFERENTIATED logdet; plain
    jnp.diagonal remains fine (and cheaper) in forward-only paths."""
    n = mat.shape[-1]
    eye = jnp.eye(n, dtype=mat.dtype)
    return jnp.sum(mat * eye, axis=-1)


def mvn_logpdf_from_chol(
    y: jnp.ndarray, mean: jnp.ndarray, chol: jnp.ndarray
) -> jnp.ndarray:
    """log N(y | mean, L L^T) with L lower triangular.  Batched over leading dims."""
    n = y.shape[-1]
    diff = y - mean
    alpha = tri_solve(chol, diff)
    quad = jnp.sum(alpha**2, axis=-1)
    logdet = 2.0 * jnp.sum(jnp.log(diag_part(chol)), axis=-1)
    return -0.5 * (quad + logdet + n * math.log(2.0 * math.pi))


@partial(jax.jit, static_argnames=())
def robust_logdet(
    mat: jnp.ndarray, init_scale: float = 1e-30, max_scale: float = 1e-6
) -> jnp.ndarray:
    """logdet with escalating diagonal regularisation until finite.

    Mirrors /root/reference/utils/functional.py:152-162 (init 1e-30, x10
    escalation, cap 1e-6) as a ``lax.while_loop``.
    """
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)

    def logdet(m):
        sign, val = jnp.linalg.slogdet(m)
        return jnp.where(sign > 0, val, jnp.nan)

    def cond(state):
        reg, out = state
        return jnp.logical_and(reg <= max_scale, jnp.any(jnp.isnan(out)))

    def body(state):
        reg, _ = state
        return reg * 10.0, logdet(mat + reg * eye)

    out0 = logdet(mat)
    reg0 = jnp.asarray(init_scale, dtype=mat.dtype)
    _, out = jax.lax.while_loop(cond, body, (reg0, out0))
    return out
