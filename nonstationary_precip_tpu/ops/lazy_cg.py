"""Matrix-free ("lazy") BBMM on ONE chip: exact-GP MLL, gradients and
posterior where the N×N Gram never materialises in HBM — only a
(block, N) row panel exists transiently inside each matvec.

This is the TPU-native counterpart of GPyTorch's LazyTensor /
LinearOperator layer, the machinery the reference trains every exact
model through implicitly (``gpytorch.settings.max_cg_iterations`` at
reference ``experiments/spatial_exp.py:199``,
``precipitation_baselines.py:117-119`` routes MLL solves and logdets
through BBMM over a *lazily evaluated* kernel operator).  Our dense
``ops/bbmm.py`` matches the math but still builds K ∈ R^{N×N}; this
module removes that O(N²) memory wall on a single chip, the same way
``parallel/sharded_cg.py`` removes it across a mesh:

  * the mBCG matvec is a ``lax.map`` over row panels — each iteration
    rebuilds rows [i·B, (i+1)·B) of K + σ²I from x (one fused Gram
    construction + one (B, N)×(N, R) MXU matmul) and discards them;
    peak memory is O(B·N + N·R) instead of O(N²),
  * the custom-VJP pullback never forms the (N, N) cotangent either:
    dMLL/dK = ½ααᵀ − ½·mean_i (K⁻¹zᵢ)rᵢᵀ is rank-(1+R), so each panel's
    cotangent block is assembled on the fly from the saved CG solutions
    and pulled back through that panel's Gram construction inside one
    ``lax.scan`` — parameter/x/σ² gradients accumulate across panels,
  * σ² rides the panel diagonal, so (unlike the dense ``cg_mll``, whose
    K already contains the noise) its gradient falls out of the same
    trace identity automatically,
  * recomputing panels in the backward instead of saving them is the
    classic rematerialisation trade: Gram FLOPs are cheap next to the
    HBM an (N, N) residency would cost.

Same-key bit-compatibility: the panels compute the same row dot
products as the dense path (merely partitioned), so with the same PRNG
key the CG trajectory, SLQ probes and MLL value agree with
``ops/bbmm.cg_mll`` to rounding — tested in ``tests/test_lazy_cg.py``.

Kernels whose state aligns with Gram rows (Gibbs per-point
lengthscales) use the same packed-payload pattern as the sharded path:
``x_aug = concat([x, log_ell], 1)`` with a module-level ``cross_fn``
that unpacks.  ``cross_fn`` identity must be stable across calls
(machinery is cached per identity; a per-call closure forces a full
retrace and, on axon, minutes of remote recompile).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.ops.bbmm import (
    lanczos_logdet,
    mbcg,
    mbcg_chunk,
    mbcg_init,
    precond_logdet,
    sample_precond_probes,
)


def default_cross(kernel, xa, xb):
    return kernel(xa, xb)


_SEEN_CROSS_FN = {}  # code object -> last function identity seen for it


def warn_unstable_cross_fn(cross_fn):
    """Detect the per-call-closure anti-pattern: the same code object
    arriving under a fresh function identity means every call cache-misses
    the lru-cached machinery and retraces (minutes per axon recompile)."""
    code = getattr(cross_fn, "__code__", None)
    if code is None:
        return
    prev = _SEEN_CROSS_FN.get(code)
    if prev is not None and prev is not cross_fn:
        import warnings

        warnings.warn(
            "lazy/sharded CG: cross_fn is a new closure over the same code "
            "as a previous call — each fresh identity forces a full retrace "
            "and remote recompile. Define cross_fn once at module scope (or "
            "cache it) so its identity is stable across steps.",
            stacklevel=3,
        )
    _SEEN_CROSS_FN[code] = cross_fn


def check_divisible(n: int, m: int, what: str, unit: str):
    if n % m:
        raise ValueError(
            f"{what} length {n} is not divisible by the {unit} {m} — pad "
            "the data (padding Gram rows is NOT neutral: fake train points "
            "change the solve)"
        )


def _panel(kernel, x_blk, x, sigma2, i0, cross_fn):
    """Rows [i0, i0+B) of K + σ²I: the only piece of the Gram that ever
    exists.  The σ² ridge lands on the global diagonal via a row-index
    mask (no dynamic sublane indexing)."""
    kb = cross_fn(kernel, x_blk, x)
    n = x.shape[0]
    idx = i0 + jnp.arange(x_blk.shape[0])
    mask = (jnp.arange(n)[None, :] == idx[:, None]).astype(kb.dtype)
    return kb + sigma2 * mask


def _lazy_matvec(kernel, x, sigma2, block, cross_fn):
    """(N, R) → (N, R) multiply by K + σ²I, one (block, N) panel at a
    time.  ``lax.map`` keeps exactly one panel live."""
    n, d = x.shape
    nb = n // block
    x_panels = x.reshape(nb, block, d)
    starts = jnp.arange(nb) * block

    def matvec(v):
        def body(args):
            i0, x_blk = args
            return _panel(kernel, x_blk, x, sigma2, i0, cross_fn) @ v

        out = jax.lax.map(body, (starts, x_panels))  # (nb, B, R)
        return out.reshape(n, v.shape[-1])

    return matvec


def _woodbury(lpc, s2):
    """P⁻¹ for P = LLᵀ + σ²I (see ops/bbmm.woodbury_precond; rebuilt here
    from the raw factor so the machinery closes over data, not callables)."""
    kk = lpc.shape[-1]
    inner = s2 * jnp.eye(kk, dtype=lpc.dtype) + lpc.T @ lpc
    cf = jax.scipy.linalg.cho_factor(inner, lower=True)
    return lambda v: (v - lpc @ jax.scipy.linalg.cho_solve(cf, lpc.T @ v)) / s2


def lazy_pivoted_cholesky(
    kernel,
    x: jnp.ndarray,
    rank: int,
    cross_fn: Callable = default_cross,
    jitter: float = 1e-8,
    key=None,
):
    """Rank-``rank`` pivoted Cholesky of the NOISE-FREE K(x, x) without
    materialising it: the diagonal comes from vmapped single-point
    evaluations, each pivot row from one (1, N) cross-Gram build.  Same
    greedy recursion as ``ops/bbmm.pivoted_cholesky`` (which needs the
    dense matrix), so the two agree to rounding given the same pivots.

    ``key=None`` (default) uses the classic GREEDY pivot (argmax of the
    residual diagonal).  Passing a PRNG key switches to RPCholesky
    (Chen, Epperly, Tropp & Webber 2022): each pivot is SAMPLED with
    probability proportional to the residual diagonal.  Randomised
    pivoting is near-optimal in trace norm and, unlike greedy, does not
    collapse on slowly-decaying spectra — DESIGN.md §20's measured
    anomaly where a rank-400 greedy factor preconditions WORSE than
    rank-200 (near-breakdown columns late in the greedy sequence).
    Everything downstream (Woodbury solve, probe sampling, logdet
    correction) is pivot-rule agnostic.

    The recursion runs as a ``fori_loop`` (static trip count ⇒ still
    reverse-differentiable), not a Python loop: unrolled at rank 150 it
    duplicated the pivot step ~150× in the HLO, which is pure compile
    time on axon's remote service — the float ops and their order are
    identical, so results are bitwise the same as the unrolled form."""
    n = x.shape[0]
    d0 = jax.vmap(lambda xi: cross_fn(kernel, xi[None], xi[None])[0, 0])(x)

    def step(j, carry):
        l, d = carry
        if key is None:
            piv = jnp.argmax(d)
        else:
            # RPCholesky: P(piv = i) ∝ d_i.  Exhausted pivots have d = 0
            # exactly (zeroed below) ⇒ log gives -inf ⇒ probability 0.
            piv = jax.random.categorical(
                jax.random.fold_in(key, j), jnp.log(d)
            )
        dmax = d[piv]
        xp = jax.lax.dynamic_slice_in_dim(x, piv, 1)
        krow = cross_fn(kernel, xp, x)[0]  # (N,)
        lrow = jax.lax.dynamic_slice_in_dim(l, piv, 1)[0]  # (rank,)
        resid = krow - l @ lrow
        col = resid / jnp.sqrt(jnp.maximum(dmax, jitter))
        col = jnp.where(d > 0.0, col, 0.0)
        l = jax.lax.dynamic_update_slice_in_dim(l, col[:, None], j, axis=1)
        d = jnp.maximum(d - col * col, 0.0)
        d = d * (1.0 - (jnp.arange(n) == piv).astype(d.dtype))
        return l, d

    l, _ = jax.lax.fori_loop(
        0, rank, step, (jnp.zeros((n, rank), x.dtype), d0)
    )
    return l


def _warn_dead_rank(lam, cutoff, rank):
    """Capacity guard (VERDICT r4 #3, DESIGN §30): when the landmark Gram
    keeps only a small fraction of the requested rank above the cutoff,
    the extra columns buy no preconditioning (same kept subspace) while
    enlarging the f32 Woodbury inner problem — the measured failure
    direction at the 1M octave.  Host-side only: under jit the spectrum
    is traced and the check silently skips (the chunked/serving paths
    build factors eagerly, which is where a user can act on it)."""
    import jax.core

    if isinstance(lam, jax.core.Tracer):
        return
    try:
        k = int(jnp.sum(lam > cutoff))
    except Exception:
        return
    if k < rank // 8:
        import warnings

        warnings.warn(
            f"lazy_nystrom_factor: only {k}/{rank} landmark-Gram "
            f"eigendirections sit above the cutoff {float(cutoff):.2e} — "
            f"the remaining columns add no preconditioning capacity and "
            f"erode the f32 Woodbury stability margin at scale.  Prefer "
            f"rank ≈ {max(2 * k, 64)}, or raise ridge/precond_shift "
            f"(DESIGN.md §30).",
            stacklevel=3,
        )


def lazy_nystrom_factor(
    kernel,
    x: jnp.ndarray,
    rank: int,
    cross_fn: Callable = default_cross,
    key=None,
    block: int = 4096,
    ridge: float = 1e-5,
):
    """Rank-``rank`` Nyström factor of the NOISE-FREE K(x, x):
    L = K(x, m) chol(K(m, m) + δI)⁻ᵀ with ``rank`` landmark points m,
    so LLᵀ = K(x,m) (K(m,m)+δI)⁻¹ K(m,x) — the classic Nyström
    approximation.  Same (N, rank) contract as
    :func:`lazy_pivoted_cholesky`, so it drops into the same
    Woodbury/logdet/probe machinery (``P = LLᵀ + σ²I``).

    Why it exists next to pivoted Cholesky: the pivoted recursion
    subtracts ``rank`` rank-1 updates SEQUENTIALLY in f32 — by a few
    hundred columns the residual diagonal is rounding noise and the late
    columns actively degrade the preconditioner (measured: at the
    N=65536/131072 trained pose, rank 400 preconditions WORSE than rank
    200 under both greedy and RPCholesky pivoting,
    tools/probe_precond_chip.json).  The Nyström factor has no cascade:
    one (N, rank) cross build (panelled, ``lax.map``) + one rank×rank
    Cholesky + one triangular solve, all MXU-parallel — numerically flat
    in rank and ~rank× faster to build, which is what makes rank ≥ 1024
    practical where the slowly-decaying spectrum needs it.

    Landmarks: a uniform random subset without replacement (``key``;
    deterministic stride of a fixed permutation when ``key=None``).

    Stability: at large-N density the landmark Gram K(m, m) is
    numerically singular in f32 (its Cholesky NaN'd on chip at
    N = 65536 / rank 512 while f64 CPU sailed through), so the inverse
    square root comes from an eigendecomposition with sub-cutoff
    directions ZEROED — λ < ``ridge``·λmax contributes a zero column
    rather than amplified noise.  LLᵀ is then the Nyström approximation
    restricted to the numerically trustworthy subspace: still PSD,
    still ≼ K, and the preconditioner only has to be SPD (the MLL
    machinery uses the EXACT logdet/sampler of whatever P results)."""
    n = x.shape[0]
    rank = min(rank, n)
    if key is None:
        idx = (jnp.arange(rank) * (n // rank)) % n
    else:
        idx = jax.random.permutation(key, n)[:rank]
    x_lm = jnp.take(x, idx, axis=0)
    w = cross_fn(kernel, x_lm, x_lm)
    lam, v = jnp.linalg.eigh(w)  # ascending
    cutoff = ridge * lam[-1]
    _warn_dead_rank(lam, cutoff, rank)
    inv_sqrt = jnp.where(lam > cutoff, 1.0 / jnp.sqrt(jnp.maximum(lam, cutoff)), 0.0)
    proj = v * inv_sqrt[None, :]  # (rank, rank): W^{-1/2} on the kept subspace

    block = min(block, n)
    nb = -(-n // block)  # ceil: trailing panel zero-padded, sliced off below
    pad = nb * block - n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    panels = xp.reshape(-1, block, x.shape[1])

    def body(x_blk):
        c_blk = cross_fn(kernel, x_blk, x_lm)  # (B, rank)
        return c_blk @ proj

    l = jax.lax.map(body, panels).reshape(-1, rank)[:n]
    return l


def build_precond_factor(precond, kernel, x, rank, cross, key=None):
    """Dispatch the (N, rank) preconditioner factor build.  Everything
    downstream (Woodbury apply, exact logdet, N(0, P) probes) only sees
    P = LLᵀ + σ²I, so the estimator is factor-rule agnostic.  Public so
    callers can HOIST the build (``lazy_cg_mll(precond_lpc=...)``) and
    refresh it every k steps instead of every step."""
    if precond == "pivchol":
        return lazy_pivoted_cholesky(kernel, x, rank, cross, key=key)
    if precond == "nystrom":
        return lazy_nystrom_factor(kernel, x, rank, cross, key=key)
    raise ValueError(
        f"precond must be 'pivchol' or 'nystrom', got {precond!r}"
    )


# ---------------------------------------------------------------------------
# MLL (differentiable w.r.t. kernel params, x, resid, sigma2)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _mll_machinery(
    block, num_probes, max_iters, tol, precond_rank, cross_fn, matvec_builder,
    panel_vjp=None, precond_shift=1.0,
):
    """Per-settings compiled machinery; lru_cache keeps the custom_vjp
    identity stable so jitted callers don't retrace across steps."""

    def core_fwd(kernel, x, resid, probes, sigma2, lpc):
        n = resid.shape[0]
        if matvec_builder is not None:
            # fused Gram·v (ops/pallas_matvec.py): forward-only is fine —
            # this whole function sits behind core's custom VJP, whose
            # backward rebuilds panels through cross_fn, never the matvec
            matvec = matvec_builder(kernel, x, sigma2)
        else:
            matvec = _lazy_matvec(kernel, x, sigma2, block, cross_fn)
        if precond_rank > 0:
            # the preconditioner parameterises the ESTIMATOR, not the
            # estimand — frozen, exactly as in the dense path.  Its ridge
            # c = precond_shift·σ² may exceed σ²: every identity below is
            # P-generic (z ~ N(0, P), P⁻¹-weighted rights, exact logdet P),
            # and shift > 1 buys f32 Woodbury stability at large N
            # (noise/signal ε·λmax(P)/c — at 131072 c = σ² breaks mBCG
            # outright, c = 10σ² converges in 30 iters; DESIGN §22)
            s2 = jax.lax.stop_gradient(sigma2)
            c = s2 if precond_shift == 1.0 else precond_shift * s2
            minv = _woodbury(lpc, c)
            probe_rights = minv(probes)  # E[z (P⁻¹z)ᵀ] = I for z ~ N(0, P)
            probe_w = jnp.sum(probes * probe_rights, axis=0)
            logdet_p = precond_logdet(lpc, c, n)
        else:
            minv = None
            probe_rights = probes  # E[z zᵀ] = I for Rademacher
            probe_w = jnp.sum(probes * probes, axis=0)  # = n exactly
            logdet_p = jnp.asarray(0.0, resid.dtype)
        rhs = jnp.concatenate([resid[:, None], probes], axis=1)
        res = mbcg(matvec, rhs, max_iters=max_iters, tol=tol, precond=minv)
        alpha = res.x[:, 0]
        probe_solves = res.x[:, 1:]
        logdet = logdet_p + lanczos_logdet(
            res.alphas[:, 1:], res.betas[:, 1:], probe_w
        )
        val = (
            -0.5 * jnp.dot(resid, alpha)
            - 0.5 * logdet
            - 0.5 * n * jnp.log(jnp.asarray(2.0 * jnp.pi, resid.dtype))
        )
        val = jnp.where(jnp.any(res.broke), jnp.nan, val)
        return val, (kernel, x, sigma2, alpha, probe_solves, probe_rights)

    def core_bwd(saved, g):
        kernel, x, sigma2, alpha, solves, rights = saved
        if panel_vjp is not None:
            # fused Pallas sweep: K tiles + the rank-(1+2R) cotangent
            # assembled in VMEM, pullbacks reduced in-register — the
            # whole (block, N)-panel HBM round-trip of the scan below
            # disappears (ops/pallas_matvec.packed_gibbs_panel_vjp)
            kg, xgrad, s2g = panel_vjp(
                kernel, x, sigma2, alpha, solves, rights, g
            )
            rbar = -g * alpha
            return (kg, xgrad, rbar, jnp.zeros_like(rights),
                    s2g, jnp.zeros((x.shape[0], precond_rank), x.dtype))
        n, d = x.shape
        nb = n // block
        r = rights.shape[-1]
        x_panels = x.reshape(nb, block, d)
        alpha_p = alpha.reshape(nb, block)
        solves_p = solves.reshape(nb, block, r)
        rights_p = rights.reshape(nb, block, r)

        def build(kern, x_blk, x_full, s2, i0):
            return _panel(kern, x_blk, x_full, s2, i0, cross_fn)

        def body(carry, inp):
            kg_acc, xf_acc, s2_acc = carry
            i, x_blk, a_l, s_l, r_l = inp
            # symmetrised panel rows of dMLL/dK = ½ααᵀ − ½·mean (K⁻¹z)rᵀ —
            # rank-(1+R), assembled from the saved vectors, never (N, N)
            kbar_l = 0.5 * jnp.outer(a_l, alpha) - (0.25 / r) * (
                s_l @ rights.T + r_l @ solves.T
            )
            _, vjp = jax.vjp(
                lambda kern, xb, xf, s2: build(kern, xb, xf, s2, i * block),
                kernel, x_blk, x, sigma2,
            )
            kg, xbg, xfg, s2g = vjp(g * kbar_l)
            carry = (
                jax.tree.map(jnp.add, kg_acc, kg),
                xf_acc + xfg,
                s2_acc + s2g,
            )
            # x enters each panel twice: as the panel rows (cotangent emitted
            # per panel, reassembles positionally) and as the full column
            # side (accumulated) — the sum is the complete dMLL/dx, which is
            # what makes row-aligned kernel state (packed Gibbs lengthscales)
            # trainable through the lazy path.
            return carry, xbg

        init = (
            jax.tree.map(jnp.zeros_like, kernel),
            jnp.zeros_like(x),
            jnp.zeros_like(sigma2),
        )
        (kg, xfg, s2g), xbg = jax.lax.scan(
            body, init, (jnp.arange(nb), x_panels, alpha_p, solves_p, rights_p)
        )
        xgrad = xbg.reshape(n, d) + xfg
        rbar = -g * alpha
        return (kg, xgrad, rbar, jnp.zeros_like(rights),
                s2g, jnp.zeros((n, precond_rank), x.dtype))

    @jax.custom_vjp
    def core(kernel, x, resid, probes, sigma2, lpc):
        val, _ = core_fwd(kernel, x, resid, probes, sigma2, lpc)
        return val

    core.defvjp(core_fwd, core_bwd)
    return core


def lazy_cg_mll(
    kernel,
    x: jnp.ndarray,
    resid: jnp.ndarray,
    key: jax.Array,
    sigma2: jnp.ndarray,
    *,
    block: int = 1024,
    num_probes: int = 8,
    max_iters: int = 100,
    tol: float = 1e-6,
    precond_rank: int = 0,
    precond_key: Optional[jax.Array] = None,
    precond: str = "pivchol",
    precond_shift: float = 1.0,
    precond_lpc: Optional[jnp.ndarray] = None,
    cross_fn: Optional[Callable] = None,
    matvec_builder: Optional[Callable] = None,
    panel_vjp: Optional[Callable] = None,
) -> jnp.ndarray:
    """−½ rᵀK⁻¹r − ½ log det K − (n/2) log 2π with K = kernel(x) + σ²I,
    K never materialised (peak memory O(block·N), see module docstring).

    Bit-compatible with the dense ``ops/bbmm.cg_mll`` under the same key.
    Differentiable w.r.t. kernel params, ``x``, ``resid`` AND ``sigma2``
    (the noise rides the panel diagonal here, so — unlike the dense path,
    whose K already contains it — its unbiased trace-identity gradient
    falls out of the same pullback).  ``precond_rank > 0`` enables the
    pivoted-Cholesky/Woodbury preconditioner, built lazily too;
    ``precond_key`` switches its pivot rule from greedy to RPCholesky
    (see ``lazy_pivoted_cholesky``) — same estimand, different
    variance-reduction factor.  ``precond='nystrom'`` swaps the factor
    for :func:`lazy_nystrom_factor` (numerically flat in rank — the
    choice for rank ≥ ~200, where the sequential pivoted recursion's
    f32 cascade degrades the factor; ``precond_key`` then selects the
    landmark subset).
    ``block`` must divide N (it is clamped to N first, so N ≤ block
    always works).

    ``matvec_builder`` (stable identity, like cross_fn) swaps the mBCG
    matvec for a fused implementation — ``ops/pallas_matvec.py``'s
    Gram·v kernels keep the panel out of HBM entirely; CG trajectories
    then agree with the panel path to f32 rounding, not bitwise.  The
    backward still rebuilds panels through ``cross_fn``, so both must
    compute the same kernel.

    ``panel_vjp`` (stable identity) swaps the backward panel scan for a
    fused sweep with the contract
    ``(kernel, x, alpha?, …) -> (kernel_grad, x_grad, sigma2_grad)`` —
    see ``ops/pallas_matvec.packed_gibbs_panel_vjp``.  It MUST compute
    the pullback of the same operator as ``cross_fn`` (the forward is
    unchanged; only the gradient path reroutes).

    ``precond_lpc``: a PREBUILT (N, rank) factor — skips the per-step
    factor build entirely (``precond_rank`` is then inferred from its
    trailing dim and ``precond``/``precond_key`` are ignored).  Every
    identity the estimator uses (z ~ N(0, P) probes, P⁻¹-weighted trace
    rights, exact log det P) holds for ANY fixed SPD P, so a factor
    built at a nearby parameter pose is still an UNBIASED estimator of
    the exact MLL/gradients — only the variance-reduction quality and
    the CG convergence rate degrade with staleness.  NOT a perf lever:
    refreshing every 10 steps measured EXACT parity with the per-step
    rebuild at rank 150 for N ∈ {16384, 32768, 65536} (47.95 vs 47.94,
    180.6 vs 181.2, 1346.3 vs 1346.6 ms/step — the rank-sequential
    build is wallclock noise next to the O(N²) matvecs; tools/bench_cg
    lazygstale rows, DESIGN §22).  It exists for callers that need the
    factor OUTSIDE the loss — the row-sharded path replicates it across
    devices, and estimator-consistency experiments hold P fixed across
    steps."""
    n = x.shape[0]
    block = min(block, n)
    check_divisible(n, block, "x", "row-panel block")
    cross = cross_fn or default_cross
    warn_unstable_cross_fn(cross)
    if precond_lpc is not None:
        precond_rank = precond_lpc.shape[-1]
    fn = _mll_machinery(
        block, num_probes, max_iters, tol, precond_rank, cross, matvec_builder,
        panel_vjp, precond_shift,
    )
    if precond_rank > 0:
        lpc = jax.lax.stop_gradient(
            precond_lpc
            if precond_lpc is not None
            else build_precond_factor(
                precond, kernel, x, precond_rank, cross, precond_key
            )
        )
        probes = sample_precond_probes(
            key, lpc,
            precond_shift * jax.lax.stop_gradient(sigma2), num_probes
        )
    else:
        lpc = jnp.zeros((n, 0), x.dtype)
        probes = jax.random.rademacher(key, (n, num_probes), dtype=x.dtype)
    return fn(kernel, x, resid, probes, sigma2, lpc)


# ---------------------------------------------------------------------------
# host-chunked MLL (the regime past the ~60-90 s program-execution wall)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def make_jnp_panel_vjp(cross_fn: Callable, block: int):
    """The MLL backward panel sweep as a plain-jnp panel scan with the
    SAME contract as ``ops/pallas_matvec.packed_gibbs_panel_vjp``:

        panel_vjp(kernel, x, sigma2, alpha, solves, rights, g)
            -> (kernel_grad, x_grad, sigma2_grad)

    Exactly ``core_bwd``'s non-fused branch (the symmetrised rank-(1+2R)
    cotangent per (block, N) panel, pulled back through ``cross_fn`` via
    jax.vjp), factored out so the host-chunked driver can run WITHOUT the
    Pallas sweep — the CPU/portability fallback for
    :func:`make_chunked_mll` (the fused sweep is Mosaic-only).  Stable
    identity per (cross_fn, block) via lru_cache."""

    def panel_vjp(kernel, x, sigma2, alpha, solves, rights, g):
        n, d = x.shape
        blk = min(block, n)
        check_divisible(n, blk, "x", "row-panel block")
        nb = n // blk
        r = rights.shape[-1]
        x_panels = x.reshape(nb, blk, d)
        alpha_p = alpha.reshape(nb, blk)
        solves_p = solves.reshape(nb, blk, r)
        rights_p = rights.reshape(nb, blk, r)
        if kernel is None:
            kern0, unwrap = (), (lambda kg: None)
        else:
            kern0, unwrap = kernel, (lambda kg: kg)

        def body(carry, inp):
            kg_acc, xf_acc, s2_acc = carry
            i, x_blk, a_l, s_l, r_l = inp
            kbar_l = 0.5 * jnp.outer(a_l, alpha) - (0.25 / r) * (
                s_l @ rights.T + r_l @ solves.T
            )

            def build(kern, xb, xf, s2):
                k = kern if kernel is not None else None
                return _panel(k, xb, xf, s2, i * blk, cross_fn)

            _, vjp = jax.vjp(build, kern0, x_blk, x, sigma2)
            kg, xbg, xfg, s2g = vjp(g * kbar_l)
            carry = (
                jax.tree.map(jnp.add, kg_acc, kg),
                xf_acc + xfg,
                s2_acc + s2g,
            )
            return carry, xbg

        init = (
            jax.tree.map(jnp.zeros_like, kern0),
            jnp.zeros_like(x),
            jnp.zeros_like(sigma2),
        )
        (kg, xfg, s2g), xbg = jax.lax.scan(
            body, init, (jnp.arange(nb), x_panels, alpha_p, solves_p, rights_p)
        )
        return unwrap(kg), xbg.reshape(n, d) + xfg, s2g

    return panel_vjp


@functools.lru_cache(maxsize=16)
def make_chunked_mll(
    block: int,
    num_probes: int,
    chunk_iters: int,
    n_chunks: int,
    tol: float,
    precond_rank: int,
    precond: str,
    precond_shift: float,
    cross_fn: Callable,
    matvec_builder: Optional[Callable],
    panel_vjp: Callable,
    panel_vjp_rows: Optional[Callable] = None,
    bwd_row_chunks: int = 1,
):
    """Host-chunked `lazy_cg_mll` + gradients for N past the axon
    worker's ~60–90 s single-program execution wall (DESIGN.md §27: at
    N = 524288 a 32-iteration mBCG program crashes the worker while
    16 iterations run — and N = 1048576 cannot fit ANY useful budget in
    one program).  The monolithic custom-VJP forward is split into
    jitted phases driven eagerly from the host:

      setup    — preconditioner factor, probes, rhs, mBCG carry
      chunk ×k — ``chunk_iters`` mBCG iterations (``ops/bbmm.mbcg_chunk``
                 — bitwise the monolithic scan, same ops same order)
      finalize — SLQ logdet + MLL value + relres evidence
      grads    — the backward panel sweep (the fused Pallas sweep when
                 ``panel_vjp`` is given — one launch, well under the
                 wall — else the jnp fallback, :func:`make_jnp_panel_vjp`)
                 + the trace-identity σ²/resid gradients, exactly
                 ``core_bwd``'s math at g=1

    Returns an object whose ``value_and_grad(kernel, x, resid, sigma2,
    key, pkey)`` returns ``(val, relres, (kernel_g, x_g, resid_g,
    sigma2_g))`` for the raw MLL (callers apply their own −1/n chain).
    NOT itself jittable or differentiable — it IS the orchestrator.
    ``early_stop=True`` (default) fetches the tiny per-column done flags
    after each chunk and stops once every column converged (remaining
    Lanczos slots pad with zeros — the converged-column semantics the
    monolithic scan already has), so the fixed budget becomes an upper
    bound instead of a cost."""
    if panel_vjp is None:
        # portability fallback (CPU tests / serve without Mosaic): the
        # same symmetrised panel sweep as core_bwd, plain jnp — pass the
        # fused ops/pallas_matvec.packed_gibbs_panel_vjp on chip
        panel_vjp = make_jnp_panel_vjp(cross_fn, block)
    use_pre = precond_rank > 0

    def _make_setup(keyed: bool):
      # keyed-ness must be STATIC (build_precond_factor branches on
      # key-is-None at trace time: greedy vs RPCholesky pivots, stride vs
      # sampled landmarks) — and it must match lazy_cg_mll, which passes
      # precond_key through UNCONDITIONALLY, so the chunked driver
      # preconditions with the same factor the monolithic path certifies
      # (ADVICE r4: the old `pkey if nystrom else None` silently swapped
      # a keyed pivchol config to greedy pivots).
      @jax.jit
      def setup(kernel, x, resid, sigma2, key, pkey):
        n = x.shape[0]
        if use_pre:
            lpc = build_precond_factor(
                precond, kernel, x, precond_rank, cross_fn,
                pkey if keyed else None,
            )
            c = precond_shift * sigma2
            minv = _woodbury(lpc, c)
            probes = sample_precond_probes(key, lpc, c, num_probes)
            rights = minv(probes)
            probe_w = jnp.sum(probes * rights, axis=0)
            logdet_p = precond_logdet(lpc, c, n)
        else:
            lpc = jnp.zeros((n, 0), x.dtype)
            probes = jax.random.rademacher(key, (n, num_probes), dtype=x.dtype)
            rights = probes
            probe_w = jnp.sum(probes * probes, axis=0)
            logdet_p = jnp.asarray(0.0, resid.dtype)
        rhs = jnp.concatenate([resid[:, None], probes], axis=1)
        minv2 = _woodbury(lpc, precond_shift * sigma2) if use_pre else None
        _, safe_bnorm, carry0 = mbcg_init(rhs, minv2)
        return lpc, rights, probe_w, logdet_p, safe_bnorm, carry0

      return setup

    setup_keyed = _make_setup(True)
    setup_unkeyed = _make_setup(False)

    @jax.jit
    def chunk(kernel, x, sigma2, lpc, safe_bnorm, carry):
        if matvec_builder is not None:
            matvec = matvec_builder(kernel, x, sigma2)
        else:
            matvec = _lazy_matvec(kernel, x, sigma2, block, cross_fn)
        minv = _woodbury(lpc, precond_shift * sigma2) if use_pre else None
        return mbcg_chunk(matvec, carry, chunk_iters, tol, safe_bnorm, minv)

    @jax.jit
    def finalize(resid, carry, alphas, betas, probe_w, logdet_p, safe_bnorm):
        n = resid.shape[0]
        x_sol, res = carry[0], carry[1]
        broke = carry[7]
        alpha = x_sol[:, 0]
        solves = x_sol[:, 1:]
        logdet = logdet_p + lanczos_logdet(
            alphas[:, 1:], betas[:, 1:], probe_w
        )
        val = (
            -0.5 * jnp.dot(resid, alpha)
            - 0.5 * logdet
            - 0.5 * n * jnp.log(jnp.asarray(2.0 * jnp.pi, resid.dtype))
        )
        val = jnp.where(jnp.any(broke), jnp.nan, val)
        relres = jnp.linalg.norm(res, axis=0) / safe_bnorm
        return val, alpha, solves, relres

    @jax.jit
    def grads(kernel, x, sigma2, alpha, solves, rights):
        one = jnp.asarray(1.0, x.dtype)
        kg, xg, s2g = panel_vjp(kernel, x, sigma2, alpha, solves, rights, one)
        return kg, xg, -alpha, s2g

    # host-chunked backward (row blocks) for N where even ONE panel sweep
    # crosses the ~60-90 s execution wall (DESIGN §27; ~1.5M+ rows)
    @jax.jit
    def grads_block(kernel, x, sigma2, alpha, solves, rights, i0):
        one = jnp.asarray(1.0, x.dtype)
        nr = x.shape[0] // bwd_row_chunks
        return panel_vjp_rows(
            kernel, x, sigma2, alpha, solves, rights, one, i0, nr
        )

    @jax.jit
    def grads_rows_finalize(kernel, gaug_cat, sp_total, alpha, solves,
                            rights, sigma2):
        from nonstationary_precip_tpu.utils.transforms import positive

        one = jnp.asarray(1.0, gaug_cat.dtype)
        r = solves.shape[-1]
        s2g = one * (
            0.5 * jnp.dot(alpha, alpha)
            - (0.5 / r) * jnp.sum(solves * rights)
        )
        if kernel is None:
            return None, gaug_cat, -alpha, s2g
        s2, pullback = jax.vjp(positive, kernel)
        (kg,) = pullback(one * sp_total)
        return kg, s2 * gaug_cat, -alpha, s2g

    class ChunkedMLL:
        def value_and_grad(self, kernel, x, resid, sigma2, key,
                           pkey=None, early_stop=True):
            import numpy as _np

            # pkey=None keeps lazy_cg_mll's default factor (greedy pivots /
            # stride landmarks); an explicit pkey selects the keyed rules
            # (RPCholesky pivots / sampled landmarks) — same contract as
            # the monolithic path, so diagnostics certify THIS factor.
            setup = setup_unkeyed if pkey is None else setup_keyed
            if pkey is None:
                pkey = jax.random.PRNGKey(0)
            lpc, rights, probe_w, logdet_p, safe_bnorm, carry = setup(
                kernel, x, resid, sigma2, key, pkey
            )
            a_parts, b_parts = [], []
            ran = 0
            for _ in range(n_chunks):
                carry, (al, be, _) = chunk(
                    kernel, x, sigma2, lpc, safe_bnorm, carry
                )
                a_parts.append(al)
                b_parts.append(be)
                ran += 1
                if early_stop and bool(_np.asarray(carry[5]).all()):
                    break
            r1 = a_parts[0].shape[1]
            pad = (n_chunks - ran) * chunk_iters
            if pad:
                # zero α/β = the monolithic scan's converged-iteration
                # padding — identity blocks with zero quadrature weight
                a_parts.append(jnp.zeros((pad, r1), x.dtype))
                b_parts.append(jnp.zeros((pad, r1), x.dtype))
            alphas = jnp.concatenate(a_parts, axis=0)
            betas = jnp.concatenate(b_parts, axis=0)
            val, alpha, solves, relres = finalize(
                resid, carry, alphas, betas, probe_w, logdet_p, safe_bnorm
            )
            if bwd_row_chunks > 1:
                if panel_vjp_rows is None:
                    raise ValueError(
                        "bwd_row_chunks > 1 needs panel_vjp_rows (e.g. "
                        "ops.pallas_matvec.packed_gibbs_panel_vjp_rows)"
                    )
                n = x.shape[0]
                check_divisible(n, bwd_row_chunks, "x", "bwd row chunks")
                nr = n // bwd_row_chunks
                gaug_parts, sp_total = [], jnp.asarray(0.0, x.dtype)
                for ci in range(bwd_row_chunks):
                    gaug_r, sp_part = grads_block(
                        kernel, x, sigma2, alpha, solves, rights,
                        jnp.asarray(ci * nr, jnp.int32),
                    )
                    gaug_parts.append(gaug_r)
                    sp_total = sp_total + sp_part
                kg, xg, rg, s2g = grads_rows_finalize(
                    kernel, jnp.concatenate(gaug_parts, axis=0), sp_total,
                    alpha, solves, rights, sigma2,
                )
            else:
                kg, xg, rg, s2g = grads(
                    kernel, x, sigma2, alpha, solves, rights
                )
            return val, relres, (kg, xg, rg, s2g)

    return ChunkedMLL()


@functools.lru_cache(maxsize=32)
def make_chunked_solve(
    block: int,
    chunk_iters: int,
    n_chunks: int,
    tol: float,
    cross_fn: Callable,
    matvec_builder: Optional[Callable] = None,
    precond_shift: float = 1.0,
):
    """Host-chunked preconditioned CG solve ``(K(x,x) + σ²I) X = B`` over a
    lazy operator — the single building block every past-the-wall phase
    shares (DESIGN.md §27: one device program executing ≳60–90 s crashes
    the axon worker, so at N ≥ ~512k any CG budget must re-enter from the
    host every few iterations).  :func:`make_chunked_mll` embeds its own
    copy fused with the SLQ bookkeeping; this standalone form serves the
    OTHER solves the product needs at that scale: the prior quadratic
    (``LogNormalProcess.log_prob`` term), the posterior-state α solve and
    the variance block solves.

    Returns a host-driven callable ``solve(kernel, x, rhs, sigma2, lpc,
    early_stop=True) -> (X, relres)`` — ``rhs`` (N, R), ``lpc`` (N, rank)
    preconditioner factor or (N, 0) for none; ``X`` NaN-poisoned on CG
    breakdown, ``relres`` (R,) final relative residuals (evidence, not
    faith).  Bitwise the monolithic :func:`ops.bbmm.mbcg` under the same
    budget (``mbcg_chunk`` is the same scan re-entered).  NOT jittable —
    it IS the host orchestrator; identities of ``cross_fn`` /
    ``matvec_builder`` must be stable (module-level) or every call
    recompiles."""

    @jax.jit
    def init(rhs, sigma2, lpc):
        minv = (
            _woodbury(lpc, precond_shift * sigma2)
            if lpc.shape[-1] > 0 else None
        )
        return mbcg_init(rhs, minv)

    @jax.jit
    def chunk(kernel, x, sigma2, lpc, safe_bnorm, carry):
        if matvec_builder is not None:
            matvec = matvec_builder(kernel, x, sigma2)
        else:
            blk = min(block, x.shape[0])
            check_divisible(x.shape[0], blk, "x", "row-panel block")
            matvec = _lazy_matvec(kernel, x, sigma2, blk, cross_fn)
        minv = (
            _woodbury(lpc, precond_shift * sigma2)
            if lpc.shape[-1] > 0 else None
        )
        return mbcg_chunk(matvec, carry, chunk_iters, tol, safe_bnorm, minv)

    @jax.jit
    def final(carry, safe_bnorm):
        xsol, res, broke = carry[0], carry[1], carry[7]
        relres = jnp.linalg.norm(res, axis=0) / safe_bnorm
        xsol = jnp.where(jnp.any(broke), jnp.nan, xsol)
        return xsol, relres

    class ChunkedSolve:
        def __call__(self, kernel, x, rhs, sigma2, lpc, early_stop=True):
            import numpy as _np

            _, safe_bnorm, carry = init(rhs, sigma2, lpc)
            for _ in range(n_chunks):
                carry, _ = chunk(kernel, x, sigma2, lpc, safe_bnorm, carry)
                # done flags are (R,) bools — a tiny fetch per chunk buys
                # skipping every remaining O(N²)-matvec chunk program
                if early_stop and bool(_np.asarray(carry[5]).all()):
                    break
            return final(carry, safe_bnorm)

    return ChunkedSolve()


def lazy_posterior_state_chunked(
    kernel,
    x: jnp.ndarray,
    resid: jnp.ndarray,
    sigma2: jnp.ndarray,
    *,
    block: int = 2048,
    chunk_iters: int = 8,
    n_chunks: int = 8,
    tol: float = 1e-8,
    precond_rank: int = 150,
    precond: str = "pivchol",
    precond_key: Optional[jax.Array] = None,
    precond_shift: float = 1.0,
    precond_lpc: Optional[jnp.ndarray] = None,
    cross_fn: Optional[Callable] = None,
    matvec_builder: Optional[Callable] = None,
) -> LazyPosteriorState:
    """:func:`lazy_posterior_state` for N past the execution wall: the α
    solve runs host-chunked (``chunk_iters`` iterations per device
    program, ≤ ``n_chunks`` programs, early-stopped), so no single
    program exceeds the ~60–90 s axon wall even at N = 1M+ where the
    monolithic 64-iteration solve cannot run.  The returned state is the
    same pytree (α relres included) — feed to
    :func:`lazy_posterior_query` with ``mean_only=True`` (no further
    solve), or to :func:`lazy_posterior_query_chunked` for variances."""
    n = x.shape[0]
    block = min(block, n)
    check_divisible(n, block, "x", "row-panel block")
    cross = cross_fn or default_cross
    warn_unstable_cross_fn(cross)
    precond_rank = min(precond_rank, n)
    kernel = jax.tree.map(jax.lax.stop_gradient, kernel)
    x = jax.lax.stop_gradient(x)
    sigma2 = jax.lax.stop_gradient(sigma2)
    if precond_rank > 0:
        if precond_lpc is not None:
            lpc = jax.lax.stop_gradient(precond_lpc)
        else:
            # one O(N·rank²) program — far under the wall at any probed N
            lpc = jax.lax.stop_gradient(
                build_precond_factor(
                    precond, kernel, x, precond_rank, cross, precond_key
                )
            )
    else:
        lpc = jnp.zeros((n, 0), x.dtype)
    solve = make_chunked_solve(
        block, chunk_iters, n_chunks, tol, cross, matvec_builder,
        precond_shift,
    )
    sol, relres = solve(kernel, x, resid[:, None], sigma2, lpc)
    return LazyPosteriorState(kernel, x, sol[:, 0], lpc, sigma2, relres[0])


@functools.lru_cache(maxsize=32)
def _query_mean_jit(cross_fn):
    # cached per cross identity: a per-call closure would retrace (and on
    # axon re-COMPILE) every query batch
    @jax.jit
    def mean_of(st_x, st_alpha, kern, xt):
        b = cross_fn(kern, st_x, xt)
        return b.T @ st_alpha, b

    return mean_of


@functools.lru_cache(maxsize=32)
def _query_cov_jit(cross_fn):
    @jax.jit
    def cov_of(kern, xt, b, s):
        ct = b.T @ s
        return cross_fn(kern, xt, xt) - 0.5 * (ct + ct.T)

    return cov_of


def lazy_posterior_query_chunked(
    state: LazyPosteriorState,
    x_test: jnp.ndarray,
    *,
    mean_only: bool = False,
    block: int = 2048,
    chunk_iters: int = 8,
    n_chunks: int = 8,
    tol: float = 1e-6,
    precond_shift: float = 1.0,
    cross_fn: Optional[Callable] = None,
    matvec_builder: Optional[Callable] = None,
    return_info: bool = False,
):
    """:func:`lazy_posterior_query` with the variance block solve run
    host-chunked (the mean needs no solve either way).  Use past the
    execution wall, where a monolithic N*-RHS mBCG program cannot run.
    Same return conventions, including ``return_info``."""
    kernel, x, alpha, lpc, sigma2, alpha_relres = state
    n = x.shape[0]
    block = min(block, n)
    check_divisible(n, block, "x", "row-panel block")
    cross = cross_fn or default_cross
    warn_unstable_cross_fn(cross)

    mean, b_cols = _query_mean_jit(cross)(x, alpha, kernel, x_test)
    if mean_only:
        if return_info:
            info = {
                "relres": jnp.zeros((0,), mean.dtype),
                "relres_max": jnp.asarray(alpha_relres, mean.dtype),
                "broke": jnp.asarray(False),
            }
            return mean, None, info
        return mean, None
    solve = make_chunked_solve(
        block, chunk_iters, n_chunks, tol, cross, matvec_builder,
        precond_shift,
    )
    sol, relres = solve(kernel, x, b_cols, sigma2, lpc)
    cov = _query_cov_jit(cross)(kernel, x_test, b_cols, sol)
    if return_info:
        info = {
            "relres": relres,
            "relres_max": jnp.maximum(
                jnp.max(relres), jnp.asarray(alpha_relres, relres.dtype)
            ),
            "broke": jnp.any(jnp.isnan(sol[0])),
        }
        return mean, cov, info
    return mean, cov


# ---------------------------------------------------------------------------
# convergence diagnostics (gate evidence, not an estimator)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _diag_machinery(block, num_probes, max_iters, tol, precond_rank, cross_fn,
                    matvec_builder, precond_shift=1.0):
    def diag(kernel, x, resid, probes, sigma2, lpc):
        if matvec_builder is not None:
            matvec = matvec_builder(kernel, x, sigma2)
        else:
            matvec = _lazy_matvec(kernel, x, sigma2, block, cross_fn)
        if precond_rank > 0:
            c = precond_shift * sigma2
            minv = _woodbury(lpc, c)
        else:
            minv = None
        rhs = jnp.concatenate([resid[:, None], probes], axis=1)
        res = mbcg(matvec, rhs, max_iters=max_iters, tol=tol, precond=minv)
        return (
            res.residnorm,            # (1+R,) final relative residuals
            res.iters,                # (1+R,) iterations to convergence
            jnp.any(res.broke),
        )

    return diag


@functools.lru_cache(maxsize=32)
def _diag_inner_jit(block, num_probes, max_iters, tol, precond_rank, cross_fn,
                    matvec_builder, precond_shift):
    return jax.jit(_diag_machinery(
        block, num_probes, max_iters, tol, precond_rank, cross_fn,
        matvec_builder, precond_shift,
    ))


@functools.lru_cache(maxsize=32)
def _diag_full_jit(block, num_probes, max_iters, tol, precond_rank, cross_fn,
                   matvec_builder, precond_shift, precond, keyed=False):
    inner = _diag_machinery(
        block, num_probes, max_iters, tol, precond_rank, cross_fn,
        matvec_builder, precond_shift,
    )

    @jax.jit
    def full(kernel, x, resid, key, sigma2, pkey):
        n = x.shape[0]
        if precond_rank > 0:
            # keyed-ness mirrors lazy_cg_mll's unconditional precond_key
            # pass-through (ADVICE r4: the old `if nystrom else None`
            # certified a greedy-pivot factor for keyed pivchol configs)
            lpc = build_precond_factor(
                precond, kernel, x, precond_rank, cross_fn,
                pkey if keyed else None,
            )
            probes = sample_precond_probes(
                key, lpc, precond_shift * sigma2, num_probes
            )
        else:
            lpc = jnp.zeros((n, 0), x.dtype)
            probes = jax.random.rademacher(key, (n, num_probes), dtype=x.dtype)
        return inner(kernel, x, resid, probes, sigma2, lpc)

    return full


def lazy_cg_diagnostics(
    kernel,
    x: jnp.ndarray,
    resid: jnp.ndarray,
    key: jax.Array,
    sigma2: jnp.ndarray,
    *,
    block: int = 1024,
    num_probes: int = 8,
    max_iters: int = 100,
    tol: float = 1e-6,
    precond_rank: int = 0,
    precond_key: Optional[jax.Array] = None,
    precond: str = "pivchol",
    precond_shift: float = 1.0,
    precond_lpc: Optional[jnp.ndarray] = None,
    cross_fn: Optional[Callable] = None,
    matvec_builder: Optional[Callable] = None,
) -> dict:
    """Convergence evidence for the EXACT solves :func:`lazy_cg_mll` runs:
    same matvec, preconditioner, probes and mBCG budget under the same
    key, but returning the per-RHS final relative residuals and iteration
    counts instead of the MLL value.  Not differentiable; run it at a
    trained pose to decide whether a (rank, budget) config is converged —
    a perf row whose relres is O(0.1) is timing a DIFFERENT (unconverged)
    estimator, the failure DESIGN.md §16 documents shipping once.

    Returns {"relres_solve": float, "relres_max": float, "iters_max": int,
    "broke": bool} — relres_solve is the K⁻¹y mean solve (column 0),
    relres_max the worst column including the probe solves."""
    n = x.shape[0]
    block = min(block, n)
    check_divisible(n, block, "x", "row-panel block")
    cross = cross_fn or default_cross
    warn_unstable_cross_fn(cross)
    if precond_lpc is not None:
        # prebuilt factor: probes sampled here, solve jitted per settings
        precond_rank = precond_lpc.shape[-1]
        fn = _diag_inner_jit(
            block, num_probes, max_iters, tol, precond_rank, cross,
            matvec_builder, precond_shift,
        )
        probes = sample_precond_probes(
            key, precond_lpc, precond_shift * sigma2, num_probes
        )
        residnorm, iters, broke = fn(
            kernel, x, resid, probes, sigma2, precond_lpc
        )
    else:
        fn = _diag_full_jit(
            block, num_probes, max_iters, tol, precond_rank, cross,
            matvec_builder, precond_shift, precond,
            keyed=precond_key is not None,
        )
        pkey = precond_key if precond_key is not None else jax.random.PRNGKey(0)
        residnorm, iters, broke = fn(kernel, x, resid, key, sigma2, pkey)
    return {
        "relres_solve": float(residnorm[0]),
        "relres_max": float(jnp.max(residnorm)),
        "iters_max": int(jnp.max(iters)),
        "broke": bool(broke),
    }


# ---------------------------------------------------------------------------
# frozen-operator primitives: quadratic form and SLQ logdet
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _quad_machinery(block, max_iters, tol, use_precond, cross_fn,
                    precond_shift=1.0):
    """Matrix-free diffᵀ(K + σ²I)⁻¹diff with the exact-at-convergence
    pullback d/d·diff = 2(K + σ²I)⁻¹diff.  The operator (kernel, x, σ², the
    preconditioner factor) is treated as FROZEN — its cotangents are zero
    by contract, which is exactly the frozen-prior semantics every
    reference experiment runs under (spatial_exp.py:166-167)."""

    def fwd(kernel, x, diff, sigma2, lpc):
        matvec = _lazy_matvec(kernel, x, sigma2, block, cross_fn)
        minv = (
            _woodbury(lpc, precond_shift * sigma2) if use_precond else None
        )
        res = mbcg(matvec, diff[:, None], max_iters=max_iters, tol=tol, precond=minv)
        alpha = res.x[:, 0]
        q = jnp.dot(diff, alpha)
        q = jnp.where(jnp.any(res.broke), jnp.nan, q)
        zeros = jax.tree.map(jnp.zeros_like, (kernel, x, sigma2, lpc))
        return q, (alpha, zeros)

    def bwd(saved, g):
        alpha, (kz, xz, sz, lz) = saved
        return (kz, xz, 2.0 * g * alpha, sz, lz)

    @jax.custom_vjp
    def quad(kernel, x, diff, sigma2, lpc):
        return fwd(kernel, x, diff, sigma2, lpc)[0]

    quad.defvjp(fwd, bwd)
    return quad


def lazy_cg_quad(
    kernel,
    x: jnp.ndarray,
    diff: jnp.ndarray,
    sigma2,
    *,
    lpc: Optional[jnp.ndarray] = None,
    block: int = 1024,
    max_iters: int = 64,
    tol: float = 1e-6,
    precond_shift: float = 1.0,
    cross_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """diffᵀ (K(x, x) + σ²I)⁻¹ diff without materialising K: one mBCG solve
    over lazy row panels.

    Differentiable in ``diff`` ONLY, with the linearised-at-the-solution
    pullback 2·K⁻¹diff — exact when CG converged (the custom VJP makes
    iteration count a non-event for autodiff).  kernel/x/σ²/lpc are frozen
    by contract: this is the per-step prior quadratic of MAP training with
    a frozen latent-process prior, where the logdet is a constant and only
    the quad term carries gradients.

    ``lpc``: hoisted pivoted-Cholesky factor (N, rank) of the NOISE-FREE K
    (see :func:`lazy_pivoted_cholesky`) — loop-invariant for a frozen
    operator, so build it once per fit and pass it in; without it the
    prior's tiny 1e-4 jitter makes plain CG stall at large N."""
    n = x.shape[0]
    block = min(block, n)
    check_divisible(n, block, "x", "row-panel block")
    cross = cross_fn or default_cross
    warn_unstable_cross_fn(cross)
    use_precond = lpc is not None
    fn = _quad_machinery(block, max_iters, tol, use_precond, cross,
                         precond_shift)
    if lpc is None:
        lpc = jnp.zeros((n, 0), x.dtype)
    return fn(
        kernel,
        jax.lax.stop_gradient(x),
        diff,
        jax.lax.stop_gradient(sigma2),
        jax.lax.stop_gradient(lpc),
    )


@functools.lru_cache(maxsize=32)
def _logdet_machinery(block, num_probes, max_iters, tol, use_precond, cross_fn,
                      precond_shift=1.0):
    def logdet(kernel, x, sigma2, lpc, key):
        n = x.shape[0]
        matvec = _lazy_matvec(kernel, x, sigma2, block, cross_fn)
        if use_precond:
            c = precond_shift * sigma2
            minv = _woodbury(lpc, c)
            probes = sample_precond_probes(key, lpc, c, num_probes)
            probe_w = jnp.sum(probes * minv(probes), axis=0)
            base = precond_logdet(lpc, c, n)
        else:
            minv = None
            probes = jax.random.rademacher(key, (n, num_probes), dtype=x.dtype)
            probe_w = jnp.sum(probes * probes, axis=0)
            base = jnp.asarray(0.0, x.dtype)
        res = mbcg(matvec, probes, max_iters=max_iters, tol=tol, precond=minv)
        est = base + lanczos_logdet(res.alphas, res.betas, probe_w)
        return jnp.where(jnp.any(res.broke), jnp.nan, est)

    return logdet


def lazy_slq_logdet(
    kernel,
    x: jnp.ndarray,
    key: jax.Array,
    sigma2,
    *,
    lpc: Optional[jnp.ndarray] = None,
    block: int = 1024,
    num_probes: int = 16,
    max_iters: int = 128,
    tol: float = 1e-10,
    precond_shift: float = 1.0,
    cross_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Stochastic Lanczos-quadrature estimate of log det(K(x, x) + σ²I),
    matrix-free (same estimator ``lazy_cg_mll`` embeds, exposed standalone
    for the hoist-once case: a FROZEN operator's logdet is a constant of
    training, so compute it once per fit, not once per step).  Not
    differentiable — wrap in stop_gradient semantics by construction
    (use :func:`lazy_cg_mll` when the operator trains).  ``lpc`` as in
    :func:`lazy_cg_quad` — with the preconditioner the estimate is also
    far more accurate, since SLQ only has to capture K's spectrum
    *relative to P*."""
    n = x.shape[0]
    block = min(block, n)
    check_divisible(n, block, "x", "row-panel block")
    cross = cross_fn or default_cross
    warn_unstable_cross_fn(cross)
    use_precond = lpc is not None
    fn = _logdet_machinery(block, num_probes, max_iters, tol, use_precond,
                           cross, precond_shift)
    if lpc is None:
        lpc = jnp.zeros((n, 0), x.dtype)
    args = (kernel, x, sigma2, lpc)
    return fn(*jax.tree.map(jax.lax.stop_gradient, args), key)


# ---------------------------------------------------------------------------
# posterior (prediction — deterministic, no probes)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _posterior_machinery(block, max_iters, tol, precond_rank, cross_fn,
                         matvec_builder, precond_shift=1.0):
    def posterior(kernel, x, resid, x_test, sigma2, lpc):
        if matvec_builder is not None:
            matvec = matvec_builder(kernel, x, sigma2)
        else:
            matvec = _lazy_matvec(kernel, x, sigma2, block, cross_fn)
        minv = (
            _woodbury(lpc, precond_shift * sigma2)
            if precond_rank > 0 else None
        )
        b_cols = cross_fn(kernel, x, x_test)  # (N, N*)
        rhs = jnp.concatenate([resid[:, None], b_cols], axis=1)
        res = mbcg(matvec, rhs, max_iters=max_iters, tol=tol, precond=minv)
        mean = b_cols.T @ res.x[:, 0]
        cov_term = b_cols.T @ res.x[:, 1:]  # (N*, N*)
        k_ss = cross_fn(kernel, x_test, x_test)
        cov = k_ss - 0.5 * (cov_term + cov_term.T)
        bad = jnp.any(res.broke)
        return jnp.where(bad, jnp.nan, mean), jnp.where(bad, jnp.nan, cov)

    return posterior


def lazy_cg_posterior(
    kernel,
    x: jnp.ndarray,
    resid: jnp.ndarray,
    x_test: jnp.ndarray,
    sigma2: jnp.ndarray,
    *,
    block: int = 1024,
    max_iters: int = 1000,
    tol: float = 1e-6,
    precond_rank: int = 0,
    precond_key: Optional[jax.Array] = None,
    precond: str = "pivchol",
    precond_shift: float = 1.0,
    cross_fn: Optional[Callable] = None,
    matvec_builder: Optional[Callable] = None,
):
    """(mean, cov) of the zero-mean exact-GP posterior at ``x_test``:
    mean = K*ₓ K⁻¹ r, cov = K** − K*ₓ K⁻¹ Kₓ*, train-side solves by mBCG
    over lazy row panels with 1+N* right-hand sides in one fixed-length
    scan.  The footprint is O(block·N + N·N*) — chunk ``x_test`` for
    large test sets; the N² Gram never exists.  Add the caller's mean
    function / observation noise outside.  ``matvec_builder`` as in
    :func:`lazy_cg_mll` (note: the posterior is NOT differentiable
    through a Pallas matvec — it has no VJP; keep the default panels if
    you need posterior gradients)."""
    n = x.shape[0]
    block = min(block, n)
    check_divisible(n, block, "x", "row-panel block")
    cross = cross_fn or default_cross
    warn_unstable_cross_fn(cross)
    fn = _posterior_machinery(block, max_iters, tol, precond_rank, cross,
                              matvec_builder, precond_shift)
    if precond_rank > 0:
        lpc = jax.lax.stop_gradient(
            build_precond_factor(
                precond, kernel, x, precond_rank, cross, precond_key
            )
        )
        s2 = jax.lax.stop_gradient(sigma2)
    else:
        lpc = jnp.zeros((n, 0), x.dtype)
        s2 = sigma2
    return fn(kernel, x, resid, x_test, s2, lpc)


# ---------------------------------------------------------------------------
# amortized posterior: fit-time state, cheap per-query-batch serving
# ---------------------------------------------------------------------------


from typing import Any, NamedTuple  # noqa: E402


class LazyPosteriorState(NamedTuple):
    """Once-per-fit state for repeated matrix-free posterior queries.

    :func:`lazy_cg_posterior` re-runs everything from scratch per call —
    fixed-budget mBCG over 1+N* right-hand sides INCLUDING the
    query-independent K⁻¹y mean solve, plus a fresh preconditioner
    factor build.  At N = 131072 that measured 89 ms/test-point
    (tools/bench_cg.json lazygpost rows) — trainable but barely
    servable.  This state hoists every query-independent piece (the
    amortization VERDICT r3 #4 asked for):

      * ``alpha = (K + σ²I)⁻¹ y`` — after which the posterior MEAN is one
        cross-panel contraction, no CG at all,
      * ``lpc`` — the (N, rank) preconditioner factor, reused by every
        variance solve,
      * the operator identity (kernel pytree, packed payload, σ²).

    Per query batch only the variance solve remains: one preconditioned
    mBCG with N* right-hand sides at the training-grade auto budget
    (16 iters for N ≤ 32768, 32 above — the measured converged configs,
    tools/probe_precond_chip.json), not the old flat 64.  A pytree —
    jit through it, donate it, ship it to serving workers."""

    kernel: Any
    x: jnp.ndarray       # (N, d) payload the cross_fn understands
    alpha: jnp.ndarray   # (N,)   (K + σ²I)⁻¹ resid
    lpc: jnp.ndarray     # (N, rank) preconditioner factor ((N, 0) if none)
    sigma2: jnp.ndarray  # scalar ridge
    # relative residual of the α solve — convergence EVIDENCE riding with
    # the state (ADVICE r4: mbcg freezes silently on non-convergence, so
    # a served mean must carry proof its one solve converged)
    alpha_relres: jnp.ndarray = jnp.nan


def _auto_budget(n: int) -> int:
    """The shipped converged-iteration budget (DESIGN §20): rank-150
    preconditioning converges in ≤ 16 iters for N ≤ 32768 and ≤ 30 above
    at trained poses; diagnostics (not faith) guard regressions."""
    return 16 if n <= 32768 else 32


def lazy_posterior_state(
    kernel,
    x: jnp.ndarray,
    resid: jnp.ndarray,
    sigma2: jnp.ndarray,
    *,
    block: int = 1024,
    max_iters: Optional[int] = None,
    tol: float = 1e-8,
    precond_rank: int = 150,
    precond: str = "pivchol",
    precond_key: Optional[jax.Array] = None,
    precond_shift: float = 1.0,
    precond_lpc: Optional[jnp.ndarray] = None,
    cross_fn: Optional[Callable] = None,
    matvec_builder: Optional[Callable] = None,
) -> LazyPosteriorState:
    """Build the once-per-fit :class:`LazyPosteriorState`: one factor
    build + one single-RHS mBCG solve for ``alpha``.  Everything here is
    frozen serving state (stop_gradient semantics by construction)."""
    n = x.shape[0]
    block = min(block, n)
    check_divisible(n, block, "x", "row-panel block")
    cross = cross_fn or default_cross
    warn_unstable_cross_fn(cross)
    if max_iters is None:
        max_iters = 2 * _auto_budget(n)  # margin: this solve runs ONCE
    precond_rank = min(precond_rank, n)
    kernel = jax.tree.map(jax.lax.stop_gradient, kernel)
    x = jax.lax.stop_gradient(x)
    sigma2 = jax.lax.stop_gradient(sigma2)
    if precond_rank > 0:
        lpc = jax.lax.stop_gradient(
            precond_lpc
            if precond_lpc is not None
            else build_precond_factor(
                precond, kernel, x, precond_rank, cross, precond_key
            )
        )
        minv = _woodbury(lpc, precond_shift * sigma2)
    else:
        lpc = jnp.zeros((n, 0), x.dtype)
        minv = None
    if matvec_builder is not None:
        matvec = matvec_builder(kernel, x, sigma2)
    else:
        matvec = _lazy_matvec(kernel, x, sigma2, block, cross)
    res = mbcg(matvec, resid[:, None], max_iters=max_iters, tol=tol,
               precond=minv)
    alpha = jnp.where(jnp.any(res.broke), jnp.nan, res.x[:, 0])
    return LazyPosteriorState(kernel, x, alpha, lpc, sigma2,
                              res.residnorm[0])


def lazy_posterior_query(
    state: LazyPosteriorState,
    x_test: jnp.ndarray,
    *,
    mean_only: bool = False,
    block: int = 1024,
    max_iters: Optional[int] = None,
    tol: float = 1e-6,
    precond_shift: float = 1.0,
    cross_fn: Optional[Callable] = None,
    matvec_builder: Optional[Callable] = None,
    return_info: bool = False,
):
    """(mean, cov) at ``x_test`` from a prebuilt state.

    mean = Kₓ*ᵀ α — one (N, N*) cross build + one MXU contraction, NO CG
    (``mean_only=True`` returns ``(mean, None)`` and never solves).
    cov needs K⁻¹Kₓ*: one preconditioned mBCG with N* right-hand sides at
    the auto budget, reusing the state's factor.  Chunk ``x_test`` for
    very large query sets; footprint is O(block·N + N·N*).

    ``return_info=True`` appends a dict of convergence EVIDENCE —
    ``{"relres": (N*,) final relative residuals of the variance solves
    (empty when mean_only), "relres_max": scalar worst case INCLUDING the
    state's α solve, "broke": any-column breakdown flag}`` — because
    ``mbcg`` is a fixed-length scan that freezes silently on
    non-convergence (ADVICE r4): serving at the auto budget must gate on
    this, not on faith.  All values are arrays (jit-safe)."""
    kernel, x, alpha, lpc, sigma2, alpha_relres = state
    n = x.shape[0]
    block = min(block, n)
    check_divisible(n, block, "x", "row-panel block")
    cross = cross_fn or default_cross
    warn_unstable_cross_fn(cross)
    b_cols = cross(kernel, x, x_test)  # (N, N*)
    mean = b_cols.T @ alpha
    if mean_only:
        if return_info:
            info = {
                "relres": jnp.zeros((0,), mean.dtype),
                "relres_max": jnp.asarray(alpha_relres, mean.dtype),
                "broke": jnp.asarray(False),
            }
            return mean, None, info
        return mean, None
    if max_iters is None:
        max_iters = _auto_budget(n)
    minv = (
        _woodbury(lpc, precond_shift * sigma2) if lpc.shape[-1] > 0 else None
    )
    if matvec_builder is not None:
        matvec = matvec_builder(kernel, x, sigma2)
    else:
        matvec = _lazy_matvec(kernel, x, sigma2, block, cross)
    res = mbcg(matvec, b_cols, max_iters=max_iters, tol=tol, precond=minv)
    cov_term = b_cols.T @ res.x  # (N*, N*)
    k_ss = cross(kernel, x_test, x_test)
    cov = k_ss - 0.5 * (cov_term + cov_term.T)
    bad = jnp.any(res.broke)
    mean = jnp.where(bad, jnp.nan, mean)
    cov = jnp.where(bad, jnp.nan, cov)
    if return_info:
        info = {
            "relres": res.residnorm,
            "relres_max": jnp.maximum(
                jnp.max(res.residnorm),
                jnp.asarray(alpha_relres, res.residnorm.dtype),
            ),
            "broke": bad,
        }
        return mean, cov, info
    return mean, cov
