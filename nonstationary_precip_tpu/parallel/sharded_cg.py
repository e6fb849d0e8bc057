"""Row-sharded BBMM: exact-GP MLL + prediction at N beyond one chip's HBM.

The dense CG path (``ops/bbmm.py``) matches GPyTorch's training regime
(reference ``experiments/spatial_exp.py:199`` runs every exact model
under ``gpytorch.settings.max_cg_iterations``) but still materialises the
full N² Gram on one device.  Here the train Gram never exists globally:

  * each device builds only its (N/P, N) row-block from its shard of x,
  * the mBCG matvec is a local (N/P, N)×(N, R) MXU matmul followed by a
    tiled ``all_gather`` over the mesh axis (rides ICI),
  * every CG scalar (α, β, residual norms) is a full-length reduction of
    replicated vectors, so all devices walk bit-identical trajectories —
    the sharded solve equals the dense one exactly (same row dot
    products, merely partitioned),
  * the custom-VJP pullback forms only the matching (N/P, N) row-block
    of the cotangent dMLL/dK and pulls it back through the local Gram
    construction, ``psum``-ing parameter gradients — peak per-device
    memory is O(N²/P) in the forward AND the backward.

This is TPU-native scaling the reference cannot express (GPyTorch's BBMM
is single-process; SURVEY.md §2.6: no distributed backend).  Stationary
kernels work out of the box; kernels whose parameters align with rows
(e.g. Gibbs per-point lengthscales) supply ``cross_fn`` to build a
row-block from (x_local, x) however they need.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nonstationary_precip_tpu.ops.bbmm import (
    lanczos_logdet,
    mbcg,
    precond_logdet,
    sample_precond_probes,
)
from nonstationary_precip_tpu.ops.lazy_cg import (
    build_precond_factor,
    _woodbury,
    check_divisible as _shared_check_divisible,
    default_cross as _default_cross,
    warn_unstable_cross_fn as _warn_unstable_cross_fn,
)
from nonstationary_precip_tpu.parallel.mesh import DATA_AXIS

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _gram_rows(kernel, x_local, x, sigma2, axis, cross_fn):
    """Local (N/P, N) row-block of K + σ²I.  The σ² ridge lands on the
    global diagonal: local row j is global row axis_index·(N/P) + j."""
    nl = x_local.shape[0]
    n = x.shape[0]
    k_local = cross_fn(kernel, x_local, x)
    idx = jax.lax.axis_index(axis) * nl + jnp.arange(nl)
    mask = (jnp.arange(n)[None, :] == idx[:, None]).astype(k_local.dtype)
    return k_local + sigma2 * mask


def _check_divisible(n, n_dev, what):
    # shared with the single-chip lazy path (ops/lazy_cg.py), which also
    # owns the unstable-cross_fn retrace warning
    _shared_check_divisible(n, n_dev, what, "mesh size")


@functools.lru_cache(maxsize=8)
def packed_gibbs_local_matvec(d: int):
    """Fused local matvec for the packed-payload Gibbs convention
    (x_aug = concat([x, log_ell], 1)): rows [i0, i0+N/P) of (K + σ²I)v
    via ``ops/pallas_matvec.make_gibbs_matvec`` — the (N/P, N) row-block
    the default path materialises ONCE and re-reads every CG iteration
    never exists, dropping per-device peak memory from O(N²/P) to
    O(N·(D+R)).  Pass as ``local_matvec_builder``; forward-only (the
    backward still rebuilds the row-block through cross_fn)."""
    from nonstationary_precip_tpu.ops.pallas_matvec import make_gibbs_matvec

    def builder(kernel, x_local, x, sigma2, axis):
        xl, ll = x_local[:, :d], jnp.exp(x_local[:, d:])
        xf, lf = x[:, :d], jnp.exp(x[:, d:])
        nl = x_local.shape[0]
        mv = make_gibbs_matvec(xl, ll, xf, lf)  # packed once per loss eval

        def matvec(v):  # (N, R) replicated → (N/P, R) local rows
            i0 = jax.lax.axis_index(axis) * nl
            return mv(v) + sigma2 * jax.lax.dynamic_slice_in_dim(v, i0, nl)

        return matvec

    return builder


# ---------------------------------------------------------------------------
# MLL (differentiable w.r.t. kernel params, y, sigma2)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _mll_machinery(
    mesh, axis, num_probes, max_iters, tol, cross_fn, local_matvec_builder=None,
    precond_rank=0,
):
    """Per-(mesh, settings) compiled machinery; lru_cache keeps function
    identity stable so jitted callers don't retrace across steps.

    The cache keys on ``cross_fn`` object identity: a closure minted per
    call would miss every time (fresh custom_vjp identity → jit retrace,
    minutes per remote compile on axon).  ``sharded_cg_mll`` warns when
    it sees a new cross_fn identity more than once — define cross_fn at
    module scope (or cache it yourself) so the identity is stable."""

    def fwd_inner(kernel, x_local, x, resid, probes, sigma2, lpc):
        if local_matvec_builder is not None:
            # fused Gram·v: no (N/P, N) row-block residency at all
            local_mv = local_matvec_builder(kernel, x_local, x, sigma2, axis)

            def matvec(v):  # (N, R) replicated → (N, R) replicated
                return jax.lax.all_gather(local_mv(v), axis, tiled=True)

        else:
            k_local = _gram_rows(kernel, x_local, x, sigma2, axis, cross_fn)

            def matvec(v):
                return jax.lax.all_gather(k_local @ v, axis, tiled=True)

        # P⁻¹ applies to REPLICATED (N, R) vectors — O(N·rank) identical
        # math on every device, no collectives (the factor rides in
        # replicated; the estimator is frozen, like the single-chip path)
        minv = (
            _woodbury(lpc, jax.lax.stop_gradient(sigma2))
            if precond_rank > 0
            else None
        )
        rhs = jnp.concatenate([resid[:, None], probes], axis=1)
        res = mbcg(matvec, rhs, max_iters=max_iters, tol=tol, precond=minv)
        return res.x, res.alphas, res.betas, jnp.any(res.broke)

    fwd_sm = shard_map(
        fwd_inner,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    def bwd_inner(
        kernel, x_local, x, sigma2, alpha_l, alpha, solves_l, solves, rights, gk
    ):
        # symmetrised local rows of dMLL/dK = ½ααᵀ − ½·mean_i (K⁻¹zᵢ)rᵢᵀ:
        # transpose handled analytically so no (N, N) object ever forms.
        # solves rides in twice like alpha — sharded rows + the replicated
        # copy the caller already holds — so no all_gather in the backward.
        r = rights.shape[-1]
        rights_l = jax.lax.dynamic_slice_in_dim(
            rights, jax.lax.axis_index(axis) * alpha_l.shape[0], alpha_l.shape[0]
        )
        kbar_l = (
            0.5 * jnp.outer(alpha_l, alpha)
            - (0.25 / r) * (solves_l @ rights.T + rights_l @ solves.T)
        )

        def build(kern, xl, xf, s2):
            return _gram_rows(kern, xl, xf, s2, axis, cross_fn)

        _, vjp = jax.vjp(build, kernel, x_local, x, sigma2)
        kgrad, xl_grad, xf_grad, s2grad = vjp(gk * kbar_l)
        # x enters the row-block twice: as the local rows (cotangent stays
        # sharded — reassembles positionally) and as the replicated column
        # side (psum).  Their sum outside is the full dMLL/dx, which is
        # what makes row-aligned kernel state (e.g. Gibbs per-point
        # lengthscales packed into x) trainable through the sharded path.
        return (
            jax.tree.map(lambda t: jax.lax.psum(t, axis), kgrad),
            xl_grad,
            jax.lax.psum(xf_grad, axis),
            jax.lax.psum(s2grad, axis),
        )

    bwd_sm = shard_map(
        bwd_inner,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P(axis), P(), P(axis), P(), P(), P()),
        out_specs=(P(), P(axis), P(), P()),
        check_vma=False,
    )

    @jax.custom_vjp
    def mll(kernel, x, resid, probes, sigma2, lpc):
        val, _ = mll_fwd(kernel, x, resid, probes, sigma2, lpc)
        return val

    def mll_fwd(kernel, x, resid, probes, sigma2, lpc):
        n = resid.shape[0]
        sols, alphas, betas, broke = fwd_sm(
            kernel, x, x, resid, probes, sigma2, lpc
        )
        alpha = sols[:, 0]
        probe_solves = sols[:, 1:]
        if precond_rank > 0:
            # replicated O(N·rank) math — runs outside the shard_map.
            # rights = P⁻¹z keeps BOTH estimators unbiased for z ~ N(0, P):
            # E[z (P⁻¹z)ᵀ] = I (trace-identity gradient) and
            # E[zᵀP⁻¹z] per probe weights the Lanczos quadrature of
            # log det(P⁻¹K); the preconditioner's own logdet is exact.
            s2 = jax.lax.stop_gradient(sigma2)
            rights = _woodbury(lpc, s2)(probes)
            probe_w = jnp.sum(probes * rights, axis=0)
            logdet_p = precond_logdet(lpc, s2, n)
        else:
            rights = probes  # E[z zᵀ] = I for Rademacher
            probe_w = jnp.sum(probes * probes, axis=0)  # = n exactly
            logdet_p = jnp.asarray(0.0, resid.dtype)
        logdet = logdet_p + lanczos_logdet(alphas[:, 1:], betas[:, 1:], probe_w)
        val = (
            -0.5 * jnp.dot(resid, alpha)
            - 0.5 * logdet
            - 0.5 * n * jnp.log(jnp.asarray(2.0 * jnp.pi, resid.dtype))
        )
        val = jnp.where(broke, jnp.nan, val)
        return val, (kernel, x, sigma2, alpha, probe_solves, rights)

    def mll_bwd(saved, g):
        kernel, x, sigma2, alpha, probe_solves, rights = saved
        kgrad, xl_grad, xf_grad, s2grad = bwd_sm(
            kernel, x, x, sigma2, alpha, alpha, probe_solves, probe_solves, rights, g
        )
        rbar = -g * alpha
        return (
            kgrad,
            xl_grad + xf_grad,
            rbar,
            jnp.zeros_like(rights),
            s2grad,
            jnp.zeros((x.shape[0], precond_rank), x.dtype),
        )

    mll.defvjp(mll_fwd, mll_bwd)
    return mll


def sharded_cg_mll(
    kernel,
    x: jnp.ndarray,
    resid: jnp.ndarray,
    key: jax.Array,
    sigma2: jnp.ndarray,
    mesh,
    *,
    num_probes: int = 8,
    max_iters: int = 100,
    tol: float = 1e-6,
    axis: str = DATA_AXIS,
    cross_fn: Optional[Callable] = None,
    local_matvec_builder: Optional[Callable] = None,
    precond_rank: int = 0,
    precond_key=None,
    precond: str = "pivchol",
) -> jnp.ndarray:
    """−½ rᵀK⁻¹r − ½ log det K − (n/2) log 2π with K = kernel(x) + σ²I,
    K row-sharded over ``mesh``'s ``axis`` (never materialised globally).

    ``local_matvec_builder`` (stable identity) swaps the materialise-once
    row-block matvec for a fused Gram·v kernel (no O(N²/P) residency; see
    :func:`packed_gibbs_local_matvec`); CG trajectories then agree with
    the default to f32 rounding, not bitwise.

    Bit-compatible with the dense ``cg_mll`` under the same key (same row
    dot products, partitioned).  Differentiable w.r.t. kernel params,
    ``x``, ``resid`` and ``sigma2`` via the saved-probe trace identity —
    the ``x`` gradient is what lets row-aligned kernel state train
    through this path (Gibbs per-point lengthscales: pack them into the
    sharded rows, ``x_aug = concat([x, log_ell], 1)``, and unpack in
    ``cross_fn``).  The mesh axis size must divide N.

    ``precond_rank > 0`` enables the SAME pivoted-Cholesky/Woodbury
    preconditioner as the single-chip paths: the (N, rank) factor and
    the N(0, P) probes are replicated math (O(N·rank²) build,
    O(N·rank) per application — trivial next to one O(N²/P) matvec), so
    they run OUTSIDE the shard_map with no collectives at all, and the
    per-iteration P⁻¹ apply acts on the already-replicated CG vectors
    inside it.  This matters beyond speed: on the trained nonstationary
    Gibbs pose, UNpreconditioned CG stalls outright (relres ≈ 0.9 after
    200 iterations at N = 65536, tools/probe_precond_chip.json) where
    rank 150 reaches 1e-6 in ≤ 30 — "more iterations" cannot substitute.
    Matches ``ops/lazy_cg.lazy_cg_mll``'s estimator exactly (N(0, P)
    probes, P⁻¹-weighted trace identity, exact preconditioner logdet).

    ``cross_fn`` must have a stable identity across calls (module-level
    function, not a per-call closure) — machinery is cached per identity
    and a fresh closure each step forces a full retrace/recompile.
    """
    _check_divisible(x.shape[0], mesh.shape[axis], "x")
    _warn_unstable_cross_fn(cross_fn)
    cross = cross_fn or _default_cross
    fn = _mll_machinery(
        mesh, axis, num_probes, max_iters, tol, cross,
        local_matvec_builder, precond_rank,
    )
    if precond_rank > 0:
        # frozen estimator state, replicated (see docstring) — built from
        # the global x exactly as the single-chip lazy path builds it
        lpc = jax.lax.stop_gradient(
            build_precond_factor(
                precond, kernel, x, precond_rank, cross, precond_key
            )
        )
        probes = sample_precond_probes(
            key, lpc, jax.lax.stop_gradient(sigma2), num_probes
        )
    else:
        lpc = jnp.zeros((x.shape[0], 0), x.dtype)
        probes = jax.random.rademacher(
            key, (x.shape[0], num_probes), dtype=x.dtype
        )
    return fn(kernel, x, resid, probes, sigma2, lpc)


# ---------------------------------------------------------------------------
# posterior (prediction — deterministic, no probes)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _posterior_machinery(
    mesh, axis, max_iters, tol, cross_fn, local_matvec_builder=None,
    precond_rank=0,
):
    def inner(kernel, x_local, x, x_test, resid_local, sigma2, lpc):
        nl = resid_local.shape[0]
        b_local = cross_fn(kernel, x_local, x_test)  # (N/P, N*)
        if local_matvec_builder is not None:
            local_mv = local_matvec_builder(kernel, x_local, x, sigma2, axis)

            def matvec(v):
                return jax.lax.all_gather(local_mv(v), axis, tiled=True)

        else:
            k_local = _gram_rows(kernel, x_local, x, sigma2, axis, cross_fn)

            def matvec(v):
                return jax.lax.all_gather(k_local @ v, axis, tiled=True)

        minv = _woodbury(lpc, sigma2) if precond_rank > 0 else None
        rhs_local = jnp.concatenate([resid_local[:, None], b_local], axis=1)
        rhs = jax.lax.all_gather(rhs_local, axis, tiled=True)  # (N, 1+N*)
        res = mbcg(matvec, rhs, max_iters=max_iters, tol=tol, precond=minv)
        i0 = jax.lax.axis_index(axis) * nl
        alpha_l = jax.lax.dynamic_slice_in_dim(res.x[:, 0], i0, nl)
        solves_l = jax.lax.dynamic_slice_in_dim(res.x[:, 1:], i0, nl)
        mean = jax.lax.psum(b_local.T @ alpha_l, axis)           # (N*,)
        cov_term = jax.lax.psum(b_local.T @ solves_l, axis)      # (N*, N*)
        k_ss = cross_fn(kernel, x_test, x_test)
        cov = k_ss - 0.5 * (cov_term + cov_term.T)
        bad = jnp.any(res.broke)
        return (
            jnp.where(bad, jnp.nan, mean),
            jnp.where(bad, jnp.nan, cov),
        )

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )


# ---------------------------------------------------------------------------
# host-chunked sharded MLL (the frontier: past the execution wall AND past
# one chip's HBM — multi-chip is the only route beyond the 1M octave)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def make_sharded_chunked_mll(
    mesh,
    axis: str,
    num_probes: int,
    chunk_iters: int,
    n_chunks: int,
    tol: float,
    precond_rank: int,
    precond: str,
    precond_shift: float,
    cross_fn: Callable,
    local_matvec_builder: Optional[Callable] = None,
):
    """Row-sharded counterpart of ``ops.lazy_cg.make_chunked_mll``: the
    host drives the same phases (setup / k × mBCG chunk / finalize /
    backward panel sweep), but each device program runs under a
    ``shard_map`` over ``mesh`` — the matvec is local row panels +
    a tiled ``all_gather`` over ICI, the backward forms only local
    cotangent rows, and every CG scalar is replicated math, exactly as
    in :func:`sharded_cg_mll`.  No device program holds more than
    ``chunk_iters`` O(N²/P) matvecs, so the driver is valid PAST the
    ~60–90 s single-program execution wall (DESIGN.md §27) at N past one
    chip's HBM simultaneously.

    ``value_and_grad(kernel, x, resid, sigma2, key, pkey=None,
    early_stop=True)`` has the same contract as the single-device
    ``ChunkedMLL`` — under the same probe key the two walk the same row
    dot products, merely partitioned (dryrun 8 asserts parity).
    Preconditioner factor + probes are replicated math outside the
    shard_map (zero collectives), as in :func:`sharded_cg_mll`."""
    import numpy as _np

    from nonstationary_precip_tpu.ops.bbmm import mbcg_chunk, mbcg_init

    use_pre = precond_rank > 0

    def _make_setup(keyed: bool):
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
                probes = jax.random.rademacher(
                    key, (n, num_probes), dtype=x.dtype
                )
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

    def chunk_inner(kernel, x_local, x, sigma2, lpc, safe_bnorm, carry):
        if local_matvec_builder is not None:
            local_mv = local_matvec_builder(kernel, x_local, x, sigma2, axis)

            def matvec(v):
                return jax.lax.all_gather(local_mv(v), axis, tiled=True)

        else:
            k_local = _gram_rows(kernel, x_local, x, sigma2, axis, cross_fn)

            def matvec(v):
                return jax.lax.all_gather(k_local @ v, axis, tiled=True)

        minv = _woodbury(lpc, precond_shift * sigma2) if use_pre else None
        return mbcg_chunk(matvec, carry, chunk_iters, tol, safe_bnorm, minv)

    chunk_sm = jax.jit(shard_map(
        chunk_inner,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P(), P(), P()),
        out_specs=(P(), (P(), P(), P())),
        check_vma=False,
    ))

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

    def bwd_inner(kernel, x_local, x, sigma2, alpha_l, alpha, solves_l,
                  solves, rights):
        # identical cotangent algebra to _mll_machinery's bwd_inner at g=1
        r = rights.shape[-1]
        rights_l = jax.lax.dynamic_slice_in_dim(
            rights, jax.lax.axis_index(axis) * alpha_l.shape[0],
            alpha_l.shape[0],
        )
        kbar_l = (
            0.5 * jnp.outer(alpha_l, alpha)
            - (0.25 / r) * (solves_l @ rights.T + rights_l @ solves.T)
        )

        def build(kern, xl, xf, s2):
            return _gram_rows(kern, xl, xf, s2, axis, cross_fn)

        _, vjp = jax.vjp(build, kernel, x_local, x, sigma2)
        kgrad, xl_grad, xf_grad, s2grad = vjp(kbar_l)
        return (
            jax.tree.map(lambda t: jax.lax.psum(t, axis), kgrad),
            xl_grad,
            jax.lax.psum(xf_grad, axis),
            jax.lax.psum(s2grad, axis),
        )

    bwd_sm = jax.jit(shard_map(
        bwd_inner,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P(axis), P(), P(axis), P(), P()),
        out_specs=(P(), P(axis), P(), P()),
        check_vma=False,
    ))

    class ShardedChunkedMLL:
        def value_and_grad(self, kernel, x, resid, sigma2, key,
                           pkey=None, early_stop=True):
            setup = setup_unkeyed if pkey is None else setup_keyed
            if pkey is None:
                pkey = jax.random.PRNGKey(0)
            lpc, rights, probe_w, logdet_p, safe_bnorm, carry = setup(
                kernel, x, resid, sigma2, key, pkey
            )
            a_parts, b_parts = [], []
            ran = 0
            for _ in range(n_chunks):
                carry, (al, be, _) = chunk_sm(
                    kernel, x, x, sigma2, lpc, safe_bnorm, carry
                )
                a_parts.append(al)
                b_parts.append(be)
                ran += 1
                if early_stop and bool(_np.asarray(carry[5]).all()):
                    break
            r1 = a_parts[0].shape[1]
            pad = (n_chunks - ran) * chunk_iters
            if pad:
                a_parts.append(jnp.zeros((pad, r1), x.dtype))
                b_parts.append(jnp.zeros((pad, r1), x.dtype))
            alphas = jnp.concatenate(a_parts, axis=0)
            betas = jnp.concatenate(b_parts, axis=0)
            val, alpha, solves, relres = finalize(
                resid, carry, alphas, betas, probe_w, logdet_p, safe_bnorm
            )
            kg, xl_g, xf_g, s2g = bwd_sm(
                kernel, x, x, sigma2, alpha, alpha, solves, solves, rights
            )
            xg = xl_g + xf_g
            return val, relres, (kg, xg, -alpha, s2g)

    return ShardedChunkedMLL()


# ---------------------------------------------------------------------------
# sharded amortized posterior state (serving past one chip's HBM)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _state_solve_machinery(mesh, axis, max_iters, tol, cross_fn,
                           local_matvec_builder, use_pre, precond_shift):
    def inner(kernel, x_local, x, rhs, sigma2, lpc):
        if local_matvec_builder is not None:
            local_mv = local_matvec_builder(kernel, x_local, x, sigma2, axis)

            def matvec(v):
                return jax.lax.all_gather(local_mv(v), axis, tiled=True)

        else:
            k_local = _gram_rows(kernel, x_local, x, sigma2, axis, cross_fn)

            def matvec(v):
                return jax.lax.all_gather(k_local @ v, axis, tiled=True)

        minv = _woodbury(lpc, precond_shift * sigma2) if use_pre else None
        res = mbcg(matvec, rhs, max_iters=max_iters, tol=tol, precond=minv)
        return res.x, res.residnorm, jnp.any(res.broke)

    return jax.jit(shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    ))


def sharded_posterior_state(
    kernel,
    x: jnp.ndarray,
    resid: jnp.ndarray,
    sigma2: jnp.ndarray,
    mesh,
    *,
    max_iters: int = 64,
    tol: float = 1e-8,
    axis: str = DATA_AXIS,
    precond_rank: int = 150,
    precond: str = "pivchol",
    precond_key=None,
    precond_shift: float = 1.0,
    cross_fn: Optional[Callable] = None,
    local_matvec_builder: Optional[Callable] = None,
):
    """Row-sharded build of ``ops.lazy_cg.LazyPosteriorState``: the α
    solve runs as sharded mBCG (Gram never global), the factor is
    replicated math.  Returns the SAME state pytree as the single-chip
    builder — mean-only queries are then one sharded cross contraction
    (:func:`sharded_posterior_query`), and the state ships to any
    worker.  Dryrun 9 asserts parity with the single-device state."""
    from nonstationary_precip_tpu.ops.lazy_cg import LazyPosteriorState

    _check_divisible(x.shape[0], mesh.shape[axis], "x")
    _warn_unstable_cross_fn(cross_fn)
    cross = cross_fn or _default_cross
    kernel = jax.tree.map(jax.lax.stop_gradient, kernel)
    x = jax.lax.stop_gradient(x)
    sigma2 = jax.lax.stop_gradient(sigma2)
    precond_rank = min(precond_rank, x.shape[0])
    if precond_rank > 0:
        lpc = jax.lax.stop_gradient(
            build_precond_factor(
                precond, kernel, x, precond_rank, cross, precond_key
            )
        )
    else:
        lpc = jnp.zeros((x.shape[0], 0), x.dtype)
    fn = _state_solve_machinery(
        mesh, axis, max_iters, tol, cross, local_matvec_builder,
        precond_rank > 0, precond_shift,
    )
    sol, residnorm, broke = fn(kernel, x, x, resid[:, None], sigma2, lpc)
    alpha = jnp.where(broke, jnp.nan, sol[:, 0])
    return LazyPosteriorState(kernel, x, alpha, lpc, sigma2, residnorm[0])


@functools.lru_cache(maxsize=16)
def _query_mean_machinery(mesh, axis, cross_fn):
    """Sharded mean contraction + row-sharded cross build; lru-cached so
    repeated query batches never retrace (axon compiles are minutes)."""

    def inner(kern, x_local, alpha_local, xt):
        b_local = cross_fn(kern, x_local, xt)  # (N/P, N*)
        return jax.lax.psum(b_local.T @ alpha_local, axis), b_local

    return jax.jit(shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P(axis)),
        check_vma=False,
    ))


def sharded_posterior_query(
    state,
    x_test: jnp.ndarray,
    mesh,
    *,
    mean_only: bool = False,
    max_iters: int = 64,
    tol: float = 1e-6,
    axis: str = DATA_AXIS,
    precond_shift: float = 1.0,
    cross_fn: Optional[Callable] = None,
    local_matvec_builder: Optional[Callable] = None,
    return_info: bool = False,
):
    """(mean, cov) at ``x_test`` from a prebuilt (sharded or single-chip
    — same pytree) state: the mean is one sharded cross contraction
    psum-ed over the mesh (no solve), the variance one sharded mBCG with
    N* right-hand sides reusing the state's replicated factor.  Same
    ``return_info`` convergence-evidence contract as
    ``ops.lazy_cg.lazy_posterior_query``."""
    kernel, x, alpha, lpc, sigma2, alpha_relres = state
    _check_divisible(x.shape[0], mesh.shape[axis], "x")
    _warn_unstable_cross_fn(cross_fn)
    cross = cross_fn or _default_cross
    mean, b_rows = _query_mean_machinery(mesh, axis, cross)(
        kernel, x, alpha, x_test
    )
    if mean_only:
        if return_info:
            info = {
                "relres": jnp.zeros((0,), mean.dtype),
                "relres_max": jnp.asarray(alpha_relres, mean.dtype),
                "broke": jnp.asarray(False),
            }
            return mean, None, info
        return mean, None
    use_pre = lpc.shape[-1] > 0
    fn = _state_solve_machinery(
        mesh, axis, max_iters, tol, cross, local_matvec_builder,
        use_pre, precond_shift,
    )
    b_cols = b_rows  # (N, N*): shard_map already reassembled the rows
    sol, residnorm, broke = fn(kernel, x, x, b_cols, sigma2, lpc)
    from nonstationary_precip_tpu.ops.lazy_cg import _query_cov_jit

    cov = _query_cov_jit(cross)(kernel, x_test, b_cols, sol)
    mean = jnp.where(broke, jnp.nan, mean)
    cov = jnp.where(broke, jnp.nan, cov)
    if return_info:
        info = {
            "relres": residnorm,
            "relres_max": jnp.maximum(
                jnp.max(residnorm),
                jnp.asarray(alpha_relres, residnorm.dtype),
            ),
            "broke": broke,
        }
        return mean, cov, info
    return mean, cov


def sharded_cg_posterior(
    kernel,
    x: jnp.ndarray,
    resid: jnp.ndarray,
    x_test: jnp.ndarray,
    sigma2: jnp.ndarray,
    mesh,
    *,
    max_iters: int = 1000,
    tol: float = 1e-6,
    axis: str = DATA_AXIS,
    cross_fn: Optional[Callable] = None,
    local_matvec_builder: Optional[Callable] = None,
    precond_rank: int = 0,
    precond_key=None,
    precond: str = "pivchol",
):
    """(mean, cov) of the zero-mean exact-GP posterior at ``x_test``:
    mean = K*ₓ K⁻¹ r, cov = K** − K*ₓ K⁻¹ Kₓ*, all train-side solves by
    row-sharded mBCG with 1+N* right-hand sides in one fixed-length scan.

    The replicated footprint is O(N·N*) (the solve block) — chunk
    ``x_test`` for large test sets; the N² Gram stays sharded.  Add the
    caller's mean function / observation noise outside.
    ``local_matvec_builder`` as in :func:`sharded_cg_mll` (fused Gram·v,
    no O(N²/P) row-block residency).  ``precond_rank > 0`` as in
    :func:`sharded_cg_mll` (replicated Woodbury — ``mbcg`` is a
    fixed-length scan, so pair it with a matching ``max_iters`` cut:
    rank 150 reaches 1e-6 in ≤ 30 iterations at every probed N ≤ 65536
    where the unpreconditioned solve stalls, tools/probe_precond_chip).
    """
    _check_divisible(x.shape[0], mesh.shape[axis], "x")
    _warn_unstable_cross_fn(cross_fn)
    cross = cross_fn or _default_cross
    fn = _posterior_machinery(
        mesh, axis, max_iters, tol, cross, local_matvec_builder, precond_rank
    )
    if precond_rank > 0:
        lpc = build_precond_factor(
            precond, kernel, x, precond_rank, cross, precond_key
        )
    else:
        lpc = jnp.zeros((x.shape[0], 0), x.dtype)
    return fn(kernel, x, x, x_test, resid, sigma2, lpc)
