"""Log-normal latent process: D independent GPs on the log-lengthscale.

Functional redesign of ``LogNormalPriorProcess``
(/root/reference/models/gibbs_kernels.py:61-109), preserving its observable
semantics exactly:

  * ``sample``            — exp of an MVN sample of the log-field;
  * ``conditional_mean``  — exp of the *conditional mean only* (the
    reference's documented shortcut at gibbs_kernels.py:80-100: no
    conditional covariance, one "sample" = the mean), with the same 1e-4
    jitter on the conditioning Gram;
  * ``log_prob``          — joint MVN log-density of the log-field with
    1e-4 jitter, divided by N (gibbs_kernels.py:102-109).

Layout: this framework carries lengthscale fields as (N, D) row-per-point
(the reference uses (D, N)); each output dim d has its own constant mean
and its own Scale(RBF-ARD) kernel over the D_in input dims.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.kernels.stationary import _sq_dist as sq_dist
from nonstationary_precip_tpu.ops.linalg import (
    add_jitter,
    cho_solve,
    mvn_logpdf_from_chol,
    safe_cholesky,
)
from nonstationary_precip_tpu.utils.struct import pytree_dataclass
from nonstationary_precip_tpu.utils.transforms import positive, raw_init

_COND_JITTER = 1e-4  # reference: gibbs_kernels.py:88,107


def _dim_cross(params, xa, xb):
    """Scale(RBF-ARD) cross-Gram of ONE prior output dim — module-level so
    its identity is stable (the lazy-CG machinery caches on cross_fn)."""
    ell, s2 = params
    return s2 * jnp.exp(-0.5 * sq_dist(xa / ell, xb / ell))


@pytree_dataclass(static=("active_dims",))
class LogNormalProcess:
    """D independent GP priors on log-lengthscale fields.

    Fields (leading axis = output dim D):
      mean_const       (D,)        constant mean of each log-GP
      raw_outputscale  (D,)        Scale kernel outputscale (softplus raw)
      raw_lengthscale  (D, D_in)   RBF-ARD lengthscales    (softplus raw)
    """

    mean_const: jnp.ndarray
    raw_outputscale: jnp.ndarray
    raw_lengthscale: jnp.ndarray
    active_dims: Optional[tuple] = None

    @classmethod
    def create(
        cls,
        input_dim: int,
        out_dim: Optional[int] = None,
        mean: float = 0.0,
        outputscale: float = None,
        lengthscale: float = None,
        active_dims: Optional[tuple] = None,
        dtype=jnp.float32,
    ):
        """Defaults mirror GPyTorch inits: constant mean 0, softplus(0)
        outputscale/lengthscale.  ``spatial_exp.py``-style priors set
        mean=log(0.3), outputscale=1.0, lengthscale=1.3
        (/root/reference/experiments/spatial_exp.py:157-164)."""
        d_out = input_dim if out_dim is None else out_dim
        mc = jnp.full((d_out,), mean, dtype=dtype)
        ros = (
            jnp.zeros((d_out,), dtype=dtype)
            if outputscale is None
            else raw_init(jnp.full((d_out,), outputscale, dtype=dtype))
        )
        rls = (
            jnp.zeros((d_out, input_dim), dtype=dtype)
            if lengthscale is None
            else raw_init(jnp.full((d_out, input_dim), lengthscale, dtype=dtype))
        )
        return cls(mean_const=mc, raw_outputscale=ros, raw_lengthscale=rls, active_dims=active_dims)

    # -- internals ---------------------------------------------------------

    def _slice(self, x):
        if self.active_dims is None:
            return x
        return x[..., jnp.asarray(self.active_dims)]

    def _gram(self, x1, x2=None):
        """Batched Scale(RBF-ARD) Grams, one per output dim: (D, N1, N2)."""
        x1 = self._slice(x1)
        x2 = x1 if x2 is None else self._slice(x2)
        ell = positive(self.raw_lengthscale)  # (D, D_in)
        s2 = positive(self.raw_outputscale)  # (D,)

        def one(ell_d, s2_d):
            return s2_d * jnp.exp(-0.5 * sq_dist(x1 / ell_d, x2 / ell_d))

        return jax.vmap(one)(ell, s2)

    def mean(self, x) -> jnp.ndarray:
        """Prior mean of the log-field at x: (N, D)."""
        n = x.shape[-2]
        return jnp.broadcast_to(self.mean_const[None, :], (n, self.mean_const.shape[0]))

    # -- reference API -----------------------------------------------------

    def sample(self, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        """exp of a joint MVN sample of the log-field: (N, D) positive."""
        grams = self._gram(x)  # (D, N, N)
        chols = safe_cholesky(add_jitter(grams, _COND_JITTER))
        eps = jax.random.normal(key, (grams.shape[0], grams.shape[1]), dtype=x.dtype)
        log_f = self.mean_const[:, None] + jnp.einsum("dij,dj->di", chols, eps)
        return jnp.exp(log_f).T

    def conditional_mean(
        self, x: jnp.ndarray, given: Tuple[jnp.ndarray, jnp.ndarray]
    ) -> jnp.ndarray:
        """exp of E[log ℓ(x) | log ℓ(x_g) = log ell_g]: (N, D) positive.

        Matches ``conditional_sample`` (gibbs_kernels.py:80-100): the
        conditional covariance is deliberately dropped; jitter 1e-4 on the
        conditioning Gram; exp of the mean (NOT the log-normal mean).
        """
        xg, ell_g = given
        k_xg = self._gram(x, xg)  # (D, N, Ng)
        k_gg = add_jitter(self._gram(xg), _COND_JITTER)  # (D, Ng, Ng)
        resid = jnp.log(ell_g).T - self.mean(xg).T  # (D, Ng)
        # safe_cholesky, not plain solve_psd: training survives an
        # ill-conditioned k_gg via the escalating-jitter retry, so the
        # predict path must too (a plain f32 Cholesky NaN here would turn
        # a trained model's whole lengthscale field — and every posterior
        # built on it — silently non-finite)
        alpha = cho_solve(safe_cholesky(k_gg), resid)  # (D, Ng)
        mu = self.mean(x).T + jnp.einsum("dng,dg->dn", k_xg, alpha)  # (D, N)
        return jnp.exp(mu).T

    def gram_chol(self, x: jnp.ndarray) -> jnp.ndarray:
        """chol(K_d + 1e-4 I) per output dim: (D, N, N).

        When the prior is frozen (every reference experiment freezes it,
        spatial_exp.py:166-167) this is loop-invariant — compute it once
        per fit and pass it to ``log_prob`` so the training scan doesn't
        refactor D N×N matrices every step."""
        return safe_cholesky(add_jitter(self._gram(x), _COND_JITTER))

    def gram_pre(self, x: jnp.ndarray):
        """(K⁻¹ (D, N, N), logdet (D,)) of K_d + 1e-4 I — the fully-hoisted
        form of ``gram_chol`` for a FROZEN prior.

        ``log_prob`` against a hoisted Cholesky still runs 2·D single-RHS
        triangular solves per training step (forward + their transposed
        VJP solves in backward) — sequential blocked ops that dominated
        the 10-split Gibbs benchmark step (tools/profile_gibbs.py).  With
        the explicit inverse the per-step prior term is one batched GEMM
        (quad = diffᵀ(K⁻¹diff)) and a constant; autodiff through it is
        GEMMs too.  The inverse is formed once per fit via the Cholesky
        (L⁻ᵀL⁻¹), so accuracy matches the solve path at these sizes
        (jitter 1e-4 keeps cond(K) modest)."""
        chols = self.gram_chol(x)
        eye = jnp.eye(chols.shape[-1], dtype=chols.dtype)
        linv = jax.lax.linalg.triangular_solve(
            chols, jnp.broadcast_to(eye, chols.shape), left_side=True, lower=True
        )
        kinv = jnp.swapaxes(linv, -1, -2) @ linv
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(chols, axis1=-2, axis2=-1)), axis=-1
        )
        return kinv, logdet

    def conditional_mean_matrixfree(
        self,
        x: jnp.ndarray,
        given: Tuple[jnp.ndarray, jnp.ndarray],
        pre,
        *,
        block: int = 1024,
        max_iters: int = 256,
        tol: float = 1e-10,
        precond_shift: float = 1.0,
    ) -> jnp.ndarray:
        """:meth:`conditional_mean` for LARGE conditioning sets: the
        (Ng, Ng) conditioning solves run as preconditioned matrix-free CG
        (``pre`` = :meth:`gram_pre_lazy` of the SAME x_g — the lpc factors
        are reused; the logdet half is ignored), and the (N, Ng) cross
        Gram is consumed in row panels of x so it never fully
        materialises either.  Deterministic; same 1e-4 jitter semantics
        as the dense path.  Not differentiable (predict-time only).
        For REPEATED queries, hoist :meth:`conditional_pre_matrixfree`
        once and call :meth:`conditional_mean_from_pre` per batch —
        this convenience form re-solves every call."""
        alphas = self.conditional_pre_matrixfree(
            given, pre, block=block, max_iters=max_iters, tol=tol,
            precond_shift=precond_shift,
        )
        return self.conditional_mean_from_pre(x, given, alphas, block=block)

    def conditional_pre_matrixfree(
        self,
        given,
        pre,
        *,
        block: int = 1024,
        max_iters: int = 256,
        tol: float = 1e-10,
        precond_shift: float = 1.0,
        chunk_iters: int | None = None,
    ) -> jnp.ndarray:
        """The QUERY-INDEPENDENT half of :meth:`conditional_mean_matrixfree`:
        per-dim conditioning solves αᵈ = (Kᵈ(x_g,x_g) + 1e-4 I)⁻¹
        (log ℓ_g − μ)ᵈ, each a preconditioned single-RHS mBCG over lazy
        panels.  Hoist ONCE per fit (the trained field is frozen at
        serving time) and feed :meth:`conditional_mean_from_pre` per query
        batch — each of these D solves pays a full panel sweep per
        iteration, which previously re-ran inside every posterior call.
        Returns (D, Ng)."""
        from nonstationary_precip_tpu.ops.bbmm import mbcg
        from nonstationary_precip_tpu.ops.lazy_cg import (
            _lazy_matvec,
            _woodbury,
            check_divisible,
        )

        xg, ell_g = given
        lpc, _ = pre
        xgs = jax.lax.stop_gradient(self._slice(xg))
        ng = xgs.shape[0]
        blk = min(block, ng)
        check_divisible(ng, blk, "x_g", "row-panel block")
        ell = positive(self.raw_lengthscale)
        s2 = positive(self.raw_outputscale)
        jitter = jnp.asarray(_COND_JITTER, xg.dtype)
        resid = jnp.log(ell_g).T - self.mean(xg).T  # (D, Ng)
        alphas = []
        for dim in range(self.mean_const.shape[0]):
            params = (ell[dim], s2[dim])
            if chunk_iters is not None:
                # past-the-wall route (DESIGN §27): the same solve as
                # host-chunked phases, no device program over the budget
                from nonstationary_precip_tpu.ops.lazy_cg import (
                    make_chunked_solve,
                )

                solve = make_chunked_solve(
                    blk, chunk_iters, -(-max_iters // chunk_iters), tol,
                    _dim_cross, None, precond_shift,
                )
                sol, _ = solve(
                    params, xgs, resid[dim][:, None], jitter,
                    jax.lax.stop_gradient(lpc[dim]),
                )
                alphas.append(sol[:, 0])
                continue
            matvec = _lazy_matvec(params, xgs, jitter, blk, _dim_cross)
            minv = _woodbury(
                jax.lax.stop_gradient(lpc[dim]), precond_shift * jitter
            )
            res = mbcg(
                matvec, resid[dim][:, None],
                max_iters=max_iters, tol=tol, precond=minv,
            )
            alphas.append(
                jnp.where(jnp.any(res.broke), jnp.nan, res.x[:, 0])
            )
        return jnp.stack(alphas)  # (D, Ng)

    def conditional_mean_from_pre(
        self,
        x: jnp.ndarray,
        given,
        cond_alphas: jnp.ndarray,
        *,
        block: int = 1024,
    ) -> jnp.ndarray:
        """The per-query half: ℓ(x) = exp(μ + k(x, x_g) α) with the cross
        Gram consumed in row panels of x — no solve, O(block·Ng)
        transient.  ``cond_alphas`` from
        :meth:`conditional_pre_matrixfree`."""
        xg, _ = given
        xgs = jax.lax.stop_gradient(self._slice(xg))
        xs = self._slice(x)
        ell = positive(self.raw_lengthscale)
        s2 = positive(self.raw_outputscale)
        mus = []
        for dim in range(self.mean_const.shape[0]):
            params = (ell[dim], s2[dim])
            alpha = cond_alphas[dim]
            nt = xs.shape[0]
            tb = min(block, nt)
            pad = (-nt) % tb
            xp = jnp.concatenate([xs, jnp.zeros((pad, xs.shape[1]), xs.dtype)])
            panels = xp.reshape(-1, tb, xs.shape[1])
            proj = jax.lax.map(
                lambda xb: _dim_cross(params, xb, xgs) @ alpha, panels
            ).reshape(-1)[:nt]
            mus.append(self.mean_const[dim] + proj)
        return jnp.exp(jnp.stack(mus)).T

    def gram_pre_lazy(
        self,
        x: jnp.ndarray,
        key: jax.Array,
        *,
        rank: int = 50,
        block: int = 1024,
        num_probes: int = 16,
        max_iters: int = 256,
        tol: float = 1e-10,
        precond_key=None,
        precond_shift: float = 1.0,
    ):
        """Matrix-free counterpart of ``gram_pre`` for LARGE N, where the
        D (N, N) prior Grams no longer fit: per-dim pivoted-Cholesky
        factors (the loop-invariant CG preconditioner for the per-step
        quad solves — essential, the 1e-4 jitter makes plain CG stall) and
        an SLQ logdet estimate (a CONSTANT of training for a frozen
        prior).  O(N·rank) memory; compute once per fit.

        Returns ``(lpc (D, N, rank), logdet (D,))`` — feed to
        :meth:`log_prob_matrixfree`."""
        from nonstationary_precip_tpu.ops.lazy_cg import (
            lazy_pivoted_cholesky,
            lazy_slq_logdet,
        )

        xs = self._slice(x)
        ell = positive(self.raw_lengthscale)  # (D, D_in)
        s2 = positive(self.raw_outputscale)  # (D,)
        jitter = jnp.asarray(_COND_JITTER, x.dtype)
        lpcs, logdets = [], []
        for dim in range(self.mean_const.shape[0]):
            params = (ell[dim], s2[dim])
            lpc = jax.lax.stop_gradient(
                lazy_pivoted_cholesky(
                    params, xs, rank, cross_fn=_dim_cross, key=precond_key
                )
            )
            logdet = lazy_slq_logdet(
                params,
                xs,
                jax.random.fold_in(key, dim),
                jitter,
                lpc=lpc,
                block=block,
                num_probes=num_probes,
                max_iters=max_iters,
                tol=tol,
                precond_shift=precond_shift,
                cross_fn=_dim_cross,
            )
            lpcs.append(lpc)
            logdets.append(logdet)
        return jnp.stack(lpcs), jnp.stack(logdets)

    def log_prob_matrixfree(
        self,
        x: jnp.ndarray,
        log_ell: jnp.ndarray,
        pre,
        *,
        block: int = 1024,
        max_iters: int = 64,
        tol: float = 1e-6,
        precond_shift: float = 1.0,
    ) -> jnp.ndarray:
        """:meth:`log_prob` for LARGE N under the FROZEN-prior contract
        (every reference experiment freezes the prior,
        spatial_exp.py:166-167): the quadratic runs as one preconditioned
        matrix-free CG solve per dim (``ops.lazy_cg.lazy_cg_quad`` — its
        custom VJP makes the log_ell gradient the exact 2K⁻¹diff at
        convergence), the logdet is the hoisted constant from
        :meth:`gram_pre_lazy`.  Value matches ``log_prob`` up to the SLQ
        logdet estimate (a constant offset: |Δloss| stopping, gradients
        and trajectories are unaffected); prior-hyper gradients are ZERO
        by design."""
        import math

        from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_quad

        lpc, logdet = pre
        n = x.shape[-2]
        xs = self._slice(x)
        ell = positive(self.raw_lengthscale)
        s2 = positive(self.raw_outputscale)
        jitter = jnp.asarray(_COND_JITTER, x.dtype)
        diff = log_ell.T - self.mean(x).T  # (D, N)
        lp = 0.0
        for dim in range(self.mean_const.shape[0]):
            quad = lazy_cg_quad(
                (ell[dim], s2[dim]),
                xs,
                diff[dim],
                jitter,
                lpc=lpc[dim],
                block=block,
                max_iters=max_iters,
                tol=tol,
                precond_shift=precond_shift,
                cross_fn=_dim_cross,
            )
            lp = lp - 0.5 * (quad + logdet[dim] + n * math.log(2.0 * math.pi))
        return lp / n

    def log_prob(
        self, x: jnp.ndarray, log_ell: jnp.ndarray, chols=None
    ) -> jnp.ndarray:
        """Σ_d log N(log_ell[:, d]; mean_d, K_d + 1e-4 I) / N  — the
        reference's per-N-normalised prior term (gibbs_kernels.py:102-109),
        summed over dims the way GPyTorch's MLL sums prior log-probs.

        ``chols`` may be the (D, N, N) Cholesky stack from ``gram_chol``
        or the (K⁻¹, logdet) pair from ``gram_pre`` (solve-free fast path
        for frozen priors)."""
        import math

        n = x.shape[-2]
        if isinstance(chols, tuple):
            kinv, logdet = chols
            diff = log_ell.T - self.mean(x).T  # (D, N)
            quad = jnp.sum(diff * jnp.einsum("dij,dj->di", kinv, diff), axis=-1)
            lp = -0.5 * (quad + logdet + n * math.log(2.0 * math.pi))
            return jnp.sum(lp) / n
        if chols is None:
            chols = self.gram_chol(x)
        lp = mvn_logpdf_from_chol(log_ell.T, self.mean(x).T, chols)  # (D,)
        return jnp.sum(lp) / n

    # convenience for model init ------------------------------------------

    def init_log_field(self, x: jnp.ndarray) -> jnp.ndarray:
        """Initial latent log-lengthscale field = prior mean at x (the
        reference's init, nonstationary_models.py:31-34): (N, D)."""
        return self.mean(x)
