"""MAP inference for diagonal-Gibbs nonstationary GPs.

``GibbsExactGP``  — TPU-native DiagonalExactGP
  (/root/reference/models/nonstationary_models.py:22-62): a latent
  log-lengthscale field at the training inputs is optimised jointly with
  the kernel/likelihood hypers under  MLL + prior-log-prob (both scaled by
  1/N, GPyTorch convention); prediction conditions the lengthscale field
  at new points on the trained field via the log-normal process
  conditional mean.

``GibbsSparseGP`` — TPU-native DiagonalSparseGP + InducingGibbsKernel
  (nonstationary_models.py:64-153, gibbs_kernels.py:171-266): the latent
  field lives at M inducing points; training maximises the Titsias
  collapsed bound (Nyström root + Woodbury, never an N×N dense solve)
  with the reference's added diagonal loss term; prediction returns the
  SGPR predictive (marginals exact, as the reference warns at
  nonstationary_models.py:93).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram
from nonstationary_precip_tpu.kernels.inducing import nystrom_root
from nonstationary_precip_tpu.models.distributions import MVN
from nonstationary_precip_tpu.models.likelihoods import GaussianLikelihood
from nonstationary_precip_tpu.ops.linalg import (
    diag_part,
    cho_solve,
    safe_cholesky,
    tri_solve,
)
from nonstationary_precip_tpu.priors.lognormal_process import LogNormalProcess
from nonstationary_precip_tpu.utils.struct import pytree_dataclass, trainable_mask
from nonstationary_precip_tpu.utils.transforms import positive, raw_init


def _scale_mask(train_noise: bool, train_scale: bool, train_z: bool = False):
    """Default trainability predicate: the latent field always trains; the
    prior is always frozen (spatial_exp.py:166-167); noise/outputscale per
    flags (spatial_exp.py:179-186 freezes both)."""

    def pred(path: str) -> bool:
        if path.startswith("prior/"):
            return False
        if "raw_noise" in path:
            return train_noise
        if "raw_outputscale" in path:
            return train_scale
        if path == "z" or path.endswith("/z"):
            return train_z
        return True

    return pred


@pytree_dataclass
class GibbsExactGP:
    """Zero-mean exact GP with scaled diagonal-Gibbs covariance and a
    trainable latent log-lengthscale field at the N training inputs."""

    prior: LogNormalProcess
    likelihood: GaussianLikelihood
    raw_outputscale: jnp.ndarray
    log_ell: jnp.ndarray  # (N, D)

    @classmethod
    def create(cls, x_train, prior: LogNormalProcess, noise=None, outputscale=1.0, dtype=jnp.float32):
        return cls(
            prior=prior,
            likelihood=GaussianLikelihood.create(noise, dtype=dtype),
            raw_outputscale=raw_init(jnp.asarray(outputscale, dtype=dtype)),
            log_ell=prior.init_log_field(x_train).astype(dtype),
        )

    @property
    def outputscale(self):
        return positive(self.raw_outputscale)

    def trainable(self, train_noise=False, train_scale=False):
        return trainable_mask(self, _scale_mask(train_noise, train_scale))

    # -- objective ----------------------------------------------------------

    def loss(self, x: jnp.ndarray, y: jnp.ndarray, prior_chols=None) -> jnp.ndarray:
        """−(log N(y; 0, s²K_gibbs + σ²I) + prior_logprob) / N.

        The Gram → +σ²I → Cholesky → forward-substitution pipeline runs as
        ONE fused Pallas kernel on TPU for eligible sizes
        (ops/pallas_fused.py — K never exists in HBM), with the XLA +
        safe_cholesky composition as the fallback/oracle path.

        ``prior_chols`` hoists the frozen prior's D N×N Gram algebra out
        of the training scan — loop-invariant whenever the prior hypers
        are frozen, which every reference experiment does.  Pass
        ``prior.gram_pre(x)`` (inverse + logdet: the per-step prior term
        becomes solve-free GEMMs) or ``prior.gram_chol(x)`` (Cholesky
        stack)."""
        import math

        from nonstationary_precip_tpu.ops.pallas_fused import gibbs_noisy_chol_alpha

        n = y.shape[-1]
        ell = jnp.exp(self.log_ell)
        chol, alpha = gibbs_noisy_chol_alpha(
            x, ell, y, self.outputscale, self.likelihood.noise
        )
        quad = jnp.sum(alpha * alpha)
        logdet = 2.0 * jnp.sum(jnp.log(diag_part(chol)))
        logp = -0.5 * (quad + logdet + n * math.log(2.0 * math.pi))
        prior_term = self.prior.log_prob(x, self.log_ell, prior_chols)
        return -(logp + prior_term) / n

    def prior_pre_matrixfree(self, x, key, **kw):
        """Hoisted state for :meth:`loss_matrixfree` — the matrix-free
        analogue of passing ``prior.gram_pre(x)`` to :meth:`loss`: per-dim
        pivoted-Cholesky preconditioner factors + the frozen prior's
        constant SLQ logdet (``LogNormalProcess.gram_pre_lazy``).  Compute
        ONCE per fit (loop-invariant); O(N·rank) memory."""
        return self.prior.gram_pre_lazy(x, key, **kw)

    def precond_factor(
        self,
        x: jnp.ndarray,
        *,
        rank: int = 150,
        precond: str = "pivchol",
        key=None,
    ) -> jnp.ndarray:
        """(N, rank) preconditioner factor of the DATA Gram at the
        CURRENT parameter pose, for the stale-preconditioner hoist: pass
        it to :meth:`loss_matrixfree` as ``precond_lpc`` and refresh every
        k steps (e.g. at the boundaries of a nested training scan) instead
        of rebuilding inside every step.  The mBCG estimator is unbiased
        for ANY fixed SPD P (``ops/lazy_cg.lazy_cg_mll`` docstring), so a
        few-steps-stale factor changes only estimator variance and CG
        convergence margin — the per-point lengthscale field moves slowly
        under Adam.  Measured on chip this is PERF-NEUTRAL at rank 150
        (the build is noise next to the O(N²) matvecs; exact parity at
        N = 16384/32768/65536, tools/bench_cg.py lazygstale rows) — use
        it when the factor itself is needed outside the step (sharded
        replication, fixed-P estimator studies), not to save time."""
        from nonstationary_precip_tpu.kernels.gibbs import packed_gibbs_cross
        from nonstationary_precip_tpu.ops.lazy_cg import build_precond_factor

        d = x.shape[-1]
        aug = jnp.concatenate([x, self.log_ell], axis=1)
        return build_precond_factor(
            precond, self.raw_outputscale, aug, min(rank, x.shape[0]),
            packed_gibbs_cross(d), key,
        )

    def loss_matrixfree(
        self,
        x: jnp.ndarray,
        y: jnp.ndarray,
        key,
        prior_pre,
        *,
        block: int = 2048,
        num_probes: int = 8,
        max_iters: int | None = None,
        tol: float = 1e-6,
        precond_rank: int = 150,
        precond_key=None,
        precond: str = "pivchol",
        precond_shift: float = 1.0,
        precond_lpc: jnp.ndarray | None = None,
        fused_matvec: bool = True,
        fused_bwd: bool | None = None,
        prior_max_iters: int = 64,
        prior_precond_shift: float = 1.0,
        matvec_precision: str = "highest",
    ) -> jnp.ndarray:
        """:meth:`loss` for LARGE N: the same MAP estimand, but no N×N
        matrix — data-Gram OR prior-Gram — ever materialises, so training
        runs past the dense path's HBM wall (dense Cholesky compile-fails
        at 32768 and the dense Gram OOMs at 65536 on a v5e;
        tools/bench_cg.json).

        The MLL term is the matrix-free BBMM estimator
        (``ops/lazy_cg.lazy_cg_mll``): mBCG solves with the fused Gram·v
        Pallas matvec (``scaled_packed_gibbs_matvec_builder`` — 2× the
        panel path on chip, DESIGN.md §15) and a per-step rank-
        ``precond_rank`` pivoted-Cholesky/Woodbury preconditioner —
        unpreconditioned CG is materially unconverged at 64 iterations for
        N ≥ 4096 on this kernel (tools/probe_precond.py).  The defaults
        (rank 150; budget auto = 16 iterations for N ≤ 32768, 32 above)
        are the measured converged-at-trained-pose configs from the
        on-chip sweep (tools/probe_precond_chip.json: rank 50 stalls at
        relres ≈ 0.14–1.1 for N ≥ 16384 where rank 150 reaches 1e-6 by
        iteration 9–30; rank 200 showed a stall anomaly at 65536, so 150
        is the shipped ceiling) — rank is nearly free (O(N·R²) setup,
        O(N·R) per iteration, both ≪ one O(N²) matvec) while every saved
        iteration is ~40 ms/step at 65536, so prefer raising rank over
        raising the budget.  Validate on new data with
        ``mbcg``'s residual history, not by eye.  This is the
        estimator the reference trains large N under
        (``gpytorch.settings.max_cg_iterations``, reference
        ``experiments/spatial_exp.py:199``), with the same stochastic
        logdet/trace machinery.  The prior term reuses the SAME contract
        the dense path's ``prior_chols`` hoist does — frozen prior — via
        ``prior_pre`` (:meth:`prior_pre_matrixfree`, once per fit): exact
        CG quadratic each step, constant logdet.

        Gradients flow to the lengthscale field (packed into the payload
        columns), raw_outputscale (through the kernel pytree) and the
        noise (panel diagonal).  Same 1/N scaling as :meth:`loss`; the
        value differs from the dense loss only by the estimator noise
        (SLQ logdet), the gradients by the standard BBMM trace estimator.
        ``matvec_precision`` is a re-probe knob: 'highest' (default,
        exact f32) is the shipped choice — 'high3' measures only 1.06×
        end-to-end, 'vpu' is perf-neutral, and 'default' DIVERGES inside
        preconditioned mBCG (tools/probe_matvec_precision.py,
        DESIGN §17-18).

        ``fused_bwd`` (defaults to ``fused_matvec``) reroutes the MLL
        gradient through the fused Pallas backward panel sweep
        (``ops/pallas_matvec.packed_gibbs_panel_vjp``): the jax.vjp
        panel scan — 26-28% of the training step — collapses to one
        kernel launch (measured 1.29-1.32× end-to-end, DESIGN §19);
        gradients agree with the scan to f32 rounding, the derivation
        is f64-exact vs autodiff.

        ``precond_lpc``: a prebuilt factor from :meth:`precond_factor` —
        skips the per-step factor build (the stale-preconditioner hoist;
        still an unbiased estimator for any fixed SPD P).  Refresh it
        every k steps outside this function.
        """
        from nonstationary_precip_tpu.kernels.gibbs import packed_gibbs_cross
        from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_mll

        n = y.shape[-1]
        d = x.shape[-1]
        if max_iters is None:
            max_iters = 16 if n <= 32768 else 32
        precond_rank = min(precond_rank, n)
        aug = jnp.concatenate([x, self.log_ell], axis=1)
        builder = None
        if fused_matvec:
            from nonstationary_precip_tpu.ops.pallas_matvec import (
                scaled_packed_gibbs_matvec_builder,
            )

            builder = scaled_packed_gibbs_matvec_builder(d, matvec_precision)
        panel_vjp = None
        if fused_bwd is None:
            fused_bwd = fused_matvec  # Pallas backward rides with the Pallas forward
        if fused_bwd:
            from nonstationary_precip_tpu.ops.pallas_matvec import (
                packed_gibbs_panel_vjp,
            )

            panel_vjp = packed_gibbs_panel_vjp(d)
        logp = lazy_cg_mll(
            self.raw_outputscale,
            aug,
            y,
            key,
            self.likelihood.noise,
            block=block,
            num_probes=num_probes,
            max_iters=max_iters,
            tol=tol,
            precond_rank=precond_rank,
            precond_key=precond_key,
            precond=precond,
            precond_shift=precond_shift,
            precond_lpc=precond_lpc,
            cross_fn=packed_gibbs_cross(d),
            matvec_builder=builder,
            panel_vjp=panel_vjp,
        )
        prior_term = self.prior.log_prob_matrixfree(
            x, self.log_ell, prior_pre,
            block=block, max_iters=prior_max_iters, tol=tol,
            precond_shift=prior_precond_shift,
        )
        return -(logp + prior_term) / n

    # -- prediction ---------------------------------------------------------

    def posterior(self, x_train, y_train, x_new, *, noiseless: bool = True) -> MVN:
        """Manual GP conditioning exactly as DiagonalExactGP.predict
        (nonstationary_models.py:45-62): lengthscales at x_new are the
        prior's conditional mean given the trained field; the predictive
        covariance gets the reference's +1e-4 I stabiliser."""
        n = y_train.shape[-1]
        ell1 = jnp.exp(self.log_ell)
        s2 = self.outputscale
        k_xx = s2 * gibbs_gram(x_train, ell1, x_train, ell1)
        ell2 = self.prior.conditional_mean(x_new, (x_train, ell1))
        k_ss = s2 * gibbs_gram(x_new, ell2, x_new, ell2)
        k_sx = s2 * gibbs_gram(x_new, ell2, x_train, ell1)

        a = k_xx + self.likelihood.noise * jnp.eye(n, dtype=k_xx.dtype)
        chol = safe_cholesky(a)
        mu = k_sx @ cho_solve(chol, y_train)
        v = tri_solve(chol, k_sx.T)
        sigma = k_ss - v.T @ v + 1e-4 * jnp.eye(k_ss.shape[-1], dtype=k_ss.dtype)
        if not noiseless:
            sigma = sigma + self.likelihood.noise * jnp.eye(sigma.shape[-1], dtype=sigma.dtype)
        return MVN(mu, sigma)

    def predictive(self, x_train, y_train, x_new) -> MVN:
        return self.posterior(x_train, y_train, x_new, noiseless=False)

    def posterior_matrixfree(
        self,
        x_train,
        y_train,
        x_new,
        prior_pre,
        *,
        noiseless: bool = True,
        block: int = 2048,
        max_iters: int = 64,
        tol: float = 1e-8,
        precond_rank: int = 150,
        precond_key=None,
        precond: str = "pivchol",
        precond_shift: float = 1.0,
        fused_matvec: bool = True,
    ) -> MVN:
        """:meth:`posterior` for LARGE N: the same manual-conditioning
        estimand, train Gram never materialised.  The lengthscale field at
        x_new comes from the prior's matrix-free conditional mean (reusing
        ``prior_pre``'s preconditioner factors — the conditioning Gram IS
        the prior Gram), then the train-side solves run as one
        preconditioned mBCG with 1+N* right-hand sides over the fused
        Gram·v matvec (``ops/lazy_cg.lazy_cg_posterior``).  Deterministic
        (no probes).  Footprint O(block·N + N·N*): chunk x_new for very
        large test sets.  Keeps the reference's +1e-4 I stabiliser on the
        predictive covariance (nonstationary_models.py:45-62).

        ``mbcg`` is a fixed-length scan (converged columns freeze but the
        matvecs keep running), so ``max_iters`` is paid in full every
        call — the rank-150/64-iteration defaults come from the on-chip
        convergence sweep (tools/probe_precond_chip.json: ≤ 30 iterations
        to 1e-6 at every probed N ≤ 65536; 64 leaves margin for the
        harder noiseless solve), replacing the old 512-iteration/rank-50
        budget that spent ~16× the needed matvecs."""
        from nonstationary_precip_tpu.kernels.gibbs import packed_gibbs_cross
        from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_posterior

        d = x_train.shape[-1]
        precond_rank = min(precond_rank, y_train.shape[-1])
        ell2 = self.prior.conditional_mean_matrixfree(
            x_new, (x_train, jnp.exp(self.log_ell)), prior_pre,
            block=block, max_iters=max_iters, tol=tol,
        )
        aug = jnp.concatenate([x_train, self.log_ell], axis=1)
        aug_new = jnp.concatenate([x_new, jnp.log(ell2)], axis=1)
        builder = None
        if fused_matvec:
            from nonstationary_precip_tpu.ops.pallas_matvec import (
                scaled_packed_gibbs_matvec_builder,
            )

            builder = scaled_packed_gibbs_matvec_builder(d)
        mean, cov = lazy_cg_posterior(
            self.raw_outputscale,
            aug,
            y_train,
            aug_new,
            self.likelihood.noise,
            block=block,
            max_iters=max_iters,
            tol=tol,
            precond_rank=precond_rank,
            precond_key=precond_key,
            precond=precond,
            precond_shift=precond_shift,
            cross_fn=packed_gibbs_cross(d),
            matvec_builder=builder,
        )
        cov = cov + 1e-4 * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        if not noiseless:
            cov = cov + self.likelihood.noise * jnp.eye(
                cov.shape[-1], dtype=cov.dtype
            )
        return MVN(mean, cov)

    def posterior_state_matrixfree(
        self,
        x_train,
        y_train,
        prior_pre,
        *,
        block: int = 2048,
        max_iters: int | None = None,
        tol: float = 1e-8,
        precond_rank: int = 150,
        precond: str = "pivchol",
        precond_key=None,
        precond_shift: float = 1.0,
        fused_matvec: bool = True,
        prior_max_iters: int = 64,
        chunk_iters: int | None = None,
        n_chunks: int = 8,
    ):
        """Once-per-fit serving state for the large-N posterior — the
        amortization :meth:`posterior_matrixfree` lacks (it re-ran a
        cold fixed-budget mBCG, a fresh preconditioner build AND the
        prior's conditioning solves on EVERY query batch; ~89 ms/test
        point at N = 131072, tools/bench_cg.json lazygpost rows).

        Hoists (a) ``α = (K + σ²I)⁻¹ y`` + the rank-``precond_rank``
        factor (``ops/lazy_cg.lazy_posterior_state``) and (b) the prior's
        per-dim conditioning solves for the lengthscale field at new
        points (``LogNormalProcess.conditional_pre_matrixfree``).  Feed
        to :meth:`posterior_matrixfree_from_state` per query batch.
        O(N·rank) memory, one-time cost ≈ one training step.

        ``chunk_iters`` (with ``n_chunks``) routes the α solve AND the
        prior's conditioning solves through the host-chunked drivers
        (``ops/lazy_cg.lazy_posterior_state_chunked``, DESIGN §27) — the
        ONLY way to build serving state past the ~60–90 s execution
        wall (N ≥ ~512k), and correct at any N."""
        from nonstationary_precip_tpu.kernels.gibbs import packed_gibbs_cross
        from nonstationary_precip_tpu.ops.lazy_cg import (
            lazy_posterior_state,
            lazy_posterior_state_chunked,
        )

        d = x_train.shape[-1]
        aug = jnp.concatenate([x_train, self.log_ell], axis=1)
        builder = None
        if fused_matvec:
            from nonstationary_precip_tpu.ops.pallas_matvec import (
                scaled_packed_gibbs_matvec_builder,
            )

            builder = scaled_packed_gibbs_matvec_builder(d)
        if chunk_iters is not None:
            st = lazy_posterior_state_chunked(
                self.raw_outputscale, aug, y_train, self.likelihood.noise,
                block=block, chunk_iters=chunk_iters, n_chunks=n_chunks,
                tol=tol,
                precond_rank=min(precond_rank, y_train.shape[-1]),
                precond=precond, precond_key=precond_key,
                precond_shift=precond_shift,
                cross_fn=packed_gibbs_cross(d), matvec_builder=builder,
            )
        else:
            st = lazy_posterior_state(
                self.raw_outputscale, aug, y_train, self.likelihood.noise,
                block=block, max_iters=max_iters, tol=tol,
                precond_rank=min(precond_rank, y_train.shape[-1]),
                precond=precond, precond_key=precond_key,
                precond_shift=precond_shift,
                cross_fn=packed_gibbs_cross(d), matvec_builder=builder,
            )
        cond = self.prior.conditional_pre_matrixfree(
            (x_train, jnp.exp(self.log_ell)), prior_pre,
            block=block, max_iters=prior_max_iters, tol=tol,
            chunk_iters=chunk_iters,
        )
        return st, cond

    def posterior_matrixfree_from_state(
        self,
        state,
        x_new,
        *,
        noiseless: bool = True,
        mean_only: bool = False,
        block: int = 2048,
        max_iters: int | None = None,
        tol: float = 1e-6,
        precond_shift: float = 1.0,
        fused_matvec: bool = True,
        return_info: bool = False,
        chunk_iters: int | None = None,
        n_chunks: int = 8,
    ):
        """:meth:`posterior_matrixfree` from a prebuilt state: per query
        batch only (a) one panel sweep for the conditional lengthscale
        field, (b) the (N, N*) cross build + one contraction for the
        mean, and — unless ``mean_only`` — (c) one preconditioned mBCG
        with N* right-hand sides at the auto budget (16 iters N ≤ 32768,
        32 above; the old path paid a flat 64 plus the mean solve plus
        the factor build).  ``mean_only=True`` returns the (N*,) mean
        with NO solve at all.  Same +1e-4 I stabiliser semantics.

        ``return_info=True`` appends the convergence-evidence dict from
        ``ops/lazy_cg.lazy_posterior_query`` (relres of the variance
        solves + the state's α-solve relres) — the auto budget is a
        fixed-length scan, so gate served output on ``relres_max``, not
        on faith (ADVICE r4)."""
        from nonstationary_precip_tpu.kernels.gibbs import packed_gibbs_cross
        from nonstationary_precip_tpu.ops.lazy_cg import (
            lazy_posterior_query,
            lazy_posterior_query_chunked,
        )

        st, cond = state
        d = x_new.shape[-1]
        x_train = st.x[:, :d]
        ell2 = self.prior.conditional_mean_from_pre(
            x_new, (x_train, None), cond, block=block
        )
        aug_new = jnp.concatenate([x_new, jnp.log(ell2)], axis=1)
        builder = None
        if fused_matvec:
            from nonstationary_precip_tpu.ops.pallas_matvec import (
                scaled_packed_gibbs_matvec_builder,
            )

            builder = scaled_packed_gibbs_matvec_builder(d)
        if chunk_iters is not None:
            # past-the-wall variance solves (DESIGN §27); the mean path
            # is solve-free either way
            out = lazy_posterior_query_chunked(
                st, aug_new, mean_only=mean_only, block=block,
                chunk_iters=chunk_iters, n_chunks=n_chunks, tol=tol,
                precond_shift=precond_shift,
                cross_fn=packed_gibbs_cross(d), matvec_builder=builder,
                return_info=return_info,
            )
        else:
            out = lazy_posterior_query(
                st, aug_new, mean_only=mean_only, block=block,
                max_iters=max_iters, tol=tol, precond_shift=precond_shift,
                cross_fn=packed_gibbs_cross(d), matvec_builder=builder,
                return_info=return_info,
            )
        info = None
        if return_info:
            mean, cov, info = out
        else:
            mean, cov = out
        if mean_only:
            return (mean, info) if return_info else mean
        cov = cov + 1e-4 * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        if not noiseless:
            cov = cov + self.likelihood.noise * jnp.eye(
                cov.shape[-1], dtype=cov.dtype
            )
        return (MVN(mean, cov), info) if return_info else MVN(mean, cov)

    def lengthscale_field(self, x_train, x_new=None):
        """Trained (or conditionally extended) lengthscale field, (N, D) —
        the quantity spatial_exp.py maps over the basin (:243-274)."""
        ell = jnp.exp(self.log_ell)
        if x_new is None:
            return ell
        return self.prior.conditional_mean(x_new, (x_train, ell))


# ---------------------------------------------------------------------------
# host-chunked MAP loss: the product surface for N past the execution wall
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _chunked_assemble_jit(d: int, include_prior: bool):
    """loss + model-pytree gradients from the chunked phase outputs — ONE
    jitted program per (d, prior?) (stable identity via lru_cache so fit
    loops never retrace across steps)."""
    import math

    @jax.jit
    def assemble(model, x, y, kg, xg, s2g, val, diff, alphas, logdet):
        n = x.shape[0]
        if include_prior:
            # prior log-prob (÷N, the reference's convention — priors/
            # lognormal_process.log_prob_matrixfree) from the chunked
            # per-dim solves: quad_d = diff_d · α_d, logdet the hoisted
            # constant
            quad = jnp.sum(diff * alphas, axis=1)  # (D,)
            lp = jnp.sum(
                -0.5 * (quad + logdet + n * math.log(2.0 * math.pi))
            ) / n
        else:
            lp = jnp.asarray(0.0, x.dtype)
        loss = -(val + lp) / n
        # d lp/d log_ell[:, dim] = −α_dim / n (exact at convergence —
        # the same linearised-at-the-solution pullback lazy_cg_quad's
        # custom VJP uses); fold into the aug cotangent, then pull the
        # whole thing back through the parameter transforms in one vjp
        xg_aug = xg.at[:, d:].add(-(alphas.T) / n)

        def heads(m):
            return (
                m.raw_outputscale,
                jnp.concatenate([x, m.log_ell], axis=1),
                m.likelihood.noise,
            )

        _, pull = jax.vjp(heads, model)
        (g,) = pull((kg, xg_aug, s2g))
        g = jax.tree.map(lambda t: (-1.0 / n) * t, g)
        return loss, g

    return assemble


@jax.jit
def _prior_prep(prior, x, log_ell):
    """Device-side prep for the chunked prior solves: sliced inputs,
    positive per-dim hypers, diff rows — one dispatch, not many."""
    xs = prior._slice(x)
    ell = positive(prior.raw_lengthscale)
    s2 = positive(prior.raw_outputscale)
    diff = log_ell.T - prior.mean(x).T  # (D, N)
    return xs, ell, s2, diff


class ChunkedMAPLoss:
    """Host-chunked :meth:`GibbsExactGP.loss_matrixfree` — the SAME MAP
    estimand (matrix-free MLL + frozen-prior log-prob, both ÷N) driven
    eagerly from the host so no single device program outlives the axon
    worker's ~60–90 s execution wall (DESIGN.md §27–28: the regime that
    trains N = 524288 at the full budget and N = 1,048,576 at all).

    Build once per fit via :func:`make_chunked_map_loss`; each
    ``value_and_grad(model, x, y, prior_pre, key)`` returns
    ``(loss, grads, info)`` with ``grads`` a model-pytree (feed optax
    directly — ``train/optim.fit_chunked`` does), and ``info`` carrying
    the convergence EVIDENCE (``relres_mll`` per RHS, ``relres_prior``
    per dim) that the monolithic path surfaces through
    ``lazy_cg_diagnostics``.  NOT jittable — it IS the orchestrator.

    This is the model-level surface for the reference's
    ``gpytorch.settings.max_cg_iterations``-at-any-N workflow
    (reference ``experiments/spatial_exp.py:199``) past one-program
    scale; see MIGRATION.md."""

    def __init__(self, d, mll_machinery, prior_solve, include_prior,
                 fused: bool):
        self._d = d
        self._mll = mll_machinery
        self._prior_solve = prior_solve
        self._include_prior = include_prior
        self.fused = fused

    def value_and_grad(self, model, x, y, prior_pre=None, key=None,
                       pkey=None, early_stop=True):
        from nonstationary_precip_tpu.priors.lognormal_process import (
            _COND_JITTER,
        )

        if key is None:
            key = jax.random.PRNGKey(0)
        d = self._d
        aug = jnp.concatenate([x, model.log_ell], axis=1)
        val, relres, (kg, xg, rg, s2g) = self._mll.value_and_grad(
            model.raw_outputscale, aug, y, model.likelihood.noise, key,
            pkey, early_stop=early_stop,
        )
        n = x.shape[0]
        if self._include_prior:
            if prior_pre is None:
                raise ValueError(
                    "ChunkedMAPLoss was built with include_prior=True — "
                    "pass prior_pre (GibbsExactGP.prior_pre_matrixfree, "
                    "hoisted once per fit)"
                )
            lpc, logdet = prior_pre
            xs, ell, s2p, diff = _prior_prep(model.prior, x, model.log_ell)
            jitter = jnp.asarray(_COND_JITTER, x.dtype)
            alphas, rr_prior = [], []
            for dim in range(diff.shape[0]):
                sol, rr = self._prior_solve(
                    (ell[dim], s2p[dim]), xs, diff[dim][:, None], jitter,
                    lpc[dim], early_stop=early_stop,
                )
                alphas.append(sol[:, 0])
                rr_prior.append(rr[0])
            alphas = jnp.stack(alphas)
            rr_prior = jnp.stack(rr_prior)
        else:
            dd = model.log_ell.shape[1]
            alphas = jnp.zeros((dd, n), x.dtype)
            diff = jnp.zeros((dd, n), x.dtype)
            logdet = jnp.zeros((dd,), x.dtype)
            rr_prior = jnp.zeros((dd,), x.dtype)
        loss, grads = _chunked_assemble_jit(d, self._include_prior)(
            model, x, y, kg, xg, s2g, val, diff, alphas, logdet
        )
        info = {
            "mll": val,
            "relres_mll": relres,
            "relres_prior": rr_prior,
            "relres_max": jnp.maximum(
                jnp.max(relres),
                jnp.max(rr_prior) if self._include_prior else 0.0,
            ),
        }
        return loss, grads, info


def make_chunked_map_loss(
    d: int,
    *,
    block: int = 2048,
    num_probes: int = 8,
    chunk_iters: int = 8,
    n_chunks: int = 4,
    tol: float = 1e-6,
    precond_rank: int = 1024,
    precond: str = "nystrom",
    precond_shift: float = 10.0,
    include_prior: bool = True,
    prior_chunk_iters: int = 8,
    prior_n_chunks: int = 8,
    prior_precond_shift: float = 1.0,
    fused_matvec: bool = True,
    matvec_precision: str = "highest",
    bwd_row_chunks: int = 1,
) -> ChunkedMAPLoss:
    """Build a :class:`ChunkedMAPLoss` for d-dimensional inputs.

    Defaults are the measured flagship large-N configuration
    (tools/bench_cg.json ``chunked-lazygnys`` rows: Nyström rank 1024,
    shift 10, 8-iteration chunks — the config that trains N = 1,048,576
    on one chip).  ``chunk_iters × n_chunks`` is the TOTAL mBCG budget;
    size ``chunk_iters`` so one chunk program (≈ chunk_iters O(N²)
    matvecs) stays under the ~60–90 s wall at your N.  For N below the
    wall prefer :meth:`GibbsExactGP.loss_matrixfree` (one compiled
    program per step, jit/scan-able).

    ``fused_matvec=False`` (or CPU) runs the jnp panel paths throughout
    — same estimator, Mosaic-free.  The prior solves always use jnp
    panels (the per-dim stationary Gram is write-roofline cheap for
    XLA; the fused SE kernel measured SLOWER, DESIGN §15)."""
    from nonstationary_precip_tpu.kernels.gibbs import packed_gibbs_cross
    from nonstationary_precip_tpu.ops.lazy_cg import (
        make_chunked_mll,
        make_chunked_solve,
    )
    from nonstationary_precip_tpu.priors.lognormal_process import _dim_cross

    builder = None
    panel_vjp = None
    panel_vjp_rows = None
    if fused_matvec:
        from nonstationary_precip_tpu.ops.pallas_matvec import (
            packed_gibbs_panel_vjp,
            packed_gibbs_panel_vjp_rows,
            scaled_packed_gibbs_matvec_builder,
        )

        builder = scaled_packed_gibbs_matvec_builder(d, matvec_precision)
        panel_vjp = packed_gibbs_panel_vjp(d)
        if bwd_row_chunks > 1:
            # past ~1.5M rows even ONE backward sweep crosses the
            # execution wall — split it into host-driven row blocks
            panel_vjp_rows = packed_gibbs_panel_vjp_rows(d)
    elif bwd_row_chunks > 1:
        raise ValueError(
            "bwd_row_chunks > 1 needs the fused (Mosaic) backward — "
            "there is no jnp row-block sweep (and no CPU needs one: the "
            "wall is an axon TPU property)"
        )
    mll = make_chunked_mll(
        block=block, num_probes=num_probes, chunk_iters=chunk_iters,
        n_chunks=n_chunks, tol=tol, precond_rank=precond_rank,
        precond=precond, precond_shift=precond_shift,
        cross_fn=packed_gibbs_cross(d), matvec_builder=builder,
        panel_vjp=panel_vjp,
        panel_vjp_rows=panel_vjp_rows,
        bwd_row_chunks=bwd_row_chunks,
    )
    prior_solve = make_chunked_solve(
        block, prior_chunk_iters, prior_n_chunks, tol, _dim_cross, None,
        prior_precond_shift,
    )
    return ChunkedMAPLoss(d, mll, prior_solve, include_prior, fused_matvec)


def gibbs_map_loss_batched(models, x, y, prior_pre):
    """Per-split MAP losses for a STACKED (leading T axis) GibbsExactGP
    pytree — the hand-batched form of ``jax.vmap(lambda m: m.loss(...))``
    used by the 10-split spatial benchmark
    (/root/reference/experiments/spatial_exp.py:197-210 at 10-split
    scale).

    On TPU for eligible stacks the (chol, inv) pair comes from the ONE
    3-level batched Pallas launch (``chol_inv_batched_safe``), and its
    exported L⁻¹ turns every surrounding solve into batched GEMMs:
    α = L⁻¹y is one (T,N,N)×(T,N,1) matmul, and the MLL pullback
    (½(ααᵀ − K⁻¹), K⁻¹ = L⁻ᵀL⁻¹) runs through the kernel's matmul-only
    custom VJP — no triangular solves, no refactorisation.  A vmapped
    ``jax.vmap`` of a single-matrix Pallas kernel would instead serialise
    the batch over a grid (measured 332 vs 874 steps/s, DESIGN.md §10).

    Ineligible shapes/backends fall back to exactly the per-split
    ``GibbsExactGP.loss`` under vmap (same numbers as today).

    Returns the per-split loss vector (T,).
    """
    import math

    from nonstationary_precip_tpu.ops.pallas_chol import (
        chol_inv_batched_safe,
        gibbs_b_eligible,
    )

    n = y.shape[-1]
    ell = jnp.exp(models.log_ell)  # (T, N, D)
    s2 = positive(models.raw_outputscale)  # (T,)
    noise = models.likelihood.noise  # (T,)
    gram_b = jax.vmap(lambda xx, ee: gibbs_gram(xx, ee, xx, ee))
    eye = jnp.eye(n, dtype=y.dtype)
    k = s2[:, None, None] * gram_b(x, ell) + noise[:, None, None] * eye

    if gibbs_b_eligible(k):
        l, li = chol_inv_batched_safe(k)
        alpha = jnp.einsum("tij,tj->ti", li, y)
        quad = jnp.sum(alpha * alpha, axis=-1)
        logdet = 2.0 * jnp.sum(jnp.log(diag_part(l)), axis=-1)
        logp = -0.5 * (quad + logdet + n * math.log(2.0 * math.pi))
        prior_term = jax.vmap(
            lambda m, xx, pc: m.prior.log_prob(xx, m.log_ell, pc)
        )(models, x, prior_pre)
        return -(logp + prior_term) / n

    return jax.vmap(lambda m, xx, yy, pc: m.loss(xx, yy, pc))(
        models, x, y, prior_pre
    )


def gibbs_sparse_sharded_loss(mesh):
    """Mesh-sharded collapsed bound for GibbsSparseGP: train rows sharded,
    M-sized collectives only (parallel/sharded_sgpr.py).  The latent-field
    prior term is parameter-only, so it is added outside the shard_map.
    The Titsias trace residual follows the model's ``scale_correction``
    flag exactly as the dense ``GibbsSparseGP.loss`` does (the Gibbs prior
    diag is identically 1 before scaling).

    Returns loss(model, x_sharded, y_sharded)."""
    from nonstationary_precip_tpu.parallel.sharded_sgpr import sharded_sgpr_loss

    def root_fn(model, x_s):
        root_u, _ = model._roots(x_s)
        return jnp.sqrt(model.outputscale) * root_u

    def trace_fn(model, x_s, root):
        q_scaled = jnp.sum(root * root, axis=-1)
        if model.scale_correction:
            # scaled semantics: s²·(1 − q_u) = s² − q_scaled
            return model.outputscale - q_scaled
        # reference quirk: unscaled base-kernel term, 1 − q_u
        return 1.0 - q_scaled / model.outputscale

    base = sharded_sgpr_loss(root_fn, trace_fn, mesh)

    def loss(model, x_sharded, y_sharded):
        n = y_sharded.shape[-1]
        prior_term = model.prior.log_prob(model.z, model.log_ell_z)
        return base(model, x_sharded, y_sharded) - prior_term / n

    return loss


@pytree_dataclass(static=("scale_correction",))
class GibbsSparseGP:
    """Sparse (SGPR / Titsias collapsed-bound) Gibbs GP with the latent
    log-lengthscale field at M inducing points.

    ``scale_correction=False`` replicates the reference quirk in which the
    added diagonal loss term is computed on the *unscaled* base kernel
    (the Scale wrapper sits outside InducingGibbsKernel, so GPyTorch's
    added-loss harvesting never sees the outputscale;
    gibbs_kernels.py:241-261).  Set True for the mathematically consistent
    bound.
    """

    prior: LogNormalProcess
    likelihood: GaussianLikelihood
    raw_outputscale: jnp.ndarray
    z: jnp.ndarray  # (M, D) inducing inputs
    log_ell_z: jnp.ndarray  # (M, D) latent field at z
    scale_correction: bool = False

    @classmethod
    def create(cls, z, prior: LogNormalProcess, noise=None, outputscale=1.0, dtype=jnp.float32):
        z = jnp.asarray(z, dtype=dtype)
        return cls(
            prior=prior,
            likelihood=GaussianLikelihood.create(noise, dtype=dtype),
            raw_outputscale=raw_init(jnp.asarray(outputscale, dtype=dtype)),
            z=z,
            log_ell_z=prior.init_log_field(z).astype(dtype),
        )

    @property
    def outputscale(self):
        return positive(self.raw_outputscale)

    def trainable(self, train_noise=False, train_scale=False, train_z=True):
        return trainable_mask(self, _scale_mask(train_noise, train_scale, train_z))

    def _roots(self, x):
        """Nyström root R (N, M) of the *unscaled* Gibbs kernel plus the
        conditioned lengthscales at x."""
        ell_z = jnp.exp(self.log_ell_z)
        ell_x = self.prior.conditional_mean(x, (self.z, ell_z))
        k_xz = gibbs_gram(x, ell_x, self.z, ell_z)
        k_zz = gibbs_gram(self.z, ell_z, self.z, ell_z)
        root, _ = nystrom_root(k_xz, k_zz)
        return root, ell_x

    # -- objective ----------------------------------------------------------

    def loss(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """−(log N(y; 0, s²RRᵀ + σ²I) + added_term + prior_logprob)/N via
        Woodbury — never materialises the N×N covariance."""
        n = y.shape[-1]
        noise = self.likelihood.noise
        s2 = self.outputscale
        root_u, _ = self._roots(x)  # (N, M), unscaled
        root = jnp.sqrt(s2) * root_u

        a = root.T / jnp.sqrt(noise)  # (M, N)
        b = jnp.eye(a.shape[0], dtype=a.dtype) + a @ a.T
        lb = safe_cholesky(b)
        ay = a @ y / jnp.sqrt(noise)  # (M,)
        w = tri_solve(lb, ay)
        quad = (y @ y) / noise - w @ w
        logdet = n * jnp.log(noise) + 2.0 * jnp.sum(jnp.log(diag_part(lb)))
        logp = -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi).astype(y.dtype))

        # Titsias trace term; Gibbs diag is identically 1 (unscaled).
        q_diag_u = jnp.sum(root_u * root_u, axis=-1)
        if self.scale_correction:
            added = -0.5 * jnp.sum(s2 * (1.0 - q_diag_u)) / noise
        else:
            added = -0.5 * jnp.sum(1.0 - q_diag_u) / noise

        prior_term = self.prior.log_prob(self.z, self.log_ell_z)
        return -(logp + added + prior_term) / n

    # -- prediction ---------------------------------------------------------

    def posterior(self, x_train, y_train, x_new, *, noiseless: bool = True) -> MVN:
        """SGPR predictive (Titsias): exact marginals, low-rank joint —
        the B = I + AAᵀ algebra of nonstationary_models.py:91-153 with the
        SGPR diagonal correction of gibbs_kernels.py:222-232."""
        noise = self.likelihood.noise
        s = jnp.sqrt(self.outputscale)
        root_x_u, _ = self._roots(x_train)
        root_s_u, _ = self._roots(x_new)
        root_x = s * root_x_u  # (N, M)
        root_s = s * root_s_u  # (N*, M)

        a = root_x.T / jnp.sqrt(noise)
        b = jnp.eye(a.shape[0], dtype=a.dtype) + a @ a.T
        lb = safe_cholesky(b)

        ay = a @ y_train / jnp.sqrt(noise)
        mean = root_s @ cho_solve(lb, ay)

        # covar = K̃** − L(I − B⁻¹)Lᵀ = diag_corr + L B⁻¹ Lᵀ
        v = tri_solve(lb, root_s.T)  # (M, N*)
        cov = v.T @ v
        corr = jnp.clip(self.outputscale * 1.0 - jnp.sum(root_s * root_s, axis=-1), 0.0, None)
        cov = cov + jnp.diag(corr)
        if not noiseless:
            cov = cov + noise * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        return MVN(mean, cov)

    def predictive(self, x_train, y_train, x_new) -> MVN:
        return self.posterior(x_train, y_train, x_new, noiseless=False)
