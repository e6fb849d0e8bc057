"""BBMM (batched CG + SLQ + pivoted-Cholesky preconditioning) tests.

Oracle strategy (SURVEY.md §4): dense linear-algebra ground truth from
jnp (cho_solve / slogdet) on matrices small enough to be exact; the
stochastic logdet/trace estimators are checked with fixed seeds against
statistical tolerances, plus a deterministic exactness case (rank = N
pivoted Cholesky; CG run to N iterations on a well-conditioned system).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonstationary_precip_tpu.ops.bbmm import (
    cg_mll,
    lanczos_logdet,
    mbcg,
    pivoted_cholesky,
    precond_logdet,
    woodbury_precond,
)


def _rbf_psd(n, d=2, ell=0.7, noise=0.05, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    k = np.exp(-0.5 * sq / ell**2) + noise * np.eye(n)
    return jnp.asarray(k, dtype), noise


class TestMBCG:
    def test_solves_match_cholesky(self):
        k, _ = _rbf_psd(200, seed=1)
        rng = np.random.default_rng(2)
        b = jnp.asarray(rng.normal(size=(200, 4)))
        res = mbcg(lambda v: k @ v, b, max_iters=400, tol=1e-12)
        ref = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(k, lower=True), b
        )
        assert float(jnp.max(jnp.abs(res.x - ref))) < 1e-8

    def test_fixed_length_scan_masks_converged_columns(self):
        # one easy RHS (converges fast) + one generic: the easy column's
        # solution must not drift after convergence
        k, _ = _rbf_psd(100, seed=3)
        e0 = jnp.zeros((100,)).at[0].set(1.0)
        b = jnp.stack([k @ e0, jnp.ones((100,))], axis=1)
        res = mbcg(lambda v: k @ v, b, max_iters=300, tol=1e-10)
        assert float(jnp.max(jnp.abs(res.x[:, 0] - e0))) < 1e-7
        assert int(res.iters[0]) < int(res.iters[1])

    def test_resnorm_history_is_consistent(self):
        # the (T, R) relative-residual history (convergence probes read
        # it): last row == the returned final residnorm, frozen columns
        # hold their value, and the entry at iters-1 is below tol
        k, _ = _rbf_psd(150, seed=7)
        rng = np.random.default_rng(8)
        b = jnp.asarray(rng.normal(size=(150, 3)))
        res = mbcg(lambda v: k @ v, b, max_iters=250, tol=1e-9)
        hist = np.asarray(res.resnorm_hist)
        assert hist.shape == (250, 3)
        np.testing.assert_allclose(hist[-1], np.asarray(res.residnorm), rtol=1e-6)
        for j, it in enumerate(np.asarray(res.iters)):
            assert it < 250  # converged
            assert hist[it - 1, j] < 1e-9
            # frozen after convergence
            np.testing.assert_allclose(hist[it - 1 :, j], hist[-1, j], rtol=1e-6)

    def test_preconditioner_cuts_iterations(self):
        # low-rank-plus-noise structure: exactly what pivoted Cholesky captures
        n = 300
        rng = np.random.default_rng(4)
        u = rng.normal(size=(n, 5))
        k = jnp.asarray(u @ u.T * 10.0 + 0.1 * np.eye(n))
        b = jnp.asarray(rng.normal(size=(n, 3)))
        plain = mbcg(lambda v: k @ v, b, max_iters=200, tol=1e-8)
        lpc, _ = pivoted_cholesky(k - 0.1 * jnp.eye(n), rank=8)
        pre = mbcg(
            lambda v: k @ v,
            b,
            max_iters=200,
            tol=1e-8,
            precond=woodbury_precond(lpc, 0.1),
        )
        assert int(jnp.max(pre.iters)) < int(jnp.max(plain.iters))
        ref = jnp.linalg.solve(k, b)
        assert float(jnp.max(jnp.abs(pre.x - ref))) < 1e-5

    def test_jit_and_grad_free(self):
        k, _ = _rbf_psd(64, seed=5, dtype=jnp.float32)
        b = jnp.ones((64, 2), jnp.float32)
        out = jax.jit(lambda kk, bb: mbcg(lambda v: kk @ v, bb, 64).x)(k, b)
        assert out.shape == (64, 2)


class TestSLQ:
    def test_logdet_unpreconditioned(self):
        k, _ = _rbf_psd(150, noise=0.3, seed=6)
        key = jax.random.PRNGKey(0)
        probes = jax.random.rademacher(key, (150, 64), dtype=k.dtype)
        res = mbcg(lambda v: k @ v, probes, max_iters=150, tol=1e-10)
        est = lanczos_logdet(
            res.alphas, res.betas, jnp.sum(probes * probes, axis=0)
        )
        exact = jnp.linalg.slogdet(k)[1]
        # 64 Rademacher probes on a well-conditioned matrix: few-percent
        assert abs(float(est - exact)) < 0.05 * abs(float(exact)) + 1.0

    def test_logdet_preconditioned_ill_conditioned(self):
        # low-rank + small noise: plain SLQ at 40 iters struggles; the
        # preconditioned estimate must land within tolerance
        n = 250
        rng = np.random.default_rng(7)
        u = rng.normal(size=(n, 6))
        noise = 0.01
        k = jnp.asarray(u @ u.T * 5.0 + noise * np.eye(n))
        exact = jnp.linalg.slogdet(k)[1]
        lpc, _ = pivoted_cholesky(k - noise * jnp.eye(n), rank=10)
        minv = woodbury_precond(lpc, noise)
        key = jax.random.PRNGKey(1)
        from nonstationary_precip_tpu.ops.bbmm import sample_precond_probes

        probes = sample_precond_probes(key, lpc, noise, 64)
        res = mbcg(lambda v: k @ v, probes, max_iters=40, tol=1e-12, precond=minv)
        w = jnp.sum(probes * minv(probes), axis=0)
        est = precond_logdet(lpc, noise, n) + lanczos_logdet(
            res.alphas, res.betas, w
        )
        assert abs(float(est - exact)) < 0.05 * abs(float(exact)) + 1.0


class TestPivotedCholesky:
    def test_exact_at_full_rank(self):
        k, _ = _rbf_psd(20, noise=0.5, seed=8)
        l, _ = pivoted_cholesky(k, rank=20)
        assert float(jnp.max(jnp.abs(l @ l.T - k))) < 1e-8

    def test_error_decreases_with_rank(self):
        n = 120
        rng = np.random.default_rng(9)
        u = rng.normal(size=(n, 4))
        k = jnp.asarray(u @ u.T + 0.05 * np.eye(n))
        errs = []
        for r in (1, 4, 8):
            l, _ = pivoted_cholesky(k, rank=r)
            errs.append(float(jnp.linalg.norm(l @ l.T - k)))
        assert errs[0] > errs[1] > errs[2]
        # rank ≥ true rank: only the diagonal noise remains
        assert errs[2] < 0.1 * errs[0]


class TestCGMLL:
    def test_value_matches_dense(self):
        k64, noise = _rbf_psd(200, noise=0.2, seed=10)
        rng = np.random.default_rng(11)
        y = jnp.asarray(rng.normal(size=(200,)))
        exact = (
            -0.5 * y @ jnp.linalg.solve(k64, y)
            - 0.5 * jnp.linalg.slogdet(k64)[1]
            - 0.5 * 200 * jnp.log(2 * jnp.pi)
        )
        val = cg_mll(
            k64,
            y,
            jax.random.PRNGKey(2),
            jnp.asarray(noise),
            num_probes=32,
            max_iters=200,
            tol=1e-10,
        )
        assert abs(float(val - exact)) < 0.02 * abs(float(exact)) + 1.0

    def test_value_preconditioned(self):
        k64, noise = _rbf_psd(200, noise=0.05, seed=12)
        rng = np.random.default_rng(13)
        y = jnp.asarray(rng.normal(size=(200,)))
        exact = (
            -0.5 * y @ jnp.linalg.solve(k64, y)
            - 0.5 * jnp.linalg.slogdet(k64)[1]
            - 0.5 * 200 * jnp.log(2 * jnp.pi)
        )
        val = cg_mll(
            k64,
            y,
            jax.random.PRNGKey(3),
            jnp.asarray(noise),
            num_probes=32,
            max_iters=120,
            tol=1e-10,
            precond_rank=10,
        )
        assert abs(float(val - exact)) < 0.02 * abs(float(exact)) + 1.0

    def test_grad_solve_term_exact_and_trace_term_statistical(self):
        k64, noise = _rbf_psd(150, noise=0.3, seed=14)
        rng = np.random.default_rng(15)
        y = jnp.asarray(rng.normal(size=(150,)))
        gk, gy = jax.grad(
            lambda kk, yy: cg_mll(
                kk,
                yy,
                jax.random.PRNGKey(4),
                jnp.asarray(noise),
                num_probes=128,
                max_iters=150,
                tol=1e-10,
            ),
            argnums=(0, 1),
        )(k64, y)
        kinv = jnp.linalg.inv(k64)
        alpha = kinv @ y
        # y-gradient is deterministic: −K⁻¹y
        assert float(jnp.max(jnp.abs(gy + alpha))) < 1e-6
        # K-gradient: ½ααᵀ − ½K⁻¹ up to Hutchinson noise (128 probes)
        gk_exact = 0.5 * jnp.outer(alpha, alpha) - 0.5 * kinv
        rel = float(
            jnp.linalg.norm(gk - gk_exact) / jnp.linalg.norm(gk_exact)
        )
        assert rel < 0.35

    def test_trains_a_gp_hyperparameter(self):
        # one-parameter sanity: optimising the outputscale via cg_mll moves
        # it toward the dense-MLL optimum direction
        n = 120
        rng = np.random.default_rng(16)
        x = rng.normal(size=(n, 2))
        sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        base = jnp.asarray(np.exp(-0.5 * sq / 0.7**2))
        y = jnp.asarray(rng.normal(size=(n,)))
        noise = jnp.asarray(0.1)

        def mk(log_s):
            return jnp.exp(log_s) * base + noise * jnp.eye(n)

        def dense_mll(log_s):
            k = mk(log_s)
            return (
                -0.5 * y @ jnp.linalg.solve(k, y)
                - 0.5 * jnp.linalg.slogdet(k)[1]
            )

        def cg_mll_s(log_s):
            return cg_mll(
                mk(log_s), y, jax.random.PRNGKey(5), noise,
                num_probes=64, max_iters=120, tol=1e-10,
            )

        g_dense = float(jax.grad(dense_mll)(jnp.asarray(0.3)))
        g_cg = float(jax.grad(cg_mll_s)(jnp.asarray(0.3)))
        assert np.sign(g_dense) == np.sign(g_cg)
        assert abs(g_cg - g_dense) < 0.3 * abs(g_dense) + 0.5


@pytest.mark.parametrize("precond_rank", [0, 8])
def test_exact_gp_cg_solver_path(precond_rank):
    """End-to-end: ExactGP.mll via the CG solver matches the Cholesky path."""
    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models.exact_gp import ExactGP

    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(size=(150, 2)), jnp.float64)
    y = jnp.asarray(rng.normal(size=(150,)), jnp.float64)
    model = ExactGP.create(
        Scale.create(RBF.create(ard_dims=2, dtype=jnp.float64), dtype=jnp.float64),
        noise=0.2,
        dtype=jnp.float64,
    )
    direct = float(model.mll(x, y))
    cg = float(
        model.mll(
            x,
            y,
            solver="cg",
            key=jax.random.PRNGKey(6),
            num_probes=32,
            max_iters=150,
            precond_rank=precond_rank,
        )
    )
    assert abs(cg - direct) < 0.02 * abs(direct) + 0.05


def test_exact_gp_rejects_unknown_solver():
    """A typo'd solver must raise, not silently fall back to Cholesky."""
    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models.exact_gp import ExactGP

    rng = np.random.default_rng(18)
    x = jnp.asarray(rng.normal(size=(20, 2)), jnp.float64)
    y = jnp.asarray(rng.normal(size=(20,)), jnp.float64)
    model = ExactGP.create(
        Scale.create(RBF.create(ard_dims=2, dtype=jnp.float64), dtype=jnp.float64),
        noise=0.2,
        dtype=jnp.float64,
    )
    for bad in ("CG", "bbmm", "cholesky"):
        with pytest.raises(ValueError, match="solver"):
            model.mll(x, y, solver=bad)


def test_grad_trace_term_unbiased_with_preconditioner():
    """With N(0, P) probes the K-gradient's trace estimator must pair
    K⁻¹z with P⁻¹z (E[z (P⁻¹z)ᵀ] = I); pairing with z itself would leave
    an O(1) K⁻¹(P−K) bias that many probes cannot remove."""
    k64, noise = _rbf_psd(150, noise=0.3, seed=21)
    rng = np.random.default_rng(22)
    y = jnp.asarray(rng.normal(size=(150,)))
    gk = jax.grad(
        lambda kk: cg_mll(
            kk,
            y,
            jax.random.PRNGKey(7),
            jnp.asarray(noise),
            num_probes=256,
            max_iters=150,
            tol=1e-10,
            precond_rank=12,
        )
    )(k64)
    kinv = jnp.linalg.inv(k64)
    alpha = kinv @ y
    gk_exact = 0.5 * jnp.outer(alpha, alpha) - 0.5 * kinv
    rel = float(jnp.linalg.norm(gk - gk_exact) / jnp.linalg.norm(gk_exact))
    assert rel < 0.35


@pytest.mark.parametrize("precond_rank", [0, 8])
def test_exact_gp_cg_posterior_matches_cholesky(precond_rank):
    """CG prediction is deterministic (no logdet → no probes): at tight CG
    tolerance the posterior must match the Cholesky path to solver
    accuracy, mean AND covariance, noiseless and predictive."""
    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models.exact_gp import ExactGP

    rng = np.random.default_rng(25)
    x = jnp.asarray(rng.normal(size=(180, 2)), jnp.float64)
    y = jnp.asarray(rng.normal(size=(180,)), jnp.float64)
    xs = jnp.asarray(rng.normal(size=(40, 2)), jnp.float64)
    model = ExactGP.create(
        Scale.create(RBF.create(ard_dims=2, dtype=jnp.float64), dtype=jnp.float64),
        noise=0.2,
        dtype=jnp.float64,
    )
    ref = model.posterior(x, y, xs)
    cg = model.posterior(
        x, y, xs, solver="cg", max_iters=300, tol=1e-12,
        precond_rank=precond_rank,
    )
    assert float(jnp.max(jnp.abs(cg.mean - ref.mean))) < 1e-7
    assert float(jnp.max(jnp.abs(cg.cov - ref.cov))) < 1e-7
    pref = model.predictive(x, y, xs)
    pcg = model.predictive(x, y, xs, solver="cg", max_iters=300, tol=1e-12)
    assert float(jnp.max(jnp.abs(pcg.cov - pref.cov))) < 1e-7


def test_exact_gp_cg_posterior_poisons_on_breakdown():
    """An indefinite train Gram must NaN the CG posterior, not return a
    plausibly wrong field."""
    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models.exact_gp import ExactGP

    rng = np.random.default_rng(26)
    x = jnp.asarray(rng.normal(size=(60, 2)), jnp.float64)
    y = jnp.asarray(rng.normal(size=(60,)), jnp.float64)
    xs = jnp.asarray(rng.normal(size=(10, 2)), jnp.float64)
    rbf = Scale.create(RBF.create(ard_dims=2, dtype=jnp.float64), dtype=jnp.float64)

    class IndefiniteKernel:
        """RBF minus a large ridge: k_xx + σ²I is indefinite."""

        def __call__(self, x1, x2=None):
            k = rbf(x1, x2)
            if x2 is None or x2 is x1:
                k = k - 1.5 * jnp.eye(x1.shape[0], dtype=k.dtype)
            return k

    model = ExactGP.create(IndefiniteKernel(), noise=0.05, dtype=jnp.float64)
    post = model.posterior(x, y, xs, solver="cg", max_iters=60, tol=1e-12)
    assert not bool(jnp.all(jnp.isfinite(post.mean)))


def test_cg_breakdown_surfaces_not_silently_frozen():
    """An indefinite kmat must surface (broke flag → NaN mll), not train on
    a silently corrupted logdet/solve."""
    k, noise = _rbf_psd(60, noise=0.05, seed=23)
    k_indef = k - 1.5 * jnp.eye(60)  # definitely indefinite
    rng = np.random.default_rng(24)
    probes = jnp.asarray(np.sign(rng.normal(size=(60, 8))))
    res = mbcg(lambda v: k_indef @ v, probes, max_iters=60, tol=1e-12)
    assert bool(jnp.any(res.broke))

    y = jnp.asarray(rng.normal(size=(60,)))
    val = cg_mll(
        k_indef, y, jax.random.PRNGKey(9), jnp.asarray(noise),
        num_probes=8, max_iters=60, tol=1e-12,
    )
    assert not np.isfinite(float(val))

    # and the SPD case: no breakdown, finite and accurate logdet
    probes32 = jnp.asarray(np.sign(rng.normal(size=(60, 32))))
    res_ok = mbcg(lambda v: k @ v, probes32, max_iters=120, tol=1e-12)
    assert not bool(jnp.any(res_ok.broke))
    val_ok = lanczos_logdet(
        res_ok.alphas, res_ok.betas, jnp.sum(probes32 * probes32, axis=0)
    )
    exact = float(jnp.linalg.slogdet(k)[1])
    assert np.isfinite(float(val_ok))
    assert abs(float(val_ok) - exact) < 0.1 * abs(exact) + 1.0
