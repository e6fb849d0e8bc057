"""Model-level matrix-free Gibbs MAP training (GibbsExactGP.loss_matrixfree)
vs the dense oracles.

Covers the three new pieces end-to-end:
  * ``lazy_cg_quad``       — exact-at-convergence quadratic + pullback,
  * ``lazy_slq_logdet``    — hoisted frozen-operator logdet estimate,
  * ``LogNormalProcess.{gram_pre_lazy, log_prob_matrixfree}`` and
    ``GibbsExactGP.loss_matrixfree`` — the same MAP estimand as the dense
    ``loss`` with no N×N residency (data OR prior Gram).

With ``precond_rank=0`` and the same key the matrix-free MLL term is
bit-compatible with the dense ``ops/bbmm.cg_mll`` (test_lazy_cg.py), so
the full-loss check here composes that dense estimator with the exact
prior term and compares values AND gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from nonstationary_precip_tpu.kernels.gibbs import (
    gibbs_gram_reference,
    packed_gibbs_cross,
)
from nonstationary_precip_tpu.models.gibbs_gp import GibbsExactGP
from nonstationary_precip_tpu.ops.bbmm import cg_mll
from nonstationary_precip_tpu.ops.lazy_cg import (
    lazy_cg_quad,
    lazy_pivoted_cholesky,
    lazy_slq_logdet,
)
from nonstationary_precip_tpu.priors.lognormal_process import (
    _COND_JITTER,
    LogNormalProcess,
    _dim_cross,
)
from nonstationary_precip_tpu.utils.transforms import positive


def _xy(n=160, d=2, seed=7, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-2, 2, size=(n, d)), dtype)
    y = jnp.asarray(
        np.sin(2 * np.asarray(x[:, 0])) + 0.1 * rng.normal(size=n), dtype
    )
    return x, y


def _prior(dtype=jnp.float64):
    return LogNormalProcess.create(
        2, mean=float(np.log(0.3)), outputscale=1.0, lengthscale=1.3, dtype=dtype
    )


def test_packed_gibbs_cross_scales():
    x, _ = _xy(n=48)
    rng = np.random.default_rng(3)
    le = jnp.asarray(rng.normal(scale=0.2, size=x.shape), jnp.float64)
    aug = jnp.concatenate([x, le], axis=1)
    raw = jnp.asarray(0.4, jnp.float64)
    got = packed_gibbs_cross(2)(raw, aug[:20], aug)
    want = positive(raw) * gibbs_gram_reference(
        x[:20], jnp.exp(le[:20]), x, jnp.exp(le)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)
    got_u = packed_gibbs_cross(2)(None, aug[:20], aug)
    np.testing.assert_allclose(
        np.asarray(got_u), np.asarray(want / positive(raw)), rtol=1e-12
    )


def test_lazy_cg_quad_value_and_grad_match_dense():
    x, _ = _xy(n=192)
    params = (jnp.asarray([1.3, 1.3], jnp.float64), jnp.asarray(1.0, jnp.float64))
    rng = np.random.default_rng(11)
    diff = jnp.asarray(rng.normal(size=192), jnp.float64)
    jitter = jnp.asarray(_COND_JITTER, jnp.float64)
    lpc = lazy_pivoted_cholesky(params, x, 16, cross_fn=_dim_cross)

    def quad_mf(dv):
        return lazy_cg_quad(
            params, x, dv, jitter, lpc=lpc, block=64,
            max_iters=400, tol=1e-13, cross_fn=_dim_cross,
        )

    k = _dim_cross(params, x, x) + jitter * jnp.eye(192, dtype=jnp.float64)
    sol = jnp.linalg.solve(k, diff)
    q_dense = float(diff @ sol)
    q_mf, g_mf = jax.value_and_grad(quad_mf)(diff)
    np.testing.assert_allclose(float(q_mf), q_dense, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g_mf), np.asarray(2.0 * sol), rtol=1e-6)


def test_lazy_slq_logdet_tracks_dense():
    x, _ = _xy(n=192)
    params = (jnp.asarray([1.3, 1.3], jnp.float64), jnp.asarray(1.0, jnp.float64))
    jitter = jnp.asarray(_COND_JITTER, jnp.float64)
    lpc = lazy_pivoted_cholesky(params, x, 24, cross_fn=_dim_cross)
    est = lazy_slq_logdet(
        params, x, jax.random.PRNGKey(2), jitter, lpc=lpc, block=64,
        num_probes=32, max_iters=300, tol=1e-12, cross_fn=_dim_cross,
    )
    k = _dim_cross(params, x, x) + jitter * jnp.eye(192, dtype=jnp.float64)
    exact = float(jnp.linalg.slogdet(k)[1])
    # rank-24 preconditioner leaves a near-identity-relative remainder:
    # SLQ only estimates the small gap
    assert abs(float(est) - exact) < 0.02 * abs(exact) + 0.5


def test_prior_log_prob_matrixfree_matches_dense():
    x, _ = _xy(n=128)
    prior = _prior()
    rng = np.random.default_rng(5)
    log_ell = prior.mean(x) + jnp.asarray(
        rng.normal(scale=0.3, size=(128, 2)), jnp.float64
    )
    pre = prior.gram_pre_lazy(
        x, jax.random.PRNGKey(9), rank=24, block=64,
        num_probes=32, max_iters=300, tol=1e-12,
    )

    def lp_mf(le):
        return prior.log_prob_matrixfree(
            x, le, pre, block=64, max_iters=400, tol=1e-13
        )

    v_mf, g_mf = jax.value_and_grad(lp_mf)(log_ell)
    v_dense, g_dense = jax.value_and_grad(
        lambda le: prior.log_prob(x, le)
    )(log_ell)
    # gradients are exact (quad CG converged; logdet constant)
    np.testing.assert_allclose(
        np.asarray(g_mf), np.asarray(g_dense), rtol=1e-6, atol=1e-9
    )
    # value differs only by the SLQ logdet estimate
    assert abs(float(v_mf - v_dense)) < 0.02 * abs(float(v_dense)) + 0.05


def test_gibbs_loss_matrixfree_matches_dense_composition():
    """Same key, precond_rank=0: the matrix-free MLL is bit-compatible with
    the dense cg_mll, so value and gradients of the full MAP loss must
    match the dense composition (exact prior quad; logdet constant)."""
    n = 160
    x, y = _xy(n=n)
    prior = _prior()
    model = GibbsExactGP.create(x, prior, noise=0.1, outputscale=1.0, dtype=jnp.float64)
    rng = np.random.default_rng(13)
    model = model.replace(
        log_ell=model.log_ell
        + jnp.asarray(rng.normal(scale=0.2, size=(n, 2)), jnp.float64)
    )
    key = jax.random.PRNGKey(21)
    pre = prior.gram_pre_lazy(
        x, jax.random.PRNGKey(22), rank=24, block=80,
        num_probes=32, max_iters=300, tol=1e-12,
    )

    def loss_mf(le, raw_s2, raw_noise):
        m = model.replace(
            log_ell=le,
            raw_outputscale=raw_s2,
            likelihood=model.likelihood.replace(raw_noise=raw_noise),
        )
        return m.loss_matrixfree(
            x, y, key, pre, block=80, num_probes=8, max_iters=400,
            tol=1e-13, precond_rank=0, fused_matvec=False,
            prior_max_iters=400,
        )

    def loss_dense(le, raw_s2, raw_noise):
        from nonstationary_precip_tpu.models.likelihoods import GaussianLikelihood

        s2 = positive(raw_s2)
        noise = GaussianLikelihood(raw_noise=raw_noise).noise
        ell = jnp.exp(le)
        k = s2 * gibbs_gram_reference(x, ell, x, ell) + noise * jnp.eye(
            n, dtype=jnp.float64
        )
        mll = cg_mll(k, y, key, noise, num_probes=8, max_iters=400, tol=1e-13)
        return -(mll + prior.log_prob(x, le)) / n

    args = (model.log_ell, model.raw_outputscale, model.likelihood.raw_noise)
    v_mf, g_mf = jax.value_and_grad(loss_mf, argnums=(0, 1, 2))(*args)
    v_d, g_d = jax.value_and_grad(loss_dense, argnums=(0, 1, 2))(*args)
    # value: constant SLQ-logdet offset on the prior term only (÷n²)
    assert abs(float(v_mf - v_d)) < 0.02 * abs(float(v_d)) + 5e-3
    for a, b in zip(g_mf, g_d):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-8
        )


def test_conditional_mean_matrixfree_matches_dense():
    x, _ = _xy(n=128)
    xs, _ = _xy(n=40, seed=99)
    prior = _prior()
    rng = np.random.default_rng(17)
    ell_g = jnp.exp(
        prior.mean(x) + jnp.asarray(rng.normal(scale=0.3, size=(128, 2)), jnp.float64)
    )
    pre = prior.gram_pre_lazy(
        x, jax.random.PRNGKey(3), rank=24, block=64,
        num_probes=8, max_iters=200, tol=1e-12,
    )
    got = prior.conditional_mean_matrixfree(
        xs, (x, ell_g), pre, block=64, max_iters=400, tol=1e-13
    )
    want = prior.conditional_mean(xs, (x, ell_g))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_gibbs_posterior_matrixfree_matches_dense():
    n = 128
    x, y = _xy(n=n)
    xs, _ = _xy(n=32, seed=41)
    prior = _prior()
    model = GibbsExactGP.create(x, prior, noise=0.1, outputscale=1.3, dtype=jnp.float64)
    rng = np.random.default_rng(23)
    model = model.replace(
        log_ell=model.log_ell
        + jnp.asarray(rng.normal(scale=0.2, size=(n, 2)), jnp.float64)
    )
    pre = prior.gram_pre_lazy(
        x, jax.random.PRNGKey(4), rank=24, block=64,
        num_probes=8, max_iters=200, tol=1e-12,
    )
    mf = model.posterior_matrixfree(
        x, y, xs, pre, block=64, max_iters=600, tol=1e-12,
        precond_rank=16, fused_matvec=False,
    )
    dense = model.posterior(x, y, xs)
    np.testing.assert_allclose(
        np.asarray(mf.mean), np.asarray(dense.mean), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(mf.cov), np.asarray(dense.cov), rtol=1e-5, atol=1e-7
    )


def test_gibbs_loss_matrixfree_fused_bwd_matches_scan_bwd():
    """fused_bwd=True (the Pallas panel_vjp sweep, interpret mode here)
    reroutes only the MLL gradient path: the loss value is bit-identical
    and every trained gradient (per-point log-ℓ field, outputscale,
    noise) matches the jax.vjp panel scan to f32 rounding."""
    from jax.experimental.pallas import tpu as pltpu

    n = 256
    x, y = _xy(n=n, dtype=jnp.float32)
    prior = _prior(dtype=jnp.float32)
    model = GibbsExactGP.create(x, prior, noise=0.1, outputscale=1.0)
    rng = np.random.default_rng(3)
    model = model.replace(
        log_ell=model.log_ell
        + jnp.asarray(rng.normal(scale=0.2, size=(n, 2)), jnp.float32)
    )
    key = jax.random.PRNGKey(5)
    pre = prior.gram_pre_lazy(
        x, jax.random.PRNGKey(6), rank=10, block=64, num_probes=8,
        max_iters=64, tol=1e-6,
    )

    def loss(m, fused):
        return m.loss_matrixfree(
            x, y, key, pre, block=64, num_probes=8, max_iters=64,
            tol=1e-7, precond_rank=10, fused_matvec=fused,
            fused_bwd=fused, prior_max_iters=48,
        )

    v0, g0 = jax.value_and_grad(lambda m: loss(m, False))(model)
    with pltpu.force_tpu_interpret_mode():
        v1, g1 = jax.value_and_grad(lambda m: loss(m, True))(model)
    assert abs(float(v1 - v0)) < 1e-5 * abs(float(v0))
    np.testing.assert_allclose(
        np.asarray(g1.log_ell), np.asarray(g0.log_ell), rtol=2e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        float(g1.raw_outputscale), float(g0.raw_outputscale), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(g1.likelihood.raw_noise), float(g0.likelihood.raw_noise),
        rtol=2e-3,
    )


def test_gibbs_loss_matrixfree_trains_under_jit_scan():
    import optax

    n = 256
    x, y = _xy(n=n, dtype=jnp.float32)
    prior = _prior(dtype=jnp.float32)
    model = GibbsExactGP.create(x, prior, noise=0.1, outputscale=1.0)
    key = jax.random.PRNGKey(0)
    pre = prior.gram_pre_lazy(
        x, jax.random.PRNGKey(1), rank=10, block=64, num_probes=8,
        max_iters=64, tol=1e-6,
    )
    opt = optax.adam(1e-2)
    mask = model.trainable(train_noise=True, train_scale=True)

    @jax.jit
    def run(m):
        st = opt.init(m)

        def body(carry, i):
            mm, s = carry
            val, g = jax.value_and_grad(
                lambda q: q.loss_matrixfree(
                    x, y, jax.random.fold_in(key, i), pre, block=64,
                    num_probes=4, max_iters=48, tol=1e-6, precond_rank=10,
                    fused_matvec=False, prior_max_iters=48,
                )
            )(mm)
            g = jax.tree.map(
                lambda gr, tr: jnp.where(tr, gr, 0.0), g, mask
            )
            up, s = opt.update(g, s)
            return (optax.apply_updates(mm, up), s), val

        (m, _), vals = jax.lax.scan(body, (m, st), jnp.arange(20))
        return m, vals

    _, vals = run(model)
    vals = np.asarray(vals)
    assert np.all(np.isfinite(vals))
    assert vals[-1] < vals[0]


def test_gibbs_loss_matrixfree_hoisted_factor_bitwise_and_stale_finite():
    """The stale-preconditioner hoist: loss_matrixfree(precond_lpc=
    precond_factor(x)) must be BITWISE the inline-build path at the same
    pose (identical factor inputs → identical estimator), value and
    gradients; a factor built at a slightly different pose must still
    give a finite, nearby loss (any fixed SPD P is a valid estimator)."""
    n = 160
    x, y = _xy(n=n)
    prior = _prior()
    model = GibbsExactGP.create(x, prior, noise=0.1, outputscale=1.0, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    model = model.replace(
        log_ell=model.log_ell
        + jnp.asarray(rng.normal(scale=0.2, size=(n, 2)), jnp.float64)
    )
    key = jax.random.PRNGKey(31)
    pre = prior.gram_pre_lazy(
        x, jax.random.PRNGKey(32), rank=16, block=80,
        num_probes=8, max_iters=200, tol=1e-12,
    )
    kw = dict(
        block=80, num_probes=8, max_iters=120, tol=1e-12,
        fused_matvec=False, prior_max_iters=200,
    )

    def loss_inline(m):
        return m.loss_matrixfree(x, y, key, pre, precond_rank=20, **kw)

    def loss_hoisted(m, lpc):
        return m.loss_matrixfree(x, y, key, pre, precond_lpc=lpc, **kw)

    lpc = model.precond_factor(x, rank=20)
    v_i, g_i = jax.value_and_grad(loss_inline)(model)
    v_h, g_h = jax.value_and_grad(loss_hoisted)(model, lpc)
    # the hoisted factor is computed in a SEPARATE XLA program, so
    # fusion differences move the last ulps — identical to rounding
    np.testing.assert_allclose(float(v_i), float(v_h), rtol=1e-13)
    for a, b in zip(jax.tree.leaves(g_i), jax.tree.leaves(g_h)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12
        )

    # stale: factor from a perturbed pose is still a valid estimator
    stale = model.replace(
        log_ell=model.log_ell
        + jnp.asarray(rng.normal(scale=0.05, size=(n, 2)), jnp.float64)
    ).precond_factor(x, rank=20)
    v_s, g_s = jax.value_and_grad(loss_hoisted)(model, stale)
    assert np.isfinite(float(v_s))
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g_s))
    # converged CG ⇒ the deterministic quad term is identical; only the
    # stochastic logdet estimate moves, and not by much
    assert abs(float(v_s - v_i)) < 0.02 * abs(float(v_i)) + 5e-3


def test_lazy_posterior_state_query_matches_one_shot_and_dense():
    """Amortized serving path (VERDICT r3 #4): state-built posterior must
    reproduce the one-shot lazy_cg_posterior and the dense solve; the
    mean_only path must equal the full path's mean with no solve."""
    from nonstationary_precip_tpu.ops.lazy_cg import (
        lazy_cg_posterior,
        lazy_posterior_query,
        lazy_posterior_state,
    )

    n, nt = 128, 24
    x, y = _xy(n=n)
    xt, _ = _xy(n=nt, seed=31)
    rng = np.random.default_rng(3)
    le = jnp.asarray(rng.normal(scale=0.2, size=x.shape), jnp.float64)
    le_t = jnp.asarray(rng.normal(scale=0.2, size=xt.shape), jnp.float64)
    aug = jnp.concatenate([x, le], axis=1)
    aug_t = jnp.concatenate([xt, le_t], axis=1)
    raw = jnp.asarray(0.4, jnp.float64)
    s2 = jnp.asarray(0.05, jnp.float64)
    cross = packed_gibbs_cross(2)

    st = lazy_posterior_state(
        raw, aug, y, s2, block=64, max_iters=400, tol=1e-13,
        precond_rank=16, cross_fn=cross,
    )
    m_st, c_st = lazy_posterior_query(
        st, aug_t, block=64, max_iters=400, tol=1e-13, cross_fn=cross
    )
    m_os, c_os = lazy_cg_posterior(
        raw, aug, y, aug_t, s2, block=64, max_iters=400, tol=1e-13,
        precond_rank=16, cross_fn=cross,
    )
    np.testing.assert_allclose(np.asarray(m_st), np.asarray(m_os), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(c_st), np.asarray(c_os), rtol=1e-6, atol=1e-10
    )
    # dense oracle
    k = cross(raw, aug, aug) + s2 * jnp.eye(n, dtype=jnp.float64)
    b = cross(raw, aug, aug_t)
    sol = jnp.linalg.solve(k, jnp.concatenate([y[:, None], b], axis=1))
    m_d = b.T @ sol[:, 0]
    c_d = cross(raw, aug_t, aug_t) - b.T @ sol[:, 1:]
    np.testing.assert_allclose(np.asarray(m_st), np.asarray(m_d), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(c_st), np.asarray(0.5 * (c_d + c_d.T)), rtol=1e-5, atol=1e-8
    )
    # mean_only: same mean, no covariance
    m_mo, c_mo = lazy_posterior_query(
        st, aug_t, mean_only=True, block=64, cross_fn=cross
    )
    assert c_mo is None
    np.testing.assert_allclose(np.asarray(m_mo), np.asarray(m_st), rtol=1e-12)


def test_gibbs_posterior_from_state_matches_dense():
    """Model-level amortized posterior == the dense manual conditioning
    (and the mean_only fast path agrees)."""
    n = 128
    x, y = _xy(n=n)
    xs, _ = _xy(n=32, seed=41)
    prior = _prior()
    model = GibbsExactGP.create(x, prior, noise=0.1, outputscale=1.3, dtype=jnp.float64)
    rng = np.random.default_rng(23)
    model = model.replace(
        log_ell=model.log_ell
        + jnp.asarray(rng.normal(scale=0.2, size=(n, 2)), jnp.float64)
    )
    pre = prior.gram_pre_lazy(
        x, jax.random.PRNGKey(4), rank=24, block=64,
        num_probes=8, max_iters=200, tol=1e-12,
    )
    state = model.posterior_state_matrixfree(
        x, y, pre, block=64, max_iters=600, tol=1e-13,
        precond_rank=16, fused_matvec=False, prior_max_iters=400,
    )
    mf = model.posterior_matrixfree_from_state(
        state, xs, block=64, max_iters=600, tol=1e-12, fused_matvec=False
    )
    dense = model.posterior(x, y, xs)
    np.testing.assert_allclose(
        np.asarray(mf.mean), np.asarray(dense.mean), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(mf.cov), np.asarray(dense.cov), rtol=1e-5, atol=1e-7
    )
    mean_only = model.posterior_matrixfree_from_state(
        state, xs, mean_only=True, block=64, fused_matvec=False
    )
    np.testing.assert_allclose(
        np.asarray(mean_only), np.asarray(mf.mean), rtol=1e-12
    )


def test_lazy_cg_diagnostics_reports_convergence_honestly():
    """The relres gate evidence (VERDICT r3 #1): a converged config reports
    relres at tolerance; a starved unpreconditioned budget reports the
    large residual instead of hiding it."""
    from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_diagnostics

    n = 256
    x, y = _xy(n=n)
    rng = np.random.default_rng(9)
    le = jnp.asarray(rng.normal(scale=0.3, size=x.shape), jnp.float64)
    aug = jnp.concatenate([x, le], axis=1)
    s2 = jnp.asarray(0.01, jnp.float64)
    cross = packed_gibbs_cross(2)
    key = jax.random.PRNGKey(7)

    good = lazy_cg_diagnostics(
        None, aug, y, key, s2, block=64, num_probes=4, max_iters=300,
        tol=1e-10, precond_rank=32, cross_fn=cross,
    )
    assert good["relres_solve"] < 1e-8 and not good["broke"]
    assert good["iters_max"] <= 300

    starved = lazy_cg_diagnostics(
        None, aug, y, key, s2, block=64, num_probes=4, max_iters=3,
        tol=1e-10, precond_rank=0, cross_fn=cross,
    )
    assert starved["relres_solve"] > good["relres_solve"] * 1e3


def test_chunked_mll_matches_monolithic():
    """Host-chunked MLL (make_chunked_mll — the past-the-execution-wall
    driver, DESIGN §27) must reproduce the monolithic lazy_cg_mll value
    AND gradients: chunked mBCG is the same scan re-entered, the SLQ
    assembly identical, the backward the same fused panel sweep."""
    from jax.experimental.pallas import tpu as pltpu

    from nonstationary_precip_tpu.ops.lazy_cg import make_chunked_mll
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        packed_gibbs_panel_vjp,
    )

    n = 256
    x, y = _xy(n=n, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    le = jnp.asarray(rng.normal(scale=0.2, size=(n, 2)), jnp.float32)
    aug = jnp.concatenate([x, le], axis=1)
    s2 = jnp.asarray(0.05, jnp.float32)
    key = jax.random.PRNGKey(11)
    cross = packed_gibbs_cross(2)
    pvjp = packed_gibbs_panel_vjp(2)
    # generous budget: the comparison needs a CONVERGED solve — the
    # chunked programs legally reorder f32 reductions vs the monolithic
    # scan, and an unconverged CG amplifies that rounding drift (first
    # attempt: relres 1e-2 at 16 iters -> 2e-4 value drift)
    kw = dict(block=64, num_probes=4, max_iters=64, tol=1e-9,
              precond_rank=32, cross_fn=cross, panel_vjp=pvjp)

    with pltpu.force_tpu_interpret_mode():
        v_m, (xg_m, rg_m, sg_m) = jax.value_and_grad(
            lambda a, r, s: lazy_cg_mll_import(a, r, key, s, **kw),
            argnums=(0, 1, 2),
        )(aug, y, s2)

        m = make_chunked_mll(
            block=64, num_probes=4, chunk_iters=16, n_chunks=4, tol=1e-9,
            precond_rank=32, precond="pivchol", precond_shift=1.0,
            cross_fn=cross, matvec_builder=None, panel_vjp=pvjp,
        )
        v_c, relres, (kg, xg_c, rg_c, sg_c) = m.value_and_grad(
            None, aug, y, s2, key, early_stop=False
        )
        v_e, relres_e, (_, xg_e, rg_e, sg_e) = m.value_and_grad(
            None, aug, y, s2, key, early_stop=True
        )

    assert kg is None
    np.testing.assert_allclose(float(v_c), float(v_m), rtol=1e-4)
    assert float(jnp.max(relres)) < 1e-5  # converged at this budget
    # grads: the chunked backward is the SAME fused panel sweep; drift
    # comes only from the f32 solve inputs (alpha/solves) differing at
    # rounding level between the re-entered and monolithic programs
    np.testing.assert_allclose(
        np.asarray(xg_c), np.asarray(xg_m), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(rg_c), np.asarray(rg_m), rtol=1e-3, atol=3e-4
    )
    np.testing.assert_allclose(float(sg_c), float(sg_m), rtol=1e-3)
    # early-stop path: identical answers once every column converged
    np.testing.assert_allclose(float(v_e), float(v_c), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(xg_e), np.asarray(xg_c), rtol=1e-6, atol=1e-8
    )


def lazy_cg_mll_import(aug, r, key, s2, **kw):
    from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_mll

    return lazy_cg_mll(None, aug, r, key, s2, **kw)
