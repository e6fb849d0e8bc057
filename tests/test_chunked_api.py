"""Product surface for the host-chunked large-N regime (VERDICT r4 #1):
``models.gibbs_gp.make_chunked_map_loss`` / ``ChunkedMAPLoss``,
``train.optim.fit_chunked``, the chunked posterior-state/query routes and
``ops.lazy_cg.make_chunked_solve`` — all against the monolithic paths
they re-enter (same ops, same order) and the dense oracles.

The chunked drivers exist because a single axon device program executing
≳60–90 s crashes the worker (DESIGN.md §27); at CI scale they must be
numerically indistinguishable from the monolithic estimators.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nonstationary_precip_tpu.kernels.gibbs import packed_gibbs_cross
from nonstationary_precip_tpu.models.gibbs_gp import (
    GibbsExactGP,
    make_chunked_map_loss,
)
from nonstationary_precip_tpu.ops.bbmm import mbcg
from nonstationary_precip_tpu.ops.lazy_cg import (
    lazy_pivoted_cholesky,
    make_chunked_solve,
)
from nonstationary_precip_tpu.priors.lognormal_process import (
    _COND_JITTER,
    LogNormalProcess,
    _dim_cross,
)


def _xy(n=256, d=2, seed=7, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-2, 2, size=(n, d)), dtype)
    y = jnp.asarray(
        np.sin(2 * np.asarray(x[:, 0])) + 0.1 * rng.normal(size=n), dtype
    )
    return x, y


def _prior(dtype=jnp.float64):
    return LogNormalProcess.create(
        2, mean=float(np.log(0.3)), outputscale=1.0, lengthscale=1.3,
        dtype=dtype,
    )


def _model(x, seed=23, dtype=jnp.float64):
    model = GibbsExactGP.create(
        x, _prior(dtype), noise=0.1, outputscale=1.3, dtype=dtype
    )
    rng = np.random.default_rng(seed)
    return model.replace(
        log_ell=model.log_ell
        + jnp.asarray(rng.normal(scale=0.2, size=x.shape), dtype)
    )


def test_chunked_solve_matches_monolithic_mbcg():
    """make_chunked_solve re-enters mbcg's scan: same solution, honest
    relres, early stop cuts chunks without changing the answer."""
    n = 192
    x, _ = _xy(n=n)
    params = (jnp.asarray([1.3, 1.3], jnp.float64), jnp.asarray(1.0, jnp.float64))
    jitter = jnp.asarray(_COND_JITTER, jnp.float64)
    rng = np.random.default_rng(3)
    rhs = jnp.asarray(rng.normal(size=(n, 3)), jnp.float64)
    lpc = lazy_pivoted_cholesky(params, x, 16, cross_fn=_dim_cross)

    from nonstationary_precip_tpu.ops.lazy_cg import _lazy_matvec, _woodbury

    matvec = _lazy_matvec(params, x, jitter, 64, _dim_cross)
    res = mbcg(matvec, rhs, max_iters=64, tol=1e-12,
               precond=_woodbury(lpc, jitter))

    solve = make_chunked_solve(64, 8, 8, 1e-12, _dim_cross, None, 1.0)
    sol, relres = solve(params, x, rhs, jitter, lpc, early_stop=False)
    np.testing.assert_allclose(np.asarray(sol), np.asarray(res.x), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(relres), np.asarray(res.residnorm), rtol=1e-6, atol=1e-14
    )
    sol_e, relres_e = solve(params, x, rhs, jitter, lpc, early_stop=True)
    np.testing.assert_allclose(np.asarray(sol_e), np.asarray(sol), rtol=1e-10)
    # the tiny-jitter prior operator stalls near f64 rounding (benign —
    # same 64-iteration plateau as the monolithic run it must MATCH)
    assert float(jnp.max(relres_e)) < 1e-5


def test_chunked_map_loss_matches_loss_matrixfree():
    """The product loss (MLL + frozen-prior term, both host-chunked) must
    reproduce GibbsExactGP.loss_matrixfree's value AND model gradients —
    same estimator re-entered, same prior pullback (exact at
    convergence)."""
    n = 256
    x, y = _xy(n=n)
    model = _model(x)
    key = jax.random.PRNGKey(11)
    pre = model.prior_pre_matrixfree(
        x, jax.random.PRNGKey(9), rank=24, block=64,
        num_probes=8, max_iters=300, tol=1e-12,
    )

    def mono(m):
        return m.loss_matrixfree(
            x, y, key, pre, block=64, num_probes=4, max_iters=64,
            tol=1e-11, precond_rank=32, precond="pivchol",
            precond_shift=1.0, fused_matvec=False, fused_bwd=False,
            prior_max_iters=256,
        )

    v_m, g_m = jax.value_and_grad(mono)(model)

    loss = make_chunked_map_loss(
        2, block=64, num_probes=4, chunk_iters=16, n_chunks=4, tol=1e-11,
        precond_rank=32, precond="pivchol", precond_shift=1.0,
        include_prior=True, prior_chunk_iters=32, prior_n_chunks=8,
        fused_matvec=False,
    )
    v_c, g_c, info = loss.value_and_grad(model, x, y, pre, key)

    np.testing.assert_allclose(float(v_c), float(v_m), rtol=1e-8)
    assert float(info["relres_max"]) < 1e-7
    np.testing.assert_allclose(
        np.asarray(g_c.log_ell), np.asarray(g_m.log_ell),
        rtol=1e-6, atol=1e-12,
    )
    np.testing.assert_allclose(
        float(g_c.raw_outputscale), float(g_m.raw_outputscale), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(g_c.likelihood.raw_noise), float(g_m.likelihood.raw_noise),
        rtol=1e-6,
    )
    # frozen-prior contract: no prior-hyper gradients on either side
    for leaf in jax.tree.leaves(g_c.prior):
        assert float(jnp.max(jnp.abs(leaf))) == 0.0


def test_chunked_map_loss_without_prior_matches_raw_mll():
    """include_prior=False is the raw-MLL trainer the measured 1M bench
    rows run (tools/probe_chunked.py) — value must equal the chunked MLL
    alone ÷(−n)."""
    from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_mll

    n = 128
    x, y = _xy(n=n)
    model = _model(x)
    key = jax.random.PRNGKey(5)

    loss = make_chunked_map_loss(
        2, block=64, num_probes=4, chunk_iters=8, n_chunks=4, tol=1e-11,
        precond_rank=16, precond="pivchol", precond_shift=1.0,
        include_prior=False, fused_matvec=False,
    )
    v_c, g_c, _ = loss.value_and_grad(model, x, y, None, key)

    aug = jnp.concatenate([x, model.log_ell], axis=1)
    v_mono = lazy_cg_mll(
        model.raw_outputscale, aug, y, key, model.likelihood.noise,
        block=64, num_probes=4, max_iters=32, tol=1e-11,
        precond_rank=16, cross_fn=packed_gibbs_cross(2),
    )
    np.testing.assert_allclose(float(v_c), -float(v_mono) / n, rtol=1e-8)
    assert np.all(np.isfinite(np.asarray(g_c.log_ell)))


def test_fit_chunked_trains_and_respects_mask():
    """fit_chunked: loss decreases, relres evidence recorded, the
    trainable() mask freezes prior/noise/outputscale, threshold stops."""
    from nonstationary_precip_tpu.train.optim import fit_chunked

    n = 128
    x, y = _xy(n=n, dtype=jnp.float32)
    model = _model(x, dtype=jnp.float32)
    pre = model.prior_pre_matrixfree(
        x, jax.random.PRNGKey(9), rank=16, block=64,
        num_probes=4, max_iters=200, tol=1e-10,
    )
    loss = make_chunked_map_loss(
        2, block=64, num_probes=4, chunk_iters=8, n_chunks=4, tol=1e-7,
        precond_rank=16, precond="pivchol", precond_shift=1.0,
        include_prior=True, prior_chunk_iters=16, prior_n_chunks=8,
        fused_matvec=False,
    )
    res = fit_chunked(
        model, loss, x, y, pre, key=jax.random.PRNGKey(0), num_steps=8,
        lr=0.05, mask=model.trainable(),
    )
    assert res.steps == 8
    assert res.losses.shape == (8,) and np.all(np.isfinite(res.losses))
    assert float(res.losses[-1]) < float(res.losses[0])
    assert res.relres.shape == (8,)
    assert float(jnp.max(res.relres)) < 1e-2
    # frozen leaves untouched
    np.testing.assert_array_equal(
        np.asarray(res.model.likelihood.raw_noise),
        np.asarray(model.likelihood.raw_noise),
    )
    np.testing.assert_array_equal(
        np.asarray(res.model.raw_outputscale),
        np.asarray(model.raw_outputscale),
    )
    for a, b in zip(jax.tree.leaves(res.model.prior),
                    jax.tree.leaves(model.prior)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the field trained
    assert float(jnp.max(jnp.abs(res.model.log_ell - model.log_ell))) > 0

    # threshold: a huge bar stops after 2 steps (needs one Δ)
    res2 = fit_chunked(
        model, loss, x, y, pre, key=jax.random.PRNGKey(0), num_steps=8,
        lr=0.05, mask=model.trainable(), threshold=1e9,
    )
    assert res2.steps == 2


def test_fit_chunked_composes_with_best_checkpointer(tmp_path):
    """VERDICT r4 #1's composition requirement: fit_chunked's callback
    hook drives BestCheckpointer exactly like the whole-scan fit path —
    the best-objective checkpoint restores to a real model state."""
    from nonstationary_precip_tpu.train.checkpoint import (
        BestCheckpointer,
        restore_pytree,
    )
    from nonstationary_precip_tpu.train.optim import fit_chunked

    n = 96
    x, y = _xy(n=n, dtype=jnp.float32)
    model = _model(x, dtype=jnp.float32)
    pre = model.prior_pre_matrixfree(
        x, jax.random.PRNGKey(9), rank=12, block=48,
        num_probes=4, max_iters=150, tol=1e-9,
    )
    loss = make_chunked_map_loss(
        2, block=48, num_probes=4, chunk_iters=8, n_chunks=3, tol=1e-7,
        precond_rank=12, precond="pivchol", precond_shift=1.0,
        include_prior=True, prior_chunk_iters=16, prior_n_chunks=8,
        fused_matvec=False,
    )
    ck = BestCheckpointer(tmp_path / "ck")

    def cb(step, m, losses):
        ck.update(step, m, objective=losses[-1])

    res = fit_chunked(
        model, loss, x, y, pre, key=jax.random.PRNGKey(0), num_steps=4,
        lr=0.05, mask=model.trainable(), callback=cb,
    )
    assert (tmp_path / "ck" / "best" / "meta.json").exists()
    restored = restore_pytree(tmp_path / "ck" / "best" / "model", model)
    # monotone loss here -> best == final
    np.testing.assert_array_equal(
        np.asarray(restored.log_ell), np.asarray(res.model.log_ell)
    )


def test_posterior_state_chunked_routes_match_monolithic():
    """chunk_iters on posterior_state_matrixfree / _from_state must
    reproduce the monolithic state/query (and the dense posterior)."""
    n = 128
    x, y = _xy(n=n)
    xs, _ = _xy(n=24, seed=41)
    model = _model(x)
    pre = model.prior_pre_matrixfree(
        x, jax.random.PRNGKey(4), rank=24, block=64,
        num_probes=8, max_iters=200, tol=1e-12,
    )
    kw = dict(block=64, tol=1e-13, precond_rank=16, fused_matvec=False,
              prior_max_iters=400)
    st_m = model.posterior_state_matrixfree(x, y, pre, max_iters=600, **kw)
    st_c = model.posterior_state_matrixfree(
        x, y, pre, chunk_iters=50, n_chunks=12, **kw
    )
    np.testing.assert_allclose(
        np.asarray(st_c[0].alpha), np.asarray(st_m[0].alpha), rtol=1e-8
    )
    assert float(st_c[0].alpha_relres) < 1e-12
    np.testing.assert_allclose(
        np.asarray(st_c[1]), np.asarray(st_m[1]), rtol=1e-7, atol=1e-10
    )

    mf_m = model.posterior_matrixfree_from_state(
        st_m, xs, block=64, max_iters=600, tol=1e-12, fused_matvec=False
    )
    mf_c, info = model.posterior_matrixfree_from_state(
        st_c, xs, block=64, tol=1e-12, fused_matvec=False,
        chunk_iters=50, n_chunks=12, return_info=True,
    )
    np.testing.assert_allclose(
        np.asarray(mf_c.mean), np.asarray(mf_m.mean), rtol=1e-7, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(mf_c.cov), np.asarray(mf_m.cov), rtol=1e-5, atol=1e-8
    )
    assert float(info["relres_max"]) < 1e-10
    dense = model.posterior(x, y, xs)
    np.testing.assert_allclose(
        np.asarray(mf_c.mean), np.asarray(dense.mean), rtol=1e-6, atol=1e-8
    )


def test_default_auto_budget_query_matches_dense_oracle():
    """ADVICE r4 (medium): the SHIPPED default budgets — state build at
    2×auto, variance queries at auto — must be accuracy-tested against
    the dense oracle, with the returned info proving convergence."""
    n = 512
    x, y = _xy(n=n)
    xs, _ = _xy(n=16, seed=41)
    model = _model(x)
    pre = model.prior_pre_matrixfree(
        x, jax.random.PRNGKey(4), rank=24, block=128,
        num_probes=8, max_iters=300, tol=1e-12,
    )
    # DEFAULT budgets: no max_iters/tol overrides anywhere
    st = model.posterior_state_matrixfree(
        x, y, pre, block=128, fused_matvec=False
    )
    out, info = model.posterior_matrixfree_from_state(
        st, xs, block=128, fused_matvec=False, return_info=True
    )
    rr = float(info["relres_max"])
    assert rr < 1e-2, f"auto budget did not converge: relres {rr:.2e}"
    assert float(st[0].alpha_relres) < 1e-2
    dense = model.posterior(x, y, xs)
    np.testing.assert_allclose(
        np.asarray(out.mean), np.asarray(dense.mean), rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(jnp.diag(out.cov)), np.asarray(jnp.diag(dense.cov)),
        rtol=5e-3, atol=5e-5,
    )


def test_chunked_pkey_selects_same_factor_as_monolithic():
    """ADVICE r4 (low): an explicit pkey must select the SAME keyed
    factor rule (RPCholesky pivots) in the chunked driver as in
    lazy_cg_mll — the value (whose probes are preconditioner-shaped)
    agrees tightly keyed-to-keyed and differs keyed-to-unkeyed."""
    from nonstationary_precip_tpu.ops.lazy_cg import (
        lazy_cg_mll,
        make_chunked_mll,
    )

    n = 128
    x, y = _xy(n=n, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    le = jnp.asarray(rng.normal(scale=0.2, size=(n, 2)), jnp.float32)
    aug = jnp.concatenate([x, le], axis=1)
    s2 = jnp.asarray(0.05, jnp.float32)
    key = jax.random.PRNGKey(11)
    pk = jax.random.PRNGKey(99)
    cross = packed_gibbs_cross(2)
    kw = dict(block=64, num_probes=4, max_iters=48, tol=1e-10,
              precond_rank=24, cross_fn=cross)

    v_keyed = lazy_cg_mll(None, aug, y, key, s2, precond_key=pk, **kw)
    v_unkeyed = lazy_cg_mll(None, aug, y, key, s2, **kw)

    m = make_chunked_mll(
        block=64, num_probes=4, chunk_iters=12, n_chunks=4, tol=1e-10,
        precond_rank=24, precond="pivchol", precond_shift=1.0,
        cross_fn=cross, matvec_builder=None, panel_vjp=None,
    )
    v_ck, _, _ = m.value_and_grad(None, aug, y, s2, key, pkey=pk)
    v_cu, _, _ = m.value_and_grad(None, aug, y, s2, key)

    np.testing.assert_allclose(float(v_ck), float(v_keyed), rtol=1e-5)
    np.testing.assert_allclose(float(v_cu), float(v_unkeyed), rtol=1e-5)
    # the two pivot rules draw different probes — estimates distinguishable
    assert abs(float(v_keyed) - float(v_unkeyed)) > 1e-7


def test_row_chunked_backward_matches_full_sweep():
    """bwd_row_chunks splits the backward panel sweep into host-driven
    row-block programs (the only way past the execution wall at N ≥ ~1.5M,
    DESIGN §27) — gradients must equal the one-shot sweep exactly (each
    output row only sums over columns)."""
    from jax.experimental.pallas import tpu as pltpu

    from nonstationary_precip_tpu.ops.lazy_cg import make_chunked_mll
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        packed_gibbs_panel_vjp,
        packed_gibbs_panel_vjp_rows,
    )

    n = 256
    x, y = _xy(n=n, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    le = jnp.asarray(rng.normal(scale=0.2, size=(n, 2)), jnp.float32)
    aug = jnp.concatenate([x, le], axis=1)
    s2 = jnp.asarray(0.05, jnp.float32)
    key = jax.random.PRNGKey(11)
    cross = packed_gibbs_cross(2)
    kw = dict(block=64, num_probes=4, chunk_iters=16, n_chunks=2,
              tol=1e-8, precond_rank=32, precond="pivchol",
              precond_shift=1.0, cross_fn=cross, matvec_builder=None)

    with pltpu.force_tpu_interpret_mode():
        m_full = make_chunked_mll(
            panel_vjp=packed_gibbs_panel_vjp(2), **kw
        )
        v_f, _, (kg_f, xg_f, rg_f, sg_f) = m_full.value_and_grad(
            jnp.asarray(0.4, jnp.float32), aug, y, s2, key
        )
        m_rows = make_chunked_mll(
            panel_vjp=packed_gibbs_panel_vjp(2),
            panel_vjp_rows=packed_gibbs_panel_vjp_rows(2),
            bwd_row_chunks=4, **kw
        )
        v_r, _, (kg_r, xg_r, rg_r, sg_r) = m_rows.value_and_grad(
            jnp.asarray(0.4, jnp.float32), aug, y, s2, key
        )

    np.testing.assert_allclose(float(v_r), float(v_f), rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(xg_r), np.asarray(xg_f), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(kg_r), float(kg_f), rtol=1e-5)
    np.testing.assert_allclose(float(sg_r), float(sg_f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rg_r), np.asarray(rg_f), rtol=1e-7)


def test_product_loss_row_chunked_backward_matches():
    """make_chunked_map_loss(bwd_row_chunks=...) — the product surface of
    the past-1.5M backward — must reproduce the one-shot product loss
    (model-pytree grads, prior included)."""
    from jax.experimental.pallas import tpu as pltpu

    n = 128
    x, y = _xy(n=n, dtype=jnp.float32)
    model = _model(x, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    pre = model.prior_pre_matrixfree(
        x, jax.random.PRNGKey(9), rank=16, block=64,
        num_probes=4, max_iters=200, tol=1e-10,
    )
    kw = dict(block=64, num_probes=4, chunk_iters=8, n_chunks=4,
              tol=1e-8, precond_rank=16, precond="pivchol",
              precond_shift=1.0, include_prior=True,
              prior_chunk_iters=16, prior_n_chunks=8, fused_matvec=True)
    with pltpu.force_tpu_interpret_mode():
        l1 = make_chunked_map_loss(2, **kw)
        v1, g1, _ = l1.value_and_grad(model, x, y, pre, key)
        l4 = make_chunked_map_loss(2, bwd_row_chunks=4, **kw)
        v4, g4, _ = l4.value_and_grad(model, x, y, pre, key)
    np.testing.assert_allclose(float(v4), float(v1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g4.log_ell), np.asarray(g1.log_ell),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        float(g4.raw_outputscale), float(g1.raw_outputscale), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(g4.likelihood.raw_noise), float(g1.likelihood.raw_noise),
        rtol=1e-5,
    )


def test_nystrom_dead_rank_guard_warns_eagerly_only():
    """DESIGN §30 capacity guard: an eager factor build whose landmark
    Gram keeps <1/8 of the requested rank warns (with a usable rank
    suggestion); under jit the traced spectrum silently skips."""
    import warnings

    from nonstationary_precip_tpu.ops.lazy_cg import lazy_nystrom_factor

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(512, 2)), jnp.float32)
    params = (jnp.asarray([1.5, 1.5], jnp.float32),
              jnp.asarray(1.0, jnp.float32))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lazy_nystrom_factor(params, x, 256, _dim_cross)
    assert any("eigendirections" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        jax.jit(
            lambda xx: lazy_nystrom_factor(params, xx, 256, _dim_cross)
        )(x)
    assert not any("eigendirections" in str(x.message) for x in w)


def test_keyed_diagnostics_certify_the_keyed_factor():
    """ADVICE r4 (low): lazy_cg_diagnostics with precond_key must build
    the keyed factor (the one lazy_cg_mll solves with), not silently the
    greedy one — starve the budget so the two factors' convergence
    differs measurably, and check keyed diagnostics equal a manual mbcg
    run with the keyed factor."""
    from nonstationary_precip_tpu.ops.lazy_cg import (
        _lazy_matvec,
        _woodbury,
        build_precond_factor,
        lazy_cg_diagnostics,
    )

    n = 256
    x, y = _xy(n=n)
    rng = np.random.default_rng(9)
    le = jnp.asarray(rng.normal(scale=0.3, size=x.shape), jnp.float64)
    aug = jnp.concatenate([x, le], axis=1)
    s2 = jnp.asarray(0.01, jnp.float64)
    cross = packed_gibbs_cross(2)
    key = jax.random.PRNGKey(7)
    pk = jax.random.PRNGKey(3)

    diag = lazy_cg_diagnostics(
        None, aug, y, key, s2, block=64, num_probes=4, max_iters=6,
        tol=1e-12, precond_rank=32, precond="nystrom", precond_key=pk,
        cross_fn=cross,
    )
    # oracle: mbcg with the keyed nystrom factor, same probes
    lpc = build_precond_factor("nystrom", None, aug, 32, cross, pk)
    from nonstationary_precip_tpu.ops.bbmm import sample_precond_probes

    probes = sample_precond_probes(key, lpc, s2, 4)
    rhs = jnp.concatenate([y[:, None], probes], axis=1)
    res = mbcg(
        _lazy_matvec(None, aug, s2, 64, cross), rhs, max_iters=6,
        tol=1e-12, precond=_woodbury(lpc, s2),
    )
    np.testing.assert_allclose(
        diag["relres_solve"], float(res.residnorm[0]), rtol=1e-9
    )
    np.testing.assert_allclose(
        diag["relres_max"], float(jnp.max(res.residnorm)), rtol=1e-9
    )
