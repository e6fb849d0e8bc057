"""Matrix-free BBMM (ops/lazy_cg.py) vs the dense CG and Cholesky oracles.

The lazy row panels compute the same per-row dot products as the dense
Gram (merely partitioned over a lax.map), so with the same key the CG
trajectory, SLQ probes and MLL must agree with ``ops/bbmm.cg_mll`` to
rounding — not just statistically.  Mirrors tests/test_sharded_cg.py
(the multi-chip flavour of the same decomposition)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonstationary_precip_tpu.kernels import RBF, Scale
from nonstationary_precip_tpu.ops.bbmm import cg_mll, pivoted_cholesky
from nonstationary_precip_tpu.ops.lazy_cg import (
    lazy_cg_mll,
    lazy_cg_posterior,
    lazy_pivoted_cholesky,
)


def _setup(n=240, n_test=24, seed=30):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float64)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float64)
    xs = jnp.asarray(rng.normal(size=(n_test, 2)), jnp.float64)
    kernel = Scale.create(
        RBF.create(ard_dims=2, dtype=jnp.float64), dtype=jnp.float64
    )
    return kernel, x, y, xs, jnp.asarray(0.2, jnp.float64)


@pytest.mark.parametrize("block", [60, 240, 4096])
def test_lazy_mll_matches_dense_cg(block):
    kernel, x, y, _, s2 = _setup()
    key = jax.random.PRNGKey(11)
    val_lazy = jax.jit(
        lambda k, yy, ss: lazy_cg_mll(
            k, x, yy, key, ss, block=block,
            num_probes=32, max_iters=300, tol=1e-12,
        )
    )(kernel, y, s2)
    k_dense = kernel(x) + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
    val_dense = cg_mll(
        k_dense, y, key, s2, num_probes=32, max_iters=300, tol=1e-12
    )
    assert abs(float(val_lazy - val_dense)) < 1e-8
    exact = (
        -0.5 * y @ jnp.linalg.solve(k_dense, y)
        - 0.5 * jnp.linalg.slogdet(k_dense)[1]
        - 0.5 * x.shape[0] * jnp.log(2 * jnp.pi)
    )
    assert abs(float(val_lazy - exact)) < 0.02 * abs(float(exact)) + 1.0


def test_lazy_mll_grads_match_dense_cg():
    """Kernel-param, x, resid AND sigma2 gradients vs differentiating the
    composed dense path (kmat = kernel(x) + σ²I feeding cg_mll)."""
    kernel, x, y, _, s2 = _setup(n=160)
    key = jax.random.PRNGKey(12)

    def f_lazy(k, xx, yy, ss):
        return lazy_cg_mll(
            k, xx, yy, key, ss, block=40,
            num_probes=16, max_iters=200, tol=1e-12,
        )

    def f_dense(k, xx, yy, ss):
        km = k(xx) + ss * jnp.eye(xx.shape[0], dtype=jnp.float64)
        return cg_mll(km, yy, key, ss, num_probes=16, max_iters=200, tol=1e-12)

    gl = jax.jit(jax.grad(f_lazy, argnums=(0, 1, 2, 3)))(kernel, x, y, s2)
    gd = jax.jit(jax.grad(f_dense, argnums=(0, 1, 2, 3)))(kernel, x, y, s2)
    # NB dense cg_mll's own sigma2 slot carries no gradient (K already
    # contains the noise there); the composed path recovers it through the
    # kmat cotangent's diagonal — which is exactly what the lazy panel
    # pullback computes.
    for a, b in zip(jax.tree.leaves(gl), jax.tree.leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)


def test_lazy_pivoted_cholesky_matches_dense():
    kernel, x, _, _, _ = _setup(n=96)
    l_lazy = jax.jit(
        lambda k: lazy_pivoted_cholesky(k, x, 10)
    )(kernel)
    l_dense, _ = pivoted_cholesky(kernel(x), 10)
    np.testing.assert_allclose(
        np.asarray(l_lazy), np.asarray(l_dense), atol=1e-9
    )


def test_lazy_rp_cholesky_factor_is_valid():
    """RPCholesky (key= sampled pivots) must produce a factor of the SAME
    quality class as greedy: residual K − LLᵀ is PSD to rounding, trace
    error comparable, and exhausted pivots are never re-selected (their
    residual diagonal is exactly zero ⇒ sampling probability zero)."""
    kernel, x, _, _, _ = _setup(n=96)
    rank = 24
    k_dense = kernel(x)
    l_greedy = lazy_pivoted_cholesky(kernel, x, rank)
    l_rpc = jax.jit(
        lambda k: lazy_pivoted_cholesky(k, x, rank, key=jax.random.PRNGKey(3))
    )(kernel)
    assert not np.allclose(np.asarray(l_rpc), np.asarray(l_greedy))
    for l in (l_greedy, l_rpc):
        resid = k_dense - l @ l.T
        evals = np.linalg.eigvalsh(np.asarray(resid))
        assert evals.min() > -1e-9
    tr_g = float(jnp.trace(k_dense - l_greedy @ l_greedy.T))
    tr_r = float(jnp.trace(k_dense - l_rpc @ l_rpc.T))
    assert tr_r < 4.0 * max(tr_g, 1e-12) + 1e-9
    # each column introduces a NEW pivot: the pivot row of column j is
    # zeroed in the residual, so no two columns share their peak index
    piv_rows = np.argmax(np.abs(np.asarray(l_rpc)), axis=0)
    assert len(set(piv_rows.tolist())) == rank


def test_lazy_nystrom_factor_preconditions():
    """The Nyström factor L = K(x,m) chol(K(m,m)+δI)⁻ᵀ must satisfy the
    Woodbury contract: K − LLᵀ PSD to rounding (Nyström residual is a
    Schur complement), P = LLᵀ + σ²I solved exactly by _woodbury, and a
    preconditioned CG must beat the unpreconditioned one at equal
    iterations.  Padding path: n chosen indivisible by block."""
    from nonstationary_precip_tpu.ops.bbmm import mbcg
    from nonstationary_precip_tpu.ops.lazy_cg import (
        _woodbury,
        lazy_nystrom_factor,
    )

    kernel, x, y, _, s2 = _setup(n=250)
    k_dense = kernel(x)
    for key in (None, jax.random.PRNGKey(2)):
        l = jax.jit(
            lambda k: lazy_nystrom_factor(k, x, 64, key=key, block=90)
        )(kernel)
        evals = np.linalg.eigvalsh(np.asarray(k_dense - l @ l.T))
        assert evals.min() > -1e-9
        p_dense = l @ l.T + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
        sol = _woodbury(l, s2)(y[:, None])
        np.testing.assert_allclose(
            np.asarray(sol[:, 0]),
            np.asarray(jnp.linalg.solve(p_dense, y)),
            atol=1e-8,
        )
        mv = lambda v: k_dense @ v + s2 * v  # noqa: E731
        pre = mbcg(mv, y[:, None], max_iters=25, tol=1e-12,
                   precond=_woodbury(l, s2))
        nopre = mbcg(mv, y[:, None], max_iters=25, tol=1e-12)
        exact = jnp.linalg.solve(
            k_dense + s2 * jnp.eye(x.shape[0], dtype=jnp.float64), y
        )
        err_pre = float(jnp.linalg.norm(pre.x[:, 0] - exact))
        err_no = float(jnp.linalg.norm(nopre.x[:, 0] - exact))
        assert err_pre < err_no


def test_lazy_mll_nystrom_precond_tracks_exact():
    """precond='nystrom' in lazy_cg_mll: same estimand, Nyström factor in
    the variance-reduction role — the value must track the dense-Cholesky
    exact MLL as tightly as the pivoted-Cholesky variant does."""
    kernel, x, y, _, s2 = _setup()
    key = jax.random.PRNGKey(21)
    val = jax.jit(
        lambda k, yy, ss: lazy_cg_mll(
            k, x, yy, key, ss, block=80,
            num_probes=16, max_iters=300, tol=1e-12, precond_rank=24,
            precond="nystrom",
        )
    )(kernel, y, s2)
    k_dense = kernel(x) + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
    exact = (
        -0.5 * y @ jnp.linalg.solve(k_dense, y)
        - 0.5 * jnp.linalg.slogdet(k_dense)[1]
        - 0.5 * x.shape[0] * jnp.log(2 * jnp.pi)
    )
    assert abs(float(val - exact)) < 0.02 * abs(float(exact)) + 1.0


def test_lazy_mll_precond_shift_tracks_exact():
    """P = LLᵀ + shift·σ²I with shift ≠ 1: every estimator identity is
    P-generic (z ~ N(0,P), P⁻¹-weighted rights, exact logdet P), so the
    MLL must track the dense-Cholesky exact value as tightly as shift=1
    — shift changes variance reduction and f32 stability, never the
    estimand."""
    kernel, x, y, _, s2 = _setup()
    key = jax.random.PRNGKey(21)
    k_dense = kernel(x) + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
    exact = (
        -0.5 * y @ jnp.linalg.solve(k_dense, y)
        - 0.5 * jnp.linalg.slogdet(k_dense)[1]
        - 0.5 * x.shape[0] * jnp.log(2 * jnp.pi)
    )
    for shift in (10.0, 100.0):
        val = jax.jit(
            lambda k, yy, ss, sh=shift: lazy_cg_mll(
                k, x, yy, key, ss, block=80,
                num_probes=16, max_iters=300, tol=1e-12, precond_rank=8,
                precond_shift=sh,
            )
        )(kernel, y, s2)
        assert abs(float(val - exact)) < 0.02 * abs(float(exact)) + 1.0


def test_lazy_quad_and_logdet_precond_shift_exact():
    """Frozen-operator primitives under shift ≠ 1: the quad is solved to
    tolerance regardless of P (CG limit point is P-independent) and the
    SLQ logdet's base + Lanczos correction must still sum to logdet K̂."""
    from nonstationary_precip_tpu.ops.lazy_cg import (
        lazy_cg_quad,
        lazy_slq_logdet,
    )

    kernel, x, y, _, s2 = _setup(n=160)
    lpc = lazy_pivoted_cholesky(kernel, x, 12)
    k_dense = kernel(x) + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
    q_exact = float(y @ jnp.linalg.solve(k_dense, y))
    ld_exact = float(jnp.linalg.slogdet(k_dense)[1])
    q = lazy_cg_quad(
        kernel, x, y, s2, lpc=lpc, block=80,
        max_iters=300, tol=1e-12, precond_shift=25.0,
    )
    assert abs(float(q) - q_exact) < 1e-6 * abs(q_exact)
    ld = lazy_slq_logdet(
        kernel, x, jax.random.PRNGKey(4), s2, lpc=lpc, block=80,
        num_probes=32, max_iters=300, tol=1e-12, precond_shift=25.0,
    )
    assert abs(float(ld) - ld_exact) < 0.05 * abs(ld_exact) + 1.0


def test_lazy_mll_preconditioned_rpc_matches_dense_value():
    """The MLL estimator is pivot-rule agnostic: an RPCholesky factor in
    the Woodbury preconditioner changes the variance-reduction detail,
    not the estimand — the preconditioned value must still track the
    dense-Cholesky exact MLL."""
    kernel, x, y, _, s2 = _setup()
    from nonstationary_precip_tpu.ops.lazy_cg import _woodbury

    key = jax.random.PRNGKey(21)
    lpc = lazy_pivoted_cholesky(kernel, x, 8, key=jax.random.PRNGKey(5))
    k_dense = kernel(x) + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
    # preconditioned solve with the RPC factor reproduces the exact solve
    sol = _woodbury(lpc, s2)(y[:, None])
    p_dense = lpc @ lpc.T + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(sol[:, 0]),
        np.asarray(jnp.linalg.solve(p_dense, y)),
        atol=1e-8,
    )
    val = jax.jit(
        lambda k, yy, ss: lazy_cg_mll(
            k, x, yy, key, ss, block=80,
            num_probes=16, max_iters=300, tol=1e-12, precond_rank=8,
            precond_key=jax.random.PRNGKey(5),
        )
    )(kernel, y, s2)
    exact = (
        -0.5 * y @ jnp.linalg.solve(k_dense, y)
        - 0.5 * jnp.linalg.slogdet(k_dense)[1]
        - 0.5 * x.shape[0] * jnp.log(2 * jnp.pi)
    )
    assert abs(float(val - exact)) < 0.02 * abs(float(exact)) + 1.0


def test_lazy_mll_preconditioned_matches_dense():
    kernel, x, y, _, s2 = _setup()
    key = jax.random.PRNGKey(21)
    val_lazy = jax.jit(
        lambda k, yy, ss: lazy_cg_mll(
            k, x, yy, key, ss, block=80,
            num_probes=16, max_iters=300, tol=1e-12, precond_rank=8,
        )
    )(kernel, y, s2)
    k_dense = kernel(x) + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
    val_dense = cg_mll(
        k_dense, y, key, s2,
        num_probes=16, max_iters=300, tol=1e-12, precond_rank=8,
    )
    # the pivoted-Cholesky factors agree to rounding, so the N(0, P)
    # probes (and everything downstream) track to high precision
    assert abs(float(val_lazy - val_dense)) < 1e-6


def test_lazy_posterior_matches_cholesky():
    kernel, x, y, xs, s2 = _setup()
    mean_l, cov_l = jax.jit(
        lambda k, yy: lazy_cg_posterior(
            k, x, yy, xs, s2, block=60, max_iters=400, tol=1e-13
        )
    )(kernel, y)
    k_xx = kernel(x) + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
    k_sx = kernel(xs, x)
    sol = jnp.linalg.solve(k_xx, jnp.concatenate([y[:, None], k_sx.T], axis=1))
    mean_ref = k_sx @ sol[:, 0]
    cov_ref = kernel(xs) - k_sx @ sol[:, 1:]
    np.testing.assert_allclose(np.asarray(mean_l), np.asarray(mean_ref), atol=1e-7)
    np.testing.assert_allclose(np.asarray(cov_l), np.asarray(cov_ref), atol=1e-7)


def test_lazy_cg_rejects_indivisible_block():
    kernel, x, y, _, s2 = _setup(n=50)
    with pytest.raises(ValueError, match="divisible"):
        lazy_cg_mll(kernel, x, y, jax.random.PRNGKey(0), s2, block=32)


def test_lazy_mll_gibbs_kernel_via_cross_fn():
    """Gibbs per-point lengthscales packed into the row payload
    (x ∥ log ℓ) and unpacked in cross_fn — the documented pattern for
    row-aligned kernel state, identical to the sharded path's."""
    from nonstationary_precip_tpu.kernels import GibbsKernel

    n, d = 160, 2
    rng = np.random.default_rng(33)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float64)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float64)
    log_ell = jnp.asarray(0.3 * rng.normal(size=(n, d)), jnp.float64)
    s2 = jnp.asarray(0.3, jnp.float64)
    key = jax.random.PRNGKey(14)
    gibbs = GibbsKernel()

    def cross(kern, xa_aug, xb_aug):
        xa, la = xa_aug[:, :d], jnp.exp(xa_aug[:, d:])
        xb, lb = xb_aug[:, :d], jnp.exp(xb_aug[:, d:])
        return kern(xa, la, xb, lb)

    def f_lazy(le, yy):
        aug = jnp.concatenate([x, le], axis=1)
        return lazy_cg_mll(
            gibbs, aug, yy, key, s2, block=40,
            num_probes=16, max_iters=250, tol=1e-12, cross_fn=cross,
        )

    val_l, (g_ell, g_y) = jax.jit(
        lambda le, yy: jax.value_and_grad(f_lazy, argnums=(0, 1))(le, yy)
    )(log_ell, y)

    def f_dense(le, yy):
        km = gibbs(x, jnp.exp(le)) + s2 * jnp.eye(n, dtype=jnp.float64)
        return cg_mll(km, yy, key, s2, num_probes=16, max_iters=250, tol=1e-12)

    val_d, (g_ell_d, g_y_d) = jax.value_and_grad(f_dense, argnums=(0, 1))(
        log_ell, y
    )
    assert abs(float(val_l - val_d)) < 1e-8
    np.testing.assert_allclose(np.asarray(g_ell), np.asarray(g_ell_d), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_y), np.asarray(g_y_d), atol=1e-8)


def test_exact_gp_block_routes_matrix_free():
    """ExactGP.mll/posterior(block=...) rides the lazy path and agrees
    with the dense solver='cg' route / the Cholesky posterior."""
    from nonstationary_precip_tpu.models.exact_gp import ExactGP

    kernel, x, y, xs, _ = _setup(n=120, seed=40)
    gp = ExactGP.create(kernel, noise=0.2, dtype=jnp.float64)
    key = jax.random.PRNGKey(5)
    kw = dict(solver="cg", num_probes=16, max_iters=300)
    v_lazy = gp.mll(x, y, key=key, block=40, **kw)
    v_dense = gp.mll(x, y, key=key, **kw)
    assert abs(float(v_lazy - v_dense)) < 1e-8
    post_l = gp.posterior(x, y, xs, solver="cg", block=40, tol=1e-13)
    post_c = gp.posterior(x, y, xs)
    np.testing.assert_allclose(
        np.asarray(post_l.mean), np.asarray(post_c.mean), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(post_l.cov), np.asarray(post_c.cov), atol=1e-6
    )
    with pytest.raises(ValueError, match="matrix-free"):
        gp.mll(x, y, solver="chol", block=40)


def test_lazy_mll_trains_under_jit_scan():
    """A tiny Adam loop over the lazy objective: one compiled scan, loss
    decreases — the custom VJP composes with optax + lax.scan."""
    import optax

    kernel, x, y, _, s2 = _setup(n=160, seed=31)
    opt = optax.adam(0.05)
    key = jax.random.PRNGKey(13)  # fixed probes: common random numbers

    def loss(k):
        return -lazy_cg_mll(
            k, x, y, key, s2, block=40,
            num_probes=8, max_iters=150, tol=1e-10,
        )

    def step(carry, _):
        k, st = carry
        val, g = jax.value_and_grad(loss)(k)
        up, st = opt.update(g, st)
        return (optax.apply_updates(k, up), st), val

    (_, _), vals = jax.jit(
        lambda k0: jax.lax.scan(step, (k0, opt.init(k0)), None, length=8)
    )(kernel)
    assert np.all(np.isfinite(np.asarray(vals)))
    assert float(vals[-1]) < float(vals[0])
