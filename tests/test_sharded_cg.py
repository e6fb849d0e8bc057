"""Row-sharded BBMM (parallel/sharded_cg.py) vs the dense CG and Cholesky
oracles on the 8-device virtual CPU mesh.

The sharded matvec computes the same per-row dot products as the dense
one (merely partitioned over devices), so the CG trajectory — and with
the same key, the SLQ probes — must agree with ``ops/bbmm.py`` to
rounding, not just statistically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonstationary_precip_tpu.kernels import RBF, Scale
from nonstationary_precip_tpu.ops.bbmm import cg_mll
from nonstationary_precip_tpu.parallel import make_mesh
from nonstationary_precip_tpu.parallel.sharded_cg import (
    sharded_cg_mll,
    sharded_cg_posterior,
)

N_DEV = 8


def _setup(n=240, n_test=24, seed=30):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float64)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float64)
    xs = jnp.asarray(rng.normal(size=(n_test, 2)), jnp.float64)
    kernel = Scale.create(
        RBF.create(ard_dims=2, dtype=jnp.float64), dtype=jnp.float64
    )
    return kernel, x, y, xs, jnp.asarray(0.2, jnp.float64)


def test_sharded_mll_matches_dense_cg_and_cholesky():
    kernel, x, y, _, s2 = _setup()
    mesh = make_mesh(N_DEV)
    key = jax.random.PRNGKey(11)
    val_sh = jax.jit(
        lambda k, yy, ss: sharded_cg_mll(
            k, x, yy, key, ss, mesh, num_probes=32, max_iters=300, tol=1e-12
        )
    )(kernel, y, s2)
    k_dense = kernel(x) + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
    val_dense = cg_mll(
        k_dense, y, key, s2, num_probes=32, max_iters=300, tol=1e-12
    )
    # identical probes + identical row dot products → rounding-level match
    assert abs(float(val_sh - val_dense)) < 1e-8
    exact = (
        -0.5 * y @ jnp.linalg.solve(k_dense, y)
        - 0.5 * jnp.linalg.slogdet(k_dense)[1]
        - 0.5 * x.shape[0] * jnp.log(2 * jnp.pi)
    )
    assert abs(float(val_sh - exact)) < 0.02 * abs(float(exact)) + 1.0


def test_sharded_mll_grads_match_dense_cg():
    kernel, x, y, _, s2 = _setup(n=160)
    mesh = make_mesh(N_DEV)
    key = jax.random.PRNGKey(12)

    def f_sh(k, yy, ss):
        return sharded_cg_mll(
            k, x, yy, key, ss, mesh, num_probes=16, max_iters=200, tol=1e-12
        )

    def f_dense(k, yy, ss):
        km = k(x) + ss * jnp.eye(x.shape[0], dtype=jnp.float64)
        return cg_mll(km, yy, key, ss, num_probes=16, max_iters=200, tol=1e-12)

    gs = jax.jit(jax.grad(f_sh, argnums=(0, 1, 2)))(kernel, y, s2)
    gd = jax.jit(jax.grad(f_dense, argnums=(0, 1, 2)))(kernel, y, s2)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)


def test_sharded_posterior_matches_cholesky():
    kernel, x, y, xs, s2 = _setup()
    mesh = make_mesh(N_DEV)
    mean_sh, cov_sh = jax.jit(
        lambda k, yy: sharded_cg_posterior(
            k, x, yy, xs, s2, mesh, max_iters=400, tol=1e-13
        )
    )(kernel, y)
    k_xx = kernel(x) + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
    k_sx = kernel(xs, x)
    sol = jnp.linalg.solve(k_xx, jnp.concatenate([y[:, None], k_sx.T], axis=1))
    mean_ref = k_sx @ sol[:, 0]
    cov_ref = kernel(xs) - k_sx @ sol[:, 1:]
    np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mean_ref), atol=1e-7)
    np.testing.assert_allclose(np.asarray(cov_sh), np.asarray(cov_ref), atol=1e-7)


def test_sharded_mll_preconditioned_matches_dense():
    """precond_rank > 0: the replicated pivoted-Cholesky factor and the
    N(0, P) probes make the sharded estimator track the dense
    preconditioned ``cg_mll`` (same pivots to rounding in f64, same
    probe construction under the same key)."""
    kernel, x, y, _, s2 = _setup()
    mesh = make_mesh(N_DEV)
    key = jax.random.PRNGKey(22)
    val_sh = jax.jit(
        lambda k, yy, ss: sharded_cg_mll(
            k, x, yy, key, ss, mesh,
            num_probes=16, max_iters=300, tol=1e-12, precond_rank=8,
        )
    )(kernel, y, s2)
    k_dense = kernel(x) + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
    val_dense = cg_mll(
        k_dense, y, key, s2,
        num_probes=16, max_iters=300, tol=1e-12, precond_rank=8,
    )
    assert abs(float(val_sh - val_dense)) < 1e-6
    exact = (
        -0.5 * y @ jnp.linalg.solve(k_dense, y)
        - 0.5 * jnp.linalg.slogdet(k_dense)[1]
        - 0.5 * x.shape[0] * jnp.log(2 * jnp.pi)
    )
    assert abs(float(val_sh - exact)) < 0.02 * abs(float(exact)) + 1.0


def test_sharded_mll_preconditioned_grads_match_dense():
    kernel, x, y, _, s2 = _setup(n=160)
    mesh = make_mesh(N_DEV)
    key = jax.random.PRNGKey(23)

    def f_sh(k, yy, ss):
        return sharded_cg_mll(
            k, x, yy, key, ss, mesh,
            num_probes=16, max_iters=200, tol=1e-12, precond_rank=8,
        )

    def f_dense(k, yy, ss):
        km = k(x) + ss * jnp.eye(x.shape[0], dtype=jnp.float64)
        return cg_mll(
            km, yy, key, ss,
            num_probes=16, max_iters=200, tol=1e-12, precond_rank=8,
        )

    gs = jax.jit(jax.grad(f_sh, argnums=(0, 1)))(kernel, y, s2)
    gd = jax.jit(jax.grad(f_dense, argnums=(0, 1)))(kernel, y, s2)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_posterior_preconditioned_matches_cholesky():
    kernel, x, y, xs, s2 = _setup()
    mesh = make_mesh(N_DEV)
    mean_sh, cov_sh = jax.jit(
        lambda k, yy: sharded_cg_posterior(
            k, x, yy, xs, s2, mesh, max_iters=120, tol=1e-13, precond_rank=8
        )
    )(kernel, y)
    k_xx = kernel(x) + s2 * jnp.eye(x.shape[0], dtype=jnp.float64)
    k_sx = kernel(xs, x)
    sol = jnp.linalg.solve(k_xx, jnp.concatenate([y[:, None], k_sx.T], axis=1))
    mean_ref = k_sx @ sol[:, 0]
    cov_ref = kernel(xs) - k_sx @ sol[:, 1:]
    np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mean_ref), atol=1e-7)
    np.testing.assert_allclose(np.asarray(cov_sh), np.asarray(cov_ref), atol=1e-7)


def test_sharded_cg_rejects_indivisible_n():
    kernel, x, y, _, s2 = _setup(n=240)
    mesh = make_mesh(N_DEV)
    with pytest.raises(ValueError, match="divisible"):
        sharded_cg_mll(
            kernel, x[:-3], y[:-3], jax.random.PRNGKey(0), s2, mesh
        )


def test_sharded_mll_gibbs_kernel_via_cross_fn():
    """Nonstationary Gibbs kernel, whose per-point lengthscales align with
    Gram ROWS: pack ell into the sharded row payload (x ∥ ell) and unpack
    in cross_fn — the documented pattern for row-aligned kernel state."""
    from nonstationary_precip_tpu.kernels import GibbsKernel

    n, d = 160, 2
    rng = np.random.default_rng(33)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float64)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float64)
    log_ell = jnp.asarray(0.3 * rng.normal(size=(n, d)), jnp.float64)
    s2 = jnp.asarray(0.3, jnp.float64)
    mesh = make_mesh(N_DEV)
    key = jax.random.PRNGKey(14)
    gibbs = GibbsKernel()

    def cross(kern, xa_aug, xb_aug):
        xa, la = xa_aug[:, :d], jnp.exp(xa_aug[:, d:])
        xb, lb = xb_aug[:, :d], jnp.exp(xb_aug[:, d:])
        return kern(xa, la, xb, lb)

    def f_sh(le, yy):
        aug = jnp.concatenate([x, le], axis=1)
        return sharded_cg_mll(
            gibbs, aug, yy, key, s2, mesh,
            num_probes=16, max_iters=250, tol=1e-12, cross_fn=cross,
        )

    val_sh, (g_ell, g_y) = jax.jit(
        lambda le, yy: jax.value_and_grad(f_sh, argnums=(0, 1))(le, yy)
    )(log_ell, y)

    from nonstationary_precip_tpu.ops.bbmm import cg_mll

    def f_dense(le, yy):
        km = gibbs(x, jnp.exp(le)) + s2 * jnp.eye(n, dtype=jnp.float64)
        return cg_mll(km, yy, key, s2, num_probes=16, max_iters=250, tol=1e-12)

    val_d, (g_ell_d, g_y_d) = jax.value_and_grad(f_dense, argnums=(0, 1))(
        log_ell, y
    )
    assert abs(float(val_sh - val_d)) < 1e-8
    np.testing.assert_allclose(np.asarray(g_ell), np.asarray(g_ell_d), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_y), np.asarray(g_y_d), atol=1e-8)


def test_sharded_mll_trains_under_jit_scan():
    """A tiny Adam loop over the sharded objective: one compiled scan,
    loss decreases — the custom VJP composes with optax + lax.scan."""
    import optax

    kernel, x, y, _, s2 = _setup(n=160, seed=31)
    mesh = make_mesh(N_DEV)
    opt = optax.adam(0.05)
    key = jax.random.PRNGKey(13)  # fixed probes: common random numbers

    def loss(k):
        return -sharded_cg_mll(
            k, x, y, key, s2, mesh, num_probes=8, max_iters=150, tol=1e-10
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
