"""L0 linear algebra: Cholesky-centric ops vs numpy/scipy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.stats

from nonstationary_precip_tpu.ops import linalg
from nonstationary_precip_tpu.ops.linalg import (
    add_jitter,
    safe_cholesky,
    tri_solve,
    cho_solve,
    solve_psd,
    mvn_logpdf_from_chol,
    robust_logdet,
)


def _spd(rng, n):
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def test_safe_cholesky_matches_numpy(rng):
    a = _spd(rng, 40)
    l = np.asarray(safe_cholesky(jnp.asarray(a, jnp.float64)))
    np.testing.assert_allclose(l, np.linalg.cholesky(a), rtol=1e-10)


def test_safe_cholesky_rescues_semidefinite(rng):
    # rank-deficient: plain cholesky NaNs, jitter ladder must rescue
    v = rng.normal(size=(30, 5))
    a = v @ v.T  # rank 5
    l = np.asarray(safe_cholesky(jnp.asarray(a, jnp.float64), jitter=1e-10))
    assert np.isfinite(l).all()
    rec = l @ l.T
    np.testing.assert_allclose(rec, a, atol=1e-4)


def test_tri_solve_and_cho_solve(rng):
    a = _spd(rng, 25)
    b = rng.normal(size=(25, 3))
    y = rng.normal(size=25)
    l = np.linalg.cholesky(a)
    lj = jnp.asarray(l, jnp.float64)
    np.testing.assert_allclose(
        np.asarray(tri_solve(lj, jnp.asarray(b, jnp.float64))),
        np.linalg.solve(l, b),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(cho_solve(lj, jnp.asarray(y, jnp.float64))),
        np.linalg.solve(a, y),
        rtol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(solve_psd(jnp.asarray(a, jnp.float64), jnp.asarray(y, jnp.float64))),
        np.linalg.solve(a, y),
        rtol=1e-8,
    )


def test_mvn_logpdf_matches_scipy(rng):
    n = 20
    a = _spd(rng, n)
    mean = rng.normal(size=n)
    y = rng.normal(size=n)
    l = jnp.asarray(np.linalg.cholesky(a), jnp.float64)
    ours = float(
        mvn_logpdf_from_chol(jnp.asarray(y, jnp.float64), jnp.asarray(mean, jnp.float64), l)
    )
    ref = scipy.stats.multivariate_normal(mean, a).logpdf(y)
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_mvn_logpdf_batched(rng):
    n, d = 15, 3
    mats = np.stack([_spd(rng, n) for _ in range(d)])
    means = rng.normal(size=(d, n))
    ys = rng.normal(size=(d, n))
    chols = jnp.asarray(np.linalg.cholesky(mats), jnp.float64)
    ours = np.asarray(
        mvn_logpdf_from_chol(jnp.asarray(ys, jnp.float64), jnp.asarray(means, jnp.float64), chols)
    )
    refs = [
        scipy.stats.multivariate_normal(means[i], mats[i]).logpdf(ys[i]) for i in range(d)
    ]
    np.testing.assert_allclose(ours, refs, rtol=1e-9)


def test_robust_logdet(rng):
    a = _spd(rng, 10)
    val = float(robust_logdet(jnp.asarray(a, jnp.float64)))
    np.testing.assert_allclose(val, np.linalg.slogdet(a)[1], rtol=1e-9)
    # near-singular: must return finite via jitter escalation
    v = rng.normal(size=(10, 2))
    sing = v @ v.T
    val2 = float(robust_logdet(jnp.asarray(sing, jnp.float64)))
    assert np.isfinite(val2)


def test_safe_cholesky_extreme_gibbs_conditioning(rng):
    """Extreme latent lengthscale fields produce near-singular Grams mid-
    optimisation; the jitter ladder must keep the factor finite in f32."""
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram

    x = jnp.asarray(rng.normal(size=(40, 2)), jnp.float32)
    for scale in (1e3, 1e-3):  # huge ℓ → rank-1-ish Gram; tiny ℓ → ~identity
        ell = jnp.full((40, 2), scale, jnp.float32)
        k = gibbs_gram(x, ell, x, ell) + 1e-4 * jnp.eye(40, dtype=jnp.float32)
        l = np.asarray(safe_cholesky(k))
        assert np.isfinite(l).all(), f"scale {scale}"
        rec = l @ l.T
        assert np.abs(rec - np.asarray(k)).max() < 1e-2


def test_add_jitter():
    a = jnp.zeros((4, 4))
    np.testing.assert_allclose(np.asarray(add_jitter(a, 0.5)), 0.5 * np.eye(4))


def test_diag_part_matches_diagonal_values_and_grads():
    """diag_part is the scatter-free diagonal for differentiated logdets:
    values bit-exact vs jnp.diagonal, gradients identical."""
    rng = np.random.default_rng(7)
    for shape in ((6, 6), (3, 5, 5)):
        m = jnp.asarray(rng.normal(size=shape))
        assert jnp.array_equal(
            linalg.diag_part(m), jnp.diagonal(m, axis1=-2, axis2=-1)
        )

    a = jnp.asarray(rng.normal(size=(4, 4)) + 3 * np.eye(4))

    def f_ref(mat):
        return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(mat, axis1=-2, axis2=-1))))

    def f_new(mat):
        return jnp.sum(jnp.log(jnp.abs(linalg.diag_part(mat))))

    g_ref = jax.grad(f_ref)(a)
    g_new = jax.grad(f_new)(a)
    assert float(jnp.max(jnp.abs(g_ref - g_new))) < 1e-12


def test_safe_cholesky_batched_jitters_only_failing_members(rng):
    """GPyTorch's psd_safe_cholesky semantics at batch rank: a retry
    triggered by ONE bad member must leave the healthy members' factors
    BIT-IDENTICAL to factoring them alone (never-failed members carry
    jitter 0 through every retry), so one ill-conditioned split in a
    lockstep-stacked batch cannot perturb the other trajectories."""
    import jax.numpy as jnp

    from nonstationary_precip_tpu.ops.linalg import safe_cholesky

    a = rng.normal(size=(40, 40))
    gram = a @ a.T
    good = jnp.asarray(gram + 40 * np.eye(40), jnp.float32)
    # mildly indefinite (min eig = -2e-3): rescuable within the escalating
    # 1e-5 * 10^i jitter ladder, but guaranteed to fail the plain factor
    w_min = np.linalg.eigvalsh(gram).min()
    bad = jnp.asarray(gram - (w_min + 2e-3) * np.eye(40), jnp.float32)

    stacked = safe_cholesky(jnp.stack([good, bad]))
    alone = safe_cholesky(good)
    assert np.isfinite(np.asarray(stacked)).all()
    np.testing.assert_array_equal(np.asarray(stacked[0]), np.asarray(alone))
    # the rescued member really is a factor of (bad + j*I) for some j >= 0
    l1 = np.asarray(stacked[1], np.float64)
    recon = l1 @ l1.T
    off = recon - np.asarray(bad, np.float64)
    j_est = np.diag(off).mean()
    assert j_est > 0  # it DID take jitter
    np.testing.assert_allclose(off, j_est * np.eye(40), atol=5e-3 * max(j_est, 1.0))
