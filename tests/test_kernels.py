"""L1 kernels vs closed-form / naive-numpy oracles."""

import numpy as np
import jax.numpy as jnp

from nonstationary_precip_tpu.kernels import (
    RBF,
    Periodic,
    Matern52,
    Scale,
    GibbsKernel,
    gibbs_gram,
    gibbs_diag,
)
from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference
from nonstationary_precip_tpu.kernels.multivariate_gibbs import (
    sigma_components_2d,
    paciorek_schervish_gram_2d,
)
def _naive_rbf(x1, x2, ell):
    out = np.zeros((len(x1), len(x2)))
    for i, a in enumerate(x1):
        for j, b in enumerate(x2):
            out[i, j] = np.exp(-0.5 * np.sum((a - b) ** 2 / ell**2))
    return out


def test_rbf_matches_naive(rng):
    x1 = rng.normal(size=(12, 3))
    x2 = rng.normal(size=(9, 3))
    ell = np.array([0.5, 1.3, 2.0])
    k = RBF.create(3, lengthscale=ell, dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(k(jnp.asarray(x1), jnp.asarray(x2))),
        _naive_rbf(x1, x2, ell),
        rtol=1e-8,
        atol=1e-10,
    )
    np.testing.assert_allclose(np.asarray(k.diag(jnp.asarray(x1))), 1.0)


def test_rbf_default_init_is_gpytorch_softplus_zero():
    k = RBF.create(2)
    np.testing.assert_allclose(np.asarray(k.lengthscale), np.log(2.0), rtol=1e-6)


def test_scale_sum_product(rng):
    x = jnp.asarray(rng.normal(size=(8, 2)))
    k1 = RBF.create(2, lengthscale=1.0, dtype=jnp.float64)
    k2 = RBF.create(2, lengthscale=2.0, dtype=jnp.float64)
    s = Scale.create(k1, outputscale=3.0, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(s(x)), 3.0 * np.asarray(k1(x)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray((k1 + k2)(x)), np.asarray(k1(x)) + np.asarray(k2(x)), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray((k1 * k2)(x)), np.asarray(k1(x)) * np.asarray(k2(x)), rtol=1e-8
    )


def test_scale_lower_bound():
    k = Scale.create(RBF.create(1), outputscale=7.7, lower_bound=7.0)
    assert float(k.outputscale) > 7.0
    np.testing.assert_allclose(float(k.outputscale), 7.7, rtol=1e-5)


def test_active_dims(rng):
    x = jnp.asarray(rng.normal(size=(10, 3)))
    k_full = RBF.create(1, lengthscale=1.0, dtype=jnp.float64)
    k_act = RBF.create(1, lengthscale=1.0, active_dims=(1,), dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(k_act(x)), np.asarray(k_full(x[:, 1:2])), rtol=1e-8
    )


def test_periodic_closed_form(rng):
    t1 = rng.normal(size=(7, 1))
    t2 = rng.normal(size=(5, 1))
    ell, p = 1.7, 0.9
    k = Periodic.create(1, lengthscale=ell, period=p, dtype=jnp.float64)
    ref = np.exp(-2.0 * np.sin(np.pi * (t1 - t2.T) / p) ** 2 / ell)
    np.testing.assert_allclose(
        np.asarray(k(jnp.asarray(t1), jnp.asarray(t2))), ref, rtol=1e-8
    )


def test_matern52_diag_and_symmetry(rng):
    x = jnp.asarray(rng.normal(size=(9, 2)))
    k = Matern52.create(2, lengthscale=1.1, dtype=jnp.float64)
    g = np.asarray(k(x))
    np.testing.assert_allclose(g, g.T, rtol=1e-7)
    np.testing.assert_allclose(np.diag(g), 1.0, atol=1e-6)


# -- Gibbs ---------------------------------------------------------------------


def _naive_gibbs(x1, ell1, x2, ell2):
    """Direct per-pair evaluation of R&W eq 4.32 (the reference math,
    /root/reference/models/gibbs_kernels.py:154-162)."""
    n1, n2 = len(x1), len(x2)
    out = np.zeros((n1, n2))
    for i in range(n1):
        for j in range(n2):
            ss = ell1[i] ** 2 + ell2[j] ** 2
            pref = np.prod(np.sqrt(2 * ell1[i] * ell2[j] / ss))
            quad = np.sum((x1[i] - x2[j]) ** 2 / ss)
            out[i, j] = pref * np.exp(-quad)
    return out


def test_gibbs_matches_naive(rng):
    x1 = rng.normal(size=(11, 2))
    x2 = rng.normal(size=(7, 2))
    ell1 = np.exp(rng.normal(size=(11, 2)) * 0.3)
    ell2 = np.exp(rng.normal(size=(7, 2)) * 0.3)
    ours = np.asarray(
        gibbs_gram(
            jnp.asarray(x1), jnp.asarray(ell1), jnp.asarray(x2), jnp.asarray(ell2)
        )
    )
    np.testing.assert_allclose(ours, _naive_gibbs(x1, ell1, x2, ell2), rtol=1e-8)


def test_gibbs_constant_ell_equals_rbf(rng):
    """With a constant lengthscale field c, Gibbs reduces to SE with ℓ = c."""
    x = rng.normal(size=(10, 2))
    c = 0.8
    ell = np.full((10, 2), c)
    g = np.asarray(gibbs_gram(jnp.asarray(x), jnp.asarray(ell), jnp.asarray(x), jnp.asarray(ell)))
    rbf = RBF.create(2, lengthscale=c, dtype=jnp.float64)
    np.testing.assert_allclose(g, np.asarray(rbf(jnp.asarray(x))), rtol=1e-8)


def test_gibbs_diag_is_one(rng):
    x = jnp.asarray(rng.normal(size=(6, 2)))
    ell = jnp.exp(jnp.asarray(rng.normal(size=(6, 2))))
    np.testing.assert_allclose(np.asarray(gibbs_diag(x, ell)), 1.0)
    g = np.asarray(gibbs_gram(x, ell, x, ell))
    np.testing.assert_allclose(np.diag(g), 1.0, rtol=1e-7)


def test_gibbs_kernel_wrapper_active_dims(rng):
    x = jnp.asarray(rng.normal(size=(8, 3)))
    ell = jnp.exp(jnp.asarray(rng.normal(size=(8, 2)) * 0.2))
    k = GibbsKernel(active_dims=(1, 2))
    direct = gibbs_gram(x[:, 1:3], ell, x[:, 1:3], ell)
    np.testing.assert_allclose(np.asarray(k(x, ell)), np.asarray(direct), rtol=1e-8)


def test_gibbs_psd(rng):
    x = rng.normal(size=(30, 2))
    ell = np.exp(rng.normal(size=(30, 2)) * 0.4)
    g = np.asarray(gibbs_gram_reference(jnp.asarray(x), jnp.asarray(ell), jnp.asarray(x), jnp.asarray(ell)))
    evs = np.linalg.eigvalsh(g)
    assert evs.min() > -1e-8


# -- multivariate Gibbs --------------------------------------------------------


def _naive_ps(x1, sigs1, x2, sigs2, jitter=1e-5):
    """Per-pair Paciorek–Schervish with explicit 2x2 linalg (the reference
    math, multivariate_gibbs_kernel.py:141-150, incl. jittered inverse)."""
    n1, n2 = len(x1), len(x2)
    out = np.zeros((n1, n2))
    for i in range(n1):
        for j in range(n2):
            si, sj = sigs1[i], sigs2[j]
            m = (si + sj) / 2
            d = x1[i] - x2[j]
            pref = (
                np.linalg.det(si) ** 0.25
                * np.linalg.det(sj) ** 0.25
                / np.sqrt(np.linalg.det(m))
            )
            quad = d @ np.linalg.inv(m + jitter * np.eye(2)) @ d
            out[i, j] = pref * np.exp(-quad)
    return out


def test_paciorek_schervish_matches_naive(rng):
    n1, n2 = 9, 6
    x1 = rng.normal(size=(n1, 2))
    x2 = rng.normal(size=(n2, 2))
    h1 = rng.normal(size=(n1, 2))
    h2 = rng.normal(size=(n2, 2))
    d_mat = np.diag(rng.normal(size=2))

    s1 = sigma_components_2d(jnp.asarray(h1), jnp.asarray(d_mat))
    s2 = sigma_components_2d(jnp.asarray(h2), jnp.asarray(d_mat))
    ours = np.asarray(
        paciorek_schervish_gram_2d(jnp.asarray(x1), s1, jnp.asarray(x2), s2)
    )

    def full_sigmas(h):
        out = []
        for row in h:
            hh2 = np.outer(row, row) ** 2
            sig = np.log1p(np.exp(hh2)) + d_mat**2  # softplus elementwise
            out.append(sig)
        return np.array(out)

    ref = _naive_ps(x1, full_sigmas(h1), x2, full_sigmas(h2))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_softplus_transform_roundtrip():
    from nonstationary_precip_tpu.utils.transforms import raw_init, positive

    vals = jnp.asarray([1e-3, 0.5, 1.0, 7.0, 50.0])
    np.testing.assert_allclose(np.asarray(positive(raw_init(vals))), np.asarray(vals), rtol=1e-6)


def test_paciorek_schervish_large_h_stays_finite(rng):
    """f32 cancellation regression: at |h| ~ 40 the closed-form dets round
    to large NEGATIVE values without the Minkowski clamps, NaN-ing the
    Gram (observed training the sparse MV model on the UIB field).  The
    clamped Gram must stay finite with prefactor ≤ 1, and its gradient
    w.r.t. h must stay finite too."""
    import jax

    n = 8
    x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    h_big = jnp.asarray(40.0 * rng.normal(size=(n, 2)), jnp.float32)
    d_mat = jnp.asarray(np.diag(rng.normal(size=2)), jnp.float32)

    def gram(h):
        s = sigma_components_2d(h, d_mat)
        return paciorek_schervish_gram_2d(x, s, x, s)

    k = np.asarray(gram(h_big))
    assert np.isfinite(k).all()
    # |Σi|^¼|Σj|^¼ / √det M ≤ 1 by Minkowski's determinant inequality,
    # and exp(−quad) ≤ 1, so every kernel value is bounded by 1
    assert (k <= 1.0 + 1e-5).all()
    assert np.allclose(np.diag(k), 1.0, atol=1e-4)  # pref=1, quad=0 on the diagonal

    g = jax.grad(lambda h: jnp.sum(gram(h)))(h_big)
    assert np.isfinite(np.asarray(g)).all()


def test_multivariate_gibbs_diag_finite_at_large_h(rng):
    """k.diag must agree with the Gram diagonal (= 1 exactly) in the same
    |h| ~ 40 det-cancellation regime the Gram clamps handle: the old
    (det^0.25)^2/sqrt(det) form returned 0/0 = NaN there while the Gram
    stayed finite, silently NaN-ing any marginal-variance consumer."""
    from nonstationary_precip_tpu.kernels.multivariate_gibbs import (
        MultivariateGibbsKernel,
    )

    n = 8
    x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    h_big = jnp.asarray(40.0 * rng.normal(size=(n, 2)), jnp.float32)
    d_mat = jnp.asarray(np.diag(rng.normal(size=2)), jnp.float32)
    k = MultivariateGibbsKernel()
    d = np.asarray(k.diag(x, h_big, d_mat))
    assert d.shape == (n,)
    np.testing.assert_array_equal(d, 1.0)
    np.testing.assert_allclose(np.diag(np.asarray(k(x, h_big, d_mat))), d, atol=1e-4)


def test_learned_softplus_value_and_grad_at_extremes():
    """Above the threshold the transform is identity; its GRADIENT must
    stay finite for beta*x beyond the f32 exp-overflow point (~88) — the
    unclamped where-branch propagated inf/inf = NaN through the VJP."""
    import jax

    from nonstationary_precip_tpu.utils.transforms import LearnedSoftPlus

    sp = LearnedSoftPlus.create()
    x = jnp.asarray([-5.0, 0.0, 5.0, 25.0, 200.0], jnp.float32)
    y = np.asarray(sp(x))
    # below threshold: softplus; above: identity
    np.testing.assert_allclose(y[:3], np.log1p(np.exp([-5.0, 0.0, 5.0])), rtol=1e-6)
    np.testing.assert_allclose(y[3:], [25.0, 200.0], rtol=1e-7)
    g = np.asarray(jax.grad(lambda xx: jnp.sum(sp(xx)))(x))
    assert np.isfinite(g).all()
    np.testing.assert_allclose(g[4], 1.0, rtol=1e-6)  # identity branch
