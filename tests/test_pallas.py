"""Pallas kernels vs their pure-jnp oracles (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference


def _interp_forward(x1, ell1, x2, ell2):
    """Run the pallas Gram in interpreter mode (no TPU needed)."""
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_gram as pg

    with pltpu.force_tpu_interpret_mode():
        return pg._forward(x1, ell1, x2, ell2)


@pytest.mark.parametrize("n1,n2,d", [(40, 30, 2), (300, 257, 3), (256, 256, 1)])
def test_pallas_gibbs_gram_matches_reference(rng, n1, n2, d):
    x1 = jnp.asarray(rng.normal(size=(n1, d)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(n2, d)), jnp.float32)
    ell1 = jnp.asarray(np.exp(rng.normal(size=(n1, d)) * 0.3), jnp.float32)
    ell2 = jnp.asarray(np.exp(rng.normal(size=(n2, d)) * 0.3), jnp.float32)
    ours = np.asarray(_interp_forward(x1, ell1, x2, ell2))
    ref = np.asarray(gibbs_gram_reference(x1, ell1, x2, ell2))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)


def test_pallas_gibbs_gram_custom_vjp_matches_reference_grad(rng):
    """The custom-VJP backward must equal the jnp reference gradient."""
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_gram as pg

    n1, n2, d = 24, 16, 2
    x1 = jnp.asarray(rng.normal(size=(n1, d)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(n2, d)), jnp.float32)
    ell1 = jnp.asarray(np.exp(rng.normal(size=(n1, d)) * 0.3), jnp.float32)
    ell2 = jnp.asarray(np.exp(rng.normal(size=(n2, d)) * 0.3), jnp.float32)
    w = jnp.asarray(rng.normal(size=(n1, n2)), jnp.float32)

    def loss_pallas(e1, e2, z):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(w * pg.gibbs_gram_pallas(x1, e1, z, e2))

    def loss_ref(e1, e2, z):
        return jnp.sum(w * gibbs_gram_reference(x1, e1, z, e2))

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(ell1, ell2, x2)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(ell1, ell2, x2)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_pallas_blocked_cholesky_matches_numpy(rng):
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_chol as pc

    for n in (256, 300):  # exact multiple and padded case
        a = rng.normal(size=(n, n))
        a = (a @ a.T / n + np.eye(n)).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            l = np.asarray(pc._forward(jnp.asarray(a)))
        ref = np.linalg.cholesky(a.astype(np.float64))
        assert np.allclose(l, ref, rtol=5e-3, atol=5e-4), f"n={n}"
        assert np.allclose(np.triu(l, 1), 0.0)


def test_pallas_blocked_cholesky_vjp(rng):
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_chol as pc

    n = 256
    a = rng.normal(size=(n, n))
    a = (a @ a.T / n + np.eye(n)).astype(np.float32)
    w = rng.normal(size=(n, n)).astype(np.float32)

    def loss_p(m):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(jnp.asarray(w) * pc.blocked_cholesky(m))

    def loss_r(m):
        return jnp.sum(jnp.asarray(w) * jnp.linalg.cholesky(m))

    g_p = jax.grad(loss_p)(jnp.asarray(a))
    g_r = jax.grad(loss_r)(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), rtol=1e-3, atol=1e-4)


def test_streaming_cholesky_matches_numpy(rng):
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_chol as pc

    n = 256
    a = rng.normal(size=(n, n))
    a = (a @ a.T / n + np.eye(n)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        l = np.asarray(pc._forward_streaming(jnp.asarray(a)))
    ref = np.linalg.cholesky(a.astype(np.float64))
    assert np.allclose(l, ref, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.triu(l, 1), 0.0)


def test_pallas_blocked_trsm_matches_numpy(rng):
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_trsm as pt

    for n, k in ((256, 128), (300, 70)):  # exact and padded
        a = rng.normal(size=(n, n))
        l = np.linalg.cholesky(a @ a.T / n + np.eye(n)).astype(np.float32)
        b = rng.normal(size=(n, k)).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            x = np.asarray(pt._forward(jnp.asarray(l), jnp.asarray(b)))
        ref = np.linalg.solve(l.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(x, ref, rtol=5e-3, atol=5e-4)


def test_pallas_blocked_trsm_vjp(rng):
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_trsm as pt

    n, k = 256, 64
    a = rng.normal(size=(n, n))
    l = jnp.asarray(np.linalg.cholesky(a @ a.T / n + np.eye(n)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))

    def loss_p(l_, b_):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(w * pt.blocked_trsm(l_, b_))

    def loss_r(l_, b_):
        return jnp.sum(
            w * jax.lax.linalg.triangular_solve(l_, b_, left_side=True, lower=True)
        )

    gp = jax.grad(loss_p, argnums=(0, 1))(l, b)
    gr = jax.grad(loss_r, argnums=(0, 1))(l, b)
    for a_, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=2e-3, atol=1e-4)


def test_pallas_eligibility_gating():
    import nonstationary_precip_tpu.ops.pallas_gram as pg

    x_small = jnp.zeros((4, 2), jnp.float32)
    assert not pg.eligible(x_small, x_small)  # too small / cpu backend
    x64 = jnp.zeros((400, 2), jnp.float64)
    assert not pg.eligible(x64, x64)  # wrong dtype


@pytest.mark.parametrize("n,d", [(256, 2), (300, 2), (384, 3)])
def test_pallas_fused_gibbs_chol_solve_matches_reference(rng, n, d):
    """Fused Gram→chol→solve kernel vs the pure-jnp composition (padding
    path exercised at n=300)."""
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_fused as pf

    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    ell = jnp.asarray(np.exp(rng.normal(size=(n, d)) * 0.3) + 0.2, jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    s2 = jnp.asarray(0.644, jnp.float32)
    noise = jnp.asarray(0.011, jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        chol, alpha = pf._forward(x, ell, y, s2, noise)
    chol_r, alpha_r = pf._reference(x, ell, y, s2, noise)
    np.testing.assert_allclose(np.asarray(chol), np.asarray(chol_r), rtol=3e-4, atol=3e-5)
    # α passes through an n-step f32 forward substitution: reduction-order
    # noise reaches a few 1e-3 absolute on near-zero entries
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_r), rtol=3e-3, atol=5e-3)
    # strictly lower triangular output
    np.testing.assert_allclose(np.triu(np.asarray(chol), 1), 0.0)


def test_pallas_fused_gibbs_chol_solve_vjp(rng):
    """Custom VJP: gradients of a scalar of (L, α) w.r.t. every input must
    match the jnp composition."""
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_fused as pf

    n, d = 256, 2
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    ell = jnp.asarray(np.exp(rng.normal(size=(n, d)) * 0.3) + 0.2, jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    wl = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    wa = jnp.asarray(rng.normal(size=n), jnp.float32)

    def loss_p(ell_, y_, s2_, noise_):
        with pltpu.force_tpu_interpret_mode():
            chol, alpha = pf.gibbs_chol_solve_fused(x, ell_, y_, s2_, noise_)
        return jnp.sum(wl * chol) + jnp.sum(wa * alpha)

    def loss_r(ell_, y_, s2_, noise_):
        chol, alpha = pf._reference(x, ell_, y_, s2_, noise_)
        return jnp.sum(wl * chol) + jnp.sum(wa * alpha)

    args = (ell, y, jnp.asarray(0.644, jnp.float32), jnp.asarray(0.011, jnp.float32))
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(*args)
    # the closed-form pullback is algebraically exact (see the f64 test
    # below: 1e-12); in f32 the two equivalent solve orders diverge by up
    # to ~1e-2 relative through the conditioning of L
    for a_, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-2, atol=1e-2)


def test_fused_closed_form_bwd_exact_in_f64(rng):
    """The hand-derived (L, α) pullback — triangular-solve Cholesky
    pullback, no refactorisation — equals jax.vjp of the reference
    composition to f64 roundoff."""
    import nonstationary_precip_tpu.ops.pallas_fused as pf

    with jax.enable_x64(True):
        n, d = 96, 2
        x = jnp.asarray(rng.normal(size=(n, d)))
        ell = jnp.asarray(np.exp(rng.normal(size=(n, d)) * 0.3) + 0.2)
        y = jnp.asarray(rng.normal(size=n))
        wl = jnp.asarray(rng.normal(size=(n, n)))
        wa = jnp.asarray(rng.normal(size=n))
        s2 = jnp.asarray(0.644)
        noise = jnp.asarray(0.011)
        out = pf._reference(x, ell, y, s2, noise)
        _, vjp = jax.vjp(pf._reference, x, ell, y, s2, noise)
        ref = vjp((wl, wa))
        ours = pf._bwd((x, ell, y, s2, noise, out), (wl, wa))
        for a_, b_ in zip(ours, ref):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-9, atol=1e-9)


def test_fused_dispatcher_xla_fallback_matches(rng):
    """gibbs_noisy_chol_alpha with use_fused=False equals the fused
    reference math (the CPU/ineligible path)."""
    import nonstationary_precip_tpu.ops.pallas_fused as pf

    n, d = 64, 2
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    ell = jnp.asarray(np.exp(rng.normal(size=(n, d)) * 0.3) + 0.2, jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    chol, alpha = pf.gibbs_noisy_chol_alpha(x, ell, y, 0.644, 0.011, use_fused=False)
    chol_r, alpha_r = pf._reference(x, ell, y, 0.644, 0.011)
    np.testing.assert_allclose(np.asarray(chol), np.asarray(chol_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_r), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n", [256, 512, 700])
def test_pallas_streaming_cholesky_v2_matches_numpy(rng, n):
    """GEMM-formulation streaming Cholesky (v2): exactness incl. padding."""
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_chol as pc

    a = rng.normal(size=(n, n))
    a = (a @ a.T / n + np.eye(n)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        l = np.asarray(pc._forward_streaming2(jnp.asarray(a), p=256))
    ref = np.linalg.cholesky(a.astype(np.float64))
    assert np.allclose(l, ref, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.triu(l, 1), 0.0)


@pytest.mark.parametrize("b,n", [(3, 128), (5, 250), (2, 300)])
def test_pallas_chol_inv_batched_matches_numpy(rng, b, n):
    """Batched (L, L⁻¹) kernel vs numpy (padding to the next pow-2)."""
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_chol as pc

    mats = []
    for _ in range(b):
        a = rng.normal(size=(n, n))
        mats.append(a @ a.T / n + np.eye(n))
    mats = jnp.asarray(np.stack(mats), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        l, li = pc._chol_inv_forward(mats)
    for i in range(b):
        ref = np.linalg.cholesky(np.asarray(mats[i], np.float64))
        np.testing.assert_allclose(np.asarray(l[i]), ref, rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(li[i]), np.linalg.inv(ref), rtol=5e-3, atol=2e-3
        )


def test_chol_inv_batched_vjp_matches_reference(rng):
    """Matmul-only pullback (uses the primal L⁻¹ — no solves) == jax.vjp
    of the chol+solve composition, checked in f64."""
    import nonstationary_precip_tpu.ops.pallas_chol as pc

    with jax.enable_x64(True):
        b, n = 2, 64
        mats = []
        for _ in range(b):
            a = rng.normal(size=(n, n))
            mats.append(a @ a.T / n + np.eye(n))
        mats = jnp.asarray(np.stack(mats))
        wl = jnp.asarray(rng.normal(size=(b, n, n)))
        wi = jnp.asarray(rng.normal(size=(b, n, n)))

        def ref(k):
            l = jnp.linalg.cholesky(k)
            li = jax.lax.linalg.triangular_solve(
                l, jnp.broadcast_to(jnp.eye(n), (b, n, n)), left_side=True, lower=True
            )
            return l, li

        out = ref(mats)
        _, vjp = jax.vjp(ref, mats)
        (gref,) = vjp((wl, wi))
        (gours,) = pc._ci_bwd(out, (wl, wi))
        np.testing.assert_allclose(np.asarray(gours), np.asarray(gref), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("t,mm,d", [(3, 128, 2), (5, 250, 2), (2, 200, 3)])
def test_pallas_svgp_precompute_matches_reference(rng, t, mm, d):
    """Fused gram→chol→W kernel (batched-inside recurrence) vs f64 truth,
    incl. the M=250→256 padding path.

    The real SVGP K_zz (random 2-D z, ε=1e-5) is numerically
    near-singular, so BOTH f32 paths sit O(1e-3) in L (and far more in
    W = L⁻ᵀP) from the f64 truth — the honest criterion is that the
    kernel's error is bounded by the XLA composition's own f32 error."""
    import nonstationary_precip_tpu.ops.pallas_svgp as ps
    from jax.experimental.pallas import tpu as pltpu

    z_np = rng.normal(size=(t, mm, d))
    ell_np = np.exp(rng.normal(size=(t, d)) * 0.3) + 0.3
    s2_np = np.exp(rng.normal(size=t) * 0.2)
    p_np = rng.normal(size=(t, mm, 2 * mm + 1))
    z = jnp.asarray(z_np, jnp.float32)
    ell = jnp.asarray(ell_np, jnp.float32)
    s2 = jnp.asarray(s2_np, jnp.float32)
    packed = jnp.asarray(p_np, jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        l, w, linv = ps._forward(z, ell, s2, packed)
    l = np.asarray(l)
    w = np.asarray(w)
    linv = np.asarray(linv)
    assert np.isfinite(l).all() and np.isfinite(w).all() and np.isfinite(linv).all()
    np.testing.assert_allclose(np.triu(l[0], 1), 0.0)

    l_r, w_r, linv_r = ps._reference(z, ell, s2, packed)
    with jax.enable_x64(True):
        l64, w64, linv64 = ps._reference(
            jnp.asarray(z_np), jnp.asarray(ell_np), jnp.asarray(s2_np), jnp.asarray(p_np)
        )
    l64 = np.asarray(l64)
    w64 = np.asarray(w64)
    err_l = np.max(np.abs(l - l64))
    err_l_xla = np.max(np.abs(np.asarray(l_r) - l64))
    err_w = np.max(np.abs(w - w64))
    err_w_xla = np.max(np.abs(np.asarray(w_r) - w64))
    assert err_l <= 2.0 * err_l_xla + 1e-5, (err_l, err_l_xla)
    assert err_w <= 2.0 * err_w_xla + 1e-3, (err_w, err_w_xla)
    # the exported inverse: honest criterion vs the XLA composition's own
    # f32 error (L⁻¹ amplifies by the condition number on these K_zz)
    err_i = np.max(np.abs(linv - np.asarray(linv64)))
    err_i_xla = np.max(np.abs(np.asarray(linv_r) - np.asarray(linv64)))
    assert err_i <= 2.0 * err_i_xla + 1e-3, (err_i, err_i_xla)


def test_pallas_svgp_precompute_bwd_exact_in_f64(rng):
    """Closed-form (L, W, L⁻¹) pullback == jax.vjp of the reference (f64),
    including the −Xᵀ X̄ Xᵀ term for the exported inverse."""
    import nonstationary_precip_tpu.ops.pallas_svgp as ps

    with jax.enable_x64(True):
        t, mm, d = 2, 48, 2
        z = jnp.asarray(rng.normal(size=(t, mm, d)))
        ell = jnp.asarray(np.exp(rng.normal(size=(t, d)) * 0.3) + 0.3)
        s2 = jnp.asarray(np.exp(rng.normal(size=t) * 0.2))
        packed = jnp.asarray(rng.normal(size=(t, mm, 2 * mm + 1)))
        wl = jnp.asarray(rng.normal(size=(t, mm, mm)))
        ww = jnp.asarray(rng.normal(size=(t, mm, 2 * mm + 1)))
        wx = jnp.asarray(rng.normal(size=(t, mm, mm)))

        out = ps._reference(z, ell, s2, packed)
        _, vjp = jax.vjp(ps._reference, z, ell, s2, packed)
        for cots in ((wl, ww, jnp.zeros_like(wx)), (wl, ww, wx)):
            ref = vjp(cots)
            ours = ps._bwd((z, ell, s2, out), cots)
            for a_, b_ in zip(ours, ref):
                # rtol 1e-7: the X̄ pullback's grads reach ~1e4 through the
                # inverse's conditioning; different op order costs ~1e-8 rel
                np.testing.assert_allclose(
                    np.asarray(a_), np.asarray(b_), rtol=1e-7, atol=1e-9
                )


def test_pallas_fused_in_kernel_jitter_retry(rng):
    """A singular K (noise=0, exact duplicate rows) NaNs the plain f32
    factorisation; the fused kernel's in-kernel pl.when retry must
    refactorise at escalated jitter and return a finite (L, α) whose
    L Lᵀ reconstructs K + extra·I for extra ∈ {1e-4, 1e-2}."""
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_fused as pf
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference

    n, d = 256, 2
    x_np = rng.normal(size=(n, d))
    x_np[100] = x_np[50]  # exact duplicate → K exactly singular at noise=0
    x = jnp.asarray(x_np, jnp.float32)
    ell = jnp.asarray(np.exp(rng.normal(size=(n, d)) * 0.3) + 0.2, jnp.float32)
    ell = ell.at[100].set(ell[50])
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    s2 = jnp.asarray(0.644, jnp.float32)
    noise = jnp.asarray(0.0, jnp.float32)

    k = s2 * gibbs_gram_reference(x, ell, x, ell)
    # self-check: the retry-free factorisation really fails on this input
    assert not bool(jnp.all(jnp.isfinite(jnp.linalg.cholesky(k))))

    with pltpu.force_tpu_interpret_mode():
        chol, alpha = pf._forward(x, ell, y, s2, noise)
    chol = np.asarray(chol)
    alpha = np.asarray(alpha)
    assert np.isfinite(chol).all() and np.isfinite(alpha).all()

    # L Lᵀ must reconstruct K + extra·I for one of the retry levels
    recon = chol @ chol.T
    k_np = np.asarray(k, np.float64)
    errs = {
        extra: np.max(np.abs(recon - (k_np + extra * np.eye(n))))
        for extra in (1e-4, 1e-2)
    }
    assert min(errs.values()) < 5e-4, errs


def test_pallas_svgp_in_kernel_jitter_retry(rng):
    """Same retry contract for the fused SVGP precompute: a K_zz too
    ill-conditioned for plain f32 Cholesky (large s², duplicated z)
    must come back finite via the in-kernel escalating-jitter retry."""
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_svgp as ps
    from nonstationary_precip_tpu.utils.config import EPSILON

    t, mm, d = 2, 128, 2
    z_np = rng.normal(size=(t, mm, d))
    z_np[:, 64] = z_np[:, 32]  # duplicates: min eig of K_zz ≈ 2ε ≈ 2e-5
    ell_np = np.full((t, d), 1.0)
    s2_np = np.full((t,), 40.0)  # f32 elimination error ≫ the 2ε pivot
    p_np = rng.normal(size=(t, mm, 2 * mm + 1))
    z = jnp.asarray(z_np, jnp.float32)
    ell = jnp.asarray(ell_np, jnp.float32)
    s2 = jnp.asarray(s2_np, jnp.float32)
    packed = jnp.asarray(p_np, jnp.float32)

    # self-check: the retry-free XLA composition fails on this input
    l_plain = ps._reference(z, ell, s2, packed)[0]
    assert not bool(jnp.all(jnp.isfinite(l_plain)))

    with pltpu.force_tpu_interpret_mode():
        l, w, _ = ps._forward(z, ell, s2, packed)
    l = np.asarray(l)
    w = np.asarray(w)
    assert np.isfinite(l).all() and np.isfinite(w).all()

    # reconstruction at one of the escalated jitters
    def k_ref(extra):
        zs = z_np / ell_np[:, None, :]
        sq = np.sum(zs * zs, axis=-1)
        quad = np.maximum(
            sq[:, :, None] + sq[:, None, :] - 2.0 * np.einsum("tmd,tnd->tmn", zs, zs),
            0.0,
        )
        k = s2_np[:, None, None] * np.exp(-0.5 * quad)
        return k + (EPSILON + extra) * np.eye(mm)

    errs = {
        extra: max(
            np.max(np.abs(l[i] @ l[i].T - k_ref(extra)[i])) for i in range(t)
        )
        for extra in (1e-4, 1e-2)
    }
    assert min(errs.values()) < 5e-2, errs


@pytest.mark.parametrize("t,n", [(3, 128), (4, 250), (10, 316), (2, 384)])
def test_chol_inv_batched_v2_matches_dense(rng, t, n):
    """Leading-dim-batched 3-level (chol, inv): exact vs jnp on SPD stacks
    (interpret mode on CPU; batch rides inside the recurrence)."""
    from nonstationary_precip_tpu.ops.pallas_chol import chol_inv_batched_v2

    from jax.experimental.pallas import tpu as pltpu

    base = rng.normal(size=(t, n, n))
    spd = np.einsum("tij,tkj->tik", base, base) + n * np.eye(n)
    a = jnp.asarray(spd, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        l, li = chol_inv_batched_v2(a)
    ref = np.linalg.cholesky(spd)
    scale = np.abs(ref).max()
    assert np.max(np.abs(np.asarray(l) - ref)) / scale < 5e-6
    resid = np.einsum("tij,tjk->tik", np.asarray(li), ref) - np.eye(n)
    assert np.max(np.abs(resid)) < 5e-5


def test_chol_inv_batched_v2_grads_match_reference(rng):
    """Matmul-only VJP vs autodiff through the jnp chol+inverse composition."""
    from nonstationary_precip_tpu.ops.pallas_chol import chol_inv_batched_v2

    t, n = 3, 200
    base = rng.normal(size=(t, n, n))
    spd = np.einsum("tij,tkj->tik", base, base) + n * np.eye(n)
    a = jnp.asarray(spd, jnp.float64)

    wl = jnp.asarray(rng.normal(size=(t, n, n)), jnp.float64)
    wi = jnp.asarray(rng.normal(size=(t, n, n)), jnp.float64)

    def ref(mats):
        l = jnp.linalg.cholesky(mats)
        eye = jnp.broadcast_to(jnp.eye(n, dtype=mats.dtype), l.shape)
        li = jax.lax.linalg.triangular_solve(l, eye, left_side=True, lower=True)
        return jnp.sum(l * wl) + jnp.sum(li * wi)

    def ours(mats):
        l, li = chol_inv_batched_v2(mats.astype(jnp.float32))
        return jnp.sum(l.astype(jnp.float64) * wl) + jnp.sum(
            li.astype(jnp.float64) * wi
        )

    from jax.experimental.pallas import tpu as pltpu

    g_ref = jax.grad(ref)(a)
    with pltpu.force_tpu_interpret_mode():
        g_ours = jax.grad(ours)(a)
    rel = float(jnp.max(jnp.abs(g_ref - g_ours)) / jnp.max(jnp.abs(g_ref)))
    assert rel < 5e-4, rel


def _gibbs_stack(rng, t=3, n=140, d=2):
    """T stacked GibbsExactGP models + (x, y, prior_pre) stacks."""
    from nonstationary_precip_tpu.models.gibbs_gp import GibbsExactGP
    from nonstationary_precip_tpu.priors import LogNormalProcess
    from nonstationary_precip_tpu.train.vmapped import stack_pytrees

    models, xs, ys, pres = [], [], [], []
    for s in range(t):
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), jnp.float32)
        prior = LogNormalProcess.create(
            d, mean=float(np.log(0.3)), outputscale=1.0, lengthscale=1.3
        )
        m = GibbsExactGP.create(x, prior, noise=0.011, outputscale=0.644)
        m = m.replace(
            log_ell=jnp.asarray(
                rng.normal(size=(n, d)) * 0.2 + np.log(0.4), jnp.float32
            )
        )
        models.append(m)
        xs.append(x)
        ys.append(y)
        pres.append(prior.gram_pre(x))
    return (
        stack_pytrees(models),
        jnp.stack(xs),
        jnp.stack(ys),
        stack_pytrees(pres),
    )


def test_gibbs_map_loss_batched_matches_vmap(rng, monkeypatch):
    """Hand-batched MAP loss through the 3-level Pallas (chol, inv) kernel
    == vmapped per-split GibbsExactGP.loss, values AND gradients."""
    from nonstationary_precip_tpu.models.gibbs_gp import gibbs_map_loss_batched
    from nonstationary_precip_tpu.ops import pallas_chol

    models, x, y, pre = _gibbs_stack(rng)

    # reference: the vmapped per-split loss (the fallback path itself)
    ref = jax.vmap(lambda m, xx, yy, pc: m.loss(xx, yy, pc))(models, x, y, pre)
    g_ref = jax.grad(
        lambda mm: jnp.sum(
            jax.vmap(lambda m, xx, yy, pc: m.loss(xx, yy, pc))(mm, x, y, pre)
        )
    )(models)

    monkeypatch.setattr(pallas_chol, "gibbs_b_eligible", lambda k: True)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        ours = gibbs_map_loss_batched(models, x, y, pre)
        g_ours = jax.grad(
            lambda mm: jnp.sum(gibbs_map_loss_batched(mm, x, y, pre))
        )(models)

    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ours), jax.tree_util.tree_leaves(g_ref)
    ):
        scale = float(jnp.max(jnp.abs(b))) + 1e-8
        assert float(jnp.max(jnp.abs(a - b))) / scale < 5e-3


def test_chol_inv_batched_safe_retry(rng):
    """Escalating-jitter retry: a singular stack (plain factorisation goes
    non-finite) must come back finite with L L^T ~ A + jitter I."""
    from nonstationary_precip_tpu.ops.pallas_chol import chol_inv_batched_safe

    t, n = 2, 140
    base = rng.normal(size=(t, n, 30))
    spd = np.einsum("tij,tkj->tik", base, base)  # rank 30 < n: singular
    a = jnp.asarray(spd, jnp.float32)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        l, li = chol_inv_batched_safe(a)
    assert bool(jnp.all(jnp.isfinite(l))) and bool(jnp.all(jnp.isfinite(li)))
    rec = np.einsum("tij,tkj->tik", np.asarray(l), np.asarray(l))
    # reconstruction matches A away from the (jittered) diagonal
    off = ~np.eye(n, dtype=bool)
    scale = np.abs(spd).max()
    assert np.max(np.abs((rec - spd)[:, off])) / scale < 5e-2


def test_chol_inv_batched_safe_per_member_isolation(rng):
    """One singular member in the stack must NOT perturb the healthy
    members: escalation is per-member (matching ops.linalg.safe_cholesky
    and GPyTorch's psd_safe_cholesky), so the healthy members' (L, L⁻¹)
    are bit-identical to an all-healthy run."""
    from jax.experimental.pallas import tpu as pltpu

    from nonstationary_precip_tpu.ops.pallas_chol import chol_inv_batched_safe

    n = 140
    base = rng.normal(size=(3, n, n))
    good = np.einsum("tij,tkj->tik", base, base) + 5.0 * np.eye(n)
    sing_base = rng.normal(size=(n, 30))
    singular = sing_base @ sing_base.T  # rank 30 < n
    all_good = jnp.asarray(good, jnp.float32)
    one_bad = jnp.asarray(
        np.stack([good[0], singular, good[2]]), jnp.float32
    )

    with pltpu.force_tpu_interpret_mode():
        l_a, li_a = chol_inv_batched_safe(all_good)
        l_b, li_b = chol_inv_batched_safe(one_bad)

    assert bool(jnp.all(jnp.isfinite(l_b))) and bool(jnp.all(jnp.isfinite(li_b)))
    for i in (0, 2):  # healthy members: bit-equal, zero drift
        np.testing.assert_array_equal(np.asarray(l_a[i]), np.asarray(l_b[i]))
        np.testing.assert_array_equal(np.asarray(li_a[i]), np.asarray(li_b[i]))


def test_pallas_svgp_per_group_isolation(rng):
    """Fused SVGP precompute: an ill-conditioned K_zz in one group must
    leave the other group's (L, W, L⁻¹) bit-identical to an all-healthy
    run — the in-kernel retry jitters only the failing group."""
    from jax.experimental.pallas import tpu as pltpu

    import nonstationary_precip_tpu.ops.pallas_svgp as ps

    t, mm, d = 2, 128, 2
    z_np = rng.normal(size=(t, mm, d))
    ell_np = np.full((t, d), 1.0)
    p_np = rng.normal(size=(t, mm, 2 * mm + 1))
    # healthy run: moderate s² everywhere
    s2_good = np.full((t,), 1.0)
    # one-bad run: group 1 gets duplicated z at huge s² (plain f32 chol NaNs)
    z_bad = z_np.copy()
    z_bad[1, 64] = z_bad[1, 32]
    s2_bad = np.array([1.0, 40.0])

    args_good = (
        jnp.asarray(z_np, jnp.float32),
        jnp.asarray(ell_np, jnp.float32),
        jnp.asarray(s2_good, jnp.float32),
        jnp.asarray(p_np, jnp.float32),
    )
    args_bad = (
        jnp.asarray(z_bad, jnp.float32),
        jnp.asarray(ell_np, jnp.float32),
        jnp.asarray(s2_bad, jnp.float32),
        jnp.asarray(p_np, jnp.float32),
    )
    # self-check: the one-bad input really defeats the retry-free path
    assert not bool(jnp.all(jnp.isfinite(ps._reference(*args_bad)[0])))

    with pltpu.force_tpu_interpret_mode():
        l_a, w_a, li_a = ps._forward(*args_good)
        l_b, w_b, li_b = ps._forward(*args_bad)

    for out in (l_b, w_b, li_b):
        assert bool(jnp.all(jnp.isfinite(out)))
    # group 0 is identical in both runs' inputs → outputs bit-equal
    np.testing.assert_array_equal(np.asarray(l_a[0]), np.asarray(l_b[0]))
    np.testing.assert_array_equal(np.asarray(w_a[0]), np.asarray(w_b[0]))
    np.testing.assert_array_equal(np.asarray(li_a[0]), np.asarray(li_b[0]))


def test_fused_elbo_loss_matches_composed(rng, monkeypatch):
    """DeepGP.loss through the fused Pallas ELBO data term == the composed
    propagate path: same key → same value (bit-level sampling parity) and
    matching gradients for every parameter."""
    from nonstationary_precip_tpu.models import DeepGP
    from nonstationary_precip_tpu.ops import pallas_elbo

    key = jax.random.PRNGKey(3)
    ki, kd, kl = jax.random.split(key, 3)
    b, m, s = 70, 130, 3
    model = DeepGP.create(ki, input_dims=2, num_layers=2, num_inducing=m)
    # perturb away from the symmetric init so gradients are well-scaled
    leaves, treedef = jax.tree_util.tree_flatten(model)
    leaves = [
        jnp.asarray(l)
        + 0.05 * jnp.asarray(rng.normal(size=np.shape(l)).astype(np.float32))
        for l in leaves
    ]
    model = jax.tree_util.tree_unflatten(treedef, leaves)
    x = jax.random.normal(kd, (b, 2), jnp.float32)
    y = jnp.sin(x[:, 0])

    loss_ref = float(model.loss(kl, x, y, num_data=b, num_samples=s, fused_elbo=False))
    g_ref = jax.grad(
        lambda mm: mm.loss(kl, x, y, num_data=b, num_samples=s, fused_elbo=False)
    )(model)

    monkeypatch.setattr(pallas_elbo, "_elbo_eligible", lambda xx, pp: True)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        loss_f = float(model.loss(kl, x, y, num_data=b, num_samples=s))
        g_f = jax.grad(
            lambda mm: mm.loss(kl, x, y, num_data=b, num_samples=s)
        )(model)

    assert abs(loss_f - loss_ref) < 5e-5, (loss_f, loss_ref)
    for a, bb in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_ref)):
        scale = float(jnp.max(jnp.abs(bb))) + 1e-4
        assert float(jnp.max(jnp.abs(a - bb))) / scale < 5e-3


def test_fused_elbo_reference_bwd_matches_autodiff(rng):
    """The hand-derived backward (shared by the XLA fallback and the
    Pallas kernel) == autodiff of the reference forward, f64."""
    import jax as _jax

    # conftest already enables x64 globally — restore to THAT state, not
    # False (a hardcoded False broke every later f64 test in the suite)
    prev_x64 = _jax.config.jax_enable_x64
    _jax.config.update("jax_enable_x64", True)
    try:
        from nonstationary_precip_tpu.ops.pallas_elbo import (
            _reference_bwd,
            _reference_fwd,
        )

        b, m, s = 24, 16, 2
        f64 = jnp.float64
        params = {}
        params.update(
            z1=jnp.asarray(rng.normal(size=(2, m, 2)), f64),
            ell1=jnp.asarray(np.exp(rng.normal(size=(2, 2)) * 0.2), f64),
            s21=jnp.asarray(np.exp(rng.normal(size=2) * 0.2), f64),
            w1=jnp.asarray(rng.normal(size=(2, m, 2 * m + 1)) * 0.2, f64),
            mw1=jnp.asarray(rng.normal(size=(2, 2)) * 0.2, f64),
            mb1=jnp.asarray(rng.normal(size=2) * 0.2, f64),
            z2=jnp.asarray(rng.normal(size=(2, m, 2)), f64),
            ell2=jnp.asarray(np.exp(rng.normal(size=(2, 2)) * 0.2), f64),
            s22=jnp.asarray(np.exp(rng.normal(size=2) * 0.2), f64),
            w2=jnp.asarray(rng.normal(size=(2, m, 2 * m + 1)) * 0.2, f64),
            mw2=jnp.asarray(rng.normal(size=(2, 2)) * 0.2, f64),
            mb2=jnp.asarray(rng.normal(size=2) * 0.2, f64),
            zh=jnp.asarray(rng.normal(size=(1, m, 2)), f64),
            ellh=jnp.asarray(np.exp(rng.normal(size=(1, 2)) * 0.2), f64),
            s2h=jnp.asarray(np.exp(rng.normal(size=1) * 0.2), f64),
            wh=jnp.asarray(rng.normal(size=(1, m, 2 * m + 1)) * 0.2, f64),
            mbh=jnp.asarray(rng.normal(size=1) * 0.2, f64),
        )
        x = jnp.asarray(rng.normal(size=(b, 2)), f64)
        y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), f64)
        eps1 = jnp.asarray(rng.normal(size=(s, 2, b)), f64)
        eps2 = jnp.asarray(rng.normal(size=(s, 2, b)), f64)
        noise = jnp.asarray(0.1, f64)

        dt, res = _reference_fwd(x, y, eps1, eps2, params, noise)
        bars, nb, yb = _reference_bwd(x, y, eps1, eps2, params, noise, res, 1.0)
        g_auto = jax.grad(
            lambda pp, nn, yy: _reference_fwd(x, yy, eps1, eps2, pp, nn)[0],
            argnums=(0, 1, 2),
        )(params, noise, y)
        for k in params:
            scale = float(jnp.max(jnp.abs(g_auto[0][k]))) + 1e-12
            assert float(jnp.max(jnp.abs(bars[k] - g_auto[0][k]))) / scale < 1e-10, k
        assert abs(float(nb) - float(g_auto[1])) < 1e-10
        np.testing.assert_allclose(np.asarray(yb), np.asarray(g_auto[2]), rtol=1e-10)
    finally:
        _jax.config.update("jax_enable_x64", prev_x64)
