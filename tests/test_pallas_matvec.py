"""Fused Gram·v kernels (ops/pallas_matvec.py) vs jnp oracles, interpret
mode on CPU, plus their lazy-CG integration (value AND gradient parity
with the panel path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from nonstationary_precip_tpu.kernels import GibbsKernel, RBF, Scale, Matern52
from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference
from nonstationary_precip_tpu.ops import pallas_matvec as pm
from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_mll, lazy_cg_posterior


def _gibbs_data(rng, n1, n2, d, r):
    x1 = jnp.asarray(rng.normal(size=(n1, d)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(n2, d)), jnp.float32)
    e1 = jnp.asarray(np.exp(0.3 * rng.normal(size=(n1, d))), jnp.float32)
    e2 = jnp.asarray(np.exp(0.3 * rng.normal(size=(n2, d))), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n2, r)), jnp.float32)
    return x1, e1, x2, e2, v


@pytest.mark.parametrize(
    "n1,n2,d,r",
    [
        (40, 64, 2, 1),  # far below one tile: padding path
        (700, 1500, 3, 9),  # multiple column tiles, odd sizes
        (512, 1024, 1, 128),  # exact tiles, max lanes
    ],
)
def test_gibbs_matvec_matches_oracle(rng, n1, n2, d, r):
    x1, e1, x2, e2, v = _gibbs_data(rng, n1, n2, d, r)
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(pm.gibbs_gram_matvec(x1, e1, x2, e2, v))
    ref = np.asarray(gibbs_gram_reference(x1, e1, x2, e2) @ v)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("n1,n2,d,r", [(130, 70, 2, 5), (600, 1100, 4, 16)])
def test_rbf_matvec_matches_oracle(rng, n1, n2, d, r):
    x1 = jnp.asarray(rng.normal(size=(n1, d)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(n2, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n2, r)), jnp.float32)
    ell = jnp.asarray(np.exp(0.2 * rng.normal(size=d)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(pm.rbf_gram_matvec(x1, x2, ell, v))
    ref = np.asarray(RBF.create(d, lengthscale=ell)(x1, x2) @ v)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-4)


def test_matvec_shape_limits(rng):
    x1, e1, x2, e2, v = _gibbs_data(rng, 16, 16, 9, 1)
    with pytest.raises(ValueError, match="D"):
        pm.gibbs_gram_matvec(x1, e1, x2, e2, v)


@pytest.mark.parametrize("r", [130, 300])
def test_gibbs_matvec_column_chunks_wide_rhs(rng, r):
    """R > 128 (e.g. lazy_cg_posterior's 1+N* block rhs) must run as
    column-chunked launches, matching the oracle across the chunk seam."""
    x1, e1, x2, e2, v = _gibbs_data(rng, 96, 160, 2, r)
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(pm.gibbs_gram_matvec(x1, e1, x2, e2, v))
    ref = np.asarray(gibbs_gram_reference(x1, e1, x2, e2) @ v)
    assert ours.shape == (96, r)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-4)


def test_rbf_matvec_column_chunks_wide_rhs(rng):
    n1, n2, d, r = 80, 140, 2, 200
    x1 = jnp.asarray(rng.normal(size=(n1, d)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(n2, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n2, r)), jnp.float32)
    ell = jnp.asarray(np.exp(0.2 * rng.normal(size=d)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(pm.rbf_gram_matvec(x1, x2, ell, v))
    ref = np.asarray(RBF.create(d, lengthscale=ell)(x1, x2) @ v)
    assert ours.shape == (n1, r)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-4)
    with pytest.raises(ValueError, match="R"):
        pm.rbf_gram_matvec(x1, x2, jnp.ones((2,), jnp.float32), v)


def test_gibbs_matvec_high3_contraction(rng):
    """Manual 3-pass bf16 contraction ('high3'): ~1e-5 relative vs the
    exact-f32 oracle — loose band here; the convergence story is in
    tools/probe_matvec_precision.py."""
    x1, e1, x2, e2, v = _gibbs_data(rng, 256, 512, 2, 9)
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(pm.gibbs_gram_matvec(x1, e1, x2, e2, v, precision="high3"))
    ref = np.asarray(gibbs_gram_reference(x1, e1, x2, e2) @ v)
    denom = np.linalg.norm(ref)
    assert np.linalg.norm(ours - ref) / denom < 1e-4


@pytest.mark.parametrize(
    "n1,n2,d,r",
    [
        (40, 64, 2, 1),  # padding path, single column
        (700, 1500, 2, 9),  # flagship: d=2 fast-path tile, mBCG R
        (300, 520, 3, 16),  # generic-d tile, R at a sublane boundary
    ],
)
def test_gibbs_matvec_vpu_contraction(rng, n1, n2, d, r):
    """'vpu' small-R contraction: exact f32 (same estimand as 'highest'
    up to summation order) — oracle band as tight as the default path."""
    x1, e1, x2, e2, v = _gibbs_data(rng, n1, n2, d, r)
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(
            pm.gibbs_gram_matvec(x1, e1, x2, e2, v, precision="vpu")
        )
    ref = np.asarray(gibbs_gram_reference(x1, e1, x2, e2) @ v)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-4)


def test_gibbs_matvec_vpu_r_limit(rng):
    x1, e1, x2, e2, v = _gibbs_data(rng, 16, 16, 2, 33)
    with pytest.raises(ValueError, match="R"):
        pm.gibbs_gram_matvec(x1, e1, x2, e2, v, precision="vpu")


def test_matvec_precision_validated(rng):
    x1, e1, x2, e2, v = _gibbs_data(rng, 16, 16, 2, 1)
    with pytest.raises(ValueError, match="precision"):
        pm.gibbs_gram_matvec(x1, e1, x2, e2, v, precision="high")
    with pytest.raises(ValueError, match="precision"):
        pm.rbf_gram_matvec(x1, x2, jnp.ones((2,), jnp.float32), v, precision="hi")


def test_stationary_builder_rejects_unsupported_kernel():
    with pytest.raises(TypeError, match="RBF"):
        pm.stationary_matvec_builder(
            Matern52.create(2), jnp.zeros((8, 2), jnp.float32), 0.1
        )


_D = 2


def _packed_cross(kern, xa, xb):
    return kern(
        xa[:, :_D], jnp.exp(xa[:, _D:]), xb[:, :_D], jnp.exp(xb[:, _D:])
    )


def test_lazy_mll_fused_matvec_matches_panels(rng):
    """Same key ⇒ the fused-matvec CG trajectory agrees with the panel
    path to f32 rounding, for the MLL value and every gradient."""
    n = 256
    x = jnp.asarray(rng.uniform(-2, 2, size=(n, _D)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    le = jnp.asarray(0.2 * rng.normal(size=(n, _D)), jnp.float32)
    aug = jnp.concatenate([x, le], 1)
    s2 = jnp.asarray(0.3, jnp.float32)
    key = jax.random.PRNGKey(3)
    gibbs = GibbsKernel()
    kw = dict(block=128, num_probes=8, max_iters=64, tol=1e-7, cross_fn=_packed_cross)

    def f(a, s, builder):
        return lazy_cg_mll(gibbs, a, y, key, s, matvec_builder=builder, **kw)

    vp, (gp_a, gp_s) = jax.value_and_grad(f, argnums=(0, 1))(aug, s2, None)
    with pltpu.force_tpu_interpret_mode():
        vf, (gf_a, gf_s) = jax.value_and_grad(f, argnums=(0, 1))(
            aug, s2, pm.packed_gibbs_matvec_builder(_D)
        )
    assert abs(float(vf - vp)) < 1e-3 * abs(float(vp))
    np.testing.assert_allclose(
        np.asarray(gf_a), np.asarray(gp_a), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(float(gf_s), float(gp_s), rtol=2e-3)


@pytest.mark.parametrize("scaled", [False, True])
def test_lazy_mll_fused_panel_vjp_matches_scan(rng, scaled):
    """panel_vjp (the fused Pallas backward sweep) reroutes ONLY the
    gradient path: the value is bit-identical and every gradient —
    payload (x AND log-ℓ lanes), outputscale, noise — matches the
    jax.vjp panel scan to f32 rounding.  The derivation itself is
    verified exact in f64 against autodiff of sum(Ŵ⊙K) (DESIGN §19)."""
    n = 256
    x = jnp.asarray(rng.uniform(-2, 2, size=(n, _D)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    le = jnp.asarray(0.2 * rng.normal(size=(n, _D)), jnp.float32)
    aug = jnp.concatenate([x, le], 1)
    s2 = jnp.asarray(0.3, jnp.float32)
    raw = jnp.asarray(0.8, jnp.float32) if scaled else None
    key = jax.random.PRNGKey(3)
    from nonstationary_precip_tpu.kernels.gibbs import packed_gibbs_cross

    kw = dict(
        block=128, num_probes=8, max_iters=64, tol=1e-7,
        cross_fn=packed_gibbs_cross(_D),
    )
    argnums = (0, 1, 2) if scaled else (1, 2)

    def f(k, a, s, pvjp):
        return lazy_cg_mll(k, a, y, key, s, panel_vjp=pvjp, **kw)

    vp, gp = jax.value_and_grad(f, argnums=argnums)(raw, aug, s2, None)
    with pltpu.force_tpu_interpret_mode():
        vf, gf = jax.value_and_grad(f, argnums=argnums)(
            raw, aug, s2, pm.packed_gibbs_panel_vjp(_D)
        )
    assert float(vf) == float(vp)  # forward untouched
    for a, b in zip(gp, gf):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=5e-4
        )


def test_lazy_posterior_fused_matvec_matches_panels(rng):
    n, nt = 256, 16
    x = jnp.asarray(rng.uniform(-2, 2, size=(n, _D)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    xt = jnp.asarray(rng.uniform(-2, 2, size=(nt, _D)), jnp.float32)
    le = jnp.asarray(0.2 * rng.normal(size=(n, _D)), jnp.float32)
    aug = jnp.concatenate([x, le], 1)
    # test payload must carry lengthscales too (packed convention)
    let = jnp.asarray(0.2 * rng.normal(size=(nt, _D)), jnp.float32)
    augt = jnp.concatenate([xt, let], 1)
    s2 = jnp.asarray(0.3, jnp.float32)
    gibbs = GibbsKernel()
    kw = dict(block=128, max_iters=256, tol=1e-10, cross_fn=_packed_cross)
    m0, c0 = lazy_cg_posterior(gibbs, aug, y, augt, s2, **kw)
    with pltpu.force_tpu_interpret_mode():
        m1, c1 = lazy_cg_posterior(
            gibbs, aug, y, augt, s2,
            matvec_builder=pm.packed_gibbs_matvec_builder(_D), **kw
        )
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), rtol=1e-3, atol=1e-4)


def _jnp_local_matvec_builder(kernel, x_local, x, sigma2, axis):
    """Same contract as packed_gibbs_local_matvec's builder but pure jnp —
    CI can't run interpret-mode Pallas inside an 8-device shard_map (it
    hangs; CLAUDE.md quirk), so the sharded-path WIRING (ridge indexing,
    all_gather placement, machinery cache keying, gradients) is tested
    with this oracle and the kernel itself by the single-chip tests +
    tools/check_tpu.py on hardware."""
    kb = _packed_cross(kernel, x_local, x)
    nl = x_local.shape[0]

    def matvec(v):
        i0 = jax.lax.axis_index(axis) * nl
        return kb @ v + sigma2 * jax.lax.dynamic_slice_in_dim(v, i0, nl)

    return matvec


def test_sharded_mll_local_matvec_builder_matches_default(rng):
    """parallel/sharded_cg.py with local_matvec_builder: a builder-form
    local Gram·v (no row-block residency in the matvec) walks the same
    CG trajectory as the materialise-once default on the 8-device
    virtual mesh — value and gradients, to f32 rounding (the builder adds
    the σ² ridge AFTER the dot instead of folding it into the row, so
    the trajectories are not bitwise)."""
    from nonstationary_precip_tpu.parallel import make_mesh
    from nonstationary_precip_tpu.parallel.sharded_cg import sharded_cg_mll

    n = 256
    x = jnp.asarray(rng.uniform(-2, 2, size=(n, _D)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    le = jnp.asarray(0.2 * rng.normal(size=(n, _D)), jnp.float32)
    aug = jnp.concatenate([x, le], 1)
    s2 = jnp.asarray(0.3, jnp.float32)
    key = jax.random.PRNGKey(5)
    gibbs = GibbsKernel()
    mesh = make_mesh(len(jax.devices()))
    kw = dict(num_probes=8, max_iters=64, tol=1e-7, cross_fn=_packed_cross)

    def f(a, s, builder):
        return sharded_cg_mll(
            gibbs, a, y, key, s, mesh, local_matvec_builder=builder, **kw
        )

    vp, (gp_a, gp_s) = jax.value_and_grad(f, argnums=(0, 1))(aug, s2, None)
    vf, (gf_a, gf_s) = jax.value_and_grad(f, argnums=(0, 1))(
        aug, s2, _jnp_local_matvec_builder
    )
    assert abs(float(vf - vp)) < 1e-4 * abs(float(vp))
    np.testing.assert_allclose(
        np.asarray(gf_a), np.asarray(gp_a), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(float(gf_s), float(gp_s), rtol=2e-3)


def test_exact_gp_mll_fused_stationary_builder(rng):
    """ExactGP.mll(block=..., matvec_builder=stationary_matvec_builder)
    rides the fused RBF matvec and matches the plain lazy path."""
    from nonstationary_precip_tpu.models import ExactGP

    n = 256
    x = jnp.asarray(rng.uniform(-2, 2, size=(n, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    model = ExactGP.create(
        Scale.create(RBF.create(2), outputscale=1.4), noise=0.1, mean_type="zero"
    )
    key = jax.random.PRNGKey(0)
    kw = dict(solver="cg", key=key, block=128, num_probes=8, max_iters=64)
    base = float(model.mll(x, y, **kw))
    with pltpu.force_tpu_interpret_mode():
        fused = float(
            model.mll(x, y, matvec_builder=pm.stationary_matvec_builder, **kw)
        )
    assert abs(fused - base) < 1e-3 * abs(base)
