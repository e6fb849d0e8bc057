"""utils/functional.py parity helpers vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from nonstationary_precip_tpu.utils import functional as fn


def test_basic_linalg_helpers(rng):
    a = rng.normal(size=(4, 5, 5))
    v = rng.normal(size=(4, 5))
    aj, vj = jnp.asarray(a), jnp.asarray(v)

    np.testing.assert_allclose(np.asarray(fn.dot(vj, vj)), (v * v).sum(-1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(fn.t(aj)), a.transpose(0, 2, 1))
    np.testing.assert_allclose(np.asarray(fn.tr(aj)), np.trace(a, axis1=-2, axis2=-1), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(fn.mv(aj, vj)), np.einsum("bij,bj->bi", a, v), rtol=1e-10
    )
    np.testing.assert_allclose(np.asarray(fn.sym(aj)), 0.5 * (a + a.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(fn.op(vj)), np.einsum("bi,bj->bij", v, v), rtol=1e-12
    )


def test_solve_paths(rng):
    a = rng.normal(size=(6, 6))
    a = a @ a.T + 6 * np.eye(6)
    v = rng.normal(size=6)
    aj, vj = jnp.asarray(a), jnp.asarray(v)
    np.testing.assert_allclose(
        np.asarray(fn.mv(aj, vj, invert=True)), np.linalg.solve(a, v), rtol=1e-8
    )
    np.testing.assert_allclose(
        float(fn.quad(vj, aj, invert=True)), v @ np.linalg.solve(a, v), rtol=1e-8
    )
    np.testing.assert_allclose(
        float(fn.expquad(vj * 0.1, aj)),
        np.exp(-0.5 * (0.1 * v) @ a @ (0.1 * v)),
        rtol=1e-6,
    )


def test_vec_vech_kron(rng):
    x = rng.normal(size=(3, 4))
    np.testing.assert_allclose(np.asarray(fn.vec(jnp.asarray(x))), x.T.reshape(-1))
    s = rng.normal(size=(4, 4))
    s = s + s.T
    got = np.asarray(fn.vech(jnp.asarray(s)))
    idx = np.tril_indices(4)
    np.testing.assert_allclose(got, s[idx])
    a, b = rng.normal(size=(2, 3)), rng.normal(size=(4, 5))
    np.testing.assert_allclose(
        np.asarray(fn.kron(jnp.asarray(a), jnp.asarray(b))), np.kron(a, b), rtol=1e-12
    )


def test_duplication_matrix():
    n = 3
    d = np.asarray(fn.duplication_matrix(n))
    s = np.arange(9).reshape(3, 3)
    s = s + s.T
    np.testing.assert_allclose(d @ np.asarray(fn.vech(jnp.asarray(s * 1.0))), s.T.reshape(-1))


def test_diff_and_normalise(rng):
    x = rng.normal(size=(5, 4))
    d = np.asarray(fn.diff(jnp.asarray(x), dim=-2))
    np.testing.assert_allclose(d[:-1], np.diff(x, axis=0))
    np.testing.assert_allclose(d[-1], d[-2])
    nz = np.asarray(fn.normalise(jnp.asarray(x)))
    np.testing.assert_allclose(nz.mean(-1), 0, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(nz, axis=-1), 2.0, rtol=1e-10)


def test_projections(rng):
    y = rng.normal(size=(50, 6)) @ np.diag([5, 3, 1, 0.1, 0.1, 0.1])
    proj = fn.project_pca(2, jnp.asarray(y))
    assert proj.projection.shape == (50, 2)
    # captured variance should dominate
    var_kept = np.var(np.asarray(proj.projection), axis=0).sum()
    assert var_kept > 0.8 * np.var(y, axis=0).sum()

    c = rng.normal(size=(6, 3))
    x = rng.normal(size=(20, 3))
    d0 = rng.normal(size=6)
    yy = x @ c.T + d0
    sol = fn.project_lstsq(jnp.asarray(yy), jnp.asarray(c), jnp.asarray(d0))
    np.testing.assert_allclose(np.asarray(sol.projection), x, rtol=1e-6, atol=1e-8)


def test_bisects():
    arr = [0.0, 1.0, 2.0, 3.0]
    assert fn.bisect_right(arr, 1.0) == 2
    assert fn.bisect_left(arr, 1.0 + 1e-12) == 2  # tolerant
