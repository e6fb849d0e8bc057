"""Batched linear-algebra convenience functions — COMPATIBILITY API.

API-parity layer for the reference's ``utils/functional.py``
(/root/reference/utils/functional.py:14-162) in JAX: terse names for
batched dot/transpose/trace/matvec/quadratic forms, (half-)vectorisation,
Kronecker products, projections.  Solve paths go through Cholesky
(ops/linalg) rather than LU since every matrix in this framework is PSD.

Status: this module exists so reference users migrating code that calls
``fn.quad``/``fn.vech``/… find the same surface here (tested in
tests/test_functional.py).  The framework's own internals call
``ops/linalg`` directly — its primitives carry the Pallas dispatch and
custom VJPs that these one-liners don't need.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from nonstationary_precip_tpu.ops.linalg import robust_logdet, solve_psd  # noqa: F401


def dot(v1, v2):
    """Batch dot product v1ᵀv2 over the last dim."""
    return jnp.sum(v1 * v2, axis=-1)


def t(x):
    """Matrix transpose on the last two dims."""
    return jnp.swapaxes(x, -1, -2)


def tr(x):
    """Trace over the last two dims."""
    return jnp.trace(x, axis1=-2, axis2=-1)


def mv(matrix, vector, invert: bool = False):
    """matrix @ vector, or matrix⁻¹ vector when ``invert`` (PSD solve)."""
    if invert:
        return solve_psd(matrix, vector)
    return jnp.squeeze(matrix @ vector[..., None], -1)


def quad(v, matrix, v2=None, invert: bool = False):
    """vᵀ M v2 (or vᵀ M⁻¹ v2 when ``invert``)."""
    if v2 is None:
        v2 = v
    v2 = solve_psd(matrix, v2) if invert else mv(matrix, v2)
    return dot(v, v2)


def expquad(v, matrix, invert: bool = False, out_scale=1.0, exp_scale=0.5):
    """out_scale · exp(−exp_scale · vᵀ M^{±1} v)."""
    return out_scale * jnp.exp(-exp_scale * quad(v, matrix, invert=invert))


def sym(x):
    """Force symmetry: (X + Xᵀ)/2."""
    return 0.5 * (x + t(x))


def op(v1, v2=None):
    """Vector outer product."""
    if v2 is None:
        v2 = v1
    return v1[..., :, None] * v2[..., None, :]


def vec(x):
    """Column-stacking vectorisation of the last two dims."""
    batch = x.shape[:-2]
    return t(x).reshape(*batch, x.shape[-2] * x.shape[-1])


def vech(x):
    """Half-vectorisation: lower-triangle (incl. diagonal) entries."""
    d = x.shape[-2]
    if x.shape[-1] != d:
        raise ValueError(f"vech needs a square matrix, got {x.shape}")
    idx = jnp.tril_indices(d)
    return x[..., idx[0], idx[1]]


def kron(x, y):
    """Batched Kronecker product over the last two dims."""
    size1 = (x.shape[-2] * y.shape[-2], x.shape[-1] * y.shape[-1])
    res = x[..., :, None, :, None] * y[..., None, :, None, :]
    return res.reshape(*res.shape[:-4], *size1)


def duplication_matrix(n: int):
    """D_n with vec(X) = D_n vech(X) for symmetric X (fixes the
    reference's ``fn.`` self-reference bug at utils/functional.py:114)."""
    out = jnp.zeros((n * n, n * (n + 1) // 2))
    for j in range(1, n + 1):
        for i in range(j, n + 1):
            u = jnp.zeros(n * (n + 1) // 2).at[(j - 1) * n + i - j * (j - 1) // 2 - 1].set(1.0)
            tmat = jnp.zeros((n, n)).at[i - 1, j - 1].set(1.0).at[j - 1, i - 1].set(1.0)
            out = out + op(vec(tmat), u)
    return out


def diff(x, boundary_value=None, dim: int = -2):
    """Forward differences along ``dim``, length-preserving (final entry
    replicates the penultimate difference unless given)."""
    x = jnp.swapaxes(x, dim, -1)
    d = x[..., 1:] - x[..., :-1]
    if boundary_value is None:
        boundary = d[..., -1:]
    else:
        boundary = jnp.asarray(boundary_value)[..., None]
    out = jnp.concatenate([d, boundary], axis=-1)
    return jnp.swapaxes(out, dim, -1)


def normalise(x, axis: int = -1):
    """Zero-mean, √N-scaled unit-norm over ``axis``."""
    x = x - jnp.mean(x, axis=axis, keepdims=True)
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return math.sqrt(x.shape[axis]) * x / jnp.maximum(norm, 1e-12)


class Projection(NamedTuple):
    projection: jnp.ndarray
    matrix: jnp.ndarray


def project_pca(d: int, y) -> Projection:
    """Project rows of y (..., N, Δ) onto the d directions of maximum
    variance; returns (projection (..., N, d), basis (d, Δ))."""
    _, eigenvecs = jnp.linalg.eigh(t(y) @ y)
    basis = t(eigenvecs[..., -d:])
    return Projection(jnp.einsum("...dk,...nk->...nd", basis, y), basis)


def project_lstsq(y, c, d) -> Projection:
    """Least-squares x for y = Cx + d."""
    soln = jnp.linalg.lstsq(c, t(y - d))[0]
    return Projection(t(soln), c)


def bisect_right(array, value, tol: float = 1e-8) -> int:
    """Tolerant host-side bisect (reference utils/functional.py:67-74)."""
    import bisect

    import numpy as np

    return bisect.bisect_right(np.asarray(array), value + tol)


def bisect_left(array, value, tol: float = 1e-8) -> int:
    import bisect

    import numpy as np

    return bisect.bisect_left(np.asarray(array), value + tol)
