"""Blocked triangular solve (TRSM) as a single Pallas TPU kernel.

Completes the SURVEY.md §2.5 native-equivalents row for
``torch.triangular_solve`` (/root/reference/models/gibbs_kernels.py:203):
X = L⁻¹ B for lower-triangular L (N, N) and B (N, K), VMEM-resident.

Forward block substitution with 128-blocks, statically unrolled:

    X_i = L_ii⁻¹ ( B_i − Σ_{k<i} L_ik X_k )

The diagonal-block inverses come from the fused Cholesky/inverse loop
machinery (ops/pallas_chol._tri_inv_block); everything else is MXU
matmuls.  Upper/transposed solves reduce to this form by flipping:
Uᵀ = L, and right-side solves by transposing the system.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nonstationary_precip_tpu.ops.pallas_chol import _tri_inv_block

BLOCK = 128
# total f32 elements that fit the 16 MB scoped-VMEM budget with headroom
# for Mosaic's stack (the kernel keeps L, B and X wholly resident and does
# not raise vmem_limit_bytes); 3.5M elems = 14 MB.  The old cap
# (3 * 1280^2 = 19.7 MB) admitted working sets over the hard 16 MB limit,
# which Mosaic rejects at compile time.
MAX_TOTAL_ELEMS = 3_500_000


def eligible(l, b) -> bool:
    """Opt-in via NSGP_PALLAS_TRSM=1 — correctness validated on-chip
    (maxdiff 1e-6 at n=k=1024) but XLA's native solve is faster there
    (1.85 vs 2.25 ms, 2026-08 v5e), so the dispatcher default stays off;
    the workload's solves sit below the 768 floor anyway."""
    import os

    if os.environ.get("NSGP_PALLAS_TRSM", "0") != "1":
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    if l.dtype != jnp.float32 or l.ndim != 2 or b.ndim != 2:
        return False
    n = l.shape[-1]
    return 768 <= n <= 1280 and n * n + 2 * n * b.shape[-1] <= MAX_TOTAL_ELEMS


def _trsm_kernel(l_ref, b_ref, x_ref, *, n: int, k: int):
    nb = n // BLOCK
    for i in range(nb):  # static unroll
        lo, hi = i * BLOCK, (i + 1) * BLOCK
        rhs = b_ref[lo:hi, :]
        if i > 0:
            # subtract the contribution of already-solved blocks:
            # L[i, :i] @ X[:i]  — one MXU matmul over the solved prefix
            rhs = rhs - jnp.dot(
                l_ref[lo:hi, 0:lo], x_ref[0:lo, :], preferred_element_type=jnp.float32
            )
        l_ii_inv = _tri_inv_block(l_ref[lo:hi, lo:hi])
        x_ref[lo:hi, :] = jnp.dot(l_ii_inv, rhs, preferred_element_type=jnp.float32)


def _forward(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    n = l.shape[-1]
    k = b.shape[-1]
    n_pad = -(-n // BLOCK) * BLOCK
    k_pad = -(-k // BLOCK) * BLOCK
    if n_pad != n:
        pad = n_pad - n
        l = jnp.block(
            [
                [l, jnp.zeros((n, pad), l.dtype)],
                [jnp.zeros((pad, n), l.dtype), jnp.eye(pad, dtype=l.dtype)],
            ]
        )
        b = jnp.concatenate([b, jnp.zeros((pad, k), b.dtype)], axis=0)
    if k_pad != k:
        b = jnp.concatenate([b, jnp.zeros((n_pad, k_pad - k), b.dtype)], axis=1)
    out = pl.pallas_call(
        functools.partial(_trsm_kernel, n=n_pad, k=k_pad),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * n_pad * k_pad,
            bytes_accessed=4 * (n_pad * n_pad + 2 * n_pad * k_pad),
            transcendentals=0,
        ),
    )(l, b)
    return out[:n, :k]


@jax.custom_vjp
def blocked_trsm(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """X = L⁻¹ B via the single-launch blocked kernel."""
    return _forward(l, b)


def _fwd(l, b):
    x = _forward(l, b)
    return x, (l, x)


def _bwd(res, g):
    """Closed-form pullback from the saved primal solution X = L⁻¹B:
    B̄ = L⁻ᵀ X̄ (one triangular solve), L̄ = −tril(B̄ Xᵀ) — no re-solve of
    the forward system."""
    l, x = res
    bbar = jax.lax.linalg.triangular_solve(
        l, g, left_side=True, lower=True, transpose_a=True
    )
    lbar = -jnp.tril(bbar @ x.T)
    return lbar, bbar


blocked_trsm.defvjp(_fwd, _bwd)
