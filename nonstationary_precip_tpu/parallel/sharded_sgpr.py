"""Row-sharded SGPR: the Titsias collapsed bound over a device mesh.

This is the scaling path for the sparse models beyond one chip's HBM: the
N training rows are sharded across devices, and every cross-device
quantity in the collapsed bound is an M-sized reduction:

    A Aᵀ = Σ_shards A_s A_sᵀ   (M×M psum)
    A y  = Σ_shards A_s y_s    (M   psum)
    yᵀy, Σ diag-corrections     (scalar psums)

so the bound for N in the millions costs one (M, M) + one (M,) + two
scalar all-reduces over ICI per evaluation — K_zz work is replicated,
K_xz rows never leave their device.  Gradients come from differentiating
THROUGH shard_map (AD places the psums).

The dense per-shard math reuses kernels/inducing.py; this module only owns
the mesh orchestration, so it works for any kernel (stationary SGPR and
the Gibbs lengthscale-conditioned variant alike).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.ops.linalg import diag_part
from jax.sharding import PartitionSpec as P

from nonstationary_precip_tpu.parallel.mesh import DATA_AXIS

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sharded_sgpr_loss(root_fn, trace_fn, mesh):
    """Build loss(model, x, y) = −(collapsed bound)/N with x, y row-sharded.

    root_fn(model, x_shard) -> (N_s, M) unscaled-by-noise Nyström root
    R_s = K_{x_s z} L_zz⁻ᵀ of the *scaled* kernel.
    trace_fn(model, x_shard, root_shard) -> (N_s,) per-point Titsias trace
    residual (prior diag minus Nyström diag, in whichever scaling the
    model's bound uses); the added loss term is −½·Σ(residual)/noise.
    Receiving the root lets models with nonstandard scaling semantics
    (GibbsSparseGP.scale_correction=False, the reference quirk at
    /root/reference/models/gibbs_kernels.py:241-261) express their exact
    unsharded term.
    """
    axis = DATA_AXIS

    def per_shard(model, x_s, y_s):
        noise = model.likelihood.noise
        root = root_fn(model, x_s)  # (N_s, M)
        a_s = root.T / jnp.sqrt(noise)  # (M, N_s)

        aat = jax.lax.psum(a_s @ a_s.T, axis)  # (M, M)
        ay = jax.lax.psum(a_s @ y_s, axis) / jnp.sqrt(noise)  # (M,)
        yty = jax.lax.psum(y_s @ y_s, axis)
        n_total = jax.lax.psum(jnp.asarray(y_s.shape[-1], noise.dtype), axis)

        b = jnp.eye(aat.shape[-1], dtype=aat.dtype) + aat
        lb = jnp.linalg.cholesky(b)
        w = jax.lax.linalg.triangular_solve(
            lb, ay[:, None], left_side=True, lower=True
        )[:, 0]
        quad = yty / noise - w @ w
        logdet = n_total * jnp.log(noise) + 2.0 * jnp.sum(jnp.log(diag_part(lb)))
        logp = -0.5 * (quad + logdet + n_total * jnp.log(2.0 * jnp.pi).astype(yty.dtype))

        residual = trace_fn(model, x_s, root)
        added = jax.lax.psum(-0.5 * jnp.sum(residual) / noise, axis)

        return -(logp + added) / n_total

    return shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(),
    )


def sharded_sgpr_value_and_grad(root_fn, trace_fn, mesh):
    """value_and_grad of the sharded collapsed bound (AD through shard_map)."""
    return jax.value_and_grad(sharded_sgpr_loss(root_fn, trace_fn, mesh))
