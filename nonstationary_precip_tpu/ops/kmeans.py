"""Pure-JAX k-means for inducing point initialisation.

Replaces the reference's ``pm.gp.util.kmeans_inducing_points`` call
(/root/reference/experiments/spatial_exp.py:153), which whitens the data,
runs scipy's Lloyd iterations, and un-whitens the centroids.  Here the
Lloyd iterations run under ``lax.scan`` on device: assignment is one
(N, K) distance matmul per step (MXU work), update is a segment mean via
one-hot matmul — no host loops, static shapes throughout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_inducing", "iters"))
def kmeans_inducing_points(
    key: jax.Array, x: jnp.ndarray, num_inducing: int, iters: int = 30
) -> jnp.ndarray:
    """K-means centroids of x (N, D) for use as inducing points (M, D)."""
    n, d = x.shape
    std = jnp.std(x, axis=0) + 1e-12
    xw = x / std

    x_sq = jnp.sum(xw**2, axis=-1, keepdims=True)  # (N, 1)

    # farthest-point init: deterministic given the seed point, spreads
    # centres over the data so Lloyd doesn't stagnate on collapsed inits
    first = jax.random.randint(key, (), 0, n)
    init_centers = jnp.zeros((num_inducing, d), dtype=xw.dtype).at[0].set(xw[first])

    def fp_step(k, state):
        centers, min_d2 = state
        # distance to the most recently added centre
        c = centers[k - 1]
        d2 = jnp.sum((xw - c) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2)
        return centers.at[k].set(xw[nxt]), min_d2

    big = jnp.full((n,), jnp.inf, dtype=xw.dtype)
    init_centers, _ = jax.lax.fori_loop(
        1, num_inducing, fp_step, (init_centers, big)
    )

    def lloyd_step(centers, _):
        c_sq = jnp.sum(centers**2, axis=-1)[None, :]  # (1, K)
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; matmul feeds the MXU
        d2 = x_sq - 2.0 * xw @ centers.T + c_sq  # (N, K)
        assign = jnp.argmin(d2, axis=-1)  # (N,)
        onehot = jax.nn.one_hot(assign, num_inducing, dtype=xw.dtype)  # (N, K)
        counts = jnp.sum(onehot, axis=0)  # (K,)
        sums = onehot.T @ xw  # (K, D)
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers
        )
        return new_centers, None

    centers, _ = jax.lax.scan(lloyd_step, init_centers, None, length=iters)
    return centers * std
