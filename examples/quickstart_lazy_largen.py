#!/usr/bin/env python3
"""Quickstart 7 — matrix-free exact GP: the Gram never materialises.

``ops/lazy_cg.py`` is the single-chip twin of the sharded path
(quickstart 6): the mBCG matvec rebuilds (block, N) row panels of
K + σ²I from x inside a ``lax.map`` and discards them, and the
custom-VJP pullback rebuilds each panel once more to pull the
rank-(1+R) cotangent through it — peak memory O(block·N) instead of
the dense path's O(N²).  This is GPyTorch's LazyTensor/LinearOperator
regime (the reference trains every exact model through it implicitly,
/root/reference/experiments/spatial_exp.py:199) built TPU-first:
static shapes, fixed-length scans, rematerialisation instead of an
(N, N) HBM residency.

  1. train: Adam on the lazy stochastic MLL via
     ``ExactGP.mll(solver='cg', block=...)``, one compiled scan,
  2. parity: the lazy objective vs the dense single-chip CG path
     (bit-compatible: same row dot products, merely partitioned),
  3. predict: lazy posterior vs the dense Cholesky posterior.

At N = 32768 in f32 the dense Gram alone is 4 GiB; the lazy path's
panels at block=2048 are 256 MiB — the demo stays small so it runs
anywhere, but nothing in the code changes at scale.  On TPU hardware,
``matvec_builder=ops.pallas_matvec.packed_gibbs_matvec_builder(d)``
fuses the Gram·v so even the row panel never touches HBM (2.0× measured
on the Gibbs per-point-lengthscale kernel at N ≥ 8192, DESIGN.md §15;
for RBF the XLA panels are faster — keep the default there).

Run: python examples/quickstart_lazy_largen.py   (CPU, <1 min)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main(n=2048, num_steps=25, block=512):
    import jax
    import jax.numpy as jnp
    import optax

    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models import ExactGP
    from nonstationary_precip_tpu.ops.bbmm import cg_mll

    n -= n % block if n > block else 0
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    y = jnp.sin(2 * x[:, 0]) * jnp.cos(x[:, 1]) + 0.15 * jnp.asarray(
        rng.normal(size=n), jnp.float32
    )
    xs = jnp.asarray(rng.uniform(-3, 3, size=(64, 2)), jnp.float32)

    model = ExactGP.create(Scale.create(RBF.create(2)), noise=0.05, mean_type="zero")
    key = jax.random.PRNGKey(0)  # fixed probes: common random numbers

    # --- 1. train on the matrix-free objective, one compiled scan ----------
    opt = optax.adam(0.05)

    def loss(m):
        return -m.mll(
            x, y, solver="cg", key=key, block=block,
            num_probes=8, max_iters=100,
        )

    def step(carry, _):
        m, st = carry
        val, g = jax.value_and_grad(loss)(m)
        up, st = opt.update(g, st)
        return (optax.apply_updates(m, up), st), val

    (model, _), vals = jax.jit(
        lambda m0: jax.lax.scan(step, (m0, opt.init(m0)), None, length=num_steps)
    )(model)
    print(
        f"trained {num_steps} steps matrix-free (N={n}, {block}-row panels, "
        f"Gram never built): loss {float(vals[0]):.4f} -> {float(vals[-1]):.4f}"
    )

    # --- 2. lazy == dense CG (same probe key) ------------------------------
    s2 = model.likelihood.noise
    k_dense = model.kernel(x) + s2 * jnp.eye(n, dtype=jnp.float32)
    dense = float(
        cg_mll(k_dense, y, key, s2, num_probes=8, max_iters=100, tol=1e-6) / n
    )
    lazy = float(-loss(model))
    dmll = abs(lazy - dense)
    print(f"lazy loss matches dense CG MLL |Δ| = {dmll:.2e}")
    assert dmll < 1e-2 * max(1.0, abs(dense)), dmll  # f32 end-to-end parity

    # --- 3. lazy posterior vs dense Cholesky -------------------------------
    post = model.posterior(x, y, xs, solver="cg", block=block, tol=1e-8)
    chol = jnp.linalg.cholesky(k_dense)
    sol = jax.scipy.linalg.cho_solve((chol, True), y)
    mean_ref = model.kernel(xs, x) @ sol
    dmean = float(jnp.max(jnp.abs(post.mean - mean_ref)))
    print(f"lazy posterior vs Cholesky max|Δmean| = {dmean:.2e}")
    assert np.isfinite(float(vals[-1])) and float(vals[-1]) < float(vals[0])
    assert dmean < 1e-2
    print("ok")
    return dmean


if __name__ == "__main__":
    main()
