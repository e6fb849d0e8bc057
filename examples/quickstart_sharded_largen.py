#!/usr/bin/env python3
"""Quickstart 6 — distributed exact GP: the Gram never fits on one chip.

``parallel/sharded_cg.py`` row-shards the train Gram over a device mesh:
each device builds only its (N/P, N) block, the CG matvec all_gathers
partial products over ICI, and the custom-VJP pullback keeps gradients
O(N²/P) per device too.  GPyTorch's BBMM (the regime the reference
trains in, /root/reference/experiments/spatial_exp.py:199) is
single-process — this is the TPU-native extension of it past one chip's
HBM.  The demo runs on a VIRTUAL 8-device CPU mesh (set before jax
initialises), so it works on any machine; on real hardware the same code
runs over a TPU pod slice unchanged.

  1. train: Adam on the sharded stochastic MLL, one compiled scan — with
     the rank-32 pivoted-Cholesky/Woodbury preconditioner (the factor is
     replicated math built OUTSIDE the shard_map; on the trained
     nonstationary pose unpreconditioned CG stalls outright, so the
     preconditioned estimator is the config large-N training ships),
  2. parity: the sharded objective vs the dense single-device CG path
     under the same key and preconditioner rank,
  3. predict: sharded posterior vs the dense Cholesky posterior.

On TPU hardware, pass ``local_matvec_builder=parallel.sharded_cg.
packed_gibbs_local_matvec(d)`` to fuse the Gram·v (ops/pallas_matvec.py)
— the (N/P, N) row-block then never exists either, dropping per-device
peak memory to O(N·(D+R)) (2.0× measured on the Gibbs kernel single-chip,
DESIGN.md §15; Pallas cannot run on the CPU mesh, so this demo keeps the
default path).

Run: python examples/quickstart_sharded_largen.py   (CPU, <1 min)
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np


def main(n=2048, num_steps=25):
    import jax

    # default to the virtual CPU mesh WITHOUT initialising the backend
    # (querying it would hang during a TPU-service outage); set
    # NSGP_ON_TPU=1 to run over real devices instead
    if not os.environ.get("NSGP_ON_TPU"):
        jax.config.update("jax_platforms", "cpu")
    else:
        # real hardware: survive the known backend-outage windows where a
        # bare jax.devices() raises or hangs with the failure cached
        from nonstationary_precip_tpu.utils.backend import wait_for_backend

        wait_for_backend()
    import jax.numpy as jnp
    import optax

    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.ops.bbmm import cg_mll
    from nonstationary_precip_tpu.parallel import (
        make_mesh,
        sharded_cg_mll,
        sharded_cg_posterior,
    )

    n_dev = len(jax.devices())
    n -= n % n_dev  # train rows must divide the mesh
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    y = jnp.sin(2 * x[:, 0]) * jnp.cos(x[:, 1]) + 0.15 * jnp.asarray(
        rng.normal(size=n), jnp.float32
    )
    xs = jnp.asarray(rng.uniform(-3, 3, size=(64, 2)), jnp.float32)

    mesh = make_mesh(n_dev)
    kernel = Scale.create(RBF.create(2))
    s2 = jnp.asarray(0.05, jnp.float32)
    key = jax.random.PRNGKey(0)  # fixed probes: common random numbers

    # --- 1. train on the sharded objective, one compiled scan --------------
    opt = optax.adam(0.05)

    def loss(k):
        return -sharded_cg_mll(
            k, x, y, key, s2, mesh,
            num_probes=8, max_iters=32, tol=1e-6, precond_rank=32,
        )

    def step(carry, _):
        k, st = carry
        val, g = jax.value_and_grad(loss)(k)
        up, st = opt.update(g, st)
        return (optax.apply_updates(k, up), st), val

    (kernel, _), vals = jax.jit(
        lambda k0: jax.lax.scan(step, (k0, opt.init(k0)), None, length=num_steps)
    )(kernel)
    print(
        f"trained {num_steps} steps on the sharded CG objective "
        f"({n_dev} devices, Gram {n}² row-sharded): "
        f"loss {float(vals[0]):.4f} -> {float(vals[-1]):.4f}"
    )

    # --- 2. sharded == dense CG (same probe key + preconditioner rank) -----
    k_dense = kernel(x) + s2 * jnp.eye(n, dtype=jnp.float32)
    dense = float(cg_mll(
        k_dense, y, key, s2,
        num_probes=8, max_iters=32, tol=1e-6, precond_rank=32,
    ))
    sharded = float(loss(kernel))
    dmll = abs(-sharded - dense)
    print(f"sharded vs dense CG MLL |Δ| = {dmll:.2e}")
    assert dmll < 1e-2 * max(1.0, abs(dense)), dmll  # f32 end-to-end parity

    # --- 3. sharded posterior vs dense Cholesky ----------------------------
    mean, cov = sharded_cg_posterior(
        kernel, x, y, xs, s2, mesh, max_iters=60, tol=1e-8, precond_rank=32
    )
    chol = jnp.linalg.cholesky(k_dense)
    sol = jax.scipy.linalg.cho_solve((chol, True), y)
    mean_ref = kernel(xs, x) @ sol
    dmean = float(jnp.max(jnp.abs(mean - mean_ref)))
    print(f"sharded posterior vs Cholesky max|Δmean| = {dmean:.2e}")
    assert np.isfinite(float(vals[-1])) and float(vals[-1]) < float(vals[0])
    assert dmean < 1e-2
    print("ok")
    return dmean


if __name__ == "__main__":
    main()
