#!/usr/bin/env python3
"""Scaling study: exact-GP MLL training-step time vs N on one chip.

Beyond the bundled datasets (N ≤ 5.7k), this measures where the direct
Cholesky MLL stands as N grows — the framework's answer to "what happens
at production scale" on a single v5e.  Prints one JSON line per N.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    except Exception:
        pass

    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models import ExactGP, GibbsExactGP
    from nonstationary_precip_tpu.priors import LogNormalProcess

    rng = np.random.default_rng(0)

    # nonstationary MAP steps: the fused Gram→chol→solve Pallas kernel
    # serves 768 ≤ N ≤ 1280 (1.49× the XLA composition at N=1024)
    for n in (1024, 1280):
        x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
        y = jnp.sin(x[:, 0])
        prior = LogNormalProcess.create(2, mean=float(np.log(0.3)), outputscale=1.0, lengthscale=1.3)
        gmodel = GibbsExactGP.create(x, prior, noise=0.011, outputscale=0.644)
        pc = prior.gram_chol(x)
        optimizer = optax.adam(0.01)
        opt_state = optimizer.init(gmodel)
        steps = 20

        @jax.jit
        def gchunk(model, opt_state):
            def step(carry, _):
                m, s = carry
                loss, grads = jax.value_and_grad(lambda mm: mm.loss(x, y, pc))(m)
                updates, s = optimizer.update(grads, s, m)
                m = optax.apply_updates(m, updates)
                return (m, s), loss

            return jax.lax.scan(step, (model, opt_state), None, length=steps)

        # differential timing: (T(2S) - T(S))/S cancels the ~28 ms
        # per-program axon dispatch constant
        @jax.jit
        def gchunk2(model, opt_state):
            def step(carry, _):
                m, s = carry
                loss, grads = jax.value_and_grad(lambda mm: mm.loss(x, y, pc))(m)
                updates, s = optimizer.update(grads, s, m)
                m = optax.apply_updates(m, updates)
                return (m, s), loss

            return jax.lax.scan(step, (model, opt_state), None, length=2 * steps)

        jax.block_until_ready(gchunk(gmodel, opt_state)[1])
        jax.block_until_ready(gchunk2(gmodel, opt_state)[1])
        t0 = time.perf_counter()
        jax.block_until_ready(gchunk(gmodel, opt_state)[1])
        t1 = time.perf_counter()
        jax.block_until_ready(gchunk2(gmodel, opt_state)[1])
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / steps
        print(
            json.dumps(
                {
                    "metric": "gibbs_map_step_ms",
                    "N": n,
                    "value": round(dt * 1e3, 3),
                    "unit": "ms/step",
                    "kernel": "pallas_fused",
                }
            ),
            flush=True,
        )

    for n in (1024, 2048, 4096, 8192):
        x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
        y = jnp.sin(x[:, 0])
        model = ExactGP.create(Scale.create(RBF.create(2)), mean_type="zero")
        optimizer = optax.adam(0.01)
        opt_state = optimizer.init(model)

        steps = 20

        @jax.jit
        def chunk(model, opt_state):
            def step(carry, _):
                m, s = carry
                loss, grads = jax.value_and_grad(lambda mm: mm.loss(x, y))(m)
                updates, s = optimizer.update(grads, s, m)
                m = optax.apply_updates(m, updates)
                return (m, s), loss

            (model, opt_state), losses = jax.lax.scan(
                step, (model, opt_state), None, length=steps
            )
            return model, opt_state, losses

        @jax.jit
        def chunk2(model, opt_state):
            def step(carry, _):
                m, s = carry
                loss, grads = jax.value_and_grad(lambda mm: mm.loss(x, y))(m)
                updates, s = optimizer.update(grads, s, m)
                m = optax.apply_updates(m, updates)
                return (m, s), loss

            (model, opt_state), losses = jax.lax.scan(
                step, (model, opt_state), None, length=2 * steps
            )
            return model, opt_state, losses

        jax.block_until_ready(chunk(model, opt_state)[2])
        jax.block_until_ready(chunk2(model, opt_state)[2])
        t0 = time.perf_counter()
        jax.block_until_ready(chunk(model, opt_state)[2])
        t1 = time.perf_counter()
        jax.block_until_ready(chunk2(model, opt_state)[2])
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / steps
        print(
            json.dumps(
                {
                    "metric": "exact_gp_mll_step_ms",
                    "N": n,
                    "value": round(dt * 1e3, 3),
                    "unit": "ms/step",
                    "gflops_chol": round((n**3 / 3) / dt / 1e9, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
