#!/usr/bin/env python3
"""On-chip parity + differential timing of the fused ELBO data term
(ops/pallas_elbo.py) vs the composed propagate path, at the DSVI
benchmark configuration (2-layer DeepGP, M=250, B=315, S=3).

Run alone on the TPU:  python tools/bench_elbo.py [steps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

STEPS = 100


def timeit_scanned(step_fn, carry0, steps=STEPS):
    def make(length):
        @jax.jit
        def chunk(carry):
            def body(c, _):
                return step_fn(c), None

            c, _ = jax.lax.scan(body, carry, None, length=length)
            return c

        return chunk

    c1, c2 = make(steps), make(2 * steps)
    jax.block_until_ready(c1(carry0))
    jax.block_until_ready(c2(carry0))

    def med(f):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(carry0))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[2]

    return (med(c2) - med(c1)) / steps * 1e3


def main():
    from nonstationary_precip_tpu.models import DeepGP

    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(173)
    ki, kd, kl = jax.random.split(key, 3)
    b, m, s = 315, 250, 3
    model = DeepGP.create(ki, input_dims=2, num_layers=2, num_inducing=m)
    x = jax.random.normal(kd, (b, 2), jnp.float32)
    y = jnp.sin(x[:, 0]) + 0.1 * x[:, 1]

    # ---- on-chip parity: value + grads, fused vs composed ----------------
    lf = jax.jit(lambda mm: mm.loss(kl, x, y, num_data=b, num_samples=s))
    lc = jax.jit(
        lambda mm: mm.loss(kl, x, y, num_data=b, num_samples=s, fused_elbo=False)
    )
    vf, vc = float(lf(model)), float(lc(model))
    print(f"loss fused={vf:.6f} composed={vc:.6f} |Δ|={abs(vf-vc):.2e}", flush=True)
    gf = jax.jit(jax.grad(lambda mm: mm.loss(kl, x, y, num_data=b, num_samples=s)))(model)
    gc = jax.jit(
        jax.grad(lambda mm: mm.loss(kl, x, y, num_data=b, num_samples=s, fused_elbo=False))
    )(model)
    worst = 0.0
    for a, bb in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gc)):
        scale = float(jnp.max(jnp.abs(bb))) + 1e-4
        worst = max(worst, float(jnp.max(jnp.abs(a - bb))) / scale)
    print(f"grad worst rel: {worst:.2e}", flush=True)
    assert abs(vf - vc) < 5e-4 and worst < 2e-2, "ON-CHIP PARITY FAILED"

    # ---- differential step timing ----------------------------------------
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else STEPS
    optimizer = optax.adam(0.01)

    def make_step(fused):
        def step(carry):
            mm, st, k = carry
            k, sub = jax.random.split(k)
            loss, grads = jax.value_and_grad(
                lambda m_: m_.loss(
                    sub, x, y, num_data=b, num_samples=s,
                    fused_elbo=None if fused else False,
                )
            )(mm)
            updates, st = optimizer.update(grads, st, mm)
            return optax.apply_updates(mm, updates), st, k

        return step

    # forward-only: chain the loss back into a model leaf to keep steps
    # sequentially dependent
    def make_fwd(fused):
        def step(carry):
            mm, st, k = carry
            k, sub = jax.random.split(k)
            loss = mm.loss(
                sub, x, y, num_data=b, num_samples=s,
                fused_elbo=None if fused else False,
            )
            mm = mm.replace(
                likelihood=mm.likelihood.replace(
                    raw_noise=mm.likelihood.raw_noise + 1e-30 * loss
                )
            )
            return mm, st, k

        return step

    carry0 = (model, optimizer.init(model), kl)
    tf_comp = timeit_scanned(make_fwd(False), carry0, steps)
    tf_fused = timeit_scanned(make_fwd(True), carry0, steps)
    print(f"fwd-only: composed {tf_comp:.3f} ms  fused {tf_fused:.3f} ms", flush=True)

    t_comp = timeit_scanned(make_step(False), carry0, steps)
    t_fused = timeit_scanned(make_step(True), carry0, steps)
    print(
        f"DSVI step: composed {t_comp:.3f} ms  fused {t_fused:.3f} ms  "
        f"({t_comp/t_fused:.2f}x)  → {1.0/t_fused*1000:.0f} steps/s fused",
        flush=True,
    )


if __name__ == "__main__":
    main()
