#!/usr/bin/env python3
"""Ablation breakdown of the gibbs_spatial_exact_10split training step
(the slowest RESULTS.json row at ~26 ms/step × 5000 iters).

Differential scan timings of nested components of the 10-split vmapped
GibbsExactGP step (exactly the spatial_gibbs experiment's configuration):

  vag    — full value_and_grad of the summed per-split losses
  fwd    — forward losses only
  gram   — batched Gibbs gram only (value_and_grad of a probe scalar)
  chol   — batched gram + safe_cholesky (value_and_grad of a probe scalar)

Run alone on the TPU.
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

STEPS = 50


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

    def med3(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(carry0))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    return (med3(c2) - med3(c1)) / steps * 1e3


def main():
    from nonstationary_precip_tpu.experiments.spatial_gibbs import (
        ExperimentConfig,
        load_uib_spatial,
        make_split,
    )
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram
    from nonstationary_precip_tpu.ops.linalg import safe_cholesky
    from nonstationary_precip_tpu.train.vmapped import stack_pytrees

    cfg = ExperimentConfig(lr=0.01, max_iters=5000).parse_args([])
    _, x, y = load_uib_spatial()
    xn = (x - x.mean(0)) / x.std(0, ddof=1)
    yn = (y - y.mean()) / y.std(ddof=1)
    splits = [make_split(xn, yn, s, cfg, jnp.float32) for s in range(cfg.num_splits)]
    models = stack_pytrees([s[0] for s in splits])
    xs, ys = (jnp.stack(list(a)) for a in zip(*[s[2] for s in splits]))
    pcs = jax.jit(jax.vmap(splits[0][0].prior.gram_pre))(xs)
    args = (xs, ys, pcs)
    print(
        f"backend: {jax.default_backend()}  n_train: {args[0].shape}",
        flush=True,
    )

    def vag_step(carry):
        m, acc = carry
        loss, grads = jax.value_and_grad(
            lambda mm: jnp.sum(
                jax.vmap(lambda m1, *aa: m1.loss(*aa))(mm, *args)
            )
        )(m)
        m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
        return m, acc + loss

    def fwd_step(carry):
        m, acc = carry
        loss = jnp.sum(jax.vmap(lambda m1, *aa: m1.loss(*aa))(m, *args))
        return m, acc + loss

    def gram_step(carry):
        m, acc = carry

        def probe(mm):
            def one(m1, xx, yy, pc):
                ell = jnp.exp(m1.log_ell)
                k = m1.outputscale * gibbs_gram(xx, ell, xx, ell)
                return jnp.sum(k * 1e-6)

            return jnp.sum(jax.vmap(one)(mm, *args))

        val, grads = jax.value_and_grad(probe)(m)
        m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
        return m, acc + val

    def chol_step(carry):
        m, acc = carry

        def probe(mm):
            def one(m1, xx, yy, pc):
                ell = jnp.exp(m1.log_ell)
                n = yy.shape[-1]
                k = m1.outputscale * gibbs_gram(xx, ell, xx, ell)
                chol = safe_cholesky(
                    k + m1.likelihood.noise * jnp.eye(n, dtype=k.dtype)
                )
                return jnp.sum(jnp.log(jnp.diagonal(chol)))

            return jnp.sum(jax.vmap(one)(mm, *args))

        val, grads = jax.value_and_grad(probe)(m)
        m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
        return m, acc + val

    carry0 = (models, jnp.asarray(0.0, jnp.float32))
    for name, fn in (("gram", gram_step), ("chol", chol_step), ("fwd", fwd_step), ("vag", vag_step)):
        ms = timeit_scanned(fn, carry0)
        print(f"{name}: {ms:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
