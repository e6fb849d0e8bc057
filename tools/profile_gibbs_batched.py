#!/usr/bin/env python3
"""Ablation breakdown of the SHIPPED batched 10-split gibbs training step
(gibbs_map_loss_batched + masked Adam), the fit phase of RESULTS.json's
gibbs_spatial_exact_10split row (5000 steps -> the row's wallclock floor).

Differential scan timings (dispatch cancels, profile_gibbs.py method):

  vag      full value_and_grad of summed gibbs_map_loss_batched + sgd probe
  fwd      forward losses only
  gram     batched Gibbs gram value_and_grad (probe scalar)
  cholinv  gram + chol_inv_batched_safe value_and_grad (probe scalar)
  prior    the vmapped frozen-prior log_prob term alone (gram_pre hoisted)

Run alone on the TPU.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from tools.profile_gibbs import timeit_scanned  # noqa: E402


def main():
    from nonstationary_precip_tpu.experiments.spatial_gibbs import (
        ExperimentConfig,
        build_prior,
        load_uib_spatial,
        make_split,
    )
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram
    from nonstationary_precip_tpu.models.gibbs_gp import gibbs_map_loss_batched
    from nonstationary_precip_tpu.ops.pallas_chol import chol_inv_batched_safe
    from nonstationary_precip_tpu.train.vmapped import stack_pytrees
    from nonstationary_precip_tpu.utils.transforms import positive

    cfg = ExperimentConfig(lr=0.01, max_iters=5000).parse_args([])
    _, x, y = load_uib_spatial()
    xn = (x - x.mean(0)) / x.std(0, ddof=1)
    yn = (y - y.mean()) / y.std(ddof=1)
    splits = [make_split(xn, yn, s, cfg, jnp.float32) for s in range(cfg.num_splits)]
    models = stack_pytrees([s[0] for s in splits])
    xs, ys = (jnp.stack(list(a)) for a in zip(*[s[2] for s in splits]))
    pcs = jax.jit(jax.vmap(build_prior(cfg, jnp.float32).gram_pre))(xs)
    print(f"backend: {jax.default_backend()}  x: {xs.shape}", flush=True)

    def vag_step(carry):
        m, acc = carry
        loss, grads = jax.value_and_grad(
            lambda mm: jnp.sum(gibbs_map_loss_batched(mm, xs, ys, pcs))
        )(m)
        m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
        return m, acc + loss

    def fwd_step(carry):
        m, acc = carry
        loss = jnp.sum(gibbs_map_loss_batched(m, xs, ys, pcs))
        return m, acc + loss

    def gram_step(carry):
        m, acc = carry

        def probe(mm):
            ell = jnp.exp(mm.log_ell)
            k = jax.vmap(lambda xx, ee: gibbs_gram(xx, ee, xx, ee))(xs, ell)
            return jnp.sum(k * 1e-6)

        val, grads = jax.value_and_grad(probe)(m)
        m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
        return m, acc + val

    def cholinv_step(carry):
        m, acc = carry

        def probe(mm):
            n = ys.shape[-1]
            ell = jnp.exp(mm.log_ell)
            s2 = positive(mm.raw_outputscale)
            k = s2[:, None, None] * jax.vmap(
                lambda xx, ee: gibbs_gram(xx, ee, xx, ee)
            )(xs, ell) + mm.likelihood.noise[:, None, None] * jnp.eye(
                n, dtype=ys.dtype
            )
            l, li = chol_inv_batched_safe(k)
            return jnp.sum(jnp.log(jnp.abs(l[:, -1, -1]))) + jnp.sum(li * 1e-6)

        val, grads = jax.value_and_grad(probe)(m)
        m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
        return m, acc + val

    def prior_step(carry):
        m, acc = carry

        def probe(mm):
            return jnp.sum(
                jax.vmap(lambda m1, xx, pc: m1.prior.log_prob(xx, m1.log_ell, pc))(
                    mm, xs, pcs
                )
            )

        val, grads = jax.value_and_grad(probe)(m)
        m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
        return m, acc + val

    carry0 = (models, jnp.asarray(0.0, jnp.float32))
    for name, fn in (
        ("gram", gram_step),
        ("cholinv", cholinv_step),
        ("prior", prior_step),
        ("fwd", fwd_step),
        ("vag", vag_step),
    ):
        ms = timeit_scanned(fn, carry0)
        print(f"{name}: {ms:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
