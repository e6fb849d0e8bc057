#!/usr/bin/env python3
"""Ablation breakdown of the headline DSVI training step (bench.py
config: B=315, M=250, S=3, 2 hidden + head = 3 SVGP layers).

Scan-differential timings (ms/step) of nested components:

  fwd      — ELBO forward only
  vag      — value_and_grad of the ELBO          (bwd share = vag − fwd)
  pre      — precompute_layers only (fused Pallas kernel path)
  pre_xla  — precompute_layers with NSGP_PALLAS_SVGP=0 (batched XLA)
  fwd_xla  — ELBO forward on the XLA precompute path

Each step threads a key-split chain (and a 1e-30 model perturbation for
the precompute-only variants) so scan iterations stay sequentially
dependent and can't be hoisted/CSE'd.  Compare with bench.py's full-step
number for the Adam share.  Run alone (never share the TPU).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH, M, S, DIN = 315, 250, 3, 2
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

    def med3(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(carry0))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    return (med3(c2) - med3(c1)) / steps * 1e3


def main():
    from nonstationary_precip_tpu.models import DeepGP
    from nonstationary_precip_tpu.models.svgp import precompute_layers

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, DIN)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), jnp.float32)
    key = jax.random.PRNGKey(173)
    model = DeepGP.create(key, input_dims=DIN, num_layers=2, num_inducing=M)
    print(f"backend: {jax.default_backend()}", flush=True)

    def fwd_step(carry):
        m, k, acc = carry
        k, sub = jax.random.split(k)
        loss = m.loss(sub, x, y, num_data=BATCH, num_samples=S)
        return m, k, acc + loss

    def vag_step(carry):
        m, k, acc = carry
        k, sub = jax.random.split(k)
        loss, grads = jax.value_and_grad(
            lambda mm: mm.loss(sub, x, y, num_data=BATCH, num_samples=S)
        )(m)
        m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
        return m, k, acc + loss

    def pre_step(carry):
        m, k, acc = carry
        # perturb one leaf by acc·1e-30 so iterations chain
        uniq = list(m.layers) + [m.head]
        uniq[0] = uniq[0].replace(z=uniq[0].z + acc * 1e-30)
        outs = precompute_layers(uniq)
        acc = acc + sum(jnp.sum(o[0][..., :1, :1]) for o in outs) * 1e-20
        return m, k, acc

    carry0 = (model, key, jnp.asarray(0.0, jnp.float32))

    results = {}
    for name, fn, env in (
        ("pre", pre_step, "1"),
        ("pre_xla", pre_step, "0"),
        ("fwd", fwd_step, "1"),
        ("fwd_xla", fwd_step, "0"),
        ("vag", vag_step, "1"),
    ):
        os.environ["NSGP_PALLAS_SVGP"] = env
        ms = timeit_scanned(fn, carry0)
        results[name] = ms
        print(f"{name}: {ms:.3f} ms/step", flush=True)

    os.environ["NSGP_PALLAS_SVGP"] = "1"
    print(f"bwd share (vag−fwd): {results['vag'] - results['fwd']:.3f} ms", flush=True)
    print(
        f"fwd minus pre: {results['fwd'] - results['pre']:.3f} ms",
        flush=True,
    )




def main_bwd():
    """Backward ablation: vag_xla (XLA-path full step) and pre_vag
    (value_and_grad of a precompute-only scalar — isolates the fused
    kernel's forward+VJP cost)."""
    from nonstationary_precip_tpu.models import DeepGP
    from nonstationary_precip_tpu.models.svgp import precompute_layers

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, DIN)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), jnp.float32)
    key = jax.random.PRNGKey(173)
    model = DeepGP.create(key, input_dims=DIN, num_layers=2, num_inducing=M)
    print(f"backend: {jax.default_backend()}", flush=True)

    def vag_step(carry):
        m, k, acc = carry
        k, sub = jax.random.split(k)
        loss, grads = jax.value_and_grad(
            lambda mm: mm.loss(sub, x, y, num_data=BATCH, num_samples=S)
        )(m)
        m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
        return m, k, acc + loss

    def pre_vag_step(carry):
        m, k, acc = carry

        def scalar(mm):
            uniq = list(mm.layers) + [mm.head]
            outs = precompute_layers(uniq)
            s = 0.0
            for l_o, lit_o, w_o in outs:
                s = s + jnp.sum(l_o * 1e-6) + jnp.sum(w_o * 1e-6) + jnp.sum(lit_o * 1e-6)
            return s

        val, grads = jax.value_and_grad(scalar)(m)
        m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
        return m, k, acc + val

    carry0 = (model, key, jnp.asarray(0.0, jnp.float32))
    for name, fn, env in (
        ("pre_vag", pre_vag_step, "1"),
        ("pre_vag_xla", pre_vag_step, "0"),
        ("vag", vag_step, "1"),
        ("vag_xla", vag_step, "0"),
    ):
        os.environ["NSGP_PALLAS_SVGP"] = env
        ms = timeit_scanned(fn, carry0)
        print(f"{name}: {ms:.3f} ms/step", flush=True)
    os.environ["NSGP_PALLAS_SVGP"] = "1"





def main_scaling():
    """Scaling ablations locating the non-precompute backward cost:
    vag at S∈{1,3}, num_layers∈{1,2} (post layer-1-marginal-hoist code)."""
    import itertools

    from nonstationary_precip_tpu.models import DeepGP

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, DIN)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), jnp.float32)
    key = jax.random.PRNGKey(173)
    print(f"backend: {jax.default_backend()}", flush=True)

    for nl, s in itertools.product((2, 1), (3, 1)):
        model = DeepGP.create(key, input_dims=DIN, num_layers=nl, num_inducing=M)

        def vag_step(carry, _s=s):
            m, k, acc = carry
            k, sub = jax.random.split(k)
            loss, grads = jax.value_and_grad(
                lambda mm: mm.loss(sub, x, y, num_data=BATCH, num_samples=_s)
            )(m)
            m = jax.tree.map(lambda p, g: p - 1e-12 * g, m, grads)
            return m, k, acc + loss

        carry0 = (model, key, jnp.asarray(0.0, jnp.float32))
        ms = timeit_scanned(vag_step, carry0)
        print(f"vag layers={nl} S={s}: {ms:.3f} ms/step", flush=True)


if __name__ == "__main__":
    if "--bwd" in sys.argv:
        main_bwd()
    elif "--scaling" in sys.argv:
        main_scaling()
    else:
        main()
