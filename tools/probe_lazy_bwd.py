#!/usr/bin/env python3
"""Decompose the preconditioned matrix-free Gibbs step: how much of the
lazygfp32 training step is the custom-VJP BACKWARD panel sweep?

The forward mBCG rides the fused Pallas Gram·v matvec (no N×N HBM
traffic), but `ops/lazy_cg.py::core_bwd` rebuilds every (block, N)
panel through the jnp cross_fn inside jax.vjp — HBM-roofline work that
a fused Pallas pullback kernel could eliminate.  This probe times, at
each N, the SAME loss as tools/bench_cg.py::_loss_lazygfp32:

  fwd    — jitted scan of loss evaluations only (no grad)
  step   — jitted scan of full Adam value_and_grad steps

backward share ≈ (step − fwd) / step.  Differential timing (S vs 2S
scans, best-of-3) per CLAUDE.md.  Writes tools/probe_lazy_bwd.json.
Run alone:  python tools/probe_lazy_bwd.py [N ...]
"""

from __future__ import annotations

import json
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

from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference  # noqa: E402
from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_mll  # noqa: E402
from nonstationary_precip_tpu.ops.pallas_matvec import (  # noqa: E402
    packed_gibbs_matvec_builder,
)

OUT = Path(__file__).parent / "probe_lazy_bwd.json"
_D = 2


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, _D)), jnp.float32)
    y = jnp.sin(2 * x[:, 0]) * jnp.cos(x[:, 1]) + 0.1 * jnp.asarray(
        rng.normal(size=n), jnp.float32
    )
    return x, y


def _gibbs_cross(kern, xa, xb):
    return gibbs_gram_reference(
        xa[:, :_D], jnp.exp(xa[:, _D:]), xb[:, :_D], jnp.exp(xb[:, _D:])
    )


def _loss(params, x, y, key):
    aug = jnp.concatenate([x, params["log_ell_pp"]], axis=1)
    return -lazy_cg_mll(
        None, aug, y, key, jnp.exp(params["log_noise"]),
        block=2048, num_probes=8, max_iters=32, tol=1e-6, precond_rank=50,
        cross_fn=_gibbs_cross,
        matvec_builder=packed_gibbs_matvec_builder(_D),
    ) / y.shape[0]


def main(sizes):
    from nonstationary_precip_tpu.utils.backend import wait_for_backend

    wait_for_backend()
    print("devices:", jax.devices(), flush=True)
    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    key = jax.random.PRNGKey(5)
    opt = optax.adam(1e-2)

    for n in sizes:
        x, y = _data(n)
        p0 = {
            "log_ell_pp": jnp.zeros((n, _D), jnp.float32),
            "log_noise": jnp.asarray(-2.0, jnp.float32),
        }
        steps = 10 if n <= 16384 else 4

        def fwd_scan(length):
            @jax.jit
            def run(params):
                def body(c, _):
                    # c carries a perturbation so XLA can't hoist the loss
                    val = _loss(
                        jax.tree.map(lambda a: a + 0 * c, params), x, y, key
                    )
                    return val, val

                return jax.lax.scan(body, jnp.float32(0), None, length=length)

            return run

        def step_scan(length):
            @jax.jit
            def run(params):
                st = opt.init(params)

                def body(carry, _):
                    p, s = carry
                    val, g = jax.value_and_grad(_loss)(p, x, y, key)
                    up, s = opt.update(g, s)
                    return (optax.apply_updates(p, up), s), val

                (p, _), vals = jax.lax.scan(body, (params, st), None, length=length)
                return vals

            return run

        row = {}
        for tag, make, arg in (
            ("fwd", fwd_scan, p0),
            ("step", step_scan, p0),
        ):
            r1, r2 = make(steps), make(2 * steps)
            jax.block_until_ready(r1(arg))
            jax.block_until_ready(r2(arg))

            def best(f):
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(f(arg))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            row[f"{tag}_ms"] = round((best(r2) - best(r1)) / steps * 1e3, 3)
        row["bwd_ms"] = round(row["step_ms"] - row["fwd_ms"], 3)
        row["bwd_share"] = round(row["bwd_ms"] / row["step_ms"], 3)
        results[f"tpu-{n}"] = row
        print(f"tpu-{n}", row, flush=True)
        OUT.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [16384])
