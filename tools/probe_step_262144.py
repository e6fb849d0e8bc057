#!/usr/bin/env python3
"""Reproduce / bisect the N=262144 training-step device fault
(bench_cg.json ``error-lazygnys-r1024-i32-s10-262144``).  The panel
kernel is exonerated standalone (tools/probe_panel_262144.py: finite at
262144), so this runs the FULL fused Adam step — one jitted
value_and_grad + optax update, x/y as jit ARGUMENTS (no giant embedded
constants; the axon compile service rejects request bodies past a size
limit — probe_panel's closure-constant variant died with HTTP 413 at
2x134 MB of payload constants) — under a cleaner error surface.

Phases (argv, default "fused"):
  fused            the failing row config (nystrom r1024 shift 10 i32)
  nopanel          same but panel_vjp=None (XLA backward scan)
  r256             nystrom r256 (factor 4x smaller)
  i8               8-iteration budget (shorter mBCG scan)

Run alone (never share the TPU).  Writes tools/probe_step_262144.json.
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_traceback_filtering", "off")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from nonstationary_precip_tpu.ops.lazy_cg import lazy_cg_mll  # noqa: E402
from nonstationary_precip_tpu.utils.backend import wait_for_backend  # noqa: E402

OUT = Path(__file__).parent / "probe_step_262144.json"
results = json.loads(OUT.read_text()) if OUT.exists() else {}

N = 262144
D = 2


def log(name, **kw):
    results[name] = kw
    print(name, kw, flush=True)
    OUT.write_text(json.dumps(results, indent=2))


def _gibbs_cross(kern, xa, xb):
    from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram_reference

    return gibbs_gram_reference(
        xa[:, :D], jnp.exp(xa[:, D:]), xb[:, :D], jnp.exp(xb[:, D:])
    )


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    y = jnp.sin(2 * x[:, 0]) * jnp.cos(x[:, 1]) + 0.1 * jnp.asarray(
        rng.normal(size=n), jnp.float32
    )
    return x, y


def make_loss(rank, iters, shift, fused_bwd):
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        packed_gibbs_matvec_builder,
        packed_gibbs_panel_vjp,
    )

    def loss(params, x, y, key):
        n = y.shape[0]
        aug = jnp.concatenate([x, params["log_ell_pp"]], axis=1)
        return (
            -lazy_cg_mll(
                None, aug, y, key, jnp.exp(params["log_noise"]),
                block=2048, num_probes=8, max_iters=iters, tol=1e-6,
                cross_fn=_gibbs_cross,
                matvec_builder=packed_gibbs_matvec_builder(D),
                panel_vjp=packed_gibbs_panel_vjp(D) if fused_bwd else None,
                precond_rank=rank,
                precond="nystrom",
                precond_shift=shift,
                precond_key=jax.random.PRNGKey(17),
            )
            / n
        )

    return loss


PHASES = {
    "fused": dict(rank=1024, iters=32, shift=10.0, fused_bwd=True),
    "nopanel": dict(rank=1024, iters=32, shift=10.0, fused_bwd=False),
    "r256": dict(rank=256, iters=32, shift=10.0, fused_bwd=True),
    "i8": dict(rank=1024, iters=8, shift=10.0, fused_bwd=True),
}


def run_phase(name):
    cfg = PHASES[name]
    loss = make_loss(**cfg)
    x, y = _data(N)
    params = {
        "log_ell_pp": jnp.zeros((N, D), jnp.float32),
        "log_noise": jnp.asarray(-2.0, jnp.float32),
    }
    opt = optax.adam(1e-2)
    st = opt.init(params)
    key = jax.random.PRNGKey(5)

    @jax.jit
    def step(params, st, x, y, key):
        val, g = jax.value_and_grad(loss)(params, x, y, key)
        up, st = opt.update(g, st)
        return optax.apply_updates(params, up), st, val

    t0 = time.time()
    params, st, val = step(params, st, x, y, key)
    v0 = float(val)  # fetch — .shape on a dispatched result proves nothing
    t1 = time.time()
    params, st, val = step(params, st, x, y, key)
    v1 = float(val)
    log(f"step-{name}", compile_plus_step_s=round(t1 - t0, 1),
        step2_s=round(time.time() - t1, 1), loss0=v0, loss1=v1,
        finite=bool(np.isfinite(v0) and np.isfinite(v1)))


def main():
    wait_for_backend()
    for name in sys.argv[1:] or ["fused"]:
        try:
            run_phase(name)
        except Exception as e:  # noqa: BLE001 — record, keep bisecting
            log(f"step-{name}", error=repr(e)[:500])
            traceback.print_exc()


if __name__ == "__main__":
    main()
