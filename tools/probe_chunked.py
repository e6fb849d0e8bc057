#!/usr/bin/env python3
"""Host-chunked large-N training probe (DESIGN.md 27): drive
make_chunked_mll eagerly so no single device program outlives the axon
worker's ~60-90 s execution wall.  Usage:
  python tools/probe_chunked.py <n> <chunk_iters> <n_chunks> [steps] [rank]
Writes one JSON line per step to stdout and a summary row into
tools/bench_cg.json under chunked-<n>-i<chunk*nc>."""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import optax

from nonstationary_precip_tpu.ops.lazy_cg import make_chunked_mll
from nonstationary_precip_tpu.ops.pallas_matvec import (
    packed_gibbs_matvec_builder, packed_gibbs_panel_vjp,
)
from tools.bench_cg import _gibbs_cross, log as benchlog
from nonstationary_precip_tpu.utils.backend import wait_for_backend

def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    ci = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nc = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    rank = int(sys.argv[5]) if len(sys.argv) > 5 else 1024
    wait_for_backend()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    y = jnp.sin(2 * x[:, 0]) * jnp.cos(x[:, 1]) + 0.1 * jnp.asarray(
        rng.normal(size=n), jnp.float32)
    params = {"log_ell_pp": jnp.zeros((n, 2), jnp.float32),
              "log_noise": jnp.asarray(-2.0, jnp.float32)}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    m = make_chunked_mll(
        block=2048, num_probes=8, chunk_iters=ci, n_chunks=nc, tol=1e-6,
        precond_rank=rank, precond="nystrom", precond_shift=10.0,
        cross_fn=_gibbs_cross,
        matvec_builder=packed_gibbs_matvec_builder(2),
        panel_vjp=packed_gibbs_panel_vjp(2),
    )

    @jax.jit
    def apply(params, opt_state, xg, s2g):
        g = {"log_ell_pp": -xg[:, 2:] / n,
             "log_noise": -s2g * jnp.exp(params["log_noise"]) / n}
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, up), opt_state

    key = jax.random.PRNGKey(5)
    pkey = jax.random.PRNGKey(17)
    losses, times, relres_last = [], [], None
    for i in range(steps):
        t0 = time.time()
        aug = jnp.concatenate([x, params["log_ell_pp"]], axis=1)
        val, relres, (kg, xg, rg, s2g) = m.value_and_grad(
            None, aug, y, jnp.exp(params["log_noise"]), key, pkey)
        params, opt_state = apply(params, opt_state, xg, s2g)
        loss = -float(val) / n
        relres_last = float(jnp.max(relres))
        dt = time.time() - t0
        losses.append(loss); times.append(dt)
        print(json.dumps({"step": i, "loss": loss, "s": round(dt, 1),
                          "relres_max": relres_last}), flush=True)
    benchlog(f"chunked-lazygnys-r{rank}-i{ci*nc}x{nc}-s10-{n}",
             method="host-chunked-eager",
             s_per_step_median=round(sorted(times[1:])[len(times[1:]) // 2], 1)
             if len(times) > 1 else round(times[0], 1),
             s_steps=[round(t, 1) for t in times],
             loss0=losses[0], lossT=losses[-1],
             relres_max_final=relres_last,
             converged=relres_last is not None and relres_last <= 1e-2,
             chunk_iters=ci, n_chunks=nc,
             note="eager host-chunked driver (make_chunked_mll): per-step "
                  "wall includes all phase dispatches; no device program "
                  "exceeds the ~60-90 s execution wall (DESIGN.md 27)")

if __name__ == "__main__":
    main()
