#!/usr/bin/env python3
"""Isolate the N=262144 training-step device fault (bench_cg.json
``error-lazygnys-r1024-i32-s10-262144``): the forward mBCG probe
converges at this N (tools/probe_precond_chip.json) but the full fused
Adam step faults 3/3.  The step differs from the probe by exactly one
on-chip component — the fused backward panel sweep
(ops/pallas_matvec.packed_gibbs_panel_grads).  Run that kernel ALONE at
131072 (known-good end-to-end size, control) and 262144, plus the fused
forward matvec at 262144 (expected good), and report which phase
faults.

Run alone (never share the TPU).  Writes tools/probe_panel_262144.json.
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nonstationary_precip_tpu.utils.backend import wait_for_backend  # noqa: E402

OUT = Path(__file__).parent / "probe_panel_262144.json"
results = json.loads(OUT.read_text()) if OUT.exists() else {}


def log(name, **kw):
    results[name] = kw
    print(name, kw, flush=True)
    OUT.write_text(json.dumps(results, indent=2))


def _inputs(n, r=8, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, d)), jnp.float32)
    ell = jnp.asarray(rng.uniform(0.5, 2.0, size=(n, d)), jnp.float32)
    alpha = jnp.asarray(rng.normal(size=n), jnp.float32)
    solves = jnp.asarray(rng.normal(size=(n, r)), jnp.float32)
    rights = jnp.asarray(rng.normal(size=(n, r)), jnp.float32)
    return x, ell, alpha, solves, rights


def phase_panel(n):
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        packed_gibbs_panel_grads,
    )

    x, ell, alpha, solves, rights = _inputs(n)
    f = jax.jit(packed_gibbs_panel_grads)
    t0 = time.time()
    gx, gl, sp = f(x, ell, alpha, solves, rights)
    # fetch VALUES — .shape on a dispatched result proves nothing (CLAUDE)
    s = (float(jnp.sum(gx)), float(jnp.sum(gl)), float(jnp.sum(sp)))
    log(f"panel-{n}", wall_s=round(time.time() - t0, 1), sums=s,
        finite=all(np.isfinite(v) for v in s))


def phase_matvec(n):
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        make_gibbs_matvec,
    )

    x, ell, alpha, _, _ = _inputs(n)
    mv = make_gibbs_matvec(x, ell, x, ell)
    f = jax.jit(lambda v: mv(v))
    t0 = time.time()
    out = f(alpha[:, None])
    s = float(jnp.sum(out))
    log(f"matvec-{n}", wall_s=round(time.time() - t0, 1), total=s,
        finite=bool(np.isfinite(s)))


def main():
    wait_for_backend()
    phases = sys.argv[1:] or ["panel-131072", "matvec-262144", "panel-262144"]
    for p in phases:
        kind, n = p.rsplit("-", 1)
        try:
            (phase_panel if kind == "panel" else phase_matvec)(int(n))
        except Exception as e:  # noqa: BLE001 — record the fault, keep going
            log(p, error=repr(e)[:300])
            traceback.print_exc()


if __name__ == "__main__":
    main()
