#!/usr/bin/env python3
"""Raw Gram·v matvec on chip: XLA row panels vs the fused Pallas kernel
at each contraction precision.  Differential power-iteration timing
(scans of S and 2S applications, (T₂−T₁)/S) isolates per-matvec cost
from dispatch; a one-shot dense K@v (f32 highest) anchors accuracy.

Usage: python tools/probe_matvec.py [N ...]   (default 16384)
Writes tools/probe_matvec.json.
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

from nonstationary_precip_tpu.kernels.gibbs import gibbs_gram  # noqa: E402
from nonstationary_precip_tpu.ops.pallas_matvec import gibbs_gram_matvec  # noqa: E402

OUT = Path(__file__).parent / "probe_matvec.json"
BLOCK = 2048
R = 9
S = 32
results = json.loads(OUT.read_text()) if OUT.exists() else {}


def log(name, **kw):
    results[name] = kw
    print(name, kw, flush=True)
    OUT.write_text(json.dumps(results, indent=2))


def _panel_matvec(x, ell, v):
    n, d = x.shape
    nb = n // BLOCK

    def body(args):
        x_blk, e_blk = args
        return gibbs_gram(x_blk, e_blk, x, ell) @ v

    out = jax.lax.map(body, (x.reshape(nb, BLOCK, d), ell.reshape(nb, BLOCK, d)))
    return out.reshape(n, v.shape[-1])


def probe(n):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    ell = jnp.asarray(np.exp(0.2 * rng.normal(size=(n, 2))) + 0.3, jnp.float32)
    v0 = jnp.asarray(rng.normal(size=(n, R)), jnp.float32)

    paths = {
        "panel": lambda v: _panel_matvec(x, ell, v),
        "fused-highest": lambda v: gibbs_gram_matvec(x, ell, x, ell, v, "highest"),
        "fused-high": lambda v: gibbs_gram_matvec(x, ell, x, ell, v, "high"),
        "fused-default": lambda v: gibbs_gram_matvec(x, ell, x, ell, v, "default"),
    }

    # accuracy anchor: one application vs the panel oracle (itself exact
    # f32 — same dot products as the dense Gram row by row)
    ref = jax.jit(paths["panel"])(v0)
    jax.block_until_ready(ref)
    scale = float(jnp.max(jnp.abs(ref)))

    def scanned(fn, steps):
        @jax.jit
        def run(v):
            def body(c, _):
                o = fn(c)
                return o / (jnp.max(jnp.abs(o)) + 1e-30), o[0, 0]

            _, trace = jax.lax.scan(body, v, None, length=steps)
            return trace

        return run

    for name, fn in paths.items():
        try:
            err = float(jnp.max(jnp.abs(jax.jit(fn)(v0) - ref))) / scale
            r1, r2 = scanned(fn, S), scanned(fn, 2 * S)
            t0 = time.perf_counter()
            jax.block_until_ready(r1(v0))
            jax.block_until_ready(r2(v0))
            compile_s = time.perf_counter() - t0

            def best(run):
                ts = []
                for _ in range(3):
                    t = time.perf_counter()
                    jax.block_until_ready(run(v0))
                    ts.append(time.perf_counter() - t)
                return min(ts)

            ms = (best(r2) - best(r1)) / S * 1e3
            log(
                f"{name}-{n}",
                ms_per_matvec=round(ms, 4),
                rel_err=f"{err:.2e}",
                first_call_s=round(compile_s, 1),
            )
        except Exception as e:
            log(f"error-{name}-{n}", error=repr(e)[:300])


if __name__ == "__main__":
    from nonstationary_precip_tpu.utils.backend import wait_for_backend

    wait_for_backend()
    print("devices:", jax.devices(), flush=True)
    for n in [int(a) for a in sys.argv[1:]] or [16384]:
        probe(n)
