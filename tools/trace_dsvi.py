#!/usr/bin/env python3
"""Capture a jax.profiler device trace of the DSVI training step and print
a per-op time breakdown (parsed from the xplane protobuf via
tensorboard_plugin_profile, which is available in this image).

Usage: python tools/trace_dsvi.py   (TPU; run alone)
"""

from __future__ import annotations

import glob
import gzip
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH, M, S, DIN = 315, 250, 3, 2
TRACE_DIR = "/tmp/dsvi_trace"


def main():
    import optax

    from nonstationary_precip_tpu.models import DeepGP

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, DIN)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), jnp.float32)
    key = jax.random.PRNGKey(173)
    model = DeepGP.create(key, input_dims=DIN, num_layers=2, num_inducing=M)
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(model)

    @jax.jit
    def chunk(model, opt_state, k):
        def body(carry, _):
            m, os_, kk = carry
            kk, sub = jax.random.split(kk)
            loss, grads = jax.value_and_grad(
                lambda mm: mm.loss(sub, x, y, num_data=BATCH, num_samples=S)
            )(m)
            updates, os_ = optimizer.update(grads, os_)
            m = optax.apply_updates(m, updates)
            return (m, os_, kk), loss

        (model, opt_state, k), losses = jax.lax.scan(
            body, (model, opt_state, k), None, length=100
        )
        return model, opt_state, k, losses

    print(f"backend: {jax.default_backend()}", flush=True)
    # warm
    out = chunk(model, opt_state, key)
    jax.block_until_ready(out)

    with jax.profiler.trace(TRACE_DIR):
        out = chunk(*out[:3])
        jax.block_until_ready(out)
    print("trace captured", flush=True)

    # ---- parse the Chrome-trace JSON: per-op device time -----------------
    import json
    from collections import defaultdict as dd

    paths = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    print(f"trace files: {paths}", flush=True)
    agg = dd(float)
    total = 0.0
    for p in paths:
        d = json.load(gzip.open(p))
        events = d.get("traceEvents", [])
        pid_names = {
            e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        for e in events:
            if e.get("ph") == "X" and "TPU" in pid_names.get(e.get("pid"), ""):
                agg[e.get("name", "?")] += e.get("dur", 0) / 1e3
                total += e.get("dur", 0) / 1e3
    print(f"\ntotal device event time: {total:.3f} ms over 100 steps")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
