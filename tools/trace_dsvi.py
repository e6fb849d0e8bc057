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

    # ---- parse the xplane pb: per-op device time ---------------------------
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print(f"xplane files: {paths}", flush=True)
    agg = defaultdict(float)
    total = 0.0
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                if "XLA Ops" not in line.name and "Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    dur = ev.duration_ps / 1e9  # ms
                    agg[name] += dur
                    total += dur
    if not agg:
        # fall back: dump plane/line names so we can adapt
        for p in paths:
            xs = xplane_pb2.XSpace()
            xs.ParseFromString(open(p, "rb").read())
            for plane in xs.planes:
                print(f"plane: {plane.name}")
                for line in plane.lines:
                    print(f"  line: {line.name} ({len(line.events)} events)")
        return
    print(f"\ntotal device op time: {total:.3f} ms over 100 steps")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms:9.3f} ms  {ms/total*100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
