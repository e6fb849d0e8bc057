#!/usr/bin/env python3
"""Run all reference benchmark configs on the current backend and record
RMSE/NLPD to RESULTS.json — the parity evidence for BASELINE.md."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

RESULTS = Path("RESULTS.json")


def record(name, rmse, nlpd, seconds):
    data = json.loads(RESULTS.read_text()) if RESULTS.exists() else {}
    data[name] = {
        "rmse": float(rmse),
        "nlpd": float(nlpd),
        "wallclock_s": round(seconds, 1),
        "backend": jax.default_backend(),
    }
    RESULTS.write_text(json.dumps(data, indent=2))
    print(f"[{name}] RMSE={rmse:.4f} NLPD={nlpd:.4f} ({seconds:.0f}s)", flush=True)


def run(name, fn, argv):
    t0 = time.time()
    try:
        r, n = fn(argv)
        record(name, r, n, time.time() - t0)
    except Exception as e:  # keep going; record the failure
        data = json.loads(RESULTS.read_text()) if RESULTS.exists() else {}
        data[name] = {"error": repr(e)[:500]}
        RESULTS.write_text(json.dumps(data, indent=2))
        print(f"[{name}] FAILED: {e!r}", flush=True)


def main():
    only = sys.argv[1:] if len(sys.argv) > 1 else None

    from nonstationary_precip_tpu.experiments import (
        deepgp_spatial,
        seard_spatial,
        sgpr_bench,
        spatial_gibbs,
        spatio_temporal,
        spatiotemporal_dgp,
        spatiotemporal_stationary,
        temporal,
    )

    jobs = [
        ("seard_spatial_10split", seard_spatial.main, ["--max_iters", "400"]),
        ("temporal", temporal.main, ["--max_iters", "2000"]),
        ("spatio_temporal_stationary_exact", spatiotemporal_stationary.main, []),
        ("spatio_temporal_stationary", spatio_temporal.main, ["--model", "Stationary", "--max_iters", "500"]),
        (
            "spatio_temporal_nonstationary",
            spatio_temporal.main,
            ["--model", "Non-Stationary", "--max_iters", "500", "--num_inducing", "100"],
        ),
        ("gibbs_spatial_exact_10split", spatial_gibbs.main, ["--max_iters", "5000"]),
        (
            "gibbs_spatial_sparse_10split",
            spatial_gibbs.main,
            ["--max_iters", "2000", "--inference", "sparse"],
        ),
        ("deepgp_spatial_10split", deepgp_spatial.main, ["--num_epochs", "400"]),
        ("spatiotemporal_dgp", spatiotemporal_dgp.main, ["--num_epochs", "200"]),
        ("sgpr_bench_100iter", sgpr_bench.main, ["--max_iters", "100"]),
        ("sgpr_bench_converged", sgpr_bench.main, ["--max_iters", "1000"]),
    ]
    for name, fn, argv in jobs:
        if only and not any(o in name for o in only):
            continue
        run(name, fn, argv)


if __name__ == "__main__":
    main()
