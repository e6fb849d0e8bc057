#!/usr/bin/env python3
"""Run all reference benchmark configs on the current backend and record
RMSE/NLPD to RESULTS.json — the parity evidence for BASELINE.md."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import jax

RESULTS = Path("RESULTS.json")

# Known-good bands from the round-1 full TPU runs (RESULTS.json, v5e).
# rmse_max = measured + ~15-20% headroom for seed/hardware variance; a
# benchmark exceeding its band is a quality REGRESSION and exits nonzero.
# NLPD bands are looser (it is the noisier metric on these splits).
EXPECTED_BANDS = {
    "seard_spatial_10split": {"rmse": 0.42, "nlpd": 0.55, "calm_s": 20},
    "temporal": {"rmse": 0.82, "nlpd": 1.35, "calm_s": 5},
    "spatio_temporal_stationary_exact": {"rmse": 2.25, "nlpd": 3.9, "calm_s": 15},
    "spatio_temporal_stationary": {"rmse": 2.55, "nlpd": 4.3, "calm_s": 15},
    "spatio_temporal_nonstationary": {"rmse": 2.45, "nlpd": 5.6, "calm_s": 25},
    "gibbs_spatial_exact_10split": {"rmse": 0.38, "nlpd": 1.45, "calm_s": 40},
    "gibbs_spatial_sparse_10split": {"rmse": 0.31, "nlpd": 0.15, "calm_s": 30},
    "deepgp_spatial_10split": {"rmse": 0.48, "nlpd": 0.70, "calm_s": 45},
    "spatiotemporal_dgp": {"rmse": 1.80, "nlpd": 2.40, "calm_s": 30},
    "sgpr_bench_100iter": {"rmse": 1.70, "nlpd": 2.10, "calm_s": 15},
    "sgpr_bench_converged": {"rmse": 1.70, "nlpd": 2.10, "calm_s": 60},
    # field drift vs the reference's shipped dgp2 artifact: RMSE between
    # the two predicted fields (mm/day) and 1 − pattern correlation.
    # Measured (v5e, 400 epochs, 2026-08-16): rmse 0.433, corr 0.9506
    # (our field's ground-truth corr 0.9732 vs the reference's own 0.9200)
    "dgp_field_regression": {"rmse": 0.60, "nlpd": 0.10, "calm_s": 45},
    # large-N matrix-free regime gate (VERDICT r3 #1): "rmse" = final mBCG
    # relative residual of the K^-1 y solve at the trained pose (converged
    # means <= 1e-2 at the shipped rank-150/auto-budget config), "nlpd" =
    # |loss_lazy - loss_dense|/|loss_dense| vs the exact dense-Cholesky
    # oracle at the same pose (8-probe SLQ noise bounds it, not rounding).
    "gibbs_largen_matrixfree_16384": {"rmse": 0.01, "nlpd": 0.05, "calm_s": 120},
}
# "calm_s" is the calm-session warm wallclock (2026-08-17 retune of the
# 2026-08-16 188-s suite).  The axon service's latency is pathologically
# variable (CLAUDE.md quirks: 8.8–881 s fresh compiles, execution crawl
# in bad windows) — a row exceeding PATHOLOGY_FACTOR × calm_s is flagged
# as service pathology (rerun it; metrics are unaffected), NOT failed.
PATHOLOGY_FACTOR = 4.0


def check_drift(data=None) -> list[str]:
    """Compare RESULTS.json against the known-good bands; return failures."""
    if data is None:
        data = json.loads(RESULTS.read_text()) if RESULTS.exists() else {}
    failures = []
    for name, band in EXPECTED_BANDS.items():
        entry = data.get(name)
        if not entry:
            continue
        if "error" in entry:
            failures.append(f"{name}: errored ({entry['error'][:120]})")
            continue
        for metric in ("rmse", "nlpd"):
            if entry.get(metric) is not None and entry[metric] > band[metric]:
                failures.append(
                    f"{name}: {metric} {entry[metric]:.4f} exceeds band {band[metric]}"
                )
    return failures


def record(name, rmse, nlpd, seconds):
    data = json.loads(RESULTS.read_text()) if RESULTS.exists() else {}
    entry = {
        "rmse": float(rmse),
        "nlpd": float(nlpd),
        "wallclock_s": round(seconds, 1),
        "backend": jax.default_backend(),
    }
    calm = EXPECTED_BANDS.get(name, {}).get("calm_s")
    note = ""
    if calm and seconds > PATHOLOGY_FACTOR * calm:
        entry["wallclock_note"] = (
            f"service pathology suspected: {seconds:.0f}s vs calm-session "
            f"~{calm}s (axon compile/execution latency is wildly variable, "
            f"CLAUDE.md quirks); rerun the row — metrics are unaffected"
        )
        note = "  [SLOW: service pathology suspected — rerun]"
    data[name] = entry
    RESULTS.write_text(json.dumps(data, indent=2))
    print(f"[{name}] RMSE={rmse:.4f} NLPD={nlpd:.4f} ({seconds:.0f}s){note}", flush=True)


def run(name, fn, argv):
    try:
        t0 = time.time()
        r, n = fn(argv)
        seconds = time.time() - t0
        # Self-heal the service-pathology roulette: a row whose wallclock
        # trips the flag is rerun ONCE in-process (every program is AOT-
        # pinned/compile-cached by now, so the retry measures pure
        # execution; metrics are deterministic and unaffected).  Measured
        # precedent: the seard row recovered 715 → 449 → 134 s across
        # consecutive runs of a recovering window.
        calm = EXPECTED_BANDS.get(name, {}).get("calm_s")
        if calm and seconds > PATHOLOGY_FACTOR * calm:
            print(
                f"[{name}] {seconds:.0f}s > {PATHOLOGY_FACTOR:.0f}x calm "
                f"~{calm}s — service pathology suspected, retrying once",
                flush=True,
            )
            # the retry must not be able to lose the first run's valid
            # metrics: if the service degrades into a full outage between
            # the runs, fall back to recording what we already measured
            try:
                t0 = time.time()
                r, n = fn(argv)
                seconds = min(seconds, time.time() - t0)
            except Exception as e:
                print(
                    f"[{name}] retry failed ({e!r}); keeping first run",
                    flush=True,
                )
        record(name, r, n, seconds)
    except Exception as e:  # keep going; record the failure
        data = json.loads(RESULTS.read_text()) if RESULTS.exists() else {}
        data[name] = {"error": repr(e)[:500]}
        RESULTS.write_text(json.dumps(data, indent=2))
        print(f"[{name}] FAILED: {e!r}", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--check":
        failures = check_drift()
        for f in failures:
            print(f"DRIFT: {f}")
        print("ok" if not failures else f"{len(failures)} band violations")
        sys.exit(1 if failures else 0)

    only = sys.argv[1:] if len(sys.argv) > 1 else None

    # benchmark-suite process config lives in main(), NOT at import:
    # tests import this module for check_drift, and import-time config
    # switches leaked into the rest of the test session (cache-dir mixing,
    # and the NSGP_AOT_DIR leak that let CPU tests write unreliable pins)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # Pin each benchmark's compiled fit executable to disk
    # (train/aot_cache.py): warm suite runs deserialize instead of calling
    # the axon compile service, whose latency is pathologically variable
    # (the seard row fresh-compiled in 8.8-881 s across processes).  Opt
    # out with NSGP_AOT_DIR="".  Set in main(), NOT at import — importing
    # this module (tests use check_drift) must not mutate the environment
    # (a leaked NSGP_AOT_DIR once let CPU tests write unreliable XLA:CPU
    # pins into exports/aot).
    os.environ.setdefault(
        "NSGP_AOT_DIR", str(Path(__file__).parent / "exports" / "aot")
    )

    # wait out transient backend outages (UNAVAILABLE init / hung init)
    # before any device use — see utils/backend.py
    from nonstationary_precip_tpu.utils.backend import wait_for_backend

    wait_for_backend()

    # absorb the per-process first-program service cost OUTSIDE any row's
    # timing: the first device program of a fresh process can pay an
    # arbitrary service warm-up (measured 100-700 s in bad windows while
    # later rows in the same process run at calm speed), which previously
    # landed on whichever row ran first (always seard)
    import jax.numpy as jnp
    import time as _time

    t0 = _time.time()
    jax.block_until_ready(
        jax.jit(lambda a: a @ a.T)(jnp.ones((128, 128), jnp.float32))
    )
    print(f"[warmup] first device program: {_time.time() - t0:.1f}s", flush=True)

    from nonstationary_precip_tpu.experiments import (
        deepgp_spatial,
        field_regression,
        gibbs_largen,
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
        # artifact-level drift vs the reference's SHIPPED dgp2 field:
        # "rmse" = mm/day RMSE between fields, "nlpd" = 1 − corr
        ("dgp_field_regression", field_regression.main, ["--num_epochs", "400"]),
        ("gibbs_largen_matrixfree_16384", gibbs_largen.main, ["--n", "16384"]),
    ]
    ran = []
    for name, fn, argv in jobs:
        if only and not any(o in name for o in only):
            continue
        run(name, fn, argv)
        ran.append(name)

    data = json.loads(RESULTS.read_text()) if RESULTS.exists() else {}
    failures = [f for f in check_drift(data) if f.split(":")[0] in ran]
    if failures:
        print("\nQUALITY DRIFT DETECTED:")
        for f in failures:
            print(f"  {f}")
        sys.exit(1)
    if ran:
        print(f"\nAll {len(ran)} benchmarks inside their quality bands.")


if __name__ == "__main__":
    main()
