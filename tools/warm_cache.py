#!/usr/bin/env python3
"""Warm the persistent XLA compilation cache for every benchmark program.

axon remote compiles take 3-20 minutes per new program; this script pays
them once so subsequent `python run_benchmarks.py` / `python bench.py`
runs are compile-free.  It simply executes the real benchmark configs
(scan lengths are part of a compiled program's identity, so a "tiny"
warm run would compile the WRONG programs — the experiments therefore
chunk their training scans to fixed lengths where possible, e.g.
spatial_gibbs chunk=500) and records cold→warm wall-clock per job in
tools/warm_times.json.

Run: make warm   (TPU; run alone)
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = Path(__file__).parent / "warm_times.json"


def main():
    jobs = [
        [sys.executable, "bench.py"],
        [sys.executable, "run_benchmarks.py"],
    ]
    times = {}
    for argv in jobs:
        name = " ".join(argv[1:])
        t0 = time.time()
        proc = subprocess.run(argv, cwd=ROOT)
        times[name] = {"seconds": round(time.time() - t0, 1), "rc": proc.returncode}
        OUT.write_text(json.dumps(times, indent=2))
        print(f"[warm] {name}: {times[name]}")


if __name__ == "__main__":
    main()
