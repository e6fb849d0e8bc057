"""Device-backend liveness probing.

The axon TPU backend intermittently resets: device init then either
raises UNAVAILABLE or hangs outright, for minutes at a time (measured
>1 h on 2026-08-17).  A benchmark or serving process that lands in such
a window should wait it out, not crash — and the probe must run in a
SUBPROCESS because jax caches a failed in-process backend init for the
life of the process.
"""

from __future__ import annotations

import subprocess
import sys
import time


def wait_for_backend(max_wait_s: float = 1800.0, probe_timeout_s: float = 120.0) -> None:
    """Block until `jax.devices()` succeeds in a fresh subprocess.

    Raises RuntimeError after ``max_wait_s`` with the last probe error.
    Returns immediately on healthy backends (one ~1-2 s subprocess).
    """
    t0 = time.time()
    while True:
        err = ""
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True,
                timeout=probe_timeout_s,
            )
            if probe.returncode == 0:
                return
            err = probe.stderr.decode(errors="replace")[-300:]
        except subprocess.TimeoutExpired:
            err = f"device init probe hung >{probe_timeout_s:.0f}s"
        if time.time() - t0 > max_wait_s:
            raise RuntimeError(
                f"device backend unavailable for {max_wait_s:.0f}s: {err}"
            )
        print(
            f"# backend unavailable ({time.time() - t0:.0f}s), retrying...",
            flush=True,
        )
        time.sleep(30.0)
