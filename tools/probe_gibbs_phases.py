#!/usr/bin/env python3
"""Phase-stamped run of the gibbs_spatial_exact_10split benchmark row:
wraps the experiment's fit/eval/plot phases with wallclock stamps to
locate where the row's time goes (fit pin load+run, eval pin, the
vmapped gram_pre hoist, field prediction, plotting).

Run alone on the TPU, same env as run_benchmarks.py.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("NSGP_AOT_DIR", str(Path(__file__).resolve().parent.parent / "exports" / "aot"))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T0 = time.time()


def stamp(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax.numpy as jnp

    jax.block_until_ready(jax.jit(lambda a: a @ a.T)(jnp.ones((128, 128), jnp.float32)))
    stamp("warmup done")

    from nonstationary_precip_tpu.experiments import spatial_gibbs
    from nonstationary_precip_tpu.train import vmapped

    stamp("imports done")

    real_fit, real_eval = vmapped.fit_splits, vmapped.eval_splits

    def fit_stamped(*a, **k):
        stamp("fit_splits begin")
        r = real_fit(*a, **k)
        jax.block_until_ready(r.model)
        stamp("fit_splits end")
        return r

    def eval_stamped(*a, **k):
        stamp("eval_splits begin")
        r = real_eval(*a, **k)
        jax.block_until_ready(r)
        stamp("eval_splits end")
        return r

    vmapped.fit_splits = fit_stamped
    vmapped.eval_splits = eval_stamped
    spatial_gibbs.fit_splits = fit_stamped
    # spatial_gibbs imports eval_splits inside main(); patching the module
    # attribute in vmapped covers it via the late import
    real_field = spatial_gibbs.save_field_artifacts if hasattr(spatial_gibbs, "save_field_artifacts") else None

    spatial_gibbs.main(["--max_iters", "5000"])
    stamp("main done")


if __name__ == "__main__":
    main()
