#!/usr/bin/env python3
"""VERDICT r4 #3: diagnose the r2048@1M Nyström preconditioner divergence
(tools/bench_cg.json chunked-lazygnys-r2048-i32x8-s10-1048576: relres
0.51, honestly marked converged=false, while r1024 converges at the same
N).

The landmark Gram W = K(m, m) depends on landmark DENSITY, not on N —
2048 landmarks in the same [-3, 3]² domain at the same lengthscale scale
reproduce the same W at any N — so the factor-side mechanism is
measurable on CPU:

  stage 1 (CPU, f32 vs f64): for rank ∈ {512, 1024, 2048, 4096} build W
  at the probe pose (log_ell = 0, the bench row's init), eigh in f32 and
  f64, and measure
    * the spectrum: λmax, #kept (λ > ridge·λmax), the mass near cutoff,
    * the f32 eigenpair error per kept direction:
      r_i = ‖W v_i − λ_i v_i‖ / λmax — a direction whose λ_i is BELOW
      its own f32 residual is numerically junk; its 1/√λ_i-amplified
      column injects O(r_i/λ_i)·λmax noise into P,
    * the resulting P-health proxy: λmin of ξᵀ(L̃ᵀL̃ + cI)ξ Rayleigh
      samples with the f32 factor vs the f64 oracle factor.

  stage 2 (--chip, TPU): at N = 262144 (steps are cheap there) run the
  chunked single-solve diagnostics (make_chunked_solve on K x = y) under
  r1024/r2048 with the shipped ridge and with the rank-aware ridge the
  stage-1 law suggests — the convergence flip is the confirmation.

Writes tools/probe_nystrom_capacity.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

OUT = Path(__file__).parent / "probe_nystrom_capacity.json"
results = json.loads(OUT.read_text()) if OUT.exists() else {}


def log(name, **kw):
    results[name] = kw
    print(name, json.dumps(kw), flush=True)
    OUT.write_text(json.dumps(results, indent=2))


def stage1():
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from tools.bench_cg import _gibbs_cross

    rng = np.random.default_rng(0)
    # the bench row's data distribution and init pose (probe_chunked.py)
    n_proxy = 1 << 20  # landmark INDEX space only; x rows drawn directly
    ridge = 1e-5
    for rank in (512, 1024, 2048, 4096):
        # landmarks = uniform subset of uniform points = uniform points
        xm = rng.uniform(-3, 3, size=(rank, 2)).astype(np.float32)
        aug = jnp.asarray(
            np.concatenate([xm, np.zeros((rank, 2), np.float32)], axis=1)
        )
        w32 = np.asarray(_gibbs_cross(None, aug, aug), np.float32)
        w64 = np.asarray(
            _gibbs_cross(None, aug.astype(jnp.float64),
                         aug.astype(jnp.float64))
        )
        lam32, v32 = np.linalg.eigh(w32)
        lam64, _ = np.linalg.eigh(w64)
        lmax = float(lam64[-1])
        cutoff = ridge * lmax
        kept32 = int((lam32 > ridge * lam32[-1]).sum())
        kept64 = int((lam64 > cutoff).sum())
        # f32 eigenpair residuals of the KEPT directions
        keep_idx = np.where(lam32 > ridge * lam32[-1])[0]
        wv = w64 @ v32[:, keep_idx].astype(np.float64)
        res = np.linalg.norm(
            wv - lam32[keep_idx][None, :] * v32[:, keep_idx], axis=0
        )
        lam_kept = lam32[keep_idx]
        # junk = kept directions whose eigenvalue is smaller than their
        # own f32 residual: 1/sqrt-amplifying them injects noise >> signal
        junk = int((lam_kept < res).sum())
        # noise amplification of the worst kept direction:
        # column noise ~ res_i / lam_i after the 1/sqrt(lam) scaling
        amp = res / np.maximum(lam_kept, 1e-30)
        log(
            f"stage1-rank{rank}",
            lam_max=round(lmax, 3),
            cutoff=float(cutoff),
            kept_f32=kept32,
            kept_f64=kept64,
            junk_kept_dirs=junk,
            eig_residual_max=float(res.max()),
            eig_residual_med=float(np.median(res)),
            amp_max=float(amp.max()),
            amp_p99=float(np.quantile(amp, 0.99)),
            lam_kept_min=float(lam_kept.min()),
            f32_noise_floor_est=float(np.finfo(np.float32).eps * lmax
                                      * np.sqrt(rank)),
            note="junk_kept_dirs = kept eigendirections with lam < their "
                 "own f32 residual; amp = residual/lam = relative noise "
                 "injected into P per direction after 1/sqrt(lam)",
        )


def stage2():
    from nonstationary_precip_tpu.utils.backend import wait_for_backend

    wait_for_backend()
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_bench_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from nonstationary_precip_tpu.ops.lazy_cg import (
        lazy_nystrom_factor,
        make_chunked_solve,
    )
    from nonstationary_precip_tpu.ops.pallas_matvec import (
        packed_gibbs_matvec_builder,
    )
    from tools.bench_cg import _gibbs_cross

    n = int(sys.argv[sys.argv.index("--chip") + 1]) if (
        "--chip" in sys.argv and len(sys.argv) > sys.argv.index("--chip") + 1
    ) else 262144
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    y = jnp.sin(2 * x[:, 0]) * jnp.cos(x[:, 1]) + 0.1 * jnp.asarray(
        rng.normal(size=n), jnp.float32
    )
    aug = jnp.concatenate([x, jnp.zeros((n, 2), jnp.float32)], axis=1)
    s2 = jnp.exp(jnp.asarray(-2.0, jnp.float32))
    pkey = jax.random.PRNGKey(17)
    solve = make_chunked_solve(
        2048, 4, 8, 1e-6, _gibbs_cross,
        packed_gibbs_matvec_builder(2), 10.0,
    )

    @jax.jit
    def eigh_quality(aug_full, idx):
        # the ON-CHIP eigh the factor build actually runs (TPU f32 path
        # is a different algorithm than CPU LAPACK — QDWH-based): measure
        # its kept-direction eigenpair residuals directly on chip
        x_lm = jnp.take(aug_full, idx, axis=0)
        w = _gibbs_cross(None, x_lm, x_lm)
        lam, v = jnp.linalg.eigh(w)
        cutoff = 1e-5 * lam[-1]
        kept = lam > cutoff
        res = jnp.linalg.norm(w @ v - lam[None, :] * v, axis=0)
        junk = jnp.sum(jnp.logical_and(kept, res > lam))
        amp = jnp.where(kept, res / jnp.maximum(lam, 1e-30), 0.0)
        return (lam[-1], jnp.sum(kept), junk, jnp.max(amp),
                jnp.max(jnp.where(kept, res, 0.0)))

    for rank in (1024, 2048):
        idx = jax.random.permutation(pkey, n)[:rank]
        lmax, kept, junk, amp_max, res_max = (
            float(t) for t in eigh_quality(aug, idx)
        )
        log(
            f"stage2-chip-eigh-n{n}-rank{rank}",
            lam_max=round(lmax, 3), kept=int(kept), junk=int(junk),
            amp_max=amp_max, res_max=res_max,
            note="on-chip f32 eigh quality of the landmark Gram at the "
                 "init pose — junk = kept dirs with residual > lam "
                 "(their 1/sqrt(lam) columns inject noise >> signal)",
        )
        for ridge in (1e-5, 3e-4):
            t0 = time.time()
            lpc = jax.lax.stop_gradient(
                lazy_nystrom_factor(
                    None, aug, rank, _gibbs_cross, key=pkey, ridge=ridge
                )
            )
            lpc = jax.block_until_ready(lpc)
            _, rr = solve(None, aug, y[:, None], s2, lpc)
            rr = float(rr[0])
            log(
                f"stage2-n{n}-rank{rank}-ridge{ridge:g}",
                relres=rr,
                converged=rr <= 1e-2,
                wall_s=round(time.time() - t0, 1),
                budget="4x8 chunked, shift 10",
            )


if __name__ == "__main__":
    if "--chip" in sys.argv:
        stage2()
    else:
        stage1()
