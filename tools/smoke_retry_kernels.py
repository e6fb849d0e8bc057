#!/usr/bin/env python3
"""On-chip compile+run smoke test for the in-kernel-retry fused kernels
(ops/pallas_svgp.py, ops/pallas_fused.py) at the production shapes that
OOMed the scoped-VMEM budget when the retry was python-unrolled."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import nonstationary_precip_tpu.ops.pallas_fused as pf  # noqa: E402
import nonstationary_precip_tpu.ops.pallas_svgp as ps  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    # svgp precompute at the deepgp production shape (T=5, M=250, P=501).
    # z spread ×30 keeps K_zz well-conditioned so the retry-free reference
    # is finite and exactness is checkable.
    t, mm, d = 5, 250, 2
    z = jnp.asarray(30.0 * rng.normal(size=(t, mm, d)), jnp.float32)
    ell = jnp.asarray(np.exp(rng.normal(size=(t, d)) * 0.3) + 0.3, jnp.float32)
    s2 = jnp.asarray(np.exp(rng.normal(size=t) * 0.2), jnp.float32)
    packed = jnp.asarray(rng.normal(size=(t, mm, 2 * mm + 1)), jnp.float32)
    l, w, _ = jax.jit(ps.svgp_precompute_fused)(z, ell, s2, packed)
    l_r, w_r, _ = ps._reference(z, ell, s2, packed)
    err_l = float(jnp.max(jnp.abs(l - l_r)))
    err_w = float(jnp.max(jnp.abs(w - w_r)))
    ok_l = bool(jnp.all(jnp.isfinite(l))) and bool(jnp.all(jnp.isfinite(w)))
    print(f"svgp T={t} M={mm}: finite={ok_l} maxdiff L={err_l:.2e} W={err_w:.2e}",
          flush=True)

    # svgp retry path: tight z (the production regime whose plain f32
    # chol NaNs on chip) — the kernel must come back finite even when the
    # retry-free reference does not
    z_tight = jnp.asarray(rng.normal(size=(t, mm, d)), jnp.float32)
    l2, w2, _ = jax.jit(ps.svgp_precompute_fused)(z_tight, ell, s2, packed)
    lr2 = ps._reference(z_tight, ell, s2, packed)[0]
    ref_finite = bool(jnp.all(jnp.isfinite(lr2)))
    ok_l2 = bool(jnp.all(jnp.isfinite(l2))) and bool(jnp.all(jnp.isfinite(w2)))
    print(f"svgp retry path: kernel finite={ok_l2} (plain reference "
          f"finite={ref_finite})", flush=True)
    assert ok_l2

    # gibbs fused MAP-loss kernel at N=1024 (its dispatch window)
    n, d = 1024, 2
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    ellx = jnp.asarray(np.exp(rng.normal(size=(n, d)) * 0.3) + 0.2, jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    s2g = jnp.asarray(0.644, jnp.float32)
    noise = jnp.asarray(0.011, jnp.float32)
    chol, alpha = jax.jit(pf.gibbs_chol_solve_fused)(x, ellx, y, s2g, noise)
    chol_r, alpha_r = pf._reference(x, ellx, y, s2g, noise)
    errc = float(jnp.max(jnp.abs(chol - chol_r)))
    erra = float(jnp.max(jnp.abs(alpha - alpha_r)))
    okc = bool(jnp.all(jnp.isfinite(chol))) and bool(jnp.all(jnp.isfinite(alpha)))
    print(f"fused N={n}: finite={okc} maxdiff L={errc:.2e} alpha={erra:.2e}",
          flush=True)

    # on-chip retry: singular K (noise=0, duplicate rows) must come back
    # finite via the in-kernel escalation — interpret mode already passes;
    # this checks the REAL Mosaic lowering of the pl.when/fori_loop retry
    x_dup = np.array(x)
    x_dup[100] = x_dup[50]
    ell_dup = np.array(ellx)
    ell_dup[100] = ell_dup[50]
    chol2, alpha2 = jax.jit(pf.gibbs_chol_solve_fused)(
        jnp.asarray(x_dup), jnp.asarray(ell_dup), y, s2g, jnp.asarray(0.0, jnp.float32)
    )
    ok2 = bool(jnp.all(jnp.isfinite(chol2))) and bool(jnp.all(jnp.isfinite(alpha2)))
    print(f"fused retry path (singular K): finite={ok2}", flush=True)

    assert ok_l and okc and ok2
    assert err_l < 1e-2 and errc < 1e-3
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
