#!/usr/bin/env python3
"""Viability study for cross-step Cholesky warm-starting of the DSVI
K_zz precompute.

Idea: during training, K_zz(θ_t) changes by a small ΔK per Adam step, so
instead of refactoring from scratch (the 256-step sequential recurrence
that dominates the DSVI step at 0.38 of 0.88 ms), carry (L, L⁻¹) in the
training carry and refresh with MXU GEMMs:

    E   = L₀⁻¹ K₁ L₀⁻ᵀ − I                      (2 GEMMs)
    X₁  = Φ(E);  X₂ = Φ(E − X₁X₁ᵀ)              (fixed point of
                                                 X + Xᵀ + XXᵀ = E)
    L₁  = L₀ (I + X₂)                           (1 GEMM)
    L₁⁻¹ = (I − X₂ + X₂²) L₀⁻¹, Newton-refined  (3 GEMMs)

Convergence requires ρ = ‖E‖ ≲ 0.1; ‖E‖ ≈ cond(K)·‖ΔK‖/‖K‖, so high
condition numbers amplify a small parameter step.  This script trains
the EXACT bench.py configuration (Adam 1e-2, B=315, M=250, S=3) on CPU
and records, per step and per K_zz batch element:

  * rho      — ‖E‖₂ (spectral, via a few power iterations)
  * relerr   — ‖L̃L̃ᵀ − K₁‖_F / ‖K₁‖_F after the 2-iteration refinement
  * inverr   — ‖L̃⁻¹L̃ − I‖_F after inverse refinement
  * cond     — cond₂(K₁) estimate

Verdict criteria: warm-start is viable if relerr stays at the f32 noise
floor (≲1e-6) for the vast majority of steps, with full refactor needed
only rarely (the in-kernel pl.when fallback).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH, M, S, DIN = 315, 250, 3, 2
STEPS = 300


def tril_half(p):
    return jnp.tril(p) - 0.5 * jnp.diagonal(p, axis1=-2, axis2=-1)[..., None] * jnp.eye(
        p.shape[-1], dtype=p.dtype
    )


def refine(l0, li0, k1):
    """Warm-start refresh: (L₀, L₀⁻¹, K₁) → (L̃₁, L̃₁⁻¹) via GEMMs only."""
    eye = jnp.eye(k1.shape[-1], dtype=k1.dtype)
    e = li0 @ k1 @ jnp.swapaxes(li0, -1, -2) - eye
    x = tril_half(e)
    x = tril_half(e - x @ jnp.swapaxes(x, -1, -2))
    l1 = l0 @ (eye + x)
    li1 = (eye - x + x @ x) @ li0
    # one Newton refinement of the inverse: X ← X(2I − L X)
    li1 = li1 @ (2.0 * eye - l1 @ li1)
    return jnp.tril(l1), jnp.tril(li1)


def main():
    import optax

    from nonstationary_precip_tpu.models import DeepGP
    from nonstationary_precip_tpu.models.svgp import precompute_layers  # noqa: F401

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, DIN)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]), jnp.float32)
    key = jax.random.PRNGKey(173)
    model = DeepGP.create(key, input_dims=DIN, num_layers=2, num_inducing=M)
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(model)

    def gram_stack(m):
        uniq = list(m.layers) + [m.head]
        return jnp.concatenate([l.gram_zz() for l in uniq], axis=0)  # (T, M, M)

    @jax.jit
    def step(m, opt_state, k):
        k, sub = jax.random.split(k)
        loss, grads = jax.value_and_grad(
            lambda mm: mm.loss(sub, x, y, num_data=BATCH, num_samples=S)
        )(m)
        updates, opt_state = optimizer.update(grads, opt_state)
        m = optax.apply_updates(m, updates)
        return m, opt_state, k, loss

    gram_j = jax.jit(gram_stack)
    refine_j = jax.jit(refine)

    @jax.jit
    def metrics(l0, li0, k1):
        lt, lit = refine_j(l0, li0, k1)
        eye = jnp.eye(k1.shape[-1], dtype=k1.dtype)
        e = li0 @ k1 @ jnp.swapaxes(li0, -1, -2) - eye
        # spectral norm of e by 8 power iterations (symmetric)
        v = jnp.ones(e.shape[:-1] + (1,), e.dtype) / np.sqrt(e.shape[-1])
        for _ in range(8):
            v = e @ v
            v = v / (jnp.linalg.norm(v, axis=-2, keepdims=True) + 1e-30)
        rho = jnp.linalg.norm(e @ v, axis=(-2, -1))
        res = lt @ jnp.swapaxes(lt, -1, -2) - k1
        relerr = jnp.linalg.norm(res, axis=(-2, -1)) / jnp.linalg.norm(
            k1, axis=(-2, -1)
        )
        inverr = jnp.linalg.norm(lit @ lt - eye, axis=(-2, -1)) / np.sqrt(
            k1.shape[-1]
        )
        return rho, relerr, inverr, lt, lit

    # exact factors at init (L, L⁻¹ from jnp — stands in for the kernel)
    k0 = gram_j(model)
    l = jnp.linalg.cholesky(k0)
    eye_b = jnp.broadcast_to(jnp.eye(M, dtype=k0.dtype), k0.shape)
    li = jax.lax.linalg.triangular_solve(l, eye_b, left_side=True, lower=True)
    nan_at_init = bool(jnp.any(jnp.isnan(l)))
    print(f"init chol NaN: {nan_at_init}", flush=True)
    if nan_at_init:
        # escalate like safe_cholesky
        for j in (1e-4, 1e-2):
            l = jnp.linalg.cholesky(k0 + j * eye_b)
            if not bool(jnp.any(jnp.isnan(l))):
                print(f"init factored at jitter {j}", flush=True)
                break
        li = jax.lax.linalg.triangular_solve(l, eye_b, left_side=True, lower=True)

    rhos, relerrs, inverrs, conds = [], [], [], []
    refactors = 0
    for t in range(STEPS):
        model, opt_state, key, loss = step(model, opt_state, key)
        k1 = gram_j(model)
        rho, relerr, inverr, lt, lit = metrics(l, li, k1)
        rho_m = float(jnp.max(rho))
        rel_m = float(jnp.max(relerr))
        inv_m = float(jnp.max(inverr))
        rhos.append(rho_m)
        relerrs.append(rel_m)
        inverrs.append(inv_m)
        # warm-start acceptance: refreshed factor good to ~f32 noise?
        if not np.isfinite(rel_m) or rel_m > 3e-6 or inv_m > 1e-4:
            refactors += 1
            l = jnp.linalg.cholesky(k1)
            if bool(jnp.any(jnp.isnan(l))):
                l = jnp.linalg.cholesky(k1 + 1e-4 * eye_b)
            li = jax.lax.linalg.triangular_solve(
                l, eye_b, left_side=True, lower=True
            )
        else:
            l, li = lt, lit
        if t % 25 == 0:
            ev = jnp.linalg.eigvalsh(k1[0])
            conds.append(float(ev[-1] / jnp.maximum(ev[0], 1e-30)))
            print(
                f"step {t:4d} loss {float(loss):9.4f} rho {rho_m:9.2e} "
                f"relerr {rel_m:9.2e} inverr {inv_m:9.2e} "
                f"cond(K[0]) {conds[-1]:9.2e} refactors {refactors}",
                flush=True,
            )

    rhos_a = np.asarray(rhos)
    rel_a = np.asarray(relerrs)
    print("\n=== summary over", STEPS, "steps ===")
    for name, a in (("rho", rhos_a), ("relerr", rel_a), ("inverr", np.asarray(inverrs))):
        print(
            f"{name}: p50 {np.percentile(a, 50):.2e}  p90 {np.percentile(a, 90):.2e}"
            f"  p99 {np.percentile(a, 99):.2e}  max {a.max():.2e}"
        )
    print(f"refactors: {refactors}/{STEPS} ({100*refactors/STEPS:.1f}%)")


if __name__ == "__main__":
    main()
