#!/usr/bin/env python3
"""Headline benchmark: DSVI ELBO training steps/sec (2-layer deep GP).

BASELINE.json north star: ≥10x DSVI ELBO steps/sec over the CPU reference
on one TPU v5e chip.  The reference stack (GPyTorch) is not installed in
this image, so the baseline is an eager PyTorch-CPU implementation of the
*same* DSVI step (identical math and shapes: whitened SVGP layers, M=250,
B=315, S=3, closed-form expected log-likelihood, Adam) — a baseline that
flatters the reference, since eager GPyTorch adds module/lazy-tensor
overhead on top of the same torch ops.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BATCH = 315
NUM_INDUCING = 250
NUM_SAMPLES = 3
INPUT_DIM = 2
HIDDEN = 2
WARMUP = 3
STEPS = 100
TORCH_STEPS = 10


def make_data(n=BATCH, d=INPUT_DIM, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.5 * np.cos(2 * x[:, 1])).astype(np.float32)
    return x, y


def bench_jax() -> float:
    """Measure the framework's actual training path: STEPS Adam updates as
    one scan-compiled device program (train/optim.py style) — no per-step
    host dispatches."""
    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from nonstationary_precip_tpu.models import DeepGP

    x_np, y_np = make_data()
    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)

    key = jax.random.PRNGKey(173)
    model = DeepGP.create(key, input_dims=INPUT_DIM, num_layers=2, num_inducing=NUM_INDUCING)
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(model)

    def make_chunk(length):
        @jax.jit
        def train_chunk(model, opt_state, key):
            def step(carry, _):
                m, s, k = carry
                k, sub = jax.random.split(k)
                loss, grads = jax.value_and_grad(
                    lambda mm: mm.loss(sub, x, y, num_data=BATCH, num_samples=NUM_SAMPLES)
                )(m)
                updates, s = optimizer.update(grads, s, m)
                m = optax.apply_updates(m, updates)
                return (m, s, k), loss

            (model, opt_state, key), losses = jax.lax.scan(
                step, (model, opt_state, key), None, length=length
            )
            return model, opt_state, key, losses

        return train_chunk

    # differential timing — programs of STEPS and 2×STEPS, report
    # (T₂ − T₁)/STEPS: cancels the ~28 ms per-program axon-tunnel dispatch,
    # which real training amortises over ≥500-step chunks anyway.  The axon
    # service has pathological windows where EXECUTION of an already-compiled
    # program crawls 10–40× (CLAUDE.md quirks); slowness only ever inflates a
    # single program's wallclock, so take the min over 9 interleaved samples
    # PER PROGRAM and difference those calm estimates.  (Never min() over the
    # differences themselves — a slow window hitting only the short program
    # deflates a difference, even below zero.)  Fall back to medians if the
    # whole session is so unstable the calm estimates still cross.
    c1, c2 = make_chunk(STEPS), make_chunk(2 * STEPS)
    jax.block_until_ready(c1(model, opt_state, key)[3])
    jax.block_until_ready(c2(model, opt_state, key)[3])

    def sample(chunk):
        t0 = time.perf_counter()
        out = chunk(model, opt_state, key)
        jax.block_until_ready(out[3])
        return time.perf_counter() - t0

    t1s, t2s = [], []
    for _ in range(9):
        t1s.append(sample(c1))
        t2s.append(sample(c2))
    per_step = (min(t2s) - min(t1s)) / STEPS
    if per_step <= 0:
        per_step = (sorted(t2s)[4] - sorted(t1s)[4]) / STEPS
    if per_step <= 0:
        # both calm and median estimates crossed — the session is too
        # unstable for differential timing to mean anything.  Report the
        # amortised long-program rate (dispatch included, so a strict
        # LOWER bound on steps/s) instead of a negative/inf headline.
        import sys

        per_step = min(t2s) / (2 * STEPS)
        print(
            "bench: differential estimates crossed (pathological service "
            "window) — reporting amortised lower bound; rerun in a calm "
            "session",
            file=sys.stderr,
            flush=True,
        )
    return 1.0 / per_step


def bench_torch_cpu() -> float:
    """Eager PyTorch-CPU DSVI step with identical math/shapes."""
    import torch

    torch.manual_seed(173)
    x_np, y_np = make_data()
    x = torch.tensor(x_np)
    y = torch.tensor(y_np)

    class Layer(torch.nn.Module):
        def __init__(self, din, dout, m=NUM_INDUCING):
            super().__init__()
            self.z = torch.nn.Parameter(torch.randn(dout, m, din))
            self.var_mean = torch.nn.Parameter(torch.zeros(dout, m))
            self.var_chol = torch.nn.Parameter(torch.eye(m).expand(dout, m, m).clone())
            self.raw_out = torch.nn.Parameter(torch.zeros(dout))
            self.raw_ell = torch.nn.Parameter(torch.zeros(dout, din))
            self.mean_w = torch.nn.Parameter(torch.zeros(din, dout))
            self.mean_b = torch.nn.Parameter(torch.zeros(dout))
            self.m = m

        def marginals(self, h):
            ell = torch.nn.functional.softplus(self.raw_ell)
            s2 = torch.nn.functional.softplus(self.raw_out)
            means, variances = [], []
            for o in range(self.z.shape[0]):
                xs = h / ell[o]
                zs = self.z[o] / ell[o]
                d_xz = (xs**2).sum(-1)[:, None] + (zs**2).sum(-1)[None, :] - 2 * xs @ zs.T
                k_xz = s2[o] * torch.exp(-0.5 * d_xz.clamp_min(0))
                d_zz = (zs**2).sum(-1)[:, None] + (zs**2).sum(-1)[None, :] - 2 * zs @ zs.T
                k_zz = s2[o] * torch.exp(-0.5 * d_zz.clamp_min(0)) + 1e-5 * torch.eye(self.m)
                l_zz = torch.linalg.cholesky(k_zz)
                a = torch.linalg.solve_triangular(l_zz, k_xz.T, upper=False).T
                s_tril = torch.tril(self.var_chol[o])
                mean = a @ self.var_mean[o] + h @ self.mean_w[:, o] + self.mean_b[o]
                a_s = a @ s_tril
                var = (s2[o] - (a**2).sum(-1) + (a_s**2).sum(-1)).clamp_min(1e-10)
                means.append(mean)
                variances.append(var)
            return torch.stack(means), torch.stack(variances)

        def kl(self):
            s = torch.tril(self.var_chol)
            diag = torch.diagonal(s, dim1=-2, dim2=-1)
            return 0.5 * (
                (self.var_mean**2).sum() + (s**2).sum() - s.numel() / s.shape[0]
                - 2 * torch.log(diag.abs() + 1e-20).sum()
            )

    class DGP(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = Layer(INPUT_DIM, HIDDEN)
            self.l2 = Layer(HIDDEN, HIDDEN)
            self.head = Layer(HIDDEN, 1)
            self.raw_noise = torch.nn.Parameter(torch.zeros(()))

        def loss(self, x, y):
            noise = torch.nn.functional.softplus(self.raw_noise) + 1e-4
            ells = []
            for _ in range(NUM_SAMPLES):
                h = x
                for layer in (self.l1, self.l2):
                    mean, var = layer.marginals(h)
                    h = (mean + var.sqrt() * torch.randn_like(mean)).T
                mean, var = self.head.marginals(h)
                ell = -0.5 * (
                    torch.log(2 * torch.pi * noise) + ((y - mean[0]) ** 2 + var[0]) / noise
                )
                ells.append(ell.mean())
            data_term = torch.stack(ells).mean()
            kl = self.l1.kl() + self.l2.kl() + self.head.kl()
            return -(data_term - kl / BATCH)

    model = DGP()
    opt = torch.optim.Adam(model.parameters(), lr=0.01)
    # warmup
    for _ in range(2):
        opt.zero_grad()
        loss = model.loss(x, y)
        loss.backward()
        opt.step()

    # best-of-3 (most favourable to the baseline) to keep the reported
    # speedup conservative under host-load noise
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(TORCH_STEPS):
            opt.zero_grad()
            loss = model.loss(x, y)
            loss.backward()
            opt.step()
        rates.append(TORCH_STEPS / (time.perf_counter() - t0))
    return max(rates)


# Pinned torch-CPU eager denominator: the MEDIAN of the three rounds'
# live measurements on this 1-core host (6.14 / 7.03 / 9.66 steps/s —
# BENCH_r0{1,2,3}.json).  Re-measuring the baseline live every run made
# the headline ratio swing 106x -> 280x -> 205x from pure host-load
# noise while the JAX numerator barely moved; the ratio is only
# meaningful against a fixed denominator.  `--live-baseline` re-measures
# (and prints both) for auditing the pin.
PINNED_TORCH_STEPS_PER_SEC = 7.03


def main():
    import sys

    from nonstationary_precip_tpu.utils.backend import wait_for_backend

    wait_for_backend()
    jax_sps = bench_jax()
    out = {
        "metric": "dsvi_elbo_steps_per_sec",
        "value": round(jax_sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(jax_sps / PINNED_TORCH_STEPS_PER_SEC, 3),
        "baseline_steps_per_sec": PINNED_TORCH_STEPS_PER_SEC,
        "baseline_method": "pinned median of 3 live torch-CPU rounds",
    }
    if "--live-baseline" in sys.argv:
        torch_sps = bench_torch_cpu()
        out["live_torch_steps_per_sec"] = round(torch_sps, 3)
        out["vs_live_baseline"] = round(jax_sps / torch_sps, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
