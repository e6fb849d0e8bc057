#!/usr/bin/env python3
"""Host-chunked large-N training probe (DESIGN.md 27-28): drive
make_chunked_mll eagerly so no single device program outlives the axon
worker's ~60-90 s execution wall.  Usage:
  python tools/probe_chunked.py <n> <chunk_iters> <n_chunks> [steps] [rank] [runs] [heldout]
One JSON line per step to stdout; a summary row (r5: "runs" structure —
the same hardening shape as the monolithic large-N rows — plus
heldout_rmse model-quality evidence when heldout > 0) into
tools/bench_cg.json under chunked-lazygnys-r<rank>-i<ci*nc>x<nc>-s10-<n>."""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import optax

from nonstationary_precip_tpu.ops.lazy_cg import (
    lazy_posterior_state_chunked,
    make_chunked_mll,
)
from nonstationary_precip_tpu.ops.pallas_matvec import (
    packed_gibbs_matvec_builder,
    packed_gibbs_panel_vjp,
    packed_gibbs_panel_vjp_rows,
)
from tools.bench_cg import _gibbs_cross, log as benchlog
from nonstationary_precip_tpu.utils.backend import wait_for_backend


def _true_fn(x):
    return jnp.sin(2 * x[:, 0]) * jnp.cos(x[:, 1])


def _nn_field(x_train, log_ell, x_test, chunk=256):
    """Nearest-neighbour transfer of the trained per-point log-lengthscale
    field to test points (the raw-MLL probe model has no prior to
    condition with; the field is smooth, NN is the honest local read).
    Chunked so the (chunk, N) distance block stays ~1 GB at N = 1M."""
    nt = x_test.shape[0]
    pad = (-nt) % chunk
    xt = jnp.concatenate(
        [x_test, jnp.zeros((pad, x_test.shape[1]), x_test.dtype)]
    )

    @jax.jit
    def one(xb):
        # |a-b|^2 via the matmul expansion: the (chunk, N) block is the
        # ONLY O(chunk*N) tensor (the broadcast-difference form would
        # materialise (chunk, N, d) — 4.3 GB at N = 2M)
        d2 = (
            jnp.sum(xb * xb, axis=1)[:, None]
            + jnp.sum(x_train * x_train, axis=1)[None, :]
            - 2.0 * (xb @ x_train.T)
        )
        return log_ell[jnp.argmin(d2, axis=1)]

    outs = [one(xt[i:i + chunk]) for i in range(0, xt.shape[0], chunk)]
    return jnp.concatenate(outs)[:nt]


def _heldout_rmse(x, params, y, n, ci, nc, rank, nt):
    """Model-quality evidence (VERDICT r4 #2): train-field NN transfer +
    host-chunked posterior state (alpha solve under the wall) + mean-only
    queries in 256-point chunks -> RMSE vs the known generating fn.

    Shift LADDER on the alpha solve: training shrinks sigma^2, so the
    Woodbury ridge c = shift*sigma^2 loses f32 stability margin exactly
    at the trained pose (DESIGN 22's mechanism; measured diverging at
    shift 10 / N = 1M, relres 3.9) — retry at higher shifts and record
    which converged."""
    rng = np.random.default_rng(100)
    xt = jnp.asarray(rng.uniform(-3, 3, size=(nt, 2)), jnp.float32)
    truth = _true_fn(xt)
    aug = jnp.concatenate([x, params["log_ell_pp"]], axis=1)
    t0 = time.time()
    state, alpha_rr, shift_used = None, float("inf"), None
    for shift in (10.0, 100.0, 1000.0):
        st = lazy_posterior_state_chunked(
            None, aug, y, jnp.exp(params["log_noise"]),
            block=2048, chunk_iters=ci, n_chunks=2 * nc, tol=1e-6,
            precond_rank=rank, precond="nystrom",
            precond_key=jax.random.PRNGKey(17), precond_shift=shift,
            cross_fn=_gibbs_cross,
            matvec_builder=packed_gibbs_matvec_builder(2),
        )
        rr = float(st.alpha_relres)
        print(json.dumps({"alpha_solve_shift": shift, "relres": rr}),
              flush=True)
        if rr < alpha_rr:
            state, alpha_rr, shift_used = st, rr, shift
        if rr <= 1e-2:
            break
    le_t = _nn_field(x, params["log_ell_pp"], xt)
    aug_t = jnp.concatenate([xt, le_t], axis=1)

    @jax.jit
    def mean_chunk(st_x, st_alpha, at):
        return _gibbs_cross(None, st_x, at).T @ st_alpha

    means = []
    q = 256
    padq = (-nt) % q
    atp = jnp.concatenate([aug_t, jnp.zeros((padq, aug_t.shape[1]), jnp.float32)])
    for i in range(0, atp.shape[0], q):
        means.append(mean_chunk(state.x, state.alpha, atp[i:i + q]))
    mean = jnp.concatenate(means)[:nt]
    rmse = float(jnp.sqrt(jnp.mean((mean - truth) ** 2)))
    base = float(jnp.sqrt(jnp.mean(truth ** 2)))  # predict-zero baseline
    dt = time.time() - t0
    print(json.dumps({"heldout_rmse": rmse, "baseline_rmse": base,
                      "alpha_relres": alpha_rr, "shift_used": shift_used,
                      "nt": nt, "eval_s": round(dt, 1)}), flush=True)
    return rmse, base, alpha_rr, shift_used


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    ci = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nc = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    rank = int(sys.argv[5]) if len(sys.argv) > 5 else 1024
    runs = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    heldout = int(sys.argv[7]) if len(sys.argv) > 7 else 0
    # row-chunked backward (the panel sweep crosses the execution wall
    # around N ~ 1.5M as one program; DESIGN §27)
    bwd_chunks = int(sys.argv[8]) if len(sys.argv) > 8 else 1
    # Woodbury ridge shift c = shift*sigma^2 (DESIGN 22/30): the f32
    # margin collapses with N — 2M at shift 10 diverged (relres 14.7)
    shift = float(sys.argv[9]) if len(sys.argv) > 9 else 10.0
    wait_for_backend()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 2)), jnp.float32)
    y = _true_fn(x) + 0.1 * jnp.asarray(rng.normal(size=n), jnp.float32)
    opt = optax.adam(1e-2)
    m = make_chunked_mll(
        block=2048, num_probes=8, chunk_iters=ci, n_chunks=nc, tol=1e-6,
        precond_rank=rank, precond="nystrom", precond_shift=shift,
        cross_fn=_gibbs_cross,
        matvec_builder=packed_gibbs_matvec_builder(2),
        panel_vjp=packed_gibbs_panel_vjp(2),
        panel_vjp_rows=(
            packed_gibbs_panel_vjp_rows(2) if bwd_chunks > 1 else None
        ),
        bwd_row_chunks=bwd_chunks,
    )

    @jax.jit
    def apply(params, opt_state, xg, s2g):
        g = {"log_ell_pp": -xg[:, 2:] / n,
             "log_noise": -s2g * jnp.exp(params["log_noise"]) / n}
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, up), opt_state

    key = jax.random.PRNGKey(5)
    pkey = jax.random.PRNGKey(17)
    run_rows, params = [], None
    for r in range(runs):
        params = {"log_ell_pp": jnp.zeros((n, 2), jnp.float32),
                  "log_noise": jnp.asarray(-2.0, jnp.float32)}
        opt_state = opt.init(params)
        losses, times, relres_last = [], [], None
        for i in range(steps):
            t0 = time.time()
            aug = jnp.concatenate([x, params["log_ell_pp"]], axis=1)
            val, relres, (kg, xg, rg, s2g) = m.value_and_grad(
                None, aug, y, jnp.exp(params["log_noise"]), key, pkey)
            params, opt_state = apply(params, opt_state, xg, s2g)
            loss = -float(val) / n
            relres_last = float(jnp.max(relres))
            dt = time.time() - t0
            losses.append(loss); times.append(dt)
            print(json.dumps({"run": r, "step": i, "loss": loss,
                              "s": round(dt, 1),
                              "relres_max": relres_last}), flush=True)
            if n >= (1 << 21):
                # sixth-octave steps are ~22+ min each: checkpoint the
                # partial row per STEP so a wall-clock cutoff or service
                # stall still leaves numbers behind
                _write_row(n, ci, nc, rank, bwd_chunks, run_rows + [{
                    "s_steps": [round(t, 1) for t in times],
                    "s_median": round(times[-1], 1),
                    "loss0": losses[0], "lossT": losses[-1],
                    "relres_max_final": relres_last,
                    "partial_steps": i + 1,
                }], {}, shift)
        run_rows.append({
            "s_steps": [round(t, 1) for t in times],
            "s_median": round(sorted(times[1:])[len(times[1:]) // 2], 1)
            if len(times) > 1 else round(times[0], 1),
            "loss0": losses[0], "lossT": losses[-1],
            "relres_max_final": relres_last,
        })
        # checkpoint the row after EVERY completed run — an axon
        # service stall mid-run must not destroy finished evidence
        # (measured 2026-08-20: a run-1 stall ate 46 min and the whole
        # in-process row)
        _write_row(n, ci, nc, rank, bwd_chunks, run_rows, {}, shift)
    hr = {}
    if heldout:
        np.savez(f"/tmp/probe_chunked_params_{n}.npz",
                 log_ell_pp=np.asarray(params["log_ell_pp"]),
                 log_noise=np.asarray(params["log_noise"]))
        rmse, base, arr, shift_used = _heldout_rmse(
            x, params, y, n, ci, nc, rank, heldout
        )
        hr = {"heldout_rmse": rmse, "heldout_baseline_rmse": base,
              "heldout_n": heldout, "state_alpha_relres": arr,
              "state_alpha_shift": shift_used,
              "heldout_note": "RMSE vs the known generating function at "
              "fresh points (mean-only amortized state, NN lengthscale "
              "transfer) vs the predict-zero baseline — 'trains' means "
              "'learns', VERDICT r4 #2"}
    _write_row(n, ci, nc, rank, bwd_chunks, run_rows, hr, shift)


def _write_row(n, ci, nc, rank, bwd_chunks, run_rows, hr, shift=10.0):
    med = sorted(rr["s_median"] for rr in run_rows)[len(run_rows) // 2]
    worst_rr = max(rr["relres_max_final"] for rr in run_rows)
    bwd_tag = f"-bwd{bwd_chunks}" if bwd_chunks > 1 else ""
    shift_tag = f"-sh{int(shift)}" if shift != 10.0 else ""
    benchlog(f"chunked-lazygnys-r{rank}-i{ci*nc}x{nc}{bwd_tag}{shift_tag}-s10-{n}",
             method="host-chunked-eager",
             s_per_step_median=med,
             runs=run_rows,
             relres_max_final=worst_rr,
             converged=worst_rr <= 1e-2,
             chunk_iters=ci, n_chunks=nc,
             **hr,
             note="eager host-chunked driver (make_chunked_mll): per-step "
                  "wall includes all phase dispatches; no device program "
                  "exceeds the ~60-90 s execution wall (DESIGN.md 27)")


if __name__ == "__main__":
    main()
