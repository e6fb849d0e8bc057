"""Batch-inference CLI — the deployment/serving half of the production
workflow whose training half is ``experiments/precipitation_baselines.py``.

The reference stops at training + in-process evaluation (its checkpoints
are write-only, /root/reference/experiments/precipitation_baselines.py:380-397);
this module closes the loop: fit (or restore a fitted checkpoint of) any
of the model families in ``MODELS``, then predict mean/σ at arbitrary
query points and write them as a CSV in raw data units.  A checkpoint
restores into a model built from the SAME --model/--train_csv/--x_cols
flags (parameter shapes are data-dependent for the exact Gibbs family).  Everything
device-side runs as ONE jitted program per phase (fit scan + predict), so
a warm serve pays two dispatches, not thousands of eager ops.

    # fit on the bundled UIB data and predict at its own sites
    python -m nonstationary_precip_tpu.serve --model gibbs_exact \
        --output preds.csv

    # fit once, save, then serve repeatedly from the checkpoint
    python -m nonstationary_precip_tpu.serve --model seard \
        --save_checkpoint ckpt/seard --output /dev/null
    python -m nonstationary_precip_tpu.serve --model seard \
        --checkpoint ckpt/seard --points_csv new_sites.csv --output preds.csv

``--points_csv`` wants a headered CSV (like the bundled datasets) whose
first columns are the input coordinates (lon, lat for the spatial
models; time, lon, lat for the spatio-temporal ones); with no
``--points_csv`` the training sites themselves are served (a full-field
hindcast, the reference's spatial_exp.py:243-253 usage).

``--x_cols``/``--y_col`` select training columns when the CSV isn't in
the default (inputs..., target) layout, e.g. the bundled spatio-temporal
cube carries a row index first:

    python -m nonstationary_precip_tpu.serve --model st_nonstationary \
        --train_csv data/uib_spatio_temporal.csv --x_cols 1,2,3 --y_col 4

Large training CSVs (``--model gibbs_exact`` only): ``--matrixfree true``
routes BOTH fit and predict through the matrix-free CG path
(``GibbsExactGP.loss_matrixfree`` / ``posterior_matrixfree``) — no N×N
Gram ever materialises, the regime measured end-to-end to N = 131072 on
one chip (DESIGN.md §16–22).  ``--precond_rank`` / ``--precond_shift``
tune the Woodbury preconditioner for very large / ill-conditioned N.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from nonstationary_precip_tpu.train.config import ExperimentConfig
from nonstationary_precip_tpu.utils.config import DATASET_DIR

MODELS = (
    "seard",
    "gibbs_exact",
    "gibbs_sparse",
    "mv_gibbs",
    "mv_gibbs_sparse",
    "deepgp",
    "st_stationary",
    "st_nonstationary",
)


@dataclass
class ServeConfig(ExperimentConfig):
    train_csv: str = str(DATASET_DIR / "uib_spatial.csv")
    points_csv: str = ""  # default: serve the training sites
    output: str = "predictions.csv"
    checkpoint: str = ""  # restore fitted params instead of fitting
    save_checkpoint: str = ""  # save fitted params after fitting
    # column selection, e.g. the spatio-temporal cube's first column is a
    # row index: --x_cols 1,2,3 --y_col 4.  Defaults: all-but-last / last.
    x_cols: str = ""
    y_col: int = -1
    # large-N serving (gibbs_exact only): --matrixfree true routes fit AND
    # predict through the matrix-free CG path (loss_matrixfree /
    # posterior_matrixfree, DESIGN §16–22) — no N×N residency anywhere, so
    # a 10⁵-row training CSV serves on one chip where the dense Gram
    # cannot exist.  --precond_rank tunes the Woodbury preconditioner
    # factor (150 converges at every probed N ≤ 65536; raise + use
    # --precond_shift > 1 beyond that, DESIGN §22).
    matrixfree: bool = False
    precond_rank: int = 150
    precond_shift: float = 1.0
    # past-the-execution-wall serving (gibbs_exact + --matrixfree only):
    # --chunked true drives fit AND predict through the host-chunked
    # phases (models.gibbs_gp.make_chunked_map_loss / fit_chunked,
    # DESIGN §27-28) — REQUIRED for N ≥ ~512k on axon, where any single
    # device program holding the full CG budget crashes the worker; valid
    # (same estimator) at any N.  --chunk_iters sizes one device program
    # (≈ chunk_iters O(N²) matvecs — keep it under the ~60-90 s wall at
    # your N); chunk_iters × n_chunks is the total mBCG budget.  The
    # flagship 1M config: --chunked true --precond_rank 1024
    # --precond nystrom --precond_shift 10
    chunked: bool = False
    chunk_iters: int = 8
    n_chunks: int = 4
    # past ~1.5M rows even ONE backward panel sweep crosses the execution
    # wall: split it into this many host-driven row-block programs
    bwd_row_chunks: int = 1
    # preconditioner factor rule: pivchol | nystrom | "" = auto (pivchol
    # up to rank 200, nystrom above — the measured crossover, DESIGN §20-21)
    precond: str = ""


def _lazy_block(n: int, cap: int = 2048) -> int:
    """Largest divisor of n that is ≤ cap — the lazy CG row panels must
    tile N exactly (ops/lazy_cg.check_divisible).  Awkward (prime-ish) N
    degrade to small panels: still correct, just more scan steps."""
    b = min(n, cap)
    while n % b:
        b -= 1
    return b


def _build(name: str, train_x, train_y, cfg: ServeConfig, key):
    """Create an unfitted model for ``fit``.

    Returns ``(model, loss_fn, mask, extra_args)`` where ``extra_args``
    are hoisted loop-invariant tensors passed to ``fit`` after
    ``(train_x, train_y)`` (the frozen-prior Gram algebra for the exact
    Gibbs family — its mask always freezes ``prior/``, so the D N×N
    factorizations are loop-invariant and must not re-run inside the
    training scan)."""
    import math

    from nonstationary_precip_tpu.kernels import RBF, Scale
    from nonstationary_precip_tpu.models import (
        DeepGP,
        ExactGP,
        GibbsExactGP,
        GibbsSparseGP,
    )
    from nonstationary_precip_tpu.ops.kmeans import kmeans_inducing_points
    from nonstationary_precip_tpu.priors import LogNormalProcess

    if cfg.matrixfree and name != "gibbs_exact":
        raise SystemExit(
            "--matrixfree is implemented for --model gibbs_exact (the "
            "other families are sparse/minibatched — already large-N)"
        )
    d = train_x.shape[-1]
    if name == "seard":
        model = ExactGP.create(Scale.create(RBF.create(d)), mean_type="constant")
        return model, (lambda m, xx, yy: m.loss(xx, yy)), None, ()
    if name in ("mv_gibbs", "mv_gibbs_sparse"):
        from nonstationary_precip_tpu.models import (
            MultivariateGibbsGP,
            SparseMultivariateGibbsGP,
        )

        if d != 2:
            raise SystemExit("the multivariate Gibbs kernel is 2-D only")
        if name == "mv_gibbs":
            model = MultivariateGibbsGP.create(key, train_x, noise=cfg.noise)
        else:
            z = kmeans_inducing_points(key, train_x, cfg.num_inducing)
            model = SparseMultivariateGibbsGP.create(key, z, noise=cfg.noise)
        # h_prior hypers and the anchor sites are frozen by design
        return model, (lambda m, xx, yy: m.loss(xx, yy)), model.trainable(), ()
    # latent lengthscale prior: over all d input dims for the spatial Gibbs
    # models, over the 2 spatial dims for the ST sum-kernel model (its
    # Gibbs term is spatial-only, spatio_temporal_exp.py:111-121)
    prior = LogNormalProcess.create(
        input_dim=2 if name == "st_nonstationary" else d,
        mean=math.log(cfg.prior_mean),
        outputscale=cfg.prior_scale,
        lengthscale=cfg.prior_ell,
    )
    if name == "gibbs_exact":
        import jax

        model = GibbsExactGP.create(train_x, prior, noise=cfg.noise, outputscale=cfg.scale)
        if cfg.matrixfree:
            # large-N route: the frozen-prior hoist is per-dim pivoted
            # Cholesky factors + an SLQ logdet constant (O(N·rank)), and
            # the per-step loss is preconditioned mBCG over the fused
            # Gram·v matvec — the N×N Gram never exists on either side
            n = train_x.shape[0]
            blk = _lazy_block(n)
            rank = min(cfg.precond_rank, n)
            pre = jax.jit(
                lambda xx: prior.gram_pre_lazy(
                    xx, jax.random.PRNGKey(cfg.seed + 1),
                    rank=min(50, n), block=blk,
                )
            )(train_x)
            # fixed probe key across steps = common random numbers, the
            # same convention as every measured large-N row (bench_cg)
            kfix = jax.random.PRNGKey(cfg.seed + 2)
            # the fused Gram·v Pallas kernels are Mosaic (TPU) programs;
            # CPU serves fall back to the jnp row panels automatically
            fused = jax.default_backend() != "cpu"
            precond = cfg.precond or ("nystrom" if rank > 200 else "pivchol")
            if cfg.chunked:
                # the host-chunked product path (DESIGN §27-28): the
                # SAME MAP estimand, driven as per-chunk device programs
                from nonstationary_precip_tpu.models.gibbs_gp import (
                    make_chunked_map_loss,
                )

                loss_obj = make_chunked_map_loss(
                    d, block=blk, num_probes=8,
                    chunk_iters=cfg.chunk_iters, n_chunks=cfg.n_chunks,
                    tol=1e-6, precond_rank=rank, precond=precond,
                    precond_shift=cfg.precond_shift,
                    include_prior=True, fused_matvec=fused,
                    bwd_row_chunks=cfg.bwd_row_chunks if fused else 1,
                )
                return model, loss_obj, model.trainable(), (pre,)
            return (
                model,
                (
                    lambda m, xx, yy, pc: m.loss_matrixfree(
                        xx, yy, kfix, pc, block=blk,
                        precond_rank=rank, precond=precond,
                        precond_shift=cfg.precond_shift,
                        fused_matvec=fused,
                    )
                ),
                model.trainable(),
                (pre,),
            )
        # frozen-prior (K⁻¹, logdet) hoist, one jitted program — the same
        # loop-invariant the reference experiments exploit implicitly by
        # never re-sampling the prior (experiments/spatial_gibbs.py)
        pre = jax.jit(prior.gram_pre)(train_x)
        return (
            model,
            (lambda m, xx, yy, pc: m.loss(xx, yy, pc)),
            model.trainable(),
            (pre,),
        )
    if name == "gibbs_sparse":
        z = kmeans_inducing_points(key, train_x, cfg.num_inducing)
        model = GibbsSparseGP.create(z, prior, noise=cfg.noise, outputscale=cfg.scale)
        # z trains (the latent field lives at z), so the prior Grams move
        # with it — no hoist possible for the sparse family
        return model, (lambda m, xx, yy: m.loss(xx, yy)), model.trainable(), ()
    if name == "deepgp":
        model = DeepGP.create(
            key, input_dims=d, num_layers=cfg.num_layers, num_inducing=cfg.num_inducing
        )
        return model, None, None, ()  # trained via fit_minibatched
    if name == "st_stationary":
        from nonstationary_precip_tpu.models import SpatioTemporalStationary

        if d != 3:
            raise SystemExit("st_stationary expects 3 input columns (time, lon, lat)")
        model = SpatioTemporalStationary.create()
        return model, (lambda m, xx, yy: m.loss(xx, yy)), None, ()
    if name == "st_nonstationary":
        from nonstationary_precip_tpu.models import SparseSpatioTemporalNonstationary

        if d != 3:
            raise SystemExit("st_nonstationary expects 3 input columns (time, lon, lat)")
        z = kmeans_inducing_points(key, train_x, cfg.num_inducing)
        model = SparseSpatioTemporalNonstationary.create(z, prior)
        return model, (lambda m, xx, yy: m.loss(xx, yy)), model.trainable(), ()
    raise SystemExit(f"unknown --model {name!r}; choose from {MODELS}")


def _fit(name: str, model, loss_fn, mask, train_x, train_y, cfg: ServeConfig, key, extra=()):
    from nonstationary_precip_tpu.models.gibbs_gp import ChunkedMAPLoss
    from nonstationary_precip_tpu.train import fit
    from nonstationary_precip_tpu.train.optim import fit_chunked, fit_minibatched

    if isinstance(loss_fn, ChunkedMAPLoss):
        import jax

        # host-chunked large-N route: Adam on the host, phase programs on
        # device, per-step relres evidence in the result
        res = fit_chunked(
            model, loss_fn, train_x, train_y, extra[0],
            key=jax.random.PRNGKey(cfg.seed + 2),  # fixed probe key, the
            # same common-random-numbers convention as the monolithic path
            num_steps=cfg.max_iters, lr=cfg.lr, mask=mask,
            log_every=max(cfg.log_interval, 1),
        )
        worst = float(max(res.relres)) if res.steps else float("nan")
        print(
            f"chunked fit: {res.steps} steps, final loss "
            f"{float(res.losses[-1]):.6f}, worst relres {worst:.2e}"
            + ("" if worst <= 1e-2 else "  [NOT CONVERGED — raise "
               "--precond_rank / --precond_shift]")
        )
        return res.model

    lr = cfg.lr
    if name.startswith("mv_") and cfg.lr == ServeConfig().lr:
        # the Paciorek–Schervish Σ algebra NaNs at the generic Adam default
        # on whitened field data (measured: lr 0.01 diverges at step 2-3,
        # 0.002 trains); only applied when --lr was left at its default
        lr = 0.002

    if name == "deepgp":
        n = train_x.shape[0]
        return fit_minibatched(
            model,
            lambda m, kk, xb, yb: m.loss(
                kk, xb, yb, num_data=n, num_samples=cfg.num_samples
            ),
            train_x,
            train_y,
            key=key,
            num_epochs=cfg.num_epochs,
            batch_size=cfg.batch_size,  # clamped to n inside _epoch_schedule
            lr=lr,
            aot_key=f"serve-{name}",
        ).model
    return fit(
        model,
        loss_fn,
        train_x,
        train_y,
        *extra,
        lr=lr,
        num_steps=cfg.max_iters,
        mask=mask,
        log_every=cfg.log_interval * 10,
        aot_key=f"serve-{name}",
        # serving must not hand back a NaN model because the caller's lr
        # was a notch too hot for their data: retry from the last finite
        # chunk at half lr (twice) before giving up
        lr_backoff=2,
    ).model


def _predict(name: str, model, train_x, train_y, pts, key, chunk: int = 4096,
             cfg: ServeConfig | None = None, extra=()):
    """Jitted predictive marginals (mean, var) at ``pts``.

    The GP families' ``predictive`` materialises the dense N*×N* joint
    covariance just to read its diagonal, so large ``--points_csv`` grids
    are served in fixed-size query chunks: O(chunk²) device memory per
    program instead of O(N*²), and every chunk (tail padded) reuses ONE
    compiled program — k dispatches, one compile."""
    import jax
    import jax.numpy as jnp

    if name == "deepgp":
        # sample propagation is O(S·N*·D) — no joint covariance to chunk
        return jax.jit(lambda m, p: (lambda mix: (mix.mean, mix.var))(
            m.predict(key, p, num_samples=10)[0]
        ))(model, pts)

    if cfg is not None and cfg.matrixfree and name == "gibbs_exact":
        n = train_x.shape[0]
        blk = _lazy_block(n)
        rank = min(cfg.precond_rank, n)
        pre = extra[0]
        # each chunk is an mBCG with 1+chunk right-hand sides riding the
        # solve: cap it so the block-vector state stays O(N·1k), not the
        # dense path's O(N·4k)
        chunk = min(chunk, 1024)

        fused = jax.default_backend() != "cpu"
        precond = cfg.precond or ("nystrom" if rank > 200 else "pivchol")
        if cfg.chunked:
            # past-the-wall serving: host-chunked α solve + conditioning
            # solves for the state, host-chunked variance solves per
            # query chunk — no device program holds a full CG budget
            nc = max(cfg.n_chunks, 8)
            state = model.posterior_state_matrixfree(
                train_x, train_y, pre, block=blk, precond_rank=rank,
                precond=precond, precond_shift=cfg.precond_shift,
                fused_matvec=fused, chunk_iters=cfg.chunk_iters,
                n_chunks=nc,
            )
            print(
                "posterior state built (chunked): alpha solve "
                f"relres={float(state[0].alpha_relres):.2e}"
            )
            relres_seen_c: list = []

            def marginals(m, p):
                dist, info = m.posterior_matrixfree_from_state(
                    state, p, noiseless=False, block=blk,
                    precond_shift=cfg.precond_shift, fused_matvec=fused,
                    chunk_iters=cfg.chunk_iters, n_chunks=nc,
                    return_info=True,
                )
                relres_seen_c.append(float(info["relres_max"]))
                return dist.mean, jnp.maximum(dist.var, m.likelihood.noise)

            marginals.prejitted = True  # host orchestrator — never jit it
            marginals.relres_seen = relres_seen_c
            chunk = min(chunk, 1024)
            return _run_chunked_predict(marginals, model, pts, chunk)
        # amortized serving (VERDICT r3 #4): α = K⁻¹y, the preconditioner
        # factor and the prior's conditioning solves are hoisted ONCE per
        # process into a posterior state — each chunk then pays only the
        # cross build + one auto-budget variance solve, instead of a cold
        # 64-iter mBCG + factor build + conditioning solves per chunk
        # train_x/train_y/pre ride as jit ARGUMENTS, not closure constants
        # — embedded constants ride the compile request and the service
        # rejects ≳250 MB bodies (HTTP 413, DESIGN.md §23); pre's
        # (D, N, rank) factors cross that line around N ≈ 200k, sizes the
        # TRAINING path already handles (ADVICE r4)
        state = jax.jit(
            lambda m, tx, ty, pr: m.posterior_state_matrixfree(
                tx, ty, pr, block=blk, precond_rank=rank,
                precond_shift=cfg.precond_shift, fused_matvec=fused,
            )
        )(model, train_x, train_y, pre)
        # the state's one α solve carries its own relative residual —
        # surface it now: every served MEAN rides on this solve
        alpha_relres = float(state[0].alpha_relres)
        print(f"posterior state built: alpha solve relres={alpha_relres:.2e}")

        # same 413 rule for the per-chunk query
        def marginals_st(m, st, p):
            d, info = m.posterior_matrixfree_from_state(
                st, p, noiseless=False, block=blk,
                precond_shift=cfg.precond_shift, fused_matvec=fused,
                return_info=True,
            )
            return d.mean, jnp.maximum(d.var, m.likelihood.noise), info["relres_max"]

        fn_st = jax.jit(marginals_st)
        relres_seen: list = []

        def marginals(m, p):
            mean, var, rr = fn_st(m, state, p)
            relres_seen.append(float(rr))
            return mean, var

        marginals.prejitted = True
        marginals.relres_seen = relres_seen

    else:

        def marginals(m, p):
            d = m.predictive(train_x, train_y, p)
            # predictive variance = posterior + observation noise ≥ noise;
            # floor the f32 Woodbury cancellation at that physical bound
            return d.mean, jnp.maximum(d.var, m.likelihood.noise)

    return _run_chunked_predict(marginals, model, pts, chunk)


def _run_chunked_predict(marginals, model, pts, chunk):
    """Fixed-size query-chunk loop + the convergence-evidence report
    (shared by the jitted and host-chunked matrix-free serving paths)."""
    import jax
    import jax.numpy as jnp

    fn = marginals if getattr(marginals, "prejitted", False) else jax.jit(marginals)
    n = pts.shape[0]
    if n <= chunk:
        out = fn(model, pts)
    else:
        k = -(-n // chunk)
        pad = k * chunk - n
        if pad:
            pts = jnp.concatenate(
                [pts, jnp.broadcast_to(pts[:1], (pad, pts.shape[1]))]
            )
        means, vars_ = zip(
            *(fn(model, pts[i * chunk:(i + 1) * chunk]) for i in range(k))
        )
        out = jnp.concatenate(means)[:n], jnp.concatenate(vars_)[:n]
    relres = getattr(marginals, "relres_seen", None)
    if relres:
        worst = max(relres)
        # the training-solve gate (run_benchmarks --check uses 1e-2): a
        # serve whose variance solves stalled above it is a DIFFERENT
        # (unconverged) estimator — say so loudly instead of shipping it
        status = "ok" if worst <= 1e-2 else "NOT CONVERGED"
        print(
            f"matrix-free variance solves: worst relres={worst:.2e} "
            f"over {len(relres)} chunk(s) [{status}]"
        )
        if worst > 1e-2:
            print(
                "WARNING: raise --precond_rank (or --precond_shift) and "
                "re-serve; predictions below ride an unconverged solve",
                flush=True,
            )
    return out


def main(argv=None):
    import jax.numpy as jnp

    from nonstationary_precip_tpu.data.dataprep import load_csv
    from nonstationary_precip_tpu.train.checkpoint import restore_pytree, save_pytree

    cfg = ServeConfig(model="gibbs_exact", max_iters=1000).parse_args(argv)
    if cfg.model not in MODELS:
        raise SystemExit(f"unknown --model {cfg.model!r}; choose from {MODELS}")

    data = load_csv(Path(cfg.train_csv))
    if cfg.x_cols:
        raw_x = data[:, [int(s) for s in cfg.x_cols.split(",")]]
    else:
        raw_x = np.delete(data, cfg.y_col % data.shape[1], axis=1)
    raw_y = data[:, cfg.y_col]
    # whitening in the selected-column frame (ddof=1, matching
    # data.dataprep.whitening_transform / torch.std_mean)
    meanx, stdx = raw_x.mean(axis=0), raw_x.std(axis=0, ddof=1)
    meany, stdy = float(raw_y.mean()), float(raw_y.std(ddof=1))
    train_x = jnp.asarray((raw_x - meanx) / stdx, jnp.float32)
    train_y = jnp.asarray((raw_y - meany) / stdy, jnp.float32)

    import jax

    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_fit, k_pred = jax.random.split(key, 3)

    model, loss_fn, mask, extra = _build(cfg.model, train_x, train_y, cfg, k_init)
    fitted = False
    if cfg.checkpoint:
        model = restore_pytree(cfg.checkpoint, model)
        print(f"restored {cfg.model} checkpoint from {cfg.checkpoint}")
    else:
        t0 = time.time()
        model = _fit(cfg.model, model, loss_fn, mask, train_x, train_y, cfg, k_fit, extra)
        print(f"fitted {cfg.model} in {time.time() - t0:.1f}s")
        fitted = True

    # query points: raw input coordinates → the training whitening frame
    if cfg.points_csv:
        raw_pts = load_csv(Path(cfg.points_csv))[:, : train_x.shape[-1]]
    else:
        raw_pts = np.asarray(raw_x)
    pts = jnp.asarray((raw_pts - meanx) / stdx, jnp.float32)

    t0 = time.time()
    mean, var = _predict(
        cfg.model, model, train_x, train_y, pts, k_pred, cfg=cfg, extra=extra
    )
    mean = np.asarray(mean) * stdy + meany  # back to raw data units
    std = np.sqrt(np.maximum(np.asarray(var), 0.0)) * stdy
    print(f"served {len(pts)} points in {time.time() - t0:.1f}s")
    if not (np.isfinite(mean).all() and np.isfinite(std).all()):
        raise SystemExit(
            "non-finite predictions: training diverged (fit prints a "
            "non-finite-loss warning when so) — lower --lr or --max_iters, "
            "or serve from a known-good --checkpoint"
        )
    # only persist a checkpoint that passed the finite-prediction gate —
    # a diverged fit must never leave a NaN checkpoint behind for a later
    # --checkpoint run to trip over
    if fitted and cfg.save_checkpoint:
        save_pytree(cfg.save_checkpoint, model)
        print(f"saved checkpoint to {cfg.save_checkpoint}")

    if cfg.output and cfg.output != "/dev/null":
        out = Path(cfg.output)
        cols = [raw_pts[:, i] for i in range(raw_pts.shape[1])] + [mean, std]
        header = (
            ",".join(f"x{i}" for i in range(raw_pts.shape[1])) + ",pred_mean,pred_std"
        )
        np.savetxt(out, np.stack(cols, axis=1), delimiter=",", header=header, comments="")
        print(f"wrote {out} ({len(mean)} rows)")
    return mean, std


if __name__ == "__main__":
    main(sys.argv[1:])
