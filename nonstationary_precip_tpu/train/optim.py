"""Training loops: optax Adam under a jit-compiled lax.scan.

TPU-native replacement for the reference's eager Python loops
(`for i in range(n_iter): loss.backward(); opt.step()`, e.g.
/root/reference/experiments/spatial_exp.py:197-210).  The whole loop is one
compiled program: parameters are donated, the loss history comes back as a
stacked array, and trainability masks implement the reference's
``requires_grad = False`` freezing.

``fit`` also supports chunked execution with early stopping on |Δloss|
(the reference's convergence rule, precipitation_baselines.py:389-390) —
the scan runs in fixed-size chunks so the stop check happens on host
between compiled segments, keeping shapes static.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nonstationary_precip_tpu.utils.struct import mask_grads


class TrainResult(NamedTuple):
    model: Any
    losses: jnp.ndarray
    steps: int


@partial(jax.jit, static_argnames=("loss_fn", "optimizer", "num_steps", "has_aux"))
def adam_scan(
    model, opt_state, loss_fn, optimizer, num_steps: int, mask=None, has_aux: bool = False, *args
):
    """Run ``num_steps`` optimisation steps as one lax.scan.

    loss_fn(model, *args) -> scalar (or (scalar, aux_trace) when
    ``has_aux`` — the aux, e.g. a per-split loss vector, is recorded as
    the per-step trace instead of the scalar).  ``mask`` is an optional
    bool pytree zeroing gradients of frozen leaves.
    """

    def step(carry, _):
        m, s = carry
        if has_aux:
            (loss, trace), grads = jax.value_and_grad(
                lambda mm: loss_fn(mm, *args), has_aux=True
            )(m)
        else:
            loss, grads = jax.value_and_grad(lambda mm: loss_fn(mm, *args))(m)
            trace = loss
        if mask is not None:
            grads = mask_grads(grads, mask)
        updates, s = optimizer.update(grads, s, m)
        m = optax.apply_updates(m, updates)
        return (m, s), trace

    (model, opt_state), losses = jax.lax.scan(step, (model, opt_state), None, length=num_steps)
    return model, opt_state, losses


def fit(
    model,
    loss_fn: Callable,
    *args,
    lr: float = 0.01,
    num_steps: int = 1000,
    mask=None,
    threshold: Optional[float] = None,
    chunk: int = 0,
    log_every: int = 0,
    callback: Optional[Callable] = None,
    nan_guard: bool = True,
    has_aux: bool = False,
    aot_key: Optional[str] = None,
    lr_backoff: int = 0,
) -> TrainResult:
    """Adam-optimise ``model`` under loss_fn(model, *args).

    threshold: stop when |loss[t] − loss[t−1]| < threshold for ANY step t,
    evaluated per-step over the whole recorded trace (the reference's
    per-iteration convergence rule, precipitation_baselines.py:389-390);
    the model can only stop at a chunk boundary, so the returned state is
    from the end of the chunk containing the triggering step.  For a
    vector (per-split) trace the rule requires every split's |Δ| below
    threshold at the same step.  chunk=0 runs the whole budget as one
    scan — unless ``threshold`` is set, in which case it defaults to
    min(num_steps, 500) so a convergent fit actually stops early instead
    of burning the whole budget (fixed chunk lengths keep the compiled
    program count at ≤2: the chunk program plus at most one tail).
    nan_guard: abort at a chunk boundary when the loss goes non-finite —
    minimal failure detection (the reference has none, SURVEY.md §5); the
    last finite-loss model state is NOT recoverable mid-chunk, so pair
    with smaller chunks when chasing instabilities.
    has_aux: loss_fn returns (scalar, trace); trace (e.g. a per-split loss
    vector) is recorded in TrainResult.losses instead of the scalar.
    aot_key: pin/load this fit's compiled chunk programs under
    ``$NSGP_AOT_DIR/<aot_key>-s<chunk>-*.jaxexec`` (train/aot_cache.py) —
    bypasses the axon compile service on every warm run; a no-op when
    NSGP_AOT_DIR is unset.
    lr_backoff: self-healing divergence recovery — when the nan_guard
    trips and backoff budget remains, restore the chunk-start snapshot,
    HALVE the learning rate, and retry the chunk (at most ``lr_backoff``
    times total).  The lr lives in the optimizer state
    (optax.inject_hyperparams), so a halving is a state edit, not a
    recompile — critical on axon where fresh compiles cost 3–20 min.
    Motivated by the measured f32 stability edges (CLAUDE.md: sparse-
    gibbs/ST-nonstat CPU trajectories can diverge where TPU's don't; the
    MV Gibbs family NaNs at the generic Adam default).  Off by default:
    the happy path keeps plain optax.adam so benchmark-pinned program
    identities are untouched.
    """
    if lr_backoff:
        optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    else:
        optimizer = optax.adam(lr)
    opt_state = optimizer.init(model)

    if not chunk:
        chunk = (
            min(num_steps, 500)
            if (threshold is not None or lr_backoff)
            else num_steps
        )
    use_aot = aot_key is not None and os.environ.get("NSGP_AOT_DIR")
    aot_programs: dict = {}
    losses_all = []
    steps_done = 0
    prev_last = None  # last step of the previous chunk, for cross-chunk |Δ|
    backoffs_left = lr_backoff
    snapshot = (model, opt_state)  # chunk-start state (held on device)
    while steps_done < num_steps:
        n = min(chunk, num_steps - steps_done)
        if use_aot:
            if n not in aot_programs:
                from nonstationary_precip_tpu.train.aot_cache import cached_compile

                aot_programs[n] = cached_compile(
                    f"{aot_key}-s{n}", adam_scan,
                    model, opt_state, loss_fn, optimizer, n, mask, has_aux, *args,
                )
            model, opt_state, losses = aot_programs[n](model, opt_state, mask, *args)
        else:
            model, opt_state, losses = adam_scan(
                model, opt_state, loss_fn, optimizer, n, mask, has_aux, *args
            )
        losses = np.asarray(jax.device_get(losses))
        # any-step detection: a mid-chunk inf that recovers to a finite
        # final value still contaminated the Adam moments
        if nan_guard and not np.all(np.isfinite(losses)):
            if backoffs_left > 0:
                backoffs_left -= 1
                model, opt_state = snapshot
                # stay a strong-typed f32 device scalar: replacing it with
                # a Python float changes the jit signature (weak_type) and
                # forces a full retrace/recompile per retry
                new_lr = opt_state.hyperparams["learning_rate"] * 0.5
                opt_state = opt_state._replace(
                    hyperparams={**opt_state.hyperparams, "learning_rate": new_lr}
                )
                prev_last = None
                print(
                    f"fit: non-finite loss in steps {steps_done}..{steps_done + n}; "
                    f"restored step-{steps_done} state, lr -> {float(new_lr):g} "
                    f"({backoffs_left} backoffs left)"
                )
                continue
            losses_all.append(losses)
            steps_done += n
            print(f"fit: non-finite loss at step {steps_done}; stopping")
            break
        losses_all.append(losses)
        steps_done += n
        snapshot = (model, opt_state)
        crossed = steps_done // max(log_every, 1) > (steps_done - n) // max(log_every, 1)
        if log_every and (crossed or steps_done == num_steps):
            print(f"step {steps_done}/{num_steps}  loss {float(np.sum(losses[-1])):.4f}")
        if callback is not None:
            callback(steps_done, model, losses)
        if threshold is not None:
            seq = losses if prev_last is None else np.concatenate(
                [prev_last[None], losses], axis=0
            )
            if seq.shape[0] >= 2:
                d = np.abs(np.diff(seq, axis=0)).reshape(seq.shape[0] - 1, -1).max(axis=1)
                if np.any(d < threshold):
                    break
        prev_last = losses[-1]

    if not losses_all:  # num_steps=0 (e.g. a restore-only path): no-op fit
        return TrainResult(model=model, losses=jnp.zeros((0,)), steps=0)
    return TrainResult(model=model, losses=jnp.concatenate(losses_all), steps=steps_done)


class ChunkedTrainResult(NamedTuple):
    model: Any
    losses: jnp.ndarray
    steps: int
    relres: jnp.ndarray  # (steps,) worst per-step solve relres (evidence)


@partial(jax.jit, static_argnames=("optimizer",))
def _chunked_apply(model, opt_state, grads, optimizer, mask):
    if mask is not None:
        grads = mask_grads(grads, mask)
    updates, opt_state = optimizer.update(grads, opt_state, model)
    return optax.apply_updates(model, updates), opt_state


def fit_chunked(
    model,
    loss,
    x,
    y,
    prior_pre=None,
    *,
    key,
    num_steps: int,
    lr: float = 0.01,
    mask=None,
    threshold: Optional[float] = None,
    nan_guard: bool = True,
    log_every: int = 0,
    callback: Optional[Callable] = None,
    precond_key=None,
    resample_probes: bool = False,
) -> ChunkedTrainResult:
    """Adam-optimise ``model`` under a host-chunked MAP loss
    (:class:`models.gibbs_gp.ChunkedMAPLoss`) — the ``fit`` counterpart
    for N past the axon worker's ~60–90 s program-execution wall
    (DESIGN.md §27–28), where the whole-scan :func:`fit` cannot run: the
    optimisation loop lives on the HOST, each step a handful of jitted
    phase programs (preconditioner setup, mBCG chunks, panel backward,
    Adam apply), none of which outlives the wall.

    Same semantics as :func:`fit` where they overlap: ``mask`` freezes
    leaves (default: pass ``model.trainable()``), ``threshold`` is the
    reference's |Δloss| per-step stop rule
    (precipitation_baselines.py:389-390 — evaluated every step here,
    since the host sees every loss), ``nan_guard`` aborts on a
    non-finite loss (the previous step's model is returned — the host
    loop snapshots by construction), ``callback(step, model, losses)``
    runs every step (checkpointing hook — pair with
    ``train.checkpoint.BestCheckpointer``).

    ``resample_probes=False`` (default) keeps ONE probe key for all
    steps — common random numbers, the convention every measured
    chunked bench row uses (tools/bench_cg.json); ``True`` folds the
    step index in (estimator noise decorrelates across steps).

    Returns :class:`ChunkedTrainResult`; ``relres`` is the worst
    per-step solve residual — convergence EVIDENCE for every step of
    the fit (gate on it; the 1e-2 training-solve bar is
    ``run_benchmarks --check``'s)."""
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(model)
    losses, relres_hist = [], []
    prev = None
    steps_done = 0
    for i in range(num_steps):
        k = jax.random.fold_in(key, i) if resample_probes else key
        val, grads, info = loss.value_and_grad(
            model, x, y, prior_pre, k, pkey=precond_key
        )
        f = float(val)
        rr = float(info["relres_max"])
        if nan_guard and not np.isfinite(f):
            # the CURRENT model produced this non-finite loss — roll back
            # to the last model whose loss evaluated finite
            model = finite_model if losses else model
            print(
                f"fit_chunked: non-finite loss at step {i}; stopping "
                "(returning the last finite-loss model)"
            )
            break
        finite_model = model
        new_model, opt_state = _chunked_apply(
            model, opt_state, grads, optimizer, mask
        )
        model = new_model
        losses.append(f)
        relres_hist.append(rr)
        steps_done = i + 1
        if log_every and (i + 1) % log_every == 0:
            print(
                f"step {i + 1}/{num_steps}  loss {f:.6f}  relres {rr:.2e}",
                flush=True,
            )
        if callback is not None:
            callback(i + 1, model, np.asarray(losses))
        if threshold is not None and prev is not None and abs(f - prev) < threshold:
            break
        prev = f
    return ChunkedTrainResult(
        model=model,
        losses=jnp.asarray(losses),
        steps=steps_done,
        relres=jnp.asarray(relres_hist),
    )


@partial(jax.jit, static_argnames=("loss_fn", "optimizer"), donate_argnums=(1,))
def minibatch_scan(model, opt_state, loss_fn, optimizer, keys, batch_idx, x, y):
    """Epoch-permutation minibatch SGD as one lax.scan.

    ``batch_idx`` (T, B) is the precomputed schedule of row indices (host
    builds per-epoch permutations, mirroring DataLoader(shuffle=True) in
    deepgp_spatial_bench.py:70); ``keys`` (T, 2) supplies the per-step DSVI
    sampling keys.  loss_fn(model, key, x_batch, y_batch) -> scalar.
    """

    def step(carry, inp):
        m, s = carry
        key, idx = inp
        xb, yb = x[idx], y[idx]
        loss, grads = jax.value_and_grad(lambda mm: loss_fn(mm, key, xb, yb))(m)
        updates, s = optimizer.update(grads, s, m)
        m = optax.apply_updates(m, updates)
        return (m, s), loss

    (model, opt_state), losses = jax.lax.scan(step, (model, opt_state), (keys, batch_idx))
    return model, opt_state, losses


@partial(jax.jit, static_argnames=("loss_fn", "optimizer"), donate_argnums=(1,))
def minibatch_scan_splits(models, opt_state, loss_fn, optimizer, keys, batch_idx, x, y):
    """K-split batched variant of ``minibatch_scan``: the K independent
    DSVI fits advance in lockstep inside ONE scan (the 10-split deepgp
    benchmark ran them sequentially, paying per-split pin-load/lower/
    dispatch overhead around ~0.25 s of real compute each).

    ``models``/``opt_state`` are stacked on a leading K axis; ``keys``
    (T, K, 2), ``batch_idx`` (T, K, B), ``x`` (K, N, D), ``y`` (K, N).
    Because the per-split losses are independent and Adam is elementwise,
    grad of the summed loss gives each split exactly its own gradient —
    trajectories match the sequential runs (same argument as
    vmapped.fit_splits).  Returns per-split loss traces (T, K)."""

    def step(carry, inp):
        m, s = carry
        key, idx = inp  # (K, 2), (K, B)

        def total(mm):
            per = jax.vmap(
                lambda m1, k1, i1, x1, y1: loss_fn(m1, k1, x1[i1], y1[i1])
            )(mm, key, idx, x, y)
            return jnp.sum(per), per

        (_, per), grads = jax.value_and_grad(total, has_aux=True)(m)
        updates, s = optimizer.update(grads, s, m)
        m = optax.apply_updates(m, updates)
        return (m, s), per

    (models, opt_state), losses = jax.lax.scan(step, (models, opt_state), (keys, batch_idx))
    return models, opt_state, losses


def _epoch_schedule(seed: int, n: int, num_epochs: int, batch_size: int) -> np.ndarray:
    """Epoch-shuffled batch-index schedule, (T, B): per-epoch permutations,
    wrap-around padded so every step has a full batch (mirrors
    DataLoader(shuffle=True) in the reference's DSVI loop,
    deepgp_spatial_bench.py:70).  Shared by ``fit_minibatched`` and
    ``fit_minibatched_splits`` — their bit-identity is load-bearing for
    the lockstep-equals-sequential trajectory guarantee."""
    batch_size = min(batch_size, n)  # DataLoader semantics: a batch never
    # exceeds the dataset; without this, pad > len(perm) below and the
    # reshape crashes for any batch_size > n
    steps_per_epoch = n // batch_size if n % batch_size == 0 else n // batch_size + 1
    rng = np.random.default_rng(seed)
    sched = []
    for _ in range(num_epochs):
        perm = rng.permutation(n)
        pad = (-len(perm)) % (steps_per_epoch * batch_size)
        if pad:
            perm = np.concatenate([perm, perm[:pad]])
        sched.append(perm.reshape(steps_per_epoch, batch_size))
    return np.concatenate(sched, axis=0)


def fit_minibatched_splits(
    models: list,
    loss_fn: Callable,
    xs,
    ys,
    *,
    keys: list,
    num_epochs: int,
    batch_size: int,
    lr: float = 0.01,
    seeds: Optional[list] = None,
    aot_key: Optional[str] = None,
    mesh=None,
) -> TrainResult:
    """Epoch-shuffled minibatch Adam for K independent splits as ONE
    compiled scan (hand-batched form of K ``fit_minibatched`` calls —
    same per-split schedules, same trajectories).

    ``models``: K per-split model pytrees (identical treedef/shapes);
    ``xs``/``ys``: K per-split arrays (identical shapes); ``keys``: K
    PRNG keys; ``seeds``: K schedule seeds (defaults to range(K)).
    Returns stacked models and a (T, K) per-split loss trace.

    ``mesh``: optional ``jax.sharding.Mesh`` — shards the K-split axis
    over its first axis (split parallelism).  The splits are independent
    and Adam is elementwise, so every gradient stays device-local; the
    only collective is the scalar loss-sum each step.  Requires
    K % mesh.size == 0.  AOT pinning is skipped under a mesh (pins are
    single-device executables)."""
    from nonstationary_precip_tpu.train.vmapped import stack_pytrees

    k = len(models)
    if seeds is None:
        seeds = list(range(k))
    n = np.asarray(xs[0]).shape[0]
    batch_idx = jnp.asarray(
        np.stack(
            [_epoch_schedule(s, n, num_epochs, batch_size) for s in seeds], axis=1
        )
    )  # (T, K, B)
    total_steps = batch_idx.shape[0]
    keys_tk = jnp.stack([jax.random.split(kk, total_steps) for kk in keys], axis=1)

    stacked = stack_pytrees(models)
    x_stk = jnp.stack([jnp.asarray(a) for a in xs])
    y_stk = jnp.stack([jnp.asarray(a) for a in ys])
    optimizer = optax.adam(lr)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if k % mesh.size:
            raise ValueError(
                f"fit_minibatched_splits: {k} splits do not divide over a "
                f"{mesh.size}-device mesh"
            )
        axis = mesh.axis_names[0]
        by_k0 = NamedSharding(mesh, PartitionSpec(axis))
        by_k1 = NamedSharding(mesh, PartitionSpec(None, axis))
        stacked = jax.device_put(stacked, by_k0)
        keys_tk = jax.device_put(keys_tk, by_k1)
        batch_idx = jax.device_put(batch_idx, by_k1)
        x_stk = jax.device_put(x_stk, by_k0)
        y_stk = jax.device_put(y_stk, by_k0)
    # init AFTER placement: Adam moments mirror the (sharded) params,
    # while the scalar step count stays replicated.
    opt_state = optimizer.init(stacked)
    if mesh is None and aot_key is not None and os.environ.get("NSGP_AOT_DIR"):
        from nonstationary_precip_tpu.train.aot_cache import cached_compile

        prog = cached_compile(
            f"{aot_key}-bt{total_steps}x{k}", minibatch_scan_splits,
            stacked, opt_state, loss_fn, optimizer, keys_tk, batch_idx, x_stk, y_stk,
        )
        stacked, opt_state, losses = prog(stacked, opt_state, keys_tk, batch_idx, x_stk, y_stk)
    else:
        stacked, opt_state, losses = minibatch_scan_splits(
            stacked, opt_state, loss_fn, optimizer, keys_tk, batch_idx, x_stk, y_stk
        )
    host_l = np.asarray(losses)
    if not np.isfinite(host_l).all():  # any step: a mid-trace inf already
        # contaminated that split's Adam moments even if the last step
        # evaluates finite
        bad = np.where(~np.isfinite(host_l).all(axis=0))[0]
        print(
            f"fit_minibatched_splits: NON-FINITE loss in splits {bad.tolist()} "
            f"— those models are unreliable; reduce lr or batch size",
            flush=True,
        )
    return TrainResult(model=stacked, losses=losses, steps=total_steps)


def fit_minibatched(
    model,
    loss_fn: Callable,
    x,
    y,
    *,
    key,
    num_epochs: int,
    batch_size: int,
    lr: float = 0.01,
    seed: int = 0,
    log_every_epochs: int = 0,
    aot_key: Optional[str] = None,
) -> TrainResult:
    """Epoch-shuffled minibatch Adam (the reference's DSVI loop,
    deepgp_spatial_bench.py:78-92) compiled as one scan over the full
    epoch×batch schedule.  ``aot_key``: pin/load the compiled scan via
    train/aot_cache.py (active only when NSGP_AOT_DIR is set)."""

    n = x.shape[0]
    steps_per_epoch = n // batch_size if n % batch_size == 0 else n // batch_size + 1
    batch_idx = jnp.asarray(_epoch_schedule(seed, n, num_epochs, batch_size))
    total_steps = batch_idx.shape[0]
    keys = jax.random.split(key, total_steps)

    optimizer = optax.adam(lr)
    opt_state = optimizer.init(model)
    if aot_key is not None and os.environ.get("NSGP_AOT_DIR"):
        from nonstationary_precip_tpu.train.aot_cache import cached_compile

        prog = cached_compile(
            f"{aot_key}-t{total_steps}", minibatch_scan,
            model, opt_state, loss_fn, optimizer, keys, batch_idx, x, y,
        )
        model, opt_state, losses = prog(model, opt_state, keys, batch_idx, x, y)
    else:
        model, opt_state, losses = minibatch_scan(
            model, opt_state, loss_fn, optimizer, keys, batch_idx, x, y
        )
    if log_every_epochs:
        host_losses = jax.device_get(losses)
        for e in range(0, num_epochs, log_every_epochs):
            sl = host_losses[e * steps_per_epoch : (e + 1) * steps_per_epoch]
            print(f"epoch {e}: mean loss {float(sl.mean()):.4f}")
    # failure detection (the whole schedule runs as one scan, so this is
    # post-hoc): surface a non-finite ELBO trace loudly instead of letting
    # a silently-NaN model flow into prediction
    host_l = np.asarray(losses)
    if not np.isfinite(host_l).all():  # any step, not just the last — a
        # mid-trace inf already contaminated the Adam moments
        first_bad = int(np.argmax(~np.isfinite(host_l)))
        print(
            f"fit_minibatched: NON-FINITE loss from step {first_bad}/{total_steps} "
            f"— model state is unreliable; reduce lr or batch size",
            flush=True,
        )
    return TrainResult(model=model, losses=losses, steps=total_steps)
