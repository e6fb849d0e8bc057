"""Split-vmapped training: run all K benchmark splits as one batched
program.

The reference's 10-split harnesses train sequentially
(spatial_exp.py:108, seard_spatial_benchmark.py:33).  On TPU the splits
have identical shapes, so the idiomatic move is to stack the K models
into one pytree with a leading split axis and train them simultaneously:
every Cholesky/Gram becomes a batched op with K× the arithmetic intensity
and the whole 10-split benchmark costs about one split of wall-clock.

Because Adam updates are elementwise per leaf, the batched run produces
*identical* trajectories to K sequential runs (the summed loss's gradient
w.r.t. split k's parameters is exactly split k's gradient).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from nonstationary_precip_tpu.train.optim import TrainResult, fit


def stack_pytrees(trees: Sequence[Any]) -> Any:
    """Stack identically-structured pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *trees)


class Stacked:
    """Marks a ``fit_splits``/``eval_splits`` argument as ALREADY stacked
    on the leading split axis.

    Per-split sequences are stacked leaf-wise with one eager ``jnp.stack``
    per leaf — fine for a handful of leaves, but an argument produced by a
    batched jitted program (e.g. the vmapped frozen-prior ``gram_pre``
    hoist in experiments/spatial_gibbs.py) is already device-resident in
    stacked form; wrapping it skips the redundant unstack/restack round
    trip and its per-op axon dispatches."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value


def unstack_pytree(tree: Any, k: int) -> list:
    """Inverse of stack_pytrees."""
    return [jax.tree_util.tree_map(lambda l: l[i], tree) for i in range(k)]


def _stack_args(args_per_split):
    """Leaf-wise stack of per-split args (arrays OR pytrees, e.g. the
    hoisted (K⁻¹, logdet) prior precompute); ``Stacked``-wrapped args pass
    through as-is (already carrying the K axis)."""
    return tuple(
        seq.value
        if isinstance(seq, Stacked)
        else stack_pytrees([jax.tree.map(jnp.asarray, a) for a in seq])
        for seq in args_per_split
    )


def _shard_splits(mesh, stacked, stacked_args):
    """Place a stacked-split pytree + args with the leading K axis sharded
    over the mesh's first axis.  Every leaf must carry the K axis first."""
    from jax.sharding import NamedSharding, PartitionSpec

    k = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    if k % mesh.size:
        raise ValueError(
            f"{k} splits do not divide over a {mesh.size}-device mesh"
        )
    by_k = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
    put = lambda t: jax.tree_util.tree_map(lambda l: jax.device_put(l, by_k), t)  # noqa: E731
    return put(stacked), tuple(put(a) for a in stacked_args)


def fit_splits(
    models: Sequence[Any],
    loss_fn: Callable,
    *args_per_split,
    lr: float = 0.01,
    num_steps: int = 1000,
    masks: Sequence[Any] = None,
    log_every: int = 0,
    chunk: int = 0,
    aot_key: str = None,
    batched_loss: Callable = None,
    mesh=None,
) -> TrainResult:
    """Train K models on K datasets simultaneously.

    loss_fn(model, *args) is the per-split loss; ``args_per_split`` are
    sequences of per-split arrays (stacked on a leading axis here).
    ``batched_loss(stacked_model, *stacked_args) -> (K,)`` overrides the
    default ``jax.vmap`` of loss_fn with a hand-batched form (e.g. the
    Pallas in-kernel-batch MAP loss, models.gibbs_gp.gibbs_map_loss_batched).
    ``mesh``: optional ``jax.sharding.Mesh`` — shards the K-split axis over
    its first axis (split parallelism; splits are independent, so gradients
    stay device-local).  Requires K % mesh.size == 0 and the default
    vmapped loss (a hand-batched Pallas loss is one custom call GSPMD
    cannot partition over K).  AOT pinning is skipped under a mesh.
    Returns a TrainResult whose model is the stacked pytree and whose
    losses are (num_steps, K).
    """
    stacked = stack_pytrees(models)
    stacked_args = _stack_args(args_per_split)
    if mesh is not None:
        if batched_loss is not None:
            raise ValueError(
                "fit_splits: mesh sharding requires the vmapped loss — a "
                "hand-batched Pallas loss is a single custom call that "
                "GSPMD cannot partition over the split axis"
            )
        stacked, stacked_args = _shard_splits(mesh, stacked, stacked_args)
        aot_key = None  # pins are single-device executables
    # trainability flags are structural: ONE mask (scalar-bool leaves)
    # broadcasts over the stacked leaves, so it must be identical across
    # splits — reject heterogeneous masks instead of silently training
    # every split under split 0's freezing
    mask = masks[0] if masks is not None else None
    if masks is not None:
        for i, mk in enumerate(masks[1:], start=1):
            same = jax.tree_util.tree_structure(mk) == jax.tree_util.tree_structure(mask) and all(
                bool(a == b)
                for a, b in zip(jax.tree_util.tree_leaves(mk), jax.tree_util.tree_leaves(mask))
            )
            if not same:
                raise ValueError(
                    f"fit_splits: split {i}'s trainability mask differs from "
                    "split 0's — heterogeneous per-split masks are not "
                    "supported (one broadcast mask trains all splits)"
                )

    def scalar_loss(m, *sa):
        # sum couples nothing: Adam is elementwise per leaf, so the summed
        # loss's gradient w.r.t. split k's parameters is exactly split k's
        # gradient; the per-split vector rides along as the recorded trace
        if batched_loss is not None:
            per = batched_loss(m, *sa)
        else:
            per = jax.vmap(lambda mm, *aa: loss_fn(mm, *aa))(m, *sa)
        return jnp.sum(per), per

    res = fit(
        stacked,
        scalar_loss,
        *stacked_args,
        lr=lr,
        num_steps=num_steps,
        mask=mask,
        log_every=log_every,
        has_aux=True,
        chunk=chunk,
        aot_key=aot_key,
    )
    return TrainResult(model=res.model, losses=res.losses, steps=res.steps)


def fit_restarts(
    models: Sequence[Any],
    loss_fn: Callable,
    *args,
    lr: float = 0.01,
    num_steps: int = 1000,
    mask=None,
):
    """Multi-restart training: K differently-initialised models optimise
    the SAME data simultaneously (one batched program); returns
    (best_model, best_loss, final_losses (K,)).

    The reference's SGPR signature advertises ``n_restarts`` but never
    implements it (archive/SGP/sgpr.py:48) — this is the honest version.
    """
    k = len(models)
    stacked = stack_pytrees(models)

    def per_model(m):
        return loss_fn(m, *args)

    def scalar_loss(m):
        return jnp.sum(jax.vmap(per_model)(m))

    res = fit(stacked, scalar_loss, lr=lr, num_steps=num_steps, mask=mask)
    finals = jax.vmap(per_model)(res.model)
    best = int(jnp.argmin(finals))
    best_model = jax.tree_util.tree_map(lambda l: l[best], res.model)
    del k
    return best_model, float(finals[best]), finals


def eval_splits(
    models_stacked: Any,
    eval_fn: Callable,
    *args_per_split,
    aot_key: str = None,
    mesh=None,
):
    """Evaluate K trained splits as ONE jitted vmapped program.

    ``mesh`` shards the K-split axis over the mesh (split parallelism);
    requires K % mesh.size == 0, skips AOT pinning.

    ``eval_fn(model, *args)`` returns a pytree of metric arrays for one
    split; per-split args stack leaf-wise (arrays or pytrees).  The
    eager per-split loops this replaces paid the ~28 ms axon dispatch on
    every jnp op — at ~40 ops per predict across 10 splits that phase
    dominated entire benchmark wallclocks (measured 2026-08-16:
    ~115 s of the 130 s gibbs_spatial_exact_10split row).

    ``aot_key`` pins the compiled eval executable to ``$NSGP_AOT_DIR``
    (train/aot_cache.py) — the eval program was the remaining per-process
    compile after the fit programs were pinned."""
    import os

    stacked_args = _stack_args(args_per_split)
    if mesh is not None:
        models_stacked, stacked_args = _shard_splits(mesh, models_stacked, stacked_args)
        aot_key = None  # pins are single-device executables
    fn = jax.jit(
        lambda ms, *sa: jax.vmap(lambda m, *aa: eval_fn(m, *aa))(ms, *sa)
    )
    if aot_key is not None and os.environ.get("NSGP_AOT_DIR"):
        from nonstationary_precip_tpu.train.aot_cache import cached_compile

        prog = cached_compile(f"{aot_key}-eval", fn, models_stacked, *stacked_args)
        return jax.block_until_ready(prog(models_stacked, *stacked_args))
    return jax.block_until_ready(fn(models_stacked, *stacked_args))
