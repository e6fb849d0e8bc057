"""Data-parallel ELBO gradients via shard_map + psum.

The DSVI minibatch ELBO is a mean over batch elements plus a KL that
depends only on (replicated) parameters, so data parallelism is exact:
each device evaluates the data term on its shard, gradients are psum-ed
over ICI, and the KL is computed once (divided by the device count so the
psum restores it).

This is the TPU-native answer to the reference's absent-by-design
multi-device story (SURVEY.md §2.6): ``dp_value_and_grad`` wraps any
per-shard loss into a mesh-parallel value-and-grad with a single psum —
XLA overlaps the reduce with backward compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from nonstationary_precip_tpu.parallel.mesh import DATA_AXIS


def pad_to_multiple(arr: jnp.ndarray, multiple: int, axis: int = 0):
    """Pad axis 0 to a device-count multiple; returns (padded, true_count)."""
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths), n


def shard_batch(mesh, *arrays):
    """Place batch arrays with the leading dim sharded over the mesh."""
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(jax.device_put(a, sh) for a in arrays)


def dp_value_and_grad(loss_fn, mesh):
    """Build a mesh-parallel value_and_grad of a *mean-over-batch* loss.

    loss_fn(model, x_shard, y_shard) must return the mean loss over its
    shard (parameter-only terms like the KL already carry their global
    normalisation).  We differentiate THROUGH shard_map — the global loss
    is the pmean of per-shard means, and AD places the gradient psum
    automatically.  (Differentiating *inside* shard_map and psum-ing
    manually double-counts under the new vma semantics: the transpose of a
    replicated model input already inserts a psum.)
    """

    axis = DATA_AXIS

    def per_shard(model, x, y):
        return jax.lax.pmean(loss_fn(model, x, y), axis)

    global_loss = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(),
    )

    return jax.value_and_grad(global_loss)
