"""Mesh-sharded prediction: test points sharded over devices.

Full-field prediction (e.g. spatial_exp.py:243 predicting all 394 basin
points, or basin-scale grids at production resolution) is embarrassingly
parallel over test rows: the train set is replicated, each device computes
the predictive marginals for its shard of x*, results concatenate on the
batch axis.  This is the second ICI-parallel axis this workload actually
has (after DP ELBO gradients, SURVEY.md §2.6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nonstationary_precip_tpu.parallel.dp import pad_to_multiple
from nonstationary_precip_tpu.parallel.mesh import DATA_AXIS

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sharded_marginals(predict_fn, mesh):
    """Wrap ``predict_fn(model, x_test_shard) -> (mean, var)`` into a
    mesh-parallel version sharding x_test rows over the data axis.

    Returns fn(model, x_test) -> (mean, var) with original length (padding
    to a device multiple handled internally).
    """
    axis = DATA_AXIS
    n_dev = mesh.shape[axis]

    inner = shard_map(
        predict_fn,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P(axis)),
    )

    def fn(model, x_test):
        x_pad, n = pad_to_multiple(x_test, n_dev)
        mean, var = inner(model, x_pad)
        return mean[:n], var[:n]

    return fn
