"""Device-mesh construction for data-parallel training.

The reference has no distributed backend at all (SURVEY.md §2.6: no
torch.distributed, single process, optional single GPU).  The one
parallelism axis this workload supports is data parallelism over the DSVI
minibatch; collectives ride ICI via a 1-D ``jax.sharding.Mesh``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


ROW_AXIS = "rows"
COL_AXIS = "cols"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"make_mesh: need {n_devices} devices, have {len(devs)} — a "
                "silently smaller mesh would fail far away (split counts, "
                "shard shapes) with the cause misattributed"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(
    n_rows: int,
    n_cols: int,
    row_axis: str = ROW_AXIS,
    col_axis: str = COL_AXIS,
) -> Mesh:
    """2-D (n_rows × n_cols) mesh over the first n_rows·n_cols devices —
    for tensor-sharded linear algebra (parallel/distributed_chol.py's 2-D
    variant).  On real hardware pick the factorisation matching the
    physical torus so both axes ride ICI."""
    devs = jax.devices()
    need = n_rows * n_cols
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    return Mesh(
        np.asarray(devs[:need]).reshape(n_rows, n_cols), (row_axis, col_axis)
    )


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
