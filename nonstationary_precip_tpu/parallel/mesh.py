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


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
