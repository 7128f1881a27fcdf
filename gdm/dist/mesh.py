"""Device mesh + sharding helpers.

TPU-native replacement for the reference's MPI slab decomposition
(include/gdm/system.h:703-761: 1-D partition of the structured grid with
a p/2-wide ghost layer).  Node fields are sharded along grid axis 0 of a
1-D jax.sharding.Mesh; XLA's SPMD partitioner (or the explicit shard_map
halo path in gdm.dist.halo) inserts the halo exchanges that deal.II's
Utilities::MPI::Partitioner performed by hand.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_mesh(n_devices: int = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_field(u, mesh: Mesh, axis: str = "x"):
    """Shard a node field along grid axis 0."""
    spec = P(axis, *([None] * (u.ndim - 1)))
    return jax.device_put(u, NamedSharding(mesh, spec))


def replicate(u, mesh: Mesh):
    return jax.device_put(u, NamedSharding(mesh, P()))
