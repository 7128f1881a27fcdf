"""Nodal load vectors and error norms for analytic functions."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .grid import Grid
from .ops.tensor import integrate_to_nodes, quad_points_1d


def quad_mesh(grid: Grid, nq: int = None):
    pts = [quad_points_1d(grid, d, nq) for d in range(grid.dim)]
    return np.meshgrid(*pts, indexing="ij")


def load_vector(grid: Grid, fn, t=None, nq: int = None):
    """F_a = (phi_a, f) over the full domain.

    fn(coords_list, component[, t]) -> array over the quadrature mesh.
    """
    mesh = quad_mesh(grid, nq)
    comps = []
    for c in range(grid.n_components):
        val = fn(mesh, c) if t is None else fn(mesh, c, t)
        comps.append(np.broadcast_to(np.asarray(val, dtype=np.float64), mesh[0].shape))
    F = jnp.stack([jnp.asarray(v) for v in comps], axis=-1)
    return integrate_to_nodes(F, grid, nq=nq)
