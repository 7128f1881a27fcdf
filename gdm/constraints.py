"""Constraints as structured masks / affine maps.

The reference uses dealii::AffineConstraints (zero/inhomogeneous Dirichlet:
include/gdm/system.h:466-558; periodicity: system.h:427-463).  On a
structured grid these collapse to:

* Dirichlet:  a boolean node mask + a value field.  Solving the eliminated
  system == running CG on the free subspace: zero constrained entries of
  the residual and of the operator output, and account for the
  inhomogeneity by  b := b - A g  with g the constrained-value extension.
* Periodicity along axis d: the last node plane is a copy of the first;
  operator application folds the last plane's contributions back onto the
  first (the distribute/compress pair of a ghosted vector).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid


@dataclasses.dataclass
class Constraints:
    grid: Grid
    dirichlet_mask: np.ndarray  # bool field: True = Dirichlet-constrained
    periodic_axes: tuple = ()

    @staticmethod
    def none(grid: Grid) -> "Constraints":
        return Constraints(grid, np.zeros(grid.field_shape, dtype=bool))

    @staticmethod
    def zero_boundary(grid: Grid, surfaces=None) -> "Constraints":
        return Constraints(grid, grid.boundary_mask(surfaces))

    @staticmethod
    def periodic(grid: Grid, axes=None) -> "Constraints":
        axes = tuple(range(grid.dim)) if axes is None else tuple(axes)
        mask = np.zeros(grid.field_shape, dtype=bool)
        return Constraints(grid, mask, periodic_axes=axes)

    @property
    def full_mask(self) -> np.ndarray:
        """All constrained (non-free) dofs: Dirichlet + periodic slaves."""
        mask = self.dirichlet_mask.copy()
        for d in self.periodic_axes:
            sl = [slice(None)] * (self.grid.dim + 1)
            sl[d] = self.grid.nodes[d] - 1
            mask[tuple(sl)] = True
        return mask

    # ------------------------------------------------------------------
    def distribute(self, u):
        """Set constrained entries from their masters (periodic copy,
        Dirichlet -> 0; use finalize_solution for inhomogeneous values)."""
        for d in self.periodic_axes:
            first = jax.lax.index_in_dim(u, 0, axis=d, keepdims=True)
            u = _set_plane(u, d, u.shape[d] - 1, first)
        if self.dirichlet_mask.any():
            u = jnp.where(jnp.asarray(self.dirichlet_mask), 0.0, u)
        return u

    def compress(self, y):
        """Fold constrained-row contributions onto their masters (adjoint of
        distribute), then zero the constrained rows."""
        for d in self.periodic_axes:
            last = jax.lax.index_in_dim(y, y.shape[d] - 1, axis=d, keepdims=True)
            first = jax.lax.index_in_dim(y, 0, axis=d, keepdims=True)
            y = _set_plane(y, d, 0, first + last)
        mask = self.full_mask
        if mask.any():
            y = jnp.where(jnp.asarray(mask), 0.0, y)
        return y

    def constrain_operator(self, apply_fn):
        """Wrap an operator so it acts on the free subspace."""

        def wrapped(u):
            return self.compress(apply_fn(self.distribute(u)))

        return wrapped

    def constrain_rhs(self, b, apply_fn=None, values=None):
        """Eliminate constraints from a load vector.

        values: field of inhomogeneous Dirichlet values (optional); then
        b := b - A g  with g the constrained extension of the values.
        """
        if values is not None and apply_fn is not None:
            g = jnp.where(jnp.asarray(self.dirichlet_mask), values, 0.0)
            b = b - apply_fn(g)
        return self.compress(b)

    def finalize_solution(self, x, values=None):
        """Insert constrained values into the solved free-dof vector."""
        for d in self.periodic_axes:
            first = jax.lax.index_in_dim(x, 0, axis=d, keepdims=True)
            x = _set_plane(x, d, x.shape[d] - 1, first)
        if values is None:
            if self.dirichlet_mask.any():
                x = jnp.where(jnp.asarray(self.dirichlet_mask), 0.0, x)
            return x
        return jnp.where(jnp.asarray(self.dirichlet_mask), values, x)


def _set_plane(u, axis, index, value):
    return jax.lax.dynamic_update_slice_in_dim(u, value, index, axis)
