"""Builders for uncut (full-domain) GD operators as SeparableOperators.

These correspond to the assembled sparse matrices of the reference's
uncut tests/prototypes (tests/poisson_01_gdm.cc, tests/mass_01_gdm.cc,
tests/elasticity_01_gdm.cc, prototypes/advection_01_gdm.cc) — but stay
matrix-free: Kronecker factors of banded 1D matrices.
"""

from __future__ import annotations

import numpy as np

from .grid import Grid
from .ops import SeparableOperator
from .ops1d import advection_1d, mass_1d, stiffness_1d


def _per_axis(grid: Grid, kind_per_axis, nq=None):
    bands = []
    for d in range(grid.dim):
        di, dj = kind_per_axis[d]
        from .ops1d import assemble_1d

        bands.append(assemble_1d(grid.degree, grid.cells[d], grid.h[d], di, dj, nq))
    return bands


def mass(grid: Grid, nq: int = None) -> SeparableOperator:
    """(v, u) per component."""
    bands = _per_axis(grid, [(0, 0)] * grid.dim, nq)
    terms = [(c, c, 1.0, bands) for c in range(grid.n_components)]
    return SeparableOperator.from_banded(grid, terms)


def laplace(grid: Grid, nq: int = None) -> SeparableOperator:
    """(grad v, grad u) per component."""
    terms = []
    for c in range(grid.n_components):
        for d in range(grid.dim):
            kinds = [(1, 1) if e == d else (0, 0) for e in range(grid.dim)]
            terms.append((c, c, 1.0, _per_axis(grid, kinds, nq)))
    return SeparableOperator.from_banded(grid, terms)


def advection(grid: Grid, velocity, nq: int = None) -> SeparableOperator:
    """(v, a . grad u) per component, constant velocity vector `a`."""
    terms = []
    for c in range(grid.n_components):
        for d in range(grid.dim):
            if velocity[d] == 0.0:
                continue
            kinds = [(0, 1) if e == d else (0, 0) for e in range(grid.dim)]
            terms.append((c, c, float(velocity[d]), _per_axis(grid, kinds, nq)))
    return SeparableOperator.from_banded(grid, terms)


def lumped_mass_inverse_diagonal(grid: Grid, nq: int = None):
    """Inverted row-sum (lumped) mass matrix as a diagonal field.

    Parity with GDM::MatrixCreator::create_lumped_mass_matrix
    (include/gdm/matrix_creator.h:64-117): diag[i] = 1 / sum_j M[i,j],
    computed matrix-free as 1 / (M @ ones)."""
    import jax.numpy as jnp

    M = mass(grid, nq)
    ones = jnp.ones(grid.field_shape)
    row_sums = M.apply(ones)
    return 1.0 / row_sums


def elasticity(grid: Grid, nq: int = None) -> SeparableOperator:
    """2 (eps(v), eps(u)) for a dim-component displacement field.

    Matches the symmetric-gradient form of tests/elasticity_01_gdm.cc:144-160:
    a(v,u) = sum_q 2 * eps(v):eps(u).
    Expanding (2D):  2 dxv0 dxu0 + 2 dyv1 dyu1
                     + (dyv0 + dxv1)(dyu0 + dxu1).
    In 3D the analogous expansion is generated below.
    """
    dim = grid.dim
    assert grid.n_components == dim
    terms = []
    # 2 * sum_i (d_i v_i)(d_i u_i)
    for i in range(dim):
        kinds = [(1, 1) if e == i else (0, 0) for e in range(dim)]
        terms.append((i, i, 2.0, _per_axis(grid, kinds, nq)))
    # cross terms: for i<j, (d_j v_i + d_i v_j)(d_j u_i + d_i u_j)
    for i in range(dim):
        for j in range(dim):
            if i == j:
                continue
            # (d_j v_i)(d_j u_i)
            kinds = [(1, 1) if e == j else (0, 0) for e in range(dim)]
            terms.append((i, i, 1.0, _per_axis(grid, kinds, nq)))
            # (d_j v_i)(d_i u_j): test derivative along j, trial along i
            kinds = []
            for e in range(dim):
                di = 1 if e == j else 0
                dj = 1 if e == i else 0
                kinds.append((di, dj))
            terms.append((i, j, 1.0, _per_axis(grid, kinds, nq)))
    return SeparableOperator.from_banded(grid, terms)
