"""Spectral analysis tooling (capability parity with
applications/wave/wave-ev.cc): condition numbers of the cut mass /
stiffness matrices, generalized max eigenvalue of S w.r.t. M (CFL
estimation), and matrix dumps — how the reference derived its
ghost-penalty/CFL constants.

Matrices are materialized densely by applying the matrix-free operators
to unit vectors (the grids used for spectral analysis are small)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..cut.geometry import INSIDE, CutGeometry
from ..cut.operators import CutOperators
from ..grid import Grid


def densify(apply_fn, n: int) -> np.ndarray:
    eye = np.eye(n)
    cols = jax.vmap(lambda v: apply_fn(v), in_axes=1, out_axes=1)(
        jnp.asarray(eye)
    )
    return np.asarray(cols)


def condition_number(M: np.ndarray, rescale: bool = False,
                     drop_ones: bool = True):
    """Reference compute_condition_number (wave-ev.cc:13-56)."""
    A = M.copy()
    if rescale:
        d = np.diag(A).copy()
        dinv = np.where(d == 0.0, 0.0, 1.0 / d)
        A = dinv[:, None] * A
    ev = np.sort(np.linalg.eigvals(A).real)
    if drop_ones:
        ev = ev[~np.isclose(ev, 1.0, rtol=0, atol=1e-12)]
    return ev[-1] / ev[0], ev


def max_generalized_eigenvalue(S: np.ndarray, M: np.ndarray):
    """max ev of S x = lambda M x (wave-ev.cc:60-89)."""
    import scipy.linalg

    ev = np.sort(scipy.linalg.eigh(S, M, eigvals_only=True))
    return ev[-1], ev


def write_matrix(M: np.ndarray, file_name: str, binary: bool = True,
                 tol: float = 0.0):
    """Triplet dump (row, col, value), ascii or binary (uint32, uint32,
    float64 records), matching wave-ev.cc:93-127."""
    rows, cols = np.nonzero(np.abs(M) > tol)
    if binary:
        with open(file_name, "wb") as f:
            for r, c in zip(rows, cols):
                f.write(np.uint32(r).tobytes())
                f.write(np.uint32(c).tobytes())
                f.write(np.float64(M[r, c]).tobytes())
    else:
        with open(file_name, "w") as f:
            for r, c in zip(rows, cols):
                f.write(f"{r} {c} {M[r, c]}\n")


def build_ev_operators(fe_degree: int = 5, n_subdivisions_1D: int = 100,
                       radius: float = 1.0, alpha: float = -1.0,
                       align: bool = False, gp_scale: float = 1.0,
                       dim: int = 1):
    """Replicates wave-ev's parameter derivation (wave-ev.cc:146-297):
    --alpha places the interface at fraction alpha inside its cell by
    adjusting the radius; --alpha with --align snaps the interface onto
    the domain boundary nodes (the reference achieves this with a
    degenerate clamping mapping + radius=2.0 so nothing is cut; here the
    equivalent is the shrunk body-fitted domain with an all-inside level
    set)."""
    h = 1.21 / (n_subdivisions_1D / 2)
    if (alpha >= 0.0) and align:
        # body-fitted reference point: domain shrinks to the cells covered
        # by the (snapped) radius, and nothing is cut
        n_rel = int(2 * np.floor(radius / h))
        radius = 2.0  # level set strictly negative on the domain
    elif alpha >= 0.0:
        n_rel = int(2 * np.floor(radius / h))
        radius = h * (n_rel / 2 - alpha)
        n_rel = n_subdivisions_1D
    else:
        n_rel = n_subdivisions_1D
    left = -1.21 / n_subdivisions_1D * n_rel
    right = +1.21 / n_subdivisions_1D * n_rel
    grid = Grid(fe_degree, (n_rel,) * dim, (left,) * dim, (right,) * dim)
    geo = CutGeometry.build(
        grid,
        lambda m: np.sqrt(sum(np.asarray(x) ** 2 for x in m)) - radius,
        fe_degree,
    )
    op = CutOperators(geo, INSIDE)
    gm = gp_scale * 0.25 * np.sqrt(3.0)
    ga = gp_scale * 0.50 * np.sqrt(3.0)
    N = grid.n_nodes
    M = densify(lambda v: op.mass_apply(v, gm), N)
    S = densify(
        lambda v: op.stiffness_matrix_apply(v, ga, 5.0 * fe_degree,
                                            with_nitsche=False), N)
    return grid, op, M, S
