"""Tensor-product (sum-factorization) GD operators in JAX.

All uncut GD operators factor over axes; the device-side work is
width-(2p+1) stencil sweeps along each grid axis plus small per-axis
contractions.  This module provides:

* ``apply_banded``       - banded 1D matvec along one axis of a field
* ``SeparableOperator``  - sums of Kronecker terms (mass, Laplace,
                           advection, elasticity blocks, ...)
* ``evaluate_at_quad``   - field -> values/derivatives on the tensor
                           quadrature grid (sum-factorized gather)
* ``integrate_to_nodes`` - adjoint: quadrature-grid integrand -> nodal
                           load vector (the (v, f) functional)

Reference counterparts: the cell loops in tests/poisson_01_gdm.cc:123-161
and GDM::MatrixCreator (include/gdm/matrix_creator.h) — collapsed here to
structured tensor algebra instead of per-cell FEValues.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import basis, quadrature
from ..grid import Grid
from ..ops1d import Banded1D


def apply_banded(u, band, axis: int):
    """Apply a banded 1D matrix along `axis` of field `u`.

    band: (N, 2p+1) with band[a,k] = entry (a, a+k-p).
    """
    W = band.shape[1]
    p = (W - 1) // 2
    N = u.shape[axis]
    pad = [(0, 0)] * u.ndim
    pad[axis] = (p, p)
    up = jnp.pad(u, pad)
    y = jnp.zeros_like(u)
    bshape = [1] * u.ndim
    bshape[axis] = N
    for k in range(W):
        sl = [slice(None)] * u.ndim
        sl[axis] = slice(k, k + N)
        y = y + band[:, k].reshape(bshape) * up[tuple(sl)]
    return y


@dataclasses.dataclass
class SeparableOperator:
    """Operator  A = sum_t coeff_t * (B_t^0 (x) ... (x) B_t^{d-1})  acting on
    fields of shape (N_0, ..., N_{d-1}, C) with an optional component map
    (ci, cj): term reads component cj, accumulates into component ci.
    """

    grid: Grid
    # each term: (ci, cj, coeff, tuple of band arrays (one per axis))
    terms: list

    @staticmethod
    def from_banded(grid: Grid, terms):
        """terms: list of (ci, cj, coeff, [Banded1D per axis])."""
        conv = [
            (ci, cj, float(co), tuple(jnp.asarray(b.band) for b in bs))
            for (ci, cj, co, bs) in terms
        ]
        return SeparableOperator(grid, conv)

    def apply(self, u):
        dim = self.grid.dim
        C = self.grid.n_components
        out = [jnp.zeros(u.shape[:-1]) for _ in range(C)]
        for ci, cj, coeff, bands in self.terms:
            v = u[..., cj]
            for d in range(dim):
                v = apply_banded(v, bands[d], d)
            out[ci] = out[ci] + coeff * v
        return jnp.stack(out, axis=-1)

    def __call__(self, u):
        return self.apply(u)

    def diagonal(self) -> np.ndarray:
        """Matrix diagonal as a field (for Jacobi preconditioning)."""
        C = self.grid.n_components
        diag = np.zeros(self.grid.field_shape)
        for ci, cj, coeff, bands in self.terms:
            if ci != cj:
                continue
            ds = [np.asarray(b)[:, (b.shape[1] - 1) // 2] for b in bands]
            term = ds[0]
            for dnext in ds[1:]:
                term = np.multiply.outer(term, dnext)
            diag[..., ci] += coeff * term
        return diag

    def dense(self) -> np.ndarray:
        """Materialize as dense (n_dofs, n_dofs) in reference dof order.

        Only for small grids (tests, eigenvalue tooling).
        """
        g = self.grid
        n = g.n_dofs
        A = np.zeros((n, n))
        eye = np.eye(n)
        cols = []
        for j in range(n):
            u = g.from_reference_vector(eye[:, j])
            y = np.asarray(self.apply(jnp.asarray(u)))
            cols.append(g.to_reference_vector(y))
        return np.stack(cols, axis=1)


# ---------------------------------------------------------------------------
# evaluate / integrate (sum factorization)
# ---------------------------------------------------------------------------


def quad_points_1d(grid: Grid, axis: int, nq: int = None) -> np.ndarray:
    """Physical quadrature point coordinates along one axis, shape
    (n_cells*nq,), cell-major."""
    p = grid.degree
    nq = nq if nq is not None else p + 1
    x, _ = quadrature.gauss(nq)
    lo = grid.cell_lower_1d(axis)
    return (lo[:, None] + x[None, :] * grid.h[axis]).reshape(-1)


def _axis_tables(grid: Grid, axis: int, deriv: int, nq: int):
    """Per-cell shape tables along an axis: (n_cells, nq, p+1) float64."""
    p = grid.degree
    x, w = quadrature.gauss(nq)
    T = basis.shape_table(p, x, deriv)  # (ncat, q, m)
    cat = grid.categories(axis)
    scale = grid.h[axis] ** (-deriv)
    return T[cat] * scale, w


def evaluate_at_quad(u, grid: Grid, derivs, nq: int = None):
    """Evaluate a field (or its mixed derivative) at the tensor quadrature
    grid.

    derivs: tuple of per-axis derivative orders.
    Returns array of shape (n_cells_0*nq, ..., n_cells_{d-1}*nq, C).
    """
    p = grid.degree
    nq = nq if nq is not None else p + 1
    dim = grid.dim
    v = u
    for d in range(dim):
        T, _ = _axis_tables(grid, d, derivs[d], nq)  # (n_d, q, m)
        off = grid.offsets(d)
        win = off[:, None] + np.arange(p + 1)[None, :]  # (n_d, m)
        # gather windows along axis d: (..., n_d, m, ...)
        vw = jnp.take(v, jnp.asarray(win.reshape(-1)), axis=d)
        new_shape = v.shape[:d] + (win.shape[0], win.shape[1]) + v.shape[d + 1 :]
        vw = vw.reshape(new_shape)
        # contract m with table -> (..., n_d, q, ...) -> merge to n_d*q
        vq = _contract_axis(vw, jnp.asarray(T), d)
        v = vq.reshape(v.shape[:d] + (win.shape[0] * nq,) + v.shape[d + 1 :])
    return v


def _contract_axis(vw, T, d):
    """vw: (..., n, m, ...axis d,d+1...), T: (n, q, m) -> (..., n, q, ...)."""
    # move axes (d, d+1) -> use tensordot via moveaxis
    vw_m = jnp.moveaxis(vw, (d, d + 1), (0, 1))  # (n, m, ...)
    out = jnp.einsum("nqm,nm...->nq...", T, vw_m)
    return jnp.moveaxis(out, (0, 1), (d, d + 1))


def integrate_to_nodes(f_quad, grid: Grid, derivs=None, nq: int = None):
    """Adjoint of evaluate_at_quad: integrate `f_quad` (values on the tensor
    quadrature grid, INCLUDING the user's integrand but NOT the quadrature
    weights/JxW) against test functions; returns nodal vector field.

    Computes  F_a = sum_q f(x_q) phi_a^(derivs)(x_q) w_q prod_d h_d.
    """
    p = grid.degree
    nq = nq if nq is not None else p + 1
    dim = grid.dim
    derivs = derivs if derivs is not None else (0,) * dim
    v = f_quad
    for d in range(dim):
        T, w = _axis_tables(grid, d, derivs[d], nq)
        Tw = T * (w[None, :, None] * grid.h[d])  # fold JxW of this axis
        off = grid.offsets(d)
        n_d = grid.cells[d]
        N_d = grid.nodes[d]
        # reshape axis d: (n_d*nq) -> (n_d, nq)
        v2 = v.reshape(v.shape[:d] + (n_d, nq) + v.shape[d + 1 :])
        # contract q -> m: (..., n_d, m, ...)
        vw_m = jnp.moveaxis(v2, (d, d + 1), (0, 1))
        contrib = jnp.einsum("nqm,nq...->nm...", jnp.asarray(Tw), vw_m)
        # scatter-add windows to nodes along the leading axis
        win = (off[:, None] + np.arange(p + 1)[None, :]).reshape(-1)
        contrib_flat = contrib.reshape((n_d * (p + 1),) + contrib.shape[2:])
        nodes = jnp.zeros((N_d,) + contrib_flat.shape[1:], dtype=v.dtype)
        nodes = nodes.at[jnp.asarray(win)].add(contrib_flat)
        v = jnp.moveaxis(nodes, 0, d)
    return v


def l2_error_squared_per_cell(u, grid: Grid, exact_fn, t=None, nq: int = None):
    """Per-cell squared L2 error vs an analytic function, over full cells.

    Equivalent of GDM::VectorTools::integrate_difference
    (include/gdm/vector_tools.h:25-86).  Returns (n_cells_0, ..., n_cells_d-1).
    """
    p = grid.degree
    nq = nq if nq is not None else p + 1
    dim = grid.dim
    uq = evaluate_at_quad(u, grid, (0,) * dim, nq)  # (..., C)
    pts = [quad_points_1d(grid, d, nq) for d in range(dim)]
    mesh = np.meshgrid(*pts, indexing="ij")
    _, w = quadrature.gauss(nq)
    jxw = np.ones(())
    for d in range(dim):
        shape = [1] * dim
        shape[d] = grid.cells[d] * nq
        jxw = jxw * np.tile(w * grid.h[d], grid.cells[d]).reshape(shape)
    err2 = jnp.zeros(uq.shape[:-1])
    for c in range(grid.n_components):
        ex = exact_fn(mesh, c) if t is None else exact_fn(mesh, c, t)
        err2 = err2 + (uq[..., c] - jnp.asarray(ex)) ** 2
    err2 = err2 * jnp.asarray(jxw)
    # sum within cells
    for d in range(dim):
        err2 = err2.reshape(
            err2.shape[:d] + (grid.cells[d], nq) + err2.shape[d + 1 :]
        ).sum(axis=d + 1)
    return err2


def l2_error(u, grid: Grid, exact_fn, t=None, nq: int = None) -> float:
    return float(
        jnp.sqrt(jnp.sum(l2_error_squared_per_cell(u, grid, exact_fn, t, nq)))
    )
