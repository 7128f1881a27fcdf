"""Matrix-free geometric multigrid for uncut GD Poisson problems.

TPU-native replacement for the reference's black-box Trilinos AMG
preconditioner (applications/wave/include/gdm/wave/problem.h:461-469):
on a structured grid the mesh hierarchy is free (factor-2 coarsening of
the node lattice), transfers are per-axis linear interpolation stencils,
and every level's operator is the re-discretized banded GD Laplacian —
all expressible as the same stencil sweeps XLA already runs near the HBM
bound.  Used as a symmetric V-cycle preconditioner inside CG.

Prolongation P = the GD degree-p interpolant evaluated at coarse-cell
midpoints (one-sided stencils near boundaries); restriction is the
variational adjoint R = P^T (weak-form operators carry the h scaling, so
no finite-difference 1/2); weighted-Jacobi smoothing; dense direct solve
on the coarsest level.  All fields carry the trailing component axis
(shape grid.nodes + (1,)).  Requires power-of-two-friendly cell counts:
each level halves the per-axis cell count while it stays even.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import operators
from .constraints import Constraints
from .grid import Grid


def _gd_mid_table(grid: Grid, axis: int):
    """(n_cells, p+1) GD shape values at each cell's midpoint + window
    offsets — the degree-p prolongation stencil for the odd fine nodes."""
    from . import basis

    p = grid.degree
    cats = grid.categories(axis)
    T = basis.shape_table(p, np.array([0.5]), 0)[:, 0, :]  # (ncat, p+1)
    return T[cats], grid.offsets(axis)


def _realigned_band(table, offsets):
    """Re-key the (n_cells, p+1) windowed stencil T[c, k] (window start
    offsets[c]) as a cell-relative band Tb[c, j] with global index
    c + lo + j — turns the transfer applies into static slice FMAs
    (gather/scatter transfers measured ~500 us of a 766 us V-cycle at
    1024^2 on v5e; the banded form is a handful of shifted adds)."""
    table = np.asarray(table)
    offsets = np.asarray(offsets)
    n_cells, p1 = table.shape
    c = np.arange(n_cells)
    rel = offsets[:, None] + np.arange(p1)[None, :] - c[:, None]
    lo, hi = int(rel.min()), int(rel.max())
    Tb = np.zeros((n_cells, hi - lo + 1), table.dtype)
    Tb[c[:, None], rel - lo] = table
    return Tb, lo


def gd_prolong_axis(u, axis, table, offsets, n_fine_nodes):
    um = jnp.moveaxis(u, axis, 0)
    nc = um.shape[0]
    n_cells = nc - 1
    if n_fine_nodes != 2 * nc - 1:
        raise ValueError(
            f"gd_prolong_axis: n_fine_nodes={n_fine_nodes} must equal "
            f"2*n_coarse_nodes - 1 = {2 * nc - 1} (uniform 2:1 nested "
            f"refinement)")
    Tb, lo = _realigned_band(table, offsets)
    width = Tb.shape[1]
    hi = lo + width - 1
    pl_, pr = max(-lo, 0), max(hi, 0)
    up = jnp.pad(um, [(pl_, pr)] + [(0, 0)] * (um.ndim - 1))
    tail = (1,) * (um.ndim - 1)
    mid = jnp.zeros((n_cells,) + um.shape[1:], u.dtype)
    for j in range(width):
        coef = Tb[:, j]
        if not coef.any():
            continue
        seg = jax.lax.slice_in_dim(up, pl_ + lo + j,
                                   pl_ + lo + j + n_cells, axis=0)
        mid = mid + jnp.asarray(coef, u.dtype).reshape(
            (n_cells,) + tail) * seg
    # interleave: out[2i] = um[i], out[2c+1] = mid[c]
    body = jnp.stack([um[:n_cells], mid], axis=1).reshape(
        (2 * n_cells,) + um.shape[1:])
    out = jnp.concatenate([body, um[n_cells:]], axis=0)
    return jnp.moveaxis(out, 0, axis)


def gd_restrict_axis(y, axis, table, offsets):
    """Variational restriction R = P^T (weak-form operators scale like
    integrals, so unlike finite-difference full weighting there is NO 1/2:
    P^T A_f P ~= the rediscretized coarse operator, verified numerically)."""
    ym = jnp.moveaxis(y, axis, 0)
    nf = ym.shape[0]
    even = ym[0:nf:2]                      # (nc, ...)
    odd = ym[1:nf:2]                       # (n_cells, ...)
    n_cells = odd.shape[0]
    nc = n_cells + 1
    Tb, lo = _realigned_band(table, offsets)
    width = Tb.shape[1]
    hi = lo + width - 1
    pl_ = max(-lo, 0)
    pr = max(0, n_cells - 1 + hi - (nc - 1))
    tail = (1,) * (odd.ndim - 1)
    acc = jnp.pad(even, [(pl_, pr)] + [(0, 0)] * (odd.ndim - 1))
    for j in range(width):
        coef = Tb[:, j]
        if not coef.any():
            continue
        w = jnp.asarray(coef, y.dtype).reshape((n_cells,) + tail) * odd
        s = pl_ + lo + j
        acc = acc.at[s : s + n_cells].add(w)
    out = acc[pl_ : pl_ + nc] if (pl_ or pr) else acc
    return jnp.moveaxis(out, 0, axis)


class PoissonMultigrid:
    """Symmetric V-cycle preconditioner for the zero-BC GD Laplacian."""

    def __init__(self, grid: Grid, n_smooth: int = 2, omega: float = 0.6,
                 coarsest: int = 8, use_pallas: str = None):
        assert grid.n_components == 1
        from .ops.fast import best_field_laplace

        self.levels = []
        g = grid
        while True:
            A = operators.laplace(g)
            cons = Constraints.zero_boundary(g)
            diag = np.where(cons.full_mask, 1.0, A.diagonal())
            # Large levels ride the fused Pallas kernels on TPU (the
            # smoother/residual applies dominate V-cycle cost and the
            # preconditioner only needs a FIXED linear operator, so the
            # bf16x3 accuracy class is harmless); small levels and every
            # non-TPU platform keep the exact XLA apply.
            base_apply, _ = best_field_laplace(g, use_pallas)
            self.levels.append({
                "grid": g,
                "apply": cons.constrain_operator(base_apply),
                "apply_exact": cons.constrain_operator(A.apply),
                "mask": jnp.asarray(cons.full_mask),
                "inv_diag": jnp.asarray(1.0 / diag),
                "mid": [_gd_mid_table(g, d) for d in range(g.dim)],
            })
            if min(g.cells) // 2 < coarsest or any(c % 2 for c in g.cells):
                break
            g = Grid(g.degree, tuple(c // 2 for c in g.cells), g.lower,
                     g.upper, 1)
        if len(self.levels) == 1:
            raise ValueError(
                "PoissonMultigrid: grid %s cannot be coarsened (odd or "
                "too-small cell count); use even cell counts >= %d or a "
                "Jacobi preconditioner" % (grid.cells, 2 * coarsest))
        # dense inverse on the coarsest level
        lvl = self.levels[-1]
        gc = lvl["grid"]
        n = gc.n_dofs
        eye = jnp.eye(n).reshape((n,) + gc.field_shape)
        Ad = np.array(jax.vmap(lvl["apply_exact"])(eye).reshape(n, n)).T
        mask = np.asarray(lvl["mask"]).reshape(-1)
        Ad[mask, :] = 0.0
        Ad[:, mask] = 0.0
        Ad[np.where(mask)[0], np.where(mask)[0]] = 1.0
        self.coarse_inv = jnp.asarray(np.linalg.inv(Ad))
        self.n_smooth = n_smooth
        self.omega = omega

    def _smooth(self, lvl, u, b, iters):
        for _ in range(iters):
            r = b - lvl["apply"](u)
            u = u + self.omega * lvl["inv_diag"] * r
        return u

    def _vcycle(self, k, b):
        lvl = self.levels[k]
        if k == len(self.levels) - 1:
            xc = jnp.matmul(self.coarse_inv, b.reshape(-1),
                            precision=jax.lax.Precision.HIGHEST)
            return xc.reshape(b.shape)
        u = self._smooth(lvl, jnp.zeros_like(b), b, self.n_smooth)
        r = b - lvl["apply"](u)
        dim = lvl["grid"].dim
        coarse = self.levels[k + 1]
        rc = r
        for d in range(dim):
            tab, off = coarse["mid"][d]
            rc = gd_restrict_axis(rc, d, tab, off)
        rc = jnp.where(coarse["mask"], 0.0, rc)
        ec = self._vcycle(k + 1, rc)
        e = ec
        for d in range(dim):
            tab, off = coarse["mid"][d]
            e = gd_prolong_axis(e, d, tab, off, lvl["grid"].nodes[d])
        e = jnp.where(lvl["mask"], 0.0, e)
        return self._smooth(lvl, u + e, b, self.n_smooth)

    def precondition(self, r):
        """r: field of shape grid.nodes + (1,) (zero on constrained dofs)."""
        return self._vcycle(0, r)
