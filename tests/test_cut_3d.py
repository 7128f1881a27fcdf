"""3D cut-cell capability (beyond the reference, which only exercises
dims 1-2 for cut problems): sphere geometry accuracy and a 3D cut Poisson
solve with Nitsche boundary conditions."""

import numpy as np
import jax.numpy as jnp
import pytest

from gdm import solvers
from gdm.cut.geometry import INSIDE, CutGeometry
from gdm.cut.operators import CutOperators
from gdm.grid import Grid

LS = lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0


@pytest.fixture(scope="module")
def geo8():
    grid = Grid(3, (8, 8, 8), (-1.21,) * 3, (1.21,) * 3)
    return grid, CutGeometry.build(grid, LS, 3)


def test_sphere_volume_area(geo8):
    grid, geo = geo8
    hx, hy, hz = grid.h
    vol = float((geo.locations == INSIDE).sum()) * hx * hy * hz
    area = 0.0
    for q in geo.cut_quads:
        vol += q.inside_w.sum() * hx * hy * hz
        area += q.surface_w.sum()
        np.testing.assert_allclose(
            q.inside_w.sum() + q.outside_w.sum(), 1.0, rtol=1e-9)
    np.testing.assert_allclose(vol, 4 / 3 * np.pi, rtol=2e-5)
    np.testing.assert_allclose(area, 4 * np.pi, rtol=5e-4)
    # normals radially outward
    for cid, q in zip(geo.cut_cells, geo.cut_quads):
        i0 = cid % 8
        i1 = (cid // 8) % 8
        i2 = cid // 64
        for pt, nrm in zip(q.surface_pts, q.surface_normals):
            x = np.array([
                grid.lower[d] + (i + p) * grid.h[d]
                for d, (i, p) in enumerate(zip((i0, i1, i2), pt))
            ])
            assert np.dot(x / np.linalg.norm(x), nrm) > 0.99


def test_cut_poisson_3d(geo8):
    grid, geo = geo8
    op = CutOperators(geo, INSIDE)
    gn = 15.0
    rhs_fn = lambda pts, t: jnp.full(pts.shape[:-1], 4.0)
    g_fn = lambda pts, t: jnp.full(pts.shape[:-1], 1.0)
    exact = lambda pts, t: 1.0 - (2.0 / 3) * ((pts**2).sum(-1) - 1.0)
    b = op.compute_rhs(jnp.zeros(grid.n_nodes), 0.0, False, rhs_fn=rhs_fn,
                       interface_dbc=g_fn, nitsche_gamma=gn)
    diag = op.stiffness_diagonal(0.5, gn)
    x, info = solvers.cg(
        lambda v: op.stiffness_matrix_apply(v, 0.5, gn), b,
        precond=solvers.jacobi_preconditioner(jnp.asarray(diag)),
        max_iter=20000, rel_tol=1e-11)
    l2, _, _ = op.error_norms(x, exact, 0.0)
    assert float(l2) < 2e-5, float(l2)
