"""3D cut domain-boundary faces (round-3 completion of the repo's
beyond-reference 3D scope; the reference's boundary-face loop is
dim-generic, wave/stiffness.h:261-330).

Checks the Saye-style 2D face quadrature (_face_quad_3d) against
analytic areas/moments of plane-cut cube faces, the uncut sphere
configuration, and an end-to-end 3D cut Poisson solve with BOTH
interface and domain-boundary Nitsche terms.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdm import solvers
from gdm.cut.geometry import INSIDE, OUTSIDE, CutGeometry
from gdm.cut.operators import CutOperators
from gdm.grid import Grid


def _plane_geo(n=4, c=1.5, degree=3):
    grid = Grid(degree, (n, n, n), (0.0,) * 3, (1.0,) * 3)
    ls = lambda m: m[0] + m[1] + m[2] - c  # noqa: E731
    return grid, CutGeometry.build(grid, ls, 1)


def test_plane_face_areas():
    """Sum of boundary-face weights per cube face vs the exact area of
    {x+y+z < 1.5} on each face of the unit cube."""
    grid, geo = _plane_geo()
    op = CutOperators(geo, INSIDE)
    assert len(op.b_win)
    w = np.asarray(op.b_w)
    nrm = np.asarray(op.b_normal)
    # faces at coordinate 0: {sum of other two < 1.5}: 1 - 0.5^2/2
    # faces at coordinate 1: {sum of other two < 0.5}: 0.5^2/2
    for d in range(3):
        lo = w[nrm[:, d] == -1.0].sum()
        hi = w[nrm[:, d] == 1.0].sum()
        np.testing.assert_allclose(lo, 1.0 - 0.125, rtol=1e-12)
        np.testing.assert_allclose(hi, 0.125, rtol=1e-12)
    np.testing.assert_allclose(w.sum(), 3.0, rtol=1e-12)


def test_plane_face_moment_vs_dense():
    """High-order moment integral over the cut boundary region vs a dense
    midpoint-sampling reference."""
    grid, geo = _plane_geo(n=3, c=1.4)
    op = CutOperators(geo, INSIDE)
    f = lambda x: x[..., 0] ** 2 * x[..., 1] + np.cos(x[..., 2])  # noqa: E731
    got = float(np.sum(np.asarray(op.b_w) * np.asarray(f(op.b_phys))))
    # dense reference over all 6 faces
    n = 1500
    m = (np.arange(n) + 0.5) / n
    A, B = np.meshgrid(m, m, indexing="ij")
    ref = 0.0
    for d in range(3):
        t1, t2 = [e for e in range(3) if e != d]
        for fc in (0.0, 1.0):
            pts = np.zeros((n * n, 3))
            pts[:, d] = fc
            pts[:, t1] = A.reshape(-1)
            pts[:, t2] = B.reshape(-1)
            inside = pts.sum(axis=1) < 1.4
            ref += f(pts[inside]).sum() / n**2
    np.testing.assert_allclose(got, ref, rtol=2e-3)


def test_sphere_outside_full_faces():
    """Sphere in [-1.21, 1.21]^3: every cube face lies in the OUTSIDE
    region (full uncut face quadrature), none in the INSIDE region."""
    grid = Grid(3, (4, 4, 4), (-1.21,) * 3, (1.21,) * 3)
    geo = CutGeometry.build(
        grid, lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0, 3)
    op_out = CutOperators(geo, OUTSIDE)
    np.testing.assert_allclose(
        np.asarray(op_out.b_w).sum(), 6 * 2.42**2, rtol=1e-12)
    op_in = CutOperators(geo, INSIDE)
    assert len(op_in.b_win) == 0


def test_cut_poisson_3d_domain_dbc():
    """3D cut Poisson on the inside of the tilted-plane region with
    Nitsche Dirichlet data on BOTH the embedded plane and the cut cube
    boundary; manufactured solution u = 1 - (x^2+y^2+z^2)/3, f = 2."""
    grid, geo = _plane_geo(n=6, c=1.5)
    op = CutOperators(geo, INSIDE)
    gn = 15.0
    exact = lambda pts, t: 1.0 - (pts**2).sum(-1) / 3.0  # noqa: E731
    rhs_fn = lambda pts, t: jnp.full(pts.shape[:-1], 2.0)  # noqa: E731
    from gdm.cut.stencil import assemble_stencil

    S = assemble_stencil(op, "stiff", 0.5, gn, with_nitsche=True,
                         with_bdry_nitsche=True)
    b = op.compute_rhs(jnp.zeros(grid.n_nodes), 0.0, False, rhs_fn=rhs_fn,
                       interface_dbc=exact, domain_dbc=exact,
                       nitsche_gamma=gn)
    K = 2 * (grid.degree + 1) + 1
    center = (K ** 3 - 1) // 2
    diag = jnp.asarray(
        np.asarray(S.band.reshape(grid.n_nodes, -1)[:, center]))
    x, info = solvers.cg(
        S.apply, b, precond=solvers.jacobi_preconditioner(diag),
        max_iter=4000, rel_tol=1e-12)
    l2, l1, linf = (float(v) for v in jax.jit(
        lambda u: op.error_norms(u, exact, 0.0))(x))
    # quadratic solution, p=3: exact up to Nitsche/quadrature roundoff
    assert l2 < 5e-8, l2
    assert linf < 5e-6, linf
