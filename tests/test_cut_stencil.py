"""Stencil-band assembled form of the cut operators: machine parity with
the matrix-free applies (mass, stiffness with Nitsche, RHS impl-part
decomposition)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gdm.cut.geometry import INSIDE, OUTSIDE, CutGeometry
from gdm.cut.operators import CutOperators
from gdm.cut.stencil import assemble_stencil
from gdm.grid import Grid


@pytest.mark.parametrize("dim,cells", [(1, (40,)), (2, (24, 24))])
@pytest.mark.parametrize("location", [INSIDE, OUTSIDE])
def test_stencil_matches_matrix_free(dim, cells, location):
    grid = Grid(3, cells, (-1.21,) * dim, (1.21,) * dim)
    geo = CutGeometry.build(
        grid, lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0, 3)
    op = CutOperators(geo, location)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=grid.n_nodes))
    M = assemble_stencil(op, "mass", 0.75)
    np.testing.assert_allclose(
        np.asarray(M.apply(u)), np.asarray(op.mass_apply(u, 0.75)),
        atol=1e-12)
    S = assemble_stencil(op, "stiff", 1.5, 15.0, with_nitsche=True)
    np.testing.assert_allclose(
        np.asarray(S.apply(u)),
        np.asarray(op.stiffness_matrix_apply(u, 1.5, 15.0)), atol=1e-11)


def test_rhs_impl_decomposition():
    """compute_rhs(impl=True) == forcing-only part - stencil(impl part)."""
    grid = Grid(3, (24, 24), (-1.21, -1.21), (1.21, 1.21))
    geo = CutGeometry.build(
        grid, lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0, 3)
    op = CutOperators(geo, INSIDE)
    g = lambda pts, t: jnp.asarray((pts**2).sum(-1)) * (1.0 + t)
    f = lambda pts, t: jnp.asarray(pts[..., 0]) * (1.0 + t)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=grid.n_nodes))
    full = op.compute_rhs(u, 0.3, True, rhs_fn=f, interface_dbc=g,
                          gamma_A=1.5, nitsche_gamma=15.0)
    forcing = op.compute_rhs(u, 0.3, False, rhs_fn=f, interface_dbc=g,
                             gamma_A=1.5, nitsche_gamma=15.0)
    S = assemble_stencil(op, "stiff", 1.5, 15.0, with_nitsche=True,
                         gp_power=1, inactive_identity=False)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(forcing - S.apply(u)), atol=1e-11)
