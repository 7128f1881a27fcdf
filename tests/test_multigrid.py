"""Geometric multigrid: mesh-independent CG preconditioning for the GD
Laplacian (the TPU-native replacement for the reference's Trilinos AMG)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gdm import operators, solvers
from gdm.constraints import Constraints
from gdm.functional import load_vector
from gdm.grid import Grid
from gdm.multigrid import PoissonMultigrid, gd_prolong_axis, gd_restrict_axis, _gd_mid_table
from gdm.ops.tensor import l2_error
from gdm.problems import poisson

EXACT = lambda m, c: np.sin(np.pi * m[0]) * np.sin(np.pi * m[1])
RHS = lambda m, c: 2 * np.pi**2 * EXACT(m, c)


def test_transfer_adjointness():
    g = Grid(3, (8,), (0.0,), (1.0,))
    tab, off = _gd_mid_table(g, 0)
    rng = np.random.default_rng(0)
    uc = jnp.asarray(rng.normal(size=(9,)))
    yf = jnp.asarray(rng.normal(size=(17,)))
    lhs = float(jnp.vdot(gd_prolong_axis(uc, 0, tab, off, 17), yf))
    rhs = float(jnp.vdot(uc, gd_restrict_axis(yf, 0, tab, off)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-13)


@pytest.mark.parametrize("n", [32, 64, 128])
def test_mg_cg_mesh_independent(n):
    grid = Grid(3, (n, n), (0.0, 0.0), (1.0, 1.0))
    u, info = poisson.solve(grid, RHS, precondition="mg", rel_tol=1e-10)
    assert int(info["iterations"]) <= 9, int(info["iterations"])
    err = l2_error(u, grid, EXACT)
    ref = {32: 4.8e-07, 64: 3.0e-08, 128: 1.9e-09}[n]
    assert err < ref
