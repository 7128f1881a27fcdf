"""Golden: tests/elasticity_01_gdm.output ("error : 1.72676e-06").

2D vector elasticity a(v,u) = 2 (eps(v), eps(u)) on a 40^2 degree-3 grid,
zero Dirichlet BC, sympy-derived manufactured solution
(tests/elasticity_01_gdm.cc:34-74)."""

import numpy as np
import jax
import jax.numpy as jnp

from gdm import operators, solvers
from gdm.constraints import Constraints
from gdm.functional import load_vector
from gdm.grid import Grid
from gdm.ops.tensor import l2_error

A = np.pi


def exact(mesh, c):
    x, y = mesh
    if c == 0:
        return np.sin(A * x) ** 2 * np.cos(A * y) * np.sin(A * y)
    return -np.cos(A * x) * np.sin(A * x) * np.sin(A * y) ** 2


def rhs(mesh, c):
    x, y = mesh
    if c == 0:
        return 6 * A**2 * np.sin(A * x) ** 2 * np.sin(A * y) * np.cos(
            A * y
        ) - 2 * A**2 * np.sin(A * y) * np.cos(A * x) ** 2 * np.cos(A * y)
    return -6 * A**2 * np.sin(A * x) * np.sin(A * y) ** 2 * np.cos(
        A * x
    ) + 2 * A**2 * np.sin(A * x) * np.cos(A * x) * np.cos(A * y) ** 2


def test_elasticity_01_golden():
    grid = Grid(3, (40, 40), (0.0, 0.0), (1.0, 1.0), n_components=2)
    op = operators.elasticity(grid)
    cons = Constraints.zero_boundary(grid)
    apply_fn = cons.constrain_operator(op.apply)
    b = cons.constrain_rhs(load_vector(grid, rhs))
    diag = jnp.where(jnp.asarray(cons.full_mask), 1.0, jnp.asarray(op.diagonal()))

    @jax.jit
    def run(b, diag):
        x, info = solvers.cg(
            apply_fn, b, precond=solvers.jacobi_preconditioner(diag),
            max_iter=2000, rel_tol=1e-12,
        )
        return cons.finalize_solution(x), info

    u, info = run(b, diag)
    err = l2_error(u, grid, exact)
    np.testing.assert_allclose(err, 1.72676e-06, rtol=2e-3)
