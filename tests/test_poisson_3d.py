"""3D capability check (the reference core supports dim 1-3, e.g.
fe_01_gdm.cc runs dims 1-3): uncut 3D Poisson with manufactured solution
converges at order p+1 and the mass projection is exact for linears."""

import numpy as np
import jax
import jax.numpy as jnp

from gdm import operators, solvers
from gdm.functional import load_vector
from gdm.grid import Grid
from gdm.ops.tensor import l2_error
from gdm.problems import poisson


def test_poisson_3d_convergence():
    exact = lambda m, c: (
        np.sin(np.pi * m[0]) * np.sin(np.pi * m[1]) * np.sin(np.pi * m[2])
    )
    rhs = lambda m, c: 3 * np.pi**2 * exact(m, c)
    errs = []
    for n in (6, 12):
        g = Grid(3, (n, n, n), (0.0,) * 3, (1.0,) * 3)
        u, info = poisson.solve(g, rhs, rel_tol=1e-12)
        errs.append(l2_error(u, g, exact))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 3.5, (errs, rate)


def test_mass_projection_3d_exact_linear():
    g = Grid(3, (5, 6, 7), (0.0,) * 3, (1.0,) * 3)
    fn = lambda m, c: 1.0 + 2 * m[0] - m[1] + 0.5 * m[2]
    M = operators.mass(g)
    b = load_vector(g, fn)
    x, info = solvers.cg(
        M.apply, b,
        precond=solvers.jacobi_preconditioner(jnp.asarray(M.diagonal())),
        max_iter=400, rel_tol=1e-13,
    )
    assert l2_error(x, g, fn) < 1e-10
