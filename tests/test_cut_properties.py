"""Property tests for the cut operators: symmetry, SPD-ness, and
h-convergence of the cut Poisson solver (guards the machinery beyond the
fixed goldens)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gdm import solvers
from gdm.cut.geometry import INSIDE, CutGeometry
from gdm.cut.operators import CutOperators
from gdm.grid import Grid


def _dense(apply_fn, n):
    eye = jnp.eye(n)
    return np.asarray(jax.vmap(apply_fn, in_axes=1, out_axes=1)(eye))


@pytest.fixture(scope="module")
def small_cut():
    grid = Grid(3, (12, 12), (-1.21, -1.21), (1.21, 1.21))
    geo = CutGeometry.build(
        grid, lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0, 3
    )
    return grid, CutOperators(geo, INSIDE)


def test_cut_mass_spd(small_cut):
    grid, op = small_cut
    M = _dense(lambda v: op.mass_apply(v, 0.75), grid.n_nodes)
    np.testing.assert_allclose(M, M.T, atol=1e-12)
    ev = np.linalg.eigvalsh(M)
    assert ev.min() > 0, ev.min()


def test_cut_stiffness_symmetric_and_semidefinite(small_cut):
    grid, op = small_cut
    S = _dense(
        lambda v: op.stiffness_matrix_apply(v, 1.5, 15.0), grid.n_nodes
    )
    np.testing.assert_allclose(S, S.T, atol=1e-11)
    ev = np.linalg.eigvalsh(S)
    # Nitsche-stabilized: positive definite for gamma large enough
    assert ev.min() > 0, ev.min()


def test_cut_poisson_convergence_order():
    """step85 setup at increasing resolution: L2 error ~ h^4 until the
    level-set geometry error floor."""
    errs = []
    for n in (10, 20, 40):
        grid = Grid(3, (n, n), (-1.21, -1.21), (1.21, 1.21))
        geo = CutGeometry.build(
            grid, lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0, 3
        )
        op = CutOperators(geo, INSIDE)
        gn = 15.0
        rhs_fn = lambda pts, t: jnp.full(pts.shape[:-1], 4.0)
        g_fn = lambda pts, t: jnp.full(pts.shape[:-1], 1.0)
        exact = lambda pts, t: 1.0 - ((pts**2).sum(-1) - 1.0)
        diag = op.stiffness_diagonal(0.5, gn, with_nitsche=False)
        b = op.compute_rhs(jnp.zeros(grid.n_nodes), 0.0, False,
                           rhs_fn=rhs_fn, interface_dbc=g_fn,
                           nitsche_gamma=gn)
        x, _ = solvers.cg(
            lambda v: op.stiffness_matrix_apply(v, 0.5, gn), b,
            precond=solvers.jacobi_preconditioner(jnp.asarray(diag)),
            max_iter=20000, rel_tol=1e-12,
        )
        errs.append(float(op.error_norms(x, exact, 0.0)[0]))
    r1 = np.log2(errs[0] / errs[1])
    r2 = np.log2(errs[1] / errs[2])
    # exact solution is quadratic, so the error is geometry/Nitsche-driven;
    # require at least ~3rd-order decay across the sweep
    assert r1 > 2.5 and r2 > 2.5, (errs, r1, r2)
