"""2D Poisson across degrees p in {5, 7, 9} (degree coverage beyond the
golden tests): order-(p+1) convergence for p=5, and near-round-off
accuracy at modest resolution for p in {7, 9}."""

import numpy as np
import pytest

from gdm.grid import Grid
from gdm.ops.tensor import l2_error
from gdm.problems import poisson

EXACT = lambda m, c: np.sin(np.pi * m[0]) * np.sin(np.pi * m[1])
RHS = lambda m, c: 2 * np.pi**2 * EXACT(m, c)


def test_p5_convergence_rate():
    errs = []
    for n in (6, 12):
        grid = Grid(5, (n, n), (0.0, 0.0), (1.0, 1.0))
        u, _ = poisson.solve(grid, RHS, rel_tol=1e-13)
        errs.append(l2_error(u, grid, EXACT))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 5.5, (errs, rate)


@pytest.mark.parametrize("p,tol", [(7, 5e-8), (9, 2e-9)])
def test_high_degree_accuracy(p, tol):
    grid = Grid(p, (12, 12), (0.0, 0.0), (1.0, 1.0))
    u, _ = poisson.solve(grid, RHS, rel_tol=1e-13)
    err = l2_error(u, grid, EXACT)
    assert err < tol, (p, err)
