"""Golden-output test vs reference tests/poisson_01_gdm.output:
1D Poisson, 10 cells, f=1, zero BC, degrees 1,3,5,7,9.

The printed solution vector (11 nodal values) and the L2 error against
u(x) = 1/8 - (x-1/2)^2/2 must be reproduced."""

import re

import numpy as np
import pytest

from gdm.grid import Grid
from gdm.ops.tensor import l2_error
from gdm.problems import poisson

GOLDEN = "/root/reference/tests/poisson_01_gdm.output"

import pytest as _pytest
from conftest import reference_available

pytestmark = _pytest.mark.skipif(
    not reference_available(), reason="reference goldens not mounted")



def parse_golden():
    """Returns list of (solution values, l2 error) per degree block.

    Golden block structure: CG iteration count, blank line, the 11
    solution values one per line, then a "  t  err" line."""
    with open(GOLDEN) as f:
        txt = f.read()
    blocks = re.findall(
        r"^(\d+)\n\n((?:[-0-9.e+]+\n)+) ([0-9.]+)\s+([0-9.]+)\n",
        txt,
        re.M,
    )
    out = []
    for iters, valblock, t, err in blocks:
        out.append((np.array([float(v) for v in valblock.split()]), float(err)))
    return out


@pytest.mark.parametrize("idx,p", list(enumerate([1, 3, 5, 7, 9])))
def test_poisson_01_golden(idx, p):
    golden = parse_golden()
    assert len(golden) == 5, "golden parse failed"
    gsol, gerr = golden[idx]

    grid = Grid(p, (10,), (0.0,), (1.0,))
    u, info = poisson.solve(grid, lambda mesh, c: np.ones_like(mesh[0]))
    sol = grid.to_reference_vector(np.asarray(u))
    assert sol.shape == gsol.shape
    np.testing.assert_allclose(sol, gsol, atol=2e-6)

    exact = lambda mesh, c: 0.125 - 0.5 * (mesh[0] - 0.5) ** 2
    err = l2_error(u, grid, exact)
    if p == 1:
        np.testing.assert_allclose(err, gerr, rtol=1e-4)
    else:
        assert err < 5e-9, err
