"""Goldens: tests/poly_01.output (GD 1D basis values on a 21-point grid
for p in {1,3,5,7,9}, per category) and tests/fe_02_gdm.output (|value|
and |derivatives| up to 4th order at the cell origin, interior category,
p=3)."""

import numpy as np

from gdm import basis

POLY = "/root/reference/tests/poly_01.output"

import pytest as _pytest
from conftest import reference_available

pytestmark = _pytest.mark.skipif(
    not reference_available(), reason="reference goldens not mounted")

FE02 = "/root/reference/tests/fe_02_gdm.output"


def test_poly_01_golden():
    rows = []
    with open(POLY) as f:
        for line in f:
            if line.strip():
                rows.append([float(x) for x in line.split()])
    i = 0
    pts = np.linspace(0.0, 1.0, 21)
    for p in (1, 3, 5, 7, 9):
        for cat in range(max(p, 1)):
            block = np.array(rows[i : i + 21])
            i += 21
            assert block.shape == (21, p + 1)
            mine = basis.shape_at(p, cat, pts)
            np.testing.assert_allclose(mine, block, atol=5e-4)  # %7.3f print
    assert i == len(rows)


def test_fe_02_golden():
    # first block: FE_GDM<1>(3), interior category (p/2 = 1), point 0;
    # columns: |value| |d/dx| |d2| |d3| |d4|
    vals = []
    with open(FE02) as f:
        lines = f.readlines()
    start = lines.index("FESystem<1>[FE_GDM<1>(3)]:\n") + 1
    for line in lines[start : start + 4]:
        vals.append([float(x) for x in line.split()])
    golden = np.array(vals)
    pts = np.array([0.0])
    mine = np.stack(
        [np.abs(basis.shape_at(3, 1, pts, deriv=d)[0]) for d in range(5)],
        axis=1,
    )
    np.testing.assert_allclose(mine, golden, atol=5e-4)
