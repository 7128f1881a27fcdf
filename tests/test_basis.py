import numpy as np
import pytest

from gdm import basis


# A few rows transcribed from the reference coefficient tables
# (/root/reference/include/gdm/fe.h:63-120), descending powers.
FE_H_TABLE = {
    # (p, category, shape_index): descending coefficients
    (1, 0, 0): [-1, 1],
    (1, 0, 1): [1, 0],
    (3, 0, 0): [-1 / 6, 1, -11 / 6, 1],
    (3, 0, 1): [1 / 2, -5 / 2, 3, 0],
    (3, 0, 2): [-1 / 2, 2, -3 / 2, 0],
    (3, 0, 3): [1 / 6, -1 / 2, 1 / 3, 0],
    (3, 1, 0): [-1 / 6, 1 / 2, -1 / 3, 0],
    (3, 1, 1): [1 / 2, -1, -1 / 2, 1],
    (3, 2, 3): [1 / 6, 1 / 2, 1 / 3, 0],
    (5, 0, 0): [-1 / 120, 1 / 8, -17 / 24, 15 / 8, -137 / 60, 1],
    (5, 1, 1): [1 / 24, -3 / 8, 25 / 24, -5 / 8, -13 / 12, 1],
    (5, 2, 2): [-1 / 12, 1 / 4, 5 / 12, -5 / 4, -1 / 3, 1],
}


@pytest.mark.parametrize("key", sorted(FE_H_TABLE))
def test_matches_reference_tables(key):
    p, cat, m = key
    coeffs = basis.category_coefficients(p, cat)[m]  # ascending
    expected = np.array(FE_H_TABLE[key][::-1], dtype=float)
    np.testing.assert_allclose(coeffs, expected, atol=1e-14)


@pytest.mark.parametrize("p", basis.SUPPORTED_DEGREES)
def test_nodal_property(p):
    # shape m of category c must equal 1 at stencil node m and 0 at others;
    # stencil node j sits at reference coordinate j - c.
    for c in range(max(p, 1)):
        pts = np.arange(p + 1, dtype=float) - c
        vals = basis.shape_at(p, c, pts)  # (p+1 pts, p+1 fns)
        np.testing.assert_allclose(vals, np.eye(p + 1), atol=1e-9)


@pytest.mark.parametrize("p", basis.SUPPORTED_DEGREES)
def test_polynomial_reproduction(p):
    # sum_m x_m^k phi_m(xi) == (c + xi)^k for k <= p (exactness of degree p)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, 7)
    for c in range(max(p, 1)):
        vals = basis.shape_at(p, c, pts)  # (q, m)
        nodes = np.arange(p + 1, dtype=float)
        for k in range(p + 1):
            got = vals @ nodes**k
            np.testing.assert_allclose(got, (pts + c) ** k, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("p", basis.SUPPORTED_DEGREES)
def test_derivative_consistency(p):
    pts = np.linspace(0.05, 0.95, 5)
    eps = 1e-6
    for c in range(max(p, 1)):
        d = basis.shape_at(p, c, pts, deriv=1)
        fd = (basis.shape_at(p, c, pts + eps) - basis.shape_at(p, c, pts - eps)) / (
            2 * eps
        )
        np.testing.assert_allclose(d, fd, rtol=1e-5, atol=1e-5)
