"""RK stability-region boundary (parity with reference
scripts/rk_stability.py, reimplemented numerically without sympy).

Builds the stability function R(z) = 1 + z b^T (I - z A)^{-1} 1 for the
same order-1..6 explicit tableaux the reference hardcodes, and prints the
Re/Im parts of R(i y) / the |R(z)| = 1 boundary for plotting — used to
pick CFL constants for the GD semidiscretizations.

Usage: python scripts/rk_stability.py [degree]
"""

import sys

import numpy as np

TABLEAUX = {
    1: (np.zeros((1, 1)), np.array([1.0])),
    2: (np.array([[0, 0], [0.5, 0]]), np.array([0.0, 1.0])),
    3: (
        np.array([[0, 0, 0], [0.5, 0, 0], [-1.0, 2.0, 0]]),
        np.array([1 / 6, 2 / 3, 1 / 6]),
    ),
    4: (
        np.array(
            [[0, 0, 0, 0], [0.5, 0, 0, 0], [0, 0.5, 0, 0], [0, 0, 1.0, 0]]
        ),
        np.array([1 / 6, 1 / 3, 1 / 3, 1 / 6]),
    ),
    5: (
        np.array(
            [
                [0, 0, 0, 0, 0, 0],
                [1 / 4, 0, 0, 0, 0, 0],
                [1 / 8, 1 / 8, 0, 0, 0, 0],
                [0, -1 / 2, 1, 0, 0, 0],
                [3 / 16, 0, 0, 9 / 16, 0, 0],
                [-3 / 7, 2 / 7, 12 / 7, -12 / 7, 8 / 7, 0],
            ]
        ),
        np.array([7 / 90, 0, 32 / 90, 12 / 90, 32 / 90, 7 / 90]),
    ),
    6: (
        np.array(
            [
                [0, 0, 0, 0, 0, 0, 0],
                [1 / 3, 0, 0, 0, 0, 0, 0],
                [0, 2 / 3, 0, 0, 0, 0, 0],
                [1 / 12, 1 / 3, -1 / 12, 0, 0, 0, 0],
                [-1 / 16, 9 / 8, -3 / 16, -3 / 8, 0, 0, 0],
                [0, 9 / 8, -3 / 8, -3 / 4, 1 / 2, 0, 0],
                [9 / 44, -9 / 11, 63 / 44, 18 / 11, 0, -16 / 11, 0],
            ]
        ),
        np.array([11 / 120, 0, 27 / 40, 27 / 40, -4 / 15, -4 / 15, 11 / 120]),
    ),
}


def stability_function(degree: int):
    A, b = TABLEAUX[degree]
    s = len(b)
    ones = np.ones(s)

    def R(z):
        z = np.asarray(z, dtype=complex)
        out = np.empty(z.shape, dtype=complex)
        for idx in np.ndindex(z.shape):
            M = np.eye(s) - z[idx] * A
            out[idx] = 1.0 + z[idx] * (b @ np.linalg.solve(M, ones))
        return out

    return R


def boundary(degree: int, n: int = 720):
    """Points of the |R(z)|=1 boundary via theta-marching."""
    R = stability_function(degree)
    pts = []
    for theta in np.linspace(0, 2 * np.pi, n, endpoint=False):
        target = np.exp(1j * theta)
        z = 0.0 + 0.0j
        for _ in range(100):  # Newton on R(z) - target = 0
            eps = 1e-7
            f = R(np.array([z]))[0] - target
            df = (R(np.array([z + eps]))[0] - R(np.array([z - eps]))[0]) / (
                2 * eps
            )
            if abs(df) < 1e-14:
                break
            z = z - f / df
            if abs(f) < 1e-12:
                break
        pts.append(z)
    return np.array(pts)


def imaginary_axis_limit(degree: int) -> float:
    """Largest y with |R(iy)| <= 1 (the advection CFL driver)."""
    R = stability_function(degree)
    y = np.linspace(0, 6, 60001)
    vals = np.abs(R(1j * y))
    bad = np.nonzero(vals > 1.0 + 1e-12)[0]
    return y[bad[0] - 1] if len(bad) else y[-1]


if __name__ == "__main__":
    degree = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    R = stability_function(degree)
    ys = np.linspace(-5, 5, 1001)
    vals = R(1j * ys)
    for y, v in zip(ys, vals):
        print(y, v.real, v.imag)
    print("# imaginary-axis limit:", imaginary_axis_limit(degree),
          file=sys.stderr)
