"""Parity tests for the native C++ geometry core vs the numpy fallback."""

import os

import numpy as np
import pytest

from gdm import native


def test_native_builds():
    assert native.available(), "native library failed to build"


def test_roots_parity_random():
    rng = np.random.default_rng(0)
    n, deg = 200, 9
    # polynomials with roots scattered around [0,1]
    coeffs = []
    for _ in range(n):
        roots = rng.uniform(-0.5, 1.5, deg)
        c = np.poly(roots)[::-1]  # ascending
        coeffs.append(c * rng.uniform(0.5, 2.0))
    coeffs = np.asarray(coeffs)
    got_r, got_c = native.batched_real_roots(coeffs, 0.0, 1.0)
    for i in range(n):
        c = np.trim_zeros(coeffs[i][::-1], "f")
        r = np.roots(c)
        r = r[np.abs(r.imag) < 1e-9].real
        r = np.sort(r[(r > 1e-11) & (r < 1.0 - 1e-11)])
        assert got_c[i] == len(r), (i, got_r[i], r)
        np.testing.assert_allclose(got_r[i, : len(r)], r, atol=5e-9)


def test_cut_geometry_native_matches_numpy():
    from gdm.cut.geometry import CutGeometry
    from gdm.grid import Grid

    grid = Grid(3, (20, 20), (-1.21, -1.21), (1.21, 1.21))
    ls = lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0
    geo_nat = CutGeometry.build(grid, ls)
    # force numpy fallback
    old = native._lib, native._tried
    native._lib, native._tried = None, True
    try:
        geo_np = CutGeometry.build(grid, ls)
    finally:
        native._lib, native._tried = old
    np.testing.assert_array_equal(geo_nat.cut_cells, geo_np.cut_cells)
    for a, b in zip(geo_nat.cut_quads, geo_np.cut_quads):
        np.testing.assert_allclose(a.inside_w.sum(), b.inside_w.sum(),
                                   atol=1e-12)
        np.testing.assert_allclose(a.surface_w.sum(), b.surface_w.sum(),
                                   atol=1e-11)
