"""Unit tests for the cut-cell geometry engine: classification and
Saye-style quadrature, validated on analytic areas/perimeters."""

import numpy as np
import pytest

from gdm.cut.geometry import (
    INSIDE,
    INTERSECTED,
    OUTSIDE,
    CutGeometry,
)
from gdm.grid import Grid


def sphere_ls(mesh):
    r = np.sqrt(sum(m**2 for m in mesh))
    return r - 1.0


def test_1d_interval():
    grid = Grid(3, (40,), (-1.21,), (1.21,))
    geo = CutGeometry.build(grid, sphere_ls)
    loc = geo.locations
    assert (loc == INTERSECTED).sum() == 2
    # measure of {|x|<1}
    h = grid.h[0]
    inside_cells = (loc == INSIDE).sum()
    vol = inside_cells * h
    for q in geo.cut_quads:
        vol += q.inside_w.sum() * h
    np.testing.assert_allclose(vol, 2.0, rtol=1e-12)
    # two surface points at +-1 with outward normals
    pts = []
    for cid, q in zip(geo.cut_cells, geo.cut_quads):
        x0 = grid.lower[0] + cid * h
        for pt, nrm in zip(q.surface_pts, q.surface_normals):
            pts.append((x0 + pt[0] * h, nrm[0]))
    pts.sort()
    assert len(pts) == 2
    np.testing.assert_allclose(pts[0][0], -1.0, atol=1e-12)
    np.testing.assert_allclose(pts[1][0], 1.0, atol=1e-12)
    assert pts[0][1] == -1.0 and pts[1][1] == 1.0


@pytest.mark.parametrize("n", [20, 40])
def test_2d_circle_area_perimeter(n):
    grid = Grid(3, (n, n), (-1.21, -1.21), (1.21, 1.21))
    geo = CutGeometry.build(grid, sphere_ls)
    hx, hy = grid.h
    area = (geo.locations == INSIDE).sum() * hx * hy
    perim = 0.0
    for q in geo.cut_quads:
        area += q.inside_w.sum() * hx * hy
        perim += q.surface_w.sum()
    # level set is the degree-3 interpolant of the signed distance, so the
    # geometry itself carries an O(h^4)-ish error.
    np.testing.assert_allclose(area, np.pi, rtol=5e-6 if n == 20 else 5e-7)
    np.testing.assert_allclose(perim, 2 * np.pi, rtol=5e-5 if n == 20 else 5e-6)
    # side consistency: inside + outside weights = full cell
    for q in geo.cut_quads:
        np.testing.assert_allclose(
            q.inside_w.sum() + q.outside_w.sum(), 1.0, rtol=1e-10
        )
    # normals point radially outward
    for cid, q in zip(geo.cut_cells, geo.cut_quads):
        i0, i1 = cid % n, cid // n
        for pt, nrm in zip(q.surface_pts, q.surface_normals):
            x = grid.lower[0] + (i0 + pt[0]) * hx
            y = grid.lower[1] + (i1 + pt[1]) * hy
            rad = np.array([x, y]) / np.hypot(x, y)
            assert np.dot(rad, nrm) > 0.999


def test_plane_exact():
    # linear level set: x + y - 0.5 => cut quadrature must be exact
    grid = Grid(3, (8, 8), (0.0, 0.0), (1.0, 1.0))
    geo = CutGeometry.build(grid, lambda m: m[0] + m[1] - 0.5)
    hx, hy = grid.h
    area = (geo.locations == INSIDE).sum() * hx * hy
    perim = 0.0
    for q in geo.cut_quads:
        area += q.inside_w.sum() * hx * hy
        perim += q.surface_w.sum()
    np.testing.assert_allclose(area, 0.125, atol=1e-14)
    np.testing.assert_allclose(perim, 0.5 * np.sqrt(2), atol=1e-13)


def test_ghost_penalty_faces_1d():
    grid = Grid(3, (40,), (-1.21,), (1.21,))
    geo = CutGeometry.build(grid, sphere_ls)
    faces_in = geo.ghost_penalty_faces(INSIDE)
    # each intersected cell contributes its two faces (neighbors not
    # outside on the inner side); expected: for each of the two cut cells,
    # the face toward the domain interior and the face toward the outside
    # neighbor... outside neighbor is excluded for location=INSIDE.
    cut = set(geo.cut_cells.tolist())
    for (d, cm, cp) in faces_in:
        assert d == 0
        assert cm in cut or cp in cut
    loc = geo.locations_flat
    for (d, cm, cp) in faces_in:
        assert loc[cm] != OUTSIDE and loc[cp] != OUTSIDE
