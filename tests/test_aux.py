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
