"""Sharded execution of the CUT operators (domain decomposition of the
stencil-band applies with ppermute halo exchange).

The reference parallelizes the cut wave/advection apps themselves over
MPI (applications/wave/include/gdm/wave/stiffness.h:149,406 ghost
exchange; include/gdm/system.h:703-761 slab partition); the oracle there
is that rank-0 printed output is invariant to the rank count
(tests/poisson_02_gdm.mpirun={1,3}.output).  The equivalent contract
here: the sharded solve reproduces the single-device error rows exactly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gdm.dist.mesh import device_mesh
from gdm.dist.cut import sharded_stencil_apply
from gdm.grid import Grid
from gdm.cut.geometry import INSIDE, CutGeometry
from gdm.cut.operators import CutOperators
from gdm.cut.stencil import assemble_stencil


def _make_op(dim, n):
    grid = Grid(3, (n,) * dim, (-1.21,) * dim, (1.21,) * dim)
    geo = CutGeometry.build(
        grid, lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0, 3)
    return grid, CutOperators(geo, INSIDE)


@pytest.mark.parametrize("dim,n,ndev", [(1, 40, 8), (1, 41, 4), (2, 24, 8),
                                        (2, 21, 3)])
def test_sharded_apply_matches_serial(dim, n, ndev):
    """Including node counts NOT divisible by the device count
    (identity-padded rows)."""
    grid, op = _make_op(dim, n)
    st = assemble_stencil(op, "mass", 0.25 * np.sqrt(3.0))
    mesh = device_mesh(ndev)
    apply_sharded = sharded_stencil_apply(st, mesh)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(grid.n_nodes))
    y0 = np.asarray(st.apply(u))
    y1 = np.asarray(apply_sharded(u))
    np.testing.assert_allclose(y1, y0, rtol=1e-14, atol=1e-14)


def test_wave0_rows_shard_invariant():
    """The full wave_0 configuration (1D wave-rk preset, 40 cells = 41
    nodes over 8 devices, non-divisible) run with the sharded cut solver
    reproduces the single-device error rows exactly."""
    from gdm.problems.wave import WaveProblem, make_preset

    p = make_preset("wave", 1)
    p.end_t = 0.2  # a few RK4 steps are enough to catch any halo bug
    serial = WaveProblem(p, verbose=False)
    rows0 = serial.run()
    sharded = WaveProblem(p, verbose=False, mesh=device_mesh(8))
    rows1 = sharded.run()
    assert len(rows1[0]) == len(rows0[0]) > 3
    for r0, r1 in zip(rows0[0], rows1[0]):
        assert r0[:2] == r1[:2]
        # CG dot products reduce in a different order across shards, so
        # agreement is to roundoff (~1 ulp), far inside the 5 printed
        # significant digits of the reference's rank-count-invariance
        # oracle (poisson_02_gdm.mpirun={1,3}.output)
        np.testing.assert_allclose(r1[2:], r0[2:], rtol=1e-10, atol=1e-16)
    np.testing.assert_allclose(
        np.asarray(sharded.final_solution), np.asarray(serial.final_solution),
        rtol=1e-12, atol=1e-14)


def test_advection_rows_shard_invariant():
    """Cut advection (upwind embedded flux, BC-as-ODE) with the mass
    solves domain-decomposed over 8 devices reproduces the single-device
    6-column error rows (reference: the advection apps run under the
    same MPI machinery, advection/discretization.h:104-107)."""
    from gdm.problems.advection import AdvectionProblem, convergence_case

    params = convergence_case(3, 12, 0.4, 0.0, 5.0)
    params.end_t = 4 * (1.0 / 12) * 0.4 / 2.0  # 4 steps
    rows0 = AdvectionProblem(params).run()
    rows1 = AdvectionProblem(params, mesh=device_mesh(8)).run()
    assert len(rows1[0]) == len(rows0[0]) > 3
    for r0, r1 in zip(rows0[0], rows1[0]):
        assert r0[:2] == r1[:2]
        np.testing.assert_allclose(r1[2:], r0[2:], rtol=1e-10, atol=1e-16)


def test_advection_composite_scan_shard_invariant():
    """Composite advection through run_scan with sharded mass solves."""
    from gdm.problems.advection import AdvectionProblem, composite_app_case

    params = composite_app_case()
    params.n_subdivisions_1D = 12
    params.fe_degree = 3
    params.end_t = 3 * (2.0 / 12) * 0.2 / 4.0  # 3 steps
    rows0 = AdvectionProblem(params).run_scan()
    rows1 = AdvectionProblem(params, mesh=device_mesh(4)).run_scan()
    for slot in (0, 1):
        assert len(rows1[slot]) == len(rows0[slot]) > 2
        for r0, r1 in zip(rows0[slot], rows1[slot]):
            np.testing.assert_allclose(r1[2:], r0[2:], rtol=1e-10,
                                       atol=1e-16)


def test_heat_composite_rows_shard_invariant():
    """Composite two-domain explicit heat with interface coupling, 2D,
    sharded over 4 devices."""
    from gdm.problems.wave import WaveProblem, make_preset

    p = make_preset("heat-composite", 2)
    p.n_subdivisions_1D = 16
    p.end_t = p.start_t + 4 * p.cfl * (2.42 / 16) ** p.cfl_pow
    serial = WaveProblem(p, verbose=False)
    rows0 = serial.run()
    sharded = WaveProblem(p, verbose=False, mesh=device_mesh(4))
    rows1 = sharded.run()
    for slot in (0, 1):
        assert len(rows1[slot]) == len(rows0[slot]) > 2
        for r0, r1 in zip(rows0[slot], rows1[slot]):
            np.testing.assert_allclose(r1[2:], r0[2:], rtol=1e-12,
                                       atol=1e-16)


def test_deformed_wave_rows_shard_invariant():
    """Round 4: the deformed-cut composition (mapping_q_cache_function
    re-metricing every quadrature table) through the SHARDED solver —
    the deformed band applies are domain-decomposed identically, so the
    sharded error rows must match the serial ones to roundoff."""
    from gdm.problems.wave import WaveProblem, make_preset

    def squeeze(pts):
        pts = np.asarray(pts, float)
        return pts + 0.04 * np.sin(np.pi * pts / 1.21)

    p = make_preset("heat", 1)
    p.end_t = 0.15
    p.mapping_q_cache_function = squeeze
    serial = WaveProblem(p, verbose=False)
    rows0 = serial.run()
    sharded = WaveProblem(p, verbose=False, mesh=device_mesh(8))
    rows1 = sharded.run()
    assert len(rows1[0]) == len(rows0[0]) > 2
    for r0, r1 in zip(rows0[0], rows1[0]):
        assert r0[:2] == r1[:2]
        np.testing.assert_allclose(r1[2:], r0[2:], rtol=1e-10, atol=1e-16)
