"""3D cut implicit-heat trajectory — sharp self-pin.

Beyond-reference scope (the reference never runs cut problems above
dim 2; its dim-generic machinery is wave/problem.h:210-279 implicit
Euler + mass.h/stiffness.h assembly).  The full 3D pipeline — Saye
volume/surface quadrature on the sphere, ghost penalty, Nitsche
interface terms, assembled (M + dt*S) solves — run for the reference's
heat-impl step pattern (0.1 / cfl*dx time steps) with a 3D manufactured
solution u = x^2 y^2 z^2 e^{-t}; the per-step L2/L1/Linf rows are
pinned to the committed values (rtol 1e-6, the goldens' print
precision class).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gdm.problems import wave


def _params():
    p = wave.WaveParams(dim=3)
    p.simulation_type = "heat-impl"
    p.fe_degree = 3
    p.n_subdivisions_1D = 8
    p.ghost_parameter_M = 0.75
    p.ghost_parameter_A = 1.5
    p.nitsche_parameter = 15.0
    p.level_set_function = wave.sphere_signed_distance
    p.cfl = 0.3
    p.cfl_pow = 1.0
    p.end_t = 0.1

    def g(pts, t):
        return (pts[..., 0] ** 2 * pts[..., 1] ** 2 * pts[..., 2] ** 2
                * jnp.exp(-t))

    def f(pts, t):
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        return (-(x * y * z) ** 2
                - 2 * (y * y * z * z + x * x * z * z + x * x * y * y)
                ) * jnp.exp(-t)

    p.function_interface_dbc = g
    p.function_rhs = f
    p.exact_solution = g
    return p


# committed trajectory (counter, t, L2, L1, Linf), executed 2026-08-17
PINNED = [
    (1, 0.09075, 5.264570369398583e-06, 9.5357088993718e-06,
     5.587360439521603e-06),
    (2, 0.1, 4.434726063186262e-06, 8.074405449410244e-06,
     4.2577020407609275e-06),
]


@pytest.mark.slow
def test_cut_heat_impl_3d_trajectory():
    prob = wave.WaveProblem(_params(), verbose=False)
    prob.run()
    rows = prob.rows[0]
    assert rows[0][2] < 1e-15  # t=0 interpolation is exact (polynomial)
    for got, want in zip(rows[1:], PINNED):
        assert got[0] == want[0]
        assert got[1] == pytest.approx(want[1], abs=1e-12)
        for k in (2, 3, 4):
            assert got[k] == pytest.approx(want[k], rel=1e-6)
