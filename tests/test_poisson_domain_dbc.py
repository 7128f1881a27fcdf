"""Cut Poisson with domain-boundary Nitsche BC (domain_dbc).

No reference preset exercises simulation_type='poisson' together with
function_domain_dbc; round-1 solved an inconsistent system there (RHS
carried the boundary terms, LHS did not — ADVICE.md finding).  This
manufactured case pins the now-consistent path: the region INSIDE a
radius-1.5 circle clipped by the [-1.21,1.21]^2 box, so both the
embedded interface (circle arcs near the corners) and the domain
boundary (cut box faces) carry Nitsche terms.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gdm.problems.wave import WaveProblem
from gdm.problems.wave import WaveParams


def _exact(pts, t):
    pts = jnp.asarray(pts)
    return jnp.sin(np.pi * pts[..., 0]) * jnp.cos(np.pi * pts[..., 1])


def _rhs(pts, t):
    return 2.0 * np.pi**2 * _exact(pts, t)


def _params(n):
    p = WaveParams(dim=2)
    p.simulation_type = "poisson"
    p.fe_degree = 3
    p.n_subdivisions_1D = n
    p.geometry_left, p.geometry_right = -1.21, 1.21
    p.ghost_parameter_A = 0.5 * np.sqrt(3.0)
    p.ghost_parameter_M = 0.25 * np.sqrt(3.0)
    p.nitsche_parameter = 5.0 * p.fe_degree
    p.level_set_fe_degree = p.fe_degree
    p.level_set_function = lambda m: np.sqrt(sum(x**2 for x in m)) - 1.5
    p.function_rhs = _rhs
    p.function_interface_dbc = _exact
    p.function_domain_dbc = _exact
    p.exact_solution = _exact
    return p


def test_poisson_domain_dbc_converges():
    errs = []
    for n in (12, 24):
        prob = WaveProblem(_params(n), verbose=False)
        prob.run()
        errs.append(prob.rows[0][-1][2])
    rate = np.log2(errs[0] / errs[1])
    # committed pins (order p+1 = 4: 2.64e-3 -> 1.45e-4 -> 8.39e-6 at 48)
    np.testing.assert_allclose(errs[0], 2.6382e-03, rtol=1e-3)
    np.testing.assert_allclose(errs[1], 1.4546e-04, rtol=1e-3)
    assert rate > 3.8, (errs, rate)
