"""run_scan (single jitted lax.scan device loop) must reproduce run()
(per-step Python loop) row-for-row — same DiscreteTime steps, same RK
stages, same error norms."""

import numpy as np

from gdm.problems.advection import (
    AdvectionProblem, composite_app_case, convergence_case)


def _rows_close(a, b, rtol):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0]
        np.testing.assert_allclose(ra[1:], rb[1:], rtol=rtol, atol=1e-14)


def test_scan_matches_python_loop_composite():
    params = composite_app_case()
    params.n_subdivisions_1D = 12
    params.fe_degree = 3
    params.end_t = 4 * (2.0 / 12) * 0.2 / 4.0  # 4 steps
    rows_py = AdvectionProblem(params).run()
    rows_scan = AdvectionProblem(params).run_scan()
    _rows_close(rows_py[0], rows_scan[0], 1e-10)
    _rows_close(rows_py[1], rows_scan[1], 1e-10)


def test_scan_matches_python_loop_single():
    params = convergence_case(3, 10, 0.4, 0.0, 5.0)
    params.end_t = 3 * (1.0 / 10) * 0.4 / 2.0  # 3 steps
    rows_py = AdvectionProblem(params).run()
    rows_scan = AdvectionProblem(params).run_scan()
    _rows_close(rows_py[0], rows_scan[0], 1e-10)
