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


def test_scan_matches_python_loop_strong_bc(tmp_path):
    """strong-Dirichlet advection_02 config through run_scan (round-4
    item 7: the reference time loop is uniform over BC treatment,
    prototypes/advection_02_gdm.cc:207-216,345-358), checkpoint resume
    included."""
    import jax.numpy as jnp
    from gdm.problems.advection import AdvectionParams

    PHI = np.pi / 36 * 5
    XS = 0.2001
    A = (2 * np.cos(PHI), 2 * np.sin(PHI))

    def exact(pts, t):
        x_hat = np.cos(PHI) * (pts[..., 0] - t * A[0] - XS) + np.sin(PHI) * (
            pts[..., 1] - t * A[1])
        return jnp.sin(np.sqrt(2) * np.pi * x_hat / (1 - XS))

    def exact_der(pts, t):
        x_hat = np.cos(PHI) * (pts[..., 0] - t * A[0] - XS) + np.sin(PHI) * (
            pts[..., 1] - t * A[1])
        return (jnp.cos(np.sqrt(2) * np.pi * x_hat / (1 - XS))
                * (np.sqrt(2) * np.pi / (1 - XS))
                * (np.cos(PHI) * (-A[0]) + np.sin(PHI) * (-A[1])))

    params = AdvectionParams(
        fe_degree=3, n_subdivisions_1D=10, geometry_left=0.0,
        geometry_right=1.0, ghost_parameter_M=0.0, ghost_parameter_A=0.0,
        start_t=0.0, end_t=0.03, cfl=0.1, max_val=2.0, advection=A,
        exact_solution=exact, exact_solution_der=exact_der,
        level_set_fe_degree=1,
        level_set_function=lambda m: np.full_like(np.asarray(m[0]), -1.0),
        dim=2, strong_bc=True)
    rows_py = AdvectionProblem(params).run()
    rows_scan = AdvectionProblem(params).run_scan()
    _rows_close(rows_py[0], rows_scan[0], 1e-10)

    # mid-horizon resume: checkpoint a 4-step prefix horizon (dt=0.005
    # divides both ends exactly, so its steps are a strict prefix of the
    # 6-step run), then resume to the full horizon from the checkpoint
    ck = str(tmp_path / "strong.ck")
    import dataclasses

    prefix = dataclasses.replace(params, end_t=0.02)
    AdvectionProblem(prefix).run_scan(chunk=2, checkpoint_path=ck,
                                      checkpoint_every=1)
    prob2 = AdvectionProblem(params)
    rows_resumed = prob2.run_scan(chunk=2, checkpoint_path=ck)
    _rows_close(rows_py[0], rows_resumed[0], 1e-10)
