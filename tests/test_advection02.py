"""Coverage for prototypes/advection_02_gdm (uncut advection with weak
upwind boundary conditions and RK-evolved BC values).

The committed golden is stale: its six 21-row blocks correspond to the
long-disabled first campaign (n=10, cfl=0.1, p in {1,3,5}, strong then
weak BC), and no parameter combination of the current source reproduces
even its t=0 interpolation-error rows (we checked phi in {25deg, pi/8},
x_shift in {0.2, 0.2001}; all differ by 5-8%).  The CURRENT-code
advection formulation is verified digit-exact against
applications/advection/tests/test_01.output in test_advection_app.py, so
here we assert the uncut weak-BC configuration's magnitude and
p-convergence against the golden's scale.
"""

import numpy as np
import jax.numpy as jnp

from gdm.problems.advection import AdvectionProblem, AdvectionParams

PHI = np.pi / 36 * 5
XS = 0.2001
A = (2 * np.cos(PHI), 2 * np.sin(PHI))


def exact(pts, t):
    x_hat = np.cos(PHI) * (pts[..., 0] - t * A[0] - XS) + np.sin(PHI) * (
        pts[..., 1] - t * A[1]
    )
    return jnp.sin(np.sqrt(2) * np.pi * x_hat / (1 - XS))


def exact_der(pts, t):
    x_hat = np.cos(PHI) * (pts[..., 0] - t * A[0] - XS) + np.sin(PHI) * (
        pts[..., 1] - t * A[1]
    )
    return (
        jnp.cos(np.sqrt(2) * np.pi * x_hat / (1 - XS))
        * (np.sqrt(2) * np.pi / (1 - XS))
        * (np.cos(PHI) * (-A[0]) + np.sin(PHI) * (-A[1]))
    )


def run(p_deg):
    params = AdvectionParams(
        fe_degree=p_deg, n_subdivisions_1D=10, geometry_left=0.0,
        geometry_right=1.0, ghost_parameter_M=0.0, ghost_parameter_A=0.0,
        start_t=0.0, end_t=0.1, cfl=0.1, max_val=2.0, advection=A,
        exact_solution=exact, exact_solution_der=exact_der,
        level_set_fe_degree=1,
        # level set strictly negative: the whole hypercube is "inside",
        # no intersected cells -> pure uncut weak-BC advection
        level_set_function=lambda m: np.full_like(np.asarray(m[0]), -1.0),
        dim=2,
    )
    prob = AdvectionProblem(params)
    prob.run()
    return prob.rows[0]


def test_advection_02_weak_bc():
    rows3 = run(3)
    rows5 = run(5)
    assert len(rows3) == 21 and len(rows5) == 21  # dt=0.005, 20 steps
    final3 = rows3[-1][2]
    final5 = rows5[-1][2]
    # golden scale: weak p=3 final 1.033e-3, weak p=5 final 8.705e-5 —
    # same magnitude; current behavior pinned SHARP below (regression pin)
    assert 5e-4 < final3 < 2e-3, final3
    assert 4e-5 < final5 < 2e-4, final5
    # rtol 1e-3, not tighter: XLA:CPU codegen differs across host CPUs
    # (vector ISA dispatch), shifting these trajectories by ~1e-5 (p=3)
    # to ~2e-4 (p=5) relative between machines
    np.testing.assert_allclose(final3, 1.0837437584996e-3, rtol=1e-3)
    np.testing.assert_allclose(final5, 9.2521375336219e-5, rtol=1e-3)
    # error stays bounded over the run (stable weak BC)
    assert max(r[2] for r in rows3) < 2e-3
    np.testing.assert_allclose(
        max(r[2] for r in rows5), 9.4844188424759e-5, rtol=1e-3)
