"""Coverage for prototypes/advection_02_gdm (uncut advection with weak
upwind vs STRONG nodal-Dirichlet boundary conditions).

The committed golden is stale: its six 21-row blocks correspond to the
long-disabled first campaign (n=10, cfl=0.1, p in {1,3,5}, strong then
weak BC), and no parameter combination of the current source reproduces
even its t=0 interpolation-error rows (we checked phi in {25deg, pi/8},
x_shift in {0.2, 0.2001}; all differ by 5-8%).  The CURRENT-code
advection formulation is verified digit-exact against
applications/advection/tests/test_01.output in test_advection_app.py.
Here BOTH prototype configurations run — the weak upwind path
(advection_02_gdm.cc:272,433-480, alpha=0) and the strong path
(advection_02_gdm.cc:207-216,345-358, alpha=1: per-stage nodal
constraint distribution + stage-derivative zeroing) — each pinned SHARP
to committed values, plus p-refinement convergence checks.
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


def run(p_deg, strong=False, n=10):
    params = AdvectionParams(
        fe_degree=p_deg, n_subdivisions_1D=n, geometry_left=0.0,
        geometry_right=1.0, ghost_parameter_M=0.0, ghost_parameter_A=0.0,
        start_t=0.0, end_t=0.1, cfl=0.1, max_val=2.0, advection=A,
        exact_solution=exact, exact_solution_der=exact_der,
        level_set_fe_degree=1,
        # level set strictly negative: the whole hypercube is "inside",
        # no intersected cells -> pure uncut advection
        level_set_function=lambda m: np.full_like(np.asarray(m[0]), -1.0),
        dim=2, strong_bc=strong,
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
    # sharp pins of current behavior (golden scale: weak p=3 final
    # 1.033e-3, weak p=5 final 8.705e-5 — same magnitude).
    # rtol 1e-3, not tighter: XLA:CPU codegen differs across host CPUs
    # (vector ISA dispatch), shifting these trajectories by ~1e-5 (p=3)
    # to ~2e-4 (p=5) relative between machines
    np.testing.assert_allclose(final3, 1.0837437584996e-3, rtol=1e-3)
    np.testing.assert_allclose(final5, 9.2521375336219e-5, rtol=1e-3)
    np.testing.assert_allclose(
        max(r[2] for r in rows3), 1.0837437584996e-3, rtol=1e-3)
    np.testing.assert_allclose(
        max(r[2] for r in rows5), 9.4844188424759e-5, rtol=1e-3)


def test_advection_02_strong_bc():
    """Strong nodal Dirichlet (alpha=1) path: sharp pins + stability."""
    rows3 = run(3, strong=True)
    rows5 = run(5, strong=True)
    assert len(rows3) == 21 and len(rows5) == 21
    # t=0 rows are pure interpolation error: identical to the weak path
    np.testing.assert_allclose(rows3[0][2], 9.3086325796e-4, rtol=1e-3)
    np.testing.assert_allclose(rows3[-1][2], 2.9849417041987e-3, rtol=1e-3)
    np.testing.assert_allclose(rows5[-1][2], 8.9484167983755e-4, rtol=1e-3)
    # error grows monotonically but stays bounded (stable)
    assert max(r[2] for r in rows3) == rows3[-1][2]


def test_advection_02_strong_bc_convergence():
    """Mesh refinement: strong-BC errors converge at (at least) order
    p+1/2 — measured ~3.7 (p=3) and ~5.8 (p=5) from n=10 to n=20."""
    f3 = run(3, strong=True, n=20)[-1][2]
    f5 = run(5, strong=True, n=20)[-1][2]
    np.testing.assert_allclose(f3, 2.2445054491982e-4, rtol=1e-3)
    # p=5 at n=20 sits near the mass-CG tolerance floor; the trajectory
    # varies ~1% with environment/codegen details
    np.testing.assert_allclose(f5, 1.5889168935246e-5, rtol=2e-2)
    assert f3 < 2.9849417041987e-3 / 2 ** 3.5
    assert f5 < 8.9484167983755e-4 / 2 ** 5.5
