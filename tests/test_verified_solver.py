"""Self-verifying resident-CG dispatch (gdm/cut/fsai.py
verified_fsai_solver) — the runtime defense against the round-4
silent-wrong-answer class: the f32 VMEM-resident FSAI-CG's recurrence
residual can pass tolerance while the TRUE residual stagnates or grows
(measured on the composite-advection DoD p=5 GP'd cut mass against the
x64 oracle).  Every resident solve now carries an in-kernel exact-f32
true residual; a setup-time probe routes hopeless operators to the
streamed path, and a per-solve ``lax.cond`` fallback catches the rest.

Reference role: deal.II SolverControl's convergence enforcement inside
the Trilinos CG driver (applications/wave/include/gdm/wave/
problem.h:471-502) — the reference never returns an unconverged solve
silently, and after this layer neither do we.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdm import solvers
from gdm.cut.fsai import verified_fsai_solver
from gdm.cut.geometry import INSIDE, CutGeometry
from gdm.cut.operators import CutOperators
from gdm.cut.stencil import assemble_stencil, schwarz_jacobi_preconditioner
from gdm.grid import Grid


def _cut_mass(n, p=3, level_set=None, gm=None):
    grid = Grid(p, (n, n), (-1.21, -1.21), (1.21, 1.21))
    ls = level_set or (lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0)
    geo = CutGeometry.build(grid, ls, p)
    op = CutOperators(geo, INSIDE)
    return op, assemble_stencil(op, "mass",
                                gm if gm is not None else 0.25 * np.sqrt(3.0))


def _oracle(st, b, windows):
    """x64 Schwarz-CG oracle solution."""
    pre = schwarz_jacobi_preconditioner(st, windows)
    x, info = solvers.cg(st.apply, jnp.asarray(np.asarray(b, np.float64)),
                         precond=pre, max_iter=400, rel_tol=1e-10)
    return np.asarray(x)


def test_verified_accepts_healthy_system():
    """On the wave-preset cut mass (the family the TPU goldens pin),
    the probe passes, the resident path is kept, and every solve's
    info reports no fallback with a true residual within tolerance."""
    op, st = _cut_mass(24)
    vs = verified_fsai_solver(st, windows=op.w_cut, max_iter=60,
                              rel_tol=1e-5, interpret=True)
    assert vs.path == "resident-verified", (vs.path, vs.probe)
    assert vs.probe["ok"] is True

    b = jnp.asarray(np.random.default_rng(0).standard_normal(
        st.grid.n_nodes), jnp.float32)
    x, info = vs.solve_with_info(b)
    assert not bool(info["fallback"])
    nb = float(jnp.linalg.norm(b))
    assert float(info["residual"]) <= 10.0 * max(1e-12, 1e-5 * nb)
    assert 0 < int(info["iterations"]) <= 60
    # and the answer is the answer
    x_ref = _oracle(st, b, op.w_cut)
    rel = np.linalg.norm(np.asarray(x, np.float64) - x_ref)
    assert rel / np.linalg.norm(x_ref) < 1e-4


def test_verified_detects_and_falls_back():
    """A crippled resident path (2 iterations) cannot converge; the
    in-kernel true residual exposes that, the lax.cond fallback reruns
    through the streamed/host Schwarz CG, and the FINAL answer is
    converged — detection + recovery, inside jit."""
    op, st = _cut_mass(24)
    vs = verified_fsai_solver(st, windows=op.w_cut, max_iter=200,
                              rel_tol=1e-6, interpret=True, probe=False,
                              resident_max_iter=2)
    assert vs.path == "resident-verified"
    b = jnp.asarray(np.random.default_rng(1).standard_normal(
        st.grid.n_nodes), jnp.float32)
    x, info = jax.jit(vs.solve_with_info)(b)
    assert bool(info["fallback"]), dict(
        residual=float(info["residual"]), it=int(info["iterations"]))
    assert int(info["fallback_iterations"]) > 0
    r = np.asarray(st.apply(jnp.asarray(np.asarray(x), np.float64))) \
        - np.asarray(b, np.float64)
    nb = np.linalg.norm(np.asarray(b))
    assert np.linalg.norm(r) <= 10.0 * 1e-6 * nb * 10  # f32 slack


def test_probe_routes_hopeless_resident_to_streamed():
    """The setup-time probe catches the same crippled path and disables
    the resident kernel entirely (measured routing, not hand routing)."""
    op, st = _cut_mass(24)
    vs = verified_fsai_solver(st, windows=op.w_cut, max_iter=200,
                              rel_tol=1e-6, interpret=True, probe=True,
                              resident_max_iter=2)
    assert vs.path == "streamed"
    assert vs.probe["ok"] is False and vs.probe["reason"] == "probe"
    b = jnp.asarray(np.random.default_rng(2).standard_normal(
        st.grid.n_nodes), jnp.float32)
    x, info = vs.solve_with_info(b)
    assert not bool(info["fallback"])  # streamed path IS the answer
    x_ref = _oracle(st, b, op.w_cut)
    rel = (np.linalg.norm(np.asarray(x, np.float64) - x_ref)
           / np.linalg.norm(x_ref))
    assert rel < 1e-4, rel


def test_dod_class_detected_and_recovered():
    """The round-4 bug class REPRODUCED and caught: on the DoD plane-cut
    p=5 GP'd cut mass (here at 32^2, f32 interpret), the resident
    FSAI-CG's recurrence residual passes 1e-6 after ~23 iterations while
    its TRUE residual is O(1) — exactly the silent-wrong-answer mode the
    round-4 offline x64-oracle protocol found at 200^2.  The probe must
    detect it (measured routing) and the returned solution must satisfy
    the system at working precision.

    NOTE the correctness criterion is residual-level, not solution-
    space: this matrix's condition number is ~1e12, so two legitimately
    converged solves differ in the near-null sliver components; what the
    physics consumes (and what round 4 validated against the x64
    trajectory) is that M x reproduces b."""
    from gdm.problems.advection import plane_signed_distance

    phi = (np.pi * 5.0 / 180.0) * 27.0
    ls = plane_signed_distance((0.25, 0.0), (np.sin(phi), -np.cos(phi)))
    op, st = _cut_mass(32, p=5, level_set=ls, gm=0.5)
    vs = verified_fsai_solver(st, windows=op.w_cut, max_iter=400,
                              rel_tol=1e-6, interpret=True)
    # the probe reproduces the failure class and disables the resident
    # path for this operator
    assert vs.path == "streamed", (vs.path, vs.probe)
    assert vs.probe["ok"] is False
    # the failure it caught is the silent kind: iterations far below the
    # cap (the recurrence CLAIMED convergence), true residual enormous
    # relative to the 1e-6 target
    assert vs.probe["iterations"] < 400
    assert vs.probe["residual"] > 100 * vs.probe["tol"]

    # a trajectory-shaped RHS (smooth field through the mass operator):
    # the routed solve must actually solve the system
    mesh = st.grid.node_coords_mesh()
    u = np.maximum(0.0, 0.3 - np.sqrt((mesh[0] + 0.3) ** 2
                                      + (mesh[1] + 0.3) ** 2)).reshape(-1)
    b = st.apply(jnp.asarray(u))
    x, info = vs.solve_with_info(jnp.asarray(b, jnp.float32))
    r = np.asarray(st.apply(jnp.asarray(np.asarray(x), np.float64))) \
        - np.asarray(b)
    nb = np.linalg.norm(np.asarray(b))
    assert np.linalg.norm(r) <= 1e-5 * nb, (np.linalg.norm(r) / nb)


def test_heat_impl_records_solver_rows():
    """print_solver_info surfaces per-step ' [L] solved in N' records
    (reference problem.h:492) without touching the golden row format."""
    from gdm.problems.wave import WaveProblem, make_preset

    params = make_preset("heat", 2)
    params.n_subdivisions_1D = 12
    params.end_t = params.start_t + 3 * 0.3 * 2.42 / 12
    params.print_solver_info = True
    prob = WaveProblem(params, verbose=False)
    rows_before = prob.run()
    assert len(prob.solver_rows[0]) == len(rows_before[0]) - 1
    for counter, it, fb, itf in prob.solver_rows[0]:
        assert it > 0 and not fb and itf == 0
    # golden row format untouched
    assert all(len(r) == 5 for r in rows_before[0])
