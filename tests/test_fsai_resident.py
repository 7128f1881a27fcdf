"""FSAI preconditioner (gdm/cut/fsai.py) and the VMEM-resident CG
kernel (gdm/ops/pallas_resident.py, interpret mode).

The reference CG-solves its GP'd cut mass matrices with ILU/AMG
(applications/wave/include/gdm/wave/problem.h:457-502, " [L] solved in
2" in wave_0.output); FSAI is the band-sweep-friendly TPU equivalent of
the ILU role, and the resident kernel is the one-launch solve the wave
driver's TPU path dispatches (gdm/problems/wave.py _mass_solver).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdm import solvers
from gdm.cut.geometry import INSIDE, CutGeometry
from gdm.cut.operators import CutOperators
from gdm.grid import Grid
from gdm.cut.stencil import assemble_stencil
from gdm.cut.fsai import fsai_factors, fsai_preconditioner


def _cut_mass(n, p=3):
    grid = Grid(p, (n, n), (-1.21, -1.21), (1.21, 1.21))
    geo = CutGeometry.build(
        grid, lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0, p)
    op = CutOperators(geo, INSIDE)
    return op, assemble_stencil(op, "mass", 0.25 * np.sqrt(3.0))


def test_fsai_factor_structure():
    """GT is exactly G^T and G is lower-triangular in lex order."""
    op, st = _cut_mass(16)
    G, GT = fsai_factors(st)
    N = st.grid.n_nodes
    eye = np.eye(N)
    Gd = np.stack(
        [np.asarray(G.apply(jnp.asarray(eye[i]))) for i in range(N)], axis=1)
    GTd = np.stack(
        [np.asarray(GT.apply(jnp.asarray(eye[i]))) for i in range(N)], axis=1)
    np.testing.assert_allclose(GTd, Gd.T, atol=1e-14)
    assert np.abs(np.triu(Gd, 1)).max() == 0.0


def test_fsai_iteration_count():
    """FSAI-CG on the GP'd cut mass converges far faster than Jacobi
    (measured 10 vs 100+ at 128^2; assert a sharp bound at 48^2)."""
    op, st = _cut_mass(48)
    B = fsai_preconditioner(st)
    b = jnp.asarray(
        np.random.default_rng(0).standard_normal(st.grid.n_nodes))
    x, info = solvers.cg(st.apply, b, precond=B, max_iter=100, rel_tol=1e-8)
    assert int(info["iterations"]) <= 18, info
    # solution actually solves the system
    r = np.asarray(st.apply(x)) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-7


def test_fsai_spd():
    """B = G^T G is SPD (CG-admissible) including on inactive rows."""
    op, st = _cut_mass(16)
    B = fsai_preconditioner(st)
    N = st.grid.n_nodes
    rng = np.random.default_rng(1)
    for _ in range(5):
        v = jnp.asarray(rng.standard_normal(N))
        q = float(jnp.vdot(v, B(v)))
        assert q > 0.0


def test_resident_cg_interpret_parity():
    """The one-launch resident CG reproduces the host-level
    solvers.cg (same tolerances) to f32 accuracy."""
    from gdm.ops.pallas_resident import make_resident_cg

    op, st = _cut_mass(24)
    G, GT = fsai_factors(st)
    res = make_resident_cg(st, G, GT, max_iter=40, rel_tol=1e-6,
                           interpret=True)
    assert res is not None
    solve_p, pad, unpad, _ = res
    b = np.random.default_rng(0).standard_normal(
        st.grid.n_nodes).astype(np.float32)
    x_pad, stats = solve_p(pad(jnp.asarray(b)))
    x_res = np.asarray(unpad(x_pad)).reshape(-1)
    # the stats tile carries the TRUE residual (fresh in-kernel apply),
    # the iteration count, and ||r0||
    # in-kernel f32 apply vs the x64 oracle apply: near-converged
    # residuals are heavy-cancellation sums, so only magnitude agreement
    # is meaningful (the verification compares against tol*slack)
    r_true = np.asarray(st.apply(jnp.asarray(x_res, jnp.float64))) - b
    np.testing.assert_allclose(float(stats[0, 0]),
                               np.linalg.norm(r_true), rtol=0.15, atol=1e-6)
    assert 0 < int(stats[0, 1]) <= 40
    np.testing.assert_allclose(float(stats[0, 2]), np.linalg.norm(b),
                               rtol=1e-5)

    def B(r):
        return GT.apply(G.apply(r))

    x_ref, info = solvers.cg(
        st.apply, jnp.asarray(np.asarray(b, np.float64)), precond=B,
        max_iter=40, rel_tol=1e-6)
    x_ref = np.asarray(x_ref)
    rel = np.linalg.norm(x_res - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-4, rel


def test_resident_cg_unpreconditioned():
    """Resident CG without factors (plain CG) matches host CG on an
    uncut (well-conditioned) mass system where plain CG converges."""
    from gdm.ops.pallas_resident import make_resident_cg

    grid = Grid(3, (16, 16), (-1.21, -1.21), (1.21, 1.21))
    geo = CutGeometry.build(grid, lambda m: np.sqrt(
        sum(x**2 for x in m)) - 10.0, 3)  # interface far outside: uncut
    op = CutOperators(geo, INSIDE)
    st = assemble_stencil(op, "mass", 0.25 * np.sqrt(3.0))
    res = make_resident_cg(st, max_iter=120, rel_tol=1e-6, interpret=True)
    assert res is not None
    solve_p, pad, unpad, _ = res
    b = np.random.default_rng(2).standard_normal(
        st.grid.n_nodes).astype(np.float32)
    x_res = np.asarray(unpad(solve_p(pad(jnp.asarray(b)))[0])).reshape(-1)
    r = np.asarray(st.apply(jnp.asarray(x_res, jnp.float64))) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-4
    x_ref, info = solvers.cg(
        st.apply, jnp.asarray(np.asarray(b, np.float64)),
        max_iter=120, rel_tol=1e-6)
    rel = (np.linalg.norm(x_res - np.asarray(x_ref))
           / np.linalg.norm(np.asarray(x_ref)))
    assert rel < 1e-4, rel


def test_resident_vmem_gate():
    """Grids beyond the VMEM budget return None (callers fall back)."""
    from gdm.ops.pallas_resident import make_resident_cg

    op, st = _cut_mass(24)
    res = make_resident_cg(st, max_iter=10, vmem_budget=1024)
    assert res is None
