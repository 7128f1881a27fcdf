"""Cut geometry composed with grid deformation — the reference's
``mapping_q_cache_function`` threaded through every cut assembly
(applications/wave/include/gdm/wave/discretization.h:57-74 builds the
MappingQCache that mass.h:163-177 and stiffness.h:589-799 feed into
NonMatching::FEValues, so a deformed cut solve works by construction
there).  Here the cut — classification and quadrature — is generated in
UNDEFORMED coordinates exactly as the reference does (the level set is
interpolated with the default mapping, discretization.h:92-97) and the
deformation re-metrics the quadrature tables (gdm/cut/operators.py):
JxW picks up |det|, gradients pull back through A^{-T}, surface/face
measures and normals follow Nanson's formula.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gdm import solvers
from gdm.cut.geometry import INSIDE, CutGeometry
from gdm.cut.operators import CutOperators
from gdm.grid import Grid

LS = lambda m: np.sqrt(sum(np.asarray(x) ** 2 for x in m)) - 1.0  # noqa


def warp(pts):
    """Smooth orientation-preserving 2D deformation (max displacement
    ~0.05, max Jacobian perturbation ~0.13)."""
    pts = np.asarray(pts, dtype=np.float64)
    x, y = pts[..., 0], pts[..., 1]
    return np.stack(
        [x + 0.05 * np.sin(np.pi * x / 1.21) * np.cos(0.5 * np.pi * y / 1.21),
         y - 0.04 * np.sin(np.pi * y / 1.21) * np.cos(0.5 * np.pi * x / 1.21)],
        axis=-1)


def test_identity_mapping_parity():
    """The identity Q1 chart must reproduce the undeformed operators to
    roundoff — every table (full-cell, cut-volume, interface, ghost
    penalty, boundary) goes down the re-metric code path with det=1,
    A=I."""
    grid = Grid(3, (20, 20), (-1.21, -1.21), (1.21, 1.21))
    geo = CutGeometry.build(grid, LS, 3)
    op0 = CutOperators(geo, INSIDE)
    op1 = CutOperators(geo, INSIDE, mapping_fn=lambda p: p, geometry="q1")
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(grid.n_nodes))
    m0 = np.asarray(op0.mass_apply(v, 0.75))
    m1 = np.asarray(op1.mass_apply(v, 0.75))
    np.testing.assert_allclose(m1, m0, rtol=0, atol=1e-12 * np.abs(m0).max())
    s0 = np.asarray(op0.stiffness_matrix_apply(v, 1.5, 15.0))
    s1 = np.asarray(op1.stiffness_matrix_apply(v, 1.5, 15.0))
    np.testing.assert_allclose(s1, s0, rtol=0, atol=1e-11 * np.abs(s0).max())


def _solve_poisson(n, mapping_fn, geometry="q1"):
    p = 3
    grid = Grid(p, (n, n), (-1.21, -1.21), (1.21, 1.21))
    geo = CutGeometry.build(grid, LS, p)
    op = CutOperators(geo, INSIDE, mapping_fn=mapping_fn, geometry=geometry)
    gamma, nitsche = 0.5, 5.0 * (p + 1) * p

    # manufactured solution in PHYSICAL (deformed) coordinates:
    # -lap(u) = 4, u = 2 - |x|^2; Dirichlet data = u at the (deformed)
    # interface points (surf_phys_q is re-metriced to physical space)
    exact = lambda pts, t: 2.0 - (pts**2).sum(-1)
    rhs_fn = lambda pts, t: jnp.full(pts.shape[:-1], 4.0)

    diag = op.stiffness_diagonal(gamma, nitsche, gp_power=1)

    @jax.jit
    def solve():
        zero = jnp.zeros(grid.n_nodes)
        b = op.compute_rhs(zero, 0.0, False, rhs_fn=rhs_fn,
                           interface_dbc=exact, nitsche_gamma=nitsche)
        x, _ = solvers.cg(
            lambda v: op.stiffness_matrix_apply(v, gamma, nitsche,
                                                gp_power=1),
            b, precond=solvers.jacobi_preconditioner(jnp.asarray(diag)),
            max_iter=4000, abs_tol=1e-12, rel_tol=1e-12)
        return x

    l2, _, _ = op.error_norms(solve(), exact, 0.0)
    return float(l2)


def test_deformed_cut_poisson_q1_rate():
    """Deformed cut Poisson (Nitsche interface + ghost penalty)
    converges at the q1-geometry rate: the Q1 chart carries an O(h^2)
    geometry error that dominates (the exact solution is quadratic, so
    an exact-geometry discretization would be far more accurate — also
    checked).  Reference semantics: MappingQCache(1) from
    mapping_q_cache_function in every NonMatching::FEValues."""
    errs = [_solve_poisson(n, warp) for n in (16, 32, 64)]
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert all(r > 1.7 for r in rates), (errs, rates)
    assert errs[-1] < 2e-3, errs
    # exact geometry (beyond-reference mode) removes the O(h^2) chart
    # error: same mesh, much smaller error
    err_exact = _solve_poisson(32, warp, geometry="exact")
    assert err_exact < 0.2 * errs[1], (err_exact, errs)


def test_wave_problem_deformed_cut_heat():
    """WaveProblem end-to-end with mapping_q_cache_function + cut
    geometry in 2D (the round-3 NotImplementedError guard is gone):
    identity mapping reproduces the undeformed error rows digit-exact;
    a real deformation runs the same heat-impl preset with errors of the
    same accuracy class."""
    from gdm.problems.wave import WaveProblem, make_preset

    def cfg(mapping):
        p = make_preset("heat", 2)
        p.n_subdivisions_1D = 16
        p.end_t = 0.1
        p.mapping_q_cache_function = mapping
        return p

    prob_plain = WaveProblem(cfg(None), verbose=False)
    prob_plain.run()
    rows0 = prob_plain.rows[0]

    prob_id = WaveProblem(cfg(lambda p: p), verbose=False)
    prob_id.run()
    for r0, r1 in zip(rows0, prob_id.rows[0]):
        np.testing.assert_allclose(r1[2:], r0[2:], rtol=1e-9)

    prob_w = WaveProblem(cfg(warp), verbose=False)
    prob_w.run()
    for r0, rw in zip(rows0, prob_w.rows[0]):
        assert np.isfinite(rw[2]) and rw[2] < 10 * r0[2], (rw, r0)


def test_ev_deformed_cut_2d():
    """wave-ev --alpha study in 2D composed with a deformation (the
    dim-generic generalization of the 1D --align clamp study,
    wave-ev.cc:252-259; --align itself stays 1D because a fitted outer
    boundary on a tensor grid only exists in 1D): spectra are
    symmetric/finite, and the identity mapping through the cut
    re-metric path reproduces the undeformed spectra digit-exact."""
    from gdm.tools import eigen

    kw = dict(fe_degree=3, n_subdivisions_1D=12, dim=2, alpha=0.3)
    _, _, M0, S0 = eigen.build_ev_operators(**kw)
    _, _, Mi, Si = eigen.build_ev_operators(
        mapping_fn=lambda p: p, mapping_cut=True, **kw)
    np.testing.assert_allclose(Mi, M0, rtol=0,
                               atol=1e-12 * np.abs(M0).max())
    np.testing.assert_allclose(Si, S0, rtol=0,
                               atol=1e-11 * np.abs(S0).max())

    _, _, Mw, Sw = eigen.build_ev_operators(
        mapping_fn=warp, mapping_cut=True, **kw)
    assert np.abs(Mw - Mw.T).max() < 1e-12
    assert np.abs(Sw - Sw.T).max() < 1e-11
    assert np.abs(Mw - M0).max() > 1e-8  # the deformation is in there
    k0, _ = eigen.condition_number(M0, rescale=True)
    kw_, _ = eigen.condition_number(Mw, rescale=True)
    assert np.isfinite(kw_) and kw_ > 0
    lam0, _ = eigen.max_generalized_eigenvalue(
        S0 + 1e-12 * np.eye(len(S0)), M0 + 1e-12 * np.eye(len(M0)))
    lamw, _ = eigen.max_generalized_eigenvalue(
        Sw + 1e-12 * np.eye(len(Sw)), Mw + 1e-12 * np.eye(len(Mw)))
    assert np.isfinite(lamw) and 0.2 < lamw / lam0 < 5.0


def test_wave_composite_deformed_identity():
    """Composite (both-locations) runs take the deformed path too: the
    OUTSIDE operators' volume/interface/GP/boundary tables ride the same
    re-metric code; identity mapping reproduces the undeformed composite
    heat rows digit-exact in both slots."""
    from gdm.problems.wave import WaveProblem, make_preset

    def cfg(mapping):
        p = make_preset("heat-composite", 1)
        p.n_subdivisions_1D = 24
        p.end_t = 0.02
        p.mapping_q_cache_function = mapping
        return p

    plain = WaveProblem(cfg(None), verbose=False)
    plain.run()
    ident = WaveProblem(cfg(lambda p: p), verbose=False)
    ident.run()
    for slot in (0, 1):
        assert len(plain.rows[slot]) >= 2
        for r0, r1 in zip(plain.rows[slot], ident.rows[slot]):
            np.testing.assert_allclose(r1[2:], r0[2:], rtol=1e-9)


def test_identity_mapping_parity_3d():
    """The re-metric path is dim-generic (beyond-reference: the
    reference never composes its mapping with 3D cut geometry): 3D
    identity chart reproduces the undeformed operators to roundoff."""
    LS3 = lambda m: np.sqrt(sum(np.asarray(x) ** 2 for x in m)) - 1.0
    grid = Grid(3, (8, 8, 8), (-1.21, -1.21, -1.21), (1.21, 1.21, 1.21))
    geo = CutGeometry.build(grid, LS3, 3)
    op0 = CutOperators(geo, INSIDE)
    op1 = CutOperators(geo, INSIDE, mapping_fn=lambda p: p, geometry="q1")
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(grid.n_nodes))
    m0 = np.asarray(op0.mass_apply(v, 0.75))
    m1 = np.asarray(op1.mass_apply(v, 0.75))
    np.testing.assert_allclose(m1, m0, rtol=0, atol=1e-12 * np.abs(m0).max())
    s0 = np.asarray(op0.stiffness_matrix_apply(v, 1.5, 15.0))
    s1 = np.asarray(op1.stiffness_matrix_apply(v, 1.5, 15.0))
    np.testing.assert_allclose(s1, s0, rtol=0, atol=1e-11 * np.abs(s0).max())


def test_wave_vtu_deformed_coordinates(tmp_path):
    """WaveProblem's per-step VTU writes patch points in deformed space
    when mapping_q_cache_function is set (reference problem.h:618 builds
    DataOut with the MappingQCache)."""
    from gdm.problems.wave import WaveProblem, _write_step_vtu, make_preset

    def cfg(mapping):
        p = make_preset("heat", 2)
        p.n_subdivisions_1D = 8
        p.mapping_q_cache_function = mapping
        return p

    def points_of(path):
        import re

        txt = open(path).read()
        m = re.search(r'<Points>.*?<DataArray[^>]*>(.*?)</DataArray>',
                      txt, re.S)
        return np.fromstring(m.group(1), sep=" ")

    z = np.zeros(9 * 9)
    p0 = tmp_path / "plain.vtu"
    pw = tmp_path / "warp.vtu"
    _write_step_vtu(WaveProblem(cfg(None), verbose=False), z, 0.0, str(p0))
    _write_step_vtu(WaveProblem(cfg(warp), verbose=False), z, 0.0, str(pw))
    a, b = points_of(p0), points_of(pw)
    assert a.shape == b.shape
    assert np.abs(a - b).max() > 1e-3  # points moved


def test_deformed_step85_mg_solver():
    """The deformed cut band composes with the Galerkin cut multigrid
    (solver_name='MG'): the deformed step85 preset solves in few
    iterations and converges to the (deformed-domain) manufactured
    solution at preset-scale accuracy."""
    from gdm.problems.wave import WaveProblem, make_preset

    p = make_preset("step85", 2)
    p.n_subdivisions_1D = 32
    p.solver_name = "MG"
    p.solver_rel_tolerance = 1e-10
    p.mapping_q_cache_function = warp
    # under a deformation the interface is no longer |x|=1, so constant
    # Dirichlet data is inconsistent with the preset's exact solution;
    # use the manufactured solution itself (still -lap(u)=4)
    p.function_interface_dbc = p.exact_solution
    prob = WaveProblem(p, verbose=False)
    prob.run()
    c, t, l2, l1, li = prob.rows[0][-1]
    # q1-geometry class at 32^2 (h ~ 0.076): O(h^2) ~ 1e-3 scale
    assert np.isfinite(l2) and l2 < 5e-3, l2
