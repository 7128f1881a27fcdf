"""General grid deformation (gdm.deform) — the TPU-native counterpart of
the reference's Parameters::mapping_q_cache_function
(applications/wave/include/gdm/wave/discretization.h:57-74, the per-cell
Q1 MappingQCache(1) built from moved vertices; only in-tree user is
wave-ev's 1D --align, wave-ev.cc:246-270).

Pins: identity parity vs the separable operators, digit-exact agreement
with the golden-tested 1D jac path of gdm.ops1d, the measured O(h^2)
geometric-consistency cap of the q1 (reference-semantics) mode, and the
full O(h^{p+1}) rate of the beyond-reference exact-geometry mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdm.grid import Grid
from gdm import deform, operators
from gdm.problems import poisson

IDENT = lambda pts: pts

A_BUMP = 0.06


def bump(pts):
    x, y = pts[:, 0], pts[:, 1]
    s = A_BUMP * np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y)
    return np.stack([x + s, y + 0.7 * s], -1)


EXACT = lambda m, c: np.sin(np.pi * m[0]) * np.sin(np.pi * m[1])
RHS = lambda m, c: 2 * np.pi**2 * np.sin(np.pi * m[0]) * np.sin(np.pi * m[1])


@pytest.mark.parametrize("cells", [(11,), (8, 9), (5, 6, 7)])
def test_identity_mapping_matches_separable(cells):
    dim = len(cells)
    g = Grid(3, cells, (0.0,) * dim, (1.0, 1.3, 0.9)[:dim])
    u = np.random.default_rng(0).standard_normal(g.nodes)
    for sep, band in [
        (operators.mass(g), deform.mass_band(g, IDENT)),
        (operators.laplace(g), deform.laplace_band(g, IDENT)),
    ]:
        y1 = np.asarray(sep.apply(jnp.asarray(u[..., None]))).ravel()
        y2 = np.asarray(band.apply(jnp.asarray(u.ravel())))
        assert np.abs(y1 - y2).max() <= 1e-12 * np.abs(y1).max()


def test_1d_matches_jac_path():
    """The Q1 deformation in 1D is exactly the piecewise-linear width
    change the wave-ev --align path integrates via per-cell Jacobians
    (gdm/ops1d.assemble_1d(jac=...), golden-tested in test_wave_ev)."""
    from gdm.ops1d import assemble_1d

    n, p, alpha = 20, 5, 0.3
    g = Grid(p, (n,), (0.0,), (1.0,))
    h = g.h[0]
    inner = (1.0 - 2 * h * (1 - alpha)) / (1.0 - 2 * h)

    def align_map(pts):
        x = pts[:, 0]
        out = np.where(
            x <= h, x * (1 - alpha),
            np.where(x >= 1.0 - h, 1.0 - (1.0 - x) * (1 - alpha),
                     h * (1 - alpha) + (x - h) * inner))
        return np.stack([out], -1)

    jac = np.full(n, h * inner)
    jac[0] = jac[-1] = h * (1 - alpha)

    def densify(bop):
        N = g.n_nodes
        cols = [np.asarray(bop.apply(jnp.asarray(np.eye(N)[i])))
                for i in range(N)]
        return np.stack(cols, axis=1)

    M_ref = assemble_1d(p, n, h, 0, 0, jac=jac).full()
    S_ref = assemble_1d(p, n, h, 1, 1, jac=jac).full()
    assert np.abs(densify(deform.mass_band(g, align_map)) - M_ref).max() < 1e-13
    assert np.abs(densify(deform.laplace_band(g, align_map)) - S_ref).max() < 1e-11


def test_per_point_mapping_accepted():
    """The reference's map is a per-point Point->Point std::function;
    deform accepts that calling convention too."""
    g = Grid(3, (6, 5), (0.0, 0.0), (1.0, 1.0))
    per_point = lambda p: p  # (dim,) -> (dim,)
    u = np.random.default_rng(1).standard_normal(g.n_nodes)
    y1 = deform.mass_band(g, IDENT).apply(jnp.asarray(u))
    y2 = deform.mass_band(g, per_point).apply(jnp.asarray(u))
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() < 1e-14


def test_deformed_poisson_q1_reference_semantics():
    """MappingQCache(1) semantics: per-cell bilinear chart => O(h^2)
    geometric-consistency cap regardless of p (the composed pullback has
    curvature kinks across faces the nonlocal GD basis cannot absorb).
    Sharp pins of current behavior (rate ~2)."""
    errs = {}
    for n in (8, 16):
        g = Grid(3, (n, n), (0.0, 0.0), (1.0, 1.0))
        u, info = poisson.solve_deformed(g, bump, RHS, geometry="q1")
        errs[n] = deform.l2_error(g, bump, u, EXACT, geometry="q1")
    assert errs[8] == pytest.approx(2.3058e-03, rel=1e-3)
    assert errs[16] == pytest.approx(5.4758e-04, rel=1e-3)
    assert 1.7 < np.log2(errs[8] / errs[16]) < 2.4


def test_deformed_poisson_exact_geometry_full_order():
    """geometry='exact' (beyond-reference) restores O(h^{p+1})."""
    errs = {}
    for n in (8, 16, 32):
        g = Grid(3, (n, n), (0.0, 0.0), (1.0, 1.0))
        u, info = poisson.solve_deformed(g, bump, RHS, geometry="exact")
        errs[n] = deform.l2_error(g, bump, u, EXACT, geometry="exact")
    assert errs[8] == pytest.approx(1.6154e-03, rel=1e-3)
    assert errs[16] == pytest.approx(9.1348e-05, rel=1e-3)
    assert errs[32] == pytest.approx(4.9254e-06, rel=1e-3)
    assert np.log2(errs[8] / errs[16]) > 3.8
    assert np.log2(errs[16] / errs[32]) > 3.8


def test_interpolate_and_projection_on_deformed_grid():
    """Nodal interpolation at deformed positions + L2 projection via the
    deformed mass band: projection beats interpolation-measured error
    class and both converge."""
    from gdm import solvers

    f = lambda m, c: np.sin(np.pi * m[0]) * np.cos(np.pi * m[1])
    g = Grid(3, (16, 16), (0.0, 0.0), (1.0, 1.0))
    ui = deform.interpolate(g, bump, f)
    ei = deform.l2_error(g, bump, ui, f)
    M = deform.mass_band(g, bump)
    b = deform.load_vector(g, bump, f)
    K = 2 * M.radius + 1
    diag = jnp.asarray(M.band_host.reshape(g.n_nodes, -1)[:, (K**2 - 1) // 2])
    x, info = solvers.cg(
        lambda u: M.apply(u), jnp.asarray(b),
        precond=solvers.jacobi_preconditioner(diag),
        max_iter=2000, rel_tol=1e-13, abs_tol=1e-30)
    ep = deform.l2_error(g, bump, np.asarray(x), f)
    # both live in the q1-chart composed space (O(h^2) class); the L2
    # projection must beat nodal interpolation in the L2 norm
    assert ei == pytest.approx(1.4362e-03, rel=1e-3)
    assert ep == pytest.approx(4.3459e-04, rel=1e-3)
    assert ep <= ei


def test_wave_ev_general_mapping():
    """wave-ev operator construction with an arbitrary mapping_fn (the
    general Parameters::mapping_q_cache_function, beyond the 1D --align
    special case): identity deformation reproduces the undeformed
    spectra digit-exactly and a real deformation shifts them."""
    from gdm.tools import eigen
    from gdm import operators

    g, _, M, S = eigen.build_ev_operators(
        fe_degree=3, n_subdivisions_1D=12, dim=1, mapping_fn=lambda p: p)
    Md = eigen.densify(
        lambda v: operators.mass(g).apply(v.reshape(g.nodes + (1,))).ravel(),
        g.n_nodes)
    assert np.abs(M - Md).max() < 1e-14
    k_id, _ = eigen.condition_number(M)

    squeeze = lambda pts: np.stack([pts[:, 0] + 0.1 * np.sin(
        np.pi * pts[:, 0] / 1.21)], -1)
    _, _, M2, S2 = eigen.build_ev_operators(
        fe_degree=3, n_subdivisions_1D=12, dim=1, mapping_fn=squeeze)
    k_def, _ = eigen.condition_number(M2)
    assert abs(k_def - k_id) > 1e-3  # the deformation is really in there
    assert np.abs(M2 - M2.T).max() < 1e-13  # symmetric operators
    assert np.abs(S2 - S2.T).max() < 1e-12


def test_vtu_output_deformed_coordinates(tmp_path):
    """DataOut under a mapping writes patch points in deformed space
    (reference data_out.h evaluated with the MappingQCache, wave
    problem.h:618): identity mapping reproduces the undeformed points,
    q1 mode lands points on the Q1 chart, exact mode on the true map."""
    from gdm.io.vtu import DataOut

    g = Grid(3, (6, 6), (0.0, 0.0), (1.0, 1.0))
    u = deform.interpolate(g, bump, lambda m, c: np.zeros_like(m[0]))

    def patch_points(**kw):
        d = DataOut(g, output_degree=1, **kw)
        d.add_data_vector(u, "u")
        pts, _, _, _ = d._patches()
        return pts[..., :2]

    p_plain = patch_points()
    p_ident = patch_points(mapping_fn=IDENT)
    p_q1 = patch_points(mapping_fn=bump, geometry="q1")
    p_exact = patch_points(mapping_fn=bump, geometry="exact")
    np.testing.assert_allclose(p_ident, p_plain, atol=1e-14)
    # degree-1 patch lattice = the cell corners, where q1 and exact agree
    np.testing.assert_allclose(p_q1, p_exact, atol=1e-14)
    moved = np.abs(p_q1 - p_plain).max()
    assert moved > 0.01  # the deformation really moved the output points
    # and the exact map of the plain points reproduces p_exact
    ref = bump(p_plain.reshape(-1, 2)).reshape(p_exact.shape)
    np.testing.assert_allclose(p_exact, ref, atol=1e-14)
    # write end-to-end
    d = DataOut(g, output_degree=2, mapping_fn=bump)
    d.add_data_vector(u, "u")
    d.write_vtu(str(tmp_path / "deformed.vtu"))
    assert (tmp_path / "deformed.vtu").exists()


def test_deformed_poisson_mg_mesh_independent():
    """Galerkin geometric MG on the Dirichlet-condensed deformed band:
    CG iterations flat in n (the deformed analog of the reference's AMG
    solver scalability, problem.h:461-469), same solution as Jacobi."""
    iters = {}
    for n in (32, 64):
        g = Grid(3, (n, n), (0.0, 0.0), (1.0, 1.0))
        u, info = poisson.solve_deformed(g, bump, RHS, precondition="mg")
        iters[n] = int(info["iterations"])
        e = deform.l2_error(g, bump, u, EXACT)
        if n == 32:
            # same discrete solution as the jacobi path pin
            uj, _ = poisson.solve_deformed(g, bump, RHS)
            np.testing.assert_allclose(np.asarray(u), np.asarray(uj),
                                       atol=1e-9)
    assert iters[32] <= 20 and iters[64] <= 20
    assert abs(iters[64] - iters[32]) <= 3


def warp3(pts):
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    s = 0.05 * np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y) * np.sin(
        2 * np.pi * z)
    return np.stack([x + s, y - 0.6 * s, z + 0.3 * s], -1)


RHS3 = lambda m, c: 3 * np.pi**2 * np.sin(np.pi * m[0]) * np.sin(
    np.pi * m[1]) * np.sin(np.pi * m[2])
EXACT3 = lambda m, c: np.sin(np.pi * m[0]) * np.sin(np.pi * m[1]) * np.sin(
    np.pi * m[2])


def test_deformed_poisson_3d():
    """The whole deformed pipeline (Q1 metric, band assembly, Dirichlet
    condensation, load vector, error integration) is dim-generic: 3D
    solve pinned sharp."""
    g = Grid(3, (8, 8, 8), (0.0,) * 3, (1.0,) * 3)
    u, info = poisson.solve_deformed(g, warp3, RHS3)
    e = deform.l2_error(g, warp3, u, EXACT3)
    assert e == pytest.approx(9.0930e-04, rel=1e-3)


@pytest.mark.slow
def test_deformed_poisson_3d_rate_mg():
    """16^3 deformed solve through the MG path: same error as jacobi's
    pin, mesh-independent iteration count (11 here, 12 at 32^3 measured
    — vs jacobi's 58 growing)."""
    g = Grid(3, (16, 16, 16), (0.0,) * 3, (1.0,) * 3)
    u, info = poisson.solve_deformed(g, warp3, RHS3, precondition="mg")
    assert int(info["iterations"]) <= 14
    e = deform.l2_error(g, warp3, u, EXACT3)
    assert e == pytest.approx(2.2348e-04, rel=1e-3)
    assert 1.7 < np.log2(9.0930e-04 / e) < 2.4  # q1-chart O(h^2) cap


def test_branching_per_point_map():
    """A per-point map with data-dependent Python branches — the exact
    shape of the reference's clamp map (wave-ev.cc:252-259) — must take
    the scalar fallback path, and per-point/vectorized forms of the
    same map must produce identical operators."""
    g = Grid(3, (8, 8), (0.0, 0.0), (1.0, 1.0))

    def clamp_pp(p):  # (dim,) -> (dim,); crashes if fed an (N, dim) chunk
        x, y = float(p[0]), float(p[1])
        if x > 0.75:
            x = 0.75 + 0.5 * (x - 0.75)
        return np.array([x, y])

    def clamp_vec(pts):
        x, y = pts[:, 0].copy(), pts[:, 1]
        sel = x > 0.75
        x[sel] = 0.75 + 0.5 * (x[sel] - 0.75)
        return np.stack([x, y], -1)

    b1 = deform.mass_band(g, clamp_pp).band_host
    b2 = deform.mass_band(g, clamp_vec).band_host
    np.testing.assert_allclose(b1, b2, atol=1e-15)


def test_solve_deformed_none_and_callable_precondition():
    g = Grid(3, (16, 16), (0.0, 0.0), (1.0, 1.0))
    u_j, info_j = poisson.solve_deformed(g, bump, RHS)
    u_n, info_n = poisson.solve_deformed(g, bump, RHS, precondition="none")
    assert int(info_n["iterations"]) != int(info_j["iterations"])
    np.testing.assert_allclose(np.asarray(u_n), np.asarray(u_j), atol=1e-9)
    # prebuilt callable is honored (amortized MG)
    A = deform.laplace_band(g, bump)
    from gdm.constraints import Constraints
    mask = np.asarray(Constraints.zero_boundary(g).full_mask).reshape(-1)
    pre = deform.multigrid_preconditioner(deform.dirichlet_band(A, mask))
    u_c, info_c = poisson.solve_deformed(g, bump, RHS, precondition=pre)
    assert int(info_c["iterations"]) <= 20
    np.testing.assert_allclose(np.asarray(u_c), np.asarray(u_j), atol=1e-9)


def test_deformed_band_sharded_apply():
    """Deformed operators are StencilOperators, so they ride the same
    domain-decomposed ppermute-halo apply as the cut solvers
    (gdm/dist/cut.py): exact serial parity on an 8-device mesh."""
    from gdm.dist.mesh import device_mesh
    from gdm.dist.cut import sharded_stencil_apply

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    g = Grid(3, (15, 15), (0.0, 0.0), (1.0, 1.0))  # 16 nodes/axis
    st = deform.laplace_band(g, bump)
    mesh = device_mesh(8)
    apply_sharded = sharded_stencil_apply(st, mesh)
    u = jnp.asarray(np.random.default_rng(2).standard_normal(g.n_nodes))
    y0 = np.asarray(st.apply(u))
    y1 = np.asarray(apply_sharded(u))
    np.testing.assert_allclose(y1, y0, rtol=1e-13, atol=1e-13)


def test_band_symmetry_and_spd():
    """Property pins: the deformed mass/stiffness bands are symmetric
    operators (band[i, off] == band[i+off, -off]) and SPD after
    Dirichlet condensation — any future assembly change that breaks
    adjoint consistency fails here."""
    from gdm.constraints import Constraints

    g = Grid(3, (7, 6), (0.0, 0.0), (1.0, 1.0))
    N = g.n_nodes
    for st in (deform.mass_band(g, bump),
               deform.laplace_band(g, bump, geometry="exact")):
        A = np.stack([np.asarray(st.apply(jnp.asarray(np.eye(N)[i])))
                      for i in range(N)], axis=1)
        assert np.abs(A - A.T).max() < 1e-12 * np.abs(A).max()
    mask = np.asarray(Constraints.zero_boundary(g).full_mask).reshape(-1)
    Abc = deform.dirichlet_band(deform.laplace_band(g, bump), mask)
    Ad = np.stack([np.asarray(Abc.apply(jnp.asarray(np.eye(N)[i])))
                   for i in range(N)], axis=1)
    assert np.abs(Ad - Ad.T).max() < 1e-12 * np.abs(Ad).max()
    evs = np.linalg.eigvalsh(Ad)
    assert evs.min() > 0.0
