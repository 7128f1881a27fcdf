"""Adjudicate prototypes/cut_advection_01_gdm.output (previously unrun).

The prototype (prototypes/cut_advection_01_gdm.cc) is NOT the advection
app: it solves du/dt + a.grad(u) = 0 on the half-plane above the line
through (0.2, 0) with slope tan(phi)=0.5, with

* volume term only, in STRONG form -(a.grad u, v) over the inside
  region (cut_advection_01_gdm.cc:336-352) — no embedded upwind flux,
  NO ghost penalty;
* STRONG nodal Dirichlet on the x=0 and y=0 faces (boundary ids 0 and 2,
  colorize=true in system.h:379) re-interpolated at every RK stage time
  (cut_advection_01_gdm.cc:273-284);
* an inhomogeneous-constraint lifting  vec_1 -= M_hom @ E(g(t)) with
  constrained rows zeroed (cut_advection_01_gdm.cc:360-368);
* mass CG with constrained matrix (rows/cols eliminated), Jacobi,
  reduction 1e-8 (cut_advection_01_gdm.cc:371-376).

We built the full faithful replica (this file's _setup densifies the
exact mass and strong-form advection matrices, including the
diag==0 -> 1 fixup for the degenerately-cut cells the plane slices
exactly through lattice nodes) and found the committed golden is NOT
reproducible from the committed source:

1. the golden's t=0 row (pure interpolation error, solver-free) is
   600x larger than the committed exact solution's — see
   test_prototype_goldens_stale.py;
2. without ghost penalty, sliver dofs give rho(M^-1 A) * dt ≈ 623 —
   every converged mass solve makes classic RK4 blow up within a few
   steps, while the golden decays smoothly for 140 steps (the original
   run survived only through the unconverged-CG filtering of an
   earlier configuration).

What this file pins instead: the instability measurement itself, and
the fact that the cut apps' gamma_M mass ghost penalty removes it.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gdm.grid import Grid
from gdm.cut.geometry import INSIDE, CutGeometry
from gdm.cut.operators import CutOperators
from gdm.cut.advection import AdvectionOperators
from gdm.cut.stencil import assemble_stencil

GOLDEN = "/root/reference/prototypes/cut_advection_01_gdm.output"

PHI = np.arctan(0.5)
X_SHIFT = 0.2
ADV = np.array([2.0 * np.cos(PHI), 2.0 * np.sin(PHI)])


def exact(pts, t):
    # jnp so it is usable both host-side and inside jitted error norms
    pos = jnp.asarray(pts) - t * jnp.asarray(ADV)
    x_hat = (np.cos(PHI) * (pos[..., 0] - X_SHIFT)
             + np.sin(PHI) * pos[..., 1])
    return jnp.sin(np.sqrt(2.0) * np.pi * x_hat / (1.0 - X_SHIFT))


def level_set(mesh):
    # deal.II Functions::SignedDistance::Plane with point (0.2, 0),
    # normal (sin phi, -cos phi); inside = negative
    return np.sin(PHI) * (mesh[0] - X_SHIFT) - np.cos(PHI) * mesh[1]


def band_to_dense(st):
    """Densify a StencilOperator (y[i] = sum_off band[i,off] u[i+off])."""
    grid = st.grid
    r = st.radius
    K = 2 * r + 1
    n = grid.n_nodes
    band = np.asarray(st.band).reshape(n, K**grid.dim)
    A = np.zeros((n, n))
    N = grid.nodes
    idx = np.arange(n)
    coords = np.stack(np.unravel_index(idx, N), axis=-1)
    for flat_off in range(K**grid.dim):
        rem = flat_off
        off = []
        for _ in range(grid.dim):
            off.append(rem % K - r)
            rem //= K
        tgt = coords + np.asarray(off)
        ok = np.all((tgt >= 0) & (tgt < np.asarray(N)), axis=1)
        j = np.ravel_multi_index(tuple(tgt[ok].T), N)
        A[idx[ok], j] += band[ok, flat_off]
    return A


def assemble_dense_advection_strong(op: CutOperators, a):
    """Dense A with A_ij = integral_inside  phi_i (a . grad phi_j)."""
    n = op.grid.n_nodes
    A = np.zeros((n, n))
    adv = AdvectionOperators(op, a)
    if len(op.full_ids):
        # _full_matrices are the weak-form (u a, grad v) local matrices
        # weak_ij = int (a.grad phi_i) phi_j; strong form = transpose
        weak = adv._full_matrices()[op.cat_full]
        mats = np.transpose(weak, (0, 2, 1))
        for w, m in zip(op.w_full, mats):
            A[np.ix_(w, w)] += m
    if len(op.cut_ids):
        Ga = np.einsum("nqdi,d->nqi", op.G_cut, a)
        mats = np.einsum("nqi,nqj,nq->nij", op.V_cut, Ga, op.vol_w)
        for w, m in zip(op.w_cut, mats):
            A[np.ix_(w, w)] += m
    return A


def _setup(gamma_M=0.0):
    p = 3
    n = 40
    grid = Grid(p, (n, n), (0.0, 0.0), (1.0, 1.0))
    geo = CutGeometry.build(grid, level_set, 1)
    op = CutOperators(geo, INSIDE)

    M_hom = band_to_dense(assemble_stencil(op, "mass", gamma_M))
    A_adv = assemble_dense_advection_strong(op, ADV)

    # the plane passes exactly through lattice nodes, so some cells are
    # degenerately cut (zero inside measure); their window nodes have
    # exactly-zero mass rows.  The prototype's own fixup handles this:
    # "if diag == 0 -> 1" (cut_advection_01_gdm.cc:248-252), leaving
    # those nodes frozen (A rows are zero too) exactly like deal.II's
    # classifier, which calls such cells outside.
    zd = np.where(np.diag(M_hom) == 0.0)[0]
    M_hom[zd, zd] = 1.0

    mesh = grid.node_coords_mesh()
    bc = ((mesh[0] == 0.0) | (mesh[1] == 0.0)).reshape(-1)
    pts = np.stack(mesh, axis=-1).reshape(-1, 2)
    interior = ~bc
    return grid, op, M_hom, A_adv, bc, pts, interior


DT = (1.0 / 40) * 0.4 / (2 * 3 + 1) / 2.0  # cut_advection_01_gdm.cc:101


def test_committed_config_is_rk4_unstable():
    """The committed configuration has no ghost penalty, so sliver dofs
    (mass diagonal down to ~1e-10) make rho(M^-1 A) * dt orders of
    magnitude beyond any RK stability region: the committed golden's
    smooth 140-step trajectory is not reproducible from the committed
    source by a converged mass solve (see also
    test_prototype_goldens_stale.py for the solver-free t=0 proof)."""
    import scipy.linalg

    grid, op, M_hom, A_adv, bc, pts, interior = _setup(gamma_M=0.0)
    lu = scipy.linalg.lu_factor(M_hom[np.ix_(interior, interior)])
    A_II = A_adv[np.ix_(interior, interior)]
    rng = np.random.default_rng(0)
    v = rng.standard_normal(A_II.shape[0])
    nv = 0.0
    for _ in range(60):
        v = scipy.linalg.lu_solve(lu, A_II @ v)
        nv = np.linalg.norm(v)
        v /= nv
    assert nv * DT > 50.0, nv * DT
    assert nv * DT == pytest.approx(623.5, rel=0.05)


def test_ghost_penalty_cures_mass_conditioning():
    """With the standard mass ghost penalty (gamma_M = 0.25 sqrt(3))
    the spectral radius collapses from ~6e2/dt to ~0.21/dt — the sliver
    modes were the mass matrix's, exactly the instability the cut apps'
    gamma_M stabilization exists to remove (wave-app.cc:242-245).
    Committed pins of both measurements.  (The stabilized strong-BC
    discretization still has weakly unstable boundary modes — the cut
    apps use the upwind-flux weak form instead, which the advection-app
    goldens validate; this prototype's scheme is simply not stable.)"""
    import scipy.linalg

    def rho_dt(gamma_M):
        grid, op, M, A, bc, pts, interior = _setup(gamma_M=gamma_M)
        lu = scipy.linalg.lu_factor(M[np.ix_(interior, interior)])
        A_II = A[np.ix_(interior, interior)]
        rng = np.random.default_rng(0)
        v = rng.standard_normal(A_II.shape[0])
        nv = 0.0
        for _ in range(80):
            v = scipy.linalg.lu_solve(lu, A_II @ v)
            nv = np.linalg.norm(v)
            v /= nv
        return nv * DT

    assert rho_dt(0.25 * np.sqrt(3.0)) == pytest.approx(0.209, rel=0.05)
