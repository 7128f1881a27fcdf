"""Matrix-free cut advection operator (upwind embedded/boundary fluxes,
BC values as extra ODE unknowns).

Reference: applications/advection/include/gdm/advection/stiffness.h.
Weak form with alpha=0 (stiffness.h:256,408-417):
    r(v) = (u a, grad v)_K
         + <(a.n) (-(a.n >= 0 ? u^- : u^+)), v>_{surface + boundary}
         - gamma_A h^2 <[d_n v],[d_n u]>_GP-faces        (net, see below)
The boundary values u^+ live in their own blocks and evolve through RK
stages with d(bc)/dt = exact_solution_der (stiffness.h:285-289), making
Runge-Kutta stages see stage-consistent boundary data.

GP counting: the reference visits faces twice with 0.5 (stiffness.h:585),
we enumerate once -> net scale gamma_A * h^2.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .operators import CutOperators


class AdvectionOperators:
    """Wraps a CutOperators data set with advection-specific applies.

    velocity: constant advection vector for this location's subdomain.
    """

    def __init__(self, ops: CutOperators, velocity):
        self.ops = ops
        self.a = np.asarray(velocity, dtype=np.float64)
        # per-point fluxes a.n on the embedded surface and boundary faces
        self.flux_surf = np.einsum("nqd,d->nq", ops.surf_n, self.a)
        self.flux_bdry = np.einsum("nd,d->n", ops.b_normal, self.a)[:, None] * \
            np.ones_like(ops.b_w)

    # -- rhs ------------------------------------------------------------
    def compute_rhs(self, u, bc_surf, bc_bdry, gamma_A, u_other=None):
        """Advection RHS for one location.

        bc_surf: (n_cut, Qs) boundary values at embedded-surface quadrature
        points (used when u_other is None, i.e. non-composite);
        bc_bdry: (n_bf, Qb) values at domain-boundary face points.
        u_other: the other block's node vector (composite coupling).
        """
        ops = self.ops
        y = jnp.zeros_like(u)

        # (I) cell term (u a, grad v)
        if len(ops.full_ids):
            mats = jnp.asarray(self._full_matrices())[jnp.asarray(ops.cat_full)]
            win = jnp.asarray(ops.w_full)
            y = y.at[win.reshape(-1)].add(
                jnp.einsum("nij,nj->ni", mats, u[win]).reshape(-1))
        if len(ops.cut_ids):
            G = jnp.asarray(ops.G_cut)
            V = jnp.asarray(ops.V_cut)
            w = jnp.asarray(ops.vol_w)
            win = jnp.asarray(ops.w_cut)
            uq = jnp.einsum("nqi,ni->nq", V, u[win])
            Ga = jnp.einsum("nqdi,d->nqi", G, jnp.asarray(self.a))
            y = y.at[win.reshape(-1)].add(
                jnp.einsum("nqi,nq,nq->ni", Ga, uq, w).reshape(-1))

        # (II) embedded-surface upwind flux
        if len(ops.cut_ids):
            V = jnp.asarray(ops.V_surf)
            w = jnp.asarray(ops.surf_w)
            win = jnp.asarray(ops.w_cut)
            flux = jnp.asarray(self.flux_surf)
            um = jnp.einsum("nqi,ni->nq", V, u[win])
            if u_other is not None:
                up = jnp.einsum("nqi,ni->nq", V, u_other[win])
            else:
                up = bc_surf
            upwind = jnp.where(flux >= 0.0, um, up)
            y = y.at[win.reshape(-1)].add(
                jnp.einsum("nqi,nq,nq->ni", V, -flux * upwind, w).reshape(-1))

        # (III) domain-boundary upwind flux
        if len(ops.b_win):
            V = jnp.asarray(ops.b_V)
            w = jnp.asarray(ops.b_w)
            win = jnp.asarray(ops.b_win)
            flux = jnp.asarray(self.flux_bdry)
            um = jnp.einsum("nqi,ni->nq", V, u[win])
            upwind = jnp.where(flux >= 0.0, um, bc_bdry)
            y = y.at[win.reshape(-1)].add(
                jnp.einsum("nqi,nq,nq->ni", V, -flux * upwind, w).reshape(-1))

        # (IV) ghost penalty, h^2 scaling
        y = ops._gp_apply(y, u, -gamma_A * ops.h_min**2)
        return y

    def compute_rhs_strong(self, u, gamma_A=0.0):
        """Advection RHS in the alpha=1 (non-integrated-by-parts) form
        used by the reference's STRONG-Dirichlet path
        (prototypes/advection_02_gdm.cc:424-427 with alpha=1.0,
        weak_bc=false): r(v) = -(a . grad u, v)_K, no boundary-face flux
        terms; boundary values are enforced nodally by the caller."""
        ops = self.ops
        y = jnp.zeros_like(u)
        if len(ops.full_ids):
            mats = jnp.asarray(
                self._full_matrices_strong())[jnp.asarray(ops.cat_full)]
            win = jnp.asarray(ops.w_full)
            y = y.at[win.reshape(-1)].add(
                jnp.einsum("nij,nj->ni", mats, u[win]).reshape(-1))
        if len(ops.cut_ids):
            G = jnp.asarray(ops.G_cut)
            V = jnp.asarray(ops.V_cut)
            w = jnp.asarray(ops.vol_w)
            win = jnp.asarray(ops.w_cut)
            gq = jnp.einsum("nqdi,ni,d->nq", G, u[win], jnp.asarray(self.a))
            y = y.at[win.reshape(-1)].add(
                jnp.einsum("nqi,nq,nq->ni", V, -gq, w).reshape(-1))
        y = ops._gp_apply(y, u, -gamma_A * ops.h_min**2)
        return y

    def _full_matrices_strong(self):
        """(ncat^dim, m, m) cell matrices -(a . grad u, v)."""
        if not hasattr(self, "_full_mats_strong"):
            from ..ops1d import local_matrices_1d

            grid = self.ops.grid
            p = grid.degree
            dim = grid.dim
            ncat = max(p, 1)
            A00 = local_matrices_1d(p, 0, 0, self.ops.nq)
            A01 = local_matrices_1d(p, 0, 1, self.ops.nq)
            mats = np.zeros(((ncat,) * dim) + ((p + 1) ** dim,
                                               (p + 1) ** dim))
            for combo in np.ndindex(*([ncat] * dim)):
                total = 0.0
                for dd in range(dim):
                    if self.a[dd] == 0.0:
                        continue
                    term = np.ones((1, 1))
                    for d in range(dim):
                        if d == dd:
                            f = A01[combo[d]] * (-self.a[dd])  # h^0
                        else:
                            f = A00[combo[d]] * grid.h[d]
                        term = np.kron(f, term)
                    total = total + term
                mats[combo] = total
            m = (p + 1) ** dim
            self._full_mats_strong = np.transpose(
                mats, tuple(range(dim - 1, -1, -1)) + (dim, dim + 1)
            ).reshape(-1, m, m)
        return self._full_mats_strong

    def _full_matrices(self):
        """(ncat^dim, m, m) cell advection matrices (u a, grad v)."""
        if not hasattr(self, "_full_mats"):
            from ..ops1d import local_matrices_1d

            grid = self.ops.grid
            p = grid.degree
            dim = grid.dim
            ncat = max(p, 1)
            A00 = local_matrices_1d(p, 0, 0, self.ops.nq)
            A10 = local_matrices_1d(p, 1, 0, self.ops.nq)
            mats = np.zeros(((ncat,) * dim) + ((p + 1) ** dim, (p + 1) ** dim))
            for combo in np.ndindex(*([ncat] * dim)):
                total = 0.0
                for dd in range(dim):
                    if self.a[dd] == 0.0:
                        continue
                    term = np.ones((1, 1))
                    for d in range(dim):
                        if d == dd:
                            f = A10[combo[d]] * self.a[dd]  # h^0
                        else:
                            f = A00[combo[d]] * grid.h[d]
                        term = np.kron(f, term)
                    total = total + term
                mats[combo] = total
            m = (p + 1) ** dim
            self._full_mats = np.transpose(
                mats, tuple(range(dim - 1, -1, -1)) + (dim, dim + 1)
            ).reshape(-1, m, m)
        return self._full_mats

    # -- surface error norms --------------------------------------------
    def surface_error_norms(self, u, exact_fn, t):
        ops = self.ops
        if not len(ops.cut_ids):
            z = jnp.asarray(0.0)
            return z, z, z
        V = jnp.asarray(ops.V_surf)
        w = jnp.asarray(ops.surf_w)
        uq = jnp.einsum("nqi,ni->nq", V, u[jnp.asarray(ops.w_cut)])
        ex = exact_fn(ops.surf_phys_q, t)
        d = uq - ex
        l2 = jnp.sqrt(jnp.sum(d * d * w))
        l1 = jnp.sum(jnp.abs(d) * w)
        mask = w > 0
        linf = jnp.max(jnp.where(mask, jnp.abs(d), 0.0))
        return l2, l1, linf
