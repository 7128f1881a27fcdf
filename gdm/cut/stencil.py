"""Assembled structured-stencil form of cut operators.

Any cut operator (mass, stiffness, M + dt*S) has the sparsity of the
grid's stencil graph: node i couples only to nodes within a fixed offset
radius r = p+1 (cell windows + one ghost-penalty neighbor cell).  Instead
of a sparse matrix (the reference's Trilinos path) or gather/einsum/
scatter (our matrix-free path), the operator can be stored as a
generalized band  band[node, offset]  and applied with (2r+1)^dim shifted
multiply-adds — pure VPU stencil sweeps with no scatters, which on TPU
turns the per-CG-iteration cost from scatter-bound into bandwidth-bound.

Used for the repeated solves of the time loops (mass CG every RK stage,
(M + dt S) CG for implicit Euler).  Host-side assembly from the same
tables the matrix-free path uses; parity-tested against it.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..grid import Grid
from .operators import CutOperators


class StencilOperator:
    """y[i] = sum_off band[i, off] * u[i + off] on the node lattice."""

    def __init__(self, grid: Grid, band: np.ndarray, radius: int):
        self.grid = grid
        self.radius = radius
        # private copy: a caller-side mutation of the input array must
        # not desync the host band from the cached device copy
        self.band_host = np.array(band)  # np f64, nodes + (2r+1,)*dim
        self._band = None

    @property
    def band(self):  # device copy, materialized on first apply
        if self._band is None:
            b = jnp.asarray(self.band_host)
            if isinstance(b, jax.core.Tracer):
                # first touch under an active jit trace: jnp.asarray
                # yields a trace-local constant tracer — caching it
                # would leak it into later traces (advisor round 2
                # called this branch dead; it is not)
                return b
            self._band = b
        return self._band

    def apply(self, u_flat):
        grid = self.grid
        r = self.radius
        dim = grid.dim
        u = u_flat.reshape(grid.nodes)
        pad = [(r, r)] * dim
        up = jnp.pad(u, pad)
        y = jnp.zeros(grid.nodes, u.dtype)
        K = 2 * r + 1
        for flat_off in range(K**dim):
            idx = []
            rem = flat_off
            for d in range(dim):
                idx.append(rem % K)
                rem //= K
            sl = tuple(
                slice(idx[d], idx[d] + grid.nodes[d]) for d in range(dim)
            )
            bslice = self.band[(Ellipsis,) + tuple(idx)]
            y = y + bslice * up[sl]
        return y.reshape(-1)


def _tap_table(window, grid, radius):
    """(m, m) tap indices for ONE window's (output, input) node pairs."""
    dim = grid.dim
    K = 2 * radius + 1
    w = np.asarray(window, np.int64)
    coords = np.stack(np.unravel_index(w, grid.nodes), axis=0)  # (dim, m)
    off = np.zeros((len(w), len(w)), dtype=np.int64)
    for d in range(dim):
        off = off * K + (coords[d][None, :] - coords[d][:, None] + radius)
    return off


def _window_in_band(window, grid, radius):
    """True iff every per-axis coordinate offset within this window lies
    in [-radius, radius] — the precondition for the shared-tap-table
    fast path (flat relative indices are only unambiguous then).  All
    current callers pass axis-aligned (p+1)- or 2(p+1)-wide node blocks
    that satisfy this; a future caller with odd windows falls back to
    the general per-window path instead of scattering to wrong taps."""
    coords = np.stack(np.unravel_index(np.asarray(window, np.int64),
                                       grid.nodes), axis=0)  # (dim, m)
    span = coords.max(axis=1) - coords.min(axis=1)
    return bool((span <= radius).all())


def _accumulate(band_flat, windows, mats, grid, radius):
    """band_flat: (n_nodes, K^dim); windows (n, m); mats (n, m, m).

    Every window this is called with is an axis-aligned contiguous node
    block, so the relative (output, input) tap table is the SAME for
    all n windows — computed once from the first window (verified in
    O(n*m); general per-window path as fallback).  The scatter-add is a
    single bincount on the fused (row, tap) index: per-window div/mod
    offset computation + np.add.at measured ~360 s + 55 s at the 200^2
    p=5 production assembly; this form is ~10 s."""
    dim = grid.dim
    K = 2 * radius + 1
    n, m = windows.shape
    rel = windows - windows[:, :1]
    if n and (rel == rel[0]).all() and _window_in_band(windows[0], grid,
                                                       radius):
        off = _tap_table(windows[0], grid, radius)        # (m, m)
        idx = (windows[:, :, None].astype(np.int64) * band_flat.shape[1]
               + off[None, :, :])
    else:
        # general path: per-window per-axis offsets
        strides = [1] * dim
        for d in range(dim - 2, -1, -1):
            strides[d] = strides[d + 1] * grid.nodes[d + 1]
        wi = windows[:, :, None].astype(np.int64)
        wj = windows[:, None, :].astype(np.int64)
        off_flat = np.zeros((n, m, m), dtype=np.int64)
        rem_i, rem_j = wi.copy(), wj.copy()
        for d in range(dim):
            ci = rem_i // strides[d]
            cj = rem_j // strides[d]
            rem_i = rem_i % strides[d]
            rem_j = rem_j % strides[d]
            delta = cj - ci
            assert (np.abs(delta) <= radius).all(), (
                "window pair offset exceeds the band radius — the "
                "accumulated entry has no band slot")
            off_flat = off_flat * K + (delta + radius)
        idx = wi * band_flat.shape[1] + off_flat
    band_flat += np.bincount(
        idx.reshape(-1), weights=np.asarray(mats, np.float64).reshape(-1),
        minlength=band_flat.size).reshape(band_flat.shape)


def assemble_stencil(op: CutOperators, kind: str, gamma: float,
                     nitsche_gamma: float = 0.0, with_nitsche: bool = False,
                     gp_power: int = 3, with_bdry_nitsche: bool = False,
                     inactive_identity: bool = True) -> StencilOperator:
    """Assemble the cut mass ('mass') or stiffness ('stiff') operator into
    stencil-band form (including ghost penalty and, optionally, the 0->1
    inactive identity and the domain-boundary Nitsche terms of the
    matrix-free RHS path)."""
    grid = op.grid
    dim = grid.dim
    p = grid.degree
    radius = p + 1  # GP couples adjacent cell windows
    K = 2 * radius + 1
    band = np.zeros((grid.n_nodes, K**dim))

    if kind == "mass":
        if len(op.full_ids):
            _accumulate(band, op.w_full, op.A_mass[op.cat_full], grid, radius)
        if len(op.cut_ids):
            mats = np.einsum("nqi,nqj,nq->nij", op.V_cut, op.V_cut, op.vol_w)
            _accumulate(band, op.w_cut, mats, grid, radius)
    elif kind == "stiff":
        if len(op.full_ids):
            _accumulate(band, op.w_full, op.A_stiff[op.cat_full], grid, radius)
        if len(op.cut_ids):
            mats = np.einsum("nqdi,nqdj,nq->nij", op.G_cut, op.G_cut,
                             op.vol_w)
            if with_nitsche:
                Gn = np.einsum("nqdi,nqd->nqi", op.G_surf, op.surf_n)
                mats = mats + np.einsum(
                    "nqi,nqj,nq->nij",
                    (nitsche_gamma / op.h_min) * op.V_surf - Gn,
                    op.V_surf, op.surf_w)
                mats = mats - np.einsum("nqi,nqj,nq->nij", Gn, op.V_surf,
                                        op.surf_w).transpose(0, 2, 1)
            _accumulate(band, op.w_cut, mats, grid, radius)
    else:
        raise ValueError(kind)

    if with_bdry_nitsche and len(op.b_win):
        Gn = np.einsum("nqdi,nqd->nqi", op.b_G, op.b_normal_q)
        mats = np.einsum(
            "nqi,nqj,nq->nij",
            (nitsche_gamma / op.h_min) * op.b_V - Gn, op.b_V, op.b_w)
        mats = mats - np.einsum("nqi,nqj,nq->nij", Gn, op.b_V,
                                op.b_w).transpose(0, 2, 1)
        _accumulate(band, op.b_win, mats, grid, radius)

    if len(op.gp_win):
        scale = gamma * op.h_min**gp_power
        _accumulate(band, op.gp_win, scale * op.gp_mat, grid, radius)

    center = (K**dim - 1) // 2
    if inactive_identity:
        band[op.inactive, center] += 1.0

    return StencilOperator(grid, band.reshape(grid.nodes + (K,) * dim),
                           radius)


def _local_blocks(band_flat, windows, grid, radius):
    """Extract exact global submatrices A[win, win] (n, m, m) from the
    band form (entries farther than `radius` on any axis are 0)."""
    dim = grid.dim
    K = 2 * radius + 1
    n, m = windows.shape
    strides = [1] * dim
    for d in range(dim - 2, -1, -1):
        strides[d] = strides[d + 1] * grid.nodes[d + 1]
    wi = windows[:, :, None].astype(np.int64)
    wj = windows[:, None, :].astype(np.int64)
    off_flat = np.zeros((n, m, m), dtype=np.int64)
    valid = np.ones((n, m, m), dtype=bool)
    rem_i, rem_j = wi.copy(), wj.copy()
    for d in range(dim):
        ci = rem_i // strides[d]
        cj = rem_j // strides[d]
        rem_i = rem_i % strides[d]
        rem_j = rem_j % strides[d]
        delta = cj - ci
        valid &= np.abs(delta) <= radius
        off_flat = off_flat * K + np.clip(delta + radius, 0, K - 1)
    rows = np.broadcast_to(wi, (n, m, m))
    loc = np.where(valid, band_flat[rows, off_flat], 0.0)
    return loc


def schwarz_jacobi_preconditioner(st: StencilOperator, windows,
                                  overlap_weighted: bool = False):
    """Additive Schwarz over the given dof windows + point Jacobi on the
    remaining dofs — the TPU-native counterpart of the reference's ILU
    for the badly cut mass systems (parameters.h:32 'ILU';
    problem.h:244-257 ReductionControl CG).

    The GP'd cut mass matrix is SPD but near-singular (min eig ~1e-12
    relative on sliver-cut p=5 configurations): point-Jacobi CG stalls
    around 1e-5 after 1000 iterations, which turns the advection time
    loop into noise amplification (the factor-8/9 parallel-ramp rows).
    Its near-null modes are LOCAL to cut-cell windows, so exact dense
    solves of the window submatrices (batched (m, m) inverses, applied
    as gather -> einsum -> scatter-add) restore CG convergence.  Plain
    (unweighted) additive Schwarz keeps the preconditioner symmetric
    positive definite, as CG requires.

    overlap_weighted: symmetric overlap scaling B = C^{-1/2} M C^{-1/2}
    with M the plain additive-Schwarz sum and C = diag(#windows
    covering each dof).  Plain additive Schwarz over the heavily
    overlapping cut windows has rho(BA) ~ overlap count (~(p+1)^dim),
    fine inside CG (which rescales step lengths) but DIVERGENT as a
    damped-Richardson smoother; the symmetric weighting brings
    rho(BA) to O(1) so multigrid smoothing works (gdm/cut/multigrid.py).
    Still SPD: each weighted term is a congruence of an SPD block.
    """
    grid = st.grid
    dim = grid.dim
    K = 2 * st.radius + 1
    band_flat = np.asarray(st.band_host, np.float64).reshape(
        grid.n_nodes, K**dim)
    center = (K**dim - 1) // 2
    diag = band_flat[:, center]
    covered = np.zeros(grid.n_nodes, dtype=bool)
    windows = np.asarray(windows)
    if windows.size:
        covered[windows.reshape(-1)] = True
        loc = _local_blocks(band_flat, windows, grid, st.radius)
        if not jax.config.jax_enable_x64:
            # f32 path: the exact inverse of a kappa~1e12 block rounds
            # to garbage (possibly indefinite) in f32, which DESTABILIZES
            # preconditioned CG (observed: the composite DoD f32 run
            # blows up x100/step while f64 is stable).  A relative ridge
            # of ~f32 eps caps the block condition at ~1e7 — everything
            # f32 can express — while still resolving the bad modes far
            # beyond point Jacobi.
            m = loc.shape[-1]
            d = np.einsum("nii->ni", loc)
            ridge = 1e-7 * d.max(axis=1)
            loc = loc + ridge[:, None, None] * np.eye(m)
        inv = np.linalg.inv(loc)
        inv_d = jnp.asarray(inv)
        win_d = jnp.asarray(windows)
    safe = np.where(diag == 0.0, 1.0, diag)
    jac = np.where(covered, 0.0, 1.0 / safe)  # diag==0 -> 1.0 (inactive)
    jac_d = jnp.asarray(jac)

    if not windows.size:
        return lambda r: jac_d * r

    if overlap_weighted:
        counts = np.zeros(grid.n_nodes)
        np.add.at(counts, windows.reshape(-1), 1.0)
        w_half = jnp.asarray(np.where(counts > 0, 1.0 / np.sqrt(counts),
                                      0.0))

        def precondition(r):
            z = jac_d * r
            rs = w_half * r
            zl = jnp.einsum("nij,nj->ni", inv_d, rs[win_d])
            z2 = jnp.zeros_like(r).at[win_d.reshape(-1)].add(
                zl.reshape(-1))
            return z + w_half * z2

        return precondition

    def precondition(r):
        z = jac_d * r
        rl = r[win_d]
        zl = jnp.einsum("nij,nj->ni", inv_d, rl)
        return z.at[win_d.reshape(-1)].add(zl.reshape(-1))

    return precondition


def schwarz_band(st: StencilOperator, windows) -> StencilOperator:
    """The additive Schwarz(+Jacobi) preconditioner ASSEMBLED into
    stencil-band form.

    B = sum_w R_w^T A[w, w]^{-1} R_w  (+ point Jacobi on uncovered rows)
    has exactly the window-stencil sparsity (all window-internal offsets
    are <= p per axis, padded here to the operator's radius so B shares
    its padded kernel layout).  Same math as
    schwarz_jacobi_preconditioner, but applied as ONE fused band kernel
    per CG iteration instead of a gather -> batched solve -> scatter
    (TPU gathers run at ~150 M elem/s: the gather form costs ~1 ms per
    application at 128^2 where the band form costs ~2 us)."""
    grid = st.grid
    dim = grid.dim
    K = 2 * st.radius + 1
    band_flat = np.asarray(st.band_host, np.float64).reshape(
        grid.n_nodes, K**dim)
    center = (K**dim - 1) // 2
    diag = band_flat[:, center]
    covered = np.zeros(grid.n_nodes, dtype=bool)
    bandB = np.zeros_like(band_flat)
    windows = np.asarray(windows)
    if windows.size:
        covered[windows.reshape(-1)] = True
        loc = _local_blocks(band_flat, windows, grid, st.radius)
        if not jax.config.jax_enable_x64:
            # same f32 ridge rationale as schwarz_jacobi_preconditioner
            m = loc.shape[-1]
            d = np.einsum("nii->ni", loc)
            ridge = 1e-7 * d.max(axis=1)
            loc = loc + ridge[:, None, None] * np.eye(m)
        _accumulate(bandB, windows, np.linalg.inv(loc), grid, st.radius)
    safe = np.where(diag == 0.0, 1.0, diag)
    bandB[:, center] += np.where(covered, 0.0, 1.0 / safe)
    return StencilOperator(grid, bandB.reshape(grid.nodes + (K,) * dim),
                           st.radius)


def best_solver_apply(op: CutOperators, kind: str, gamma: float,
                      nitsche_gamma: float = 0.0,
                      with_nitsche: bool = False,
                      max_band_entries: float = 3e7):
    """The fastest apply for solver-inner-loop use.

    On TPU (2D): the split separable-Kronecker + interface-correction
    apply whose heavy part is the fused mxu3p Pallas kernel
    (gdm/cut/fastapply.py) — the same kernel family bench.py reports.
    Elsewhere: the stencil-band form when its memory is modest, else the
    matrix-free form.  Opt out of the Pallas path with
    GDM_DISABLE_PALLAS=1.
    """
    import os

    if (op.grid.dim == 2 and os.environ.get("GDM_DISABLE_PALLAS") != "1"):
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = None
        if platform in ("tpu", "axon"):
            from .fastapply import fast_stencil_apply

            st = assemble_stencil(op, kind, gamma, nitsche_gamma,
                                  with_nitsche)
            fast = fast_stencil_apply(st, op, kind)
            if fast is not None:
                return fast
    K = 2 * (op.grid.degree + 1) + 1
    if op.grid.n_nodes * K**op.grid.dim <= max_band_entries:
        return assemble_stencil(op, kind, gamma, nitsche_gamma,
                                with_nitsche).apply
    if kind == "mass":
        return lambda v: op.mass_apply(v, gamma)
    return lambda v: op.stiffness_matrix_apply(v, gamma, nitsche_gamma,
                                               with_nitsche)
