"""Roofline fast path for the CUT stencil-band operators (2D).

The assembled cut operators (mass, stiffness, M + dt*S) are, away from
the interface, exactly TWO Kronecker pairs of 1D GD bands:

    mass       M0 (x) M1
    stiffness  S0 (x) M1 + M0 (x) S1
    M + dt*S   (M0 + dt*S0) (x) M1 + dt*M0 (x) S1

Only rows whose stencil support touches a non-full-inside cell (or a
ghost-penalty / boundary-Nitsche window) differ — an O(interface) set.
The streamed generic band kernel (gdm/ops/pallas_cutband.py) pays
(2r+1)^2 * 4 B/dof of HBM for every row; this split pays the separable
kernel's 8 B/dof plus a small gather/einsum/scatter correction:

    y = where(inactive, u, A0 U A1^T + B0 U B1^T) + scatter(corr_n . u_win)

* the separable part rides the SAME fused mxu3p kernel as the uncut
  Laplace (gdm/ops/pallas_stencil2.make_padded_laplace2 with bands=...)
  — 38 GDoF/s at 1024^2 p=3 vs the 2.5 GDoF/s HBM ceiling of streaming
  the whole band;
* correction rows are found GEOMETRICALLY (a node is standard iff every
  cell containing it is full-inside and it is in no GP/boundary-Nitsche
  window), their values are the numeric difference
  assembled_row - separable_row, so the split is exact to roundoff
  (parity-tested against StencilOperator.apply at 1e-12).

Reference counterpart: the Trilinos sparse matvec inside SolverCG
(applications/wave/include/gdm/wave/problem.h:471-502) — the reference
pays sparse-matrix bandwidth for every row; the structure exploited here
is invisible to a generic sparse format.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..grid import Grid
from ..ops1d import mass_1d, stiffness_1d
from .operators import CutOperators
from .stencil import StencilOperator


def kron_pairs(grid: Grid, kind: str, dt: float = None):
    """The separable Kronecker pairs of a cut operator kind (2D)."""
    S0 = stiffness_1d(grid.degree, grid.cells[0], grid.h[0]).band
    M0 = mass_1d(grid.degree, grid.cells[0], grid.h[0]).band
    S1 = stiffness_1d(grid.degree, grid.cells[1], grid.h[1]).band
    M1 = mass_1d(grid.degree, grid.cells[1], grid.h[1]).band
    if kind == "mass":
        return [(M0, M1)]
    if kind == "stiff":
        return [(S0, M1), (M0, S1)]
    if kind == "heat_impl":  # M + dt*S
        return [(M0 + dt * S0, M1), (dt * M0, S1)]
    raise ValueError(kind)


def _standard_mask(op: CutOperators):
    """Nodes whose assembled row equals the separable row: every cell
    containing the node is full-inside, and the node is in no GP or
    boundary-Nitsche window."""
    grid = op.grid
    N = grid.n_nodes
    p = grid.degree
    # per-axis window multiplicity of each node (every cell's window)
    cnt1d = []
    for d in range(grid.dim):
        c = np.zeros(grid.nodes[d], np.int64)
        off = grid.offsets(d)
        for o in off:
            c[o : o + p + 1] += 1
        cnt1d.append(c)
    cnt_all = np.multiply.outer(cnt1d[0], cnt1d[1]).reshape(-1)
    cnt_full = np.zeros(N, np.int64)
    if len(op.w_full):
        np.add.at(cnt_full, op.w_full.reshape(-1), 1)
    flagged = np.zeros(N, bool)
    for w in (op.gp_win, op.b_win):
        if len(w):
            flagged[w.reshape(-1)] = True
    return (~op.inactive) & (cnt_full == cnt_all) & ~flagged


def make_fast_cut_apply(st: StencilOperator, op: CutOperators, pairs,
                        use_pallas: str = "auto", dtype=None,
                        interpret: bool = False, tile_r: int = 96,
                        rows: str = "mxu3p", inactive_identity: bool = True):
    """Flat-vector apply equal to ``st.apply`` (to roundoff), built as
    separable-Kronecker part + O(interface) correction rows.

    use_pallas: "auto" (fused kernel on TPU, XLA sweeps elsewhere),
    "never" (XLA sweeps), "force" (fused kernel, interpretable).
    inactive_identity: whether ``st`` carries the 0->1 identity on
    inactive rows (solver operators) or zero rows there (the explicit
    RHS stiffness assembled with inactive_identity=False).
    """
    grid = st.grid
    assert grid.dim == 2
    p = grid.degree
    r = st.radius
    K1 = 2 * p + 1
    K2 = 2 * r + 1
    N0, N1 = grid.nodes
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # ---- correction rows (host) --------------------------------------
    standard = _standard_mask(op)
    custom = (~standard) & (~op.inactive)
    cidx = np.where(custom)[0]
    i0 = cidx // N1
    i1 = cidx % N1
    # separable rows embedded into the (K2, K2) band at offset r - p
    sep = np.zeros((len(cidx), K2, K2))
    e = r - p
    for a0, a1 in pairs:
        sep[:, e : e + K1, e : e + K1] += np.einsum(
            "na,nb->nab", a0[i0], a1[i1])
    band = np.asarray(st.band_host).reshape(N0 * N1, K2, K2)
    corr = band[cidx] - sep
    # window node indices (clipped; out-of-range taps have corr == 0)
    dy, dx = np.meshgrid(np.arange(K2) - r, np.arange(K2) - r,
                         indexing="ij")
    t0 = np.clip(i0[:, None, None] + dy[None], 0, N0 - 1)
    t1 = np.clip(i1[:, None, None] + dx[None], 0, N1 - 1)
    cwin = (t0 * N1 + t1).reshape(len(cidx), K2 * K2)
    corr = corr.reshape(len(cidx), K2 * K2)

    corr_d = jnp.asarray(corr, dtype)
    cwin_d = jnp.asarray(cwin)
    cidx_d = jnp.asarray(cidx)
    inactive_d = jnp.asarray(op.inactive)

    # ---- separable part ----------------------------------------------
    (a0, a1) = pairs[0]
    (b0, b1) = pairs[1] if len(pairs) > 1 else (np.zeros_like(a0),
                                                np.zeros_like(a1))
    sep_fn = None
    if use_pallas in ("auto", "force"):
        try:
            if interpret or use_pallas == "force" or \
                    jax.devices()[0].platform in ("tpu", "axon"):
                from ..ops.pallas_stencil2 import make_padded_laplace2

                ap, pad, unpad, _ = make_padded_laplace2(
                    grid, dtype, tile_r=tile_r, rows=rows,
                    interpret=interpret, bands=(a0, a1, b0, b1))

                def sep_fn(u):
                    return unpad(ap(pad(u.reshape(N0, N1))))
        except Exception:
            if use_pallas == "force":
                raise
            sep_fn = None
    if sep_fn is None:
        from ..ops.tensor import apply_banded

        a0j, a1j = jnp.asarray(a0, dtype), jnp.asarray(a1, dtype)
        b0j, b1j = jnp.asarray(b0, dtype), jnp.asarray(b1, dtype)
        two = len(pairs) > 1

        def sep_fn(u):
            U = u.reshape(N0, N1)
            y = apply_banded(apply_banded(U, a1j, 1), a0j, 0)
            if two:
                y = y + apply_banded(apply_banded(U, b1j, 1), b0j, 0)
            return y

    def apply(u_flat):
        y = sep_fn(u_flat).reshape(-1)
        y = jnp.where(inactive_d,
                      u_flat if inactive_identity else 0.0, y)
        if len(cidx):
            uw = u_flat[cwin_d]
            y = y.at[cidx_d].add(
                jnp.einsum("nq,nq->n", corr_d, uw.astype(dtype)))
        return y

    return apply


def fast_stencil_apply(st: StencilOperator, op: CutOperators, kind: str,
                       dt: float = None, inactive_identity: bool = True):
    """The fastest cut-operator apply on TPU, or None (callers keep
    st.apply; also for dim != 2).  Opt out with GDM_DISABLE_PALLAS=1.

    Currently dispatches the STREAMED fused band kernel
    (gdm/ops/pallas_cutband.py: one pallas launch per apply, u rolled
    once per lane shift, per-tap coefficient planes double-buffered from
    HBM) — measured 1.8 us/apply for the separable Pallas part alone at
    128^2 but 1050 us for the split design's (n_custom, K^2) gather
    (TPU gathers run at ~150 M elem/s), so the split apply
    (make_fast_cut_apply) stays opt-in until its correction is
    gather-free.  kind/dt are accepted for that future dispatch.
    """
    import os

    if st.grid.dim != 2:
        return None
    if os.environ.get("GDM_DISABLE_PALLAS") == "1":
        return None
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return None
    if platform not in ("tpu", "axon"):
        return None
    from ..ops.pallas_cutband import stencil_apply_fn

    return stencil_apply_fn(st)


def fast_stencil_bundle(st: StencilOperator):
    """(apply_padded, pad, unpad) of the fused band kernel on TPU, or
    None.  Lets solver loops run ENTIRELY in the padded kernel layout
    (guard zeros contribute nothing to CG dot products and the layout is
    closed under the apply), saving the per-iteration pad/unpad copies
    of the flat wrapper."""
    import os

    if st.grid.dim != 2:
        return None
    if os.environ.get("GDM_DISABLE_PALLAS") == "1":
        return None
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return None
    if platform not in ("tpu", "axon"):
        return None
    try:
        from ..ops.pallas_cutband import make_padded_stencil2

        apply_padded, pad, unpad, _ = make_padded_stencil2(st)
    except Exception:
        return None

    def pad_flat(u_flat):
        return pad(u_flat)

    def unpad_flat(u_pad):
        return unpad(u_pad).reshape(-1)

    return apply_padded, pad_flat, unpad_flat
