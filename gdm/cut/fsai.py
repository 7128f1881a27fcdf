"""Factored sparse approximate inverse (FSAI) preconditioner for
assembled stencil-band operators (any dim).

B = G^T G with G lower-triangular on the band sparsity: row i of G is
obtained from the local solve  A[J_i, J_i] y = e_i  over the "lower"
neighborhood J_i (tap offsets lexicographically <= 0, |d| <= R per
axis), scaled so diag(G A G^T) = 1.  For SPD A the local blocks are
principal submatrices of A, hence SPD, so the factor always exists.

This is the TPU-native answer to the reference's ILU role
(applications/wave/include/gdm/wave/problem.h:461-469): the GP'd cut
mass and (M + dt S) heat operators have exponentially-decaying
inverses, so a band-sparsity G captures them well — measured on the
wave-preset cut mass at 128^2, CG to rel 1e-5 takes 10 iterations with
R = p+1 FSAI vs 39 with cut-window Schwarz and ~100+ with point
Jacobi — and unlike ILU's sequential triangular solves, applying G and
G^T are plain band sweeps that ride the same fused Pallas kernels as
the operator itself (including the VMEM-resident one-launch CG,
gdm/ops/pallas_resident.py).

Both factors are returned as generalized band coefficient tables in the
StencilOperator convention (C-order taps: band[node, t] with per-axis
offset d_k = t_k - r multiplying u[node + d]), so every existing
band-apply path applies them unchanged.
"""

from __future__ import annotations

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from .stencil import StencilOperator


def lower_offsets(R: int, dim: int):
    """Lexicographic 'lower half' tap offsets, diagonal (0,...,0) LAST
    (its position is what the scaled local solve pivots on)."""
    zero = (0,) * dim
    offs = [
        o for o in itertools.product(range(-R, R + 1), repeat=dim)
        if o < zero
    ]
    offs.sort()
    offs.append(zero)
    return offs


def fsai_factors(st: StencilOperator, R: int = None):
    """(G, GT): lower/upper band factors of B = G^T G ~= A^{-1}.

    G and GT are StencilOperator instances of radius max(R, st.radius)
    (absent taps zero), so B r = GT.apply(G.apply(r)).
    """
    grid = st.grid
    dim = grid.dim
    r = st.radius
    if R is None:
        R = r
    K = 2 * r + 1
    nodes = grid.nodes
    N = grid.n_nodes
    band = np.asarray(st.band_host, np.float64).reshape(N, K**dim)

    offs = lower_offsets(R, dim)
    m = len(offs)
    offs_a = np.asarray(offs)  # (m, dim)

    coords = np.stack(
        np.unravel_index(np.arange(N), nodes), axis=0)  # (dim, N)
    j = coords[:, :, None] + offs_a.T[:, None, :]  # (dim, N, m)
    valid = np.ones((N, m), bool)
    for d in range(dim):
        valid &= (j[d] >= 0) & (j[d] < nodes[d])

    # local Gram blocks Aloc[n, a, b] = A[(j_a), (j_b)]; the tap offset
    # (j_b - j_a) is constant per (a, b) pair, and j_a = n + doff_a is a
    # CONSTANT flat shift wherever the window is in range — so each
    # pair's column of Aloc is a shifted contiguous slice of one band
    # column (rows where the shift crosses an axis boundary produce
    # wrapped neighbors and are zeroed by the validity mask below).
    # Fancy-index gathers here measured 35-245 s at the 200^2 p=5
    # production size; the slice form is seconds.
    strides = np.array([K ** (dim - 1 - d) for d in range(dim)])
    node_strides = np.array(
        [int(np.prod(nodes[d + 1:])) for d in range(dim)])
    doffs = offs_a @ node_strides                          # (m,)
    dd_all = offs_a[None, :, :] - offs_a[:, None, :]       # (m, m, dim)
    in_band = (np.abs(dd_all) <= r).all(axis=2)            # (m, m)
    aa, bb = np.nonzero(in_band)
    tt = ((dd_all[aa, bb] + r) * strides).sum(axis=1)
    # (N, m, m) strided slice writes: measured 16.8 s vs 245 s for the
    # fancy-index gather and 406 s for an (m, m, N)-layout fill +
    # transpose, same process, production size (within-process A/B —
    # wall times on this box swing 4x between runs)
    Aloc = np.zeros((N, m, m))
    for k in range(len(aa)):
        d0 = int(doffs[aa[k]])
        lo, hi = max(0, -d0), min(N, N - d0)
        Aloc[lo:hi, aa[k], bb[k]] = band[lo + d0 : hi + d0, tt[k]]
    pair_valid = valid[:, :, None] & valid[:, None, :]
    Aloc *= pair_valid
    diag = np.arange(m)
    Aloc[:, diag, diag] = np.where(valid, Aloc[:, diag, diag], 1.0)

    e = np.zeros((m, 1))
    e[-1, 0] = 1.0
    y = np.linalg.solve(Aloc, np.broadcast_to(e, (N, m, 1)).copy())[:, :, 0]
    piv = y[:, -1]
    # SPD A guarantees piv > 0; guard the degenerate assembled rows
    piv = np.where(piv > 0, piv, 1.0)
    Grow = y / np.sqrt(piv)[:, None]
    Grow = np.where(valid, Grow, 0.0)

    RG = max(R, r)
    KG = 2 * RG + 1
    stridesG = np.array([KG ** (dim - 1 - d) for d in range(dim)])

    bandG = np.zeros((N, KG**dim))
    for k, o in enumerate(offs):
        t = int(np.dot(np.asarray(o) + RG, stridesG))
        bandG[:, t] = Grow[:, k]

    # G^T as a band operator: the contribution of G's tap o at row i
    # lands at j = i + o, i.e. row j of G^T has tap -o with coefficient
    # G[j - o] (zero where j - o is out of range)
    bandGT = np.zeros((N, KG**dim))
    Gg = Grow.reshape(nodes + (m,))
    for k, o in enumerate(offs):
        t = int(np.dot(RG - np.asarray(o), stridesG))
        cfull = Gg[..., k]
        shifted = np.zeros_like(cfull)
        dst = tuple(
            slice(max(0, o[d]), nodes[d] + min(0, o[d])) for d in range(dim))
        src = tuple(
            slice(max(0, -o[d]), nodes[d] + min(0, -o[d]))
            for d in range(dim))
        shifted[dst] = cfull[src]
        bandGT[:, t] = shifted.reshape(N)

    G = StencilOperator(grid, bandG.reshape(nodes + (KG,) * dim), RG)
    GT = StencilOperator(grid, bandGT.reshape(nodes + (KG,) * dim), RG)
    return G, GT


def fsai_preconditioner(st: StencilOperator, R: int = None):
    """B(r) = G^T (G r) as a jit-friendly callable on flat vectors."""
    G, GT = fsai_factors(st, R)

    def precondition(rr):
        return GT.apply(G.apply(rr))

    return precondition


class VerifiedSolver:
    """Self-verifying solve callable for an SPD band system.

    ``solve(b) -> x`` / ``solve_with_info(b) -> (x, info)`` where info
    carries ``iterations`` (int32, fast-path CG count), ``residual``
    (TRUE residual norm of the fast path, not the recurrence),
    ``fallback`` (bool: the runtime check rejected the fast solve and
    the answer came from the exact-arithmetic streamed path), and
    ``fallback_iterations``.  All jit/scan-traceable.

    ``path`` records the measured routing decision ("resident-verified"
    when the VMEM-resident FSAI-CG passed its setup probe, "streamed"
    otherwise) and ``probe`` the probe evidence.
    """

    def __init__(self, solve_with_info, path: str, probe: dict):
        self.solve_with_info = solve_with_info
        self.path = path
        self.probe = probe

    def __call__(self, b):
        return self.solve_with_info(b)[0]


def _streamed_solver(st: StencilOperator, windows, max_iter, rel_tol,
                     abs_tol, apply_fn=None, precond=None):
    """The exact-arithmetic (recurrence-honest at working precision)
    band-CG path: on TPU, whole-CG in the fused streamed kernel's padded
    layout with the band-form Schwarz preconditioner; elsewhere host CG.
    Returns solve_with_info(b) -> (x, {"iterations": i})."""
    from .. import solvers
    from .fastapply import fast_stencil_bundle
    from .stencil import schwarz_band, schwarz_jacobi_preconditioner

    bundle = fast_stencil_bundle(st)
    if bundle is not None and precond is None:
        apS, pad_s, unpad_s = bundle
        if windows is not None and np.asarray(windows).size:
            bpre = fast_stencil_bundle(schwarz_band(st, windows))
        else:
            bpre = None
        if bpre is not None:
            pre_pad = bpre[0]
        else:
            from ..ops.pallas_cutband import make_padded_stencil2

            G, GT = fsai_factors(st)
            apG = make_padded_stencil2(G)[0]
            apGT = make_padded_stencil2(GT)[0]
            pre_pad = lambda v: apGT(apG(v))  # noqa: E731

        def solve_with_info(b):
            x, info = solvers.cg(
                apS, pad_s(b), precond=pre_pad, max_iter=max_iter,
                abs_tol=abs_tol, rel_tol=rel_tol)
            return unpad_s(x), info

        return solve_with_info

    if apply_fn is None:
        apply_fn = st.apply
    if precond is None:
        if windows is not None and np.asarray(windows).size:
            precond = schwarz_jacobi_preconditioner(st, windows)
        else:
            precond = fsai_preconditioner(st)
    # the host band apply runs at the default float width (f64 under
    # x64): promote b so the CG carry dtypes stay fixed
    host_dtype = jnp.zeros(0).dtype

    def solve_with_info(b):
        x, info = solvers.cg(
            apply_fn, b.astype(host_dtype), precond=precond,
            max_iter=max_iter, abs_tol=abs_tol, rel_tol=rel_tol)
        return x, info

    return solve_with_info


def verified_fsai_solver(st: StencilOperator, windows=None,
                         max_iter: int = 50, rel_tol: float = 1e-5,
                         abs_tol: float = 1e-12, apply_fn=None,
                         R: int = None, slack: float = 10.0,
                         probe: bool = True, interpret: bool = False,
                         resident_max_iter: int = None):
    """Self-verifying best solve for an SPD band system (VerifiedSolver).

    Fast path: the whole FSAI-preconditioned CG as ONE VMEM-resident
    pallas launch (gdm/ops/pallas_resident.py).  That path's f32
    recurrence-residual stopping rule has a demonstrated silent-wrong-
    answer mode on severely ill-conditioned GP'd cut systems (the
    round-4 DoD p=5 composite mass: residual reads converged while the
    true residual grows), so nothing here trusts it:

    * setup-time PROBE: one resident solve on a deterministic random
      RHS; if its TRUE residual (computed in-kernel by a fresh exact-f32
      band apply) misses max(abs_tol, rel_tol*||r0||)*slack, the
      resident path is disabled for this operator and everything routes
      through the streamed Schwarz/FSAI CG — the routing the round-4
      fix hand-coded per family is now enforced by measurement;
    * runtime CHECK: every accepted resident solve carries its true
      residual; on failure a ``lax.cond`` reruns the solve through the
      streamed path from x0 = 0 (junk-proof), inside jit/scan.

    ``windows``: cut-cell dof windows for the streamed path's Schwarz
    preconditioner (falls back to FSAI preconditioning when None).
    Reference role: deal.II SolverControl's convergence enforcement
    inside the Trilinos CG driver (problem.h:471-502).
    """
    import os

    rel_f = max(rel_tol, 1e-6)
    abs_f = max(abs_tol, 1e-12)
    fallback_swi = _streamed_solver(st, windows, max_iter, rel_tol,
                                    abs_tol, apply_fn=apply_fn)

    res = None
    if (st.grid.dim == 2
            and os.environ.get("GDM_DISABLE_PALLAS") != "1"):
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = None
        if interpret or platform in ("tpu", "axon"):
            from ..ops.pallas_resident import make_resident_cg

            G, GT = fsai_factors(st, R)
            # full max_iter: the resident loop exits on convergence, so
            # a high bound costs nothing (the old fixed-trip-count
            # kernel capped at 40, which silently under-converged the
            # composite DoD out-domain mass at 200^2 p=5 — ~1e-2
            # trajectory damping, caught against the x64 oracle).
            # resident_max_iter exists to cripple the resident path in
            # detection tests.
            res = make_resident_cg(
                st, G, GT,
                max_iter=(resident_max_iter if resident_max_iter
                          is not None else max_iter),
                rel_tol=rel_f, abs_tol=abs_f, interpret=interpret)

    if res is None:
        def solve_with_info(b):
            x, info = fallback_swi(b)
            return x.reshape(-1), {
                "iterations": info["iterations"],
                "residual": info["residual"],
                "fallback": jnp.bool_(False),
                "fallback_iterations": jnp.int32(0)}

        return VerifiedSolver(solve_with_info, "streamed",
                              {"ok": None, "reason": "resident-unavailable"})

    solve_r, pad_r, unpad_r, _ = res

    probe_info = {"ok": True, "reason": "probe-disabled"}
    if probe:
        rng = np.random.default_rng(0)
        b_p = jnp.asarray(
            rng.standard_normal(st.grid.n_nodes), jnp.float32)
        _, stats = solve_r(pad_r(b_p))
        nr_true = float(stats[0, 0])
        nr0 = float(stats[0, 2])
        tol_p = max(abs_f, rel_f * nr0)
        probe_info = {"ok": nr_true <= slack * tol_p,
                      "residual": nr_true, "tol": tol_p,
                      "iterations": int(stats[0, 1]),
                      "reason": "probe"}
        if not probe_info["ok"]:
            def solve_with_info(b):
                x, info = fallback_swi(b)
                return x.reshape(-1), {
                    "iterations": info["iterations"],
                    "residual": info["residual"],
                    "fallback": jnp.bool_(False),
                    "fallback_iterations": jnp.int32(0)}

            return VerifiedSolver(solve_with_info, "streamed", probe_info)

    def solve_with_info(b):
        xp, stats = solve_r(pad_r(b))
        x = unpad_r(xp).reshape(-1).astype(b.dtype)
        nr_true = stats[0, 0].astype(b.dtype)
        it_res = stats[0, 1].astype(jnp.int32)
        nr0 = stats[0, 2].astype(b.dtype)
        tol = jnp.maximum(jnp.asarray(abs_f, b.dtype),
                          jnp.asarray(rel_f, b.dtype) * nr0)
        bad = nr_true > slack * tol

        def _fb(bb):
            xf, info = fallback_swi(bb)
            return (xf.reshape(-1).astype(b.dtype),
                    info["iterations"].astype(jnp.int32))

        def _ok(bb):
            return x, jnp.int32(0)

        xf, it_fb = jax.lax.cond(bad, _fb, _ok, b)
        return xf, {"iterations": it_res, "residual": nr_true,
                    "fallback": bad, "fallback_iterations": it_fb}

    return VerifiedSolver(solve_with_info, "resident-verified", probe_info)


def fsai_cg_solver(st: StencilOperator, max_iter: int, rel_tol: float,
                   abs_tol: float, apply_fn=None, R: int = None,
                   resident: bool = True, windows=None):
    """The best serial solve callable for an SPD band system.

    Routes through :func:`verified_fsai_solver` (probe-routed,
    runtime-true-residual-checked VMEM-resident FSAI-CG with automatic
    streamed fallback) when ``resident``; host-level CG
    (gdm.solvers.cg) with the FSAI preconditioner otherwise — same
    deal.II ReductionControl stopping rule either way.
    """
    from .. import solvers

    if resident:
        return verified_fsai_solver(
            st, windows=windows, max_iter=max_iter, rel_tol=rel_tol,
            abs_tol=abs_tol, apply_fn=apply_fn, R=R)

    G, GT = fsai_factors(st, R)
    if apply_fn is None:
        apply_fn = st.apply

    def precondition(rr):
        return GT.apply(G.apply(rr))

    def solve(b):
        x, _ = solvers.cg(
            apply_fn, b, precond=precondition, max_iter=max_iter,
            abs_tol=abs_tol, rel_tol=rel_tol,
        )
        return x

    return solve
