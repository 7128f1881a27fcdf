"""Factored sparse approximate inverse (FSAI) preconditioner for
assembled 2D stencil-band operators.

B = G^T G with G lower-triangular on the band sparsity: row i of G is
obtained from the local solve  A[J_i, J_i] y = e_i  over the "lower"
neighborhood J_i (offsets (d0, d1) with d0 < 0, or d0 == 0 and d1 <= 0,
|d| <= R), scaled so diag(G A G^T) = 1.  For SPD A the local blocks are
principal submatrices of A, hence SPD, so the factor always exists.

This is the TPU-native answer to the reference's ILU role
(applications/wave/include/gdm/wave/problem.h:461-469): the GP'd cut
mass and heat operators have exponentially-decaying inverses, so a
band-sparsity G captures them well — measured on the wave-preset cut
mass at 128^2, CG to rel 1e-5 takes 10 iterations with R = p+1 FSAI
vs 39 with cut-window Schwarz and ~100+ with point Jacobi — and unlike
ILU's sequential triangular solves, applying G and G^T are plain band
sweeps that ride the same fused Pallas kernels as the operator itself.

Both factors are returned as generalized band coefficient tables in the
StencilOperator convention (band[node, dy, dx] multiplies
u[node + (dy - r, dx - r)]), so every existing band-apply path (XLA
rolls, fused Pallas streaming kernel, VMEM-resident solver kernel)
applies them unchanged.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .stencil import StencilOperator


def lower_offsets(R: int):
    """Lexicographic 'lower half' tap offsets, diagonal (0, 0) LAST
    (its position is what the scaled local solve pivots on)."""
    offs = [
        (d0, d1)
        for d0 in range(-R, 1)
        for d1 in range(-R, R + 1)
        if (d0 < 0 or d1 <= 0) and not (d0 == 0 and d1 == 0)
    ]
    offs.append((0, 0))
    return offs


def fsai_factors(st: StencilOperator, R: int = None):
    """(G, GT): lower/upper band factors of B = G^T G ~= A^{-1}.

    G and GT are StencilOperator instances of radius max(R, st.radius)
    band layout (absent taps zero), so B r = GT.apply(G.apply(r)).
    """
    grid = st.grid
    assert grid.dim == 2
    r = st.radius
    if R is None:
        R = r
    K = 2 * r + 1
    N0, N1 = grid.nodes
    N = N0 * N1
    band = np.asarray(st.band_host, np.float64).reshape(N0, N1, K, K)

    offs = lower_offsets(R)
    m = len(offs)
    offs_a = np.asarray(offs)  # (m, 2)

    i0 = np.repeat(np.arange(N0), N1)
    i1 = np.tile(np.arange(N1), N0)
    j0 = i0[:, None] + offs_a[None, :, 0]  # (N, m)
    j1 = i1[:, None] + offs_a[None, :, 1]
    valid = (j0 >= 0) & (j0 < N0) & (j1 >= 0) & (j1 < N1)
    jc0 = np.clip(j0, 0, N0 - 1)
    jc1 = np.clip(j1, 0, N1 - 1)

    # local Gram blocks Aloc[n, a, b] = A[(j_a), (j_b)]; the tap offset
    # (j_b - j_a) is the same for all nodes, so build per (a, b) pair
    d0 = offs_a[None, :, 0] - offs_a[:, 0, None]  # (m, m) col - row
    d1 = offs_a[None, :, 1] - offs_a[:, 1, None]
    inband = (np.abs(d0) <= r) & (np.abs(d1) <= r)
    ta = np.clip(d0 + r, 0, K - 1)
    tb = np.clip(d1 + r, 0, K - 1)
    Aloc = np.zeros((N, m, m))
    rows, cols = np.nonzero(inband)
    # vectorized over nodes, looping the <= m^2 in-band tap pairs
    for a, b in zip(rows, cols):
        Aloc[:, a, b] = band[jc0[:, a], jc1[:, a], ta[a, b], tb[a, b]]
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

    bandG = np.zeros((N, KG, KG))
    for k, (o0, o1) in enumerate(offs):
        bandG[:, o0 + RG, o1 + RG] = Grow[:, k]

    # G^T as a band operator: (G^T u)[j] = sum_i G[i, j] u[i]; the
    # contribution of G's tap (o0, o1) at row i lands at j = i + o,
    # i.e. row j of G^T has tap (-o0, -o1) with coefficient G[j + o_neg]
    bandGT = np.zeros((N, KG, KG))
    Gg = Grow.reshape(N0, N1, m)
    for k, (o0, o1) in enumerate(offs):
        # coefficient at node j is G[(j0 - o0, j1 - o1), k] when in range
        cfull = Gg[:, :, k]
        shifted = np.zeros_like(cfull)
        a0 = slice(max(0, o0), N0) if o0 >= 0 else slice(0, N0 + o0)
        b0 = slice(0, N0 - o0) if o0 >= 0 else slice(-o0, N0)
        a1 = slice(max(0, o1), N1) if o1 >= 0 else slice(0, N1 + o1)
        b1 = slice(0, N1 - o1) if o1 >= 0 else slice(-o1, N1)
        shifted[a0, a1] = cfull[b0, b1]
        bandGT[:, -o0 + RG, -o1 + RG] = shifted.reshape(N)

    G = StencilOperator(grid, bandG.reshape(grid.nodes + (KG, KG)), RG)
    GT = StencilOperator(grid, bandGT.reshape(grid.nodes + (KG, KG)), RG)
    return G, GT


def fsai_preconditioner(st: StencilOperator, R: int = None):
    """B(r) = G^T (G r) as a jit-friendly callable on flat vectors."""
    G, GT = fsai_factors(st, R)

    def precondition(rr):
        return GT.apply(G.apply(rr))

    return precondition
