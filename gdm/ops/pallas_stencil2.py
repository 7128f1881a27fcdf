"""Fused single-pass Pallas TPU kernel for the 2D GD Laplace matvec, v2.

The GD Laplace is  y = S0 U M1^T + M0 U S1^T  (banded 1D factors per
axis; the reference assembles the same operator cell-wise in
tests/poisson_01_gdm.cc:123-161).  This kernel reads every u tile ONCE
from HBM and writes y once — the 2-pass HBM-roofline formulation — with
the compute ordered to minimize the scarce VPU cross-lane permute work:

* columns first: V = U M1^T and W = U S1^T share the SAME 2p+1 lane
  rolls of the input tile (one roll feeds both FMAs), so the lane-permute
  cost is (2p+1) rolls per element instead of 2(2p+1);
* rows second: y = S0 V + M0 W as sublane-offset slices of V/W with
  per-row coefficient columns — sublane shifts, no lane permutes.

v1 (pallas_stencil.py) ran the row sweep as a dense-banded MXU matmul at
HIGHEST precision (6 bf16 passes, ~30 Tflop/s measured on v5e — the
kernel bottleneck) and the column sweep as 2(2p+1) rolls, and its input
DMA was not prefetched (DMA and compute serialized).  v2 is pure VPU
with manually double-buffered input AND output DMAs.

Layout: (Rp + 2H, W2) padded arrays with H guard rows of zeros at top
and bottom: data rows [H, H + N0), data lanes [p, p + N1).  Every tile's
input copy is then a uniform full-size (tile_r + 2H)-row read — no
edge-clipping conditionals — and all DMA row offsets are multiples of 8
(TPU alignment).  Band tables are zero on padding rows/lanes and the
kernel re-writes the guard rows with zeros, so the padded layout is
closed under the apply and CG can run entirely in it.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..grid import Grid
from ..ops1d import mass_1d, stiffness_1d


def _round_up(x, m):
    return (x + m - 1) // m * m


def make_padded_laplace2(grid: Grid, dtype=jnp.float32, tile_r: int = 256,
                         interpret: bool = False, rows: str = "vpu"):
    """Returns (apply_padded, pad, unpad, padded_shape) for the 2D GD
    Laplace at any odd degree p <= 15.

    rows="vpu": stage 2 as sublane-offset slice FMAs (pure VPU).
    rows="mxu": stage 2 as ONE dense-banded matmul per tile on the MXU at
    HIGHEST precision (f32-faithful 6-pass bf16), y = [S0|M0] @ [V; W] —
    overlaps with the VPU column stage and wins when the VPU is the
    bottleneck (measured ~2x at >= 2048^2 on v5e).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert grid.dim == 2
    p = grid.degree
    assert p <= 15
    H = _round_up(p, 8)  # row halo/guard, multiple of 8 for aligned DMAs
    N0, N1 = grid.nodes
    if rows == "mxu":
        tile_r = min(tile_r, 128)
    tile_r = min(tile_r, _round_up(N0, 8))
    Rp = _round_up(N0, tile_r)
    W2 = _round_up(N1 + 2 * p, 128)
    n_tiles = Rp // tile_r
    K = 2 * p + 1
    R_ext = Rp + 2 * H
    NB = 1 if n_tiles == 1 else 2
    T_ext = tile_r + 2 * H

    # row band tables (Rp, K), zero on padding rows, stored lane-padded
    b0s = np.zeros((Rp, 128), np.float64)
    b0m = np.zeros((Rp, 128), np.float64)
    b0s[:N0, :K] = stiffness_1d(p, grid.cells[0], grid.h[0]).band
    b0m[:N0, :K] = mass_1d(p, grid.cells[0], grid.h[0]).band
    # column roll tables: b1*[l, j] = band1[j - p, l] on the data lanes
    b1s = np.zeros((K, W2))
    b1m = np.zeros((K, W2))
    band1s = stiffness_1d(p, grid.cells[1], grid.h[1]).band
    band1m = mass_1d(p, grid.cells[1], grid.h[1]).band
    for l in range(K):
        b1s[l, p : p + N1] = band1s[:, l]
        b1m[l, p : p + N1] = band1m[:, l]
    if rows == "mxu":
        # dense per-tile row matrices for the MXU path:
        # y_tile = Bcat_i @ [V; W],  Bcat_i = [S0 window | M0 window]
        Bcat = np.zeros((n_tiles, tile_r, 2 * T_ext))
        for i in range(n_tiles):
            for r in range(tile_r):
                for k in range(K):
                    Bcat[i, r, H - p + k + r] = b0s[i * tile_r + r, k]
                    Bcat[i, r, T_ext + H - p + k + r] = b0m[i * tile_r + r, k]
        row_tables = [jnp.asarray(Bcat.reshape(n_tiles * tile_r, 2 * T_ext),
                                  dtype)]
    else:
        row_tables = [jnp.asarray(b0s, dtype), jnp.asarray(b0m, dtype)]
    b1s = jnp.asarray(b1s, dtype)
    b1m = jnp.asarray(b1m, dtype)

    def make_helpers(u_hbm, y_hbm, bufs, ytile, sem_in, sem_out):
        def in_copy(t, slot):
            # tile t needs u_ext rows [t*tile_r, t*tile_r + tile_r + 2H)
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(t * tile_r, 8),
                               tile_r + 2 * H), :],
                bufs.at[slot],
                sem_in.at[slot],
            )

        def out_copy(t, slot):
            return pltpu.make_async_copy(
                ytile.at[slot],
                y_hbm.at[pl.ds(pl.multiple_of(H + t * tile_r, 8),
                               tile_r), :],
                sem_out.at[slot],
            )

        return in_copy, out_copy

    def write_guard_zeros(y_hbm, zrows, sem_z):
        # guard rows of the OUTPUT: written once per call with zeros
        zrows[...] = jnp.zeros((H, W2), dtype)
        for lo in (0, H + Rp):
            pltpu.make_async_copy(
                zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), H), :],
                sem_z).start()
            pltpu.make_async_copy(
                zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), H), :],
                sem_z).wait()

    def stage1(uw, b1s_ref, b1m_ref):
        # columns: V = U M1^T, W = U S1^T via shared lane rolls
        V = jnp.zeros((T_ext, W2), dtype)
        W = jnp.zeros((T_ext, W2), dtype)
        for l in range(K):
            shift = (p - l) % W2  # cyclic; pad lanes have zero coeffs
            r = pltpu.roll(uw, shift, axis=1)
            V = V + b1m_ref[l : l + 1, :] * r
            W = W + b1s_ref[l : l + 1, :] * r
        return V, W

    def kernel_vpu(u_hbm, b0s_ref, b0m_ref, b1s_ref, b1m_ref, y_hbm,
                   bufs, ytile, zrows, sem_in, sem_out, sem_z):
        i = pl.program_id(0)
        in_copy, out_copy = make_helpers(u_hbm, y_hbm, bufs, ytile,
                                         sem_in, sem_out)

        @pl.when(i == 0)
        def _():
            in_copy(0, 0).start()
            if n_tiles > 1:
                in_copy(1, 1).start()

        @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
        def _():
            in_copy(i + 1, (i + 1) % 2).start()

        slot = i % NB
        in_copy(i, slot).wait()

        @pl.when(i == 0)
        def _():
            write_guard_zeros(y_hbm, zrows, sem_z)

        V, W = stage1(bufs[slot], b1s_ref, b1m_ref)
        # rows: y = S0 V + M0 W via sublane-offset slices
        acc = jnp.zeros((tile_r, W2), dtype)
        for k in range(K):
            off = H - p + k
            acc = acc + b0s_ref[:, k : k + 1] * V[off : off + tile_r, :]
            acc = acc + b0m_ref[:, k : k + 1] * W[off : off + tile_r, :]

        @pl.when(i >= 2)
        def _():
            out_copy(i - 2, slot).wait()

        ytile[slot] = acc
        out_copy(i, slot).start()

        @pl.when(i == n_tiles - 1)
        def _():
            out_copy(i, slot).wait()
            if n_tiles > 1:
                out_copy(i - 1, (i - 1) % 2).wait()

    def kernel_mxu(u_hbm, Bcat_ref, b1s_ref, b1m_ref, y_hbm,
                   bufs, ytile, zrows, vw, sem_in, sem_out, sem_z):
        # Same schedule as kernel_vpu, but stage 2 is one dense-banded
        # matmul on the MXU at HIGHEST precision; Mosaic overlaps the
        # in-flight matmul with the next tile's VPU rolls on its own.
        # (An explicitly software-pipelined variant — matmul for tile i-1
        # issued before stage 1 of tile i — measured ~20% SLOWER.)
        i = pl.program_id(0)
        in_copy, out_copy = make_helpers(u_hbm, y_hbm, bufs, ytile,
                                         sem_in, sem_out)

        @pl.when(i == 0)
        def _():
            in_copy(0, 0).start()
            if n_tiles > 1:
                in_copy(1, 1).start()
            write_guard_zeros(y_hbm, zrows, sem_z)

        @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
        def _():
            in_copy(i + 1, (i + 1) % 2).start()

        slot = i % NB
        in_copy(i, slot).wait()
        V, W = stage1(bufs[slot], b1s_ref, b1m_ref)
        vw[0:T_ext, :] = V
        vw[T_ext : 2 * T_ext, :] = W
        acc = jax.lax.dot_general(
            Bcat_ref[:], vw[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

        @pl.when(i >= 2)
        def _():
            out_copy(i - 2, slot).wait()

        ytile[slot] = acc
        out_copy(i, slot).start()

        @pl.when(i == n_tiles - 1)
        def _():
            out_copy(i, slot).wait()
            if n_tiles > 1:
                out_copy(i - 1, (i - 1) % 2).wait()

    if rows == "mxu":
        table_specs = [pl.BlockSpec((tile_r, 2 * T_ext), lambda i: (i, 0))]
        extra_scratch = [pltpu.VMEM((2 * T_ext, W2), dtype)]
        kernel = kernel_mxu
        grid_steps = n_tiles
    else:
        table_specs = [pl.BlockSpec((tile_r, 128), lambda i: (i, 0)),
                       pl.BlockSpec((tile_r, 128), lambda i: (i, 0))]
        extra_scratch = []
        kernel = kernel_vpu
        grid_steps = n_tiles

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_ext, W2), dtype),
        grid=(grid_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + table_specs + [
            pl.BlockSpec((K, W2), lambda i: (0, 0)),
            pl.BlockSpec((K, W2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NB, T_ext, W2), dtype),
            pltpu.VMEM((NB, tile_r, W2), dtype),
            pltpu.VMEM((H, W2), dtype),
        ] + extra_scratch + [
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * K * Rp * W2,
            bytes_accessed=2 * 4 * Rp * W2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def apply_padded(u_pad):
        return call(u_pad, *row_tables, b1s, b1m)

    def pad(u):
        out = jnp.zeros((R_ext, W2), dtype)
        return jax.lax.dynamic_update_slice(out, u.astype(dtype), (H, p))

    def unpad(u_pad):
        return u_pad[H : H + N0, p : p + N1]

    return apply_padded, pad, unpad, (R_ext, W2)


def make_padded_laplace3(grid: Grid, dtype=jnp.float32,
                         tile_planes: int = None, interpret: bool = False):
    """Fused single-pass Pallas kernel for the 3D GD Laplace matvec.

    y = S0⊗M1⊗M2 + M0⊗S1⊗M2 + M0⊗M1⊗S2 (banded 1D factors; the
    reference assembles the same operator cell-wise — it never runs 3D
    cut problems, but the uncut operator is dim-generic).  TPU-native
    formulation: fuse axes (0,1) into sublane rows r = i0*N1p + i1 with
    N1p = roundup(N1, 8), keep axis 2 on lanes.  Then

    * stage 1 (lanes):    A = U M2ᵀ, B = U S2ᵀ — shared cyclic lane
      rolls exactly like the 2D kernel's column sweep;
    * stage 2 (sublanes): P = M1·A, T = S1·A + M1·B — slice FMAs at
      offsets k-p (within-plane); per-row coefficient columns are
      periodic in r with period N1p, so one host-built (T_ext, K) tile
      table serves every tile (tiles and the halo are plane-aligned);
    * stage 3 (sublanes): y = S0·P + M0·T — slice FMAs at offsets
      (k-p)*N1p (across planes).

    Plane crossings of any slice are harmless: band tables store 0 for
    out-of-range couplings, so rows read from a neighboring plane always
    meet a zero coefficient.  Reads every u tile once from HBM, writes y
    once, with double-buffered DMAs (same schedule as the 2D kernel).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert grid.dim == 3
    p = grid.degree
    N0, N1, N2 = grid.nodes
    N1p = _round_up(N1, 8)
    assert N1p >= N1 and N1p >= p
    W2 = _round_up(N2 + 2 * p, 128)
    K = 2 * p + 1
    Hg = (p + 1) * N1p          # axis-0 halo, plane- and 8-aligned
    pa = _round_up(p, 8)        # stage-2 guard rows on A/B buffers

    if tile_planes is None:
        # budget ~8 full-tile buffers under ~80 MB of VMEM
        max_text = int(80e6 / (8 * W2 * jnp.dtype(dtype).itemsize))
        tile_planes = max(1, min(N0, (max_text - 2 * Hg) // N1p))
    n_tiles = -(-N0 // tile_planes)
    tile_planes = -(-N0 // n_tiles)  # balance the last tile
    tile_r = tile_planes * N1p
    Rp = n_tiles * tile_r
    R = N0 * N1p
    R_ext = Rp + 2 * Hg
    T_ext = tile_r + 2 * Hg
    NB = 1 if n_tiles == 1 else 2

    # ---- host-built coefficient tables --------------------------------
    band0s = stiffness_1d(p, grid.cells[0], grid.h[0]).band  # (N0, K)
    band0m = mass_1d(p, grid.cells[0], grid.h[0]).band
    band1s = stiffness_1d(p, grid.cells[1], grid.h[1]).band
    band1m = mass_1d(p, grid.cells[1], grid.h[1]).band
    band2s = stiffness_1d(p, grid.cells[2], grid.h[2]).band
    band2m = mass_1d(p, grid.cells[2], grid.h[2]).band

    # lane tables (K, W2): b2x[l, p+j] = band2[j, l]
    b2s = np.zeros((K, W2))
    b2m = np.zeros((K, W2))
    for l in range(K):
        b2s[l, p : p + N2] = band2s[:, l]
        b2m[l, p : p + N2] = band2m[:, l]

    # stage-2 tile tables (T_ext, 128), periodic with period N1p
    c1s = np.zeros((T_ext, 128))
    c1m = np.zeros((T_ext, 128))
    i1 = np.arange(T_ext) % N1p
    valid1 = i1 < N1
    c1s[valid1, :K] = band1s[i1[valid1]]
    c1m[valid1, :K] = band1m[i1[valid1]]

    # stage-3 global tables (Rp, 128): c0x[g] = band0[g // N1p], zero on
    # i1-padding rows and beyond plane N0 (this also forces y = 0 there)
    c0s = np.zeros((Rp, 128))
    c0m = np.zeros((Rp, 128))
    g0 = np.arange(Rp) // N1p
    valid0 = (g0 < N0) & ((np.arange(Rp) % N1p) < N1)
    c0s[valid0, :K] = band0s[g0[valid0]]
    c0m[valid0, :K] = band0m[g0[valid0]]

    c1s, c1m = jnp.asarray(c1s, dtype), jnp.asarray(c1m, dtype)
    c0s, c0m = jnp.asarray(c0s, dtype), jnp.asarray(c0m, dtype)
    b2s, b2m = jnp.asarray(b2s, dtype), jnp.asarray(b2m, dtype)

    def kernel(u_hbm, c0s_ref, c0m_ref, c1s_ref, c1m_ref, b2s_ref, b2m_ref,
               y_hbm, bufs, ytile, zrows, Abuf, Bbuf, Pbuf, Tbuf,
               sem_in, sem_out, sem_z):
        i = pl.program_id(0)

        def in_copy(t, slot):
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(t * tile_r, 8), T_ext), :],
                bufs.at[slot], sem_in.at[slot])

        def out_copy(t, slot):
            return pltpu.make_async_copy(
                ytile.at[slot],
                y_hbm.at[pl.ds(pl.multiple_of(Hg + t * tile_r, 8),
                               tile_r), :],
                sem_out.at[slot])

        @pl.when(i == 0)
        def _():
            in_copy(0, 0).start()
            if n_tiles > 1:
                in_copy(1, 1).start()
            # output guard rows, zeroed once per call
            zrows[...] = jnp.zeros((Hg, W2), dtype)
            for lo in (0, Hg + Rp):
                pltpu.make_async_copy(
                    zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), Hg), :],
                    sem_z).start()
                pltpu.make_async_copy(
                    zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), Hg), :],
                    sem_z).wait()

        @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
        def _():
            in_copy(i + 1, (i + 1) % 2).start()

        slot = i % NB
        in_copy(i, slot).wait()

        # stage 1 (lanes, axis 2): A = U M2ᵀ, B = U S2ᵀ, shared rolls
        uw = bufs[slot]
        A = jnp.zeros((T_ext, W2), dtype)
        B = jnp.zeros((T_ext, W2), dtype)
        for l in range(K):
            shift = (p - l) % W2
            r = pltpu.roll(uw, shift, axis=1)
            A = A + b2m_ref[l : l + 1, :] * r
            B = B + b2s_ref[l : l + 1, :] * r
        Abuf[pa : pa + T_ext, :] = A
        Bbuf[pa : pa + T_ext, :] = B

        # stage 2 (sublanes, axis 1): P = M1 A, T = S1 A + M1 B.
        # Rows [0, N1p) and [T_ext - N1p, T_ext) of P/T may read the
        # uninitialized A/B guards — stage 3 never reads them.
        P = jnp.zeros((T_ext, W2), dtype)
        T = jnp.zeros((T_ext, W2), dtype)
        for k in range(K):
            off = pa + k - p
            a = Abuf[off : off + T_ext, :]
            b = Bbuf[off : off + T_ext, :]
            P = P + c1m_ref[:, k : k + 1] * a
            T = T + c1s_ref[:, k : k + 1] * a + c1m_ref[:, k : k + 1] * b
        Pbuf[...] = P
        Tbuf[...] = T

        # stage 3 (sublanes, axis 0): y = S0 P + M0 T at plane strides
        acc = jnp.zeros((tile_r, W2), dtype)
        for k in range(K):
            off = Hg + (k - p) * N1p
            acc = acc + c0s_ref[:, k : k + 1] * Pbuf[off : off + tile_r, :]
            acc = acc + c0m_ref[:, k : k + 1] * Tbuf[off : off + tile_r, :]

        @pl.when(i >= 2)
        def _():
            out_copy(i - 2, slot).wait()

        ytile[slot] = acc
        out_copy(i, slot).start()

        @pl.when(i == n_tiles - 1)
        def _():
            out_copy(i, slot).wait()
            if n_tiles > 1:
                out_copy(i - 1, (i - 1) % 2).wait()

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_ext, W2), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_r, 128), lambda i: (i, 0)),
            pl.BlockSpec((tile_r, 128), lambda i: (i, 0)),
            pl.BlockSpec((T_ext, 128), lambda i: (0, 0)),
            pl.BlockSpec((T_ext, 128), lambda i: (0, 0)),
            pl.BlockSpec((K, W2), lambda i: (0, 0)),
            pl.BlockSpec((K, W2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NB, T_ext, W2), dtype),
            pltpu.VMEM((NB, tile_r, W2), dtype),
            pltpu.VMEM((Hg, W2), dtype),
            pltpu.VMEM((T_ext + 2 * pa, W2), dtype),
            pltpu.VMEM((T_ext + 2 * pa, W2), dtype),
            pltpu.VMEM((T_ext, W2), dtype),
            pltpu.VMEM((T_ext, W2), dtype),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 7 * K * Rp * W2,
            bytes_accessed=2 * 4 * Rp * W2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def apply_padded(u_pad):
        return call(u_pad, c0s, c0m, c1s, c1m, b2s, b2m)

    def pad(u):
        u3 = u.reshape(N0, N1, N2).astype(dtype)
        tmp = jnp.zeros((N0, N1p, W2), dtype)
        tmp = jax.lax.dynamic_update_slice(tmp, u3, (0, 0, p))
        out = jnp.zeros((R_ext, W2), dtype)
        return jax.lax.dynamic_update_slice(out, tmp.reshape(R, W2), (Hg, 0))

    def unpad(u_pad):
        return u_pad[Hg : Hg + R].reshape(N0, N1p, W2)[:, :N1, p : p + N2]

    return apply_padded, pad, unpad, (R_ext, W2)


def best_padded_laplace(grid: Grid, dtype=jnp.float32, interpret: bool = False):
    """Auto-select kernel mode/tiling by size (v5e-measured heuristics):

    * single-tile pure-VPU when the whole grid fits comfortably in VMEM
      (no halo re-reads, no per-tile pipeline overhead — fastest <= ~1.5M
      nodes);
    * otherwise tiled with the row stage on the MXU (rows='mxu'), whose
      throughput is p-independent and ~40% ahead of the multi-pass XLA
      path at 4096^2.

    dim == 3 dispatches to the fused 3D kernel.
    """
    if grid.dim == 3:
        return make_padded_laplace3(grid, dtype, interpret=interpret)
    N0, N1 = grid.nodes
    p = grid.degree
    H = _round_up(p, 8)
    W2 = _round_up(N1 + 2 * p, 128)
    R1 = _round_up(N0, 8) + 2 * H
    itemsize = jnp.dtype(dtype).itemsize
    single_tile_bytes = 4 * R1 * W2 * itemsize  # buf + V + W + ytile
    if single_tile_bytes <= 60 * 1024 * 1024:
        return make_padded_laplace2(grid, dtype, tile_r=R1, rows="vpu",
                                    interpret=interpret)
    return make_padded_laplace2(grid, dtype, tile_r=128, rows="mxu",
                                interpret=interpret)


def laplace_2d_pallas2_fn(grid: Grid, dtype=jnp.float32):
    """Node-lattice -> node-lattice apply built on the auto-selected
    padded kernel (2D or 3D), or None if Pallas TPU is unavailable."""
    try:
        if jax.devices()[0].platform not in ("tpu", "axon"):
            return None
        apply_padded, pad, unpad, _ = best_padded_laplace(grid, dtype)
    except Exception:
        return None

    def apply(u):
        return unpad(apply_padded(pad(u)))

    return apply
