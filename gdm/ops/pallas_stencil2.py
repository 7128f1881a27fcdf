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
                         interpret: bool = False, rows: str = "vpu",
                         mxu_precision=None, bands=None,
                         pipeline_interleave=None, static_parity=True):
    """Returns (apply_padded, pad, unpad, padded_shape) for the 2D GD
    Laplace at any odd degree p <= 15.

    rows="vpu": stage 2 as sublane-offset slice FMAs (pure VPU).
    rows="mxu": stage 2 as ONE dense-banded matmul per tile on the MXU at
    HIGHEST precision (f32-faithful 6-pass bf16), y = [S0|M0] @ [V; W] —
    overlaps with the VPU column stage and wins when the VPU is the
    bottleneck (measured ~2x at >= 2048^2 on v5e).

    bands: optional (A0, A1, B0, B1) numpy band matrices ((N_d, 2p+1)
    each, the Banded1D.band layout) generalizing the operator to
    y = A0 U A1^T + B0 U B1^T — used to run the cut operators' separable
    Kronecker parts (mass: (M0, M1, 0, 0); M + dt*S: (M0 + dt*S0, M1,
    dt*M0, S1)) through the same fused kernel.  Default: the Laplace
    (S0, M1, M0, S1).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert grid.dim == 2
    p = grid.degree
    assert p <= 15
    H = _round_up(p, 8)  # row halo/guard, multiple of 8 for aligned DMAs
    N0, N1 = grid.nodes
    if rows in ("mxu", "mxu3"):
        tile_r = min(tile_r, 128)
    if rows == "mxu3p":
        tile_r = min(tile_r, 256)
    tile_r = min(tile_r, _round_up(N0, 8))
    Rp = _round_up(N0, tile_r)
    W2 = _round_up(N1 + 2 * p, 128)
    n_tiles = Rp // tile_r
    K = 2 * p + 1
    R_ext = Rp + 2 * H
    NB = 1 if n_tiles == 1 else 2
    T_ext = tile_r + 2 * H
    # mxu3p cross-tile pipelining: interleave the previous tile's dot
    # issues into the roll loop at long K (measured v5e: required for
    # any MXU/VPU overlap at K >= 11; the up-front dot block already
    # overlaps at K = 7) — see stage_split_and_dots
    interleave = (pipeline_interleave if pipeline_interleave is not None
                  else 2 * p + 1 >= 9)

    if bands is None:
        bands = (stiffness_1d(p, grid.cells[0], grid.h[0]).band,
                 mass_1d(p, grid.cells[1], grid.h[1]).band,
                 mass_1d(p, grid.cells[0], grid.h[0]).band,
                 stiffness_1d(p, grid.cells[1], grid.h[1]).band)
    A0b, A1b, B0b, B1b = bands
    # row band tables (Rp, K), zero on padding rows, stored lane-padded
    b0s = np.zeros((Rp, 128), np.float64)
    b0m = np.zeros((Rp, 128), np.float64)
    b0s[:N0, :K] = A0b
    b0m[:N0, :K] = B0b
    # column roll tables: b1*[l, j] = band1[j - p, l] on the data lanes
    b1s = np.zeros((K, W2))
    b1m = np.zeros((K, W2))
    band1s = B1b
    band1m = A1b
    for l in range(K):
        b1s[l, p : p + N1] = band1s[:, l]
        b1m[l, p : p + N1] = band1m[:, l]
    if rows in ("mxu", "mxu3", "mxu3p"):
        # dense per-tile row matrices for the MXU path:
        # y_tile = Bcat_i @ [V; W],  Bcat_i = [S0 window | M0 window]
        Bcat = np.zeros((n_tiles, tile_r, 2 * T_ext))
        for i in range(n_tiles):
            for r in range(tile_r):
                for k in range(K):
                    Bcat[i, r, H - p + k + r] = b0s[i * tile_r + r, k]
                    Bcat[i, r, T_ext + H - p + k + r] = b0m[i * tile_r + r, k]
        Bflat = Bcat.reshape(n_tiles * tile_r, 2 * T_ext)
        # bf16x3 split: B = B_hi + B_lo exactly captures ~16 mantissa
        # bits; with the same split of [V; W] in-kernel, three DEFAULT
        # (bf16) MXU passes reproduce the f32 product to ~1e-6 while
        # running ~3x faster than HIGHEST (6-pass) — Mosaic has no
        # native HIGH (bf16x3) dot, so stage the passes by hand.  Under
        # f64 (interpret-mode tests) split to f32 instead: same code
        # path, dtype-scaled accuracy.
        split_dt = jnp.float32 if dtype == jnp.float64 else jnp.bfloat16
        if rows in ("mxu3", "mxu3p"):
            B_hi = Bflat.astype(dtype).astype(split_dt)
            B_lo = (Bflat.astype(dtype)
                    - np.asarray(B_hi, dtype)).astype(split_dt)
            row_tables = [jnp.asarray(B_hi), jnp.asarray(B_lo)]
        else:
            row_tables = [jnp.asarray(Bflat, dtype)]
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
            r = uw if shift == 0 else pltpu.roll(uw, shift, axis=1)
            V = V + b1m_ref[l : l + 1, :] * r
            W = W + b1s_ref[l : l + 1, :] * r
        return V, W

    # rolled-chunk row granularity: keeps Mosaic's live vector set to one
    # chunk (full-tile SSA values spill to VMEM once buffers exceed a few
    # MB — measured 79-133 MB of spill slots on the 3D variant).  Small
    # tiles skip the chunk loops entirely (whole-tile values are faster).
    CS = 512
    whole_tile_values = T_ext * W2 * jnp.dtype(dtype).itemsize <= 6e6

    def staged(total, body, cs=CS):
        n_full = total // cs
        if n_full:
            jax.lax.fori_loop(
                0, n_full, lambda c, x: (body(c * cs, cs), x)[1], 0)
        if total % cs:
            body(n_full * cs, total % cs)

    def kernel_vpu(u_hbm, b0s_ref, b0m_ref, b1s_ref, b1m_ref, y_hbm,
                   bufs, ytile, zrows, Vbuf, Wbuf, sem_in, sem_out, sem_z):
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

        if whole_tile_values:
            # small tiles: whole-tile SSA values (no chunk-loop overhead;
            # measured 39.8 vs 29.7 GDoF/s at 1024^2 single-tile)
            V, W = stage1(bufs[slot], b1s_ref, b1m_ref)

            @pl.when(i >= 2)
            def _():
                out_copy(i - 2, slot).wait()

            acc = jnp.zeros((tile_r, W2), dtype)
            for k in range(K):
                off = H - p + k
                acc = acc + b0s_ref[:, k : k + 1] * V[off : off + tile_r, :]
                acc = acc + b0m_ref[:, k : k + 1] * W[off : off + tile_r, :]
            ytile[slot] = acc
            out_copy(i, slot).start()
        else:
            # columns: V = U M1^T, W = U S1^T via shared lane rolls
            def stage1_chunk(s, ln):
                uc = bufs[slot, pl.ds(s, ln), :]
                v = jnp.zeros((ln, W2), dtype)
                w = jnp.zeros((ln, W2), dtype)
                for l in range(K):
                    r = pltpu.roll(uc, (p - l) % W2, axis=1)
                    v = v + b1m_ref[l : l + 1, :] * r
                    w = w + b1s_ref[l : l + 1, :] * r
                Vbuf[pl.ds(s, ln), :] = v
                Wbuf[pl.ds(s, ln), :] = w

            staged(T_ext, stage1_chunk)

            @pl.when(i >= 2)
            def _():
                out_copy(i - 2, slot).wait()

            # rows: y = S0 V + M0 W via sublane-offset slices
            def stage2_chunk(s, ln):
                v_win = Vbuf[pl.ds(s, ln + 2 * H), :]
                w_win = Wbuf[pl.ds(s, ln + 2 * H), :]
                cs_ = b0s_ref[pl.ds(s, ln), :]
                cm_ = b0m_ref[pl.ds(s, ln), :]
                acc = jnp.zeros((ln, W2), dtype)
                for k in range(K):
                    off = H - p + k
                    acc = acc + cs_[:, k : k + 1] * v_win[off : off + ln, :]
                    acc = acc + cm_[:, k : k + 1] * w_win[off : off + ln, :]
                ytile[slot, pl.ds(s, ln), :] = acc

            staged(tile_r, stage2_chunk)

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
            precision=(mxu_precision or jax.lax.Precision.HIGHEST),
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

    def kernel_mxu3(u_hbm, bhi_ref, blo_ref, b1s_ref, b1m_ref, y_hbm,
                    bufs, ytile, zrows, vwhi, vwlo, sem_in, sem_out, sem_z):
        # bf16x3 row stage: acc = Bhi@Zhi + Bhi@Zlo + Blo@Zhi with
        # Z = [V; W] split as Z ~ Zhi + Zlo (the dropped Blo@Zlo term is
        # O(2^-16) relative); every pass runs at DEFAULT (1-pass bf16)
        # MXU speed, vs 6 passes for HIGHEST at the same accuracy class
        # (measured rel_err ~1e-7 both).
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
        Vhi = V.astype(split_dt)
        Whi = W.astype(split_dt)
        vwhi[0:T_ext, :] = Vhi
        vwhi[T_ext : 2 * T_ext, :] = Whi
        vwlo[0:T_ext, :] = (V - Vhi.astype(dtype)).astype(split_dt)
        vwlo[T_ext : 2 * T_ext, :] = (W - Whi.astype(dtype)).astype(
            split_dt)
        dn = (((1,), (0,)), ((), ()))
        acc = jax.lax.dot_general(
            bhi_ref[:], vwhi[:], dimension_numbers=dn,
            preferred_element_type=dtype)
        acc = acc + jax.lax.dot_general(
            bhi_ref[:], vwlo[:], dimension_numbers=dn,
            preferred_element_type=dtype)
        acc = acc + jax.lax.dot_general(
            blo_ref[:], vwhi[:], dimension_numbers=dn,
            preferred_element_type=dtype)

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


    def kernel_mxu3p(u_hbm, bhi_ref, blo_ref, b1s_ref, b1m_ref, y_hbm,
                     bufs, ytile, zrows, vwhi, vwlo, sem_in, sem_out,
                     sem_z):
        # Cross-tile software-pipelined mxu3: step i ISSUES the three
        # bf16 matmuls for tile i-1 (operands staged at step i-1) BEFORE
        # running tile i's VPU rolls, so the MXU drains underneath the
        # roll loop; tile i-1's output is collected after the rolls.
        i = pl.program_id(0)
        in_copy, out_copy = make_helpers(u_hbm, y_hbm, bufs, ytile,
                                         sem_in, sem_out)

        @pl.when(i == 0)
        def _():
            in_copy(0, 0).start()
            in_copy(1, 1).start()
            write_guard_zeros(y_hbm, zrows, sem_z)

        @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
        def _():
            in_copy(i + 1, (i + 1) % 2).start()

        slot = i % 2
        prev = (i - 1) % 2
        in_copy(i, slot).wait()
        dn = (((1,), (0,)), ((), ()))

        def dots(t_slot, t_index):
            rs = pl.multiple_of(t_index * tile_r, 8)
            bh = bhi_ref[pl.ds(rs, tile_r), :]
            bl = blo_ref[pl.ds(rs, tile_r), :]
            hi = vwhi[t_slot]
            lo = vwlo[t_slot]
            acc = jax.lax.dot_general(bh, hi, dimension_numbers=dn,
                                      preferred_element_type=dtype)
            acc = acc + jax.lax.dot_general(bh, lo, dimension_numbers=dn,
                                            preferred_element_type=dtype)
            acc = acc + jax.lax.dot_general(bl, hi, dimension_numbers=dn,
                                            preferred_element_type=dtype)
            return acc

        def write_split(slot, V, W):
            # the hi parts stay register values through the subtraction
            # (reading vwhi back from VMEM costs an extra full-array VPU
            # read per split on a pass-throughput-bound kernel)
            Vhi = V.astype(split_dt)
            Whi = W.astype(split_dt)
            vwhi[slot, 0:T_ext, :] = Vhi
            vwhi[slot, T_ext : 2 * T_ext, :] = Whi
            vwlo[slot, 0:T_ext, :] = (
                V - Vhi.astype(dtype)).astype(split_dt)
            vwlo[slot, T_ext : 2 * T_ext, :] = (
                W - Whi.astype(dtype)).astype(split_dt)

        def stage_and_split(slot):
            V, W = stage1(bufs[slot], b1s_ref, b1m_ref)
            write_split(slot, V, W)

        def stage_split_and_dots(slot, t_slot, t_index):
            # Fused variant: tile t_slot's three bf16 dot issues are
            # spread INSIDE tile slot's roll loop.  With the dots issued
            # as one up-front block, Mosaic overlaps them with the roll
            # sweeps at K=7 but schedules them back-to-back at K=11
            # (measured: p=5 total = column + row stage exactly, zero
            # overlap; p=3 hides 5.5 us/MDoF).  Interleaving the issues
            # between roll iterations restores the drain at long K.
            rs = pl.multiple_of(t_index * tile_r, 8)
            bh = bhi_ref[pl.ds(rs, tile_r), :]
            bl = blo_ref[pl.ds(rs, tile_r), :]
            hi = vwhi[t_slot]
            lo = vwlo[t_slot]
            dn = (((1,), (0,)), ((), ()))
            uw = bufs[slot]
            V = jnp.zeros((T_ext, W2), dtype)
            W = jnp.zeros((T_ext, W2), dtype)
            acc = None
            # the three staggered issues below assume at least three roll
            # iterations; every supported odd p has K = 2p+1 >= 3, but a
            # forced interleave on a hypothetical K < 3 configuration
            # would silently drop the bh@lo / bl@hi dots
            assert K >= 3
            third = max(1, (K + 2) // 3)  # issue at l = 0, third, 2*third
            for l in range(K):
                if l == 0:
                    acc = jax.lax.dot_general(
                        bh, hi, dimension_numbers=dn,
                        preferred_element_type=dtype)
                elif l == third:
                    acc = acc + jax.lax.dot_general(
                        bh, lo, dimension_numbers=dn,
                        preferred_element_type=dtype)
                elif l == 2 * third:
                    acc = acc + jax.lax.dot_general(
                        bl, hi, dimension_numbers=dn,
                        preferred_element_type=dtype)
                shift = (p - l) % W2
                r = uw if shift == 0 else pltpu.roll(uw, shift, axis=1)
                V = V + b1m_ref[l : l + 1, :] * r
                W = W + b1s_ref[l : l + 1, :] * r
            write_split(slot, V, W)
            return acc

        def main_body(slot_, prev_):
            if interleave:
                acc_prev = stage_split_and_dots(
                    slot_, prev_, jnp.maximum(i - 1, 0))
            else:
                acc_prev = dots(prev_, jnp.maximum(i - 1, 0))
                # stage tile i's operands (VPU) — the scheduler overlaps
                # the in-flight matmuls with these rolls
                stage_and_split(slot_)

            @pl.when(i >= 3)
            def _():
                out_copy(i - 3, prev_).wait()

            ytile[prev_] = acc_prev
            out_copy(i - 1, prev_).start()

        if static_parity:
            # literal slot indices per parity branch: the vwhi/vwlo
            # read (prev) and write (slot) slices become statically
            # disjoint, removing any conservative WAR ordering between
            # the in-flight dots and the split stores
            @pl.when(jnp.logical_and(i > 0, i % 2 == 1))
            def _():
                main_body(1, 0)

            @pl.when(jnp.logical_and(i > 0, i % 2 == 0))
            def _():
                main_body(0, 1)
        else:
            @pl.when(i > 0)
            def _():
                main_body(slot, prev)

        @pl.when(i == 0)
        def _():
            stage_and_split(slot)

        @pl.when(i == n_tiles - 1)
        def _():
            # epilogue: the last tile's own matmuls and output
            acc = dots(slot, i)

            @pl.when(i >= 2)
            def _():
                out_copy(i - 2, slot).wait()

            ytile[slot] = acc
            out_copy(i, slot).start()
            out_copy(i, slot).wait()
            out_copy(i - 1, prev).wait()

    if rows == "mxu3p" and n_tiles > 1:
        # whole B tables VMEM-resident (tiny in bf16); per-tile rows are
        # sliced inside the kernel since step i consumes tile i-1's rows
        table_specs = [
            pl.BlockSpec((n_tiles * tile_r, 2 * T_ext), lambda i: (0, 0)),
            pl.BlockSpec((n_tiles * tile_r, 2 * T_ext), lambda i: (0, 0))]
        extra_scratch = [pltpu.VMEM((NB, 2 * T_ext, W2), split_dt),
                         pltpu.VMEM((NB, 2 * T_ext, W2), split_dt)]
        kernel = kernel_mxu3p
        grid_steps = n_tiles
    elif rows in ("mxu3", "mxu3p"):
        table_specs = [pl.BlockSpec((tile_r, 2 * T_ext), lambda i: (i, 0)),
                       pl.BlockSpec((tile_r, 2 * T_ext), lambda i: (i, 0))]
        extra_scratch = [pltpu.VMEM((2 * T_ext, W2), split_dt),
                         pltpu.VMEM((2 * T_ext, W2), split_dt)]
        kernel = kernel_mxu3
        grid_steps = n_tiles
    elif rows == "mxu":
        table_specs = [pl.BlockSpec((tile_r, 2 * T_ext), lambda i: (i, 0))]
        extra_scratch = [pltpu.VMEM((2 * T_ext, W2), dtype)]
        kernel = kernel_mxu
        grid_steps = n_tiles
    else:
        table_specs = [pl.BlockSpec((tile_r, 128), lambda i: (i, 0)),
                       pl.BlockSpec((tile_r, 128), lambda i: (i, 0))]
        vw_rows = 8 if whole_tile_values else T_ext  # unused when whole-tile
        extra_scratch = [pltpu.VMEM((vw_rows, W2), dtype),
                         pltpu.VMEM((vw_rows, W2), dtype)]
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


def make_padded_laplace2_stream(grid: Grid, dtype=jnp.float32,
                                tile_r: int = 256, interpret: bool = False,
                                bands=None):
    """Auto-pipelined streaming variant of the 2D mxu3p kernel.

    Same math as make_padded_laplace2(rows="mxu3p") — shared-roll column
    stage + bf16x3 MXU row stage, software-pipelined one tile deep so
    tile i-1's matmuls drain under tile i's rolls — but the HBM
    streaming rides Pallas's AUTOMATIC grid pipeline (disjoint BlockSpec
    tiles) instead of the manual make_async_copy double-buffer schedule:
    benchmarks/stream_overlap_micro.py measured the manual schedule
    capping at ~340 GB/s combined on v5e (regardless of buffer count,
    chunk splitting, or separate per-slot buffers) while the auto
    pipeline streams the same stencil-shaped traffic at ~670 GB/s with
    near-perfect overlap of roll-only compute.

    MEASURED RESULT (round 5, v5e, f32): the advantage does NOT survive
    composition with the full mxu3p compute.  Best stream config
    (tile_r=128) vs the production manual kernel (tile_r=96):
    4096^2 43.0 vs 33.2 us/MDoF, 2048^2 40.0 vs 29.2, 1024^2 39.2 vs
    25.4; larger stream tiles are strictly worse (83-132 us/MDoF at
    tile_r=256-512, VMEM-pressure shaped).  The ~14 us/MDoF constant
    overhead exceeds the ~8-10 us/MDoF of un-overlapped streaming it
    was built to hide, so make_padded_laplace2(rows="mxu3p") remains
    the production dispatch at every size and this kernel is committed
    as measured-design-space evidence (the fifth falsified schedule for
    the 4096^2 falloff; see BASELINE.md round-5 closure).  Numerics are
    identical-class (parity vs the manual kernel at ~1e-7 relative in
    f32, exact vs the XLA operator in f64 interpret tests).

    Auto BlockSpec tiles must be disjoint, so the halo rows travel as a
    separately gathered side input (n_tiles * 2H rows, ~6% extra read at
    tile_r=256) and the padded layout is (Rp, W2) with NO guard rows:
    data rows [0, N0), data lanes [p, p + N1).  The layout is closed
    under the apply (band tables are zero on padding rows/lanes), so CG
    runs entirely in it, same as the manual kernels' contract.

    The grid is skewed one step (n_tiles + 1 iterations): step i stages
    tile i's column splits and computes tile i-1's dots; the out
    BlockSpec maps step i to block i-1 (step 0 writes zeros to block 0
    and step 1 revisits it — consecutive revisits never flush the
    garbage).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert grid.dim == 2
    p = grid.degree
    assert p <= 15
    H = _round_up(p, 8)
    N0, N1 = grid.nodes
    tile_r = min(tile_r, _round_up(N0, 8))
    Rp = _round_up(N0, tile_r)
    W2 = _round_up(N1 + 2 * p, 128)
    n_tiles = Rp // tile_r
    K = 2 * p + 1
    T_ext = tile_r + 2 * H
    split_dt = jnp.float32 if dtype == jnp.float64 else jnp.bfloat16

    if bands is None:
        bands = (stiffness_1d(p, grid.cells[0], grid.h[0]).band,
                 mass_1d(p, grid.cells[1], grid.h[1]).band,
                 mass_1d(p, grid.cells[0], grid.h[0]).band,
                 stiffness_1d(p, grid.cells[1], grid.h[1]).band)
    A0b, A1b, B0b, B1b = bands

    b0s = np.zeros((Rp, K))
    b0m = np.zeros((Rp, K))
    b0s[:N0] = A0b
    b0m[:N0] = B0b
    b1s = np.zeros((K, W2))
    b1m = np.zeros((K, W2))
    for l in range(K):
        b1s[l, p : p + N1] = B1b[:, l]
        b1m[l, p : p + N1] = A1b[:, l]

    # dense per-tile row matrices, same window convention as mxu3p:
    # vw row c of tile i <-> data row i*tile_r - H + c
    Bcat = np.zeros((n_tiles, tile_r, 2 * T_ext))
    for i in range(n_tiles):
        for r in range(tile_r):
            for k in range(K):
                Bcat[i, r, H - p + k + r] = b0s[i * tile_r + r, k]
                Bcat[i, r, T_ext + H - p + k + r] = b0m[i * tile_r + r, k]
    Bflat = Bcat.reshape(n_tiles * tile_r, 2 * T_ext)
    B_hi = Bflat.astype(dtype).astype(split_dt)
    B_lo = (Bflat.astype(dtype) - np.asarray(B_hi, dtype)).astype(split_dt)
    row_tables = [jnp.asarray(B_hi), jnp.asarray(B_lo)]
    b1s = jnp.asarray(b1s, dtype)
    b1m = jnp.asarray(b1m, dtype)

    # halo gather indices: tile i's window rows outside its own block —
    # top [i*tile_r - H, i*tile_r) then bottom [(i+1)*tile_r, +H);
    # out-of-range rows (first top / last bottom) gather as zeros
    hidx = np.empty((n_tiles, 2 * H), np.int32)
    for i in range(n_tiles):
        hidx[i, :H] = i * tile_r - H + np.arange(H)
        hidx[i, H:] = (i + 1) * tile_r + np.arange(H)
    hidx = jnp.asarray(hidx.reshape(-1))

    dn = (((1,), (0,)), ((), ()))

    def kernel(u_ref, halo_ref, bhi_ref, blo_ref, b1s_ref, b1m_ref, y_ref,
               vwhi, vwlo):
        i = pl.program_id(0)

        def dots_for(prev_):
            # tile i-1's three bf16 dots, issued as an up-front block
            # BEFORE tile i's rolls so the MXU drains underneath them
            rs = pl.multiple_of((i - 1) * tile_r, 8)
            bh = bhi_ref[pl.ds(rs, tile_r), :]
            bl = blo_ref[pl.ds(rs, tile_r), :]
            hi = vwhi[prev_]
            lo = vwlo[prev_]
            acc = jax.lax.dot_general(bh, hi, dimension_numbers=dn,
                                      preferred_element_type=dtype)
            acc = acc + jax.lax.dot_general(bh, lo, dimension_numbers=dn,
                                            preferred_element_type=dtype)
            acc = acc + jax.lax.dot_general(bl, hi, dimension_numbers=dn,
                                            preferred_element_type=dtype)
            y_ref[...] = acc

        def roll_vw(uw, n_rows):
            V = jnp.zeros((n_rows, W2), dtype)
            W = jnp.zeros((n_rows, W2), dtype)
            for l in range(K):
                shift = (p - l) % W2
                r = uw if shift == 0 else pltpu.roll(uw, shift, axis=1)
                V = V + b1m_ref[l : l + 1, :] * r
                W = W + b1s_ref[l : l + 1, :] * r
            return V, W

        def stage_for(slot_):
            # column stage for tile i: the main block's rows land at
            # window offset H, the gathered halo rows at 0 and H+tile_r
            V, W = roll_vw(u_ref[...], tile_r)
            Vhi = V.astype(split_dt)
            Whi = W.astype(split_dt)
            vwhi[slot_, H : H + tile_r, :] = Vhi
            vwhi[slot_, T_ext + H : T_ext + H + tile_r, :] = Whi
            vwlo[slot_, H : H + tile_r, :] = (
                V - Vhi.astype(dtype)).astype(split_dt)
            vwlo[slot_, T_ext + H : T_ext + H + tile_r, :] = (
                W - Whi.astype(dtype)).astype(split_dt)
            Vh, Wh = roll_vw(halo_ref[...], 2 * H)
            Vhh = Vh.astype(split_dt)
            Whh = Wh.astype(split_dt)
            Vhl = (Vh - Vhh.astype(dtype)).astype(split_dt)
            Whl = (Wh - Whh.astype(dtype)).astype(split_dt)
            for buf, top, bot in ((vwhi, Vhh[:H], Vhh[H:]),
                                  (vwlo, Vhl[:H], Vhl[H:])):
                buf[slot_, 0:H, :] = top
                buf[slot_, H + tile_r : T_ext, :] = bot
            for buf, top, bot in ((vwhi, Whh[:H], Whh[H:]),
                                  (vwlo, Whl[:H], Whl[H:])):
                buf[slot_, T_ext : T_ext + H, :] = top
                buf[slot_, T_ext + H + tile_r : 2 * T_ext, :] = bot

        # literal slot indices per parity branch (static_parity): the
        # vwhi/vwlo read (prev) and write (slot) slices are statically
        # disjoint, so no conservative WAR ordering between the
        # in-flight dots and the split stores
        @pl.when(jnp.logical_and(i > 0, i % 2 == 1))
        def _():
            dots_for(0)

        @pl.when(jnp.logical_and(i > 0, i % 2 == 0))
        def _():
            dots_for(1)

        @pl.when(i == 0)
        def _():
            # step 0's out block is revisited (and fully rewritten) by
            # step 1 before any flush; zeros keep the buffer defined
            y_ref[...] = jnp.zeros((tile_r, W2), dtype)

        @pl.when(jnp.logical_and(i < n_tiles, i % 2 == 0))
        def _():
            stage_for(0)

        @pl.when(jnp.logical_and(i < n_tiles, i % 2 == 1))
        def _():
            stage_for(1)

    last = n_tiles - 1
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, W2), dtype),
        grid=(n_tiles + 1,),
        in_specs=[
            pl.BlockSpec((tile_r, W2),
                         lambda i: (jnp.minimum(i, last), 0)),
            pl.BlockSpec((2 * H, W2),
                         lambda i: (jnp.minimum(i, last), 0)),
            pl.BlockSpec((n_tiles * tile_r, 2 * T_ext), lambda i: (0, 0)),
            pl.BlockSpec((n_tiles * tile_r, 2 * T_ext), lambda i: (0, 0)),
            pl.BlockSpec((K, W2), lambda i: (0, 0)),
            pl.BlockSpec((K, W2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_r, W2),
                               lambda i: (jnp.maximum(i - 1, 0), 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * T_ext, W2), split_dt),
            pltpu.VMEM((2, 2 * T_ext, W2), split_dt),
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
        halos = jnp.take(u_pad, hidx, axis=0, mode="fill", fill_value=0)
        return call(u_pad, halos, *row_tables, b1s, b1m)

    def pad(u):
        out = jnp.zeros((Rp, W2), dtype)
        return jax.lax.dynamic_update_slice(out, u.astype(dtype), (0, p))

    def unpad(u_pad):
        return u_pad[:N0, p : p + N1]

    return apply_padded, pad, unpad, (Rp, W2)


def make_padded_laplace3(grid: Grid, dtype=jnp.float32,
                         tile_planes: int = None, interpret: bool = False,
                         _stages: int = 3):
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
        # budget ~8 full-tile buffers under ~60 MB of VMEM (the c0/c1
        # coefficient inputs are double-buffered by pallas on top)
        max_text = int(60e6 / (8 * W2 * jnp.dtype(dtype).itemsize))
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

        # All three stages run as ROLLED fori_loops over fixed-size row
        # chunks, reading/writing the VMEM scratch refs through 8-aligned
        # dynamic windows with static intra-window slices.  Full-buffer
        # (or even unrolled per-chunk) SSA values make Mosaic's register
        # allocator materialize every temporary at once (measured 79-133
        # MB of spill slots); the rolled loop keeps one chunk live.
        CS = 512
        # stage 3's windows carry a 2*p*N1p-row halo, so its chunks must
        # be much larger to amortize the re-read (window/chunk read ratio
        # 2.97 at CS=512 vs 1.33 at CS=2048 for p=3, N1=160)
        CS3 = 2048

        def staged(total, body, cs=CS):
            n_full = total // cs
            if n_full:
                jax.lax.fori_loop(
                    0, n_full, lambda c, x: (body(c * cs, cs), x)[1], 0)
            if total % cs:
                body(n_full * cs, total % cs)

        # stage 1 (lanes, axis 2): A = U M2ᵀ, B = U S2ᵀ, shared rolls
        def stage1(s, ln):
            uc = bufs[slot, pl.ds(s, ln), :]
            a = jnp.zeros((ln, W2), dtype)
            b = jnp.zeros((ln, W2), dtype)
            for l in range(K):
                r = pltpu.roll(uc, (p - l) % W2, axis=1)
                a = a + b2m_ref[l : l + 1, :] * r
                b = b + b2s_ref[l : l + 1, :] * r
            Abuf[pl.ds(pa + s, ln), :] = a
            Bbuf[pl.ds(pa + s, ln), :] = b

        staged(T_ext, stage1)

        # stage 2 (sublanes, axis 1): P = M1 A, T = S1 A + M1 B.
        # Rows [0, N1p) and [T_ext - N1p, T_ext) of P/T may read the
        # uninitialized A/B guards — stage 3 never reads them.
        def stage2(s, ln):
            a_win = Abuf[pl.ds(s, ln + 2 * pa), :]
            b_win = Bbuf[pl.ds(s, ln + 2 * pa), :]
            cs_ = c1s_ref[pl.ds(s, ln), :]
            cm_ = c1m_ref[pl.ds(s, ln), :]
            P = jnp.zeros((ln, W2), dtype)
            T = jnp.zeros((ln, W2), dtype)
            for k in range(K):
                off = pa + k - p
                a = a_win[off : off + ln, :]
                b = b_win[off : off + ln, :]
                P = P + cm_[:, k : k + 1] * a
                T = T + cs_[:, k : k + 1] * a + cm_[:, k : k + 1] * b
            Pbuf[pl.ds(s, ln), :] = P
            Tbuf[pl.ds(s, ln), :] = T

        if _stages >= 2:
            staged(T_ext, stage2)

        # stage 3 (sublanes, axis 0): y = S0 P + M0 T at plane strides
        @pl.when(i >= 2)
        def _():
            out_copy(i - 2, slot).wait()

        def stage3(s, ln):
            # every P/T slice start (s + (k+1)*N1p) is 8-aligned, so slice
            # the refs directly per k — materializing a whole
            # (ln + 2p*N1p)-row window value copies ~3 MB through VMEM
            # per chunk (measured: stage 3 cost stage-2's when windowed)
            cs_ = c0s_ref[pl.ds(s, ln), :]
            cm_ = c0m_ref[pl.ds(s, ln), :]
            acc = jnp.zeros((ln, W2), dtype)
            for k in range(K):
                pk = Pbuf[pl.ds(s + k * N1p + N1p, ln), :]
                tk = Tbuf[pl.ds(s + k * N1p + N1p, ln), :]
                acc = acc + cs_[:, k : k + 1] * pk
                acc = acc + cm_[:, k : k + 1] * tk
            ytile[slot, pl.ds(s, ln), :] = acc

        if _stages >= 3:
            staged(tile_r, stage3, cs=CS3)
        else:
            def passthrough(s, ln):
                ytile[slot, pl.ds(s, ln), :] = Pbuf[pl.ds(s, ln), :]
            staged(tile_r, passthrough)

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


def make_padded_laplace2_fullmxu(grid: Grid, dtype=jnp.float32,
                                 tile_r: int = None,
                                 interpret: bool = False):
    """Fully-MXU fused 2D GD Laplace: BOTH Kronecker stages ride the MXU.

    The pure-VPU / mxu3 kernels are bound by the 2p+1 cross-lane rolls of
    the column stage (~31 GDoF/s at 1024^2 on v5e, honest timing).  Here
    the column stage is instead a per-lane-block banded matmul: for each
    128-lane output block j, [V_j | W_j] = U_{j-1..j+1} @ C_j with C_j a
    (384, 256) table — the GD band is translation-invariant away from the
    domain boundary, so all interior blocks share one C and only the
    first/last data blocks carry boundary-specific tables.  The row stage
    is the dense-banded per-tile matmul of kernel_mxu.  All matmuls use
    the bf16x3 scheme (hi*hi + hi*lo + lo*hi at DEFAULT precision, ~1e-6
    relative); the VPU only does the hi/lo splits.

    MEASURED (v5e, honest chained timing): flat ~20 GDoF/s at every size
    and degree — 93% of the machine's 146 Tflop/s effective bf16 rate,
    but the algorithm spends ~6.8 kflop/dof (the 384-lane operand
    windows waste 2.7x against the 2p+1 band), so the roll-based mxu3
    kernel (~31 GDoF/s) beats it.  Kept as the measured anchor for the
    all-MXU design point.

    Layout: data lanes at [128 + p, 128 + p + N1) inside W2e =
    128 + roundup(N1 + 2p, 128) + 128 (one guard block each side so every
    3-block operand window is lane-aligned); data rows at [H, H + N0).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert grid.dim == 2
    p = grid.degree
    assert p <= 15
    H = _round_up(p, 8)
    N0, N1 = grid.nodes
    if tile_r is None:
        tile_r = 128 - 2 * H          # T_ext = 128: full MXU row util
    T_ext = tile_r + 2 * H
    Rp = _round_up(N0, tile_r)
    W2i = _round_up(N1 + 2 * p, 128)  # data-carrying lane span
    W2e = W2i + 256                   # + one guard block each side
    nb = W2e // 128
    n_tiles = Rp // tile_r
    K = 2 * p + 1
    R_ext = Rp + 2 * H
    NB = 1 if n_tiles == 1 else 2
    split_dt = jnp.float32 if dtype == jnp.float64 else jnp.bfloat16

    band0s = stiffness_1d(p, grid.cells[0], grid.h[0]).band
    band0m = mass_1d(p, grid.cells[0], grid.h[0]).band
    band1s = stiffness_1d(p, grid.cells[1], grid.h[1]).band
    band1m = mass_1d(p, grid.cells[1], grid.h[1]).band

    # column tables C1[j] (384, 256): out lane x of block j (absolute
    # lane L = j*128 + x, data col c = L - 128 - p) takes operand window
    # row w = 128 + x + (l - p) with coefficient band1[c, l]; out lanes
    # [0:128] build V (mass), [128:256] build W (stiffness)
    C1 = np.zeros((nb, 384, 256))
    for j in range(1, nb - 1):
        for x in range(128):
            c = j * 128 + x - 128 - p
            if not (0 <= c < N1):
                continue
            for l in range(K):
                w = 128 + x + l - p
                C1[j, w, x] = band1m[c, l]
                C1[j, w, 128 + x] = band1s[c, l]
    # row tables: y_tile = Bcat_i @ [V; W] exactly as kernel_mxu
    Bcat = np.zeros((n_tiles, tile_r, 2 * T_ext))
    for i in range(n_tiles):
        for r in range(tile_r):
            g = i * tile_r + r
            if g >= N0:
                continue
            for k in range(K):
                Bcat[i, r, H - p + k + r] = band0s[g, k]
                Bcat[i, r, T_ext + H - p + k + r] = band0m[g, k]
    Bflat = Bcat.reshape(n_tiles * tile_r, 2 * T_ext)

    def split(a):
        hi = a.astype(np.dtype(dtype)).astype(split_dt)
        lo = (a.astype(np.dtype(dtype))
              - np.asarray(hi, np.dtype(dtype))).astype(split_dt)
        return jnp.asarray(hi), jnp.asarray(lo)

    C1hi, C1lo = split(C1.reshape(nb * 384, 256))
    Bhi, Blo = split(Bflat)

    dn = (((1,), (0,)), ((), ()))

    def kernel(u_hbm, bhi_ref, blo_ref, c1hi_ref, c1lo_ref, y_hbm,
               bufs, ytile, zrows, vwhi, vwlo, sem_in, sem_out, sem_z):
        i = pl.program_id(0)

        def in_copy(t, slot):
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(t * tile_r, 8), T_ext), :],
                bufs.at[slot], sem_in.at[slot])

        def out_copy(t, slot):
            return pltpu.make_async_copy(
                ytile.at[slot],
                y_hbm.at[pl.ds(pl.multiple_of(H + t * tile_r, 8),
                               tile_r), :],
                sem_out.at[slot])

        @pl.when(i == 0)
        def _():
            in_copy(0, 0).start()
            if n_tiles > 1:
                in_copy(1, 1).start()
            # zero the output guard rows and the vw guard lane blocks
            # (the guard blocks are never written by the j-loop, and the
            # row matmul propagates their columns into y)
            zrows[...] = jnp.zeros((H, W2e), dtype)
            for lo in (0, H + Rp):
                pltpu.make_async_copy(
                    zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), H), :],
                    sem_z).start()
                pltpu.make_async_copy(
                    zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), H), :],
                    sem_z).wait()
            z = jnp.zeros((2 * T_ext, 128), split_dt)
            for ref in (vwhi, vwlo):
                ref[:, 0:128] = z
                ref[:, W2e - 128 : W2e] = z

        @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
        def _():
            in_copy(i + 1, (i + 1) % 2).start()

        slot = i % NB
        in_copy(i, slot).wait()

        u = bufs[slot]
        uhi = u.astype(split_dt)
        ulo = (u - uhi.astype(dtype)).astype(split_dt)

        # column stage: per-block banded matmuls
        for j in range(1, nb - 1):
            a, b = (j - 1) * 128, (j + 2) * 128
            chi = c1hi_ref[j * 384 : (j + 1) * 384, :]
            clo = c1lo_ref[j * 384 : (j + 1) * 384, :]
            acc = jax.lax.dot_general(
                uhi[:, a:b], chi, dimension_numbers=dn,
                preferred_element_type=dtype)
            acc = acc + jax.lax.dot_general(
                uhi[:, a:b], clo, dimension_numbers=dn,
                preferred_element_type=dtype)
            acc = acc + jax.lax.dot_general(
                ulo[:, a:b], chi, dimension_numbers=dn,
                preferred_element_type=dtype)
            acch = acc.astype(split_dt)
            accl = (acc - acch.astype(dtype)).astype(split_dt)
            L = j * 128
            vwhi[0:T_ext, L : L + 128] = acch[:, 0:128]
            vwhi[T_ext : 2 * T_ext, L : L + 128] = acch[:, 128:256]
            vwlo[0:T_ext, L : L + 128] = accl[:, 0:128]
            vwlo[T_ext : 2 * T_ext, L : L + 128] = accl[:, 128:256]

        # row stage
        acc = jax.lax.dot_general(
            bhi_ref[:], vwhi[:], dimension_numbers=dn,
            preferred_element_type=dtype)
        acc = acc + jax.lax.dot_general(
            bhi_ref[:], vwlo[:], dimension_numbers=dn,
            preferred_element_type=dtype)
        acc = acc + jax.lax.dot_general(
            blo_ref[:], vwhi[:], dimension_numbers=dn,
            preferred_element_type=dtype)

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
        out_shape=jax.ShapeDtypeStruct((R_ext, W2e), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_r, 2 * T_ext), lambda i: (i, 0)),
            pl.BlockSpec((tile_r, 2 * T_ext), lambda i: (i, 0)),
            pl.BlockSpec((nb * 384, 256), lambda i: (0, 0)),
            pl.BlockSpec((nb * 384, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NB, T_ext, W2e), dtype),
            pltpu.VMEM((NB, tile_r, W2e), dtype),
            pltpu.VMEM((H, W2e), dtype),
            pltpu.VMEM((2 * T_ext, W2e), split_dt),
            pltpu.VMEM((2 * T_ext, W2e), split_dt),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * Rp * W2e * (2 * 384 * 256 // 128 + 2 * T_ext),
            bytes_accessed=2 * 4 * Rp * W2e,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def apply_padded(u_pad):
        return call(u_pad, Bhi, Blo, C1hi, C1lo)

    def pad(u):
        out = jnp.zeros((R_ext, W2e), dtype)
        return jax.lax.dynamic_update_slice(
            out, u.astype(dtype), (H, 128 + p))

    def unpad(u_pad):
        return u_pad[H : H + N0, 128 + p : 128 + p + N1]

    return apply_padded, pad, unpad, (R_ext, W2e)


def make_padded_laplace2_hybrid(grid: Grid, dtype=jnp.float32,
                                tile_r: int = 376, vpu_rows: int = 136,
                                interpret: bool = False):
    """Hybrid VPU/MXU fused 2D GD Laplace — the column stage is split BY
    ROWS between both compute units so they run concurrently.

    Cost model (v5e, per 1M dof, honest chained timing): the 2p+1
    cross-lane rolls of the pure-VPU column stage cost ~32 us, the row
    stage as sublane-offset slice FMAs only ~3 us, and the MXU runs bf16
    at ~146 Tflop/s.  A column stage done entirely with per-lane-block
    matmuls costs 3072 flop/dof (vreg-padded K), i.e. ~21 us — no better
    than the rolls.  Splitting the rows ~1/3 VPU : 2/3 MXU would
    equalize both units at ~14 us IF they overlapped perfectly.

    MEASURED: 21.9 GDoF/s at 2048^2 (tr=376, vr=136) — WORSE than mxu3
    (30.8): Mosaic issues the roll loop, the dot loop, and the row stage
    serially (the dot results gate the Vbuf/Wbuf stores, and stores gate
    stage 2), so the modeled concurrency does not materialize.  Kept as
    the measured anchor for the split-row design point; making the VPU
    and MXU phases of CONSECUTIVE tiles overlap (software pipelining
    across the grid dimension) is the open follow-up.

    * rows [0, vpu_rows): V/W by shared lane rolls (stage1 of the vpu
      kernel);
    * rows [vpu_rows, T_ext): ONE +H lane-roll of the u slice, bf16
      hi/lo split, then per-128-lane-block dots [V_j|W_j] =
      ush_win(., 256) @ C_j (256, 256) in the bf16x3 scheme — the +H
      pre-shift makes every 2-vreg operand window 128-lane aligned;
    * row stage: sublane-offset slice FMAs (VPU, cheap).

    Layout: data lanes at [128 + p, 128 + p + N1) inside W2e (one guard
    block each side), data rows at [H, H + N0) — closed under apply.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert grid.dim == 2
    p = grid.degree
    assert p <= 15
    H = _round_up(p, 8)
    N0, N1 = grid.nodes
    tile_r = min(tile_r, _round_up(N0, 8))
    T_ext = tile_r + 2 * H
    vpu_rows = min(vpu_rows, T_ext)
    mxu_rows = T_ext - vpu_rows
    Rp = _round_up(N0, tile_r)
    W2i = _round_up(N1 + 2 * p, 128)
    W2e = W2i + 256
    nb = W2e // 128
    n_tiles = Rp // tile_r
    K = 2 * p + 1
    R_ext = Rp + 2 * H
    NB = 1 if n_tiles == 1 else 2
    split_dt = jnp.float32 if dtype == jnp.float64 else jnp.bfloat16

    band0s = stiffness_1d(p, grid.cells[0], grid.h[0]).band
    band0m = mass_1d(p, grid.cells[0], grid.h[0]).band
    band1s = stiffness_1d(p, grid.cells[1], grid.h[1]).band
    band1m = mass_1d(p, grid.cells[1], grid.h[1]).band

    # row tables (Rp, 128) for the sublane-FMA row stage
    b0s = np.zeros((Rp, 128))
    b0m = np.zeros((Rp, 128))
    b0s[:N0, :K] = band0s
    b0m[:N0, :K] = band0m

    # roll tables (K, W2e) for the VPU column rows
    b1s = np.zeros((K, W2e))
    b1m = np.zeros((K, W2e))
    for l in range(K):
        b1s[l, 128 + p : 128 + p + N1] = band1s[:, l]
        b1m[l, 128 + p : 128 + p + N1] = band1m[:, l]

    # column block tables (nb, 256, 256) for the MXU rows: out lane x of
    # block j (data col c = j*128 + x - 128 - p) reads the +H-rolled
    # window at w = x + H + (l - p); out lanes [0:128] V, [128:256] W
    C1 = np.zeros((nb, 256, 256))
    for j in range(1, nb - 1):
        for x in range(128):
            c = j * 128 + x - 128 - p
            if not (0 <= c < N1):
                continue
            for l in range(K):
                w = x + H + l - p
                C1[j, w, x] = band1m[c, l]
                C1[j, w, 128 + x] = band1s[c, l]

    def hl(a):
        hi = a.astype(np.dtype(dtype)).astype(split_dt)
        lo = (a.astype(np.dtype(dtype))
              - np.asarray(hi, np.dtype(dtype))).astype(split_dt)
        return jnp.asarray(hi), jnp.asarray(lo)

    C1hi, C1lo = hl(C1.reshape(nb * 256, 256))
    b0s, b0m = jnp.asarray(b0s, dtype), jnp.asarray(b0m, dtype)
    b1s, b1m = jnp.asarray(b1s, dtype), jnp.asarray(b1m, dtype)
    dn = (((1,), (0,)), ((), ()))
    CS = 512

    def kernel(u_hbm, b0s_ref, b0m_ref, b1s_ref, b1m_ref,
               c1hi_ref, c1lo_ref, y_hbm,
               bufs, ytile, zrows, Vbuf, Wbuf, sem_in, sem_out, sem_z):
        i = pl.program_id(0)

        def in_copy(t, slot):
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(t * tile_r, 8), T_ext), :],
                bufs.at[slot], sem_in.at[slot])

        def out_copy(t, slot):
            return pltpu.make_async_copy(
                ytile.at[slot],
                y_hbm.at[pl.ds(pl.multiple_of(H + t * tile_r, 8),
                               tile_r), :],
                sem_out.at[slot])

        @pl.when(i == 0)
        def _():
            in_copy(0, 0).start()
            if n_tiles > 1:
                in_copy(1, 1).start()
            zrows[...] = jnp.zeros((H, W2e), dtype)
            for lo in (0, H + Rp):
                pltpu.make_async_copy(
                    zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), H), :],
                    sem_z).start()
                pltpu.make_async_copy(
                    zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), H), :],
                    sem_z).wait()
            # the MXU rows never write the guard lane blocks; zero them
            # once (the VPU rows rewrite them with zeros every tile)
            z = jnp.zeros((T_ext, 128), dtype)
            for ref in (Vbuf, Wbuf):
                ref[:, 0:128] = z
                ref[:, W2e - 128 : W2e] = z

        @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
        def _():
            in_copy(i + 1, (i + 1) % 2).start()

        slot = i % NB
        in_copy(i, slot).wait()

        # column stage, VPU part: shared lane rolls on the top rows
        if vpu_rows:
            uv = bufs[slot, 0:vpu_rows, :]
            V = jnp.zeros((vpu_rows, W2e), dtype)
            W = jnp.zeros((vpu_rows, W2e), dtype)
            for l in range(K):
                r = pltpu.roll(uv, (p - l) % W2e, axis=1)
                V = V + b1m_ref[l : l + 1, :] * r
                W = W + b1s_ref[l : l + 1, :] * r
            Vbuf[0:vpu_rows, :] = V
            Wbuf[0:vpu_rows, :] = W

        # column stage, MXU part: one +H pre-roll, then per-block bf16x3
        if mxu_rows:
            ush = pltpu.roll(bufs[slot, vpu_rows:T_ext, :], H, axis=1)
            uhi = ush.astype(split_dt)
            ulo = (ush - uhi.astype(dtype)).astype(split_dt)
            for j in range(1, nb - 1):
                a, b = j * 128, j * 128 + 256
                chi = c1hi_ref[j * 256 : (j + 1) * 256, :]
                clo = c1lo_ref[j * 256 : (j + 1) * 256, :]
                acc = jax.lax.dot_general(
                    uhi[:, a:b], chi, dimension_numbers=dn,
                    preferred_element_type=dtype)
                acc = acc + jax.lax.dot_general(
                    uhi[:, a:b], clo, dimension_numbers=dn,
                    preferred_element_type=dtype)
                acc = acc + jax.lax.dot_general(
                    ulo[:, a:b], chi, dimension_numbers=dn,
                    preferred_element_type=dtype)
                Vbuf[vpu_rows:T_ext, a : a + 128] = acc[:, 0:128]
                Wbuf[vpu_rows:T_ext, a : a + 128] = acc[:, 128:256]

        @pl.when(i >= 2)
        def _():
            out_copy(i - 2, slot).wait()

        # row stage: sublane-offset slice FMAs (chunked)
        def staged(total, body, cs=CS):
            n_full = total // cs
            if n_full:
                jax.lax.fori_loop(
                    0, n_full, lambda c, x: (body(c * cs, cs), x)[1], 0)
            if total % cs:
                body(n_full * cs, total % cs)

        def stage2(s, ln):
            v_win = Vbuf[pl.ds(s, ln + 2 * H), :]
            w_win = Wbuf[pl.ds(s, ln + 2 * H), :]
            cs_ = b0s_ref[pl.ds(s, ln), :]
            cm_ = b0m_ref[pl.ds(s, ln), :]
            acc = jnp.zeros((ln, W2e), dtype)
            for k in range(K):
                off = H - p + k
                acc = acc + cs_[:, k : k + 1] * v_win[off : off + ln, :]
                acc = acc + cm_[:, k : k + 1] * w_win[off : off + ln, :]
            ytile[slot, pl.ds(s, ln), :] = acc

        staged(tile_r, stage2)
        out_copy(i, slot).start()

        @pl.when(i == n_tiles - 1)
        def _():
            out_copy(i, slot).wait()
            if n_tiles > 1:
                out_copy(i - 1, (i - 1) % 2).wait()

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_ext, W2e), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_r, 128), lambda i: (i, 0)),
            pl.BlockSpec((tile_r, 128), lambda i: (i, 0)),
            pl.BlockSpec((K, W2e), lambda i: (0, 0)),
            pl.BlockSpec((K, W2e), lambda i: (0, 0)),
            pl.BlockSpec((nb * 256, 256), lambda i: (0, 0)),
            pl.BlockSpec((nb * 256, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NB, T_ext, W2e), dtype),
            pltpu.VMEM((NB, tile_r, W2e), dtype),
            pltpu.VMEM((H, W2e), dtype),
            pltpu.VMEM((T_ext, W2e), dtype),
            pltpu.VMEM((T_ext, W2e), dtype),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * Rp * W2e * (512 + K),
            bytes_accessed=2 * 4 * Rp * W2e,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def apply_padded(u_pad):
        return call(u_pad, b0s, b0m, b1s, b1m, C1hi, C1lo)

    def pad(u):
        out = jnp.zeros((R_ext, W2e), dtype)
        return jax.lax.dynamic_update_slice(
            out, u.astype(dtype), (H, 128 + p))

    def unpad(u_pad):
        return u_pad[H : H + N0, 128 + p : 128 + p + N1]

    return apply_padded, pad, unpad, (R_ext, W2e)


def make_padded_laplace3_mxu(grid: Grid, dtype=jnp.float32,
                             tile_planes1: int = None,
                             interpret: bool = False, chunk: int = 1024,
                             pipelined: bool = False):
    """Fused 3D GD Laplace with the plane-coupling stage on the MXU.

    Same operator as make_padded_laplace3 (y = S0⊗M1⊗M2 + M0⊗S1⊗M2 +
    M0⊗M1⊗S2), different TPU mapping: axis 0 (planes) lives on LANES
    (lane p+i0, W0 = roundup(N0+2p, 128)), axes (1, 2) are fused on
    sublane rows r = i1*N2p + i2.  Then

    * stage 1 (axis 2): A = M2·U, B = S2·U — sublane-offset slice FMAs
      at offsets k-p (NO cross-lane rolls anywhere in this kernel);
    * stage 2 (axis 1): P = M1·A, T = S1·A + M1·B at offsets (k-p)*N2p,
      written directly as a bf16 hi/lo split of the lane-concatenated
      [P | T] (rows, 2*W0);
    * stage 3 (axis 0): y = P·S0ᵀ + T·M0ᵀ = [P|T] @ C as THREE DEFAULT
      (bf16) MXU matmuls (hi·hi + hi·lo + lo·hi — the bf16x3 scheme of
      kernel_mxu3), C = [[S0ᵀ],[M0ᵀ]] dense (2*W0, W0), host-split.

    The VPU does only cheap slice FMAs (the pure-VPU kernel's lane rolls
    are its bottleneck), the MXU does the dense plane coupling, and the
    two overlap.  N0 <= W0 data planes; intended for N0 <= ~500.
    Coefficient closure: banded tables are zero for out-of-range/pad
    couplings, so slices crossing i2/i1 blocks always meet a zero
    coefficient, and pad rows/lanes stay identically zero (the padded
    layout is closed under the apply).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert grid.dim == 3
    p = grid.degree
    N0, N1, N2 = grid.nodes
    N2p = _round_up(N2, 8)
    W0 = _round_up(N0 + 2 * p, 128)
    K = 2 * p + 1
    pa = _round_up(p, 8)
    Hg = p * N2p + pa           # row halo: stage-2 reach + stage-1 reach
    R = N1 * N2p

    if tile_planes1 is None:
        # budget ~110 MB VMEM across bufs/A/B/PT/ytile (~56 B per row;
        # the pipelined variant double-buffers PT)
        pt_b = (4 if pipelined else 2) * 2 * W0 * 2
        max_rows = int(90e6 / ((2 + 2 + 2 + 2) * W0 * 4 + pt_b))
        tile_planes1 = max(1, min(N1, (max_rows - 2 * Hg) // N2p))
    n_tiles = -(-N1 // tile_planes1)
    tile_planes1 = -(-N1 // n_tiles)
    tile_r = tile_planes1 * N2p
    Rp = n_tiles * tile_r
    R_ext = Rp + 2 * Hg
    T_ext = tile_r + 2 * Hg
    NB = 1 if n_tiles == 1 else 2

    band0s = stiffness_1d(p, grid.cells[0], grid.h[0])
    band0m = mass_1d(p, grid.cells[0], grid.h[0])
    band1s = stiffness_1d(p, grid.cells[1], grid.h[1]).band
    band1m = mass_1d(p, grid.cells[1], grid.h[1]).band
    band2s = stiffness_1d(p, grid.cells[2], grid.h[2]).band
    band2m = mass_1d(p, grid.cells[2], grid.h[2]).band

    # stage-1 tables (T_ext, 128), periodic in N2p with the window phase:
    # window row w corresponds to global row w - Hg (mod N2p)
    c2s = np.zeros((T_ext, 128))
    c2m = np.zeros((T_ext, 128))
    i2 = (np.arange(T_ext) - Hg) % N2p
    v2 = i2 < N2
    c2s[v2, :K] = band2s[i2[v2]]
    c2m[v2, :K] = band2m[i2[v2]]

    # stage-2 global tables (Rp, 128) keyed by i1 = g // N2p
    c1s = np.zeros((Rp, 128))
    c1m = np.zeros((Rp, 128))
    g = np.arange(Rp)
    i1 = g // N2p
    v1 = (i1 < N1) & (g % N2p < N2)
    c1s[v1, :K] = band1s[i1[v1]]
    c1m[v1, :K] = band1m[i1[v1]]

    # stage-3 dense lane matrices C = [[S0^T],[M0^T]] (2*W0, W0), bf16
    # hi/lo split on host
    split_dt = jnp.float32 if dtype == jnp.float64 else jnp.bfloat16
    C = np.zeros((2 * W0, W0), np.dtype(dtype))
    C[p : p + N0, p : p + N0] = band0s.full().T
    C[W0 + p : W0 + p + N0, p : p + N0] = band0m.full().T
    C_hi = C.astype(split_dt)
    C_lo = (C - np.asarray(C_hi, np.dtype(dtype))).astype(split_dt)

    c2s, c2m = jnp.asarray(c2s, dtype), jnp.asarray(c2m, dtype)
    c1s, c1m = jnp.asarray(c1s, dtype), jnp.asarray(c1m, dtype)
    C_hi, C_lo = jnp.asarray(C_hi), jnp.asarray(C_lo)

    CS = chunk

    def kernel(u_hbm, c1s_ref, c1m_ref, c2s_ref, c2m_ref, chi_ref, clo_ref,
               y_hbm, bufs, ytile, zrows, Abuf, Bbuf, pthi, ptlo,
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
            zrows[...] = jnp.zeros((Hg, W0), dtype)
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

        def staged(lo, total, body, cs=CS):
            n_full = total // cs
            if n_full:
                jax.lax.fori_loop(
                    0, n_full, lambda c, x: (body(lo + c * cs, cs), x)[1], 0)
            if total % cs:
                body(lo + n_full * cs, total % cs)

        # stage 1: A/B rows [pa, T_ext - pa) (all stage-2 reads), taps
        # at sublane offsets k-p stay inside the u window
        def stage1(s, ln):
            uw = bufs[slot, pl.ds(s - pa, ln + 2 * pa), :]
            cs_ = c2s_ref[pl.ds(s, ln), :]
            cm_ = c2m_ref[pl.ds(s, ln), :]
            a = jnp.zeros((ln, W0), dtype)
            b = jnp.zeros((ln, W0), dtype)
            for k in range(K):
                off = pa + k - p
                u_ = uw[off : off + ln, :]
                a = a + cm_[:, k : k + 1] * u_
                b = b + cs_[:, k : k + 1] * u_
            Abuf[pl.ds(s, ln), :] = a
            Bbuf[pl.ds(s, ln), :] = b

        staged(pa, T_ext - 2 * pa, stage1)

        # stage 2: P/T on output rows, written as bf16 hi/lo of [P | T]
        def stage2(s, ln):
            cs_ = c1s_ref[pl.ds(s, ln), :]
            cm_ = c1m_ref[pl.ds(s, ln), :]
            P = jnp.zeros((ln, W0), dtype)
            T = jnp.zeros((ln, W0), dtype)
            for k in range(K):
                off = Hg + (k - p) * N2p
                a = Abuf[pl.ds(s + off, ln), :]
                b = Bbuf[pl.ds(s + off, ln), :]
                P = P + cm_[:, k : k + 1] * a
                T = T + cs_[:, k : k + 1] * a + cm_[:, k : k + 1] * b
            Phi = P.astype(split_dt)
            Thi = T.astype(split_dt)
            pthi[pl.ds(s, ln), 0:W0] = Phi
            pthi[pl.ds(s, ln), W0 : 2 * W0] = Thi
            ptlo[pl.ds(s, ln), 0:W0] = (P - Phi.astype(dtype)).astype(
                split_dt)
            ptlo[pl.ds(s, ln), W0 : 2 * W0] = (T - Thi.astype(dtype)).astype(
                split_dt)

        staged(0, tile_r, stage2)

        @pl.when(i >= 2)
        def _():
            out_copy(i - 2, slot).wait()

        # stage 3: y = [P|T] @ C on the MXU, bf16x3
        dn = (((1,), (0,)), ((), ()))

        def stage3(s, ln):
            hi = pthi[pl.ds(s, ln), :]
            lo = ptlo[pl.ds(s, ln), :]
            acc = jax.lax.dot_general(
                hi, chi_ref[:], dimension_numbers=dn,
                preferred_element_type=dtype)
            acc = acc + jax.lax.dot_general(
                hi, clo_ref[:], dimension_numbers=dn,
                preferred_element_type=dtype)
            acc = acc + jax.lax.dot_general(
                lo, chi_ref[:], dimension_numbers=dn,
                preferred_element_type=dtype)
            ytile[slot, pl.ds(s, ln), :] = acc

        staged(0, tile_r, stage3)

        out_copy(i, slot).start()

        @pl.when(i == n_tiles - 1)
        def _():
            out_copy(i, slot).wait()
            if n_tiles > 1:
                out_copy(i - 1, (i - 1) % 2).wait()

    def kernel_p(u_hbm, c1s_ref, c1m_ref, c2s_ref, c2m_ref, chi_ref,
                 clo_ref, y_hbm, bufs, ytile, zrows, Abuf, Bbuf, pthi,
                 ptlo, sem_in, sem_out, sem_z):
        # Cross-tile software-pipelined variant: step i ISSUES the
        # stage-3 matmuls for tile i-1 (operands staged at step i-1,
        # PT double-buffered) BEFORE running tile i's VPU stages 1-2,
        # so the MXU drains under the slice-FMA sweeps (the mxu3p
        # scheduling pattern).
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
            zrows[...] = jnp.zeros((Hg, W0), dtype)
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
        prev = (i - 1) % NB
        in_copy(i, slot).wait()

        def staged(lo, total, body, cs=CS):
            n_full = total // cs
            if n_full:
                jax.lax.fori_loop(
                    0, n_full,
                    lambda c, x: (body(lo + c * cs, cs), x)[1], 0)
            if total % cs:
                body(lo + n_full * cs, total % cs)

        dn = (((1,), (0,)), ((), ()))

        def stage3_into(pslot, yslot):
            def stage3(s, ln):
                hi = pthi[pslot, pl.ds(s, ln), :]
                lo = ptlo[pslot, pl.ds(s, ln), :]
                acc = jax.lax.dot_general(
                    hi, chi_ref[:], dimension_numbers=dn,
                    preferred_element_type=dtype)
                acc = acc + jax.lax.dot_general(
                    hi, clo_ref[:], dimension_numbers=dn,
                    preferred_element_type=dtype)
                acc = acc + jax.lax.dot_general(
                    lo, chi_ref[:], dimension_numbers=dn,
                    preferred_element_type=dtype)
                ytile[yslot, pl.ds(s, ln), :] = acc

            staged(0, tile_r, stage3)

        # (a) tile i-1's stage-3 matmuls (operands ready) + its output
        @pl.when(i > 0)
        def _():
            @pl.when(i >= 3)
            def _():
                out_copy(i - 3, prev).wait()

            stage3_into(prev, prev)
            out_copy(i - 1, prev).start()

        # (b) tile i's stages 1-2 (VPU) — dependency-free of (a)'s dots
        def stage1(s, ln):
            uw = bufs[slot, pl.ds(s - pa, ln + 2 * pa), :]
            cs_ = c2s_ref[pl.ds(s, ln), :]
            cm_ = c2m_ref[pl.ds(s, ln), :]
            a = jnp.zeros((ln, W0), dtype)
            b = jnp.zeros((ln, W0), dtype)
            for k in range(K):
                off = pa + k - p
                u_ = uw[off : off + ln, :]
                a = a + cm_[:, k : k + 1] * u_
                b = b + cs_[:, k : k + 1] * u_
            Abuf[pl.ds(s, ln), :] = a
            Bbuf[pl.ds(s, ln), :] = b

        staged(pa, T_ext - 2 * pa, stage1)

        def stage2(s, ln):
            cs_ = c1s_ref[pl.ds(s, ln), :]
            cm_ = c1m_ref[pl.ds(s, ln), :]
            P = jnp.zeros((ln, W0), dtype)
            T = jnp.zeros((ln, W0), dtype)
            for k in range(K):
                off = Hg + (k - p) * N2p
                a = Abuf[pl.ds(s + off, ln), :]
                b = Bbuf[pl.ds(s + off, ln), :]
                P = P + cm_[:, k : k + 1] * a
                T = T + cs_[:, k : k + 1] * a + cm_[:, k : k + 1] * b
            Phi = P.astype(split_dt)
            Thi = T.astype(split_dt)
            pthi[slot, pl.ds(s, ln), 0:W0] = Phi
            pthi[slot, pl.ds(s, ln), W0 : 2 * W0] = Thi
            ptlo[slot, pl.ds(s, ln), 0:W0] = (
                P - Phi.astype(dtype)).astype(split_dt)
            ptlo[slot, pl.ds(s, ln), W0 : 2 * W0] = (
                T - Thi.astype(dtype)).astype(split_dt)

        staged(0, tile_r, stage2)

        @pl.when(i == n_tiles - 1)
        def _():
            @pl.when(i >= 2)
            def _():
                out_copy(i - 2, slot).wait()

            stage3_into(slot, slot)
            out_copy(i, slot).start()
            out_copy(i, slot).wait()
            if n_tiles > 1:
                out_copy(i - 1, prev).wait()

    npt = NB if pipelined else 1
    call = pl.pallas_call(
        kernel_p if pipelined else kernel,
        out_shape=jax.ShapeDtypeStruct((R_ext, W0), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_r, 128), lambda i: (i, 0)),
            pl.BlockSpec((tile_r, 128), lambda i: (i, 0)),
            pl.BlockSpec((T_ext, 128), lambda i: (0, 0)),
            pl.BlockSpec((T_ext, 128), lambda i: (0, 0)),
            pl.BlockSpec((2 * W0, W0), lambda i: (0, 0)),
            pl.BlockSpec((2 * W0, W0), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NB, T_ext, W0), dtype),
            pltpu.VMEM((NB, tile_r, W0), dtype),
            pltpu.VMEM((Hg, W0), dtype),
            pltpu.VMEM((T_ext, W0), dtype),
            pltpu.VMEM((T_ext, W0), dtype),
        ] + ([pltpu.VMEM((npt, tile_r, 2 * W0), split_dt),
              pltpu.VMEM((npt, tile_r, 2 * W0), split_dt)]
             if pipelined else
             [pltpu.VMEM((tile_r, 2 * W0), split_dt),
              pltpu.VMEM((tile_r, 2 * W0), split_dt)]) + [
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 7 * K * Rp * W0 + 2 * 3 * Rp * 2 * W0 * W0,
            bytes_accessed=2 * 4 * Rp * W0,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def apply_padded(u_pad):
        return call(u_pad, c1s, c1m, c2s, c2m, C_hi, C_lo)

    def pad(u):
        u3 = u.reshape(N0, N1, N2).astype(dtype).transpose(1, 2, 0)
        tmp = jnp.zeros((N1, N2p, W0), dtype)
        tmp = jax.lax.dynamic_update_slice(tmp, u3, (0, 0, p))
        out = jnp.zeros((R_ext, W0), dtype)
        return jax.lax.dynamic_update_slice(
            out, tmp.reshape(R, W0), (Hg, 0))

    def unpad(u_pad):
        t = u_pad[Hg : Hg + R].reshape(N1, N2p, W0)[:, :N2, p : p + N0]
        return t.transpose(2, 0, 1)

    return apply_padded, pad, unpad, (R_ext, W0)


def make_padded_laplace2_mxucol(grid: Grid, dtype=jnp.float32,
                                tile_r: int = 256, interpret: bool = False):
    """Roll-free-column fused 2D GD Laplace: the column stage rides the
    MXU, the row stage rides the VPU, cross-tile software-pipelined.

    The pure-VPU/mxu3p kernels are bound by the 2p+1 cross-lane rolls of
    the column stage (~4.3 cycles/vreg each vs ~0.2 for a slice FMA —
    see benchmarks/mxu_micro.py).  This kernel eliminates ALL per-tap
    rolls:

    * column stage (MXU): per 128-lane output block j,
      [V_j | W_j] = u[:, j*128 : j*128+256] @ C_j with C_j a (256, 256)
      banded table, bf16x3 (hi*hi + hi*lo + lo*hi at DEFAULT precision,
      ~1e-6 relative).  The minimum operand window for a 128-lane output
      with a 2p+1 band is 2 vregs, so the MXU cost is 3072 flop/dof —
      ~21 us/MDoF at the measured 146 Tflop/s effective bf16 rate.
      Window alignment without a pre-roll: V/W store data column c at
      lane 128 + c while u stores it at lane 128 + p + c, so every tap
      lands at window lane x + l in [0, 127 + 2p] — the -p layout shift
      is undone by ONE post-roll of the y tile.
    * row stage (VPU): y = S0 V + M0 W as sublane-offset slice FMAs
      (cheap), run for tile i-1 WHILE tile i's matmuls drain on the MXU
      (the cross-tile pipelining that bought mxu3p +10-12%); the stores
      of tile i's dot results come after, so the VPU work between issue
      and drain is dependency-free.

    Layout: data lanes [128 + p, 128 + p + N1) inside W2e = W2i + 256
    (one guard block each side), data rows [H, H + N0); closed under the
    apply (guard/pad regions stay exactly zero), so CG can chain it.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert grid.dim == 2
    p = grid.degree
    assert p <= 15
    H = _round_up(p, 8)
    N0, N1 = grid.nodes
    tile_r = min(tile_r, _round_up(N0, 8))
    T_ext = tile_r + 2 * H
    Rp = _round_up(N0, tile_r)
    n_tiles = Rp // tile_r
    W2i = _round_up(N1 + 2 * p, 128)
    W2e = W2i + 256
    nb = W2e // 128
    K = 2 * p + 1
    R_ext = Rp + 2 * H
    NB = 1 if n_tiles == 1 else 2
    split_dt = jnp.float32 if dtype == jnp.float64 else jnp.bfloat16

    band0s = stiffness_1d(p, grid.cells[0], grid.h[0]).band
    band0m = mass_1d(p, grid.cells[0], grid.h[0]).band
    band1s = stiffness_1d(p, grid.cells[1], grid.h[1]).band
    band1m = mass_1d(p, grid.cells[1], grid.h[1]).band

    # row tables (Rp, 128), sliced per tile inside the kernel (the
    # pipelined row stage at grid step i consumes tile i-1's rows)
    b0s = np.zeros((Rp, 128))
    b0m = np.zeros((Rp, 128))
    b0s[:N0, :K] = band0s
    b0m[:N0, :K] = band0m

    # column block tables (nb, 256, 256): out lane x of block j is data
    # col c = (j-1)*128 + x (the -p-shifted V/W layout); tap l reads
    # data col c + l - p at absolute lane 128 + c + l = window lane x + l
    C = np.zeros((nb, 256, 256))
    jd = []
    for j in range(1, nb - 1):
        used = False
        for x in range(128):
            c = (j - 1) * 128 + x
            if not (0 <= c < N1):
                continue
            used = True
            for l in range(K):
                C[j, x + l, x] = band1m[c, l]
                C[j, x + l, 128 + x] = band1s[c, l]
        if used:
            jd.append(j)

    def hl(a):
        hi = a.astype(np.dtype(dtype)).astype(split_dt)
        lo = (a.astype(np.dtype(dtype))
              - np.asarray(hi, np.dtype(dtype))).astype(split_dt)
        return jnp.asarray(hi), jnp.asarray(lo)

    Chi, Clo = hl(C.reshape(nb * 256, 256))
    b0s, b0m = jnp.asarray(b0s, dtype), jnp.asarray(b0m, dtype)
    dn = (((1,), (0,)), ((), ()))

    def kernel(u_hbm, b0s_ref, b0m_ref, chi_ref, clo_ref, y_hbm,
               bufs, ytile, zrows, Vbuf, Wbuf, sem_in, sem_out, sem_z):
        i = pl.program_id(0)

        def in_copy(t, slot):
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(t * tile_r, 8), T_ext), :],
                bufs.at[slot], sem_in.at[slot])

        def out_copy(t, slot):
            return pltpu.make_async_copy(
                ytile.at[slot],
                y_hbm.at[pl.ds(pl.multiple_of(H + t * tile_r, 8),
                               tile_r), :],
                sem_out.at[slot])

        @pl.when(i == 0)
        def _():
            in_copy(0, 0).start()
            if n_tiles > 1:
                in_copy(1, 1).start()
            zrows[...] = jnp.zeros((H, W2e), dtype)
            for lo in (0, H + Rp):
                pltpu.make_async_copy(
                    zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), H), :],
                    sem_z).start()
                pltpu.make_async_copy(
                    zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), H), :],
                    sem_z).wait()
            # blocks the dot loop never writes must stay zero (the row
            # stage propagates V/W columns into y, and the post-roll
            # wraps the last guard block's lanes into [0, p))
            z = jnp.zeros((T_ext, 128), split_dt).astype(dtype)
            for j in range(nb):
                if j in jd:
                    continue
                for ref in (Vbuf, Wbuf):
                    for s in range(NB):
                        ref[s, :, j * 128 : (j + 1) * 128] = z

        @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
        def _():
            in_copy(i + 1, (i + 1) % 2).start()

        slot = i % NB
        prev = (i - 1) % NB
        in_copy(i, slot).wait()

        u = bufs[slot]
        uhi = u.astype(split_dt)
        ulo = (u - uhi.astype(dtype)).astype(split_dt)

        # issue the column matmuls for tile i (MXU)
        accs = []
        for j in jd:
            a = j * 128
            chi = chi_ref[j * 256 : (j + 1) * 256, :]
            clo = clo_ref[j * 256 : (j + 1) * 256, :]
            acc = jax.lax.dot_general(
                uhi[:, a : a + 256], chi, dimension_numbers=dn,
                preferred_element_type=dtype)
            acc = acc + jax.lax.dot_general(
                uhi[:, a : a + 256], clo, dimension_numbers=dn,
                preferred_element_type=dtype)
            acc = acc + jax.lax.dot_general(
                ulo[:, a : a + 256], chi, dimension_numbers=dn,
                preferred_element_type=dtype)
            accs.append(acc)

        def row_stage(t_index, vslot):
            # y_shifted = S0 V + M0 W (sublane slice FMAs), then ONE +p
            # lane roll back into u's layout
            rs = pl.multiple_of(t_index * tile_r, 8)
            cs_ = b0s_ref[pl.ds(rs, tile_r), :]
            cm_ = b0m_ref[pl.ds(rs, tile_r), :]
            v_win = Vbuf[vslot]
            w_win = Wbuf[vslot]
            acc = jnp.zeros((tile_r, W2e), dtype)
            for k in range(K):
                off = H - p + k
                acc = acc + cs_[:, k : k + 1] * v_win[off : off + tile_r, :]
                acc = acc + cm_[:, k : k + 1] * w_win[off : off + tile_r, :]
            return pltpu.roll(acc, p, axis=1)

        # row stage for tile i-1 (VPU) runs while tile i's matmuls drain
        @pl.when(i > 0)
        def _():
            y = row_stage(i - 1, prev)

            @pl.when(i >= 3)
            def _():
                out_copy(i - 3, prev).wait()

            ytile[prev] = y
            out_copy(i - 1, prev).start()

        # drain the matmuls into V/W for the NEXT step's row stage
        for j, acc in zip(jd, accs):
            a = j * 128
            Vbuf[slot, :, a : a + 128] = acc[:, 0:128]
            Wbuf[slot, :, a : a + 128] = acc[:, 128:256]

        @pl.when(i == n_tiles - 1)
        def _():
            y = row_stage(i, slot)

            @pl.when(i >= 2)
            def _():
                out_copy(i - 2, slot).wait()

            ytile[slot] = y
            out_copy(i, slot).start()
            out_copy(i, slot).wait()
            if n_tiles > 1:
                out_copy(i - 1, prev).wait()

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_ext, W2e), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Rp, 128), lambda i: (0, 0)),
            pl.BlockSpec((Rp, 128), lambda i: (0, 0)),
            pl.BlockSpec((nb * 256, 256), lambda i: (0, 0)),
            pl.BlockSpec((nb * 256, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NB, T_ext, W2e), dtype),
            pltpu.VMEM((NB, tile_r, W2e), dtype),
            pltpu.VMEM((H, W2e), dtype),
            pltpu.VMEM((NB, T_ext, W2e), dtype),
            pltpu.VMEM((NB, T_ext, W2e), dtype),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * len(jd) * T_ext * 256 * 256 * n_tiles,
            bytes_accessed=2 * 4 * Rp * W2e,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def apply_padded(u_pad):
        return call(u_pad, b0s, b0m, Chi, Clo)

    def pad(u):
        out = jnp.zeros((R_ext, W2e), dtype)
        return jax.lax.dynamic_update_slice(
            out, u.astype(dtype), (H, 128 + p))

    def unpad(u_pad):
        return u_pad[H : H + N0, 128 + p : 128 + p + N1]

    return apply_padded, pad, unpad, (R_ext, W2e)


def make_padded_laplace2_hybp(grid: Grid, dtype=jnp.float32,
                              tile_r: int = 256, vpu_rows: int = None,
                              interpret: bool = False):
    """Row-split hybrid column stage, cross-tile pipelined.

    The roll microbenchmark (benchmarks/mxu_micro.py) shows the column
    stage is VPU-PASS-THROUGHPUT bound (a roll+add pass ~2.9 us/MDoF vs
    ~1.9 for an FMA pass; K rolls + 2K FMAs ~= 20 us/MDoF at p=3), and
    mxu3p's total (28 us) is already near that ceiling.  The only way
    past it is to offload part of the column work to the MXU and OVERLAP:

    * rows [0, vr) of each tile: shared lane rolls (the mxu3p column
      stage, rewritten to emit the -p-SHIFTED V/W layout so both paths
      agree: tap l is roll(u, -l) with tables b[l, 128+c] = band1[c, l]);
    * rows [vr, T_ext): per-128-lane-block banded MXU matmuls
      [V_j | W_j] = u[:, j*128 : j*128+256] @ C_j, bf16x3 (the mxucol
      column stage);
    * cross-tile pipelining: tile i's dots are ISSUED before tile i's
      VPU rolls and tile i-1's row stage; the dot results are stored
      after, so all VPU work in between is dependency-free and drains
      under the in-flight matmuls (the mxu3p scheduling pattern).
    * row stage: sublane slice FMAs + ONE +p post-roll of y.

    vr tunes the VPU:MXU balance; with perfect overlap the optimum is
    vr/T_ext ~ t_mxu/(t_vpu + t_mxu).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert grid.dim == 2
    p = grid.degree
    assert p <= 15
    H = _round_up(p, 8)
    N0, N1 = grid.nodes
    tile_r = min(tile_r, _round_up(N0, 8))
    T_ext = tile_r + 2 * H
    if vpu_rows is None:
        vpu_rows = _round_up(2 * T_ext // 3, 8)
    vpu_rows = min(vpu_rows, T_ext)
    mxu_rows = T_ext - vpu_rows
    Rp = _round_up(N0, tile_r)
    n_tiles = Rp // tile_r
    W2i = _round_up(N1 + 2 * p, 128)
    W2e = W2i + 256
    nb = W2e // 128
    K = 2 * p + 1
    R_ext = Rp + 2 * H
    NB = 1 if n_tiles == 1 else 2
    split_dt = jnp.float32 if dtype == jnp.float64 else jnp.bfloat16

    band0s = stiffness_1d(p, grid.cells[0], grid.h[0]).band
    band0m = mass_1d(p, grid.cells[0], grid.h[0]).band
    band1s = stiffness_1d(p, grid.cells[1], grid.h[1]).band
    band1m = mass_1d(p, grid.cells[1], grid.h[1]).band

    # row tables (Rp, 128)
    b0s = np.zeros((Rp, 128))
    b0m = np.zeros((Rp, 128))
    b0s[:N0, :K] = band0s
    b0m[:N0, :K] = band0m

    # VPU roll tables in the SHIFTED output layout: tap l (roll -l) at
    # out lane 128 + c carries band1[c, l]
    b1s = np.zeros((K, W2e))
    b1m = np.zeros((K, W2e))
    for l in range(K):
        b1s[l, 128 : 128 + N1] = band1s[:, l]
        b1m[l, 128 : 128 + N1] = band1m[:, l]

    # MXU column block tables (shared construction with mxucol)
    C = np.zeros((nb, 256, 256))
    jd = []
    for j in range(1, nb - 1):
        used = False
        for x in range(128):
            c = (j - 1) * 128 + x
            if not (0 <= c < N1):
                continue
            used = True
            for l in range(K):
                C[j, x + l, x] = band1m[c, l]
                C[j, x + l, 128 + x] = band1s[c, l]
        if used:
            jd.append(j)

    def hl(a):
        hi = a.astype(np.dtype(dtype)).astype(split_dt)
        lo = (a.astype(np.dtype(dtype))
              - np.asarray(hi, np.dtype(dtype))).astype(split_dt)
        return jnp.asarray(hi), jnp.asarray(lo)

    Chi, Clo = hl(C.reshape(nb * 256, 256))
    b0s, b0m = jnp.asarray(b0s, dtype), jnp.asarray(b0m, dtype)
    b1s, b1m = jnp.asarray(b1s, dtype), jnp.asarray(b1m, dtype)
    dn = (((1,), (0,)), ((), ()))

    def kernel(u_hbm, b0s_ref, b0m_ref, b1s_ref, b1m_ref, chi_ref, clo_ref,
               y_hbm, bufs, ytile, zrows, Vbuf, Wbuf,
               sem_in, sem_out, sem_z):
        i = pl.program_id(0)

        def in_copy(t, slot):
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(t * tile_r, 8), T_ext), :],
                bufs.at[slot], sem_in.at[slot])

        def out_copy(t, slot):
            return pltpu.make_async_copy(
                ytile.at[slot],
                y_hbm.at[pl.ds(pl.multiple_of(H + t * tile_r, 8),
                               tile_r), :],
                sem_out.at[slot])

        @pl.when(i == 0)
        def _():
            in_copy(0, 0).start()
            if n_tiles > 1:
                in_copy(1, 1).start()
            zrows[...] = jnp.zeros((H, W2e), dtype)
            for lo in (0, H + Rp):
                pltpu.make_async_copy(
                    zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), H), :],
                    sem_z).start()
                pltpu.make_async_copy(
                    zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), H), :],
                    sem_z).wait()
            # MXU rows never write the non-data blocks; the VPU rows
            # write zeros there every tile (zero tables), so zero the
            # MXU row range of those blocks once
            if mxu_rows:
                z = jnp.zeros((mxu_rows, 128), split_dt).astype(dtype)
                for j in range(nb):
                    if j in jd:
                        continue
                    for ref in (Vbuf, Wbuf):
                        for s in range(NB):
                            ref[s, vpu_rows:T_ext,
                                j * 128 : (j + 1) * 128] = z

        @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
        def _():
            in_copy(i + 1, (i + 1) % 2).start()

        slot = i % NB
        prev = (i - 1) % NB
        in_copy(i, slot).wait()

        # (a) issue tile i's MXU column dots
        accs = []
        if mxu_rows:
            um = bufs[slot, vpu_rows:T_ext, :]
            uhi = um.astype(split_dt)
            ulo = (um - uhi.astype(dtype)).astype(split_dt)
            for j in jd:
                a = j * 128
                chi = chi_ref[j * 256 : (j + 1) * 256, :]
                clo = clo_ref[j * 256 : (j + 1) * 256, :]
                acc = jax.lax.dot_general(
                    uhi[:, a : a + 256], chi, dimension_numbers=dn,
                    preferred_element_type=dtype)
                acc = acc + jax.lax.dot_general(
                    uhi[:, a : a + 256], clo, dimension_numbers=dn,
                    preferred_element_type=dtype)
                acc = acc + jax.lax.dot_general(
                    ulo[:, a : a + 256], chi, dimension_numbers=dn,
                    preferred_element_type=dtype)
                accs.append(acc)

        # (b) tile i's VPU rolls (shifted layout, dependency-free)
        if vpu_rows:
            uv = bufs[slot, 0:vpu_rows, :]
            V = jnp.zeros((vpu_rows, W2e), dtype)
            W = jnp.zeros((vpu_rows, W2e), dtype)
            for l in range(K):
                r = uv if l == 0 else pltpu.roll(uv, W2e - l, axis=1)
                V = V + b1m_ref[l : l + 1, :] * r
                W = W + b1s_ref[l : l + 1, :] * r

        def row_stage(t_index, vslot):
            rs = pl.multiple_of(t_index * tile_r, 8)
            cs_ = b0s_ref[pl.ds(rs, tile_r), :]
            cm_ = b0m_ref[pl.ds(rs, tile_r), :]
            v_win = Vbuf[vslot]
            w_win = Wbuf[vslot]
            acc = jnp.zeros((tile_r, W2e), dtype)
            for k in range(K):
                off = H - p + k
                acc = acc + cs_[:, k : k + 1] * v_win[off : off + tile_r, :]
                acc = acc + cm_[:, k : k + 1] * w_win[off : off + tile_r, :]
            return pltpu.roll(acc, p, axis=1)

        # (c) tile i-1's row stage (dependency-free of the dots)
        @pl.when(i > 0)
        def _():
            y = row_stage(i - 1, prev)

            @pl.when(i >= 3)
            def _():
                out_copy(i - 3, prev).wait()

            ytile[prev] = y
            out_copy(i - 1, prev).start()

        # (d) drain: stores of tile i's V/W
        if vpu_rows:
            Vbuf[slot, 0:vpu_rows, :] = V
            Wbuf[slot, 0:vpu_rows, :] = W
        for j, acc in zip(jd, accs):
            a = j * 128
            Vbuf[slot, vpu_rows:T_ext, a : a + 128] = acc[:, 0:128]
            Wbuf[slot, vpu_rows:T_ext, a : a + 128] = acc[:, 128:256]

        @pl.when(i == n_tiles - 1)
        def _():
            y = row_stage(i, slot)

            @pl.when(i >= 2)
            def _():
                out_copy(i - 2, slot).wait()

            ytile[slot] = y
            out_copy(i, slot).start()
            out_copy(i, slot).wait()
            if n_tiles > 1:
                out_copy(i - 1, prev).wait()

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_ext, W2e), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Rp, 128), lambda i: (0, 0)),
            pl.BlockSpec((Rp, 128), lambda i: (0, 0)),
            pl.BlockSpec((K, W2e), lambda i: (0, 0)),
            pl.BlockSpec((K, W2e), lambda i: (0, 0)),
            pl.BlockSpec((nb * 256, 256), lambda i: (0, 0)),
            pl.BlockSpec((nb * 256, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NB, T_ext, W2e), dtype),
            pltpu.VMEM((NB, tile_r, W2e), dtype),
            pltpu.VMEM((H, W2e), dtype),
            pltpu.VMEM((NB, T_ext, W2e), dtype),
            pltpu.VMEM((NB, T_ext, W2e), dtype),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=(3 * 2 * len(jd) * mxu_rows * 256 * 256
                   + 2 * 2 * K * vpu_rows * W2e) * n_tiles,
            bytes_accessed=2 * 4 * Rp * W2e,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def apply_padded(u_pad):
        return call(u_pad, b0s, b0m, b1s, b1m, Chi, Clo)

    def pad(u):
        out = jnp.zeros((R_ext, W2e), dtype)
        return jax.lax.dynamic_update_slice(
            out, u.astype(dtype), (H, 128 + p))

    def unpad(u_pad):
        return u_pad[H : H + N0, 128 + p : 128 + p + N1]

    return apply_padded, pad, unpad, (R_ext, W2e)


def best_padded_laplace(grid: Grid, dtype=jnp.float32, interpret: bool = False,
                        rows: str = None):
    """Auto-select the best 2D/3D kernel (v5e-measured, honest chained
    timing — see bench.timed_chain):

    * 2D: cross-tile-pipelined mxu3p with a degree-dependent tile
      height (tile_r=96 for p=3, 128 for p=5; swept on v5e — the taller
      tile amortizes the K=11 roll loop: 26.5/24.8 vs 25.2/23.6 GDoF/s
      at 1024^2/2048^2 p=5, while p=3 prefers 96: 37.4 vs 37.3) —
      39.1/33.9/29.7 GDoF/s at 1024^2/2048^2/4096^2 p=3
      (vs 31.6/30.9 unpipelined mxu3, 28.9 best pure-VPU,
      ~20-23 for every roll-free MXU-column design — the skinny
      (.,256)@(256,256) dots run at 50-107 Tflop/s, see
      benchmarks/mxu_micro.py).  Issuing tile i-1's matmuls before tile
      i's rolls drains the MXU under the roll loop.
      ACCURACY NOTE: the mxu3p row matmuls are bf16x3 (~1e-6 relative,
      ~10x f32 eps); pass rows="vpu" for the f32-exact pure-VPU kernel.
    * dim == 3: the plane-lanes MXU kernel (laplace3_mxu, pipelined)
      while the plane count fits its dense lane transform; the all-VPU
      kernel otherwise.
    """
    if grid.dim == 3:
        if grid.nodes[0] + 2 * grid.degree <= 512:
            return make_padded_laplace3_mxu(grid, dtype, interpret=interpret,
                                            pipelined=True)
        return make_padded_laplace3(grid, dtype, interpret=interpret)
    if grid.degree <= 3:
        tile_r = 96
    else:
        # p >= 5: the taller tile amortizes the K=2p+1 roll loop, but
        # only if it doesn't inflate the row padding Rp - N0 (at
        # N0 = 1025 a 128 tile wastes 127 rows and LOSES ~6%); pick the
        # least-waste candidate, tie-break taller.
        N0 = grid.nodes[0]
        tile_r = min((96, 128, 160),
                     key=lambda t: ((-(-N0 // t)) * t - N0, -t))
    return make_padded_laplace2(grid, dtype, tile_r=tile_r,
                                rows=rows or "mxu3p", interpret=interpret)


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
