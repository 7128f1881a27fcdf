"""Fused Pallas TPU kernel for the CUT stencil-band apply (2D).

The assembled cut operators (gdm/cut/stencil.StencilOperator: cut mass,
cut stiffness, M + dt*S — the operators the wave/advection time loops
CG-solve every RK stage) have per-node generalized bands
band[node, dy, dx] of radius r = p+1.  The XLA path sweeps K^2 = (2r+1)^2
shifted multiply-adds over separate HLO ops; this kernel fuses the whole
apply into one pass:

* the u tile is read once; each of the K lane shifts dx is ONE shared
  cross-lane roll reused by all K sublane taps dy (roll cost dominates
  VPU cost at ~2.9 us/MDoF/pass, cf. benchmarks/mxu_micro.py);
* the K^2 per-tap coefficient planes are streamed tile-by-tile from HBM
  with double buffering — at 4 B/tap/dof they are the HBM-bound part
  (~(2r+1)^2*4 B/dof vs 8 B/dof for u+y);
* sublane taps are VMEM-addressing slices (free).

Layout mirrors the uncut kernels: (Rp + 2H, W2) with H = roundup(r, 8)
guard rows, data lanes [r, r + N1); closed under the apply, so CG chains
it without re-padding.

Reference counterpart: the Trilinos sparse matvec inside SolverCG
(applications/wave/include/gdm/wave/problem.h:471-502).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _round_up(x, m):
    return (x + m - 1) // m * m


def make_padded_stencil2(st, dtype=jnp.float32, tile_r: int = 64,
                         interpret: bool = False):
    """(apply_padded, pad, unpad, shape) for a 2D StencilOperator."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = st.grid
    assert grid.dim == 2
    r = st.radius
    K = 2 * r + 1
    H = _round_up(r, 8)
    N0, N1 = grid.nodes
    tile_r = min(tile_r, _round_up(N0, 8))
    T_ext = tile_r + 2 * H
    Rp = _round_up(N0, tile_r)
    n_tiles = Rp // tile_r
    W2 = _round_up(N1 + 2 * r, 128)
    R_ext = Rp + 2 * H
    NB = 1 if n_tiles == 1 else 2

    # per-tap coefficient planes (K*K, Rp, W2), tap index t = dx*K + dy:
    # y[i0, i1] += band[i0, i1, dy, dx] * u[i0 + dy - r, i1 + dx - r]
    band = np.asarray(st.band_host).reshape(N0, N1, K, K)
    bt = np.zeros((K * K, Rp, W2), np.float32 if dtype == jnp.float32
                  else np.float64)
    for dx in range(K):
        for dy in range(K):
            bt[dx * K + dy, :N0, r : r + N1] = band[:, :, dy, dx]
    bt = jnp.asarray(bt, dtype)

    def kernel(u_hbm, b_hbm, y_hbm, bufs, btile, ytile, zrows,
               sem_in, sem_b, sem_out, sem_z):
        i = pl.program_id(0)

        def in_copy(t, slot):
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(t * tile_r, 8), T_ext), :],
                bufs.at[slot], sem_in.at[slot])

        def b_copy(t, slot):
            return pltpu.make_async_copy(
                b_hbm.at[:, pl.ds(pl.multiple_of(t * tile_r, 8),
                                  tile_r), :],
                btile.at[slot], sem_b.at[slot])

        def out_copy(t, slot):
            return pltpu.make_async_copy(
                ytile.at[slot],
                y_hbm.at[pl.ds(pl.multiple_of(H + t * tile_r, 8),
                               tile_r), :],
                sem_out.at[slot])

        @pl.when(i == 0)
        def _():
            in_copy(0, 0).start()
            b_copy(0, 0).start()
            if n_tiles > 1:
                in_copy(1, 1).start()
                b_copy(1, 1).start()
            zrows[...] = jnp.zeros((H, W2), dtype)
            for lo in (0, H + Rp):
                pltpu.make_async_copy(
                    zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), H), :],
                    sem_z).start()
                pltpu.make_async_copy(
                    zrows, y_hbm.at[pl.ds(pl.multiple_of(lo, 8), H), :],
                    sem_z).wait()

        @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
        def _():
            in_copy(i + 1, (i + 1) % 2).start()
            b_copy(i + 1, (i + 1) % 2).start()

        slot = i % NB
        in_copy(i, slot).wait()
        b_copy(i, slot).wait()

        uw = bufs[slot]
        acc = jnp.zeros((tile_r, W2), dtype)
        for dx in range(K):
            shift = (r - dx) % W2
            ur = uw if shift == 0 else pltpu.roll(uw, shift, axis=1)
            for dy in range(K):
                off = H - r + dy
                acc = acc + (btile[slot, dx * K + dy]
                             * ur[off : off + tile_r, :])

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
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NB, T_ext, W2), dtype),
            pltpu.VMEM((NB, K * K, tile_r, W2), dtype),
            pltpu.VMEM((NB, tile_r, W2), dtype),
            pltpu.VMEM((H, W2), dtype),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * K * K * Rp * W2,
            bytes_accessed=(K * K + 2) * 4 * Rp * W2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def apply_padded(u_pad):
        return call(u_pad, bt)

    def pad(u):
        out = jnp.zeros((R_ext, W2), dtype)
        return jax.lax.dynamic_update_slice(
            out, u.reshape(N0, N1).astype(dtype), (H, r))

    def unpad(u_pad):
        return u_pad[H : H + N0, r : r + N1]

    return apply_padded, pad, unpad, (R_ext, W2)


def stencil_apply_fn(st, dtype=jnp.float32, force: bool = False):
    """Flat-vector apply riding the fused kernel on TPU, or None when
    Pallas TPU is unavailable (callers fall back to st.apply).  This IS
    the solver inner-loop path on hardware (gdm.cut.stencil.
    best_solver_apply), so the kernel the bench reports is the kernel
    the apps run."""
    try:
        if not force and jax.devices()[0].platform not in ("tpu", "axon"):
            return None
        if st.grid.dim != 2:
            return None
        apply_padded, pad, unpad, _ = make_padded_stencil2(
            st, dtype, interpret=force)
    except Exception:
        if force:
            raise
        return None

    def apply(u_flat):
        return unpad(apply_padded(pad(u_flat))).reshape(-1)

    return apply
