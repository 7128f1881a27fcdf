"""Fused Pallas TPU kernel for the 2D GD Laplace matvec.

The separable XLA path sweeps the grid ~6 HBM passes per matvec; this
kernel reads every u tile ONCE into VMEM (with an 8-row halo via aligned
sliver DMAs), applies both Kronecker terms in VMEM (two row sweeps + two
roll-based column sweeps, 4*(2p+1) fused multiply-adds per element on the
VPU), and writes y once — the HBM-roofline (2-pass) formulation.

Boundary rows/columns carry per-row band coefficients (one-sided GD
stencils), passed as (N, 2p+1) tables; coefficients are zero on the
padding rows/columns, so the padded layout is closed under the apply and
CG can run entirely in it.

TPU alignment rules honored: DMA slices are multiples of (8, 128); the
lane halo is folded into roll-based shifted reads instead of unaligned
slices.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..grid import Grid
from ..ops1d import mass_1d, stiffness_1d


def _round_up(x, m):
    return (x + m - 1) // m * m


def make_padded_laplace(grid: Grid, dtype=jnp.float32, tile_r: int = 128,
                        interpret: bool = False):
    """Returns (apply_padded, pad, unpad, padded_shape).

    Padded layout: (Rp, W2) with the node data at rows [0, N0), columns
    [p, p + N1); Rp = round_up(N0, tile_r), W2 = round_up(N1 + 2p, 128).
    apply_padded maps this layout to itself (zero outside the data block).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert grid.dim == 2
    p = grid.degree
    H = 8  # row halo (>= p, multiple of 8 for aligned sliver DMAs)
    assert p <= H
    N0, N1 = grid.nodes
    Rp = _round_up(N0, tile_r)
    W2 = _round_up(N1 + 2 * p, 128)
    n_tiles = Rp // tile_r

    # row band tables (zero on padding rows)
    b0s = np.zeros((Rp, 2 * p + 1))
    b0m = np.zeros((Rp, 2 * p + 1))
    b0s[:N0] = stiffness_1d(p, grid.cells[0], grid.h[0]).band
    b0m[:N0] = mass_1d(p, grid.cells[0], grid.h[0]).band
    # column roll tables: b1*[l, j] = band1[j - p, l] on the data columns
    b1s = np.zeros((2 * p + 1, W2))
    b1m = np.zeros((2 * p + 1, W2))
    band1s = stiffness_1d(p, grid.cells[1], grid.h[1]).band
    band1m = mass_1d(p, grid.cells[1], grid.h[1]).band
    for l in range(2 * p + 1):
        b1s[l, p : p + N1] = band1s[:, l]
        b1m[l, p : p + N1] = band1m[:, l]
    b0s = jnp.asarray(b0s, dtype)
    b0m = jnp.asarray(b0m, dtype)
    b1s = jnp.asarray(b1s, dtype)
    b1m = jnp.asarray(b1m, dtype)

    # dense per-tile row-sweep matrices for the MXU path: rows [ts; tm]
    # of shape (2*tile, tile + 2H): ts_tm = B_i @ uw
    Bmx = np.zeros((n_tiles, 2 * tile_r, tile_r + 2 * H))
    b0s_np = np.asarray(b0s)
    b0m_np = np.asarray(b0m)
    for i in range(n_tiles):
        for r in range(tile_r):
            for k in range(2 * p + 1):
                Bmx[i, r, H - p + k + r] = b0s_np[i * tile_r + r, k]
                Bmx[i, tile_r + r, H - p + k + r] = b0m_np[i * tile_r + r, k]
    Bmx = jnp.asarray(Bmx.reshape(n_tiles * 2 * tile_r, tile_r + 2 * H), dtype)

    def kernel(u_hbm, Bmx_ref, b1s_ref, b1m_ref, y_ref, uw,
               sem_main, sem_top, sem_bot):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        main = pltpu.make_async_copy(
            u_hbm.at[pl.ds(pl.multiple_of(i * tile_r, 8), tile_r), :],
            uw.at[pl.ds(H, tile_r), :],
            sem_main,
        )
        main.start()

        @pl.when(i > 0)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(i * tile_r - H, 8), H), :],
                uw.at[pl.ds(0, H), :],
                sem_top,
            ).start()

        @pl.when(i == 0)
        def _():
            uw[0:H, :] = jnp.zeros((H, W2), dtype)

        @pl.when(i < n - 1)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of((i + 1) * tile_r, 8), H), :],
                uw.at[pl.ds(H + tile_r, H), :],
                sem_bot,
            ).start()

        @pl.when(i == n - 1)
        def _():
            uw[H + tile_r : 2 * H + tile_r, :] = jnp.zeros((H, W2), dtype)

        main.wait()

        @pl.when(i > 0)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(i * tile_r - H, 8), H), :],
                uw.at[pl.ds(0, H), :],
                sem_top,
            ).wait()

        @pl.when(i < n - 1)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of((i + 1) * tile_r, 8), H), :],
                uw.at[pl.ds(H + tile_r, H), :],
                sem_bot,
            ).wait()

        # row sweeps on the MXU: [ts; tm] = B_i @ uw
        ts_tm = jax.lax.dot_general(
            Bmx_ref[:], uw[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        ts = ts_tm[:tile_r]
        tm = ts_tm[tile_r:]
        # column sweeps via cyclic rolls (coefficients vanish on pads, so
        # wrap-around never contributes)
        acc = jnp.zeros((tile_r, W2), dtype)
        for l in range(2 * p + 1):
            shift = (p - l) % W2  # cyclic; pads have zero coefficients
            acc = acc + b1m_ref[l : l + 1, :] * pltpu.roll(ts, shift, axis=1)
            acc = acc + b1s_ref[l : l + 1, :] * pltpu.roll(tm, shift, axis=1)
        y_ref[:] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, W2), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((2 * tile_r, tile_r + 2 * H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * p + 1, W2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * p + 1, W2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, W2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_r + 2 * H, W2), dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * (2 * p + 1) * Rp * W2,
            bytes_accessed=2 * 4 * Rp * W2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def apply_padded(u_pad):
        return call(u_pad, Bmx, b1s, b1m)

    def pad(u):
        out = jnp.zeros((Rp, W2), dtype)
        return jax.lax.dynamic_update_slice(out, u.astype(dtype), (0, p))

    def unpad(u_pad):
        return u_pad[:N0, p : p + N1]

    return apply_padded, pad, unpad, (Rp, W2)


def laplace_2d_pallas_fn(grid: Grid, dtype=jnp.float32):
    """(N0, N1) -> (N0, N1) apply built on the padded kernel, or None if
    Pallas TPU is unavailable."""
    try:
        import jax

        if jax.devices()[0].platform not in ("tpu", "axon"):
            return None
        apply_padded, pad, unpad, _ = make_padded_laplace(grid, dtype)
    except Exception:
        return None

    def apply(u):
        return unpad(apply_padded(pad(u)))

    return apply
