"""Microbenchmarks for the stencil-kernel design space on the attached
TPU: (a) MXU matmul throughput by precision/dtype, (b) the cross-lane
ROLL throughput ceiling that bounds every roll-based column stage.

(b) is the auditable ceiling for the 2D matvec kernels: the column stage
of the vpu/mxu3/mxu3p kernels does K = 2p+1 cross-lane rolls + 2K slice
FMAs per tile.  Three stripped kernels over the exact same padded
layout, tiling, and DMA schedule isolate the costs:

  * stage1_full:  K rolls + 2K FMAs (the real column stage), y = V + W
  * stage1_norolls: same FMAs, rolls elided (shift 0)  -> FMA-only cost
  * rolls_only:   K rolls + K adds, no coefficient FMAs -> roll cost

roll cost/pass = (t_full - t_norolls) / K; the ceiling for ANY kernel
that keeps the K-roll column stage is t(stage1_full) + t(row stage),
since V and W must both be formed.  Compare with the full mxu3p kernel
to see how close the shipped kernel sits to that ceiling, and with the
roll-free mxucol kernel (column stage on the MXU) that replaces it.

Run with the environment UNTOUCHED (real TPU), one job at a time:
    python benchmarks/mxu_micro.py [quick]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_matmul(m, k, n, dtype, precision, iters=50):
    a = jnp.asarray(np.random.rand(m, k), dtype)
    b = jnp.asarray(np.random.rand(k, n), dtype)

    @jax.jit
    def loop(a, b, it):
        # carry a through the loop (scaled output slice re-enters the
        # first operand) so XLA cannot hoist the matmul
        def body(i, a):
            y = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=dtype,
            )
            w = min(k, n)
            return a.at[:, :w].add(
                y[:, :w].astype(dtype) * jnp.asarray(1e-12, dtype))
        return jax.lax.fori_loop(0, it, body, a)

    loop(a, b, 2).block_until_ready()
    t0 = time.time()
    loop(a, b, iters).block_until_ready()
    dt = (time.time() - t0) / iters
    return 2 * m * k * n / dt / 1e12


def make_stage1_micro(grid, mode, dtype=jnp.float32, tile_r=256,
                      interpret=False):
    """Stripped column-stage kernel over the mxu3p padded layout.

    mode: "full" (K rolls + 2K FMAs), "norolls" (2K FMAs, shift elided),
    "rollsonly" (K rolls + K adds), "rowsonly" (the mxu3p ROW stage
    stripped of the column stage: bf16 hi/lo splits of the stage-1
    outputs + the 3 bf16 dot passes per tile, column rolls/FMAs elided
    — measures the non-column floor of the composition).  Output
    written once per tile; same double-buffered DMA schedule as the
    real kernels, so the difference between modes is pure compute.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gdm.ops.pallas_stencil2 import _round_up
    from gdm.ops1d import mass_1d, stiffness_1d

    p = grid.degree
    H = _round_up(p, 8)
    N0, N1 = grid.nodes
    tile_r = min(tile_r, _round_up(N0, 8))
    T_ext = tile_r + 2 * H
    Rp = _round_up(N0, tile_r)
    n_tiles = Rp // tile_r
    W2 = _round_up(N1 + 2 * p, 128)
    K = 2 * p + 1
    R_ext = Rp + 2 * H
    NB = 1 if n_tiles == 1 else 2

    if mode in ("rowsonly", "dotsonly", "splitsonly"):
        # stand-in row tables at the real kernel's exact shapes/dtype
        rng = np.random.default_rng(0)
        bf = rng.standard_normal((n_tiles * tile_r, 2 * T_ext))
        b1s = jnp.asarray(bf, jnp.bfloat16)                     # hi
        b1m = jnp.asarray(
            bf - np.asarray(b1s, np.float32), jnp.bfloat16)     # lo
    else:
        b1s = np.zeros((K, W2))
        b1m = np.zeros((K, W2))
        band1s = stiffness_1d(p, grid.cells[1], grid.h[1]).band
        band1m = mass_1d(p, grid.cells[1], grid.h[1]).band
        for l in range(K):
            b1s[l, p : p + N1] = band1s[:, l]
            b1m[l, p : p + N1] = band1m[:, l]
        b1s = jnp.asarray(b1s, dtype)
        b1m = jnp.asarray(b1m, dtype)

    def kernel(u_hbm, b1s_ref, b1m_ref, y_hbm, bufs, ytile,
               sem_in, sem_out):
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

        @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
        def _():
            in_copy(i + 1, (i + 1) % 2).start()

        slot = i % NB
        in_copy(i, slot).wait()

        if mode in ("rowsonly", "dotsonly", "splitsonly"):
            # bf16x3 row stage on stand-ins for the stage-1 outputs
            # (V = W = the input tile): hi/lo splits + 3 MXU passes,
            # exactly kernel_mxu3p's row arithmetic per tile.
            # "dotsonly" elides the lo split (one convert + 3 dots);
            # "splitsonly" elides the dots (pure VPU split cost).
            uf = bufs[slot]                                # (T_ext, W2)
            hi = uf.astype(jnp.bfloat16)
            if mode == "dotsonly":
                lo = hi
            else:
                lo = (uf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            cat_hi = jnp.concatenate([hi, hi], axis=0)
            cat_lo = jnp.concatenate([lo, lo], axis=0)
            if mode == "splitsonly":
                acc = (cat_hi[0:tile_r, :].astype(jnp.float32)
                       + cat_lo[0:tile_r, :].astype(jnp.float32))
            else:
                bh = b1s_ref[...]
                bl = b1m_ref[...]
                acc = jax.lax.dot(bh, cat_hi,
                                  preferred_element_type=jnp.float32)
                acc = acc + jax.lax.dot(bh, cat_lo,
                                        preferred_element_type=jnp.float32)
                acc = acc + jax.lax.dot(bl, cat_hi,
                                        preferred_element_type=jnp.float32)
            acc = acc.astype(dtype)
        else:
            uw = bufs[slot, H : H + tile_r, :]
            acc = jnp.zeros((tile_r, W2), dtype)
            for l in range(K):
                shift = (p - l) % W2
                if mode == "norolls" or shift == 0:
                    r = uw
                else:
                    r = pltpu.roll(uw, shift, axis=1)
                if mode == "rollsonly":
                    acc = acc + r
                else:
                    acc = acc + b1m_ref[l : l + 1, :] * r
                    acc = acc + b1s_ref[l : l + 1, :] * r

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
        ] + ([pl.BlockSpec((tile_r, 2 * T_ext), lambda i: (i, 0)),
              pl.BlockSpec((tile_r, 2 * T_ext), lambda i: (i, 0))]
             if mode in ("rowsonly", "dotsonly", "splitsonly") else
             [pl.BlockSpec((K, W2), lambda i: (0, 0)),
              pl.BlockSpec((K, W2), lambda i: (0, 0))]),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NB, T_ext, W2), dtype),
            pltpu.VMEM((NB, tile_r, W2), dtype),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def apply_padded(u_pad):
        return call(u_pad, b1s, b1m)

    return apply_padded, (R_ext, W2)


def roll_ceiling(n=1024, p=3, tile_r=256):
    """Measure the roll/FMA decomposition of the column stage and the
    full-kernel rates it bounds.  Returns a dict of microseconds per
    MDoF (and GDoF/s for the full kernels)."""
    from gdm.grid import Grid
    from gdm.ops.pallas_stencil2 import (
        make_padded_laplace2, make_padded_laplace2_mxucol)
    from bench import timed_chain

    grid = Grid(p, (n, n), (0.0, 0.0), (1.0, 1.0))
    ndof = grid.n_nodes
    K = 2 * p + 1
    out = {"n": n, "p": p, "K": K}

    for mode in ("full", "norolls", "rollsonly",
                 "rowsonly", "dotsonly", "splitsonly"):
        ap, shape = make_stage1_micro(grid, mode, tile_r=tile_r)
        u = jnp.ones(shape, jnp.float32)
        dt = timed_chain(lambda v: ap(v) * 1e-3, u)
        out[f"stage1_{mode}_us_per_mdof"] = dt / ndof * 1e12

    out["roll_us_per_pass_per_mdof"] = (
        out["stage1_full_us_per_mdof"]
        - out["stage1_norolls_us_per_mdof"]) / K
    # FMA passes in "norolls": 2K fused multiply-adds
    out["fma_us_per_pass_per_mdof"] = (
        out["stage1_norolls_us_per_mdof"] / (2 * K))

    for name, factory in (
            ("mxu3p", lambda g: make_padded_laplace2(
                g, jnp.float32, tile_r=64, rows="mxu3p")),
            ("mxucol", lambda g: make_padded_laplace2_mxucol(
                g, jnp.float32))):
        ap, pad, unpad, shape = factory(grid)
        u = pad(jnp.ones(grid.nodes, jnp.float32))
        dt = timed_chain(lambda v: ap(v) * 1e-3, u)
        out[f"{name}_gdof_per_s"] = ndof / dt / 1e9
        out[f"{name}_us_per_mdof"] = dt / ndof * 1e12
    return out


def relayout_cost(rows=512, lanes=128, dtype=jnp.float32, steps=4096,
                  interpret=False):
    """Pure-VMEM lane<->sublane transpose throughput at the 3D kernel's
    working shapes — the cost driver of the second-MXU-axis 3D design
    (BASELINE.md '3D (beyond-reference scope)'): running the axis-1
    coupling on the MXU needs i1 moved from sublanes to lanes, i.e. a
    full relayout of both stage-1 outputs (A, B) and both stage-2
    outputs (P, T) back.  Measures jnp.transpose of a (rows, lanes)
    VMEM-resident tile inside a Pallas kernel (no DMA in the loop), in
    microseconds per million transposed elements — directly comparable
    to roll_ceiling's per-pass FMA/roll costs."""
    import time

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, y_hbm, xs, ys, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            pltpu.make_async_copy(x_hbm, xs, sem).wait()

        # step-dependent scale defeats any cross-step reuse
        scale = (1.0 + i.astype(jnp.float32) * 1e-12).astype(dtype)
        ys[...] = (xs[...] * scale).T

        @pl.when(i == steps - 1)
        def _():
            pltpu.make_async_copy(ys, y_hbm, sem).wait()

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((lanes, rows), dtype),
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((rows, lanes), dtype),
            pltpu.VMEM((lanes, rows), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )
    x = jnp.asarray(np.random.rand(rows, lanes), dtype)
    f = jax.jit(call)
    f(x).block_until_ready()
    t0 = time.time()
    f(x).block_until_ready()
    dt = (time.time() - t0) / steps
    return dt / (rows * lanes) * 1e12  # us per M elements


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    quick = "quick" in sys.argv[1:]
    if not quick:
        M = K = N = 4096
        for dtype, precisions in (
            (jnp.bfloat16, ["DEFAULT"]),
            (jnp.float32, ["DEFAULT", "HIGH", "HIGHEST"]),
        ):
            for pname in precisions:
                prec = getattr(jax.lax.Precision, pname)
                tf = bench_matmul(M, K, N, dtype, prec)
                print(f"{dtype.__name__:9s} {pname:8s} {tf:7.1f} Tflop/s")
        # skinny shapes like the stencil kernels use
        for (m, k, n) in ((256, 144, 2176), (2176, 144, 128),
                          (272, 256, 256)):
            tf = bench_matmul(m, k, n, jnp.bfloat16,
                              jax.lax.Precision.DEFAULT, iters=200)
            print(f"bf16 DEFAULT ({m}x{k}x{n}): {tf:7.2f} Tflop/s")
    for n, p in ((1024, 3), (2048, 3), (1024, 5)):
        r = roll_ceiling(n=n, p=p)
        print(f"--- {n}^2 p={p} (K={r['K']}) ---")
        for k in ("stage1_full_us_per_mdof", "stage1_norolls_us_per_mdof",
                  "stage1_rollsonly_us_per_mdof",
                  "stage1_rowsonly_us_per_mdof",
                  "stage1_dotsonly_us_per_mdof",
                  "stage1_splitsonly_us_per_mdof",
                  "roll_us_per_pass_per_mdof", "fma_us_per_pass_per_mdof",
                  "mxu3p_us_per_mdof", "mxu3p_gdof_per_s",
                  "mxucol_us_per_mdof", "mxucol_gdof_per_s"):
            print(f"  {k:32s} {r[k]:9.3f}")
