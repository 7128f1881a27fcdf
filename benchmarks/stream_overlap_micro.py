"""Can tile DMAs overlap compute in the 2D stencil kernels on this chip?

The round-4 bench shows the mxu3p matvec losing ~25% from 1024^2 (state
VMEM-resident) to 4096^2 (honest HBM streaming), and the delta equals
almost exactly the un-overlapped 8 B/dof u+y round trip — despite the
kernel double-buffering both directions.  This micro isolates the
question from the kernel's complexity with three variants of identical
grid/loop structure (tile_r x W2 f32 tiles, K=7 roll+FMA compute per
tile ~ the p=3 column stage):

  compute : no HBM traffic — fixed VMEM input, VMEM output
  dma     : HBM traffic only — double-buffered in/out copies, no compute
  both    : double-buffered copies + compute (the kernel's structure)

If t(both) ~ max(t(dma), t(compute)): the hardware overlaps fine and the
production kernel's exposure is a structural bug worth fixing.  If
t(both) ~ t(dma) + t(compute): the DMA cannot hide under VPU work on
v5e at this shape, and the 4096^2 falloff is a hardware bound (record it
in BASELINE.md and stop chasing it).

Run on the real chip:  python benchmarks/stream_overlap_micro.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_micro(mode, N0=4096, N1=4096, tile_r=96, K=7, interpret=False,
               nb=2, nsplit=1):
    """mode: compute | dma | both | dma_in | dma_out.

    nsplit > 1 splits every tile copy into nsplit row-chunk copies with
    separate semaphores — a probe for per-DMA-stream bandwidth limits
    (measured on v5e: ONE in-flight copy per direction moves ~183 GB/s,
    far below the ~800 GB/s XLA reaches with its own parallel copies;
    see main())."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = 8
    p = (K - 1) // 2
    W2 = -(-(N1 + 2 * p) // 128) * 128
    Rp = -(-N0 // tile_r) * tile_r
    n_tiles = Rp // tile_r
    R_ext = Rp + 2 * H
    T_ext = tile_r + 2 * H
    dtype = jnp.float32

    coef = jnp.asarray(np.random.default_rng(0).standard_normal((K, W2)),
                       dtype)

    def compute_tile(uw, coef_ref):
        acc = jnp.zeros((tile_r, W2), dtype)
        V = jnp.zeros((T_ext, W2), dtype)
        for l in range(K):
            shift = (p - l) % W2
            r = uw if shift == 0 else pltpu.roll(uw, shift, axis=1)
            V = V + coef_ref[l : l + 1, :] * r
        for k in range(K):
            off = H - p + k
            acc = acc + coef_ref[k % K : k % K + 1, :1] \
                * V[off : off + tile_r, :]
        return acc

    do_in = mode in ("dma", "both", "dma_in")
    do_out = mode in ("dma", "both", "dma_out")

    def chunks(total, n):
        # n chunks, 8-aligned boundaries (DMA row offsets must stay
        # 8-aligned), last chunk absorbs the remainder
        c = max(8, (total // n) // 8 * 8)
        sizes = [c] * (n - 1)
        sizes.append(total - c * (n - 1))
        assert sizes[-1] > 0 and sizes[-1] % 8 == 0, (total, n)
        return sizes

    ci_sizes, co_sizes = chunks(T_ext, nsplit), chunks(tile_r, nsplit)

    def kernel(u_hbm, coef_ref, y_hbm, bufs, ytile, sem_in, sem_out):
        i = pl.program_id(0)

        class _Chunked:
            """start()/wait() over nsplit row-chunk copies."""

            def __init__(self, copies):
                self.copies = copies

            def start(self):
                for c in self.copies:
                    c.start()

            def wait(self):
                for c in self.copies:
                    c.wait()

        def in_copy(t, slot):
            r0 = pl.multiple_of(t * tile_r, 8)
            cs, off = [], 0
            for k, c in enumerate(ci_sizes):
                cs.append(pltpu.make_async_copy(
                    u_hbm.at[pl.ds(r0 + off, c), :],
                    bufs.at[slot, pl.ds(off, c), :],
                    sem_in.at[slot, k]))
                off += c
            return _Chunked(cs)

        def out_copy(t, slot):
            r0 = pl.multiple_of(H + t * tile_r, 8)
            cs, off = [], 0
            for k, c in enumerate(co_sizes):
                cs.append(pltpu.make_async_copy(
                    ytile.at[slot, pl.ds(off, c), :],
                    y_hbm.at[pl.ds(r0 + off, c), :],
                    sem_out.at[slot, k]))
                off += c
            return _Chunked(cs)

        slot = i % nb
        lookahead = nb - 1
        if do_in:
            @pl.when(i == 0)
            def _():
                for t in range(min(lookahead + 1, n_tiles)):
                    in_copy(t, t % nb).start()

            @pl.when(jnp.logical_and(i > 0, i + lookahead < n_tiles))
            def _():
                in_copy(i + lookahead, (i + lookahead) % nb).start()

            in_copy(i, slot).wait()

        if mode in ("compute", "both"):
            acc = compute_tile(bufs[slot], coef_ref)
        else:
            acc = jnp.zeros((tile_r, W2), dtype) + bufs[slot, :tile_r, :1]

        if do_out:
            @pl.when(i >= nb)
            def _():
                out_copy(i - nb, slot).wait()

            ytile[slot] = acc
            out_copy(i, slot).start()

            @pl.when(i == n_tiles - 1)
            def _():
                for t in range(min(nb, n_tiles)):
                    out_copy(i - t, (i - t) % nb).wait()
        else:
            ytile[slot] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_ext, W2), dtype),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((K, W2), lambda i: (0, 0))],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nb, T_ext, W2), dtype),
            pltpu.VMEM((nb, tile_r, W2), dtype),
            pltpu.SemaphoreType.DMA((nb, nsplit)),
            pltpu.SemaphoreType.DMA((nb, nsplit)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    n_dof = N0 * N1

    def apply_fn(u_pad):
        return call(u_pad, coef)

    return apply_fn, (R_ext, W2), n_dof


def make_auto_micro(mode, N0=4096, N1=4096, tile_r=96, K=7,
                    interpret=False):
    """Same traffic through Pallas's AUTOMATIC BlockSpec grid pipeline
    (disjoint tile_r-row blocks, no halo): mode 'dma' = pure copy,
    'both' = copy + the K-roll compute.  If this beats the manual
    make_async_copy schedule, the production kernels should stream via
    BlockSpec blocks (halo rows via a separate pre-extracted input)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = (K - 1) // 2
    W2 = -(-(N1 + 2 * p) // 128) * 128
    Rp = -(-N0 // tile_r) * tile_r
    n_tiles = Rp // tile_r
    dtype = jnp.float32
    coef = jnp.asarray(np.random.default_rng(0).standard_normal((K, W2)),
                       dtype)

    def kernel(u_ref, coef_ref, y_ref):
        if mode == "both":
            acc = jnp.zeros((tile_r, W2), dtype)
            uw = u_ref[...]
            V = jnp.zeros((tile_r, W2), dtype)
            for l in range(K):
                shift = (p - l) % W2
                r = uw if shift == 0 else pltpu.roll(uw, shift, axis=1)
                V = V + coef_ref[l : l + 1, :] * r
            for k in range(K):
                acc = acc + coef_ref[k % K : k % K + 1, :1] * V
            y_ref[...] = acc
        else:
            y_ref[...] = u_ref[...] * 1.0000001

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, W2), dtype),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_r, W2), lambda i: (i, 0)),
                  pl.BlockSpec((K, W2), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((tile_r, W2), lambda i: (i, 0)),
        interpret=interpret,
    )

    return (lambda u_pad: call(u_pad, coef)), (Rp, W2), N0 * N1


def make_sepbuf_micro(mode, N0=4096, N1=4096, tile_r=96, K=7,
                      interpret=False):
    """dma_in / dma variants where the two slots use SEPARATE VMEM
    scratch buffers and literal slot indices (static parity branches) —
    the probe for whether Mosaic serializes all copies of one
    (src, dst) buffer pair onto a single DMA queue."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = 8
    p = (K - 1) // 2
    W2 = -(-(N1 + 2 * p) // 128) * 128
    Rp = -(-N0 // tile_r) * tile_r
    n_tiles = Rp // tile_r
    R_ext = Rp + 2 * H
    T_ext = tile_r + 2 * H
    dtype = jnp.float32
    do_out = mode == "dma"

    def kernel(u_hbm, y_hbm, b0, b1, y0, y1, sem_in, sem_out):
        i = pl.program_id(0)

        def in_copy(t, buf, k):
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(t * tile_r, 8), T_ext), :],
                buf, sem_in.at[k])

        def out_copy(t, ybuf, k):
            return pltpu.make_async_copy(
                ybuf,
                y_hbm.at[pl.ds(pl.multiple_of(H + t * tile_r, 8),
                               tile_r), :], sem_out.at[k])

        @pl.when(i == 0)
        def _():
            in_copy(0, b0, 0).start()
            if n_tiles > 1:
                in_copy(1, b1, 1).start()

        def body(buf, ybuf, k):
            @pl.when(jnp.logical_and(i > 0, i + 1 < n_tiles))
            def _():
                in_copy(i + 1, b1 if k == 0 else b0, 1 - k).start()

            in_copy(i, buf, k).wait()
            if do_out:
                @pl.when(i >= 2)
                def _():
                    out_copy(i - 2, ybuf, k).wait()

                ybuf[...] = jnp.zeros((tile_r, W2), dtype) + buf[0, :1]
                out_copy(i, ybuf, k).start()

                @pl.when(i == n_tiles - 1)
                def _():
                    out_copy(i, ybuf, k).wait()

                    @pl.when(i >= 1)
                    def _():
                        out_copy(i - 1, y1 if k == 0 else y0,
                                 1 - k).wait()

        @pl.when(i % 2 == 0)
        def _():
            body(b0, y0, 0)

        @pl.when(i % 2 == 1)
        def _():
            body(b1, y1, 1)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_ext, W2), dtype),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((T_ext, W2), dtype),
            pltpu.VMEM((T_ext, W2), dtype),
            pltpu.VMEM((tile_r, W2), dtype),
            pltpu.VMEM((tile_r, W2), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    return (lambda u_pad: call(u_pad)), (R_ext, W2), N0 * N1


def main():
    import jax
    import jax.numpy as jnp

    from bench import timed_chain

    interpret = "--interpret" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        # ad-hoc shape sweep:  N0 N1 tile_r nb nsplit [modes...]
        N0, N1, tile_r, nb, nsplit = (int(args[0]), int(args[1]),
                                      int(args[2]), int(args[3]),
                                      int(args[4]))
        modes = args[5:] or ["compute", "dma", "both"]
        cases = [(N0, N1, tile_r, nb, nsplit, modes)]
    else:
        cases = [(1024, 1024, 96, 2, 1, ["compute", "dma", "both"]),
                 (4096, 4096, 96, 2, 1, ["compute", "dma", "both"])]
    for N0, N1, tile_r, nb, nsplit, modes in cases:
        us_per_mdof = {}
        for mode in modes:
            if mode.startswith("auto_"):
                apply_fn, shape, n_dof = make_auto_micro(
                    mode[5:], N0=N0, N1=N1, tile_r=tile_r,
                    interpret=interpret)
            elif mode.startswith("sep_"):
                apply_fn, shape, n_dof = make_sepbuf_micro(
                    mode[4:], N0=N0, N1=N1, tile_r=tile_r,
                    interpret=interpret)
            else:
                apply_fn, shape, n_dof = make_micro(mode, N0=N0, N1=N1,
                                                    tile_r=tile_r, nb=nb,
                                                    nsplit=nsplit,
                                                    interpret=interpret)
            u = jnp.zeros(shape, jnp.float32) + 1.0
            if interpret:
                np.asarray(apply_fn(u))
                continue
            dt = timed_chain(lambda v: apply_fn(v) * (1.0 - 1e-6), u)
            us_per_mdof[mode] = dt / n_dof * 1e12
            print(f"N0={N0} N1={N1} tile_r={tile_r} nb={nb} "
                  f"nsplit={nsplit} mode={mode}: "
                  f"{dt*1e6:.1f} us/apply, "
                  f"{us_per_mdof[mode]:.2f} us/MDoF", flush=True)
        if not interpret and set(us_per_mdof) == {"compute", "dma", "both"}:
            both = us_per_mdof["both"]
            lo = max(us_per_mdof["compute"], us_per_mdof["dma"])
            hi = us_per_mdof["compute"] + us_per_mdof["dma"]
            overlap = (hi - both) / max(hi - lo, 1e-12)
            print(f"N0={N0}: overlap fraction = {overlap:.2f} "
                  f"(1 = perfect, 0 = fully serialized)", flush=True)


if __name__ == "__main__":
    main()
