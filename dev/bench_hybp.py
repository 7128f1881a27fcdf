"""TPU sweep: hybp (row-split pipelined hybrid) vs mxu3p."""
import sys
import jax.numpy as jnp

from gdm.grid import Grid
from gdm.ops.pallas_stencil2 import (
    make_padded_laplace2, make_padded_laplace2_hybp)
from bench import timed_chain

cases = [(1024, 3), (2048, 3), (1024, 5)]

for n, p in cases:
    grid = Grid(p, (n, n), (0.0, 0.0), (1.0, 1.0))
    ap, pad, unpad, _ = make_padded_laplace2(grid, jnp.float32,
                                             tile_r=64, rows="mxu3p")
    u = pad(jnp.ones(grid.nodes, jnp.float32))
    dt = timed_chain(lambda v: ap(v) * 1e-3, u)
    print(f"{n}^2 p={p} mxu3p(64): {grid.n_nodes/dt/1e9:7.2f} GDoF/s",
          flush=True)
    for tr, vr in ((256, None), (256, 144), (256, 192), (256, 216),
                   (128, 96), (512, 352)):
        try:
            ap, pad, unpad, _ = make_padded_laplace2_hybp(
                grid, jnp.float32, tile_r=tr, vpu_rows=vr)
            u = pad(jnp.ones(grid.nodes, jnp.float32))
            dt = timed_chain(lambda v: ap(v) * 1e-3, u)
            print(f"{n}^2 p={p} hybp(tr={tr},vr={vr}): "
                  f"{grid.n_nodes/dt/1e9:7.2f} GDoF/s", flush=True)
        except Exception as e:
            print(f"{n}^2 p={p} hybp(tr={tr},vr={vr}): FAILED "
                  f"{type(e).__name__}: {str(e)[:150]}", flush=True)
