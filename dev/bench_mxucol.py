"""TPU A/B: mxucol (roll-free column stage) vs mxu3p at several sizes.
Run with plain python (real TPU), one job at a time."""
import sys
import jax.numpy as jnp

from gdm.grid import Grid
from gdm.ops.pallas_stencil2 import (
    make_padded_laplace2, make_padded_laplace2_mxucol)
from bench import timed_chain

cases = [(1024, 3), (2048, 3), (1024, 5)]
tiles = [int(t) for t in sys.argv[1:]] or [128, 256, 512]

for n, p in cases:
    grid = Grid(p, (n, n), (0.0, 0.0), (1.0, 1.0))
    ap, pad, unpad, _ = make_padded_laplace2(grid, jnp.float32,
                                             tile_r=64, rows="mxu3p")
    u = pad(jnp.ones(grid.nodes, jnp.float32))
    dt = timed_chain(lambda v: ap(v) * 1e-3, u)
    print(f"{n}^2 p={p} mxu3p(64): {grid.n_nodes/dt/1e9:7.2f} GDoF/s",
          flush=True)
    for tr in tiles:
        try:
            ap, pad, unpad, _ = make_padded_laplace2_mxucol(
                grid, jnp.float32, tile_r=tr)
            u = pad(jnp.ones(grid.nodes, jnp.float32))
            dt = timed_chain(lambda v: ap(v) * 1e-3, u)
            print(f"{n}^2 p={p} mxucol({tr}): {grid.n_nodes/dt/1e9:7.2f}"
                  " GDoF/s", flush=True)
        except Exception as e:
            print(f"{n}^2 p={p} mxucol({tr}): FAILED {type(e).__name__}:"
                  f" {str(e)[:200]}", flush=True)
