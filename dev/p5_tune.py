"""p=5 2D kernel headroom harvest (round-4 item 3).

Measures on the real chip (plain python):
  1. the bare bf16 row-dot cost at the exact mxu3p shapes per tile_r
     candidate — is the p=5 pipeline MXU-bound or VPU-bound?
  2. the full p=5 1024^2 matvec for tile_r in {96, 112, 128, 160}
     with the register-resident bf16 split (this round's change).
Prints one JSON line per measurement.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import timed_chain
from benchmarks.mxu_micro import bench_matmul
from gdm.grid import Grid
from gdm.ops.pallas_stencil2 import make_padded_laplace2


def main():
    n, p = 1024, 5
    grid = Grid(p, (n, n), (0.0, 0.0), (1.0, 1.0))
    N0 = grid.nodes[0]
    W2 = (N0 + 2 * p + 127) // 128 * 128
    H = 8
    dof = float(grid.n_dofs)

    # 0. column stage alone per tile height (halo redundancy scales as
    # (tile_r + 2H) / tile_r)
    from benchmarks.mxu_micro import make_stage1_micro

    for tile_r in (96, 128, 192, 256):
        ap, shape = make_stage1_micro(grid, "full", tile_r=tile_r)
        u = jnp.ones(shape, jnp.float32)
        dt = timed_chain(lambda v: ap(v) * 1e-3, u)
        print(json.dumps({
            "what": "p5_stage1_full", "tile_r": tile_r,
            "us_per_mdof": dt / dof * 1e6 * 1e6}), flush=True)

    # 1. bare row-dot cost: 3 passes of (tile_r, 2*T_ext) @ (2*T_ext, W2)
    for tile_r in (96, 112, 128, 160, 192, 256):
        T_ext = tile_r + 2 * H
        tf = bench_matmul(tile_r, 2 * T_ext, W2, jnp.bfloat16, None)
        one_dot_s = 2 * tile_r * 2 * T_ext * W2 / (tf * 1e12)
        n_tiles = -(-N0 // tile_r)
        # 3 bf16 passes per tile, per matvec
        per_matvec = 3 * n_tiles * one_dot_s
        print(json.dumps({
            "what": "p5_rowdots_bf16", "tile_r": tile_r, "tflops": tf,
            "per_matvec_s": per_matvec,
            "us_per_mdof": per_matvec / dof * 1e6 * 1e6}), flush=True)

    # 2. full matvec per tile_r (register-resident split)
    rng = np.random.default_rng(0)
    for tile_r in (96, 112, 128, 160, 192, 256):
        apply_padded, pad, unpad, shape = make_padded_laplace2(
            grid, jnp.float32, tile_r=tile_r, rows="mxu3p")
        u = jnp.asarray(rng.standard_normal(grid.nodes), jnp.float32)
        up = pad(u)
        f = jax.jit(apply_padded)
        t = timed_chain(f, up)
        print(json.dumps({
            "what": "p5_matvec_1024", "tile_r": tile_r, "s": t,
            "gdof_per_s": dof / t / 1e9,
            "us_per_mdof": t / dof * 1e6 * 1e6}), flush=True)


if __name__ == "__main__":
    main()
