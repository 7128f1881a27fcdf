"""Geometric-multigrid-preconditioned CG: mesh-independent iteration
counts for the GD Laplacian.

    python examples/04_multigrid.py
"""

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

from gdm.grid import Grid
from gdm.multigrid import PoissonMultigrid
from gdm.problems import poisson
from gdm.ops.tensor import l2_error

exact = lambda m, c: np.sin(np.pi * m[0]) * np.sin(np.pi * m[1])
rhs = lambda m, c: 2 * np.pi**2 * exact(m, c)

for n in (32, 64, 128, 256):
    grid = Grid(3, (n, n), (0.0, 0.0), (1.0, 1.0))
    mg = PoissonMultigrid(grid)
    u, info = poisson.solve(grid, rhs, precondition=mg.precondition,
                            rel_tol=1e-10)
    print(f"n={n:4d}  MG-CG iters={int(info['iterations']):2d}  "
          f"L2 error={l2_error(u, grid, exact):.2e}")
