"""Minimal example: 2D Poisson with a degree-5 GD discretization.

    python examples/01_poisson.py
"""

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

from gdm.grid import Grid
from gdm.problems import poisson
from gdm.ops.tensor import l2_error
from gdm.io import DataOut

exact = lambda m, c: np.sin(np.pi * m[0]) * np.sin(2 * np.pi * m[1])
rhs = lambda m, c: 5 * np.pi**2 * exact(m, c)

for n in (8, 16, 32):
    grid = Grid(5, (n, n), (0.0, 0.0), (1.0, 1.0))
    u, info = poisson.solve(grid, rhs)
    print(f"n={n:3d}  CG iters={int(info['iterations']):4d}  "
          f"L2 error={l2_error(u, grid, exact):.3e}")

out = DataOut(grid, output_degree=2)
out.add_data_vector(np.asarray(u)[..., 0], "solution")
out.write_vtu("poisson.vtu")
print("wrote poisson.vtu")
