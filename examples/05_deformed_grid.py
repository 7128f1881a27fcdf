"""Poisson on a vertex-deformed grid (mapping_q_cache_function parity).

The reference wave app can deform its discretization by moving every
mesh vertex through a user map (wave/discretization.h:57-74, a
MappingQCache(1) built from the moved vertices).  gdm.deform is the
general-dim counterpart; geometry="q1" reproduces that per-cell Q1
chart (second-order geometric consistency), geometry="exact" samples
the true map at quadrature points and keeps the full GD order.

Run: dev/py examples/05_deformed_grid.py
"""

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

from gdm.grid import Grid
from gdm import deform
from gdm.problems import poisson


def warp(pts):
    """Smooth interior warp that leaves the unit-square boundary fixed."""
    x, y = pts[:, 0], pts[:, 1]
    s = 0.08 * np.sin(2 * np.pi * x) * np.sin(2 * np.pi * y)
    return np.stack([x + s, y - 0.5 * s], -1)


rhs = lambda m, c: 2 * np.pi**2 * np.sin(np.pi * m[0]) * np.sin(np.pi * m[1])
exact = lambda m, c: np.sin(np.pi * m[0]) * np.sin(np.pi * m[1])

for geometry in ("q1", "exact"):
    print(f"-- geometry={geometry}")
    prev = None
    for n in (8, 16, 32):
        g = Grid(3, (n, n), (0.0, 0.0), (1.0, 1.0))
        u, info = poisson.solve_deformed(g, warp, rhs, geometry=geometry)
        err = deform.l2_error(g, warp, u, exact, geometry=geometry)
        rate = "" if prev is None else f"  rate {np.log2(prev / err):.2f}"
        print(f"  n={n:3d}  iters={int(info['iterations']):4d}  "
              f"L2={err:.4e}{rate}")
        prev = err
