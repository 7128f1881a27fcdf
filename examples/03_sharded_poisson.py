"""Multi-device Poisson: domain-decomposition sharding with explicit
ppermute halo exchange (run with a virtual device mesh on CPU):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/03_sharded_poisson.py
"""

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

from gdm.dist.mesh import device_mesh
from gdm.dist import poisson as dpoisson
from gdm.grid import Grid

n_dev = len(jax.devices())
print(f"devices: {n_dev}")
mesh = device_mesh(n_dev)
cells = 16 * n_dev - 1
grid = Grid(3, (cells, cells), (0.0, 0.0), (1.0, 1.0))
u, info = dpoisson.solve(grid, lambda m, c: np.ones_like(m[0]), mesh,
                         mode="shard_map")
print(f"solved {grid.n_dofs} dofs over {n_dev} shards in "
      f"{int(info['iterations'])} CG iterations; max u = "
      f"{float(np.asarray(u).max()):.6f}")
