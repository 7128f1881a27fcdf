"""Sharded uncut Poisson solver (capability parity with
tests/poisson_02_gdm.cc: distributed assembly-free solve whose printed
solution is invariant to the number of shards).

Two device-parallel execution paths:
* auto : jit the single-controller operator with sharded inputs and let
         XLA's SPMD partitioner insert the halo exchanges;
* shard_map : explicit ppermute halo exchange for the sharded axis
         (gdm.dist.halo), composed with local applies on other axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import operators, solvers
from ..constraints import Constraints
from ..functional import load_vector
from ..grid import Grid
from ..ops.tensor import apply_banded
from .halo import banded_apply_sharded
from .mesh import shard_field


def solve(grid: Grid, rhs_fn, mesh: Mesh, mode: str = "shard_map",
          rel_tol: float = 1e-12, max_iter: int = 10000):
    """Solve -lap u = f, u=0 on boundary, sharded over mesh axis 'x'."""
    A = operators.laplace(grid)
    cons = Constraints.zero_boundary(grid)
    b = cons.constrain_rhs(load_vector(grid, rhs_fn))
    diag = jnp.where(jnp.asarray(cons.full_mask), 1.0, jnp.asarray(A.diagonal()))

    if mode == "auto":
        apply_fn = cons.constrain_operator(A.apply)
    elif mode == "shard_map":
        def apply_fn(u):
            u = cons.distribute(u)
            out = jnp.zeros_like(u)
            for ci, cj, coeff, bands in A.terms:
                v = u[..., cj]
                # sharded axis 0 via explicit halo exchange
                v = banded_apply_sharded(v, bands[0], mesh)
                for d in range(1, grid.dim):
                    v = apply_banded(v, bands[d], d)
                out = out.at[..., ci].add(coeff * v)
            return cons.compress(out)
    else:
        raise ValueError(mode)

    sharding = NamedSharding(mesh, P("x", *([None] * grid.dim)))
    b = jax.device_put(b, sharding)
    diag = jax.device_put(diag, sharding)

    @jax.jit
    def run(b, diag):
        pre = solvers.jacobi_preconditioner(diag)
        x, info = solvers.cg(apply_fn, b, precond=pre, max_iter=max_iter,
                             rel_tol=rel_tol)
        return cons.finalize_solution(x), info

    return run(b, diag)
