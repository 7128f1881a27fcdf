"""Sharded execution of the CUT operators (stencil-band form).

The reference runs the whole cut wave/advection applications under MPI:
ghost exchange around every matrix-free apply
(applications/wave/include/gdm/wave/stiffness.h:149,406), distributed
assembly (mass.h:244) and the slab partition of include/gdm/system.h:
703-761.  The TPU-native equivalent here shards the assembled
stencil-band operators (gdm.cut.stencil.StencilOperator) along grid
axis 0 of a 1-D jax.sharding.Mesh and performs the halo exchange with
shard_map + ppermute; the cut tables themselves (quadrature, windows)
stay host-side exactly as in the serial build, so a sharded solve is
bit-identical in exact arithmetic to the serial one.

The node count along axis 0 need not divide the device count: the
operator is padded with identity rows (band = e_center, u = 0), which
leaves every CG iterate on the data rows EXACTLY unchanged (the padded
block's residual is identically zero, so all dot products coincide).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cut.stencil import StencilOperator
from .halo import halo_pad


def _sweep(up, band_blk, out_shape, radius, dim):
    """y[i] = sum_off band[i, off] * up[i + off] on a halo-padded block."""
    K = 2 * radius + 1
    y = jnp.zeros(out_shape, up.dtype)
    for flat_off in range(K**dim):
        idx = []
        rem = flat_off
        for _ in range(dim):
            idx.append(rem % K)
            rem //= K
        sl = tuple(slice(idx[d], idx[d] + out_shape[d]) for d in range(dim))
        y = y + band_blk[(Ellipsis,) + tuple(idx)] * up[sl]
    return y


def sharded_stencil_apply(op: StencilOperator, mesh: Mesh, axis: str = "x"):
    """Return ``apply(u_flat) -> y_flat`` equal to ``op.apply`` but
    executed with axis-0 domain decomposition over ``mesh``: explicit
    ppermute halo exchange of ``radius`` node planes per apply."""
    grid = op.grid
    r = op.radius
    dim = grid.dim
    n = mesh.shape[axis]
    nodes = grid.nodes
    N0 = nodes[0]
    # pad axis 0 so shards are equal and at least r wide
    loc = max(-(-N0 // n), r)
    L = n * loc
    K = 2 * r + 1
    band = np.zeros((L,) + nodes[1:] + (K,) * dim)
    band[:N0] = np.asarray(op.band_host)
    band[N0:][(Ellipsis,) + (r,) * dim] = 1.0  # identity pad rows
    band = jnp.asarray(band)
    pshape = (L,) + nodes[1:]

    in_specs = (P(axis, *([None] * (dim - 1))),
                P(axis, *([None] * (2 * dim - 1))))
    out_specs = P(axis, *([None] * (dim - 1)))

    @jax.jit
    def apply_fn(u_flat):
        u = u_flat.reshape(nodes)
        upad = jnp.zeros(pshape, u.dtype)
        upad = jax.lax.dynamic_update_slice(upad, u, (0,) * dim)

        def local(u_blk, band_blk):
            up = halo_pad(u_blk, r, axis)
            if dim > 1:
                up = jnp.pad(up, [(0, 0)] + [(r, r)] * (dim - 1))
            return _sweep(up, band_blk, u_blk.shape, r, dim)

        y = jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        )(upad, band)
        return jax.lax.dynamic_slice(y, (0,) * dim, nodes).reshape(-1)

    return apply_fn
