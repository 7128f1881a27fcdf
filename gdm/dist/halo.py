"""Explicit halo-exchange operator application with shard_map + ppermute.

The banded 1D GD operator touches p rows on each side of a shard
boundary; the halo exchange ships exactly those node planes over ICI,
mirroring the reference's update_ghost_values/compress pair
(reference call sites: applications/wave/include/gdm/wave/stiffness.h:149,
406) — but as two ppermutes instead of an MPI Partitioner.

Non-periodic boundaries receive zero halos automatically (ppermute fills
unmatched destinations with zeros), which is exactly the banded matrix's
out-of-range convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_pad(u_blk, width: int, axis_name: str):
    """Append `width` planes from each neighbor along leading axis.

    Returns array with leading dim N_local + 2*width (zeros at the ends of
    the global domain).
    """
    n = jax.lax.axis_size(axis_name)
    # my last rows -> right neighbor's left halo
    fwd = [(i, i + 1) for i in range(n - 1)]
    # my first rows -> left neighbor's right halo
    bwd = [(i + 1, i) for i in range(n - 1)]
    left = jax.lax.ppermute(u_blk[-width:], axis_name, fwd)
    right = jax.lax.ppermute(u_blk[:width], axis_name, bwd)
    return jnp.concatenate([left, u_blk, right], axis=0)


def banded_apply_sharded(u, band, mesh: Mesh, axis: str = "x"):
    """y = Band @ u along leading axis, u and band sharded over `axis`."""
    p = (band.shape[1] - 1) // 2
    n_shards = mesh.shape[axis]
    if u.shape[0] < n_shards * p:
        raise ValueError(
            f"shard width {u.shape[0]}/{n_shards} < halo width {p}: the "
            f"single-hop ppermute halo needs >= {p} rows per device "
            f"(use fewer devices or a larger grid)"
        )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis) if u.ndim == 1 else P(axis, *([None] * (u.ndim - 1))),
                  P(axis, None)),
        out_specs=P(axis) if u.ndim == 1 else P(axis, *([None] * (u.ndim - 1))),
    )
    def _apply(u_blk, band_blk):
        up = halo_pad(u_blk, p, axis)
        N = u_blk.shape[0]
        y = jnp.zeros_like(u_blk)
        bshape = (N,) + (1,) * (u_blk.ndim - 1)
        for k in range(2 * p + 1):
            y = y + band_blk[:, k].reshape(bshape) * up[k : k + N]
        return y

    return _apply(u, band)
