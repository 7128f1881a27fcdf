"""High-performance scalar Laplace/mass applies (bench / serving path).

`laplace_apply_fn` returns the best available implementation for the
platform: the fused Pallas TPU kernel (single HBM read+write per matvec)
when available, otherwise the XLA separable path (4 banded sweeps).
Operates on bare (N0, ..., N_{dim-1}) scalar fields.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import Grid
from ..ops1d import mass_1d, stiffness_1d
from .tensor import apply_banded


def _bands(grid: Grid, dtype):
    bs, bm = [], []
    for d in range(grid.dim):
        bs.append(jnp.asarray(
            stiffness_1d(grid.degree, grid.cells[d], grid.h[d]).band,
            dtype=dtype))
        bm.append(jnp.asarray(
            mass_1d(grid.degree, grid.cells[d], grid.h[d]).band, dtype=dtype))
    return bs, bm


def laplace_apply_fn(grid: Grid, dtype=jnp.float32, use_pallas: str = None):
    import os

    if use_pallas is None:
        # The fused Pallas kernel is the roofline path, but the remote
        # TPU relay in this environment cannot compile Pallas kernels in
        # reasonable time; opt in explicitly via GDM_ENABLE_PALLAS=1.
        use_pallas = (
            "auto" if os.environ.get("GDM_ENABLE_PALLAS") == "1" else "never"
        )
    bs, bm = _bands(grid, dtype)
    dim = grid.dim

    if use_pallas in ("auto", "force") and dim in (2, 3):
        try:
            from .pallas_stencil2 import laplace_2d_pallas2_fn

            fn = laplace_2d_pallas2_fn(grid, dtype)
            if fn is not None or use_pallas == "force":
                if fn is None:
                    raise RuntimeError("pallas kernel unavailable")
                return fn
        except Exception:
            if use_pallas == "force":
                raise

    def apply(u):
        out = None
        for d in range(dim):
            v = u
            for e in range(dim):
                v = apply_banded(v, bs[e] if e == d else bm[e], e)
            out = v if out is None else out + v
        return out

    return apply


def mass_apply_fn(grid: Grid, dtype=jnp.float32):
    _, bm = _bands(grid, dtype)

    def apply(u):
        v = u
        for d in range(grid.dim):
            v = apply_banded(v, bm[d], d)
        return v

    return apply
