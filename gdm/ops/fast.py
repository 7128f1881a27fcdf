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
    """Best Laplace apply for the platform.

    On genuine TPU the default rides the fused Pallas kernels
    (best_padded_laplace: mxu3p, bf16x3 row matmuls — accuracy class
    ~1e-6 RELATIVE, ~10x f32 eps; f32-exact callers can opt out with
    use_pallas="never" or GDM_DISABLE_PALLAS=1, or pick the f32-exact
    pure-VPU kernel via make_padded_laplace2(rows="vpu")).  Elsewhere:
    the XLA separable path (4 banded sweeps).
    """
    import os

    if use_pallas is None:
        use_pallas = (
            "never" if os.environ.get("GDM_DISABLE_PALLAS") == "1"
            else "auto"
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

    if dim == 3 and use_mxu_3d(grid):
        return laplace_3d_mxu_fn(grid, dtype)

    def apply(u):
        out = None
        for d in range(dim):
            v = u
            for e in range(dim):
                v = apply_banded(v, bs[e] if e == d else bm[e], e)
            out = v if out is None else out + v
        return out

    return apply


def pallas_field_laplace_fn(grid: Grid, dtype=jnp.float32):
    """Fused Pallas Laplace apply on FIELD-shaped arrays (grid.nodes +
    (1,) trailing component axis), or None when Pallas TPU is
    unavailable.  Accuracy class: mxu3p bf16x3 rows, ~1e-6 relative
    (see laplace_apply_fn docstring)."""
    if grid.dim not in (2, 3) or grid.n_components != 1:
        return None
    from .pallas_stencil2 import laplace_2d_pallas2_fn

    fn = laplace_2d_pallas2_fn(grid, dtype)
    if fn is None:
        return None

    def apply(u):
        return fn(u[..., 0])[..., None]

    return apply


def best_field_laplace(grid: Grid, use_pallas: str = None,
                       min_dofs: int = 200_000):
    """(field-shaped Laplace apply, rode_pallas: bool) — the PRODUCT
    dispatch for the uncut Poisson/multigrid solves (the role of the
    reference's assembled Trilinos operator feeding its AMG CG,
    applications/wave/include/gdm/wave/problem.h:457-502).

    On TPU with >= min_dofs nodes this returns the fused Pallas kernel
    (single HBM read+write per matvec, bf16x3 rows ~1e-6 relative);
    everywhere else — CPU golden runs, small multigrid levels where the
    128-lane padding overhead dominates — the exact SeparableOperator
    apply in the caller's dtype.  use_pallas: "auto" (default; honors
    GDM_DISABLE_PALLAS=1) | "never" | "force".
    """
    import os

    if use_pallas is None:
        use_pallas = ("never" if os.environ.get("GDM_DISABLE_PALLAS") == "1"
                      else "auto")
    if use_pallas in ("auto", "force") and (
            use_pallas == "force" or grid.n_dofs >= min_dofs):
        fn = pallas_field_laplace_fn(grid)
        if fn is not None:
            return fn, True
        if use_pallas == "force":
            raise RuntimeError("Pallas TPU Laplace kernel unavailable")
    from .. import operators

    return operators.laplace(grid).apply, False


def use_mxu_3d(grid: Grid) -> bool:
    """Dense-factor MXU formulation pays off when the per-axis node
    count is small enough that 2N flops/dof on the MXU beats ~9(2p+1)
    VPU flops/dof of the banded sweeps (N <= ~600 on v5e)."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon") and max(grid.nodes) <= 640


def laplace_3d_mxu_fn(grid: Grid, dtype=jnp.float32):
    """3D GD Laplace as 7 dense 1D-factor matmuls on the MXU.

    y = S0⊗M1⊗M2 + M0⊗S1⊗M2 + M0⊗M1⊗S2 with shared intermediates
    A = U·M2ᵀ, B = U·S2ᵀ, P = M1·A, T = S1·A + M1·B, y = S0·P + M0·T.
    The banded factors are materialized densely (N_d x N_d, mostly
    zeros): at N ~ 160 that is 2·7·N ≈ 2.3 kflop/dof, which the MXU at
    HIGHEST precision (f32-faithful) executes ~2.3x faster than the VPU
    executes the 63 flop/dof banded sweeps at this size — and unlike
    bf16 DEFAULT precision, HIGHEST keeps the matvec exact to f32
    roundoff.  (The fused Pallas VPU kernel caps at ~6 GDoF/s here: its
    161/256 lane utilization and 84 VPU ops/dof are structural.)
    """
    p = jax.lax.Precision.HIGHEST
    F = [(jnp.asarray(stiffness_1d(grid.degree, grid.cells[d],
                                   grid.h[d]).full(), dtype),
          jnp.asarray(mass_1d(grid.degree, grid.cells[d],
                              grid.h[d]).full(), dtype))
         for d in range(3)]
    (S0, M0), (S1, M1), (S2, M2) = F
    shape = tuple(grid.nodes)

    def apply(u):
        U = u.reshape(shape)
        A = jnp.einsum("ijk,lk->ijl", U, M2, precision=p)
        B = jnp.einsum("ijk,lk->ijl", U, S2, precision=p)
        P = jnp.einsum("ijk,lj->ilk", A, M1, precision=p)
        T = (jnp.einsum("ijk,lj->ilk", A, S1, precision=p)
             + jnp.einsum("ijk,lj->ilk", B, M1, precision=p))
        Y = (jnp.einsum("ijk,li->ljk", P, S0, precision=p)
             + jnp.einsum("ijk,li->ljk", T, M0, precision=p))
        return Y.reshape(u.shape)

    return apply


def mass_apply_fn(grid: Grid, dtype=jnp.float32):
    _, bm = _bands(grid, dtype)

    def apply(u):
        v = u
        for d in range(grid.dim):
            v = apply_banded(v, bm[d], d)
        return v

    return apply
