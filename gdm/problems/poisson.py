"""Uncut Poisson problem on the full hypercube (zero Dirichlet BC).

Capability parity with reference tests/poisson_01_gdm.cc and
tests/poisson_02_gdm.cc: assemble-free stiffness apply + CG.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import operators, solvers
from ..constraints import Constraints
from ..functional import load_vector
from ..grid import Grid
from ..ops.tensor import l2_error


def solve(
    grid: Grid,
    rhs_fn,
    rel_tol: float = 1e-12,
    abs_tol: float = 1e-20,
    max_iter: int = 10000,
    precondition: str = "jacobi",
    use_pallas: str = None,
):
    """Solve -Laplace(u) = f, u = 0 on the boundary.

    precondition: "jacobi" | "mg" (geometric multigrid V-cycle; mesh-
    independent ~7 CG iterations; requires even cell counts) | "none" |
    a prebuilt preconditioner callable (e.g. PoissonMultigrid(grid)
    .precondition) to amortize setup across solves.

    On TPU the operator apply rides the fused Pallas kernels
    (ops.fast.best_field_laplace; bf16x3 rows, ~1e-6 relative — pass
    use_pallas="never" or set GDM_DISABLE_PALLAS=1 for the f32/f64-exact
    XLA path, which is also what every non-TPU platform gets).
    Returns (solution field, info dict).
    """
    import jax

    from ..ops.fast import best_field_laplace

    A = operators.laplace(grid)
    cons = Constraints.zero_boundary(grid)
    base_apply, _ = best_field_laplace(grid, use_pallas)
    apply_fn = cons.constrain_operator(base_apply)
    b = cons.constrain_rhs(load_vector(grid, rhs_fn))
    diag = jnp.where(jnp.asarray(cons.full_mask), 1.0, jnp.asarray(A.diagonal()))

    if callable(precondition):
        precond = precondition
    elif precondition == "mg":
        from ..multigrid import PoissonMultigrid

        precond = PoissonMultigrid(grid, use_pallas=use_pallas).precondition
    elif precondition in ("jacobi", True):
        precond = solvers.jacobi_preconditioner(diag)
    else:
        precond = None

    @jax.jit
    def run(b):
        x, info = solvers.cg(
            apply_fn, b, precond=precond, max_iter=max_iter, abs_tol=abs_tol,
            rel_tol=rel_tol,
        )
        return cons.finalize_solution(x), info

    return run(b)


def solve_deformed(
    grid: Grid,
    mapping_fn,
    rhs_fn,
    geometry: str = "q1",
    rel_tol: float = 1e-12,
    abs_tol: float = 1e-20,
    max_iter: int = 10000,
    precondition: str = "jacobi",
):
    """Poisson with zero Dirichlet BC on a vertex-deformed grid.

    The reference threads Parameters::mapping_q_cache_function through
    every wave-app assembly (wave/discretization.h:57-74); this is the
    uncut counterpart: gdm.deform band operators, Dirichlet-condensed,
    solved by CG.  geometry="q1" matches MappingQCache(1) semantics
    (2nd-order cap); "exact" (beyond-reference) restores the full GD
    order.  precondition: "jacobi" | "mg" (Galerkin geometric V-cycle
    on the deformed band, ~15 iterations flat in n; needs even cell
    counts) | "none" | a prebuilt preconditioner callable (e.g.
    deform.multigrid_preconditioner(Abc) amortized across solves).
    Returns (solution field, info dict).
    """
    import jax
    import numpy as np

    from .. import deform

    assert grid.n_components == 1
    A = deform.laplace_band(grid, mapping_fn, geometry=geometry)
    cons = Constraints.zero_boundary(grid)
    mask = np.asarray(cons.full_mask).reshape(-1)
    Abc = deform.dirichlet_band(A, mask)
    b = np.asarray(deform.load_vector(grid, mapping_fn, rhs_fn,
                                      geometry=geometry))
    b[mask] = 0.0

    if callable(precondition):
        precond = precondition
    elif precondition == "mg":
        precond = deform.multigrid_preconditioner(Abc)
    elif precondition in ("jacobi", True):
        K = 2 * A.radius + 1
        center = (K**grid.dim - 1) // 2
        diag = jnp.asarray(
            Abc.band_host.reshape(grid.n_nodes, -1)[:, center])
        precond = solvers.jacobi_preconditioner(diag)
    else:
        precond = None

    @jax.jit
    def run(b):
        return solvers.cg(
            Abc.apply, b, precond=precond, max_iter=max_iter,
            abs_tol=abs_tol, rel_tol=rel_tol,
        )

    x, info = run(jnp.asarray(b))
    return np.asarray(x).reshape(grid.nodes)[..., None], info
