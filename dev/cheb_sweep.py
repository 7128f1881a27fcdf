"""Sweep Chebyshev smoother (degree, range) for CutMultigrid CG counts.

Run with dev/py (sanitized CPU env)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from gdm import solvers
from gdm.cut.geometry import INSIDE, CutGeometry
from gdm.cut.operators import CutOperators
from gdm.cut.multigrid import cut_poisson_multigrid, cut_heat_impl_multigrid
from gdm.cut.stencil import StencilOperator, assemble_stencil
from gdm.grid import Grid

LS = lambda m: np.sqrt(sum(np.asarray(x) ** 2 for x in m)) - 1.0  # noqa
GN = 15.0
GA = 0.5


def step85(n):
    grid = Grid(3, (n, n), (-1.21, -1.21), (1.21, 1.21))
    geo = CutGeometry.build(grid, LS, 3)
    op = CutOperators(geo, INSIDE)
    st = assemble_stencil(op, "stiff", GA, GN, with_nitsche=True)
    b = op.compute_rhs(
        jnp.zeros(grid.n_nodes), 0.0, False,
        rhs_fn=lambda pts, t: jnp.full(pts.shape[:-1], 4.0),
        interface_dbc=lambda pts, t: jnp.full(pts.shape[:-1], 1.0),
        nitsche_gamma=GN)
    return grid, op, st, b


def heat(n):
    GM = 0.75
    grid = Grid(3, (n, n), (-1.21, -1.21), (1.21, 1.21))
    geo = CutGeometry.build(grid, LS, 3)
    op = CutOperators(geo, INSIDE)
    dt = 0.3 * 2.42 / n
    m = assemble_stencil(op, "mass", GM)
    s = assemble_stencil(op, "stiff", 1.5, GN, with_nitsche=True,
                         inactive_identity=False)
    sys_op = StencilOperator(grid, m.band_host + dt * s.band_host, m.radius)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(grid.n_nodes) * ~op.inactive)
    return grid, op, sys_op, b, dt, GM


def iters(apply_fn, b, pre, tol=1e-8):
    _, info = jax.jit(lambda b: solvers.cg(
        apply_fn, b, precond=pre, max_iter=400, rel_tol=tol))(b)
    return int(info["iterations"])


def main():
    ns = [int(x) for x in (sys.argv[1:] or [40, 80, 160])]
    syss = {n: step85(n) for n in ns}
    heats = {n: heat(n) for n in ns}
    for deg, rng_ in [(2, 7.0), (3, 10.0), (3, 20.0), (4, 15.0), (4, 20.0),
                      (4, 30.0), (5, 20.0), (5, 30.0), (6, 30.0)]:
        row_s, row_h = [], []
        for n in ns:
            grid, op, st, b = syss[n]
            mg = cut_poisson_multigrid(
                op, GA, GN, LS, level_set_degree=3,
                cheb_degree=deg, cheb_range=rng_)
            row_s.append(iters(st.apply, b, jax.jit(mg.precondition)))
            grid, op, sys_op, bh, dt, GM = heats[n]
            mgh = cut_heat_impl_multigrid(
                op, dt, GM, 1.5, GN, LS, level_set_degree=3,
                cheb_degree=deg, cheb_range=rng_)
            row_h.append(iters(sys_op.apply, bh, jax.jit(mgh.precondition)))
        print(f"deg={deg} range={rng_}: step85={row_s} heat={row_h}",
              flush=True)
    # richardson baseline
    row_s, row_h = [], []
    for n in ns:
        grid, op, st, b = syss[n]
        mg = cut_poisson_multigrid(op, GA, GN, LS, level_set_degree=3,
                                   smoother="richardson")
        row_s.append(iters(st.apply, b, jax.jit(mg.precondition)))
        grid, op, sys_op, bh, dt, GM = heats[n]
        mgh = cut_heat_impl_multigrid(op, dt, GM, 1.5, GN, LS,
                                      level_set_degree=3,
                                      smoother="richardson")
        row_h.append(iters(sys_op.apply, bh, jax.jit(mgh.precondition)))
    print(f"richardson baseline: step85={row_s} heat={row_h}", flush=True)


if __name__ == "__main__":
    main()
