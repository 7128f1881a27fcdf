"""2-D device-mesh execution (both grid axes sharded).

The reference's parallel scope is a 1-D slab partition
(include/gdm/system.h:703-761); a 2-D domain decomposition is
beyond-reference TPU scope.  Here both grid axes are sharded over a
2-D jax.sharding.Mesh and XLA's SPMD partitioner inserts the halo
collectives; the contract is the same as the MPI tests' rank-count
invariance (tests/poisson_02_gdm.mpirun={1,3}.output): results must
equal the single-device run to the last bit (identical reduction
orders) or machine precision.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gdm.grid import Grid
from gdm import operators, solvers
from gdm.constraints import Constraints
from gdm.functional import load_vector


def _mesh2(rows, cols):
    devs = jax.devices()
    if len(devs) < rows * cols:
        pytest.skip(f"needs {rows * cols} devices")
    return Mesh(np.array(devs[: rows * cols]).reshape(rows, cols),
                ("x", "y"))


@pytest.mark.parametrize("rows,cols", [(4, 2), (2, 2)])
def test_laplace_apply_2d_mesh_matches_serial(rows, cols):
    mesh = _mesh2(rows, cols)
    g = Grid(3, (4 * rows - 1, 4 * cols - 1), (0.0, 0.0), (1.0, 1.0))
    A = operators.laplace(g)
    u = np.random.default_rng(0).standard_normal(g.field_shape)
    y0 = np.asarray(jax.jit(A.apply)(jnp.asarray(u)))
    sh = NamedSharding(mesh, P("x", "y", None))
    v = jax.device_put(jnp.asarray(u), sh)
    y1 = np.asarray(jax.jit(A.apply, out_shardings=sh)(v))
    np.testing.assert_allclose(y1, y0, rtol=1e-14, atol=1e-14)


def test_poisson_cg_solve_2d_mesh_matches_serial():
    """Full preconditioned CG under a 2-D mesh: the whole while_loop
    (matvec + psum-style dot reductions) partitioned over both axes;
    the converged solution and iteration count match serial."""
    mesh = _mesh2(4, 2)
    g = Grid(3, (15, 15), (0.0, 0.0), (1.0, 1.0))
    rhs = lambda m, c: 2 * np.pi**2 * np.sin(np.pi * m[0]) * np.sin(
        np.pi * m[1])
    A = operators.laplace(g)
    cons = Constraints.zero_boundary(g)
    apply_fn = cons.constrain_operator(A.apply)
    b = cons.constrain_rhs(load_vector(g, rhs))
    diag = jnp.where(jnp.asarray(cons.full_mask), 1.0,
                     jnp.asarray(A.diagonal()))
    precond = solvers.jacobi_preconditioner(diag)

    def run(bv):
        x, info = solvers.cg(apply_fn, bv, precond=precond,
                             max_iter=500, rel_tol=1e-12, abs_tol=1e-20)
        return cons.finalize_solution(x), info["iterations"]

    x0, it0 = jax.jit(run)(b)
    sh = NamedSharding(mesh, P("x", "y", None))
    bs = jax.device_put(b, sh)
    x1, it1 = jax.jit(run, out_shardings=(sh, None))(bs)
    assert int(it0) == int(it1)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               rtol=1e-12, atol=1e-14)


def test_cut_stencil_apply_2d_mesh_matches_serial():
    """The cut stencil-band operator (the flagship workload) under a
    2-D mesh via XLA SPMD: exact parity with the serial apply."""
    from gdm.cut.geometry import INSIDE, CutGeometry
    from gdm.cut.operators import CutOperators
    from gdm.cut.stencil import assemble_stencil

    mesh = _mesh2(2, 2)
    g = Grid(3, (19, 19), (-1.21, -1.21), (1.21, 1.21))  # 20 nodes/axis
    geo = CutGeometry.build(
        g, lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0, 3)
    st = assemble_stencil(CutOperators(geo, INSIDE), "mass",
                          0.25 * np.sqrt(3.0))
    u = np.random.default_rng(1).standard_normal(g.n_nodes)
    y0 = np.asarray(jax.jit(st.apply)(jnp.asarray(u)))

    sh = NamedSharding(mesh, P(("x",), ("y",)))
    us = jax.device_put(jnp.asarray(u).reshape(g.nodes), sh)

    def apply2(uf):
        return st.apply(uf.ravel()).reshape(g.nodes)

    y1 = np.asarray(jax.jit(apply2, out_shardings=sh)(us))
    np.testing.assert_allclose(y1.ravel(), y0, rtol=1e-14, atol=1e-14)
