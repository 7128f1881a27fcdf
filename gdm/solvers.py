"""On-device Krylov solvers (jit-friendly, lax.while_loop based).

Replaces the reference's Trilinos CG/AMG/ILU/direct stack
(applications/wave/include/gdm/wave/problem.h:457-502).  On TPU, operators
stay matrix-free, so we use CG with Jacobi (diagonal) preconditioning; the
stopping rule replicates deal.II's ReductionControl semantics:
success when ||r|| <= max(abs_tol, rel_tol * ||r0||).

For small systems a dense direct solve is provided (used by the eigenvalue
tool and implicit time stepping on modest grids).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _dot(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return sum(jnp.vdot(x, y) for x, y in zip(leaves_a, leaves_b))


def _axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda a, b: alpha * a + b, x, y)


def cg(
    apply_fn,
    b,
    x0=None,
    precond=None,
    max_iter: int = 1000,
    abs_tol: float = 1e-20,
    rel_tol: float = 1e-14,
):
    """Preconditioned conjugate gradients on pytrees.

    Returns (x, info) with info = dict(iterations, residual).
    `apply_fn` must be linear and symmetric positive definite on the
    subspace containing b (constrained dofs are handled by masking inside
    apply_fn and b).
    """
    if x0 is None:
        x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
    if precond is None:
        precond = lambda r: r

    r0 = jax.tree_util.tree_map(lambda bb, aa: bb - aa, b, apply_fn(x0))
    z0 = precond(r0)
    norm_r0 = jnp.sqrt(jnp.real(_dot(r0, r0)))
    tol = jnp.maximum(abs_tol, rel_tol * norm_r0)

    def cond(state):
        i, x, r, z, p, rz, norm_r = state
        return (norm_r > tol) & (i < max_iter)

    def body(state):
        i, x, r, z, p, rz, norm_r = state
        Ap = apply_fn(p)
        alpha = rz / jnp.real(_dot(p, Ap))
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, Ap, r)
        z = precond(r)
        rz_new = jnp.real(_dot(r, z))
        beta = rz_new / rz
        p = _axpy(beta, p, z)
        norm_r = jnp.sqrt(jnp.real(_dot(r, r)))
        return (i + 1, x, r, z, p, rz_new, norm_r)

    state = (jnp.asarray(0), x0, r0, z0, z0, jnp.real(_dot(r0, z0)), norm_r0)
    i, x, r, z, p, rz, norm_r = jax.lax.while_loop(cond, body, state)
    return x, {"iterations": i, "residual": norm_r}


def make_direct_solver(apply_fn, n_dofs: int, shape=None):
    """Dense direct solve (parity with the reference's Trilinos
    SolverDirect option, problem.h:465-496): materialize the operator by
    applying it to unit vectors, LU-factorize once, return a solve
    callable.  Only for modest n_dofs."""
    import numpy as np
    import jax.scipy.linalg as jsl

    shape = shape if shape is not None else (n_dofs,)
    eye = jnp.eye(n_dofs).reshape((n_dofs,) + tuple(shape))
    A = np.array(jax.vmap(apply_fn)(eye).reshape(n_dofs, n_dofs)).T
    lu, piv = jax.scipy.linalg.lu_factor(jnp.asarray(A))

    def solve(b):
        x = jsl.lu_solve((lu, piv), b.reshape(-1))
        return x.reshape(b.shape)

    return solve


def jacobi_preconditioner(diag):
    """diag: field (pytree of arrays); zeros are treated as 1."""
    inv = jax.tree_util.tree_map(
        lambda d: jnp.where(d == 0, 1.0, 1.0 / d), diag
    )
    return lambda r: jax.tree_util.tree_map(lambda i, rr: i * rr, inv, r)
