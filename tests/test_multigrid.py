"""Geometric multigrid: mesh-independent CG preconditioning for the GD
Laplacian (the TPU-native replacement for the reference's Trilinos AMG)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gdm import operators, solvers
from gdm.constraints import Constraints
from gdm.functional import load_vector
from gdm.grid import Grid
from gdm.multigrid import PoissonMultigrid, gd_prolong_axis, gd_restrict_axis, _gd_mid_table
from gdm.ops.tensor import l2_error
from gdm.problems import poisson

EXACT = lambda m, c: np.sin(np.pi * m[0]) * np.sin(np.pi * m[1])
RHS = lambda m, c: 2 * np.pi**2 * EXACT(m, c)


def test_transfer_adjointness():
    g = Grid(3, (8,), (0.0,), (1.0,))
    tab, off = _gd_mid_table(g, 0)
    rng = np.random.default_rng(0)
    uc = jnp.asarray(rng.normal(size=(9,)))
    yf = jnp.asarray(rng.normal(size=(17,)))
    lhs = float(jnp.vdot(gd_prolong_axis(uc, 0, tab, off, 17), yf))
    rhs = float(jnp.vdot(uc, gd_restrict_axis(yf, 0, tab, off)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-13)


@pytest.mark.parametrize("p", [1, 3, 5])
def test_transfer_matches_window_definition(p):
    """The banded slice-FMA transfers (round 4, gather/scatter-free)
    must reproduce the windowed definition exactly: out[2j] = u[j],
    out[2c+1] = sum_k T[c,k] u[offsets[c]+k], and R = P^T."""
    g = Grid(p, (8,), (0.0,), (1.0,))
    nc, nf = 9, 17
    tab, off = _gd_mid_table(g, 0)
    # P columns via unit vectors
    P = np.stack([
        np.asarray(gd_prolong_axis(
            jnp.zeros(nc).at[j].set(1.0), 0, tab, off, nf))
        for j in range(nc)], axis=1)
    P_ref = np.zeros((nf, nc))
    P_ref[2 * np.arange(nc), np.arange(nc)] = 1.0
    for c in range(nc - 1):
        for k in range(p + 1):
            P_ref[2 * c + 1, off[c] + k] += tab[c, k]
    np.testing.assert_allclose(P, P_ref, atol=1e-14)
    R = np.stack([
        np.asarray(gd_restrict_axis(
            jnp.zeros(nf).at[i].set(1.0), 0, tab, off))
        for i in range(nf)], axis=1)
    np.testing.assert_allclose(R, P_ref.T, atol=1e-14)


def test_stage_micros_interpret():
    """The mxu_micro stripped-kernel modes (the committed evidence for
    the measured kernel floors) must stay runnable."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from benchmarks.mxu_micro import make_stage1_micro
    g = Grid(3, (48, 48), (0.0, 0.0), (1.0, 1.0))
    u = jnp.ones((0, 0))
    for mode in ("full", "norolls", "rollsonly",
                 "rowsonly", "dotsonly", "splitsonly"):
        ap, shape = make_stage1_micro(g, mode, tile_r=16, interpret=True)
        y = ap(jnp.ones(shape, jnp.float32))
        assert y.shape == shape and bool(jnp.isfinite(y[8:-8]).all()), mode


@pytest.mark.parametrize("n", [32, 64, 128])
def test_mg_cg_mesh_independent(n):
    grid = Grid(3, (n, n), (0.0, 0.0), (1.0, 1.0))
    u, info = poisson.solve(grid, RHS, precondition="mg", rel_tol=1e-10)
    assert int(info["iterations"]) <= 9, int(info["iterations"])
    err = l2_error(u, grid, EXACT)
    ref = {32: 4.8e-07, 64: 3.0e-08, 128: 1.9e-09}[n]
    assert err < ref
