"""Distributed-layer tests on the virtual 8-device CPU mesh.

Reproduces the contract of tests/poisson_02_gdm.mpirun={1,3}.output: the
printed solution is identical regardless of the number of shards, and
matches the committed golden values."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gdm.dist.mesh import device_mesh
from gdm.dist import poisson as dpoisson
from gdm.dist.halo import banded_apply_sharded
from gdm.grid import Grid
from gdm.ops1d import stiffness_1d
from gdm.ops.tensor import apply_banded

GOLDEN = "/root/reference/tests/poisson_02_gdm.mpirun=1.output"

import pytest as _pytest
from conftest import reference_available

pytestmark = _pytest.mark.skipif(
    not reference_available(), reason="reference goldens not mounted")

GOLDEN3 = "/root/reference/tests/poisson_02_gdm.mpirun=3.output"


def parse_golden(path):
    """Two blocks (1D: 21 values, 2D: 441 values)."""
    vals = []
    with open(path) as f:
        for line in f:
            s = line.strip()
            if s and (" " not in s):
                vals.append(float(s))
    # first value of each block is the CG iteration count; drop it
    assert len(vals) == 1 + 21 + 1 + 441, len(vals)
    return np.array(vals[1:22]), np.array(vals[23:])


def rhs_one(mesh, c):
    return np.ones_like(mesh[0])


def test_golden_outputs_rank_invariant():
    a1, b1 = parse_golden(GOLDEN)
    a3, b3 = parse_golden(GOLDEN3)
    np.testing.assert_array_equal(a1, a3)
    np.testing.assert_array_equal(b1, b3)


@pytest.mark.parametrize("n_shards", [1, 3, 7])
def test_halo_banded_apply_matches_local(n_shards):
    mesh = device_mesh(n_shards)
    grid = Grid(3, (20, 20), (0.0, 0.0), (1.0, 1.0))
    band = jnp.asarray(stiffness_1d(3, 20, 1 / 20).band)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(21, 21)))
    y_local = apply_banded(u, band, 0)
    y_dist = banded_apply_sharded(u, band, mesh)
    np.testing.assert_allclose(np.asarray(y_dist), np.asarray(y_local),
                               atol=1e-13)


@pytest.mark.parametrize("dim", [1, 2])
@pytest.mark.parametrize("mode", ["auto", "shard_map"])
def test_poisson02_sharded(dim, mode):
    g1, g2 = parse_golden(GOLDEN)
    golden = g1 if dim == 1 else g2
    grid = Grid(3, (20,) * dim, (0.0,) * dim, (1.0,) * dim)

    results = []
    for n_shards in (1, 3, 7):
        mesh = device_mesh(n_shards)
        u, info = dpoisson.solve(grid, rhs_one, mesh, mode=mode)
        results.append(grid.to_reference_vector(np.asarray(u)))
    # shard-count invariance (same algorithm, deterministic reductions
    # up to float reassociation in psum)
    np.testing.assert_allclose(results[0], results[1], atol=1e-12)
    np.testing.assert_allclose(results[0], results[2], atol=1e-12)
    # golden values are printed with ~6 significant digits and solved to
    # the same tolerance class
    np.testing.assert_allclose(results[0], golden, atol=5e-6)
