"""Fused Pallas 2D Laplace kernel (v2) vs the XLA separable operator.

Runs in Pallas interpret mode on CPU (numerics only; the TPU timing /
Mosaic-compilation behavior is exercised by bench.py on hardware).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gdm.grid import Grid
from gdm.ops import laplace_apply_fn
from gdm.ops.pallas_stencil2 import make_padded_laplace2, _round_up


CASES = [
    (3, (40, 72), 64),    # multi-tile rows
    (3, (40, 72), 48),    # single tile (NB=1 path)
    (5, (48, 40), 64),
    (7, (32, 33), 64),
    (9, (40, 40), 64),
    (3, (300, 140), 64),  # many tiles
]


@pytest.mark.parametrize("rows", ["vpu", "mxu"])
@pytest.mark.parametrize("p,cells,tile_r", CASES)
def test_matches_xla_operator(rows, p, cells, tile_r):
    grid = Grid(p, cells, (0.0, 0.0), (1.0, 2.0))
    f = laplace_apply_fn(grid, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(grid.nodes)
    y_ref = np.asarray(f(jnp.asarray(u)))
    ap, pad, unpad, shape = make_padded_laplace2(
        grid, jnp.float64, tile_r=tile_r, interpret=True, rows=rows)
    y = np.asarray(unpad(ap(pad(jnp.asarray(u)))))
    np.testing.assert_allclose(y, y_ref, rtol=1e-13, atol=1e-13)


def test_padded_layout_closed_under_apply():
    """Guard rows / pad lanes stay zero, so CG can chain applies."""
    p = 3
    grid = Grid(p, (40, 72), (0.0, 0.0), (1.0, 2.0))
    ap, pad, unpad, shape = make_padded_laplace2(
        grid, jnp.float64, tile_r=32, interpret=True)
    rng = np.random.default_rng(1)
    u = rng.standard_normal(grid.nodes)
    y2 = np.asarray(ap(ap(pad(jnp.asarray(u)))))
    H = _round_up(p, 8)
    N0, N1 = grid.nodes
    mask = np.ones(shape, bool)
    mask[H : H + N0, p : p + N1] = False
    assert np.max(np.abs(y2[mask])) == 0.0
    # and the data block equals A(A(u))
    f = laplace_apply_fn(grid, dtype=jnp.float64)
    y_ref = np.asarray(f(f(jnp.asarray(u))))
    np.testing.assert_allclose(y2[H : H + N0, p : p + N1], y_ref,
                               rtol=1e-12, atol=1e-10)
