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


@pytest.mark.parametrize("rows", ["vpu", "mxu", "mxu3", "mxu3p"])
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
    # mxu3/mxu3p under f64 split to f32 hi/lo (same code path as the TPU
    # bf16x3 scheme); the dropped lo*lo term costs ~1e-15 relative
    # (atol covers O(100)-magnitude outputs at p=9's 19-tap sums)
    tol = 2e-12 if rows in ("mxu3", "mxu3p") else 1e-13
    np.testing.assert_allclose(y, y_ref, rtol=tol, atol=100 * tol)


@pytest.mark.parametrize("p,cells,tile_r", [
    (3, (40, 72), 64),    # multi-tile rows (skewed pipeline)
    (3, (40, 72), 48),    # single tile (grid of 2 steps)
    (5, (48, 40), 64),
    (3, (300, 140), 64),  # many tiles, N0 not a tile multiple
    (7, (32, 33), 64),
])
def test_stream_matches_xla_operator(p, cells, tile_r):
    """The auto-BlockSpec-pipelined streaming kernel (gathered halo
    side input, skewed out blocks) against the XLA separable operator."""
    from gdm.ops.pallas_stencil2 import make_padded_laplace2_stream

    grid = Grid(p, cells, (0.0, 0.0), (1.0, 2.0))
    f = laplace_apply_fn(grid, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    u = rng.standard_normal(grid.nodes)
    y_ref = np.asarray(f(jnp.asarray(u)))
    ap, pad, unpad, shape = make_padded_laplace2_stream(
        grid, jnp.float64, tile_r=tile_r, interpret=True)
    y = np.asarray(unpad(ap(pad(jnp.asarray(u)))))
    np.testing.assert_allclose(y, y_ref, rtol=2e-12, atol=2e-10)


def test_stream_padded_layout_closed_under_apply():
    """CG can run entirely in the stream kernel's (Rp, W2) layout: the
    apply keeps padding rows/lanes zero."""
    from gdm.ops.pallas_stencil2 import make_padded_laplace2_stream

    grid = Grid(3, (40, 72), (0.0, 0.0), (1.0, 2.0))
    ap, pad, unpad, shape = make_padded_laplace2_stream(
        grid, jnp.float64, tile_r=32, interpret=True)
    rng = np.random.default_rng(4)
    up = pad(jnp.asarray(rng.standard_normal(grid.nodes)))
    yp = np.asarray(ap(ap(up)))
    mask = np.ones(shape, bool)
    mask[: grid.nodes[0], 3 : 3 + grid.nodes[1]] = False
    assert np.all(yp[mask] == 0.0)


@pytest.mark.parametrize("p,cells,kw", [
    (3, (40, 72), {}),
    (5, (48, 40), {}),
    (3, (300, 140), {}),
    (7, (32, 33), {}),
])
def test_fullmxu_matches_xla_operator(p, cells, kw):
    from gdm.ops.pallas_stencil2 import make_padded_laplace2_fullmxu

    grid = Grid(p, cells, (0.0, 0.0), (1.0, 2.0))
    f = laplace_apply_fn(grid, dtype=jnp.float64)
    rng = np.random.default_rng(6)
    u = rng.standard_normal(grid.nodes)
    y_ref = np.asarray(f(jnp.asarray(u)))
    ap, pad, unpad, shape = make_padded_laplace2_fullmxu(
        grid, jnp.float64, interpret=True, **kw)
    y = np.asarray(unpad(ap(pad(jnp.asarray(u)))))
    np.testing.assert_allclose(y, y_ref, rtol=2e-12, atol=2e-12)


@pytest.mark.parametrize("p,cells,tr,vr", [
    (3, (40, 72), 32, 16),
    (5, (48, 40), 24, 8),
    (3, (300, 140), 48, 24),
    (7, (300, 140), 48, 0),    # all-MXU split
    (3, (300, 140), 48, 64),   # all-VPU split
])
def test_hybrid_matches_xla_operator(p, cells, tr, vr):
    from gdm.ops.pallas_stencil2 import make_padded_laplace2_hybrid

    grid = Grid(p, cells, (0.0, 0.0), (1.0, 2.0))
    f = laplace_apply_fn(grid, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    u = rng.standard_normal(grid.nodes)
    y_ref = np.asarray(f(jnp.asarray(u)))
    ap, pad, unpad, shape = make_padded_laplace2_hybrid(
        grid, jnp.float64, tile_r=tr, vpu_rows=vr, interpret=True)
    y = np.asarray(unpad(ap(pad(jnp.asarray(u)))))
    np.testing.assert_allclose(y, y_ref, rtol=2e-12, atol=2e-12)
    # padded-layout closure: everything outside the data block stays 0
    y2 = np.asarray(ap(ap(pad(jnp.asarray(u)))))
    N0, N1 = grid.nodes
    H = _round_up(p, 8)
    mask = np.ones(shape, bool)
    mask[H : H + N0, 128 + p : 128 + p + N1] = False
    assert np.max(np.abs(y2[mask])) == 0.0


@pytest.mark.parametrize("p,cells,tile_r", [
    (3, (40, 72), 64),    # single tile at this size
    (3, (300, 140), 64),  # 5 tiles: exercises the cross-tile pipeline
    (5, (48, 40), 64),
    (7, (32, 33), 64),
    (3, (130, 250), 48),  # 3 tiles, ragged last tile
])
def test_mxucol_matches_xla_operator(p, cells, tile_r):
    from gdm.ops.pallas_stencil2 import make_padded_laplace2_mxucol

    grid = Grid(p, cells, (0.0, 0.0), (1.0, 2.0))
    f = laplace_apply_fn(grid, dtype=jnp.float64)
    rng = np.random.default_rng(8)
    u = rng.standard_normal(grid.nodes)
    y_ref = np.asarray(f(jnp.asarray(u)))
    ap, pad, unpad, shape = make_padded_laplace2_mxucol(
        grid, jnp.float64, tile_r=tile_r, interpret=True)
    y = np.asarray(unpad(ap(pad(jnp.asarray(u)))))
    np.testing.assert_allclose(y, y_ref, rtol=2e-12, atol=2e-12)
    # padded-layout closure: everything outside the data block stays 0
    y2 = np.asarray(ap(ap(pad(jnp.asarray(u)))))
    N0, N1 = grid.nodes
    H = _round_up(p, 8)
    mask = np.ones(shape, bool)
    mask[H : H + N0, 128 + p : 128 + p + N1] = False
    assert np.max(np.abs(y2[mask])) == 0.0
    y2_ref = np.asarray(f(f(jnp.asarray(u))))
    np.testing.assert_allclose(y2[H : H + N0, 128 + p : 128 + p + N1],
                               y2_ref, rtol=2e-11, atol=2e-10)


@pytest.mark.parametrize("p,cells,tile_r,vr", [
    (3, (40, 72), 64, 24),     # single tile, split rows
    (3, (300, 140), 64, 40),   # 5 tiles: cross-tile pipeline
    (3, (300, 140), 64, 0),    # all-MXU column stage
    (3, (300, 140), 64, 80),   # all-VPU column stage (rolls only)
    (5, (48, 40), 64, 32),
    (7, (32, 33), 64, 24),
])
def test_hybp_matches_xla_operator(p, cells, tile_r, vr):
    from gdm.ops.pallas_stencil2 import make_padded_laplace2_hybp

    grid = Grid(p, cells, (0.0, 0.0), (1.0, 2.0))
    f = laplace_apply_fn(grid, dtype=jnp.float64)
    rng = np.random.default_rng(9)
    u = rng.standard_normal(grid.nodes)
    y_ref = np.asarray(f(jnp.asarray(u)))
    ap, pad, unpad, shape = make_padded_laplace2_hybp(
        grid, jnp.float64, tile_r=tile_r, vpu_rows=vr, interpret=True)
    y = np.asarray(unpad(ap(pad(jnp.asarray(u)))))
    np.testing.assert_allclose(y, y_ref, rtol=2e-12, atol=2e-12)
    y2 = np.asarray(ap(ap(pad(jnp.asarray(u)))))
    N0, N1 = grid.nodes
    H = _round_up(p, 8)
    mask = np.ones(shape, bool)
    mask[H : H + N0, 128 + p : 128 + p + N1] = False
    assert np.max(np.abs(y2[mask])) == 0.0


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


CASES_3D = [
    (3, (12, 12, 12), 4),    # multi-tile planes
    (3, (12, 12, 12), None), # auto tiling (single tile at this size)
    (5, (10, 9, 11), 3),     # anisotropic node counts, one-sided bands
    (7, (9, 8, 10), None),
]


@pytest.mark.parametrize("p,cells,tile_planes", CASES_3D)
def test_3d_matches_xla_operator(p, cells, tile_planes):
    from gdm.ops.pallas_stencil2 import make_padded_laplace3

    grid = Grid(p, cells, (0.0, 0.0, 0.0), (1.0, 2.0, 1.5))
    f = laplace_apply_fn(grid, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    u = rng.standard_normal(grid.nodes)
    y_ref = np.asarray(f(jnp.asarray(u)))
    ap, pad, unpad, shape = make_padded_laplace3(
        grid, jnp.float64, tile_planes=tile_planes, interpret=True)
    y = np.asarray(unpad(ap(pad(jnp.asarray(u)))))
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-11)


@pytest.mark.parametrize("pipelined", [False, True])
@pytest.mark.parametrize("p,cells,tile_planes1", [
    (3, (12, 12, 12), 4),     # multi-tile
    (3, (12, 12, 12), None),  # auto tiling
    (5, (10, 9, 11), 3),      # anisotropic, one-sided bands
    (7, (9, 8, 10), None),
])
def test_3d_mxu_matches_xla_operator(p, cells, tile_planes1, pipelined):
    from gdm.ops.pallas_stencil2 import make_padded_laplace3_mxu

    grid = Grid(p, cells, (0.0, 0.0, 0.0), (1.0, 2.0, 1.5))
    f = laplace_apply_fn(grid, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    u = rng.standard_normal(grid.nodes)
    y_ref = np.asarray(f(jnp.asarray(u)))
    ap, pad, unpad, shape = make_padded_laplace3_mxu(
        grid, jnp.float64, tile_planes1=tile_planes1, interpret=True,
        pipelined=pipelined)
    y = np.asarray(unpad(ap(pad(jnp.asarray(u)))))
    # f32 hi/lo split of the plane-coupling matmul (same path as the
    # TPU bf16x3 scheme) costs ~1e-15 relative
    np.testing.assert_allclose(y, y_ref, rtol=2e-12, atol=2e-11)


def test_3d_mxu_padded_layout_closed_under_apply():
    from gdm.ops.pallas_stencil2 import make_padded_laplace3_mxu

    p = 3
    grid = Grid(p, (12, 12, 12), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    ap, pad, unpad, shape = make_padded_laplace3_mxu(
        grid, jnp.float64, tile_planes1=5, interpret=True)
    rng = np.random.default_rng(5)
    u = rng.standard_normal(grid.nodes)
    y2 = np.asarray(ap(ap(pad(jnp.asarray(u)))))
    mask = np.ones(shape, bool)
    N0, N1, N2 = grid.nodes
    N2p = _round_up(N2, 8)
    Hg = p * N2p + _round_up(p, 8)
    blk = mask[Hg : Hg + N1 * N2p].reshape(N1, N2p, shape[1])
    blk[:, :N2, p : p + N0] = False
    assert np.max(np.abs(y2[mask])) == 0.0
    f = laplace_apply_fn(grid, dtype=jnp.float64)
    y_ref = np.asarray(f(f(jnp.asarray(u))))
    got = (y2[Hg : Hg + N1 * N2p].reshape(N1, N2p, -1)[:, :N2, p : p + N0]
           .transpose(2, 0, 1))
    np.testing.assert_allclose(got, y_ref, rtol=1e-11, atol=1e-9)


def test_3d_padded_layout_closed_under_apply():
    from gdm.ops.pallas_stencil2 import make_padded_laplace3

    p = 3
    grid = Grid(p, (12, 12, 12), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    ap, pad, unpad, shape = make_padded_laplace3(
        grid, jnp.float64, tile_planes=5, interpret=True)
    rng = np.random.default_rng(3)
    u = rng.standard_normal(grid.nodes)
    y2 = np.asarray(ap(ap(pad(jnp.asarray(u)))))
    # everything outside the data block must be exactly zero
    mask = np.ones(shape, bool)
    N0, N1, N2 = grid.nodes
    N1p = _round_up(N1, 8)
    Hg = (p + 1) * N1p
    blk = mask[Hg : Hg + N0 * N1p].reshape(N0, N1p, shape[1])
    blk[:, :N1, p : p + N2] = False
    assert np.max(np.abs(y2[mask])) == 0.0
    f = laplace_apply_fn(grid, dtype=jnp.float64)
    y_ref = np.asarray(f(f(jnp.asarray(u))))
    got = y2[Hg : Hg + N0 * N1p].reshape(N0, N1p, -1)[:, :N1, p : p + N2]
    np.testing.assert_allclose(got, y_ref, rtol=1e-12, atol=1e-9)
