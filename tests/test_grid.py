import numpy as np
import pytest

from gdm.grid import Grid, categories_1d, offsets_1d


def brute_force_offset(i, n, p):
    # reference include/gdm/system.h:209-216
    return 0 if i < p // 2 else min(n, i + p // 2 + 1) - p


def brute_force_category(i, n, p):
    # reference include/gdm/system.h:415-420
    if i < p // 2:
        return i
    if i < n - p // 2:
        return p // 2
    return p + i - n


@pytest.mark.parametrize("p", [1, 3, 5, 7, 9])
@pytest.mark.parametrize("n", [10, 11, 40])
def test_offsets_categories(p, n):
    if n < p:
        pytest.skip("too few cells")
    off = offsets_1d(n, p)
    cat = categories_1d(n, p)
    for i in range(n):
        assert off[i] == brute_force_offset(i, n, p)
        assert cat[i] == brute_force_category(i, n, p)
        assert cat[i] == i - off[i]
        assert 0 <= off[i] and off[i] + p <= n


def brute_force_windows(grid: Grid):
    """Direct transcription of the reference dof-window loop
    (system.h:196-246) for validation."""
    p = grid.degree
    dim = grid.dim
    n = grid.cells
    N = grid.nodes
    out = []
    for cell in range(grid.n_cells):
        # cell index -> per-axis indices, axis 0 fastest
        rem = cell
        idx = []
        for d in range(dim):
            idx.append(rem % n[d])
            rem //= n[d]
        offs = [brute_force_offset(idx[d], n[d], p) for d in range(dim)]
        dofs = []
        # local dofs axis-0-fastest
        loc = [0] * dim
        for flat in range((p + 1) ** dim):
            rem = flat
            for d in range(dim):
                loc[d] = rem % (p + 1)
                rem //= p + 1
            node = 0
            stride = 1
            for d in range(dim):
                node += (offs[d] + loc[d]) * stride
                stride *= N[d]
            dofs.append(node)
        out.append(dofs)
    return np.array(out, dtype=np.int32)


@pytest.mark.parametrize(
    "p,cells",
    [(1, (5,)), (3, (7,)), (3, (5, 4)), (5, (6, 7)), (3, (4, 5, 6))],
)
def test_cell_windows(p, cells):
    grid = Grid(p, cells, (0.0,) * len(cells), (1.0,) * len(cells))
    np.testing.assert_array_equal(grid.cell_windows, brute_force_windows(grid))


def test_reference_vector_roundtrip():
    grid = Grid(3, (4, 5), (0.0, 0.0), (1.0, 1.0), n_components=2)
    rng = np.random.default_rng(0)
    f = rng.normal(size=grid.field_shape)
    v = grid.to_reference_vector(f)
    np.testing.assert_array_equal(grid.from_reference_vector(v), f)
    # spot-check the numbering: dof of node (i0,i1), comp c
    # = (i0 + i1*N0)*C + c   (reference system.h:242-244, fe.h:361-390)
    N0 = grid.nodes[0]
    assert v[(2 + 3 * N0) * 2 + 1] == f[2, 3, 1]


def test_category_ids_base_p():
    grid = Grid(3, (5, 6), (0.0, 0.0), (1.0, 1.0))
    p = 3
    cid = grid.cell_category_ids.reshape(6, 5)  # (c1, c0) row-major
    cat0 = categories_1d(5, p)
    cat1 = categories_1d(6, p)
    expect = cat0[None, :] + p * cat1[:, None]
    np.testing.assert_array_equal(cid, expect)
