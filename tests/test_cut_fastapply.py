"""The split (separable-Kronecker + interface-correction) cut apply
must equal the stencil-band apply to roundoff, for every operator kind
and through both the XLA and the fused-Pallas separable paths."""

import numpy as np
import pytest
import jax.numpy as jnp

from gdm.grid import Grid
from gdm.cut.geometry import INSIDE, OUTSIDE, CutGeometry
from gdm.cut.operators import CutOperators
from gdm.cut.stencil import StencilOperator, assemble_stencil
from gdm.cut.fastapply import kron_pairs, make_fast_cut_apply

LS = lambda m: np.sqrt(sum(np.asarray(x) ** 2 for x in m)) - 1.0  # noqa


def _op(n=24, p=3, location=INSIDE):
    grid = Grid(p, (n, n), (-1.21, -1.21), (1.21, 1.21))
    geo = CutGeometry.build(grid, LS, p)
    return grid, CutOperators(geo, location)


@pytest.mark.parametrize("kind,kwargs", [
    ("mass", dict(gamma=0.25 * np.sqrt(3.0))),
    ("stiff", dict(gamma=0.5, nitsche_gamma=15.0, with_nitsche=True)),
])
@pytest.mark.parametrize("p", [3, 5])
def test_split_matches_band_apply(kind, kwargs, p):
    grid, op = _op(p=p)
    st = assemble_stencil(op, kind, **kwargs)
    pairs = kron_pairs(grid, kind)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(grid.n_nodes))
    y_ref = np.asarray(st.apply(u))
    fast = make_fast_cut_apply(st, op, pairs, use_pallas="never")
    np.testing.assert_allclose(np.asarray(fast(u)), y_ref,
                               rtol=1e-11, atol=1e-11)


def test_split_heat_impl_matches():
    grid, op = _op()
    dt = 0.3 * 2.42 / 24
    m = assemble_stencil(op, "mass", 0.75)
    s = assemble_stencil(op, "stiff", 1.5, 15.0, with_nitsche=True,
                         inactive_identity=False)
    st = StencilOperator(grid, m.band_host + dt * s.band_host, m.radius)
    pairs = kron_pairs(grid, "heat_impl", dt=dt)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(grid.n_nodes))
    fast = make_fast_cut_apply(st, op, pairs, use_pallas="never")
    np.testing.assert_allclose(np.asarray(fast(u)),
                               np.asarray(st.apply(u)),
                               rtol=1e-11, atol=1e-11)


def test_split_outside_location():
    grid, op = _op(location=OUTSIDE)
    st = assemble_stencil(op, "mass", 0.5)
    fast = make_fast_cut_apply(st, op, kron_pairs(grid, "mass"),
                               use_pallas="never")
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal(grid.n_nodes))
    np.testing.assert_allclose(np.asarray(fast(u)),
                               np.asarray(st.apply(u)),
                               rtol=1e-11, atol=1e-11)


def test_split_through_pallas_kernel():
    """The separable part through the fused kernel (interpret mode),
    exercising the generalized bands= parameter."""
    grid, op = _op(n=20)
    st = assemble_stencil(op, "stiff", 0.5, 15.0, with_nitsche=True)
    fast = make_fast_cut_apply(st, op, kron_pairs(grid, "stiff"),
                               use_pallas="force", interpret=True,
                               rows="vpu", tile_r=32)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal(grid.n_nodes))
    np.testing.assert_allclose(np.asarray(fast(u)),
                               np.asarray(st.apply(u)),
                               rtol=1e-11, atol=1e-11)


def test_correction_set_is_small():
    """The custom-row set scales with the interface, not the area."""
    from gdm.cut.fastapply import _standard_mask

    counts = {}
    for n in (24, 48):
        grid, op = _op(n=n)
        standard = _standard_mask(op)
        custom = (~standard) & (~op.inactive)
        counts[n] = custom.sum()
    assert counts[48] < 3 * counts[24], counts


def test_generic_cutband_kernel_matches():
    """The streamed generic band kernel (pallas_cutband) in interpret
    mode equals the band apply — the fallback fast path for heavily cut
    geometries."""
    from gdm.ops.pallas_cutband import make_padded_stencil2

    grid, op = _op(n=20)
    st = assemble_stencil(op, "mass", 0.25 * np.sqrt(3.0))
    ap, pad, unpad, _ = make_padded_stencil2(st, jnp.float64, tile_r=16,
                                             interpret=True)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal(grid.n_nodes))
    y = np.asarray(unpad(ap(pad(u)))).reshape(-1)
    np.testing.assert_allclose(y, np.asarray(st.apply(u)),
                               rtol=1e-12, atol=1e-12)
