"""WaveProblem.run_scan (chunked lax.scan device loop) must reproduce
run() (per-step Python loop) row-for-row across every simulation type:
heat-rk, heat-impl, wave-rk, and the composite variants (reference loops
problem.h:72-128, 210-279, 280-346, 129-209, 347-435)."""

import numpy as np
import pytest

from gdm.problems.wave import WaveProblem, make_preset


def _rows_close(a, b, rtol=1e-10):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0]
        np.testing.assert_allclose(ra[1:], rb[1:], rtol=rtol, atol=1e-16)


def _shorten(params, n_steps):
    dt = params.cfl * ((params.geometry_right - params.geometry_left)
                       / params.n_subdivisions_1D) ** params.cfl_pow
    params.end_t = params.start_t + n_steps * dt


CASES = [
    ("heat-rk", 1, False),
    ("heat-impl", 1, False),
    ("wave", 1, False),
    ("heat-composite", 1, True),
    ("wave-composite", 1, True),
]


@pytest.mark.parametrize("preset,dim,composite", CASES,
                         ids=[c[0] for c in CASES])
def test_scan_matches_python_loop(preset, dim, composite):
    params = make_preset(preset, dim)
    params.n_subdivisions_1D = 20
    _shorten(params, 5)
    rows_py = WaveProblem(params, verbose=False).run()
    prob = WaveProblem(params, verbose=False)
    rows_scan = prob.run_scan(chunk=3)  # exercises the chunk boundary
    for slot in range(2 if composite else 1):
        _rows_close(rows_py[slot], rows_scan[slot])
    assert prob.final_solution is not None


def test_scan_heat_impl_final_short_step():
    """The shortened final step (traced dt inside the scan vs the host
    dt of the rebuild path in run()) must agree."""
    params = make_preset("heat-impl", 1)
    params.n_subdivisions_1D = 20
    dt = params.cfl * (2.42 / 20)
    params.end_t = params.start_t + 3.5 * dt  # forces a partial last step
    rows_py = WaveProblem(params, verbose=False).run()
    rows_scan = WaveProblem(params, verbose=False).run_scan()
    _rows_close(rows_py[0], rows_scan[0])
