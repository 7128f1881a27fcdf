"""Golden tests for the wave application against the reference's
committed app regression outputs (applications/wave/tests/*.output).

Each output is a sequence of postprocess rows
    counter  time  L2  L1  Linf
(composite runs interleave inside/outside rows).  After the
ghost-penalty-counting fix these match the reference to nearly all
printed digits; tolerances below leave room for 2D cut-quadrature
flavor differences (~1e-6 relative).
"""

import re

import numpy as np
import pytest

import jax

from gdm.problems.wave import WaveProblem, make_preset

REF = "/root/reference/applications/wave/tests"

import pytest as _pytest
from conftest import reference_available

pytestmark = _pytest.mark.skipif(
    not reference_available(), reason="reference goldens not mounted")



def parse_rows(path, n_slots=1):
    rows = {s: [] for s in range(n_slots)}
    pat = re.compile(r"^\s*(\d+)\s+([\d.]+)\s+([\d.e+-]+)\s+([\d.e+-]+)\s+([\d.e+-]+)\s*$")
    i = 0
    with open(path) as f:
        for line in f:
            m = pat.match(line)
            if not m:
                continue
            vals = [float(x) for x in m.groups()]
            rows[i % n_slots].append(vals)
            i += 1
    return rows


CASES = [
    # (output file, preset, dim, n_slots, rtol_l2, rtol_linf)
    ("step85_0.output", "step85", 2, 1, 1e-4, 1e-4),
    ("heat_0.output", "heat-impl", 1, 1, 1e-6, 1e-6),
    ("heat_1.output", "heat-rk", 1, 1, 1e-6, 1e-6),
    ("heat_composite_0.output", "heat-composite", 1, 2, 1e-6, 1e-6),
    ("wave_0.output", "wave", 1, 1, 1e-6, 1e-6),
    ("wave_1.output", "wave", 2, 1, 1e-5, 1e-4),
    ("wave_composite_0.output", "wave-composite", 1, 2, 1e-6, 1e-6),
]


# sharp SELF-pins for the 2D cases whose golden comparison is held at
# cut-quadrature-flavor tolerance (1e-4/1e-5 above): the framework's own
# values are reproducible to ~1e-10, so regressions inside that band are
# still caught.  (The Q1-gap arbiter, tests/test_cut_poisson01_arbiter.py,
# establishes with an independent integrator that our discrete values are
# correct to 7 digits; the residual 2D golden gap is reference-flavor.)
SELF_PINS = {
    # preset, dim -> final-row (L2, L1, Linf)
    ("step85", 2): (8.520111925432e-09, 3.946037221257e-09,
                    8.594071831958e-08),
    ("wave", 2): (2.796609356852e-04, 3.862759100516e-04,
                  9.791219478579e-04),
}


@pytest.mark.parametrize("runner", ["run", "run_scan"])
@pytest.mark.parametrize(
    "output,preset,dim,n_slots,rtol_l2,rtol_linf",
    CASES,
    ids=[c[0].split(".")[0] for c in CASES],
)
def test_wave_app_golden(output, preset, dim, n_slots, rtol_l2, rtol_linf,
                         runner):
    if runner == "run_scan" and preset == "step85":
        pytest.skip("poisson run_scan delegates to run()")
    golden = parse_rows(f"{REF}/{output}", n_slots)
    params = make_preset(preset, dim)
    prob = WaveProblem(params, verbose=False)
    getattr(prob, runner)()
    for slot in range(n_slots):
        grows = golden[slot]
        mrows = prob.rows[slot]
        assert len(mrows) == len(grows), (len(mrows), len(grows))
        for (gc, gt, gl2, gl1, gli), (mc, mt, ml2, ml1, mli) in zip(grows, mrows):
            assert gc == mc
            np.testing.assert_allclose(mt, gt, atol=5e-6)
            np.testing.assert_allclose(ml2, gl2, rtol=rtol_l2)
            np.testing.assert_allclose(ml1, gl1, rtol=rtol_l2)
            np.testing.assert_allclose(mli, gli, rtol=rtol_linf)
    if (preset, dim) in SELF_PINS and n_slots == 1:
        # rtol 1e-5, not tighter: XLA:CPU codegen differs across host
        # CPUs at the ~1e-6 level on these trajectories
        np.testing.assert_allclose(
            prob.rows[0][-1][2:5], SELF_PINS[(preset, dim)], rtol=1e-5)
