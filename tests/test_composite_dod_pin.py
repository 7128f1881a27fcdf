"""Regression pin for the composite "DoD stabilization" app case run to
completion (reference applications/advection/advection-app.cc:86-154:
p=5, 200^2, plane interface at 135 deg, velocities (3,1)/(1,2), cfl=0.2,
end_t=0.6 = 1200 RK4 steps with two mass-CG solves per stage).

The reference repo ships NO output for this configuration; the committed
artifact tests/data/composite_dod_rows.txt is OUR full-horizon TPU (f32,
mass CG to 1e-6 with the cut-window Schwarz preconditioner) trajectory,
produced by scripts/run_composite_dod.py.  This test validates the
artifact's invariants so any regeneration that diverges, oscillates, or
loses domain-1 cleanliness fails loudly.  (An f64 CPU check of the first
steps and the scan==loop equivalence live in test_advection_scan.py and
the run_scan machinery tests.)
"""

import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data",
                    "composite_dod_rows.txt")

pytestmark = pytest.mark.skipif(
    not os.path.exists(DATA), reason="trajectory artifact not present")


@pytest.fixture(scope="module")
def rows():
    a = np.array([
        [float(x) for x in line.split()]
        for line in open(DATA) if not line.startswith("#")])
    return {int(s): a[a[:, 0] == s][:, 1:] for s in (0, 1)}


def test_full_horizon_covered(rows):
    for s in (0, 1):
        assert rows[s].shape == (1201, 8)
        assert rows[s][-1, 1] == pytest.approx(0.6, abs=1e-9)
        assert np.isfinite(rows[s]).all()


def test_domain0_stable_and_bounded(rows):
    # the cone advects out of domain 0; the L2 "error" vs the static
    # exact peaks during transit and settles — never approaching the
    # divergence guard (err < 1.0)
    e2 = rows[0][:, 2]
    assert e2.max() < 0.12
    assert 0.05 < e2[-1] < 0.08
    # settled: last quarter varies by < 1% relative
    tail = e2[900:]
    assert np.ptp(tail) / tail[-1] < 0.01


def test_domain1_transit_and_settle(rows):
    # domain 1 sits at solver-noise scale until the cone (advected in
    # domain 0 at velocity (3,1)) reaches the interface around t~0.15,
    # transits through the upwind interface coupling, and settles; any
    # exponential growth in the early window means the mass solves are
    # injecting energy again (the pre-Schwarz f32 run went NaN by
    # step 8)
    e2 = rows[1][:, 2]
    assert e2[:100].max() < 1e-8          # pre-transit noise floor
    assert e2.max() < 0.06                # bounded transit
    assert 0.05 < e2[-1] < 0.06           # settled
    assert np.ptp(e2[900:]) / e2[-1] < 0.01
