"""Kill + resume of a chunked run_scan trajectory (the long-run story
of scripts/run_composite_dod.py): a run interrupted mid-horizon and
re-launched with the same checkpoint path must reproduce the
uninterrupted trajectory row-for-row."""

import os

import numpy as np

from gdm.problems.advection import (AdvectionProblem, composite_app_case,
                                    convergence_case)


def _mini_composite():
    params = composite_app_case()
    params.n_subdivisions_1D = 12
    params.fe_degree = 3
    params.end_t = 6 * (2.0 / 12) * 0.2 / 4.0  # 6 steps
    return params


def test_composite_resume_reproduces_rows(tmp_path):
    ck = str(tmp_path / "run.ckpt")
    rows_full = AdvectionProblem(_mini_composite()).run_scan(chunk=2)

    # "killed" run: execute only the first 2 of 3 chunks by truncating
    # the horizon, checkpointing every chunk
    params = _mini_composite()
    params.end_t = 4 * (2.0 / 12) * 0.2 / 4.0  # first 4 steps
    AdvectionProblem(params).run_scan(chunk=2, checkpoint_path=ck)
    assert os.path.exists(ck)

    # resumed run over the FULL horizon picks up from the checkpoint
    # (next_s=4) and only executes the remaining chunk
    prob = AdvectionProblem(_mini_composite())
    rows_resumed = prob.run_scan(chunk=2, checkpoint_path=ck)

    for slot in (0, 1):
        assert len(rows_resumed[slot]) == len(rows_full[slot]) == 7
        for r0, r1 in zip(rows_full[slot], rows_resumed[slot]):
            assert r0[:2] == r1[:2]
            np.testing.assert_allclose(r1[2:], r0[2:], rtol=1e-12,
                                       atol=1e-16)


def test_single_resume_reproduces_rows(tmp_path):
    ck = str(tmp_path / "run1.ckpt")
    params = convergence_case(3, 10, 0.4, 0.0, 5.0)
    params.end_t = 6 * (1.0 / 10) * 0.4 / 2.0  # 6 steps
    rows_full = AdvectionProblem(params).run_scan(chunk=2)

    p2 = convergence_case(3, 10, 0.4, 0.0, 5.0)
    p2.end_t = 4 * (1.0 / 10) * 0.4 / 2.0
    AdvectionProblem(p2).run_scan(chunk=2, checkpoint_path=ck)

    rows_resumed = AdvectionProblem(params).run_scan(
        chunk=2, checkpoint_path=ck)
    assert len(rows_resumed[0]) == len(rows_full[0]) == 7
    for r0, r1 in zip(rows_full[0], rows_resumed[0]):
        np.testing.assert_allclose(r1[1:], r0[1:], rtol=1e-12, atol=1e-16)
