"""CLI parity with applications/advection/advection-app.cc: the composite
two-domain cut advection run ("DoD stabilization" setup: plane interface,
velocities (3,1)/(1,2), p=5, 200^2 cells).

    python -m gdm.apps.advection_app [--quick]

--quick shrinks the run (p=3, 50^2, t_end=0.05) for smoke testing.
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    quick = "--quick" in argv

    import jax

    jax.config.update("jax_enable_x64", True)

    from gdm.io import ConvergenceTable
    from gdm.problems.advection import AdvectionProblem, composite_app_case

    params = composite_app_case()
    if quick:
        params.fe_degree = 3
        params.n_subdivisions_1D = 50
        params.end_t = 0.05
    prob = AdvectionProblem(params, verbose=True)
    prob.run()

    table = ConvergenceTable()
    for slot in (0, 1):
        r = prob.rows[slot][-1]
        table.add_value("block", slot)
        for key, val in [("error_2", r[2]), ("error_1", r[3]),
                         ("error_inf", r[4]), ("error_2_face", r[5]),
                         ("error_1_face", r[6]), ("error_inf_face", r[7])]:
            table.add_value(key, val)
            table.set_scientific(key, True)
    table.write_text()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
