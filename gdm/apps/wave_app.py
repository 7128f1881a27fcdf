"""CLI parity with the reference wave-app (applications/wave/wave-app.cc):

    python -m gdm.apps.wave_app <dim> <simulation>     # step85|heat|heat-rk|
                                                       # heat-impl|heat-composite|
                                                       # wave|wave-composite
    python -m gdm.apps.wave_app params.json            # {"simulation name": ..,
                                                       #  "dim": ..}

Optional: --vtu writes solution_{i,o}_<step>.vtu files per postprocess
step like the reference's DataOut path.
"""

from __future__ import annotations

import json
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    write_vtu = "--vtu" in argv
    if write_vtu:
        argv.remove("--vtu")

    if len(argv) == 1 and argv[0].endswith(".json"):
        with open(argv[0]) as f:
            cfg = json.load(f)
        dim = int(cfg["dim"])
        name = cfg["simulation name"]
    elif len(argv) == 2:
        dim = int(argv[0])
        name = argv[1]
    else:
        print("Usage: python -m gdm.apps.wave_app dim simulation")
        print("       python -m gdm.apps.wave_app file.json")
        return 1

    import jax

    jax.config.update("jax_enable_x64", True)

    from gdm.problems.wave import WaveProblem, make_preset

    params = make_preset(name, dim)
    problem = WaveProblem(params, verbose=True)
    problem.run()

    if write_vtu:
        import numpy as np

        from gdm.io import DataOut
        from gdm.cut.geometry import OUTSIDE

        # final-state output mirroring problem.h:617-657
        u = problem.interpolate_exact(params.end_t)
        out = DataOut(problem.grid, params.output_fe_degree)
        out.add_data_vector(np.asarray(u), "analytical_solution")
        out.add_cell_data(
            np.zeros(problem.grid.n_cells), "ranks")
        out.set_cell_selection(problem.geo.locations_flat != OUTSIDE)
        out.write_vtu("solution_i_final.vtu")
        print("wrote solution_i_final.vtu")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
