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
        from gdm.problems.wave import write_solution_vtu
        from gdm.cut.geometry import INSIDE, OUTSIDE

        write_solution_vtu(problem, "solution_i_final.vtu", INSIDE)
        print("wrote solution_i_final.vtu")
        if params.composite:
            write_solution_vtu(problem, "solution_o_final.vtu", OUTSIDE)
            print("wrote solution_o_final.vtu")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
