"""Compute the CPU-x64 oracle rows for the TPU goldens cases that have
no reference .output file, and commit them to
tests/data/cpu_oracle_rows.json.

Cases (matching scripts/run_tpu_goldens.py's round-5 extensions):
  adv_conv_p3_40_rot5 : the advection-convergence golden row
      (fe 3, cfl 0.4, 40^2, rot 5/5 — reference oracle exists at
      applications/advection/tests/test_01.output:2; recomputed here as
      a cross-check of the x64 implementation against that golden)
  heat_deformed_1d : the multichip-gate deformed-cut heat config
      (heat-impl preset dim 1, n=40, sin vertex deformation)
  heat_impl_3d : the 3D cut implicit-heat pin config
      (tests/test_cut_3d_heat.py)

Run with the sanitized env:  dev/py scripts/make_cpu_oracles.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "cpu_oracle_rows.json")


def heat_deformed_params():
    from gdm.problems.wave import make_preset

    p = make_preset("heat", 1)
    p.n_subdivisions_1D = 40
    p.end_t = p.start_t + 0.02
    p.mapping_q_cache_function = lambda pts: (
        np.asarray(pts, float)
        + 0.04 * np.sin(np.pi * np.asarray(pts, float) / 1.21))
    return p


def heat_3d_params():
    import jax.numpy as jnp

    from gdm.problems import wave

    p = wave.WaveParams(dim=3)
    p.simulation_type = "heat-impl"
    p.fe_degree = 3
    p.n_subdivisions_1D = 8
    p.ghost_parameter_M = 0.75
    p.ghost_parameter_A = 1.5
    p.nitsche_parameter = 15.0
    p.level_set_function = wave.sphere_signed_distance
    p.cfl = 0.3
    p.cfl_pow = 1.0
    p.end_t = 0.1

    def g(pts, t):
        return (pts[..., 0] ** 2 * pts[..., 1] ** 2 * pts[..., 2] ** 2
                * jnp.exp(-t))

    def f(pts, t):
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        return (-(x * y * z) ** 2
                - 2 * (y * y * z * z + x * x * z * z + x * x * y * y)
                ) * jnp.exp(-t)

    p.function_interface_dbc = g
    p.function_rhs = f
    p.exact_solution = g
    return p


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    assert jax.devices()[0].platform == "cpu", "run via dev/py (CPU env)"
    from gdm.problems.advection import AdvectionProblem, convergence_case
    from gdm.problems.wave import WaveProblem

    out = {}

    prob = AdvectionProblem(convergence_case(3, 40, 0.4, 0.0, 1.0))
    prob.run_scan()
    out["adv_conv_p3_40_rot5"] = {
        "final_row": [float(v) for v in prob.rows[0][-1]],
        "reference_golden": "advection/tests/test_01.output:2",
    }
    print("adv row:", out["adv_conv_p3_40_rot5"]["final_row"], flush=True)

    prob = WaveProblem(heat_deformed_params(), verbose=False)
    prob.run_scan()
    out["heat_deformed_1d"] = {
        "rows": [[float(v) for v in r] for r in prob.rows[0]]}
    print("heat_deformed rows:", len(out["heat_deformed_1d"]["rows"]),
          flush=True)

    prob = WaveProblem(heat_3d_params(), verbose=False)
    prob.run_scan()
    out["heat_impl_3d"] = {
        "rows": [[float(v) for v in r] for r in prob.rows[0]]}
    print("heat_3d rows:", len(out["heat_impl_3d"]["rows"]), flush=True)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
