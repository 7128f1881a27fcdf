"""Execute the wave-family app goldens ON THE REAL TPU and commit the
error-row trajectories.

All golden validation in tests/ runs on CPU float64 (the conftest
sanitized env); this script puts hardware evidence behind the framework's
core claim — golden-matching physics on TPU through the PRODUCT dispatch
(fused Pallas cut kernels, f32/bf16x3 accuracy class, see
gdm/ops/fast.py) — by running the reference app presets

    heat_1.output   heat-rk  dim 1      wave_0.output  wave  dim 1
    wave_1.output   wave     dim 2      step85_0.output step85 dim 2
    heat_composite_0.output  heat-composite dim 1 (2 slots)
    wave_composite_0.output  wave-composite dim 1 (2 slots)

(reference oracles: /root/reference/applications/wave/tests/*.output)
on the chip and writing every postprocess row plus the per-case maximum
relative deviation from the CPU-x64 goldens to a JSON artifact.  The
committed copy (tests/data/tpu_wave_goldens.json) is pinned by
tests/test_tpu_goldens_artifact.py; the measured deviation class is
recorded in BASELINE.md.

Usage:  python scripts/run_tpu_goldens.py [out.json]
        (plain python = real TPU; runs in f32 — x64 is a CPU-only mode)
"""

import json
import re
import sys
import time

REF = "/root/reference/applications/wave/tests"

CASES = [
    # artifact key, reference output, preset, dim, n_slots
    ("heat_1", "heat_1.output", "heat-rk", 1, 1),
    ("wave_0", "wave_0.output", "wave", 1, 1),
    ("wave_1", "wave_1.output", "wave", 2, 1),
    ("step85_0", "step85_0.output", "step85", 2, 1),
    ("heat_composite_0", "heat_composite_0.output", "heat-composite", 1, 2),
    ("wave_composite_0", "wave_composite_0.output", "wave-composite", 1, 2),
]


def parse_rows(path, n_slots=1):
    """Composite outputs interleave inside/outside rows."""
    pat = re.compile(
        r"^\s*(\d+)\s+([\d.]+)\s+([\d.e+-]+)\s+([\d.e+-]+)\s+([\d.e+-]+)\s*$")
    rows = {s: [] for s in range(n_slots)}
    i = 0
    with open(path) as f:
        for line in f:
            m = pat.match(line)
            if m:
                rows[i % n_slots].append([float(x) for x in m.groups()])
                i += 1
    return rows


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tpu_wave_goldens.json"
    sys.path.insert(0, ".")
    import jax
    import numpy as np

    from gdm.problems.wave import WaveProblem, make_preset

    platform = jax.devices()[0].platform
    artifact = {"platform": platform,
                "x64": bool(jax.config.jax_enable_x64), "cases": {}}
    for key, output, preset, dim, n_slots in CASES:
        params = make_preset(preset, dim)
        if not jax.config.jax_enable_x64:
            # f32: the preset 1e-14 CG reduction is unreachable (the
            # implicit/poisson solves would spin to max_iter); 1e-6 is
            # the f32 floor
            params.solver_rel_tolerance = max(
                params.solver_rel_tolerance, 1e-6)
            params.solver_abs_tolerance = max(
                params.solver_abs_tolerance, 1e-12)
        prob = WaveProblem(params, verbose=False)
        t0 = time.time()
        if params.simulation_type == "poisson":
            prob.run()  # single solve; run_scan delegates here anyway
        else:
            prob.run_scan(chunk=64)
        wall = time.time() - t0
        golden = parse_rows(f"{REF}/{output}", n_slots)
        # two deviation summaries over the L2/L1/Linf columns:
        #   max_rel  — plain per-entry relative (blows up on rows whose
        #              norm is far below the trajectory scale: wave_0's
        #              oscillating L2 dips 1000x under its peak, where
        #              f32 noise dominates the RELATIVE measure)
        #   max_scaled — |m - g| / per-column golden max (deviation
        #              relative to the trajectory scale; the pinned one)
        slot_rows, dev, scaled = [], 0.0, 0.0
        for slot in range(n_slots):
            rows = [[float(v) for v in r] for r in prob.rows[slot]]
            g = golden[slot]
            assert len(rows) == len(g), (key, slot, len(rows), len(g))
            marr = np.array([r[2:5] for r in rows])
            garr = np.array([r[2:5] for r in g])
            dev = max(dev, float((np.abs(marr - garr) / np.abs(garr)).max()))
            scaled = max(scaled, float(
                (np.abs(marr - garr) / garr.max(axis=0)).max()))
            slot_rows.append(rows)
        artifact["cases"][key] = {
            "preset": preset, "dim": dim, "reference_output": output,
            "n_slots": n_slots,
            "rows": slot_rows[0] if n_slots == 1 else slot_rows,
            "max_rel_dev_vs_golden": dev,
            "max_scaled_dev_vs_golden": scaled, "wall_s": wall,
        }
        print(f"{key}: {sum(len(r) for r in slot_rows)} rows, "
              f"max rel dev {dev:.3e}, scaled {scaled:.3e}, {wall:.1f}s",
              flush=True)

    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
