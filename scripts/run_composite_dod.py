"""Run the composite "DoD stabilization" advection case to completion.

This is the advection-app's built-in configuration
(reference applications/advection/advection-app.cc:86-154): composite
two-domain cut advection, p=5, 200^2 cells, plane interface at 135deg,
velocities (3,1)/(1,2), cfl=0.2, end_t=0.6 (1200 RK4 steps, two mass-CG
solves per stage).  It writes the full per-step error-norm trajectory
(both domains, 6 columns each) to the given output file; the committed
copy (tests/data/composite_dod_rows.txt) is the regression pin checked
by tests/test_composite_dod_pin.py.

The whole horizon runs as ONE jitted lax.scan device program
(AdvectionProblem.run_scan) — on the TPU this is one compile + one
dispatch; the per-step Python loop (--python-loop) needs ~3 dispatches
per step and is only practical for --quick smoke runs.

Usage:  python scripts/run_composite_dod.py [out.txt] [--quick]
        (plain python = real TPU; dev/py = local CPU, hours)
"""

import sys
import time


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = args[0] if args else "composite_dod_rows.txt"
    quick = "--quick" in sys.argv
    python_loop = "--python-loop" in sys.argv

    sys.path.insert(0, ".")
    from gdm.problems.advection import AdvectionProblem, composite_app_case

    params = composite_app_case()
    if quick:
        params.end_t = 10 * 5e-4  # 10 steps
    import jax
    if not jax.config.jax_enable_x64:
        # f32 (TPU) run: the reference's 1e-14 reduction is unreachable
        # in f32 — CG would spin to max_iter every stage (and the
        # multi-minute single-program times crash the remote TPU relay).
        # 1e-6 is the f32 floor and ample for a trajectory pinned at
        # ~1e-3 accuracy.
        params.solver_rel_tolerance = 1e-6
        params.solver_max_iterations = 400
    prob = AdvectionProblem(params, verbose=quick)
    t0 = time.time()
    # chunk=32: the remote-TPU relay kills single programs much beyond
    # ~2-3 device-minutes; 32 steps x 8 preconditioned mass-CG solves
    # stays well under that.  Checkpoint after every chunk: a killed run
    # re-launched with the same arguments resumes mid-horizon.
    ckpt = None if python_loop else out_path + ".ckpt"
    rows = prob.run() if python_loop else prob.run_scan(
        chunk=32, checkpoint_path=ckpt)
    wall = time.time() - t0
    if ckpt is not None:
        import os

        if os.path.exists(ckpt):
            os.remove(ckpt)  # horizon complete; trajectory is in out_path
    with open(out_path, "w") as f:
        f.write("# composite DoD run (advection-app.cc config), "
                f"end_t={params.end_t}, wall_s={wall:.0f}\n")
        f.write("# slot counter time err2 err1 errinf face2 face1 faceinf\n")
        for slot in (0, 1):
            for r in rows[slot]:
                f.write(f"{slot} {r[0]} {r[1]:.6f} " +
                        " ".join(f"{x:.8e}" for x in r[2:]) + "\n")
    print(f"wrote {out_path} ({len(rows[0])}+{len(rows[1])} rows, "
          f"{wall:.0f}s)")


if __name__ == "__main__":
    main()
