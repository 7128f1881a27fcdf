"""Execute the sharded shard_map+ppermute programs on the REAL TPU.

Every multi-chip claim so far rests on the virtual 8-CPU-device mesh
(tests/test_distributed*.py, MULTICHIP_r*.json); this script closes the
hardware gap the round-4 review named: whether the composition
"banded applies inside shard_map + ppermute, compiled by the TPU
toolchain" compiles and executes AT ALL on the chip, and what the
sharding machinery costs relative to the unsharded program.  It runs
the three sharded paths on a 1-device jax.sharding.Mesh on the real
chip, asserts parity against the unsharded programs, times the sharded
vs. unsharded applies, and commits the evidence to
tests/data/tpu_sharded.json (validated by
tests/test_tpu_sharded_artifact.py).

Reference counterpart: the MPI path the reference's own test harness
executes (tests/poisson_02_gdm.mpirun=3.output; partitioner at
applications/wave/include/gdm/wave/discretization.h:104-107).

Run with the environment UNTOUCHED (plain `python`, axon relay), one
TPU job at a time.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "tpu_sharded.json")


def rel_diff(a, b):
    a = np.asarray(a, np.float64).reshape(-1)
    b = np.asarray(b, np.float64).reshape(-1)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


def main():
    import jax
    import jax.numpy as jnp

    from bench import timed_chain
    from gdm.dist.mesh import device_mesh
    from gdm.grid import Grid

    platform = jax.devices()[0].platform
    assert platform in ("tpu", "axon") or "--allow-cpu" in sys.argv, (
        f"needs the real chip, got {platform}")
    mesh = device_mesh(1)
    out = {"platform": platform, "n_devices": 1, "legs": {}}

    # ---- leg 1: sharded uncut Poisson (shard_map + ppermute CG) --------
    from gdm import operators, solvers
    from gdm.constraints import Constraints
    from gdm.dist import poisson as dpoisson
    from gdm.functional import load_vector

    grid = Grid(3, (63, 63), (0.0, 0.0), (1.0, 1.0))
    rhs = lambda m, c: np.ones_like(m[0])  # noqa: E731
    t0 = time.time()
    u_sh, info = dpoisson.solve(grid, rhs, mesh, mode="shard_map",
                                rel_tol=1e-6, max_iter=400)
    u_sh.block_until_ready()
    wall_sh = time.time() - t0

    A = operators.laplace(grid)
    cons = Constraints.zero_boundary(grid)
    b = cons.constrain_rhs(load_vector(grid, rhs))
    diag = jnp.where(jnp.asarray(cons.full_mask), 1.0,
                     jnp.asarray(A.diagonal()))

    @jax.jit
    def serial(b, diag):
        pre = solvers.jacobi_preconditioner(diag)
        x, _ = solvers.cg(cons.constrain_operator(A.apply), b, precond=pre,
                          max_iter=400, rel_tol=1e-6)
        return cons.finalize_solution(x)

    u_ser = serial(b, diag)
    out["legs"]["poisson_shard_map"] = {
        "grid": "63^2 p3", "iterations": int(info["iterations"]),
        "rel_diff_vs_serial": rel_diff(u_sh, u_ser),
        "wall_s_incl_compile": wall_sh,
    }
    print("leg1 poisson:", out["legs"]["poisson_shard_map"], flush=True)

    # ---- leg 2: sharded CUT stencil apply (ppermute halo) --------------
    from gdm.cut.geometry import INSIDE, CutGeometry
    from gdm.cut.operators import CutOperators
    from gdm.cut.stencil import assemble_stencil
    from gdm.dist.cut import sharded_stencil_apply

    g2 = Grid(3, (48, 48), (-1.21, -1.21), (1.21, 1.21))
    geo = CutGeometry.build(
        g2, lambda m: np.sqrt(sum(x**2 for x in m)) - 1.0, 3)
    op = CutOperators(geo, INSIDE)
    st = assemble_stencil(op, "mass", 0.25 * np.sqrt(3.0))
    ap_sh = sharded_stencil_apply(st, mesh)
    ap_se = jax.jit(st.apply)
    v = jnp.asarray(np.random.default_rng(0).standard_normal(
        g2.n_nodes), jnp.float32)
    y_sh = ap_sh(v)
    y_se = ap_se(v)
    dt_sh = timed_chain(lambda u: ap_sh(u) * (1.0 - 1e-6), v)
    dt_se = timed_chain(lambda u: ap_se(u) * (1.0 - 1e-6), v)
    out["legs"]["cut_stencil_shard_map"] = {
        "grid": "48^2 p3 cut mass",
        "rel_diff_vs_serial": rel_diff(y_sh, y_se),
        "apply_s_sharded": dt_sh, "apply_s_serial": dt_se,
        "sharded_overhead_1dev": dt_sh / dt_se,
    }
    print("leg2 cut stencil:", out["legs"]["cut_stencil_shard_map"],
          flush=True)

    # ---- leg 3: sharded cut-wave run (mass CG + stiffness, 3 steps) ----
    from gdm.problems.wave import WaveProblem, make_preset

    pw = make_preset("wave", 2)
    pw.n_subdivisions_1D = 40
    pw.end_t = pw.start_t + 3 * pw.cfl * (2.42 / 40)
    rows_sh = WaveProblem(pw, verbose=False, mesh=mesh).run()
    rows_se = WaveProblem(pw, verbose=False).run()
    d = max(abs(a[2] - b_[2]) / max(abs(b_[2]), 1e-30)
            for a, b_ in zip(rows_sh[0], rows_se[0]))
    out["legs"]["cut_wave_sharded_run"] = {
        "grid": "40^2 p3, 3 RK4 steps",
        "rows": [[float(x) for x in r] for r in rows_sh[0]],
        "max_rel_row_diff_vs_serial": d,
    }
    print("leg3 cut wave:", d, flush=True)

    # ---- leg 4: sharded composite advection through run_scan -----------
    from gdm.problems.advection import AdvectionProblem, composite_app_case

    pa = composite_app_case()
    pa.n_subdivisions_1D = 16
    pa.fe_degree = 3
    dxa = 2.0 / 16
    pa.end_t = 2 * dxa * pa.cfl / pa.max_val
    rows_ash = AdvectionProblem(pa, mesh=mesh).run_scan()
    rows_ase = AdvectionProblem(pa).run_scan()
    da = max(abs(a[2] - b_[2]) / max(abs(b_[2]), 1e-30)
             for s in (0, 1) for a, b_ in zip(rows_ash[s], rows_ase[s]))
    out["legs"]["composite_advection_sharded_scan"] = {
        "grid": "16^2 p3 composite, 2 RK4 steps",
        "max_rel_row_diff_vs_serial": da,
    }
    print("leg4 composite advection:", da, flush=True)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
