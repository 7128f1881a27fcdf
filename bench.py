"""Benchmark: matrix-free GDM stiffness matvec throughput (DoF/s) and CG
Poisson solves at 1024^2, degree 3, float32, on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured DoF/s divided by the target of
/root/repo/BASELINE.json: 70% of the HBM roofline for an ideal
(read-u + write-y) sweep on TPU v5e (819 GB/s -> 102.4 GDoF/s ideal,
71.7 GDoF/s target).

Timing methodology (important): under this environment's remote-TPU
relay, ``block_until_ready()`` returns at dispatch-ACK time, NOT at
execution completion, so wall-clocking a dispatched call measures queue
noise (round 1's 14.1 GDoF/s was such an artifact).  Every measurement
here instead (a) chains K applications inside ONE jitted
``lax.fori_loop`` whose scalar reduction is forced to the host
(``float(...)`` round-trip = true completion), and (b) reports the
differential (t(4K) - t(K)) / 3K over min-of-trials with K grown until
the 4K chain takes >= 0.25 s, which cancels the ~30 ms host round-trip,
its variance, AND per-program dispatch overhead (see timed_chain).
Validated against known-cost primitives (8192^2 elementwise pass:
599 GB/s; 8192^3 f32 HIGHEST matmul: 30.7 Tflop/s; DEFAULT:
146 Tflop/s).

Note sizes <= 2048^2 run with the loop state VMEM-resident (XLA keeps
the carried array on-chip), which is the true steady state of solver
inner loops at those sizes; 4096^2 (134 MB of state) is the honest
HBM-streaming regime.
"""

import json
import time

import numpy as np

HBM_BYTES_PER_S = 819e9  # TPU v5e
IDEAL_BYTES_PER_DOF = 8  # read u (f32) + write y (f32)
TARGET_FRACTION = 0.70

# Measured compute ceiling for this operator shape on v5e (BASELINE.md
# "The measured ceiling (round 3)"): the stripped mxu3p column stage
# alone costs 20.3 us/MDoF at 1024^2 p=3 (benchmarks/mxu_micro.py
# roll_ceiling), so no composition that keeps the 1D transforms exact
# exceeds ~49.3 GDoF/s — the operator is VPU-pass-throughput bound, not
# HBM bound, and vs_baseline's 71.7 GDoF/s bandwidth target is
# unphysical here.  vs_measured_ceiling reports value / this bound.
MEASURED_CEILING_DOF_PER_S = 1e6 / 20.3e-6


def timed_chain(apply_fn, u, dt_hint=None, trials=4, target_s=0.25):
    """Differential host-synced timing of one application of apply_fn.

    Chains K apps in one jitted fori_loop ending in a host-forced scalar
    and returns (t_min(4K) - t_min(K)) / (3K), growing K until the 4K
    chain takes >= target_s.  Differencing two LARGE chains cancels both
    the ~30 ms host round-trip AND per-program dispatch overhead; the
    earlier (t(K) - t(1))/(K-1) form was biased by several ms of extra
    overhead on the K=1 program, which at small K inflated rates by up
    to several-fold (a k=1600/6400 sweep on the 2D kernel shows t(K) =
    30 ms + K*33 us while t(1) alone is 37 ms).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(u, k):
        y = jax.lax.fori_loop(0, k, lambda i, v: apply_fn(v), u)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(y))

    K = 64
    if dt_hint is not None:
        K = int(max(64, target_s / max(dt_hint, 1e-9) / 4))
    while True:
        float(run(u, K))       # compile
        float(run(u, 4 * K))   # compile
        t0 = time.time()
        float(run(u, 4 * K))
        t4 = time.time() - t0
        if t4 >= target_s or K >= 65536:
            break
        K = min(65536, K * max(2, int(target_s / max(t4, 1e-9))))
    tKs, t4s = [], []
    for _ in range(trials):
        t0 = time.time()
        float(run(u, K))
        tKs.append(time.time() - t0)
        t0 = time.time()
        float(run(u, 4 * K))
        t4s.append(time.time() - t0)
    return (min(t4s) - min(tKs)) / (3 * K)


def _sharded_overhead():
    """1-device sharding overhead of the shard_map+ppermute cut apply,
    read from the committed real-TPU artifact (tests/data/
    tpu_sharded.json, produced by scripts/run_tpu_sharded.py on the
    chip) — measuring it here would add several hundred seconds of
    shard_map compiles to every bench run for a number that only moves
    when the dist code does."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "data", "tpu_sharded.json")
    try:
        with open(path) as f:
            return json.load(f)["legs"]["cut_stencil_shard_map"][
                "sharded_overhead_1dev"]
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp

    from gdm.grid import Grid
    from gdm import solvers
    from gdm.ops import laplace_apply_fn

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    results = {}
    for key, p, cells in (
        (1024, 3, (1024, 1024)),
        (2048, 3, (2048, 2048)),
        (4096, 3, (4096, 4096)),
        ("p5_1024", 5, (1024, 1024)),
        ("p3_3d_160", 3, (160, 160, 160)),
    ):
        grid = Grid(p, cells, (0.0,) * len(cells), (1.0,) * len(cells))
        apply_fn = laplace_apply_fn(grid, dtype=jnp.float32,
                                    use_pallas="never")
        u = jnp.ones(grid.nodes, jnp.float32)
        dt = timed_chain(lambda v: apply_fn(v) * 1e-3, u)
        results[key] = grid.n_nodes / dt

    pallas = None
    if on_tpu:
        pallas = {}
        try:
            from gdm.ops.pallas_stencil2 import best_padded_laplace
            for key, p, cells in (
                    (1024, 3, (1024, 1024)), (2048, 3, (2048, 2048)),
                    (4096, 3, (4096, 4096)), ("p5_1024", 5, (1024, 1024)),
                    ("p5_2048", 5, (2048, 2048)),
                    ("p3_3d_160", 3, (160, 160, 160)),
                    ("p3_3d_256", 3, (256, 256, 256))):
                grid = Grid(p, cells, (0.0,) * len(cells),
                            (1.0,) * len(cells))
                apply_pad, pad, unpad, _ = best_padded_laplace(
                    grid, jnp.float32)
                up = pad(jnp.ones(grid.nodes, jnp.float32))
                dt = timed_chain(lambda v: apply_pad(v) * 1e-3, up)
                pallas[key] = grid.n_nodes / dt
        except Exception:
            pallas = pallas or None

    # CG Poisson solve at 1024^2 (fixed 100 iterations, f32), timed as a
    # differential chain of whole solves (b re-derived from x each rep so
    # the loop cannot collapse)
    n = 1024
    grid = Grid(3, (n, n), (0.0, 0.0), (1.0, 1.0))
    apply_fn = laplace_apply_fn(grid, dtype=jnp.float32)

    def one_cg(b):
        x, info = solvers.cg(apply_fn, b, max_iter=100, rel_tol=1e-30)
        # renormalize so chained solves keep an O(1), never-underflowing
        # rhs (a fixed scale factor hits f32 zero after ~13 reps and CG
        # then exits early on a zero rhs)
        return x * jax.lax.rsqrt(jnp.mean(x * x) + 1e-30)

    b = jnp.ones((n + 1, n + 1), jnp.float32)
    cg_time = timed_chain(one_cg, b, trials=3, target_s=0.5)

    @jax.jit
    def cg_info(b):
        _, info = solvers.cg(apply_fn, b, max_iter=100, rel_tol=1e-30)
        return info["iterations"]

    cg_iters = int(cg_info(b))

    # geometric-multigrid-preconditioned CG at 1024^2, through the SAME
    # dispatch gdm.problems.poisson.solve(precondition="mg") takes
    # (ops.fast.best_field_laplace: fused Pallas applies on TPU for both
    # the CG operator and every large multigrid level)
    from gdm.constraints import Constraints
    from gdm.functional import load_vector
    from gdm.multigrid import PoissonMultigrid
    from gdm.ops.fast import best_field_laplace

    cons = Constraints.zero_boundary(grid)
    base_apply, mg_rode_pallas = best_field_laplace(grid)
    mg_apply = cons.constrain_operator(
        lambda u: base_apply(u.astype(jnp.float32)))
    mg = PoissonMultigrid(grid)
    bb = cons.constrain_rhs(
        load_vector(grid, lambda m, c: np.ones_like(m[0]))).astype(
            jnp.float32)
    pre = jax.jit(mg.precondition)

    # Real ReductionControl-style stopping.  Root cause of round 1's
    # "erratic f32 stopping": (a) dispatch-ACK wall-clocking made the
    # while_loop LOOK erratic, and (b) the f32 recurrence residual has a
    # floor of ~eps_f32 * kappa(A) ~ 1e-4 at 1024^2 (kappa ~ h^-2), so a
    # 1e-6 relative target is unreachable in f32 — the rule itself works
    # whenever the target is attainable.  Solve to 1e-3 (MG-CG: a
    # handful of iterations) and report the measured 50-iteration floor.
    def one_mg(bb):
        x, info = solvers.cg(mg_apply, bb, precond=pre, max_iter=50,
                             rel_tol=1e-3)
        return x * jax.lax.rsqrt(jnp.mean(x * x) + 1e-30)

    mg_time = timed_chain(one_mg, bb, trials=3, target_s=0.5)

    @jax.jit
    def mg_info(bb):
        _, info = solvers.cg(mg_apply, bb, precond=pre, max_iter=50,
                             rel_tol=1e-3)
        _, floor = solvers.cg(mg_apply, bb, precond=pre, max_iter=50,
                              rel_tol=0.0)
        return info["iterations"], info["residual"], floor["residual"]

    mg_iters_, mg_res_, mg_floor_ = mg_info(bb)
    mg_iters = int(mg_iters_)
    nb = float(jnp.linalg.norm(bb))
    mg_rel_res = float(mg_res_) / nb
    mg_floor = float(mg_floor_) / nb

    # end-to-end flagship step: 2D cut wave RK4 (4 stages x mass-CG +
    # matrix-free cut stiffness RHS), f32, 128^2.  entry() uses the SAME
    # dispatch as the app drivers (gdm/cut/fastapply.py on TPU), so this
    # measures the kernels the product actually runs.
    import __graft_entry__

    step, args = __graft_entry__.entry(n=128)
    t0_, dt_, u0, v0 = args

    def one_wave(uv):
        u, v = uv
        return step(t0_, dt_, u, v)

    wave_step_s = timed_chain(one_wave, (u0, v0), trials=3, target_s=0.5)

    best_1024 = max(results[1024], (pallas or {}).get(1024, 0.0))
    best_2048 = max(results[2048], (pallas or {}).get(2048, 0.0))
    best_4096 = max(results[4096], (pallas or {}).get(4096, 0.0))
    best_p5 = max(results["p5_1024"], (pallas or {}).get("p5_1024", 0.0))
    target = TARGET_FRACTION * HBM_BYTES_PER_S / IDEAL_BYTES_PER_DOF
    print(json.dumps({
        "metric": "gdm_stiffness_matvec_dof_per_s_p3_2d_1024",
        "value": best_1024,
        "unit": "DoF/s",
        "vs_baseline": best_1024 / target,
        "vs_measured_ceiling": best_1024 / MEASURED_CEILING_DOF_PER_S,
        "extra": {
            "matvec_2048_dof_per_s": best_2048,
            "matvec_4096_dof_per_s": best_4096,
            "xla_1024_dof_per_s": results[1024],
            "matvec_p5_2d_1024_dof_per_s": best_p5,
            "xla_p5_1024_dof_per_s": results["p5_1024"],
            "matvec_p3_3d_160_dof_per_s": max(
                results["p3_3d_160"],
                (pallas or {}).get("p3_3d_160", 0.0)),
            "pallas_dof_per_s": pallas,
            "cg100_1024_s": cg_time,
            "cg_iterations": cg_iters,
            "mg_cg_solve_1e3_1024_s": mg_time,
            "mg_cg_rode_pallas": mg_rode_pallas,
            "mg_cg_iterations": mg_iters,
            "mg_cg_rel_residual": mg_rel_res,
            "mg_cg_f32_floor_50it": mg_floor,
            "cut_wave_rk4_step_128_s": wave_step_s,
            "sharded_overhead_1dev": _sharded_overhead(),
            "timing": "host-synced differential chain (see docstring)",
        },
    }))


if __name__ == "__main__":
    main()
