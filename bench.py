"""Benchmark: matrix-free GDM stiffness matvec throughput (DoF/s) and CG
Poisson solve at 1024^2, degree 3, float32, on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured DoF/s divided by the target of
/root/repo/BASELINE.json: 70% of the HBM roofline for an ideal
(read-u + write-y) sweep on TPU v5e (819 GB/s -> 102.4 GDoF/s ideal,
71.7 GDoF/s target).  The fused single-pass Pallas kernel
(gdm/ops/pallas_stencil.py) implements that formulation, but the remote
TPU relay of this environment cannot compile Pallas kernels, so the
default path is the XLA separable sweep structure (~6 HBM passes);
enable the kernel with GDM_ENABLE_PALLAS=1 where a full TPU toolchain is
available.
"""

import json
import time

import numpy as np

HBM_BYTES_PER_S = 819e9  # TPU v5e
IDEAL_BYTES_PER_DOF = 8  # read u (f32) + write y (f32)
TARGET_FRACTION = 0.70


def time_matvec(apply_fn, u, iters):
    import jax

    @jax.jit
    def sweep(u, k):
        return jax.lax.fori_loop(0, k, lambda i, v: apply_fn(v) * 1e-3, u)

    sweep(u, 1).block_until_ready()  # compile
    sweep(u, iters).block_until_ready()  # warm
    t0 = time.time()
    sweep(u, iters).block_until_ready()
    return (time.time() - t0) / iters


def measure_pallas_subprocess(timeout=420):
    """Measure the fused Pallas kernel in a child process with a timeout
    (the remote TPU compile relay has been observed to wedge)."""
    import json as _json
    import subprocess
    import sys

    code = r"""
import json, time, jax, jax.numpy as jnp
from gdm.grid import Grid
from gdm.ops.pallas_stencil import make_padded_laplace
out = {}
for n in (1024, 2048):
    grid = Grid(3, (n, n), (0.0, 0.0), (1.0, 1.0))
    apply_pad, pad, unpad, shape = make_padded_laplace(grid, jnp.float32)
    u = pad(jnp.ones(grid.nodes, jnp.float32))
    @jax.jit
    def loop(u, k):
        return jax.lax.fori_loop(0, k, lambda i, v: apply_pad(v) * 1e-3, u)
    loop(u, 1).block_until_ready()
    loop(u, 1000).block_until_ready()
    t0 = time.time(); loop(u, 1000).block_until_ready()
    out[str(n)] = (n + 1) ** 2 / ((time.time() - t0) / 1000)
print("BENCH_JSON:" + json.dumps(out))
"""
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if line.startswith("BENCH_JSON:"):
                return {int(k): v for k, v in
                        _json.loads(line[len("BENCH_JSON:"):]).items()}
    except Exception:
        pass
    return None


def main():
    import jax
    import jax.numpy as jnp

    from gdm.grid import Grid
    from gdm import solvers
    from gdm.ops import laplace_apply_fn

    results = {}
    for key, p, cells in (
        (1024, 3, (1024, 1024)),
        (2048, 3, (2048, 2048)),
        ("p5_1024", 5, (1024, 1024)),
        ("p3_3d_160", 3, (160, 160, 160)),
    ):
        grid = Grid(p, cells, (0.0,) * len(cells), (1.0,) * len(cells))
        apply_fn = laplace_apply_fn(grid, dtype=jnp.float32, use_pallas="never")
        u = jnp.ones(grid.nodes, jnp.float32)
        dt = time_matvec(apply_fn, u, 300)
        results[key] = grid.n_nodes / dt

    pallas = None
    if jax.devices()[0].platform in ("tpu", "axon"):
        pallas = measure_pallas_subprocess()

    # CG Poisson solve at 1024^2 (fixed 100 iterations, f32)
    n = 1024
    grid = Grid(3, (n, n), (0.0, 0.0), (1.0, 1.0))
    apply_fn = laplace_apply_fn(grid, dtype=jnp.float32)

    @jax.jit
    def cgsolve(b):
        x, info = solvers.cg(apply_fn, b, max_iter=100, rel_tol=1e-30)
        return x, info

    b = jnp.ones((n + 1, n + 1), jnp.float32)
    cgsolve(b)[0].block_until_ready()
    t0 = time.time()
    x, info = cgsolve(b)
    x.block_until_ready()
    cg_time = time.time() - t0

    # geometric-multigrid-preconditioned CG: solve to 1e-6 (f32) at 1024^2
    from gdm.constraints import Constraints
    from gdm.functional import load_vector
    from gdm.multigrid import PoissonMultigrid
    from gdm import operators as _ops

    A = _ops.laplace(grid)
    cons = Constraints.zero_boundary(grid)
    mg_apply = cons.constrain_operator(
        lambda u: A.apply(u.astype(jnp.float32)))
    mg = PoissonMultigrid(grid)
    bb = cons.constrain_rhs(
        load_vector(grid, lambda m, c: np.ones_like(m[0]))).astype(jnp.float32)

    pre = jax.jit(mg.precondition)

    @jax.jit
    def mgsolve(bb):
        # fixed 5 MG-CG iterations (tolerance-free: the f32 while_loop
        # stopping comparison behaves erratically under this TPU
        # toolchain); 5 V-cycles reach ~1e-6 relative residual
        return solvers.cg(mg_apply, bb, precond=pre, max_iter=5,
                          rel_tol=0.0)

    mgsolve(bb)[0].block_until_ready()
    t0 = time.time()
    xm, infom = mgsolve(bb)
    xm.block_until_ready()
    mg_time = time.time() - t0
    mg_rel_res = float(infom["residual"]) / float(jnp.linalg.norm(bb))

    # end-to-end flagship step: 2D cut wave RK4 (4 stages x mass-CG +
    # matrix-free cut stiffness RHS), f32, 128^2
    import __graft_entry__

    step, args = __graft_entry__.entry(n=128)
    jstep = jax.jit(step)
    out = jstep(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    iters_w = 20
    state = args[2:]
    for _ in range(iters_w):
        state = jstep(args[0], args[1], *state)
    jax.block_until_ready(state)
    wave_step_s = (time.time() - t0) / iters_w

    best_1024 = max(results[1024], (pallas or {}).get(1024, 0.0))
    best_2048 = max(results[2048], (pallas or {}).get(2048, 0.0))
    target = TARGET_FRACTION * HBM_BYTES_PER_S / IDEAL_BYTES_PER_DOF
    # The GD matvec at p=3 does 56 f32 flops/DoF: on v5e its speed of
    # light is the VPU (~1.4e12 f32 flop/s -> ~25 GDoF/s), reached well
    # before the HBM roofline that BASELINE.json's target assumes.
    vpu_bound_dofs = 1.4e12 / 56.0
    print(json.dumps({
        "metric": "gdm_stiffness_matvec_dof_per_s_p3_2d_1024",
        "value": best_1024,
        "unit": "DoF/s",
        "vs_baseline": best_1024 / target,
        "extra": {
            "matvec_2048_dof_per_s": best_2048,
            "xla_1024_dof_per_s": results[1024],
            "matvec_p5_2d_1024_dof_per_s": results["p5_1024"],
            "matvec_p3_3d_160_dof_per_s": results["p3_3d_160"],
            "pallas_dof_per_s": pallas,
            "cg100_1024_s": cg_time,
            "cg_iterations": int(info["iterations"]),
            "mg_cg_solve5_1024_s": mg_time,
            "mg_cg_rel_residual": mg_rel_res,
            "cut_wave_rk4_step_128_s": wave_step_s,
            "vs_vpu_compute_bound_2048": best_2048 / vpu_bound_dofs,
        },
    }))


if __name__ == "__main__":
    main()
