"""Benchmark: matrix-free GDM stiffness matvec throughput (DoF/s) and CG
Poisson solve at 1024^2, degree 3, float32, on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured DoF/s divided by the target of
/root/repo/BASELINE.json: 70% of the HBM roofline for an ideal
(read-u + write-y) sweep on TPU v5e (819 GB/s -> 102.4 GDoF/s ideal,
71.7 GDoF/s target).
"""

import json
import time

import numpy as np


HBM_BYTES_PER_S = 819e9  # TPU v5e
IDEAL_BYTES_PER_DOF = 8  # read u (f32) + write y (f32)
TARGET_FRACTION = 0.70


def main():
    import jax
    import jax.numpy as jnp

    from gdm.grid import Grid
    from gdm import solvers
    from gdm.ops import laplace_apply_fn

    n = 1024
    p = 3
    grid = Grid(p, (n, n), (0.0, 0.0), (1.0, 1.0))
    apply_fn = laplace_apply_fn(grid, dtype=jnp.float32)

    @jax.jit
    def sweep(u, k):
        def body(i, v):
            return apply_fn(v) * 1e-3
        return jax.lax.fori_loop(0, k, body, u)

    u = jnp.ones((n + 1, n + 1), jnp.float32)
    sweep(u, 1).block_until_ready()  # compile
    # calibrate iteration count for a stable timing window
    iters = 100
    t0 = time.time()
    sweep(u, iters).block_until_ready()
    dt = (time.time() - t0) / iters
    dofs_per_s = (n + 1) ** 2 / dt

    # CG Poisson solve at 1024^2 (fixed 100 iterations, f32)
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

    target = TARGET_FRACTION * HBM_BYTES_PER_S / IDEAL_BYTES_PER_DOF
    print(json.dumps({
        "metric": "gdm_stiffness_matvec_dof_per_s_p3_2d_1024",
        "value": dofs_per_s,
        "unit": "DoF/s",
        "vs_baseline": dofs_per_s / target,
        "extra": {
            "matvec_ms": dt * 1e3,
            "cg100_s": cg_time,
            "cg_iterations": int(info["iterations"]),
        },
    }))


if __name__ == "__main__":
    main()
