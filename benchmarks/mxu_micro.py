"""Microbenchmark: MXU matmul throughput by precision + dtype on the
attached TPU.  Informs the stencil-kernel design (how expensive it is to
run banded sweeps as dense-banded MXU matmuls in f32).

Run with the environment UNTOUCHED (real TPU), one job at a time.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_matmul(m, k, n, dtype, precision, iters=50):
    a = jnp.asarray(np.random.rand(m, k), dtype)
    b = jnp.asarray(np.random.rand(k, n), dtype)

    @jax.jit
    def loop(a, b, it):
        # carry a through the loop (scaled output slice re-enters the
        # first operand) so XLA cannot hoist the matmul
        def body(i, a):
            y = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=dtype,
            )
            w = min(k, n)
            return a.at[:, :w].add(
                y[:, :w].astype(dtype) * jnp.asarray(1e-12, dtype))
        return jax.lax.fori_loop(0, it, body, a)

    loop(a, b, 2).block_until_ready()
    t0 = time.time()
    loop(a, b, iters).block_until_ready()
    dt = (time.time() - t0) / iters
    return 2 * m * k * n / dt / 1e12


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    M = K = N = 4096
    for dtype, precisions in (
        (jnp.bfloat16, ["DEFAULT"]),
        (jnp.float32, ["DEFAULT", "HIGH", "HIGHEST"]),
    ):
        for pname in precisions:
            prec = getattr(jax.lax.Precision, pname)
            tf = bench_matmul(M, K, N, dtype, prec)
            print(f"{dtype.__name__:9s} {pname:8s} {tf:7.1f} Tflop/s")
    # skinny shapes like the stencil kernel uses: (128, 144) @ (144, W)
    for (m, k, n) in ((256, 144, 2176), (2176, 144, 128), (256, 288, 2176)):
        tf = bench_matmul(m, k, n, jnp.float32, jax.lax.Precision.HIGHEST,
                          iters=200)
        print(f"f32 HIGHEST ({m}x{k}x{n}): {tf:7.2f} Tflop/s")
