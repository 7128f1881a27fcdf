"""TPU component breakdown for the MG-CG product path (round-4 item 1).

Runs on the real chip (plain python).  Prints one JSON line per
component, timed with bench.timed_chain (host-synced differential).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import timed_chain
from gdm.constraints import Constraints
from gdm.functional import load_vector
from gdm.grid import Grid
from gdm.multigrid import PoissonMultigrid
from gdm.ops.fast import best_field_laplace
from gdm import operators as _ops
from gdm import solvers


def main():
    n = 1024
    grid = Grid(3, (n, n), (0.0, 0.0), (1.0, 1.0))
    cons = Constraints.zero_boundary(grid)
    out = {}

    u = jnp.ones(grid.field_shape, jnp.float32)

    # exact XLA apply
    A = _ops.laplace(grid)
    out["xla_apply_s"] = timed_chain(lambda v: A.apply(v) * 1e-3, u)

    # pallas apply incl. pad/unpad each call
    pf, rode = best_field_laplace(grid)
    assert rode, "expected the pallas path on TPU"
    out["pallas_apply_padunpad_s"] = timed_chain(lambda v: pf(v) * 1e-3, u)

    # pallas apply, state kept padded
    from gdm.ops.pallas_stencil2 import best_padded_laplace

    apply_pad, pad, unpad, _ = best_padded_laplace(grid, jnp.float32)
    up = pad(u[..., 0])
    out["pallas_apply_resident_s"] = timed_chain(
        lambda v: apply_pad(v) * 1e-3, up)

    # constrained wrapper (distribute + apply + compress)
    capply = cons.constrain_operator(pf)
    out["constrained_pallas_apply_s"] = timed_chain(
        lambda v: capply(v) * 1e-3, u)

    # one V-cycle (pallas levels) + one V-cycle (xla levels)
    mg = PoissonMultigrid(grid)
    out["vcycle_pallas_s"] = timed_chain(
        lambda v: mg.precondition(v) * 1e-3, u)
    mg_x = PoissonMultigrid(grid, use_pallas="never")
    out["vcycle_xla_s"] = timed_chain(
        lambda v: mg_x.precondition(v) * 1e-3, u)

    # transfers alone at the fine level
    from gdm.multigrid import gd_prolong_axis, gd_restrict_axis

    coarse = mg.levels[1]

    def transfer(v):
        r = v
        for d in range(2):
            tab, off = coarse["mid"][d]
            r = gd_restrict_axis(r, d, tab, off)
        e = r
        for d in range(2):
            tab, off = coarse["mid"][d]
            e = gd_prolong_axis(e, d, tab, off, grid.nodes[d])
        return e * 1e-3

    out["restrict_prolong_pair_s"] = timed_chain(transfer, u)

    # full MG-CG solve, both routings
    bb = cons.constrain_rhs(
        load_vector(grid, lambda m, c: np.ones_like(m[0]))).astype(
            jnp.float32)

    for name, ap, pre in (
            ("mg_cg_pallas_s", capply, mg.precondition),
            ("mg_cg_xla_s",
             cons.constrain_operator(A.apply), mg_x.precondition)):
        prej = jax.jit(pre)

        def one_mg(b):
            x, info = solvers.cg(ap, b, precond=prej, max_iter=50,
                                 rel_tol=1e-3)
            return x * jax.lax.rsqrt(jnp.mean(x * x) + 1e-30)

        out[name] = timed_chain(one_mg, bb, trials=3, target_s=0.5)

        @jax.jit
        def info_fn(b):
            _, info = solvers.cg(ap, b, precond=prej, max_iter=50,
                                 rel_tol=1e-3)
            return info["iterations"]

        out[name + "_iters"] = int(info_fn(bb))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
