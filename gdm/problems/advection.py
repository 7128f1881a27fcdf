"""Cut advection application: single-domain and composite two-domain
problems with RK-evolved boundary conditions.

Re-implements applications/advection/ (problem.h, advection-app.cc,
advection-convergence.cc): upwind embedded fluxes, boundary values as
extra ODE blocks, mass-matrix CG per stage, 6-column error reporting
(volume and surface L2/L1/Linf), ConvergenceTable-compatible summaries.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import solvers, timestepping
from ..cut.advection import AdvectionOperators
from ..cut.geometry import INSIDE, OUTSIDE, CutGeometry
from ..cut.operators import CutOperators
from ..grid import Grid


@dataclasses.dataclass
class AdvectionParams:
    """Mirror of applications/advection/include/gdm/advection/parameters.h."""

    fe_degree: int = 3
    n_components: int = 1
    composite: bool = False
    n_subdivisions_1D: int = 40
    geometry_left: float = 0.0
    geometry_right: float = 1.0
    ghost_parameter_M: float = 0.5
    ghost_parameter_A: float = 0.5
    exact_solution: Optional[Callable] = None
    exact_solution_der: Optional[Callable] = None
    start_t: float = 0.0
    end_t: float = 0.1
    cfl: float = 0.4
    solver_max_iterations: int = 1000
    solver_abs_tolerance: float = 1e-20
    solver_rel_tolerance: float = 1e-14
    max_val: float = 2.0
    advection: tuple = (1.0, 0.0)
    advection_1: tuple = (0.0, 0.0)
    # strong nodal Dirichlet BC on the lower (inflow) surfaces instead of
    # the weak upwind flux (prototypes/advection_02_gdm.cc:148,207-216,
    # alpha=1.0 path); non-composite only
    strong_bc: bool = False
    level_set_fe_degree: int = 1
    level_set_function: Optional[Callable] = None
    dim: int = 2


def plane_signed_distance(point, normal):
    n = np.asarray(normal) / np.linalg.norm(normal)
    p0 = np.asarray(point)

    def fn(mesh_list):
        return sum(
            (np.asarray(m) - p0[d]) * n[d] for d, m in enumerate(mesh_list)
        )

    return fn


def convergence_case(fe_degree: int, n_subdivisions_1D: int, cfl: float,
                     factor_rotation: float, factor: float) -> AdvectionParams:
    """Setup of advection-convergence.cc:123-185 ("DoD stabilization"
    rotated-ramp convergence study)."""
    increment = 5.0
    phi = (np.pi * increment / 180.0) * factor
    phi_add = (np.pi * increment / 180.0) * factor_rotation
    x_shift = 0.2001
    a = (2.0 * np.cos(phi + phi_add), 2.0 * np.sin(phi + phi_add))

    def exact(pts, t):
        pos0 = pts[..., 0] - t * a[0]
        pos1 = pts[..., 1] - t * a[1]
        x_hat = np.cos(phi) * (pos0 - x_shift) + np.sin(phi) * pos1
        return jnp.sin(np.sqrt(2.0) * np.pi * x_hat / (1.0 - x_shift))

    def exact_der(pts, t):
        pos0 = pts[..., 0] - t * a[0]
        pos1 = pts[..., 1] - t * a[1]
        x_hat = np.cos(phi) * (pos0 - x_shift) + np.sin(phi) * pos1
        return (
            jnp.cos(np.sqrt(2.0) * np.pi * x_hat / (1.0 - x_shift))
            * (np.sqrt(2.0) * np.pi / (1.0 - x_shift))
            * (np.cos(phi) * (-a[0]) + np.sin(phi) * (-a[1]))
        )

    p = AdvectionParams(
        fe_degree=fe_degree,
        n_subdivisions_1D=n_subdivisions_1D,
        geometry_left=0.0,
        geometry_right=1.0,
        ghost_parameter_M=0.5,
        ghost_parameter_A=0.5,
        start_t=0.0,
        end_t=0.1,
        cfl=cfl,
        max_val=2.0,
        advection=a,
        exact_solution=exact,
        exact_solution_der=exact_der,
        level_set_fe_degree=1,
        level_set_function=plane_signed_distance(
            (x_shift, 0.0), (np.sin(phi), -np.cos(phi))
        ),
        dim=2,
    )
    return p


def composite_app_case() -> AdvectionParams:
    """Setup of advection-app.cc:86-154 (composite "DoD" case)."""
    factor = 27.0
    increment = 5.0
    phi = (np.pi * increment / 180.0) * factor
    x_shift = 0.25

    def exact(pts, t):
        # jnp.sqrt (not np.sqrt): must stay traceable for run_scan
        d = jnp.sqrt((pts[..., 0] + 0.3) ** 2 + (pts[..., 1] + 0.3) ** 2)
        return jnp.maximum(0.0, 0.3 - d) + 0.0 * t

    def exact_der(pts, t):
        return jnp.zeros(pts.shape[:-1]) + 0.0 * t

    return AdvectionParams(
        fe_degree=5,
        composite=True,
        n_subdivisions_1D=200,
        geometry_left=-1.0,
        geometry_right=1.0,
        ghost_parameter_M=0.5,
        ghost_parameter_A=0.5,
        start_t=0.0,
        end_t=0.6,
        cfl=0.2,
        max_val=4.0,
        advection=(3.0, 1.0),
        advection_1=(1.0, 2.0),
        exact_solution=exact,
        exact_solution_der=exact_der,
        level_set_fe_degree=1,
        level_set_function=plane_signed_distance(
            (x_shift, 0.0), (np.sin(phi), -np.cos(phi))
        ),
        dim=2,
    )


class AdvectionProblem:
    """``mesh``: optional 1-D jax.sharding.Mesh.  When given, the mass
    solves run their stencil-band applies domain-decomposed along grid
    axis 0 with ppermute halo exchange (mirroring WaveProblem; the
    reference runs the advection apps under the same MPI machinery —
    advection/include/gdm/advection/discretization.h:104-107 partitioner,
    stiffness.h ghost exchange).  The upwind flux / BC forcing terms stay
    single-program and are partitioned by XLA auto-SPMD.  Results are
    shard-count-invariant (tests/test_distributed_cut.py)."""

    def __init__(self, params: AdvectionParams, verbose: bool = False,
                 mesh=None):
        self.params = params
        self.verbose = verbose
        self.mesh = mesh
        pp = params
        dim = pp.dim
        self.grid = Grid(
            pp.fe_degree,
            (pp.n_subdivisions_1D,) * dim,
            (pp.geometry_left,) * dim,
            (pp.geometry_right,) * dim,
        )
        self.geo = CutGeometry.build(
            self.grid, pp.level_set_function, pp.level_set_fe_degree
        )
        self.dx = (pp.geometry_right - pp.geometry_left) / pp.n_subdivisions_1D
        self.op_in = CutOperators(self.geo, INSIDE)
        self.adv_in = AdvectionOperators(self.op_in, pp.advection)
        if pp.composite:
            self.op_out = CutOperators(self.geo, OUTSIDE)
            self.adv_out = AdvectionOperators(self.op_out, pp.advection_1)
        else:
            self.op_out = self.adv_out = None
        self.rows = {0: [], 1: []}
        # measured routing decisions of the verified mass solvers
        # (per-domain path + probe evidence), for rows/artifacts
        self._solver_meta = []

    def interpolate_exact(self, t):
        mesh = self.grid.node_coords_mesh()
        pts = np.stack(mesh, axis=-1)
        return jnp.asarray(np.asarray(self.params.exact_solution(pts, t)).reshape(-1))

    def _mass_solver(self, op):
        pp = self.params
        gm = pp.ghost_parameter_M
        from ..cut.stencil import (assemble_stencil,
                                   schwarz_jacobi_preconditioner)

        st = assemble_stencil(op, "mass", gm)
        K = 2 * (op.grid.degree + 1) + 1
        if self.mesh is not None:
            from ..dist.cut import sharded_stencil_apply

            apply_fn = sharded_stencil_apply(st, self.mesh)
            # cut-window Schwarz: point-Jacobi CG stalls on the
            # near-singular GP'd cut mass matrix of badly cut p=5
            # configurations (the reference leans on ILU here,
            # parameters.h:32)
            pre = schwarz_jacobi_preconditioner(st, op.w_cut)

            def solve(b):
                x, _ = solvers.cg(
                    apply_fn, b, precond=pre,
                    max_iter=pp.solver_max_iterations,
                    abs_tol=pp.solver_abs_tolerance,
                    rel_tol=pp.solver_rel_tolerance,
                )
                return x

            return solve

        import os

        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = None
        if (op.grid.dim == 2 and platform in ("tpu", "axon")
                and os.environ.get("GDM_DISABLE_PALLAS") != "1"):
            # TPU: probe-routed, TRUE-residual-verified VMEM-resident
            # FSAI-CG with automatic streamed-Schwarz fallback
            # (gdm/cut/fsai.py).  Round 4 found the f32 resident solve's
            # recurrence residual passing 1e-6 while the true residual
            # grows on the DoD composite's p=5 GP'd cut mass (junk at
            # 1e-3 of trajectory scale by t=0.1 against the x64 oracle)
            # and hand-routed this family to Schwarz streamed CG; the
            # verified dispatch replaces that hand routing with a
            # setup-time probe plus a per-solve exact-f32 residual check
            # inside the kernel — bad systems fall back automatically,
            # healthy ones keep the one-launch path.
            from ..cut.fsai import verified_fsai_solver

            vs = verified_fsai_solver(
                st, windows=op.w_cut,
                max_iter=pp.solver_max_iterations,
                rel_tol=pp.solver_rel_tolerance,
                abs_tol=pp.solver_abs_tolerance,
            )
            self._solver_meta.append(
                {"loc": "inside" if op is self.op_in else "outside",
                 "path": vs.path, "probe": vs.probe})
            return vs

        if op.grid.n_nodes * K**op.grid.dim <= 3e7:
            from ..cut.fastapply import fast_stencil_apply

            # split separable + correction apply where available; the
            # stencil-band sweep elsewhere
            apply_fn = fast_stencil_apply(st, op, "mass") or st.apply
        else:
            apply_fn = lambda v: op.mass_apply(v, gm)
        # cut-window Schwarz-preconditioned CG (the reference's ILU
        # role, parameters.h:32)
        pre = schwarz_jacobi_preconditioner(st, op.w_cut)

        def solve(b):
            x, _ = solvers.cg(
                apply_fn, b, precond=pre,
                max_iter=pp.solver_max_iterations,
                abs_tol=pp.solver_abs_tolerance,
                rel_tol=pp.solver_rel_tolerance,
            )
            return x

        return solve

    def postprocess(self, t, u, location=INSIDE):
        op = self.op_in if location == INSIDE else self.op_out
        adv = self.adv_in if location == INSIDE else self.adv_out
        slot = 0 if location == INSIDE else 1
        if not hasattr(self, "_err_jit"):
            self._err_jit = {}
        if slot not in self._err_jit:
            self._err_jit[slot] = jax.jit(
                lambda u, t, op=op, adv=adv: (
                    op.error_norms(u, self.params.exact_solution, t),
                    adv.surface_error_norms(u, self.params.exact_solution, t),
                ))
        (l2, l1, li), (fl2, fl1, fli) = self._err_jit[slot](u, t)
        l2, l1, li, fl2, fl1, fli = (
            float(x) for x in (l2, l1, li, fl2, fl1, fli))
        counter = len(self.rows[slot])
        self.rows[slot].append((counter, t, l2, l1, li, fl2, fl1, fli))
        if self.verbose:
            print("%5d %8.5f %14.8e %14.8e %14.8e | %14.8e %14.8e %14.8e"
                  % (counter, t, l2, l1, li, fl2, fl1, fli))
        return (li, l1, l2, fli, fl1, fl2)

    def run(self):
        pp = self.params
        if pp.strong_bc and pp.composite:
            raise ValueError("strong_bc supports non-composite runs only "
                             "(as in the reference prototype)")
        delta_t = self.dx * pp.cfl / pp.max_val
        if pp.composite:
            return self._run_composite(delta_t)
        return self._run_single(delta_t)

    def _bc_values(self, adv: AdvectionOperators, t):
        """(bc_surf, bc_bdry) = exact solution at the collected points."""
        ops = adv.ops
        bs = self.params.exact_solution(ops.surf_phys_q, t) \
            if len(ops.cut_ids) else jnp.zeros((0, 1))
        bb = self.params.exact_solution(ops.b_phys, t) \
            if len(ops.b_win) else jnp.zeros((0, 1))
        return jnp.asarray(bs), jnp.asarray(bb)

    def _bc_der(self, adv: AdvectionOperators, t):
        ops = adv.ops
        der = self.params.exact_solution_der
        bs = der(ops.surf_phys_q, t) if len(ops.cut_ids) else jnp.zeros((0, 1))
        bb = der(ops.b_phys, t) if len(ops.b_win) else jnp.zeros((0, 1))
        return jnp.asarray(bs), jnp.asarray(bb)

    def _bdry_nodes(self):
        """Flat node indices on the lower surface of every axis (the
        reference constrains surfaces d*2, advection_02_gdm.cc:207-216)
        and their physical coordinates."""
        grid = self.grid
        mesh = grid.node_coords_mesh()
        mask = np.zeros(grid.nodes, dtype=bool)
        for d in range(grid.dim):
            sl = [slice(None)] * grid.dim
            sl[d] = 0
            mask[tuple(sl)] = True
        idx = np.where(mask.reshape(-1))[0]
        pts = np.stack([np.asarray(m).reshape(-1)[idx] for m in mesh],
                       axis=-1)
        return jnp.asarray(idx), pts

    def _run_single_strong(self, delta_t):
        """Strong-Dirichlet time loop (advection_02_gdm.cc weak_bc=false,
        alpha=1.0): per RK stage the boundary nodes of the stage vector
        are overwritten with exact(t_stage), the stage derivative is
        zeroed there, and after each step the solution's boundary nodes
        are set to exact(t+dt) (constraints_dbc.distribute)."""
        pp = self.params
        adv = self.adv_in
        msolve = self._mass_solver(self.op_in)
        bidx, bpts = self._bdry_nodes()

        def gvals(t):
            return jnp.asarray(pp.exact_solution(bpts, t))

        def f(t, u):
            u0 = u.at[bidx].set(gvals(t))
            k = msolve(adv.compute_rhs_strong(u0, pp.ghost_parameter_A))
            return k.at[bidx].set(0.0)

        step = jax.jit(lambda t, dt, u: timestepping.rk_step(f, t, dt, u)
                       .at[bidx].set(gvals(t + dt)))

        u = self.interpolate_exact(pp.start_t)
        err = self.postprocess(pp.start_t, u)
        time = timestepping.DiscreteTime(pp.start_t, pp.end_t, delta_t)
        while (not time.is_at_end()) and err[2] < 1.0:
            t, dt = time.get_current_time(), time.get_next_step_size()
            u = step(t, dt, u)
            err = self.postprocess(t + dt, u)
            time.advance_time()
        self.u = u
        return self.rows

    def _run_single(self, delta_t):
        pp = self.params
        if pp.strong_bc:
            return self._run_single_strong(delta_t)
        adv = self.adv_in
        msolve = self._mass_solver(self.op_in)

        def f(t, y):
            bs, bb, u = y
            dbs, dbb = self._bc_der(adv, t)
            r = adv.compute_rhs(u, bs, bb, pp.ghost_parameter_A)
            return (dbs, dbb, msolve(r))

        step = jax.jit(lambda t, dt, y: timestepping.rk_step(f, t, dt, y))

        u = self.interpolate_exact(pp.start_t)
        err = self.postprocess(pp.start_t, u)
        time = timestepping.DiscreteTime(pp.start_t, pp.end_t, delta_t)
        while (not time.is_at_end()) and err[2] < 1.0:
            t, dt = time.get_current_time(), time.get_next_step_size()
            bs, bb = self._bc_values(adv, t)
            bs, bb, u = step(t, dt, (bs, bb, u))
            err = self.postprocess(t + dt, u)
            time.advance_time()
        return self.rows

    def run_scan(self, chunk: int = 128, checkpoint_path: str = None,
                 checkpoint_every: int = 1):
        """Whole-horizon time loop as jitted ``lax.scan`` device programs.

        Numerically identical to :meth:`run` (same DiscreteTime step
        sizes, same RK tableau, same per-step error rows), but the
        trajectory — BC reinitialization, RK stages, mass-CG solves, and
        the 6-column error norms of every step — runs as device scans of
        up to ``chunk`` steps each, so a 1200-step production run costs
        a couple of compiles + ~10 dispatches instead of ~3 dispatches
        per step.  (``chunk`` bounds the single-program device time; the
        remote-TPU execution path kills very long single programs.)
        Requires ``exact_solution``/``exact_solution_der`` to be
        jax-traceable.  Populates and returns ``self.rows``.

        checkpoint_path: when set, the solver state + error trajectory
        are written there after every ``checkpoint_every`` chunks
        (atomically, gdm.checkpoint), and an existing checkpoint is
        RESUMED from instead of restarting the horizon — a killed run
        re-launched with the same arguments continues mid-trajectory
        (tests/test_checkpoint_resume.py).
        """
        import os

        from .. import checkpoint

        pp = self.params
        delta_t = self.dx * pp.cfl / pp.max_val
        time = timestepping.DiscreteTime(pp.start_t, pp.end_t, delta_t)
        ts, dts = [], []
        while not time.is_at_end():
            ts.append(time.get_current_time())
            dts.append(time.get_next_step_size())
            time.advance_time()
        ts, dts = jnp.asarray(ts), jnp.asarray(dts)
        chunk = max(1, min(chunk, len(ts)))

        def errs(u, t, op, adv):
            l2, l1, li = op.error_norms(u, pp.exact_solution, t)
            f2, f1, fi = adv.surface_error_norms(u, pp.exact_solution, t)
            return jnp.stack([l2, l1, li, f2, f1, fi])

        if pp.composite:
            solves = (self._mass_solver(self.op_in),
                      self._mass_solver(self.op_out))
            bp0 = jnp.asarray(self.adv_in.ops.b_phys)
            bp1 = jnp.asarray(self.adv_out.ops.b_phys)

            def f(t, y):
                bb0, u0, bb1, u1 = y
                _, dbb0 = self._bc_der(self.adv_in, t)
                _, dbb1 = self._bc_der(self.adv_out, t)
                r0 = self.adv_in.compute_rhs(
                    u0, None, bb0, pp.ghost_parameter_A, u_other=u1)
                r1 = self.adv_out.compute_rhs(
                    u1, None, bb1, pp.ghost_parameter_A, u_other=u0)
                return (dbb0, solves[0](r0), dbb1, solves[1](r1))

            def body(carry, tdt):
                u0, u1 = carry
                t, dt = tdt
                bb0 = jnp.asarray(pp.exact_solution(bp0, t))
                bb1 = jnp.asarray(pp.exact_solution(bp1, t))
                _, u0, _, u1 = timestepping.rk_step(
                    f, t, dt, (bb0, u0, bb1, u1))
                e = jnp.stack([
                    errs(u0, t + dt, self.op_in, self.adv_in),
                    errs(u1, t + dt, self.op_out, self.adv_out)])
                return (u0, u1), e

            @jax.jit
            def traj_chunk(u0, u1, tc, dc):
                (u0, u1), es = jax.lax.scan(body, (u0, u1), (tc, dc))
                return es, u0, u1

            @jax.jit
            def err0(u0, u1):
                return jnp.stack([
                    errs(u0, pp.start_t, self.op_in, self.adv_in),
                    errs(u1, pp.start_t, self.op_out, self.adv_out)])

            u0 = self.interpolate_exact(pp.start_t)
            u1 = u0
            parts = [np.asarray(err0(u0, u1))[None]]
            start = 0
            if checkpoint_path and os.path.exists(checkpoint_path):
                (u0, u1, es_prev), _, meta = checkpoint.load(
                    checkpoint_path, (u0, u1, np.zeros(1)))
                parts = [np.asarray(es_prev)]
                start = int(meta["next_s"])
            for ci, s in enumerate(range(start, len(ts), chunk)):
                es, u0, u1 = traj_chunk(u0, u1, ts[s : s + chunk],
                                        dts[s : s + chunk])
                parts.append(np.asarray(es))
                if checkpoint_path and (
                        (ci + 1) % checkpoint_every == 0
                        or s + chunk >= len(ts)):
                    checkpoint.save(
                        checkpoint_path,
                        (u0, u1, np.concatenate(parts)),
                        float(ts[min(s + chunk, len(ts)) - 1]
                              + dts[min(s + chunk, len(ts)) - 1]),
                        meta={"next_s": s + chunk})
            self.u0, self.u1 = u0, u1
            es = np.concatenate(parts)
            for step in range(es.shape[0]):
                t = float(pp.start_t if step == 0 else ts[step - 1]
                          + dts[step - 1])
                for slot in (0, 1):
                    row = (step, t) + tuple(float(x) for x in es[step, slot])
                    self.rows[slot].append(row)
                    if self.verbose:
                        print("%5d %8.5f %14.8e %14.8e %14.8e | %14.8e "
                              "%14.8e %14.8e" % row)
            return self.rows

        msolve = self._mass_solver(self.op_in)
        adv = self.adv_in
        if pp.strong_bc:
            # strong-Dirichlet step inside the scan: identical masked
            # updates to _run_single_strong (per-stage nodal constraint
            # distribution + stage-derivative zeroing,
            # prototypes/advection_02_gdm.cc:207-216,345-358 — the
            # reference's time loop is uniform over BC treatment)
            bidx, bpts = self._bdry_nodes()
            bpts = jnp.asarray(bpts)

            def gvals(t):
                return jnp.asarray(pp.exact_solution(bpts, t))

            def f_strong(t, u):
                u0 = u.at[bidx].set(gvals(t))
                k = msolve(adv.compute_rhs_strong(u0, pp.ghost_parameter_A))
                return k.at[bidx].set(0.0)

            def body(u, tdt):
                t, dt = tdt
                u = timestepping.rk_step(f_strong, t, dt, u) \
                    .at[bidx].set(gvals(t + dt))
                return u, errs(u, t + dt, self.op_in, adv)
        else:
            sp = jnp.asarray(adv.ops.surf_phys_q)
            bp = jnp.asarray(adv.ops.b_phys)

            def f(t, y):
                bs, bb, u = y
                dbs, dbb = self._bc_der(adv, t)
                r = adv.compute_rhs(u, bs, bb, pp.ghost_parameter_A)
                return (dbs, dbb, msolve(r))

            def body(u, tdt):
                t, dt = tdt
                bs = jnp.asarray(pp.exact_solution(sp, t))
                bb = jnp.asarray(pp.exact_solution(bp, t))
                _, _, u = timestepping.rk_step(f, t, dt, (bs, bb, u))
                return u, errs(u, t + dt, self.op_in, adv)

        @jax.jit
        def traj_chunk(u, tc, dc):
            u, es = jax.lax.scan(body, u, (tc, dc))
            return es, u

        u = self.interpolate_exact(pp.start_t)
        parts = [np.asarray(
            jax.jit(lambda v: errs(v, pp.start_t, self.op_in, adv))(u))[None]]
        start = 0
        if checkpoint_path and os.path.exists(checkpoint_path):
            (u, es_prev), _, meta = checkpoint.load(
                checkpoint_path, (u, np.zeros(1)))
            parts = [np.asarray(es_prev)]
            start = int(meta["next_s"])
        for ci, s in enumerate(range(start, len(ts), chunk)):
            es, u = traj_chunk(u, ts[s : s + chunk], dts[s : s + chunk])
            parts.append(np.asarray(es))
            if checkpoint_path and ((ci + 1) % checkpoint_every == 0
                                    or s + chunk >= len(ts)):
                checkpoint.save(
                    checkpoint_path, (u, np.concatenate(parts)),
                    float(ts[min(s + chunk, len(ts)) - 1]
                          + dts[min(s + chunk, len(ts)) - 1]),
                    meta={"next_s": s + chunk})
        self.u = u
        es = np.concatenate(parts)
        for step in range(es.shape[0]):
            t = float(pp.start_t if step == 0 else ts[step - 1]
                      + dts[step - 1])
            row = (step, t) + tuple(float(x) for x in es[step])
            self.rows[0].append(row)
            if self.verbose:
                print("%5d %8.5f %14.8e %14.8e %14.8e | %14.8e %14.8e "
                      "%14.8e" % row)
        return self.rows

    def _run_composite(self, delta_t):
        pp = self.params
        solves = (self._mass_solver(self.op_in), self._mass_solver(self.op_out))

        def f(t, y):
            bb0, u0, bb1, u1 = y
            _, dbb0 = self._bc_der(self.adv_in, t)
            _, dbb1 = self._bc_der(self.adv_out, t)
            r0 = self.adv_in.compute_rhs(u0, None, bb0, pp.ghost_parameter_A,
                                         u_other=u1)
            r1 = self.adv_out.compute_rhs(u1, None, bb1, pp.ghost_parameter_A,
                                          u_other=u0)
            return (dbb0, solves[0](r0), dbb1, solves[1](r1))

        step = jax.jit(lambda t, dt, y: timestepping.rk_step(f, t, dt, y))

        u0 = self.interpolate_exact(pp.start_t)
        u1 = self.interpolate_exact(pp.start_t)
        err = self.postprocess(pp.start_t, u0, INSIDE)
        err = self.postprocess(pp.start_t, u1, OUTSIDE)
        time = timestepping.DiscreteTime(pp.start_t, pp.end_t, delta_t)
        while (not time.is_at_end()) and err[2] < 1.0:
            t, dt = time.get_current_time(), time.get_next_step_size()
            _, bb0 = self._bc_values(self.adv_in, t)
            _, bb1 = self._bc_values(self.adv_out, t)
            bb0, u0, bb1, u1 = step(t, dt, (bb0, u0, bb1, u1))
            err = self.postprocess(t + dt, u0, INSIDE)
            err = self.postprocess(t + dt, u1, OUTSIDE)
            time.advance_time()
        return self.rows
