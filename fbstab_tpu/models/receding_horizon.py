"""Receding-horizon (closed-loop MPC) driver with warmstart carry.

The reference's documented workflow (README.md:20) is: one FBstabMpc object
per control loop, fed a new x0 each step, with the previous solution left in
the output variable as the next warmstart. This module packages that
workflow TPU-style:

 - the warmstart is an explicit solution pytree threaded between jitted
   solve() calls (the SURVEY.md section 5 "checkpoint/resume" equivalent —
   the carry is trivially checkpointable),
 - `shift_warmstart` implements the standard MPC shift-by-one-stage
   initialization (advance every stage sequence by one, repeat the terminal
   stage), which the reference leaves to the user,
 - `simulate` runs the full closed loop x+ = A x + B u* + c under the
   solver, batched over scenarios via vmap: the "receding-horizon sweep"
   workload of BASELINE.json config 2.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from fbstab_tpu.core.algorithm import fbstab_solve
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.models.mpc_qp import MPC_OPS, MpcQPData, mpc_dims
from fbstab_tpu.options import Options
from fbstab_tpu.utils.compile import vmem_jit


def shift_warmstart(x: Variable, data: MpcQPData) -> Variable:
    """Shifts a solution one stage forward for the next MPC step.

    Stage i takes the previous solution's stage i+1; the terminal stage is
    repeated. The constraint margin y is reinitialized as b - A z for the
    shifted z (the margin identity cannot be shifted algebraically because
    b is stage-dependent)."""
    N, nx, nu, nc = mpc_dims(data)
    ns = nx + nu

    def shift(a, n):
        s = a.reshape(N + 1, n)
        return jnp.concatenate([s[1:], s[-1:]], axis=0).reshape(-1)

    z = shift(x.z, ns)
    l = shift(x.l, nx)
    v = shift(x.v, nc)
    y = MPC_OPS.b_vec(data) - MPC_OPS.gemvA(data, z)
    return Variable(z=z, l=l, v=v, y=y)


class ClosedLoopResult(NamedTuple):
    """Trajectories from a receding-horizon run. Leading axis is time."""

    x: jnp.ndarray            # (T+1, nx) closed-loop states
    u: jnp.ndarray            # (T, nu) applied inputs
    eflag: jnp.ndarray        # (T,) per-step solver status
    residual: jnp.ndarray     # (T,)
    newton_iters: jnp.ndarray  # (T,) per-step Newton iterations
    prox_iters: jnp.ndarray   # (T,)


def simulate(data: MpcQPData, T: int, options: Options = Options(),
             x0: Optional[jnp.ndarray] = None,
             shift: bool = True) -> ClosedLoopResult:
    """Runs T closed-loop MPC steps, jit-compatible and vmappable.

    Each step solves the OCP from the current state, applies u*(0) to the
    plant x+ = A(0) x + B(0) u + c(0), and warmstarts the next solve from
    the (optionally shifted) previous solution. The plant model is the
    stage-0 dynamics of `data`, matching the reference's LTI simulation
    fixtures (ocp_generator.h SimulationInputs).
    """
    N, nx, nu, nc = mpc_dims(data)
    ns = nx + nu
    nz, nl, nv = (N + 1) * ns, (N + 1) * nx, (N + 1) * nc
    dtype = data.Q.dtype
    opts = options.validated()

    if x0 is None:
        x0 = data.x0
    x0 = jnp.asarray(x0, dtype)

    guess0 = Variable(
        z=jnp.zeros(nz, dtype), l=jnp.zeros(nl, dtype),
        v=jnp.zeros(nv, dtype), y=jnp.zeros(nv, dtype))

    def step(carry, _):
        xk, guess = carry
        d = data._replace(x0=xk)
        sol, core = fbstab_solve(MPC_OPS, d, guess.z, guess.l, guess.v, opts)
        u = sol.z.reshape(N + 1, ns)[0, nx:]
        x_next = data.A[0] @ xk + data.B[0] @ u + data.c[0]
        nxt = shift_warmstart(sol, d) if shift else sol
        return (x_next, nxt), (x_next, u, core.eflag, core.residual,
                               core.newton_iters, core.prox_iters)

    (_, _), (xs, us, eflags, residuals, newtons, proxs) = lax.scan(
        step, (x0, guess0), None, length=T)

    return ClosedLoopResult(
        x=jnp.concatenate([x0[None], xs], axis=0),
        u=us, eflag=eflags, residual=residuals,
        newton_iters=newtons, prox_iters=proxs)


def simulate_batch(data: MpcQPData, T: int, x0s: jnp.ndarray,
                   options: Options = Options(),
                   shift: bool = True, adaptive: bool = False,
                   phase1_newton_iters: int = 16,
                   phase2_size: Optional[int] = None) -> ClosedLoopResult:
    """Scenario sweep: T closed-loop steps for a batch of initial states
    over a shared plant/problem (leading axis of x0s = scenarios).

    Unlike vmap(simulate), the time loop lives OUTSIDE the batched solve:
    each control step is one `solve_mpc_qp_batch` call over all scenarios,
    so on TPU the whole sweep runs on the fused Pallas solver kernel
    (BASELINE config 2's production path). Output axes match the vmapped
    form: leading axis scenarios, then time.

    adaptive=True runs each control step through the device-side
    two-phase solve (parallel/adaptive.py) with the given phase-1 budget
    and phase-2 capacity (default B // 8) — the same tail-compaction
    that is the cold-solve headline configuration, composed under the
    scan with the plant Ruiz scaling still hoisted out of the loop.
    """
    from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch

    B = x0s.shape[0]
    N, nx, nu, nc = mpc_dims(data)
    ns = nx + nu
    nz, nl, nv = (N + 1) * ns, (N + 1) * nx, (N + 1) * nc
    dtype = data.Q.dtype
    opts = options.validated()

    batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
    x0b = jnp.asarray(x0s, dtype)

    z0 = jnp.zeros((B, nz), dtype)
    l0 = jnp.zeros((B, nl), dtype)
    v0 = jnp.zeros((B, nv), dtype)

    # The Ruiz scaling depends on every data field except x0/c, and the
    # closed loop only moves x0 — compute it ONCE here instead of every
    # control step inside the scan (it would otherwise run 12 Ruiz
    # iterations per step on identical plant data). Beyond the kernel
    # envelope the TPU f32 path runs unequilibrated (measured round-5
    # policy, models/mpc_qp.py beyond_envelope_noeq).
    from fbstab_tpu.models.mpc_qp import gate_mpc_options
    from fbstab_tpu.models.scaling import ruiz_mpc_scaling, scaling_engaged
    opts = gate_mpc_options(data, dtype, opts)
    scal = (jax.vmap(ruiz_mpc_scaling)(batch)
            if scaling_engaged(opts, dtype) else None)

    if adaptive:
        from fbstab_tpu.parallel.adaptive import (
            solve_mpc_qp_batch_adaptive_device)

        def solve_step(d, gz, gl, gv):
            return solve_mpc_qp_batch_adaptive_device(
                d, gz, gl, gv, opts,
                phase1_newton_iters=phase1_newton_iters,
                phase2_size=phase2_size, scaling=scal)
    else:
        def solve_step(d, gz, gl, gv):
            return solve_mpc_qp_batch(d, gz, gl, gv, opts, scaling=scal)

    def step(carry, _):
        xk, gz, gl, gv = carry
        d = batch._replace(x0=xk)
        sol, core = solve_step(d, gz, gl, gv)
        # With refinement engaged (opts.refine_steps on f32) the solution
        # is a double-float pair; the f32 view is all the next warmstart
        # needs, while core.residual reports the refined (contract-grade)
        # per-step value.
        from fbstab_tpu.models.refine import VariableDF
        if isinstance(sol, VariableDF):
            sol = sol.hi()
        u = sol.z.reshape(B, N + 1, ns)[:, 0, nx:]
        x_next = (jnp.einsum("ij,bj->bi", data.A[0], xk)
                  + jnp.einsum("ij,bj->bi", data.B[0], u) + data.c[0])
        if shift:
            nxt = jax.vmap(shift_warmstart)(sol, d)
        else:
            nxt = sol
        return ((x_next, nxt.z, nxt.l, nxt.v),
                (x_next, u, core.eflag, core.residual,
                 core.newton_iters, core.prox_iters))

    # Top-level compile carries the raised scoped-VMEM budget for the
    # fused kernels inside the scan (utils/compile.py: the env channel
    # alone is dropped by remote-compile tunnels). Under an outer jit
    # this is a plain nested jit.
    sweep = vmem_jit(lambda c: lax.scan(step, c, None, length=T))
    _, (xs, us, eflags, residuals, newtons, proxs) = sweep(
        (x0b, z0, l0, v0))

    tm = lambda a: jnp.moveaxis(a, 0, 1)          # time-major -> batch-major
    return ClosedLoopResult(
        x=jnp.concatenate([x0b[:, None], tm(xs)], axis=1),
        u=tm(us), eflag=tm(eflags), residual=tm(residuals),
        newton_iters=tm(newtons), prox_iters=tm(proxs))
