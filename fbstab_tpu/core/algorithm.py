"""The FBstab algorithm: proximally stabilized semismooth Newton for QPs.

TPU-native re-design of FBstabAlgorithm (fbstab/fbstab_algorithm.h:113 and
fbstab_algorithm-impl.h:113-304). The reference's pointer-linked mutable
workspaces become loop-carried pytrees; its data-dependent `for`/`break`
control flow becomes fixed-shape `lax.while_loop`s whose exits are status
codes in the carry. The whole solve is a single pure jittable function, so
`vmap` turns it into a masked-lockstep batch solver (converged instances'
carries freeze while the batch finishes) and `jit` compiles it once per
problem shape.

Semantics preserved from the reference (file:line cites into
/root/reference):
 - outer proximal loop with success/stall/maxiter/infeasibility exits
   (fbstab_algorithm-impl.h:158-224)
 - sigma is constant at sigma0 throughout a solve (impl.h:136)
 - inner semismooth Newton loop with dual exit conditions and the Newton
   budget check (impl.h:237-299)
 - nonmonotone backtracking linesearch with a 5-deep merit buffer
   (impl.h:277-298, fbstab_algorithm.h:175-181)
 - infeasibility certificates written into the output variable (impl.h:209)
 - the MAXITERATIONS best-of-(xi,xk) selection (impl.h:188-199)
The reference throws on factorization failure (impl.h:263-267); under jit
that becomes the per-instance ExitFlag.LINEAR_SOLVER_FAILED.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from fbstab_tpu.core.feasibility import check_feasibility
from fbstab_tpu.core.problem import ProblemOps
from fbstab_tpu.core.residuals import (
    inner_residual,
    penalized_natural_residual,
    residual_block_norms,
    residual_norm,
)
from fbstab_tpu.core.variable import Variable, project_duals, var_axpy, var_norm
from fbstab_tpu.options import Display, Options
from fbstab_tpu.solver_out import ExitFlag

# Depth of the nonmonotone linesearch merit history
# (reference: fbstab_algorithm.h:175 kNonMonotoneLineSearch).
NONMONOTONE_DEPTH = 5


def _dbg_print(stream, fmt, **kw):
    """Traced iteration printing, redirectable: with stream=None this is
    jax.debug.print (stdout); with a caller-supplied OutputStream the
    values route through an ordered jax.debug.callback into
    stream.print — the jit analog of the reference's CRTP OutputStream
    injection (tools/output_stream.h:15-38, fbstab_dense.h:136-149)."""
    if stream is None:
        jax.debug.print(fmt, **kw)
        return

    def _cb(**vals):
        stream.print(fmt.format(**vals) + "\n")

    jax.debug.callback(_cb, ordered=True, **kw)


class CoreOut(NamedTuple):
    """Traced portion of SolverOut (solve_time is added by the facades).

    `raw_residual` equals `residual` out of the core solver; the batch
    dispatchers overwrite `residual` with the double-float-verified value
    when mixed-precision refinement is engaged (Options.refine_steps) and
    keep the solver's own value here.
    """

    eflag: jnp.ndarray
    residual: jnp.ndarray
    newton_iters: jnp.ndarray
    prox_iters: jnp.ndarray
    initial_residual: jnp.ndarray
    raw_residual: jnp.ndarray
    # EXECUTED mixed-precision refinement iterations (scalar, batch-global:
    # the early-exit while_loop count, models/refine.py). 0 out of the core
    # solver and whenever refinement is off; Options.refine_steps is only
    # the MAXIMUM. Written by the batch dispatchers.
    refine_steps: jnp.ndarray = 0


def _select_tree(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


class _InnerState(NamedTuple):
    x: Variable
    Eo: jnp.ndarray           # KKT residual at the top of the last iteration
    i: jnp.ndarray
    newton_iters: jnp.ndarray
    merit_buf: jnp.ndarray    # (NONMONOTONE_DEPTH,)
    done: jnp.ndarray
    lin_fail: jnp.ndarray
    Ei_best: jnp.ndarray      # best inner residual so far (stall guard)
    stall_count: jnp.ndarray  # consecutive non-improving iterations
    Ei: jnp.ndarray           # last inner residual norm (display)
    t: jnp.ndarray            # last accepted step length (display)


def _solve_proximal_subproblem(ops: ProblemOps, data, b_vec, x0: Variable,
                               xbar: Variable, tol, sigma, Eouter,
                               newton_iters, opts: Options, stream=None):
    """Semismooth Newton on the proximal subproblem x = P(xbar, sigma).

    Reference: FBstabAlgorithm::SolveProximalSubproblem (impl.h:229-304).
    Returns (x, Eo, newton_iters, lin_fail).
    """
    dtype = x0.z.dtype
    alpha = opts.alpha

    def cond(s: _InnerState):
        return (s.i < opts.max_inner_iters) & ~s.done & ~s.lin_fail

    def body(s: _InnerState) -> _InnerState:
        ri = inner_residual(ops, data, s.x, xbar, sigma, alpha)
        Ei = residual_norm(ri)
        rk = penalized_natural_residual(ops, data, s.x, alpha)
        Eo = residual_norm(rk)

        # Detailed inner-iteration lines (reference: PrintDetailedLine,
        # fbstab_algorithm-impl.h:443-476: iter, previous step size, and the
        # blockwise norms of ri). Static gate: zero cost unless enabled.
        if opts.display_level == Display.ITER_DETAILED:
            bz, bl, bv = residual_block_norms(ri)
            _dbg_print(
                stream,
                "{i:>10}  {t:>10.6e}  {bz:>10.6e}  {bl:>10.6e}  "
                "{bv:>10.6e}", i=s.i, t=s.t, bz=bz, bl=bl, bv=bv)

        # Exit checks (impl.h:250-251 then :258).
        brk = (((Ei <= tol) & (Eo < Eouter)) | (Ei <= opts.inner_tol_min)
               | (s.newton_iters >= opts.max_newton_iters))

        # f32 stall guard (TPU extension, see Options.inner_stall_tol):
        # 3 consecutive iterations without relative progress => plateaued
        # at the roundoff floor, hand control back to the outer loop.
        if opts.inner_stall_tol > 0.0:
            improved = Ei < s.Ei_best * (1.0 - opts.inner_stall_tol)
            stall_count = jnp.where(improved, 0, s.stall_count + 1)
            brk = brk | (stall_count >= 3)
        else:
            stall_count = s.stall_count
        Ei_best = jnp.minimum(s.Ei_best, Ei)

        def newton_step(operand):
            x, merit_buf, n_iters = operand
            if ops.newton_step is not None:
                dx, ok = ops.newton_step(
                    data, x, xbar, sigma, alpha, -ri.z, -ri.l, -ri.v)
            else:
                fact = ops.factor(data, x, xbar, sigma, alpha)
                ok = ops.factor_ok(fact)
                dx = ops.newton_solve(data, fact, -ri.z, -ri.l, -ri.v)

            # Nonmonotone merit history (impl.h:277-280).
            current_merit = 0.5 * Ei * Ei
            buf = jnp.concatenate([current_merit[None], merit_buf[:-1]])
            if opts.nonmonotone_linesearch:
                m0 = jnp.max(buf)
            else:
                m0 = current_merit

            # Backtracking linesearch (impl.h:283-297).
            def ls_cond(ls):
                j, _, ls_done = ls
                return (j < opts.max_linesearch_iters) & ~ls_done

            def ls_body(ls):
                j, t, _ = ls
                xp = var_axpy(t, dx, x, b_vec)
                rp = inner_residual(ops, data, xp, xbar, sigma, alpha)
                np_ = residual_norm(rp)
                mp = 0.5 * np_ * np_
                accept = mp <= m0 - 2.0 * t * opts.eta * current_merit
                t_next = jnp.where(accept, t, t * opts.beta)
                return (j + 1, t_next, accept)

            _, t, _ = lax.while_loop(
                ls_cond, ls_body,
                (jnp.int32(0), jnp.asarray(1.0, dtype), jnp.bool_(False)))

            x_new = var_axpy(t, dx, x, b_vec)  # x <- x + t*dx (impl.h:298)
            # Count only successful Newton steps: the reference throws on
            # factorization failure BEFORE newton_iters_++ (impl.h:263-275).
            return x_new, buf, n_iters + ok.astype(n_iters.dtype), ~ok, t

        def skip_step(operand):
            x, merit_buf, n_iters = operand
            return x, merit_buf, n_iters, jnp.bool_(False), s.t

        x_new, buf_new, n_new, fail, t_new = lax.cond(
            brk, skip_step, newton_step, (s.x, s.merit_buf, s.newton_iters))

        if opts.display_level == Display.ITER_DETAILED:
            # Footer on exit (reference: PrintDetailedFooter, impl.h:476-489).
            def _footer(e, tl):
                _dbg_print(
                    stream,
                    "Exiting inner loop. Inner residual: {e:6.4e}, "
                    "Inner tolerance: {t:6.4e}", e=e, t=tl)
                return ()

            lax.cond(brk, lambda: _footer(Ei, tol), lambda: ())

        return _InnerState(
            x=x_new, Eo=Eo, i=s.i + 1, newton_iters=n_new,
            merit_buf=buf_new, done=brk, lin_fail=fail,
            Ei_best=Ei_best, stall_count=stall_count, Ei=Ei, t=t_new)

    init = _InnerState(
        x=x0,
        Eo=jnp.zeros((), dtype),
        i=jnp.int32(0),
        newton_iters=newton_iters,
        merit_buf=jnp.zeros((NONMONOTONE_DEPTH,), dtype),
        done=jnp.bool_(False),
        lin_fail=jnp.bool_(False),
        Ei_best=jnp.asarray(jnp.inf, dtype),
        stall_count=jnp.int32(0),
        Ei=jnp.zeros((), dtype),
        t=jnp.ones((), dtype),
    )
    final = lax.while_loop(cond, body, init)

    # Make duals non-negative (impl.h:301).
    x = project_duals(final.x)
    return x, final.Eo, final.newton_iters, final.lin_fail, final.Ei


class _OuterState(NamedTuple):
    xk: Variable
    dx: Variable
    inner_tol: jnp.ndarray
    ri_norm: jnp.ndarray      # last subproblem residual norm (display)
    Ek: jnp.ndarray
    newton_iters: jnp.ndarray
    prox_iters: jnp.ndarray
    k: jnp.ndarray
    done: jnp.ndarray
    eflag: jnp.ndarray
    out_x: Variable
    out_res: jnp.ndarray


def fbstab_solve(ops: ProblemOps, data, z0, l0, v0,
                 options: Options, stream=None
                 ) -> tuple[Variable, CoreOut]:
    """Solves one QP instance from the warmstart (z0, l0, v0).

    The guess semantics match FBstabAlgorithm::Solve (impl.h:113-224): the
    margin y is always recomputed as b - A z0 (CopyIntoVariable,
    impl.h:336-347), the returned Variable is the solution, the best iterate,
    or an infeasibility certificate depending on eflag.

    stream: optional OutputStream (utils/printing.py) that receives the
    ITER / ITER_DETAILED tables via an ordered debug callback, the jit
    analog of the reference's Solve(qp, &x, os) stream injection
    (fbstab_dense.h:136-149). None prints to stdout.

    vmap over (data, z0, l0, v0) gives the batched solver; the while loops
    batch into masked lockstep automatically.
    """
    opts = options.validated()
    dtype = z0.dtype
    sigma = jnp.asarray(opts.sigma0, dtype)  # constant per solve (impl.h:136)
    alpha = opts.alpha

    b_vec = ops.b_vec(data)

    combo_tol = opts.abs_tol + opts.rel_tol * (1.0 + ops.forcing_norm(data))

    # Initialization (impl.h:139-149).
    xk = Variable(z=z0, l=l0, v=v0, y=b_vec - ops.gemvA(data, z0))
    ones = Variable(z=jnp.ones_like(z0), l=jnp.ones_like(l0),
                    v=jnp.ones_like(v0), y=jnp.zeros_like(v0))
    dx0 = ones._replace(y=b_vec - ops.gemvA(data, ones.z))

    E0 = residual_norm(penalized_natural_residual(ops, data, xk, alpha))
    inner_tol0 = jnp.clip(E0, opts.inner_tol_min, opts.inner_tol_max)

    def cond(s: _OuterState):
        return (s.k < opts.max_prox_iters) & ~s.done

    def body(s: _OuterState) -> _OuterState:
        rk = penalized_natural_residual(ops, data, s.xk, alpha)
        Ek = residual_norm(rk)

        # Success / stall exit (impl.h:162-169).
        success = (Ek <= combo_tol) | (var_norm(s.dx) <= opts.stall_tol)

        # Outer iteration lines (reference: PrintIterLine,
        # fbstab_algorithm-impl.h:414-426 — printed both on the success
        # exit and when continuing, impl.h:165,172).
        if opts.display_level == Display.ITER:
            bz, bl, bv = residual_block_norms(rk)
            _dbg_print(
                stream,
                "{k:>12}  {n:>12}  {bz:>12.4e}  {bl:>12.4e}  {bv:>12.4e}  "
                "{ri:>12.4e}  {t:>12.4e}",
                k=s.prox_iters, n=s.newton_iters, bz=bz, bl=bl, bv=bv,
                ri=s.ri_norm, t=s.inner_tol)
        elif opts.display_level == Display.ITER_DETAILED:
            # Begin-subproblem header (reference: PrintDetailedHeader,
            # impl.h:446-460), printed only when continuing (impl.h:170-172).
            def _hdr():
                _dbg_print(
                    stream,
                    "Begin Prox Iter: {k}, Total Newton Iters: {n}, "
                    "Residual: {e:6.4e}\n"
                    "      Iter   Step Size        |rz|        |rl|"
                    "        |rv|",
                    k=s.prox_iters, n=s.newton_iters, e=Ek)
                return ()

            lax.cond(success, lambda: (), _hdr)

        # Subproblem tolerance update (impl.h:179-180).
        inner_tol = jnp.clip(s.inner_tol * opts.delta, opts.inner_tol_min, Ek)

        def run_subproblem(operand):
            xk, itol, Ek_, n_iters = operand
            return _solve_proximal_subproblem(
                ops, data, b_vec, xk, xk, itol, sigma, Ek_, n_iters, opts,
                stream)

        def skip_subproblem(operand):
            xk, _, _, n_iters = operand
            return (xk, jnp.zeros((), dtype), n_iters, jnp.bool_(False),
                    s.ri_norm)

        xi, Eo, n_iters, lin_fail, ri_norm = lax.cond(
            success, skip_subproblem, run_subproblem,
            (s.xk, inner_tol, Ek, s.newton_iters))

        # dx <- xi - xk, margin identity preserved (impl.h:201-203).
        dx = Variable(z=xi.z - s.xk.z, l=xi.l - s.xk.l, v=xi.v - s.xk.v,
                      y=xi.y - s.xk.y + b_vec)

        # Newton budget exit (impl.h:188-199): take the better of xi / xk and
        # report the residual recomputed there.
        newton_exhausted = n_iters >= opts.max_newton_iters
        better_xi = Eo < Ek
        x_budget = _select_tree(better_xi, xi, s.xk)
        res_budget = residual_norm(
            penalized_natural_residual(ops, data, x_budget, alpha))

        # Infeasibility detection on dx (impl.h:204-212).
        if opts.check_feasibility:
            feas = check_feasibility(ops, data, dx, opts.infeas_tol)
            p_inf = ~feas.primal_feasible
            d_inf = ~feas.dual_feasible
        else:
            p_inf = jnp.bool_(False)
            d_inf = jnp.bool_(False)
        infeasible = p_inf | d_inf
        eflag_infeas = jnp.where(
            p_inf & d_inf, jnp.int32(ExitFlag.PRIMAL_DUAL_INFEASIBLE),
            jnp.where(p_inf, jnp.int32(ExitFlag.PRIMAL_INFEASIBLE),
                      jnp.int32(ExitFlag.DUAL_INFEASIBLE)))

        # Resolve this iteration's outcome with the reference's priority:
        # success (checked before the subproblem) > linear solver failure
        # (thrown mid-subproblem) > newton budget > infeasibility > continue.
        done = success | lin_fail | newton_exhausted | infeasible

        eflag = jnp.where(
            success, jnp.int32(ExitFlag.SUCCESS),
            jnp.where(lin_fail, jnp.int32(ExitFlag.LINEAR_SOLVER_FAILED),
                      jnp.where(newton_exhausted,
                                jnp.int32(ExitFlag.MAXITERATIONS),
                                jnp.where(infeasible, eflag_infeas,
                                          s.eflag))))

        out_x = _select_tree(
            success, s.xk,
            _select_tree(lin_fail, s.xk,
                         _select_tree(newton_exhausted, x_budget,
                                      _select_tree(infeasible, dx, s.out_x))))
        out_res = jnp.where(
            success, Ek,
            jnp.where(lin_fail, Ek,
                      jnp.where(newton_exhausted, res_budget,
                                jnp.where(infeasible, Ek, s.out_res))))

        # Continue: x(k+1) = xi (impl.h:215-216).
        cont = ~done
        xk_next = _select_tree(cont, xi, s.xk)
        prox_next = jnp.where(cont, s.prox_iters + 1, s.prox_iters)

        return _OuterState(
            xk=xk_next, dx=dx, inner_tol=inner_tol, ri_norm=ri_norm, Ek=Ek,
            newton_iters=n_iters, prox_iters=prox_next, k=s.k + 1,
            done=done, eflag=eflag, out_x=out_x, out_res=out_res)

    # Column header, printed once per solve (reference: PrintIterHeader,
    # impl.h:428-441, called before the outer loop at impl.h:155).
    if opts.display_level == Display.ITER:
        _dbg_print(
            stream,
            "   prox iter  newton iters          |rz|          |rl|"
            "          |rv|     Inner res     Inner tol")

    init = _OuterState(
        xk=xk, dx=dx0,
        inner_tol=inner_tol0,
        ri_norm=jnp.zeros((), dtype),
        Ek=E0,
        newton_iters=jnp.int32(0),
        prox_iters=jnp.int32(0),
        k=jnp.int32(0),
        done=jnp.bool_(False),
        eflag=jnp.int32(ExitFlag.MAXITERATIONS),
        out_x=xk,
        out_res=E0,
    )
    final = lax.while_loop(cond, body, init)

    # Proximal budget exhausted without an exit (impl.h:219-223): return xk
    # with the (stale by one iteration, as in the reference) residual norm.
    out_x = _select_tree(final.done, final.out_x, final.xk)
    out_res = jnp.where(final.done, final.out_res, final.Ek)
    eflag = jnp.where(final.done, final.eflag,
                      jnp.int32(ExitFlag.MAXITERATIONS))

    out = CoreOut(
        eflag=eflag,
        residual=out_res,
        newton_iters=final.newton_iters,
        prox_iters=final.prox_iters,
        initial_residual=E0,
        raw_residual=out_res,
    )
    return out_x, out
