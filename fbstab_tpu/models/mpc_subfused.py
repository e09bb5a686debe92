"""Batched MPC solver with fused proximal subproblems.

The large-stage-dimension tier of `solve_mpc_qp_batch`: problems whose
per-tile VMEM working set fits the kernel budget but whose carried state
exceeds the full-solve kernel's register-pressure cap (e.g. the
CopolymerizationReactor class, nx=18/N=80,
/root/reference/fbstab/test/ocp_generator.cc:73-169). Each outer proximal
iteration launches ONE Pallas kernel per 128-instance tile that runs the
whole inner semismooth Newton loop — residuals, exit tests, Riccati
factor/solve, nonmonotone linesearch, iterate update — while the outer
proximal loop (success/stall exits, infeasibility certificates, budget
bookkeeping, fbstab_algorithm-impl.h:158-224) stays in XLA on (B,)-shaped
rows.

Why this split: the measured cost structure on the copoly class at B=512
is ~17.4 ms per lockstep Newton iteration on the Newton-step-kernel path,
of which ~12 ms is XLA while-body HLO dispatch around the kernel
(profiled via in-jit fori differencing). Fusing the subproblem removes
all per-Newton-iteration dispatch; what remains in XLA is per-PROX
-iteration work (a handful of batched einsums), ~4 iterations per solve.

Semantics: a batched transcription of core/algorithm.py::fbstab_solve's
outer loop — the body is applied to every lane and then select-gated on
the per-lane `(k < max_prox) & ~done` condition, which is exactly what
`vmap(lax.while_loop)` does, so per-instance value evolution matches
`vmap(fbstab_solve)`. The inactive-lane contract of the subproblem kernel
(xi = xbar, Eo = 0, counters unchanged) reproduces the vmapped
`lax.cond(success, skip, run)` select. Validated in interpret mode
against the XLA path (tests/test_subfused.py).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

from fbstab_tpu.core.algorithm import CoreOut
from fbstab_tpu.core.feasibility import check_feasibility
from fbstab_tpu.core.residuals import penalized_natural_residual, \
    residual_norm
from fbstab_tpu.core.variable import Variable, var_norm
from fbstab_tpu.options import Options
from fbstab_tpu.solver_out import ExitFlag
from fbstab_tpu.utils.compile import vmem_jit


def _bsel(pred, a, b):
    """Batched select: pred (B,), a/b (B,) or (B, n)."""
    if a.ndim > 1:
        pred = pred[:, None]
    return jnp.where(pred, a, b)


def _bsel_tree(pred, a, b):
    return jax.tree.map(lambda x, y: _bsel(pred, x, y), a, b)


@vmem_jit(static_argnames=("options", "interpret", "tile_b", "lowmem"))
def fbstab_mpc_solve_subfused(data, z0, l0, v0, options: Options,
                              interpret: bool = False, tile_b: int = 128,
                              lowmem: bool = False):
    """Batched MPC solve: XLA outer proximal loop + fused subproblem
    kernel. Same contract as vmap(fbstab_solve): returns
    (Variable, CoreOut) batch-first."""
    from fbstab_tpu.models.mpc_qp import (
        MPC_OPS, MpcQPData, MpcQPDataT, mpc_dims)
    from fbstab_tpu.ops.mpc_solve_pallas import (
        mpc_subproblem_fused, prep_subfused_data)

    if isinstance(data, MpcQPDataT):
        data = MpcQPData(**{k: getattr(data, k) for k in MpcQPData._fields})

    opts = options.validated()
    ops = MPC_OPS
    dtype = z0.dtype
    B = z0.shape[0]
    dims = mpc_dims(data)
    alpha = opts.alpha

    vpnr_norm = jax.vmap(
        lambda d, x: residual_norm(
            penalized_natural_residual(ops, d, x, alpha)))
    vgemvA = jax.vmap(ops.gemvA)
    vb_vec = jax.vmap(ops.b_vec)
    vfeas = jax.vmap(
        lambda d, dx: check_feasibility(ops, d, dx, opts.infeas_tol))
    vnorm = jax.vmap(var_norm)

    b_vec = vb_vec(data)

    # Initialization (impl.h:139-149).
    xk = Variable(z=z0, l=l0, v=v0, y=b_vec - vgemvA(data, z0))
    ones = Variable(z=jnp.ones_like(z0), l=jnp.ones_like(l0),
                    v=jnp.ones_like(v0), y=jnp.zeros_like(v0))
    dx0 = ones._replace(y=b_vec - vgemvA(data, ones.z))

    E0 = vpnr_norm(data, xk)
    inner_tol0 = jnp.clip(E0, opts.inner_tol_min, opts.inner_tol_max)

    # Loop-invariant kernel input tiles (transposes hoisted out of the
    # while loop by construction).
    data_tiles = prep_subfused_data(data, B, tile_b)

    def subproblem(xbar, itol_prev, dxn_prev, newton0, done):
        return mpc_subproblem_fused(
            data_tiles, dims, xbar, itol_prev, dxn_prev, newton0, done,
            opts, interpret=interpret, tile_b=tile_b, lowmem=lowmem)

    # Carry mirrors core/algorithm.py::_OuterState minus the display-only
    # ri_norm, with every scalar per-lane (B,). dx rides as its norm only
    # (the stall test is all the outer loop consumes; the full dx Variable
    # is rebuilt from xi - xk for the feasibility check).
    def cond(s):
        return jnp.any((s["k"] < opts.max_prox_iters) & ~s["done"])

    def body(s):
        lane = (s["k"] < opts.max_prox_iters) & ~s["done"]

        # The whole outer-iteration head (Ek / success / inner_tol,
        # impl.h:162-180) plus the inner Newton loop runs IN-KERNEL so
        # every quantity feeding an exit decision comes from one
        # arithmetic chain (mixing XLA- and kernel-computed residuals
        # flips near-threshold exits). Inactive lanes (done input true,
        # or in-kernel success) return xi = xk, Eo = 0, counters and dxn
        # unchanged — the skip-branch values of the vmapped lax.cond.
        (xi, Eo, n_iters, lin_fail, Ek, success, inner_tol,
         dxn) = subproblem(
            s["xk"], s["inner_tol"], s["dxn"], s["newton_iters"], ~lane)

        # dx <- xi - xk, margin identity preserved (impl.h:201-203).
        dx = Variable(z=xi.z - s["xk"].z, l=xi.l - s["xk"].l,
                      v=xi.v - s["xk"].v, y=xi.y - s["xk"].y + b_vec)

        newton_exhausted = n_iters >= opts.max_newton_iters
        better_xi = Eo < Ek
        x_budget = _bsel_tree(better_xi, xi, s["xk"])
        res_budget = vpnr_norm(data, x_budget)

        if opts.check_feasibility:
            feas = vfeas(data, dx)
            p_inf = ~feas.primal_feasible
            d_inf = ~feas.dual_feasible
        else:
            p_inf = jnp.zeros((B,), bool)
            d_inf = jnp.zeros((B,), bool)
        infeasible = p_inf | d_inf
        eflag_infeas = jnp.where(
            p_inf & d_inf, jnp.int32(ExitFlag.PRIMAL_DUAL_INFEASIBLE),
            jnp.where(p_inf, jnp.int32(ExitFlag.PRIMAL_INFEASIBLE),
                      jnp.int32(ExitFlag.DUAL_INFEASIBLE)))

        done = success | lin_fail | newton_exhausted | infeasible
        eflag = jnp.where(
            success, jnp.int32(ExitFlag.SUCCESS),
            jnp.where(lin_fail, jnp.int32(ExitFlag.LINEAR_SOLVER_FAILED),
                      jnp.where(newton_exhausted,
                                jnp.int32(ExitFlag.MAXITERATIONS),
                                jnp.where(infeasible, eflag_infeas,
                                          s["eflag"]))))

        out_x = _bsel_tree(
            success, s["xk"],
            _bsel_tree(lin_fail, s["xk"],
                       _bsel_tree(newton_exhausted, x_budget,
                                  _bsel_tree(infeasible, dx, s["out_x"]))))
        out_res = jnp.where(
            success, Ek,
            jnp.where(lin_fail, Ek,
                      jnp.where(newton_exhausted, res_budget,
                                jnp.where(infeasible, Ek, s["out_res"]))))

        cont = ~done
        xk_next = _bsel_tree(cont, xi, s["xk"])
        prox_next = jnp.where(cont, s["prox_iters"] + 1, s["prox_iters"])

        new = dict(
            xk=xk_next, dxn=dxn, inner_tol=inner_tol, Ek=Ek,
            newton_iters=n_iters, prox_iters=prox_next, k=s["k"] + 1,
            done=done, eflag=eflag, out_x=out_x, out_res=out_res)
        # Freeze lanes whose while condition is false — the vmapped
        # while_loop's select semantics.
        return _bsel_tree(lane, new, s)

    init = dict(
        xk=xk, dxn=vnorm(dx0),
        inner_tol=inner_tol0,
        Ek=E0,
        newton_iters=jnp.zeros((B,), jnp.int32),
        prox_iters=jnp.zeros((B,), jnp.int32),
        k=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        eflag=jnp.full((B,), jnp.int32(ExitFlag.MAXITERATIONS)),
        out_x=xk,
        out_res=E0,
    )
    final = lax.while_loop(cond, body, init)

    # Proximal budget exhausted without an exit (impl.h:219-223).
    out_x = _bsel_tree(final["done"], final["out_x"], final["xk"])
    out_res = jnp.where(final["done"], final["out_res"], final["Ek"])
    eflag = jnp.where(final["done"], final["eflag"],
                      jnp.int32(ExitFlag.MAXITERATIONS))

    out = CoreOut(
        eflag=eflag,
        residual=out_res,
        newton_iters=final["newton_iters"],
        prox_iters=final["prox_iters"],
        initial_residual=E0,
        raw_residual=out_res,
        refine_steps=jnp.zeros_like(eflag),   # per-lane (B,)
    )
    return out_x, out
