"""Differentiable QP solving: implicit differentiation through FBstab.

A capability beyond the reference (which is a pure C++ solver): the
solution map theta -> x*(theta) of a convex QP is made differentiable in
the OptNet sense (Amos & Kolter 2017) by applying the implicit function
theorem to the solver's OWN optimality system — the penalized
Fischer-Burmeister residual

    F(x, theta) = ( Hz + f + G'l + A'v,
                    h - Gz,
                    pfb(b - Az, v) )          = 0  at x = x*(theta),

which characterizes optimality for any alpha (pfb(a, b) = 0 iff a >= 0,
b >= 0, ab = 0). Differentiating through F instead of the raw
complementarity system has two advantages:

 - dF/dx is exactly the solver's Newton matrix J_sigma at
   (x, xbar = x) up to the O(sigma) proximal regularization, so the
   backward pass REUSES each QP class's factor/newton_solve machinery
   (dense block-Cholesky, MPC Riccati recursion, sparse native LDL') —
   one extra factorization + one solve per backward, O(N) for MPC.
 - the PFB generalized gradient is bounded at the active set (no 1/y or
   1/v blowups), so degenerate/weakly-active constraints degrade to a
   subgradient instead of NaNs.

The transpose system J_sigma' w = xbar_cot reduces to the SAME
condensed quasi-definite system K = [E G'; G -sigma*I] the forward
Newton step factors (derivation: eliminate wv from the third block row;
the off-diagonal sign flips absorb into wl -> -wl), so

    dx = newton_solve(data, fact, rz = z_cot, rl = -l_cot,
                      rv = -gamma * v_cot)
    wz = dx.z,  wl = -dx.l,  wv = (v_cot - A wz) / mus

and the parameter cotangent is theta_cot = -(dF/dtheta)' w, computed by
jax.vjp of theta -> F(x*, theta) — which routes gradients into whatever
pytree the QP class uses (explicit H/f/G/h/A/b for dense, per-stage
Q/R/S/q/r/A/B/c/E/L/d/x0 for MPC: differentiable MPC falls out for
free, sparse CSR value arrays for FBstabSparse).

The O(sigma_vjp) bias from using J_sigma in place of J_0 is the price of
guaranteed invertibility (mus = mu0 + sigma*gamma > 0 on active rows);
with the f64 default of 1e-9 it is far below solve tolerance. Gradients
are defined where the solution is unique and locally Lipschitz; at
degeneracies they are a particular subgradient (the PFB C-differential
element the solver itself uses).

Gradients are meaningful only where the solve SUCCEEDS: for infeasible/
unbounded problems the returned point is a certificate, not a solution,
and the implicit-function premise F(x*, theta) = 0 does not hold — check
eflag through the regular (non-diff) API when feasibility is in doubt.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from fbstab_tpu.core.algorithm import fbstab_solve
from fbstab_tpu.core.problem import ProblemOps
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.options import Options


@functools.lru_cache(maxsize=64)
def make_differentiable_solver(ops: ProblemOps, options: Options = Options(),
                               sigma_vjp: float = 1e-9):
    """A function (data, z0, l0, v0) -> (z, l, v) that solves the QP and
    supports reverse-mode differentiation w.r.t. `data` via implicit
    differentiation (gradients w.r.t. the warmstart are zero: the
    converged solution does not depend on it).

    Use `sigma_vjp ~ 1e-5` for float32 data. Compose freely with jit,
    vmap, and outer autodiff graphs (e.g. y = b - Az downstream of the
    returned (z, l, v) stays differentiable through b and A).
    """
    # The solve saturates out-of-range options (fbstab_solve validates);
    # the backward Newton matrix must use the SAME alpha the solution's
    # PFB weights were built with.
    options = options.validated()
    alpha = options.alpha

    @jax.custom_vjp
    def solve(data, z0, l0, v0):
        x, _ = fbstab_solve(ops, data, z0, l0, v0, options)
        return x.z, x.l, x.v

    def fwd(data, z0, l0, v0):
        out = solve(data, z0, l0, v0)
        return out, (data, *out)

    def bwd(res, cot):
        data, z, l, v = res
        theta_cot = _implicit_bwd(ops, alpha, sigma_vjp, data, z, l, v, cot)
        zeros = (jnp.zeros_like(z), jnp.zeros_like(l), jnp.zeros_like(v))
        return (theta_cot, *zeros)

    solve.defvjp(fwd, bwd)
    return solve


def _implicit_bwd(ops, alpha, sigma_vjp, data, z, l, v, cot):
    """Single-instance backward pass: theta_cot = -(dF/dtheta)' J^{-T} cot
    through the class's own Newton machinery (see module docstring)."""
    z_cot, l_cot, v_cot = cot
    y = ops.b_vec(data) - ops.gemvA(data, z)
    xstar = Variable(z=z, l=l, v=v, y=y)
    sig = jnp.asarray(sigma_vjp, z.dtype)

    # w = J_sigma^{-T} cot.
    fact = ops.factor(data, xstar, xstar, sig, alpha)
    dx = ops.newton_solve(data, fact, z_cot, -l_cot,
                          -(fact.gamma * v_cot))
    wz = dx.z
    wl = -dx.l
    # The rv-row cotangent enters theta only through
    # dy/dtheta = db - dA z, scaled by the PFB gradient gamma:
    # gamma*wv = gamma*(v_cot - A wz)/mus = -dx.v exactly (see the
    # dual-recovery identity in newton_solve). Using dx.v instead of
    # autodiffing pfb() keeps the guarded C-differential the solver
    # itself uses (jax.vjp of the raw sqrt NaNs at y = v = 0).
    y_cot = dx.v

    def residual_map(d):
        rz = (ops.gemvH(d, z) + ops.f_vec(d) + ops.gemvGT(d, l)
              + ops.gemvAT(d, v))
        rl = ops.h_vec(d) - ops.gemvG(d, z)
        ylin = ops.b_vec(d) - ops.gemvA(d, z)
        return rz, rl, ylin

    _, vjp_theta = jax.vjp(residual_map, data)
    (theta_cot,) = vjp_theta((-wz, -wl, y_cot))
    return theta_cot


@functools.lru_cache(maxsize=64)
def make_differentiable_batch_solver(ops: ProblemOps, batch_solve,
                                     options: Options = Options(),
                                     sigma_vjp: float = 1e-9):
    """Batch-level differentiable solve: the FORWARD pass runs
    `batch_solve(data, z0, l0, v0, options)` — e.g. solve_mpc_qp_batch,
    which dispatches to the fused Pallas kernels on TPU — while the
    backward pass vmaps the generic implicit-differentiation math over
    the batch (XLA path; one factor + one solve per instance). This is
    how the differentiable layer rides the production kernel path: fast
    fused forward, exact implicit backward."""
    options = options.validated()
    alpha = options.alpha

    @jax.custom_vjp
    def solve(data, z0, l0, v0):
        x, _ = batch_solve(data, z0, l0, v0, options)
        from fbstab_tpu.models.refine import VariableDF
        if isinstance(x, VariableDF):
            # Refinement engaged (options.refine_steps on f32): the f32
            # view of the polished point is the most accurate primal the
            # implicit backward can consume (the lo parts are below the
            # f32 gradient noise floor).
            x = x.hi()
        return x.z, x.l, x.v

    def fwd(data, z0, l0, v0):
        out = solve(data, z0, l0, v0)
        return out, (data, *out)

    def bwd(res, cot):
        data, z, l, v = res
        theta_cot = jax.vmap(
            lambda d, zz, ll, vv, zc, lc, vc: _implicit_bwd(
                ops, alpha, sigma_vjp, d, zz, ll, vv, (zc, lc, vc))
        )(data, z, l, v, *cot)
        zeros = (jnp.zeros_like(z), jnp.zeros_like(l), jnp.zeros_like(v))
        return (theta_cot, *zeros)

    solve.defvjp(fwd, bwd)
    return solve


def solve_mpc_qp_batch_diff(data, z0, l0, v0, options: Options = Options(),
                            sigma_vjp: Optional[float] = None):
    """Differentiable BATCHED MPC solve: forward through the
    solve_mpc_qp_batch dispatch (fused Pallas kernels on TPU f32),
    backward through the vmapped implicit Riccati math."""
    from fbstab_tpu.models.mpc_qp import MPC_OPS, solve_mpc_qp_batch
    sig = _default_sig(sigma_vjp, z0.dtype)
    return make_differentiable_batch_solver(
        MPC_OPS, solve_mpc_qp_batch, options, sig)(data, z0, l0, v0)


@functools.lru_cache(maxsize=64)
def make_jvp_solver(ops: ProblemOps, options: Options = Options(),
                    sigma_vjp: float = 1e-9):
    """Forward-mode counterpart of make_differentiable_solver: a
    custom_jvp solve (data, z0, l0, v0) -> (z, l, v) supporting
    jax.jvp / jax.jacfwd w.r.t. `data` (JAX does not allow custom_jvp
    and custom_vjp on one function, so forward mode is a separate
    wrapper over the same implicit-function machinery).

    The tangent rule solves the SAME Newton system forward:
    x_dot = J_sigma^{-1} (-dF/dtheta theta_dot), with the rv-row tangent
    gamma * (db - dA z) folded in via the solver's guarded PFB gradient.
    jacfwd of the first control w.r.t. x0 is the implicit MPC feedback
    gain — the classic sensitivity use-case this enables.
    """
    options = options.validated()
    alpha = options.alpha

    @jax.custom_jvp
    def solve(data, z0, l0, v0):
        x, _ = fbstab_solve(ops, data, z0, l0, v0, options)
        return x.z, x.l, x.v

    @solve.defjvp
    def solve_jvp(primals, tangents):
        data, z0, l0, v0 = primals
        data_dot = tangents[0]
        z, l, v = solve(data, z0, l0, v0)
        y = ops.b_vec(data) - ops.gemvA(data, z)
        xstar = Variable(z=z, l=l, v=v, y=y)
        sig = jnp.asarray(sigma_vjp, z.dtype)
        fact = ops.factor(data, xstar, xstar, sig, alpha)

        def residual_map(d):
            rz = (ops.gemvH(d, z) + ops.f_vec(d) + ops.gemvGT(d, l)
                  + ops.gemvAT(d, v))
            rl = ops.h_vec(d) - ops.gemvG(d, z)
            ylin = ops.b_vec(d) - ops.gemvA(d, z)
            return rz, rl, ylin

        # dF/dtheta theta_dot; the pfb row is gamma * ylin_dot.
        _, (rz_d, rl_d, yl_d) = jax.jvp(residual_map, (data,), (data_dot,))
        dx = ops.newton_solve(data, fact, -rz_d, -rl_d,
                              -(fact.gamma * yl_d))
        return (z, l, v), (dx.z, dx.l, dx.v)

    return solve


def mpc_feedback_gain(data, options: Options = Options(),
                      sigma_vjp: Optional[float] = None):
    """The implicit MPC feedback law's local gain K = d u0* / d x0 at
    the solution (nu, nx), via one forward-mode sensitivity solve per
    state dimension. The classic use: deploy u = u0* + K (x - x0)
    between re-solves, or inspect the active-set-dependent gain."""
    from fbstab_tpu.models.mpc_qp import MPC_OPS, mpc_dims
    N, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    dtype = data.x0.dtype
    sig = _default_sig(sigma_vjp, dtype)
    solve = make_jvp_solver(MPC_OPS, options, sig)
    zeros = (jnp.zeros((nz,), dtype), jnp.zeros((nl,), dtype),
             jnp.zeros((nv,), dtype))

    def u0_of_x0(x0):
        z, _, _ = solve(data._replace(x0=x0), *zeros)
        return z[nx:nx + nu]

    return jax.jacfwd(u0_of_x0)(data.x0)


def solve_dense_qp_diff(data, z0, l0, v0, options: Options = Options(),
                        sigma_vjp: Optional[float] = None):
    """Differentiable dense solve: (z, l, v) with gradients w.r.t. every
    field of DenseQPData (H, f, G, h, A, b)."""
    from fbstab_tpu.models.dense_qp import DENSE_OPS
    sig = _default_sig(sigma_vjp, z0.dtype)
    return make_differentiable_solver(DENSE_OPS, options, sig)(
        data, z0, l0, v0)


def solve_mpc_qp_diff(data, z0, l0, v0, options: Options = Options(),
                      sigma_vjp: Optional[float] = None):
    """Differentiable MPC solve (differentiable MPC layer): gradients
    w.r.t. every stage sequence of MpcQPData (Q, R, S, q, r, A, B, c, E,
    L, d) and the initial state x0; the backward pass is one Riccati
    factorization + one O(N) solve."""
    from fbstab_tpu.models.mpc_qp import MPC_OPS
    sig = _default_sig(sigma_vjp, z0.dtype)
    return make_differentiable_solver(MPC_OPS, options, sig)(
        data, z0, l0, v0)


def solve_sparse_qp_diff(pattern, data, z0, l0, v0,
                         options: Options = Options(),
                         sigma_vjp: Optional[float] = None):
    """Differentiable sparse solve: gradients w.r.t. the CSR value arrays
    (Hx, f, Gx, h, Ax, b) of SparseQPData."""
    sig = _default_sig(sigma_vjp, z0.dtype)
    return make_differentiable_solver(pattern.ops, options, sig)(
        data, z0, l0, v0)


def _default_sig(sigma_vjp, dtype) -> float:
    if sigma_vjp is not None:
        return float(sigma_vjp)
    return 1e-5 if dtype == jnp.float32 else 1e-9
