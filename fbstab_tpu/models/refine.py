"""Mixed-precision iterative refinement ("polish") for f32 solves.

The f32 TPU path stalls at a residual floor of ~1e-5: the KKT residual
evaluation itself rounds off there, so the solver cannot even see — let
alone cross — the reference's 1e-6 accuracy contract
(/root/reference/fbstab/fbstab_algorithm-impl.h:43-44). This module closes
the gap with classic iterative refinement:

  * the KKT residual at the current point is evaluated in double-float
    arithmetic (ops/doublefloat.py, ~4e-15 unit roundoff),
  * the correction is solved in f32 by the SAME fused Riccati/dense
    Newton-step path the solver uses (one outer FBstab iteration with the
    prox center at the current point: at x = xbar the inner residual IS
    the penalized-FB KKT residual, so x+ = x - (K + sigma-aug)^{-1} r(x)
    is a proximally regularized Newton polish whose fixed point is the
    true KKT point),
  * the iterate is carried as a double-float pair so f32 representation
    error does not floor the achievable residual.

Per step the refinement costs one Newton factor+solve plus a few
compensated matvec passes — a few percent of a cold solve. Convergence is
linear (measured rate ~0.12/step on the bench workload, consistent with
the sigma = 3e-4 proximal regularization): 3 steps take every bench
instance from the ~1e-5 f32 floor to <= 2e-7; 6 steps reach ~1e-10.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fbstab_tpu.core.variable import Variable
from fbstab_tpu.models import mpc_qp as _mpc
from fbstab_tpu.models.mpc_qp import MpcQPData, mpc_dims
from fbstab_tpu.options import Options
from fbstab_tpu.solver_out import ExitFlag
from fbstab_tpu.ops.doublefloat import (
    df,
    df_add,
    df_matvec,
    df_matvec_T,
    df_max0,
    df_min,
    df_mul,
    df_mul_f,
    df_neg,
    df_sqrt,
    df_sub,
    df_to,
)


class VariableDF(NamedTuple):
    """A primal-dual point carried in double-float precision. Each field
    is a (hi, lo) pair of f32 arrays; `hi` alone is the f32 rounding."""

    z: tuple
    l: tuple
    v: tuple
    y: tuple

    def hi(self) -> Variable:
        return Variable(z=self.z[0], l=self.l[0], v=self.v[0], y=self.y[0])

    def to_float64(self):
        """Host-side f64 materialization (hi + lo exactly)."""
        import numpy as np

        up = lambda p: (np.asarray(p[0], np.float64)
                        + np.asarray(p[1], np.float64))
        return Variable(z=up(self.z), l=up(self.l), v=up(self.v),
                        y=up(self.y))


def _stages(a, N1, n):
    """(B, N1*n) -> (B, N1, n)."""
    return a.reshape(a.shape[0], N1, n)


def _flat(p, N1xn):
    return (p[0].reshape(p[0].shape[0], N1xn),
            p[1].reshape(p[1].shape[0], N1xn))


def _df_stage(p, N1, n):
    return (_stages(p[0], N1, n), _stages(p[1], N1, n))


def _mpc_kkt_residual_df(d: MpcQPData, zx, zu, l, v, y, alpha):
    """Penalized-FB KKT residual blocks in double-float, stage-shaped.

    Matches the inner residual of core/residuals.py at xbar = x (the
    sigma terms vanish and ys = y), i.e. rz = f + Hz + G'l + A'v,
    rl = h - Gz, rv = pfb(y, v); reference full_residual.cc:49-74.
    All data arrays are batch-first stage stacks (B, N1, ...)."""
    # H z (mpc_data.cc:17-65): yx = Q x + S' u; yu = S x + R u.
    hx = df_add(df_matvec(d.Q, zx), df_matvec_T(d.S, zu))
    hu = df_add(df_matvec(d.S, zx), df_matvec(d.R, zu))

    # G' l (mpc_data.cc:153-199): x(i) = -l(i) + A(i)' l(i+1); u = B' l+.
    l_next = jax.tree.map(lambda a: a[:, 1:], l)
    atl = df_matvec_T(d.A, l_next)
    btl = df_matvec_T(d.B, l_next)
    zpad = lambda p, n: jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((a.shape[0], 1, n), a.dtype)], axis=1), p)
    gx = df_add(df_neg(l), zpad(atl, d.A.shape[-1]))
    gu = zpad(btl, d.B.shape[-1])

    # A' v (mpc_data.cc:201-238).
    ax = df_matvec_T(d.E, v)
    au = df_matvec_T(d.L, v)

    fx = df(d.q)
    fu = df(d.r)
    rzx = df_add(df_add(fx, hx), df_add(gx, ax))
    rzu = df_add(df_add(fu, hu), df_add(gu, au))

    # rl = h - G z (mpc_data.cc:107-151, 261-274): h = -(x0, c);
    # (Gz)(0) = -x(0); (Gz)(i) = A x(i-1) + B u(i-1) - x(i).
    zx_head = jax.tree.map(lambda a: a[:, :1], zx)
    zx_prev = jax.tree.map(lambda a: a[:, :-1], zx)
    zu_prev = jax.tree.map(lambda a: a[:, :-1], zu)
    zx_next = jax.tree.map(lambda a: a[:, 1:], zx)
    g_tail = df_sub(df_add(df_matvec(d.A, zx_prev),
                           df_matvec(d.B, zu_prev)), zx_next)
    cat = lambda p, q: jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=1), p, q)
    gz = cat(df_neg(zx_head), g_tail)
    hvec = df(-jnp.concatenate([d.x0[:, None, :], d.c], axis=1))
    rl = df_sub(hvec, gz)

    # rv = pfb(y, v) = alpha*(y + v - sqrt(y^2 + v^2))
    #      + (1-alpha)*max(0,y)*max(0,v)   (full_residual.cc:115-118).
    s = df_sqrt(df_add(df_mul(y, y), df_mul(v, v)))
    fb = df_sub(df_add(y, v), s)
    pen = df_mul(df_max0(y), df_max0(v))
    rv = df_add(df_mul_f(fb, jnp.asarray(alpha, d.q.dtype)),
                df_mul_f(pen, jnp.asarray(1.0 - alpha, d.q.dtype)))
    return rzx, rzu, rl, rv


def _mpc_pnr_norm_df(d: MpcQPData, zx, zu, l, v, y, alpha):
    """Penalized natural residual norm (the convergence metric,
    full_residual.cc:99-109) evaluated from the double-float point. The
    sum of squares runs in f32 over the accurate hi parts (no
    cancellation among squares)."""
    rzx, rzu, rl, _ = _mpc_kkt_residual_df(d, zx, zu, l, v, y, alpha)
    nr = df_min(y, v)
    pen = df_mul(df_max0(y), df_max0(v))
    rv = df_add(df_mul_f(nr, jnp.asarray(alpha, d.q.dtype)),
                df_mul_f(pen, jnp.asarray(1.0 - alpha, d.q.dtype)))
    sq = lambda p: jnp.sum(df_to(p) ** 2, axis=(1, 2))
    return jnp.sqrt(sq(rzx) + sq(rzu) + sq(rl) + sq(rv))


def refine_mpc_batch(data: MpcQPData, x: Variable,
                     options: Options = Options(), steps: int = 3
                     ) -> tuple[VariableDF, jnp.ndarray]:
    """Polishes a batched f32 MPC solution toward the 1e-6 contract.

    data: batch-first MpcQPData; x: the solver's returned Variable
    (B, ...). Returns (VariableDF refined point, (steps+1, B) penalized
    natural residual history). Jittable; dispatches the correction solve
    through the same fused Newton-step path as the solver.
    """
    opts = options.validated()
    N, nx, nu, nc = mpc_dims(data)
    N1 = N + 1
    dtype = x.z.dtype
    alpha = opts.alpha
    sigma = jnp.asarray(opts.sigma0, dtype)

    zs = x.z.reshape(x.z.shape[0], N1, nx + nu)
    zx = df(zs[:, :, :nx])
    zu = df(zs[:, :, nx:])
    l = df(_stages(x.l, N1, nx))
    v = df(_stages(x.v, N1, nc))

    bvec = df(-data.d)                     # b = -d (mpc_data.cc:276-289)

    def margin(zx_, zu_):
        """y = b - A z in double-float (full_variable.cc:47-53)."""
        az = df_add(df_matvec(data.E, zx_), df_matvec(data.L, zu_))
        return df_sub(bvec, az)

    y = margin(zx, zu)

    data_t = (_mpc.with_transposed(data)
              if not isinstance(data, _mpc.MpcQPDataT) else data)
    step_fn = _mpc._make_fused_step(float(alpha))

    def newton(zx_, zu_, l_, v_, y_, rzx, rzu, rl, rv):
        """One f32 correction solve from the df residual (negated hi)."""
        rz_flat = jnp.concatenate(
            [df_to(rzx), df_to(rzu)], axis=2).reshape(zs.shape[0], -1)
        rl_flat = df_to(rl).reshape(zs.shape[0], -1)
        rv_flat = df_to(rv).reshape(zs.shape[0], -1)
        vh, yh = df_to(v_).reshape(zs.shape[0], -1), \
            df_to(y_).reshape(zs.shape[0], -1)
        dz, dl, dv, dy, ok = jax.vmap(
            lambda dd, vv, yy, vb, rz_, rl_, rv_: step_fn(
                dd, vv, yy, vb, rz_, rl_, rv_, sigma),
            in_axes=(_mpc._DATA_T_AXES, 0, 0, 0, 0, 0, 0),
        )(data_t, vh, yh, vh, -rz_flat, -rl_flat, -rv_flat)
        return dz, dl, dv, ok

    history = [_mpc_pnr_norm_df(data, zx, zu, l, v, y, alpha)]
    for _ in range(steps):
        rzx, rzu, rl, rv = _mpc_kkt_residual_df(
            data, zx, zu, l, v, y, alpha)
        dz, dl, dv, ok = newton(zx, zu, l, v, y, rzx, rzu, rl, rv)
        dzs = dz.reshape(dz.shape[0], N1, nx + nu)
        # A failed correction solve (NaN step) leaves the lane unchanged.
        addf = lambda p, c: df_add(
            p, df(jnp.where(ok[:, None, None], c, jnp.zeros_like(c))))
        zx = addf(zx, dzs[:, :, :nx])
        zu = addf(zu, dzs[:, :, nx:])
        l = addf(l, _stages(dl, N1, nx))
        v = df_max0(addf(v, _stages(dv, N1, nc)))
        y = margin(zx, zu)
        history.append(_mpc_pnr_norm_df(data, zx, zu, l, v, y, alpha))

    refined = VariableDF(
        z=(jnp.concatenate([zx[0], zu[0]], axis=2).reshape(x.z.shape),
           jnp.concatenate([zx[1], zu[1]], axis=2).reshape(x.z.shape)),
        l=_flat(l, N1 * nx), v=_flat(v, N1 * nc), y=_flat(y, N1 * nc))
    return refined, jnp.stack(history)


# ------------------------------------------------------------------
# Dense QP refinement (same scheme; explicit-matrix compensated matvecs).
# ------------------------------------------------------------------

def _dense_kkt_residual_df(d, z, l, v, y, alpha):
    """pfb-flavored KKT residual in double-float for a batched dense QP
    (reference: full_residual.cc:49-74 at xbar = x)."""
    rz = df_add(df_add(df(d.f), df_matvec(d.H, z)),
                df_add(df_matvec_T(d.G, l), df_matvec_T(d.A, v)))
    rl = df_sub(df(d.h), df_matvec(d.G, z))
    s = df_sqrt(df_add(df_mul(y, y), df_mul(v, v)))
    fb = df_sub(df_add(y, v), s)
    pen = df_mul(df_max0(y), df_max0(v))
    a = jnp.asarray(alpha, d.f.dtype)
    rv = df_add(df_mul_f(fb, a), df_mul_f(pen, 1.0 - a))
    return rz, rl, rv


def _dense_pnr_norm_df(d, z, l, v, y, alpha):
    rz, rl, _ = _dense_kkt_residual_df(d, z, l, v, y, alpha)
    nr = df_min(y, v)
    pen = df_mul(df_max0(y), df_max0(v))
    a = jnp.asarray(alpha, d.f.dtype)
    rv = df_add(df_mul_f(nr, a), df_mul_f(pen, 1.0 - a))
    sq = lambda p: jnp.sum(df_to(p) ** 2, axis=-1)
    return jnp.sqrt(sq(rz) + sq(rl) + sq(rv))


def refine_dense_batch(data, x: Variable, options: Options = Options(),
                       steps: int = 3) -> tuple[VariableDF, jnp.ndarray]:
    """Polishes a batched f32 dense-QP solution toward the 1e-6 contract
    (see refine_mpc_batch; the correction solves use the quasi-definite
    block factorization of models/dense_qp.py under vmap)."""
    from fbstab_tpu.models import dense_qp as _dense

    opts = options.validated()
    dtype = x.z.dtype
    alpha = opts.alpha
    sigma = jnp.asarray(opts.sigma0, dtype)

    z, l, v = df(x.z), df(x.l), df(x.v)

    def margin(z_):
        return df_sub(df(data.b), df_matvec(data.A, z_))

    y = margin(z)

    def newton(z_, l_, v_, y_, rz, rl, rv):
        def one(d, zz, ll, vv, yy, rz_, rl_, rv_):
            xx = Variable(z=zz, l=ll, v=vv, y=yy)
            fact = _dense._factor(d, xx, xx, sigma, alpha)
            ok = _dense._factor_ok(fact)
            dx = _dense._newton_solve(d, fact, -rz_, -rl_, -rv_)
            return dx, ok

        return jax.vmap(one)(data, df_to(z_), df_to(l_), df_to(v_),
                             df_to(y_), df_to(rz), df_to(rl), df_to(rv))

    history = [_dense_pnr_norm_df(data, z, l, v, y, alpha)]
    for _ in range(steps):
        rz, rl, rv = _dense_kkt_residual_df(data, z, l, v, y, alpha)
        dx, ok = newton(z, l, v, y, rz, rl, rv)
        guard = lambda c: jnp.where(ok[:, None], c, jnp.zeros_like(c))
        z = df_add(z, df(guard(dx.z)))
        l = df_add(l, df(guard(dx.l)))
        v = df_max0(df_add(v, df(guard(dx.v))))
        y = margin(z)
        history.append(_dense_pnr_norm_df(data, z, l, v, y, alpha))

    return VariableDF(z=z, l=l, v=v, y=y), jnp.stack(history)


def _dense_norms(alpha, scal, z, l, v, y, rz, rl):
    """ORIGINAL-units penalized natural residual norm from dense
    loop-coordinate df blocks (exact pow2 row unscalings when `scal` is
    given; the nonlinear pfb row re-evaluated at the unscaled (y, v))."""
    dtype = df_to(z).dtype
    if scal is not None:
        from fbstab_tpu.models.scaling import _df_scale
        kc2 = scal.kc[:, None]
        v = _df_scale(v, scal.de / kc2)
        y = _df_scale(y, 1.0 / scal.de)
        rz = _df_scale(rz, 1.0 / (kc2 * scal.dz))
        rl = _df_scale(rl, 1.0 / scal.dl)
    a = jnp.asarray(alpha, dtype)
    nr = df_min(y, v)
    pen = df_mul(df_max0(y), df_max0(v))
    rv = df_add(df_mul_f(nr, a), df_mul_f(pen, 1.0 - a))
    sq = lambda p: jnp.sum(df_to(p) ** 2, axis=-1)
    return jnp.sqrt(sq(rz) + sq(rl) + sq(rv))


def _dense_refine_entry(data, x: Variable, options: Options, scal=None):
    """Loop-entry state, df KKT blocks, and ORIGINAL-units residual for
    the dense refinement loop. Called OUTSIDE the chunked lax.map (and
    outside any while body): XLA:CPU breaks the double-float error-free
    transforms inside compiled loop bodies (CLAUDE.md rule 10; lax.map
    lowers to scan), so the entry value — which is both REPORTED as
    raw_residual and used in the final accept decision — must never be
    computed in-map."""
    opts = options.validated()
    alpha = opts.alpha
    z0, l0, v0 = df(x.z), df(x.l), df(x.v)
    y0 = df_sub(df(data.b), df_matvec(data.A, z0))
    blocks0 = _dense_kkt_residual_df(data, z0, l0, v0, y0, alpha)
    res0 = _dense_norms(alpha, scal, z0, l0, v0, y0, *blocks0[:2])
    return (z0, l0, v0, y0), blocks0, res0


# Bounded non-monotone acceptance window for the product refinement
# loops (round 5). Long-horizon f32 corrections traverse a measured
# non-monotone transient (residual rises ~3x for a few steps before
# contracting — di N=480 on v5e) that a strictly monotone-from-best rule
# misreads as rejection, escalating sigma to its cap and stranding the
# lane. A trial within WALK_BAND of the best may advance the CURRENT
# point for up to WALK_STEPS consecutive non-improving steps; the
# returned answer always comes from the separately-tracked BEST point,
# and out-of-band steps (garbage corrections measure 50-100x best) still
# reject-and-escalate exactly as in round 4.
WALK_BAND = 8.0
WALK_STEPS = 6


def _walk_update(B, live, ok, res_p, res_best, since, t, sig,
                 state_p, cur, bst, rhs_p, rhs_c, rhs_b):
    """Shared step-acceptance bookkeeping for the product refinement
    loops (MPC and dense): improved / bounded-walk / reject-and-escalate
    classification plus the CURRENT/BEST state selection (full rationale
    in _refine_mpc_loop's body comment). All of state/rhs are pytrees of
    (B, ...) leaves; returns the updated
    (cur, bst, rhs_c, rhs_b, res_best, live, t, sig, since)."""
    finite = live & ok & jnp.isfinite(res_p)
    improved = finite & (res_p < res_best)
    walk = (finite & ~improved & (res_p < WALK_BAND * res_best)
            & (since < WALK_STEPS) & (t >= 1.0))
    advance = improved | walk
    rejected = live & ~advance
    sel = lambda m: lambda pn, po: jax.tree.map(
        lambda a, b: jnp.where(
            m.reshape((B,) + (1,) * (a.ndim - 1)), a, b), pn, po)
    cur = sel(advance)(state_p, sel(rejected)(bst, cur))
    rhs_c = sel(advance)(rhs_p, sel(rejected)(rhs_b, rhs_c))
    bst = sel(improved)(state_p, bst)
    rhs_b = sel(improved)(rhs_p, rhs_b)
    res_best = jnp.where(improved, res_p, res_best)
    since = jnp.where(improved | rejected, 0,
                      jnp.where(walk, since + 1, since))
    wind = rejected & (sig < 8e-2)
    t = jnp.where(improved | wind, 1.0,
                  jnp.where(walk, t, t * 0.5))
    sig = jnp.where(rejected, jnp.minimum(sig * 8.0, 8e-2), sig)
    live = live & (t >= 1.0 / 64.0)
    return cur, bst, rhs_c, rhs_b, res_best, live, t, sig, since


def _refine_dense_loop(data, state0, rhs0, res0, options: Options,
                       good, scal=None):
    """Dense analog of _refine_mpc_loop: data and the entry state in loop
    coordinates (the Ruiz-scaled problem when `scal` is given — exact
    pow2), early-exit while_loop on the ORIGINAL-units double-float
    residual. state0/res0 come from _dense_refine_entry, computed
    outside any compiled loop body; rhs0 is the entry KKT blocks
    collapsed to single-f32 (see _refine_mpc_loop).
    Returns (VariableDF in loop coords, res, steps)."""
    from fbstab_tpu.models import dense_qp as _dense

    opts = options.validated()
    z0, l0, v0, y0 = state0
    B = z0[0].shape[0]
    dtype = z0[0].dtype
    alpha = opts.alpha
    sigma = jnp.asarray(opts.refine_sigma or opts.sigma0, dtype)
    target = jnp.asarray(opts.refine_target, dtype)

    def margin(z_):
        return df_sub(df(data.b), df_matvec(data.A, z_))

    def norms(z, l, v, y, rz, rl):
        return _dense_norms(alpha, scal, z, l, v, y, rz, rl)

    def newton(zh, lh, vh, yh, rz, rl, rv, sig):
        # rz/rl/rv arrive as single-f32 RHS arrays (rhs_c).
        def one(d, zz, ll, vv, yy, rz_, rl_, rv_, sg):
            xx = Variable(z=zz, l=ll, v=vv, y=yy)
            fact = _dense._factor(d, xx, xx, sg, alpha)
            ok = _dense._factor_ok(fact)
            dx = _dense._newton_solve(d, fact, -rz_, -rl_, -rv_)
            return dx.z, dx.l, dx.v, ok

        return jax.vmap(one)(data, zh, lh, vh, yh, rz, rl, rv, sig)

    def body(carry):
        cur, bst, rhs_c, rhs_b, res_best, live, t, sig, since, i \
            = carry
        z, l, v, y = cur
        rz, rl, rv = rhs_c
        dz, dl, dv, ok = newton(df_to(z), df_to(l), df_to(v), df_to(y),
                                rz, rl, rv, sig)
        # Damped step with the bounded non-monotone walk window (full
        # rationale in _refine_mpc_loop's body).
        tm = (t * (live & ok).astype(dtype))[:, None]
        z_p = df_add(z, df(tm * dz))
        l_p = df_add(l, df(tm * dl))
        v_p = df_max0(df_add(v, df(tm * dv)))
        y_p = margin(z_p)
        blocks_p = _dense_kkt_residual_df(data, z_p, l_p, v_p, y_p, alpha)
        res_p = norms(z_p, l_p, v_p, y_p, *blocks_p[:2])
        rhs_p = tuple(df_to(b) for b in blocks_p)
        out = _walk_update(B, live, ok, res_p, res_best, since, t, sig,
                           (z_p, l_p, v_p, y_p), cur, bst, rhs_p, rhs_c,
                           rhs_b)
        return out + (i + 1,)

    def cond(carry):
        res_best, live = carry[4], carry[5]
        i = carry[9]
        pending = jnp.max(jnp.where(live, res_best, 0.0))
        return (i < opts.refine_steps) & (pending > target)

    sig0 = jnp.full((B,), sigma, dtype)
    ones = jnp.ones((B,), dtype)
    zeros_i = jnp.zeros((B,), jnp.int32)
    (_, (z, l, v, y), _, _, res, _, _, _, _, steps) = jax.lax.while_loop(
        cond, body, (state0, state0, rhs0, rhs0, res0, good, ones,
                     sig0, zeros_i, jnp.int32(0)))
    return VariableDF(z=z, l=l, v=v, y=y), res, steps


# ------------------------------------------------------------------
# Product-path integration: the batch dispatchers call these when
# Options.refine_steps > 0 on an f32 solve (the single_precision default),
# making the reference's 1e-6 accuracy contract the default TPU behavior
# rather than an opt-in (round-3 item; fbstab_algorithm-impl.h:43-44).
#
# The product loop differs from refine_mpc_batch above in three ways:
#  * it runs as a lax.while_loop with early exit once every converged
#    lane's ORIGINAL-UNITS double-float residual is under
#    Options.refine_target (well-scaled batches stop after ~2 steps;
#    badly-scaled ones get the full budget);
#  * with Options.equilibrate, the ENTIRE loop (double-float residuals
#    + f32 correction solves) runs on the Ruiz-equilibrated problem
#    (models/scaling.py). Because the scaling diagonals are rounded to
#    powers of two, the scaled problem is an EXACT floating-point
#    transform of the original — the loop's fixed point is exactly the
#    original solution, and the final unscale is an exponent shift on
#    both double-float limbs. Without equilibration the correction
#    solve's cond(K)*eps_f32 floor dominates on plants like the
#    ServoMotor (measured: refinement stalls at 3e-2 unscaled). The
#    early-exit norm is still evaluated in ORIGINAL units (exact
#    diagonal row unscaling for rz/rl; the nonlinear pfb row
#    re-evaluated at the exactly-unscaled (y, v)).
# ------------------------------------------------------------------


def _pnr_df_at_mpc(data: MpcQPData, sol, alpha):
    """Double-float penalized natural residual at a point in ORIGINAL
    coordinates (VariableDF pairs or a plain Variable), with the margin
    rebuilt as y = b - Az from the original data. Computed OUTSIDE the
    refinement while_loop: the loop-internal norm was measured to drift
    from the f64 truth at small residuals under some XLA compilations,
    so the REPORTED value is always this fresh evaluation."""
    N, nx, nu, nc = mpc_dims(data)
    N1 = N + 1
    as_pair = lambda a: a if isinstance(a, tuple) else df(a)
    z = as_pair(sol.z)
    B = z[0].shape[0]
    zs = lambda p: (p[0].reshape(B, N1, nx + nu),
                    p[1].reshape(B, N1, nx + nu))
    zst = zs(z)
    zx = (zst[0][:, :, :nx], zst[1][:, :, :nx])
    zu = (zst[0][:, :, nx:], zst[1][:, :, nx:])
    sh = lambda p, n: (p[0].reshape(B, N1, n), p[1].reshape(B, N1, n))
    l = sh(as_pair(sol.l), nx)
    v = sh(as_pair(sol.v), nc)
    bvec = df(-data.d)
    y = df_sub(bvec, df_add(df_matvec(data.E, zx), df_matvec(data.L, zu)))
    return _mpc_pnr_norm_df(data, zx, zu, l, v, y, alpha)


def _pnr_df_at_dense(data, sol, alpha):
    """Dense analog of _pnr_df_at_mpc."""
    as_pair = lambda a: a if isinstance(a, tuple) else df(a)
    z = as_pair(sol.z)
    l = as_pair(sol.l)
    v = as_pair(sol.v)
    y = df_sub(df(data.b), df_matvec(data.A, z))
    return _dense_pnr_norm_df(data, z, l, v, y, alpha)


def refine_engaged(options: Options, dtype) -> bool:
    """Whether the dispatchers should polish this solve. f32 only: the f64
    path meets the contract natively, and the double-float carry assumes
    two-f32 arithmetic."""
    return options.refine_steps > 0 and dtype == jnp.float32


def _mpc_norms(alpha, scal, zx, zu, l, v, y, rzx, rzu, rl):
    """ORIGINAL-units penalized natural residual norm from the MPC
    loop-coordinate df blocks (full_residual.cc:99-109). The rz/rl rows
    unscale diagonally (exact pow2 when `scal` is given); the nonlinear
    rv row is re-evaluated at the exactly-unscaled (y, v)."""
    dtype = df_to(zx).dtype
    if scal is not None:
        from fbstab_tpu.models.scaling import _df_scale
        kc3 = scal.kc[:, None, None]
        v = _df_scale(v, scal.de / kc3)       # v = de*v'/kc
        y = _df_scale(y, 1.0 / scal.de)       # y = y'/de
        rzx = _df_scale(rzx, 1.0 / (kc3 * scal.dx))  # rz rows: kc*Dz
        rzu = _df_scale(rzu, 1.0 / (kc3 * scal.du))
        rl = _df_scale(rl, scal.dx)           # rl rows: Dx^{-1}
    a = jnp.asarray(alpha, dtype)
    nr = df_min(y, v)
    pen = df_mul(df_max0(y), df_max0(v))
    rv = df_add(df_mul_f(nr, a), df_mul_f(pen, 1.0 - a))
    sq = lambda p: jnp.sum(df_to(p) ** 2, axis=(1, 2))
    return jnp.sqrt(sq(rzx) + sq(rzu) + sq(rl) + sq(rv))


def _mpc_refine_entry(data: MpcQPData, x: Variable, options: Options,
                      scal=None):
    """Loop-entry state, df KKT blocks, and ORIGINAL-units residual for
    the MPC refinement loop. Called OUTSIDE the chunked lax.map (and
    outside any while body): XLA:CPU breaks the double-float error-free
    transforms inside compiled loop bodies (CLAUDE.md rule 10; lax.map
    lowers to scan), so the entry value — which is both REPORTED as
    raw_residual and used in the final accept decision — must never be
    computed in-map."""
    opts = options.validated()
    N, nx, nu, nc = mpc_dims(data)
    N1 = N + 1
    B = x.z.shape[0]
    alpha = opts.alpha
    zs = x.z.reshape(B, N1, nx + nu)
    zx0 = df(zs[:, :, :nx])
    zu0 = df(zs[:, :, nx:])
    l0 = df(_stages(x.l, N1, nx))
    v0 = df(_stages(x.v, N1, nc))
    bvec = df(-data.d)
    y0 = df_sub(bvec, df_add(df_matvec(data.E, zx0),
                             df_matvec(data.L, zu0)))
    blocks0 = _mpc_kkt_residual_df(data, zx0, zu0, l0, v0, y0, alpha)
    res0 = _mpc_norms(alpha, scal, zx0, zu0, l0, v0, y0, *blocks0[:3])
    return (zx0, zu0, l0, v0, y0), blocks0, res0


def _refine_mpc_loop(data: MpcQPData, state0, rhs0, res0,
                     options: Options, good, scal=None):
    """Early-exit refinement loop (see block comment above).

    data and the entry state are in the LOOP's own coordinates: the
    Ruiz-scaled problem when `scal` (a batched MpcScaling) is given — an
    EXACT power-of-two transform, so the fixed point is the original
    problem's solution. The early-exit norm is evaluated in ORIGINAL
    units via the exact row unscalings. state0/res0 come from
    _mpc_refine_entry, computed outside any compiled loop body; rhs0 is
    the entry KKT blocks collapsed to single-f32 (`df_to`) — the carry
    only ever feeds the f32 correction RHS, so carrying the df pairs
    would waste half the loop state (the fresh per-iteration norm still
    evaluates full df blocks). good: (B,) lanes to drive to target.
    Returns (VariableDF in loop coords, res, steps), residuals in
    original units."""
    opts = options.validated()
    N, nx, nu, nc = mpc_dims(data)
    N1 = N + 1
    zx0, zu0, l0, v0, y0 = state0
    B = zx0[0].shape[0]
    dtype = zx0[0].dtype
    alpha = opts.alpha
    sigma = jnp.asarray(opts.refine_sigma or opts.sigma0, dtype)
    target = jnp.asarray(opts.refine_target, dtype)

    bvec = df(-data.d)

    def margin(zx_, zu_):
        az = df_add(df_matvec(data.E, zx_), df_matvec(data.L, zu_))
        return df_sub(bvec, az)

    def norms(zx, zu, l, v, y, rzx, rzu, rl):
        return _mpc_norms(alpha, scal, zx, zu, l, v, y, rzx, rzu, rl)

    data_t = (_mpc.with_transposed(data)
              if not isinstance(data, _mpc.MpcQPDataT) else data)
    step_fn = _mpc._make_fused_step(float(alpha))

    def body(carry):
        cur, bst, rhs_c, rhs_b, res_best, live, t, sig, since, i \
            = carry
        zx, zu, l, v, y = cur
        rzx, rzu, rl, rv = rhs_c
        rz_flat = jnp.concatenate([rzx, rzu], axis=2).reshape(B, -1)
        rl_flat = rl.reshape(B, -1)
        rv_flat = rv.reshape(B, -1)
        vh = df_to(v).reshape(B, -1)
        yh = df_to(y).reshape(B, -1)
        dz, dl, dv, _, ok = jax.vmap(
            lambda dd, vv, yy, vb, rz_, rl_, rv_, sg: step_fn(
                dd, vv, yy, vb, rz_, rl_, rv_, sg),
            in_axes=(_mpc._DATA_T_AXES, 0, 0, 0, 0, 0, 0, 0),
        )(data_t, vh, yh, vh, -rz_flat, -rl_flat, -rv_flat, sig)
        # Step acceptance (round-5 revision): the loop tracks a CURRENT
        # walking point and the BEST point separately.
        #  * improved (res_p < res_best): both advance; the returned
        #    answer only ever comes from `bst`, so the walk below cannot
        #    corrupt it.
        #  * walk (res_p within WALK_BAND x res_best, at most WALK_STEPS
        #    consecutive non-improving steps): CURRENT advances anyway.
        #    Long-horizon f32 corrections have a measured non-monotone
        #    transient (di N=480 on v5e: the residual RISES 1.6e-4 ->
        #    4.5e-4 over 4 steps before contracting ~1.4x/step to 5.6e-6
        #    by step 10); the round-4 monotone-from-best rule read that
        #    transient as rejection, escalated sigma to its cap, and
        #    stranded the whole batch at ~7e-5 with the budget burned.
        #  * rejected (NaN, out-of-band — e.g. the garbage f32
        #    corrections an aggressive sigma yields on the Spacecraft,
        #    measured at 50-100x the best residual, far outside the
        #    band — or walk budget exhausted): CURRENT returns to BEST
        #    and the round-4 dynamics apply unchanged — sigma escalates
        #    8x (the regularize-and-retry the reference leaves as a
        #    TODO, riccati_linear_solver.cc:129-130) with a damping
        #    reset while it has headroom (second wind), else the step
        #    halves; a lane dies only once sigma is capped AND the
        #    damping ladder re-exhausts. Well-conditioned lanes improve
        #    every step and never see any of this.
        tm = (t * (live & ok).astype(dtype))[:, None, None]
        dzs = dz.reshape(B, N1, nx + nu)
        addf = lambda p, c: df_add(p, df(tm * c))
        zx_p = addf(zx, dzs[:, :, :nx])
        zu_p = addf(zu, dzs[:, :, nx:])
        l_p = addf(l, _stages(dl, N1, nx))
        v_p = df_max0(addf(v, _stages(dv, N1, nc)))
        y_p = margin(zx_p, zu_p)
        blocks_p = _mpc_kkt_residual_df(data, zx_p, zu_p, l_p, v_p, y_p,
                                        alpha)
        res_p = norms(zx_p, zu_p, l_p, v_p, y_p, *blocks_p[:3])
        rhs_p = tuple(df_to(b) for b in blocks_p)
        out = _walk_update(B, live, ok, res_p, res_best, since, t, sig,
                           (zx_p, zu_p, l_p, v_p, y_p), cur, bst, rhs_p,
                           rhs_c, rhs_b)
        return out + (i + 1,)

    def cond(carry):
        res_best, live = carry[4], carry[5]
        i = carry[9]
        pending = jnp.max(jnp.where(live, res_best, 0.0))
        return (i < opts.refine_steps) & (pending > target)

    sig0 = jnp.full((B,), sigma, dtype)
    ones = jnp.ones((B,), dtype)
    zeros_i = jnp.zeros((B,), jnp.int32)
    (_, (zx, zu, l, v, y), _, _, res, _, _, _, _, steps) = \
        jax.lax.while_loop(
            cond, body,
            (state0, state0, rhs0, rhs0, res0, good, ones, sig0,
             zeros_i, jnp.int32(0)))

    zshape = (B, N1 * (nx + nu))
    refined = VariableDF(
        z=(jnp.concatenate([zx[0], zu[0]], axis=2).reshape(zshape),
           jnp.concatenate([zx[1], zu[1]], axis=2).reshape(zshape)),
        l=_flat(l, N1 * nx), v=_flat(v, N1 * nc), y=_flat(y, N1 * nc))
    return refined, res, steps


def _splice_df(refined: VariableDF, x: Variable, good) -> VariableDF:
    """Refined double-float point on `good` lanes; the solver's own point
    (lo = 0) elsewhere. Non-SUCCESS lanes must pass through untouched —
    an infeasibility exit returns a CERTIFICATE, not a solution
    (fbstab_algorithm-impl.h:209), and polishing it toward a KKT point
    would corrupt it."""
    g = good[:, None]
    pick = lambda p, raw: (jnp.where(g, p[0], raw),
                           jnp.where(g, p[1], jnp.zeros_like(raw)))
    return VariableDF(z=pick(refined.z, x.z), l=pick(refined.l, x.l),
                      v=pick(refined.v, x.v), y=pick(refined.y, x.y))


# Refinement runs its early-exit while_loop over fixed-size batch chunks
# (lax.map): the exit is per-chunk rather than batch-global, so one
# limit-cycling lane only keeps its OWN chunk stepping, and chunks whose
# lanes all satisfy the target early stop paying for anyone else's tail.
# Measured on v5e (round 4): with a batch-global exit the executed step
# count grows with batch size as the tail worsens (2 steps at B=8192, 6
# at 16384, 11 at 32768 — throughput REGRESSING from 19.5k to 13.3k
# QPs/s). The chunk size itself then swept AGAINST the original
# "keep 16 tiles in flight" intuition — SMALLER chunks win across every
# class (sigma=1e-5, contract path, QPs/s):
#
#   chunk      mpc B=8192   dense B=32768   copoly B=2048
#   2048         18,984        118,672          3,772
#   1024            —           140,552            —
#    512         19,458        185,659          3,985
#    256         20,183        211,264          4,274
#    128         21,186        205,706          3,948
#
# — both from finer early-exit granularity and from the smaller
# per-chunk loop state staying VMEM-resident across while iterations.
# The peaks differ slightly by class (mpc small-stage at 128; dense and
# large-stage mpc at 256); _refine_chunk picks per class/size.
REFINE_CHUNK_SMALL = 128
REFINE_CHUNK_LARGE = 256
# Per-lane MPC state rows above which the LARGE chunk wins (copoly-class
# stage dims; the headline class sits at 961 rows).
_LARGE_ROWS = 2048


def _refine_chunk(rows: int | None) -> int:
    """Measured per-class chunk size: rows=None (dense) or large-stage
    MPC -> 256; small-stage MPC -> 128. See the table above."""
    if rows is None or rows >= _LARGE_ROWS:
        return REFINE_CHUNK_LARGE
    return REFINE_CHUNK_SMALL


def _chunked_refine(loop_fn, B, args, rows=None):
    """Maps `loop_fn` (one of the _refine_*_loop functions, already
    closed over options/scal-handling) over fixed-size chunks of
    the batch. args: pytrees with leading batch axis B — including the
    precomputed entry state/blocks/res0 from _*_refine_entry, so no
    double-float entry evaluation ever runs inside the map body
    (CLAUDE.md rule 10). rows: per-lane state rows for the chunk-size
    policy (None = dense). Returns the loop outputs with per-lane (B,)
    step counts. Falls back to one global call when the batch does not
    split evenly."""
    ck = _refine_chunk(rows)
    if B <= ck or B % ck != 0:
        refined, res, steps = loop_fn(args)
        return refined, res, jnp.full((B,), steps, jnp.int32)
    C = B // ck
    resh = lambda t: jax.tree.map(
        lambda a: a.reshape((C, ck) + a.shape[1:]), t)
    refined, res, steps = jax.lax.map(loop_fn, resh(args))
    flat = lambda t: jax.tree.map(
        lambda a: a.reshape((B,) + a.shape[2:]), t)
    return (flat(refined), res.reshape(B),
            jnp.repeat(steps, ck, total_repeat_length=B))


def _finish_refine(refined, x, core, good, res0, res, steps):
    """Splice + report: refined point on lanes that are good AND actually
    improved; the raw point (lo = 0) elsewhere. `residual` becomes the
    double-float-verified original-units value at the RETURNED point;
    `raw_residual` the pre-refinement df-verified value — for EVERY lane
    (res0 is evaluated at the returned point of non-SUCCESS lanes too,
    which for an infeasibility certificate is as meaningful as any PNR
    and lets the dispatchers skip the f32 original-units re-evaluation
    entirely, solve_scaled_* skip_residual_rewrite). `steps` is the
    EXECUTED early-exit loop count (observability + the bench perf
    model, which must never be fed Options.refine_steps — that is only
    the maximum)."""
    use = good & (res <= res0)
    sol = _splice_df(refined, x, use)
    rdt = core.residual.dtype
    reported = jnp.where(use, res.astype(rdt), res0.astype(rdt))
    raw = res0.astype(rdt)
    # Per-lane (B,) step counts: every batch consumer (sharded
    # out_specs, adaptive scatter, ragged trim) treats it like the other
    # lane fields. With the chunked loop, lanes report their own chunk's
    # executed count.
    steps_b = jnp.broadcast_to(jnp.asarray(steps, jnp.int32),
                               core.eflag.shape)
    return sol, core._replace(residual=reported, raw_residual=raw,
                              refine_steps=steps_b)


def refine_solution_mpc(data, x: Variable, core, options: Options,
                        scal=None) -> tuple[VariableDF, object]:
    """Polishes SUCCESS lanes of a batched MPC solve and rewrites the
    CoreOut: `residual` becomes the double-float-verified penalized
    natural residual (ORIGINAL units, original data) at the refined
    point, `raw_residual` the pre-refinement value. With
    Options.equilibrate the corrections are preconditioned by the
    Ruiz-equilibrated problem (pass the solve's own batched MpcScaling
    as `scal` to skip recomputing it). Jittable; shard_map-safe."""
    opts = options.validated()
    base = (MpcQPData(**{f: getattr(data, f) for f in MpcQPData._fields})
            if isinstance(data, _mpc.MpcQPDataT) else data)
    good = core.eflag == int(ExitFlag.SUCCESS)
    B = x.z.shape[0]
    N, nx, nu, nc = mpc_dims(base)
    rows = (N + 1) * (nx + nu + nx + 2 * nc)
    # The entry evaluation (state + blocks + res0) runs HERE, outside
    # the chunked lax.map and outside any while body, where df
    # arithmetic compiles exactly on every backend (measured: XLA:CPU
    # breaks the error-free transforms only INSIDE compiled loop bodies
    # — the in-body norm underreports ~3x at the servo stall level, and
    # the monotone best-picker then selects noise-flattered values).
    # res0 is both REPORTED (raw_residual; residual for non-improved
    # lanes) and used in the accept decision, so it must be loop-clean;
    # the REPORTED refined residual is likewise a fresh loop-independent
    # evaluation at the returned point.
    if opts.equilibrate:
        from fbstab_tpu.models.scaling import (
            apply_mpc_scaling, ruiz_mpc_scaling, scale_mpc_variable,
            unscale_mpc_variable_df)
        if scal is None:
            scal = jax.vmap(ruiz_mpc_scaling)(base)
        sdata = jax.vmap(apply_mpc_scaling)(base, scal)
        xs = scale_mpc_variable(x, scal)        # exact (pow2 diagonals)
        state0, blocks0, res0 = _mpc_refine_entry(sdata, xs, opts, scal)
        rhs0 = tuple(df_to(b) for b in blocks0)
        refined_s, res, steps = _chunked_refine(
            lambda a: _refine_mpc_loop(a[0], a[1], a[2], a[3], opts,
                                       a[4], a[5]),
            B, (sdata, state0, rhs0, res0, good, scal), rows=rows)
        refined = unscale_mpc_variable_df(refined_s, scal)
    else:
        state0, blocks0, res0 = _mpc_refine_entry(base, x, opts)
        rhs0 = tuple(df_to(b) for b in blocks0)
        refined, res, steps = _chunked_refine(
            lambda a: _refine_mpc_loop(a[0], a[1], a[2], a[3], opts,
                                       a[4]),
            B, (base, state0, rhs0, res0, good), rows=rows)
    res = _pnr_df_at_mpc(base, refined, opts.alpha)
    return _finish_refine(refined, x, core, good, res0, res, steps)


def refine_solution_dense(data, x: Variable, core, options: Options,
                          scal=None) -> tuple[VariableDF, object]:
    """Dense-QP analog of refine_solution_mpc."""
    opts = options.validated()
    good = core.eflag == int(ExitFlag.SUCCESS)
    B = x.z.shape[0]
    # Entry evaluation outside the chunked map — see refine_solution_mpc
    # on while-body/in-map df drift.
    if opts.equilibrate:
        from fbstab_tpu.models.scaling import (
            apply_dense_scaling, ruiz_dense_scaling, scale_dense_variable,
            unscale_dense_variable_df)
        if scal is None:
            scal = jax.vmap(ruiz_dense_scaling)(data)
        sdata = jax.vmap(apply_dense_scaling)(data, scal)
        xs = scale_dense_variable(x, scal)
        state0, blocks0, res0 = _dense_refine_entry(sdata, xs, opts, scal)
        rhs0 = tuple(df_to(b) for b in blocks0)
        refined_s, res, steps = _chunked_refine(
            lambda a: _refine_dense_loop(a[0], a[1], a[2], a[3], opts,
                                         a[4], a[5]),
            B, (sdata, state0, rhs0, res0, good, scal))
        refined = unscale_dense_variable_df(refined_s, scal)
    else:
        state0, blocks0, res0 = _dense_refine_entry(data, x, opts)
        rhs0 = tuple(df_to(b) for b in blocks0)
        refined, res, steps = _chunked_refine(
            lambda a: _refine_dense_loop(a[0], a[1], a[2], a[3], opts,
                                         a[4]),
            B, (data, state0, rhs0, res0, good))
    res = _pnr_df_at_dense(data, refined, opts.alpha)
    return _finish_refine(refined, x, core, good, res0, res, steps)


