"""Problem equilibration (diagonal scaling) for f32 conditioning.

The reference is f64-only and ships no scaling; several of its own
benchmark plants are badly scaled for f32 (ServoMotor: cost spread
Q=1000 vs R=1e-4 plus constraint rows at the 1280 scale,
ocp_generator.cc:245-315; SpacecraftRelativeMotion: thrust bounds 1e-3
against positions at the 1-10 scale). In f32 the Newton factorization's
accuracy floor is cond(K) * eps_f32, which on those plants sits ORDERS
above the 1e-6 contract — no amount of iterative refinement converges
because the correction solve itself is the bottleneck (measured: servo
refinement stalls at 3e-2). Ruiz-style equilibration fixes the root
cause; it is standard practice in first-order/semi-smooth QP solvers
(e.g. OSQP) and a required component of a production f32 path.

MPC structure preservation: the Riccati solver relies on the dynamics
blocks G = [-I; A B -I; ...] keeping their -I diagonal. A per-stage
diagonal scaling x(s) = Dx_s x'(s), u(s) = Du_s u'(s) with the dynamics
ROW block s scaled by Dx_s^{-1} preserves it exactly:

    A'_s = Dx_{s+1}^{-1} A_s Dx_s      B'_s = Dx_{s+1}^{-1} B_s Du_s
    c'_s = Dx_{s+1}^{-1} c_s           x0'  = Dx_0^{-1} x0
    Q'_s = kc Dx_s Q_s Dx_s            R'_s = kc Du_s R_s Du_s
    S'_s = kc Du_s S_s Dx_s            q'_s = kc Dx_s q_s,  r' likewise
    E'_s = De_s E_s Dx_s               L'_s = De_s L_s Du_s
    d'_s = De_s d_s

i.e. the scaled problem is another MPC QP of the same class. Solution
maps: z = Dz z'; duals l = Dx^{-1} l' / kc, v = De v' / kc; margin
y = De^{-1} y'. The -I entries fix the state-column norms' floor at 1,
so Ruiz converges with the constraint built in.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from fbstab_tpu.core.variable import Variable
from fbstab_tpu.models.mpc_qp import MpcQPData, mpc_dims

# Measured on the reference's badly scaled plants (servo/spacecraft, CPU
# f32 product path): the contract floor is flat from 12 down to 6
# iterations (spacecraft actually improves at 8: 2.0e-4 -> 5.2e-5), so 8
# buys back ~half the equilibration cost with margin. The diagonals are
# rounded to powers of two afterwards, which forgives late-iteration
# drift by construction.
RUIZ_ITERS = 8


class MpcScaling(NamedTuple):
    """Per-stage diagonal scalings (see module docstring)."""

    dx: jnp.ndarray   # (N+1, nx)
    du: jnp.ndarray   # (N+1, nu)
    de: jnp.ndarray   # (N+1, nc)
    kc: jnp.ndarray   # scalar cost scaling


def _safe(n):
    return jnp.where(n > 0, n, 1.0)


def _scaled_blocks_mpc(d: MpcQPData, dx, du, de):
    Qs = dx[:, :, None] * d.Q * dx[:, None, :]
    Ss = du[:, :, None] * d.S * dx[:, None, :]
    Rs = du[:, :, None] * d.R * du[:, None, :]
    As = d.A * dx[:-1][:, None, :] / dx[1:][:, :, None]
    Bs = d.B * du[:-1][:, None, :] / dx[1:][:, :, None]
    Es = de[:, :, None] * d.E * dx[:, None, :]
    Ls = de[:, :, None] * d.L * du[:, None, :]
    return Qs, Ss, Rs, As, Bs, Es, Ls


def ruiz_mpc_scaling(d: MpcQPData, iters: int = RUIZ_ITERS) -> MpcScaling:
    """The Ruiz scaling diagonals alone (jittable; vmap for batches).

    Iterates d <- d / sqrt(inf-norm of the scaled row/column), with state
    columns floored at 1 by the dynamics' -I entries, then normalizes the
    cost block by a scalar kc (the OSQP-style cost scaling). Depends on
    every data field EXCEPT x0 and c — a receding-horizon driver can
    compute it once and reuse it across control steps (the plant/cost
    stay fixed; only x0 moves), and one solve's scaling serves its retry
    and refinement passes too.
    """
    N, nx, nu, nc = mpc_dims(d)
    dtype = d.Q.dtype
    dx0 = jnp.ones((N + 1, nx), dtype)
    du0 = jnp.ones((N + 1, nu), dtype)
    de0 = jnp.ones((N + 1, nc), dtype)

    scaled_blocks = lambda dx, du, de: _scaled_blocks_mpc(d, dx, du, de)

    def body(carry, _):
        dx, du, de = carry
        Qs, Ss, Rs, As, Bs, Es, Ls = scaled_blocks(dx, du, de)
        amax = lambda a, ax: jnp.max(jnp.abs(a), axis=ax)

        # x(s, j) column: Q rows, S rows (H_ux block), E rows, the
        # dynamics block s+1 (A_s), and the -I entry (always 1).
        colx = jnp.maximum(amax(Qs, 1), amax(Es, 1))
        if nu > 0:
            colx = jnp.maximum(colx, amax(Ss, 1))
        colA = amax(As, 1)                                 # (N, nx)
        colx = colx.at[:-1].max(colA)
        colx = jnp.maximum(colx, 1.0)

        # u(s, j) column: R rows, S^T rows (H_xu block), L rows, B_s.
        colu = jnp.maximum(amax(Rs, 1), amax(Ss, 2))
        colu = jnp.maximum(colu, amax(Ls, 1))
        colB = amax(Bs, 1)                                 # (N, nu)
        colu = colu.at[:-1].max(colB)

        # Inequality rows — including the offset d: the pfb residual
        # works on y = -(Ex + Lu + d), and f32 pfb-weight jitter scales
        # with |y|, so rows with large offsets (ServoMotor's |u| <= 220)
        # must be normalized too or refinement floors at |d|*eps_f32.
        rowe = jnp.maximum(amax(Es, 2), amax(Ls, 2))
        rowe = jnp.maximum(rowe, jnp.abs(de * d.d))

        upd = lambda cur, nrm: cur * lax.rsqrt(_safe(nrm))
        return (upd(dx, colx), upd(du, colu), upd(de, rowe)), None

    (dx, du, de), _ = lax.scan(body, (dx0, du0, de0), None, length=iters)

    # Round every diagonal to a power of two: the scaled data is then an
    # EXACT floating-point transform of the original (pow2 products are
    # exponent shifts), so solving/refining the scaled problem and
    # unscaling loses nothing — essential for the double-float
    # refinement path, whose fixed point must be the original problem's
    # solution, not a 6e-8-perturbed cousin's. Costs at most sqrt(2) of
    # equilibration quality.
    pow2 = lambda a: jnp.exp2(jnp.round(jnp.log2(a)))
    dx, du, de = pow2(dx), pow2(du), pow2(de)

    Qs, Ss, Rs, As, Bs, Es, Ls = scaled_blocks(dx, du, de)
    cost_mag = jnp.maximum(jnp.max(jnp.abs(Qs)), jnp.max(jnp.abs(Rs)))
    cost_mag = jnp.maximum(cost_mag, jnp.max(jnp.abs(Ss)))
    cost_mag = jnp.maximum(cost_mag, jnp.max(jnp.abs(dx * d.q)))
    cost_mag = jnp.maximum(cost_mag, jnp.max(jnp.abs(du * d.r)))
    kc = pow2(1.0 / jnp.clip(_safe(cost_mag), 1e-8, 1e8))
    return MpcScaling(dx=dx, du=du, de=de, kc=kc)


def apply_mpc_scaling(d: MpcQPData, s: MpcScaling) -> MpcQPData:
    """Applies precomputed scaling diagonals to the data (exact: every
    diagonal is a power of two)."""
    Qs, Ss, Rs, As, Bs, Es, Ls = _scaled_blocks_mpc(d, s.dx, s.du, s.de)
    return MpcQPData(
        Q=s.kc * Qs, R=s.kc * Rs, S=s.kc * Ss,
        q=s.kc * s.dx * d.q, r=s.kc * s.du * d.r,
        A=As, B=Bs, c=d.c / s.dx[1:],
        E=Es, L=Ls, d=s.de * d.d,
        x0=d.x0 / s.dx[0])


def equilibrate_mpc(d: MpcQPData, iters: int = RUIZ_ITERS
                    ) -> tuple[MpcQPData, MpcScaling]:
    """Ruiz equilibration of one MPC QP (jittable; vmap for batches):
    ruiz_mpc_scaling + apply_mpc_scaling."""
    s = ruiz_mpc_scaling(d, iters)
    return apply_mpc_scaling(d, s), s


def _flat_z(s: MpcScaling):
    return jnp.concatenate([s.dx, s.du], axis=-1).reshape(
        *s.dx.shape[:-2], -1)


def mpc_scale_factors(s: MpcScaling):
    """Flat per-coordinate UNSCALE multipliers (dz, lf, vf, de):
    z = dz*z', l = lf*l', v = vf*v', y = y'/de. Works batched (leading
    axes on the scaling broadcast; kc may be (B,))."""
    dzf = _flat_z(s)
    dxf = s.dx.reshape(*s.dx.shape[:-2], -1)
    kc = s.kc[..., None] if s.kc.ndim else s.kc
    lf = 1.0 / (dxf * kc)
    def_ = s.de.reshape(*s.de.shape[:-2], -1)
    vf = def_ / kc
    return dzf, lf, vf, def_


def scale_mpc_variable(x: Variable, s: MpcScaling) -> Variable:
    """Original -> scaled coordinates (for warmstarts)."""
    dzf, lf, vf, def_ = mpc_scale_factors(s)
    return Variable(z=x.z / dzf, l=x.l / lf, v=x.v / vf, y=x.y * def_)


def unscale_mpc_variable(x: Variable, s: MpcScaling) -> Variable:
    """Scaled -> original coordinates."""
    dzf, lf, vf, def_ = mpc_scale_factors(s)
    return Variable(z=x.z * dzf, l=x.l * lf, v=x.v * vf, y=x.y / def_)


# ------------------------------------------------------------------
# Dense QP equilibration (standard OSQP-style Ruiz on the KKT blocks;
# no structural constraints — G rows scale freely).
# ------------------------------------------------------------------

class DenseScaling(NamedTuple):
    dz: jnp.ndarray   # (nz,)
    dl: jnp.ndarray   # (nl,)
    de: jnp.ndarray   # (nv,)
    kc: jnp.ndarray   # scalar


def _scaled_blocks_dense(d, dz, dl, de):
    Hs = dz[:, None] * d.H * dz[None, :]
    Gs = dl[:, None] * d.G * dz[None, :]
    As = de[:, None] * d.A * dz[None, :]
    return Hs, Gs, As


def ruiz_dense_scaling(d, iters: int = RUIZ_ITERS) -> DenseScaling:
    """The Ruiz scaling diagonals for one dense QP
    (models/dense_qp.DenseQPData): z = dz*z', l = dl*l'/kc, v = de*v'/kc,
    y = y'/de."""
    nz = d.H.shape[-1]
    nl = d.G.shape[-2]
    nv = d.A.shape[-2]
    dtype = d.H.dtype
    dz0 = jnp.ones((nz,), dtype)
    dl0 = jnp.ones((max(nl, 1),), dtype)[:nl]
    de0 = jnp.ones((nv,), dtype)

    scaled = lambda dz, dl, de: _scaled_blocks_dense(d, dz, dl, de)

    def body(carry, _):
        dz, dl, de = carry
        Hs, Gs, As = scaled(dz, dl, de)
        colz = jnp.max(jnp.abs(Hs), axis=0)
        if nl > 0:
            colz = jnp.maximum(colz, jnp.max(jnp.abs(Gs), axis=0))
        colz = jnp.maximum(colz, jnp.max(jnp.abs(As), axis=0))
        rowl = (jnp.max(jnp.abs(Gs), axis=1) if nl > 0
                else jnp.zeros((0,), dtype))
        rowe = jnp.maximum(jnp.max(jnp.abs(As), axis=1),
                           jnp.abs(de * d.b))
        upd = lambda cur, nrm: cur * lax.rsqrt(_safe(nrm))
        return (upd(dz, colz), upd(dl, rowl), upd(de, rowe)), None

    (dz, dl, de), _ = lax.scan(body, (dz0, dl0, de0), None, length=iters)

    # Power-of-two rounding: exact transform (see equilibrate_mpc).
    pow2 = lambda a: jnp.exp2(jnp.round(jnp.log2(a)))
    dz, dl, de = pow2(dz), pow2(dl), pow2(de)

    Hs, Gs, As = scaled(dz, dl, de)
    cost_mag = jnp.maximum(jnp.max(jnp.abs(Hs)),
                           jnp.max(jnp.abs(dz * d.f)))
    kc = pow2(1.0 / jnp.clip(_safe(cost_mag), 1e-8, 1e8))
    return DenseScaling(dz=dz, dl=dl, de=de, kc=kc)


def apply_dense_scaling(d, s: DenseScaling):
    """Applies precomputed scaling diagonals (exact pow2 transform)."""
    Hs, Gs, As = _scaled_blocks_dense(d, s.dz, s.dl, s.de)
    return type(d)(
        H=s.kc * Hs, f=s.kc * s.dz * d.f,
        G=Gs, h=s.dl * d.h, A=As, b=s.de * d.b)


def equilibrate_dense(d, iters: int = RUIZ_ITERS):
    """Ruiz equilibration of one dense QP: ruiz_dense_scaling +
    apply_dense_scaling."""
    s = ruiz_dense_scaling(d, iters)
    return apply_dense_scaling(d, s), s


def dense_scale_factors(s: DenseScaling):
    kc = s.kc[..., None] if s.kc.ndim else s.kc
    return s.dz, s.dl / kc, s.de / kc, s.de


def scale_dense_variable(x: Variable, s: DenseScaling) -> Variable:
    dzf, lf, vf, def_ = dense_scale_factors(s)
    return Variable(z=x.z / dzf, l=x.l / lf, v=x.v / vf, y=x.y * def_)


def unscale_dense_variable(x: Variable, s: DenseScaling) -> Variable:
    dzf, lf, vf, def_ = dense_scale_factors(s)
    return Variable(z=x.z * dzf, l=x.l * lf, v=x.v * vf, y=x.y / def_)


def _df_scale(p, f):
    """Componentwise scaling of a double-float pair by a power-of-two
    factor array — exact (exponent shift on both limbs)."""
    return (p[0] * f, p[1] * f)


def unscale_mpc_variable_df(xdf, s: MpcScaling):
    """Exact unscaling of a refined VariableDF (pow2 diagonals)."""
    dzf, lf, vf, def_ = mpc_scale_factors(s)
    return type(xdf)(z=_df_scale(xdf.z, dzf), l=_df_scale(xdf.l, lf),
                     v=_df_scale(xdf.v, vf),
                     y=_df_scale(xdf.y, 1.0 / def_))


def unscale_dense_variable_df(xdf, s: DenseScaling):
    dzf, lf, vf, def_ = dense_scale_factors(s)
    return type(xdf)(z=_df_scale(xdf.z, dzf), l=_df_scale(xdf.l, lf),
                     v=_df_scale(xdf.v, vf),
                     y=_df_scale(xdf.y, 1.0 / def_))


# ------------------------------------------------------------------
# Solve wrappers: scale -> solve -> unscale -> re-report residuals in
# ORIGINAL units. Used by the batch dispatchers, the sharded solvers and
# the facades; refinement (which re-derives the scaling itself) is
# applied by the caller afterwards.
# ------------------------------------------------------------------

def _pnr_batch(ops, data, x: Variable, alpha):
    from fbstab_tpu.core.residuals import (
        penalized_natural_residual, residual_norm)

    return jax.vmap(lambda d, xx: residual_norm(
        penalized_natural_residual(ops, d, xx, alpha)))(data, x)


def scaling_engaged(options, dtype) -> bool:
    return bool(options.equilibrate) and dtype == jnp.float32


def solve_scaled_mpc(raw_solve, data, z0, l0, v0, options, scal=None,
                     skip_residual_rewrite=False):
    """Batched MPC solve through the equilibrated problem.

    raw_solve(data, z0, l0, v0) -> (Variable, CoreOut) on whatever data
    it is given. When scaling is engaged (options.equilibrate + f32):
    equilibrates per instance, scales the warmstart, solves, unscales the
    solution, and rewrites CoreOut.residual/raw_residual with the
    original-units f32 penalized natural residual at the returned point
    (the solver's internal value is in scaled units and would mislead).
    Exit flags and iteration counts are the scaled solve's — convergence
    is judged in the equilibrated geometry, which is the point.

    scal: optional precomputed batched MpcScaling for this data (from
    vmap(ruiz_mpc_scaling)) — skips the Ruiz iteration. Callers that
    solve/retry/refine the same problem, or a receding-horizon driver
    whose plant data is fixed across steps, compute it once.

    skip_residual_rewrite: callers that immediately refine (the f32
    product default) overwrite residual/raw_residual with double-float-
    verified original-units values at every lane (_finish_refine uses
    res0 at the returned point for non-refined lanes too), so the f32
    re-evaluation here would be dead work — skip it. Never set it
    without a downstream rewrite: the solver-internal values are in
    SCALED units.
    """
    from fbstab_tpu.models.mpc_qp import MPC_OPS, MpcQPData, MpcQPDataT

    opts = options.validated()
    if not scaling_engaged(opts, z0.dtype):
        return raw_solve(data, z0, l0, v0)
    base = (MpcQPData(**{f: getattr(data, f) for f in MpcQPData._fields})
            if isinstance(data, MpcQPDataT) else data)
    if scal is None:
        scal = jax.vmap(ruiz_mpc_scaling)(base)
    sdata = jax.vmap(apply_mpc_scaling)(base, scal)
    g = scale_mpc_variable(
        Variable(z=z0, l=l0, v=v0, y=jnp.zeros_like(v0)), scal)
    x, core = raw_solve(sdata, g.z, g.l, g.v)
    x = unscale_mpc_variable(x, scal)
    if skip_residual_rewrite:
        return x, core
    res = _pnr_batch(MPC_OPS, base, x, opts.alpha)
    return x, core._replace(residual=res, raw_residual=res)


def solve_scaled_dense(raw_solve, data, z0, l0, v0, options, scal=None,
                       skip_residual_rewrite=False):
    """Dense analog of solve_scaled_mpc."""
    from fbstab_tpu.models.dense_qp import DENSE_OPS

    opts = options.validated()
    if not scaling_engaged(opts, z0.dtype):
        return raw_solve(data, z0, l0, v0)
    if scal is None:
        scal = jax.vmap(ruiz_dense_scaling)(data)
    sdata = jax.vmap(apply_dense_scaling)(data, scal)
    g = scale_dense_variable(
        Variable(z=z0, l=l0, v=v0, y=jnp.zeros_like(v0)), scal)
    x, core = raw_solve(sdata, g.z, g.l, g.v)
    x = unscale_dense_variable(x, scal)
    if skip_residual_rewrite:
        return x, core
    res = _pnr_batch(DENSE_OPS, data, x, opts.alpha)
    return x, core._replace(residual=res, raw_residual=res)


# ------------------------------------------------------------------
# Failure retry: the regularize-and-retry pass the reference leaves as a
# TODO (riccati_linear_solver.cc:129-130), batch-masked.
# ------------------------------------------------------------------

def retry_options(opts):
    """4x larger proximal sigma + a bigger outer budget for the retry
    pass (measured: the SpacecraftRelativeMotion plant's f32 stage
    Cholesky fails on ~40% of instances at sigma0 = 3e-4 and succeeds
    at ~1e-3)."""
    import dataclasses

    return dataclasses.replace(
        opts, sigma0=min(opts.sigma0 * 4.0, 1e-2),
        max_prox_iters=max(opts.max_prox_iters, 60),
        max_newton_iters=max(opts.max_newton_iters, 400)).validated()


def merge_failed_retry(x1, core1, x2, core2):
    """Takes the retry pass's results on lanes that exited
    LINEAR_SOLVER_FAILED in pass 1; everything else keeps pass 1.
    Iteration counters accumulate for retried lanes."""
    from fbstab_tpu.solver_out import ExitFlag

    m = core1.eflag == int(ExitFlag.LINEAR_SOLVER_FAILED)

    def pick(a2, a1):
        mm = m.reshape((m.shape[0],) + (1,) * (a1.ndim - 1))
        return jnp.where(mm, a2, a1)

    x = jax.tree.map(pick, x2, x1)
    core = core1._replace(
        eflag=jnp.where(m, core2.eflag, core1.eflag),
        residual=jnp.where(m, core2.residual, core1.residual),
        raw_residual=jnp.where(m, core2.raw_residual, core1.raw_residual),
        newton_iters=core1.newton_iters
        + jnp.where(m, core2.newton_iters, 0),
        prox_iters=core1.prox_iters + jnp.where(m, core2.prox_iters, 0))
    return x, core
