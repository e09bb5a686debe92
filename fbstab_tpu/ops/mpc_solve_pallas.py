"""Fused FBstab-MPC solver kernels.

Two fusion levels share one kernel context (`_build_ctx`: stage operators,
residuals, Newton step, masking helpers — identical arithmetic):

1. `fbstab_mpc_solve_fused` — one Pallas kernel runs the ENTIRE FBstab
   algorithm (outer proximal loop, inner semismooth Newton loop,
   nonmonotone linesearch, feasibility checks, exit bookkeeping) for a
   tile of TILE_B QP instances held in the lane dimension, start to
   finish, with zero HBM round-trips between iterations.
2. `mpc_subproblem_fused` — one kernel launch runs ONE proximal
   subproblem (the whole inner Newton loop incl. linesearch) per tile;
   the outer proximal loop stays in XLA
   (models/mpc_subfused.py::fbstab_mpc_solve_subfused). This is the
   large-stage-dimension tier: the full-solve kernel's outer-loop state
   makes Mosaic spill every live range beyond ~1024 carried state rows
   per lane (measured 232 MB of scoped-VMEM spill slots at nx=18/N=80),
   while the subproblem kernel's live set is bounded by one inner
   iteration. Measured on the CopolymerizationReactor class
   (nx=18, nu=5, N=80, B=512): the XLA-orchestrated loop around the
   standalone Newton-step kernel spends ~12 of 17.4 ms per lockstep
   Newton iteration on while-body HLO dispatch; fusing the subproblem
   removes that entirely.

Why fusion: measured on v5e, arithmetic inside a compiled kernel costs
~12 ns per vector op while every XLA HLO in a `lax.while_loop` body costs
~10-100 us of dispatch/memory overhead; with ~500 HLOs per Newton
iteration the XLA-orchestrated solver spends >99% of its time on op
overhead. Fusing turns each Newton iteration into ~10^4 VPU instructions
on (sublane, lane) tiles.

Semantics: a lane-for-lane transcription of core/algorithm.py (which in
turn mirrors the reference fbstab_algorithm-impl.h:113-304) in
masked-lockstep form — the same per-instance value evolution as
`vmap(fbstab_solve)`, validated in interpret mode against it. The Newton
step reuses ops/riccati_pallas.riccati_factor_solve.

Mosaic compatibility notes (each learned from a real compile failure, see
CLAUDE.md): state lives in 2-D (rows, TILE_B) arrays with per-instance
scalars as (1, TILE_B) rows; stage matvecs unroll the small matrix
dimension with 3-D column slices (4-D middle-axis broadcasts hit the
unimplemented sublane broadcast); while-loop carries hold masks as int32
(bool carries fail); (1, B) scalar selects are arithmetic blends; and
reduction outputs round-trip through a VMEM scratch (`mater`) to shed
replicated layouts. The primal x/u parts stay in separate buffers because
slicing the stage dim at non-sublane-aligned nx produces offset layouts
Mosaic cannot reduce over.
"""

from __future__ import annotations

import types

# The fused kernel's working set exceeds the default 16 MiB scoped-VMEM
# budget (~9 MB per 128-lane tile at N=30/nx=8; ~72 MB in lowmem mode at
# the CopolymerizationReactor's N=80/nx=18); v5e has 128 MiB of VMEM per
# core, so the limit is raised to 112 MiB. The env flag is set by
# fbstab_tpu/__init__.py (which always runs before this module can be
# imported) and the per-compile channel by utils/compile.py; each
# pallas_call below also self-declares the budget via CompilerParams.

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fbstab_tpu.core.algorithm import NONMONOTONE_DEPTH, CoreOut
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.options import Options
from fbstab_tpu.ops.pfb import pfb
from fbstab_tpu.ops.riccati_pallas import (
    _T as _mT,
    _mv as _mvv,
    _pfb_weights,
    pad_batch,
    riccati_factor_solve,
)
from fbstab_tpu.solver_out import ExitFlag
from fbstab_tpu.utils.compile import VMEM_LIMIT_KIB, vmem_jit

TILE_B = 128


def _stage_matvec(M, w, n, m):
    """out(s) = M(s) @ w(s) per stage: M (N1, n, m, B) REF or value,
    w (N1*m, B) -> (N1*n, B). Unrolled over the m columns; every op is a
    3-D elementwise with a (N1, 1, B) sublane broadcast
    (Mosaic-supported). M is sliced per column so only (N1, n, B) pieces
    are ever live — materializing a whole (N1, n, m, B) stage matrix as a
    value costs ~17 MB at nx=18/N=80 and is exactly what spills the
    register allocator."""
    N1 = M.shape[0]
    B = M.shape[-1]
    ws = w.reshape(N1, m, B)
    acc = M[:, :, 0] * ws[:, 0][:, None]
    for j in range(1, m):
        acc = acc + M[:, :, j] * ws[:, j][:, None]
    return acc.reshape(N1 * n, B)


def _stage_matvec_T(M, w, n, m):
    """out(s) = M(s)' @ w(s): M (N1, n, m, B) ref/value, w (N1*n, B) ->
    (N1*m, B). Sliced per row (see _stage_matvec)."""
    N1 = M.shape[0]
    B = M.shape[-1]
    ws = w.reshape(N1, n, B)
    acc = M[:, 0] * ws[:, 0][:, None]
    for i in range(1, n):
        acc = acc + M[:, i] * ws[:, i][:, None]
    return acc.reshape(N1 * m, B)


# Per-state-row counts of the 5-tuple state (zx, zu, l, v, y).
def _state_ns(nx, nu, nc):
    return (nx, nu, nx, nc, nc)


def _build_ctx(N, nx, nu, nc, opts: Options, lowmem: bool,
               data_refs, step_scr, red_s, staged: bool = False):
    """Shared kernel context closed over the data refs and Newton-step
    scratch. Returns a namespace of closures used by both the full-solve
    kernel and the subproblem kernel so they run identical arithmetic.

    staged=True selects the per-stage fori_loop variants (st_*) of the
    residual / norm / linesearch math and skips materializing the
    full-horizon forcing vectors. At large stage dims every full-horizon
    intermediate is a ~1 MB value that cannot be register-resident, and
    Mosaic gives every spilled live range its own scoped-VMEM slot — the
    straight-line subproblem body has ~100 such values (measured 115 MB
    of spill slots at nx=18/N=80, past the 128 MB physical VMEM of v5e;
    shrinking the lane tile does NOT help, VMEM pads lanes to 128). The
    staged variants keep only a few (n, B) stage slices live per
    fori iteration, so the spill slots are bounded and reused."""
    Np1 = N + 1
    sigma = float(opts.sigma0)
    alpha = float(opts.alpha)

    (q_ref, r_ref, c_ref, x0_ref, d_ref,
     Q_ref, R_ref, S_ref, A_ref, B_ref, E_ref, L_ref) = data_refs
    if lowmem:
        (rzx_s, rzu_s, rl_s, rv_s, xv_s, xy_s, vb_s,
         dzx_s, dzu_s, dl_s, dv_s, dy_s, Lc, th_s, h_s) = step_scr
        Mc = SMc = SGc = None
    else:
        (rzx_s, rzu_s, rl_s, rv_s, xv_s, xy_s, vb_s,
         dzx_s, dzu_s, dl_s, dv_s, dy_s, Lc, Mc, SMc, SGc,
         th_s, h_s) = step_scr

    f32 = Q_ref.dtype
    Bl = Q_ref.shape[-1]

    # ---------- stage-structured operators (2-D state) ----------
    # The stage-matrix REFS go straight into the matvec helpers, which
    # slice one column at a time: loading a whole matrix as a value
    # (Q_ref[...]) keeps a multi-MB register-resident array live per
    # operator and blows the register allocator into scoped-VMEM spill
    # slots at large stage dims.
    def gemvH(zx, zu):
        yx = (_stage_matvec(Q_ref, zx, nx, nx)
              + _stage_matvec_T(S_ref, zu, nu, nx))
        yu = (_stage_matvec(S_ref, zx, nu, nx)
              + _stage_matvec(R_ref, zu, nu, nu))
        return yx, yu

    def gemvA(zx, zu):
        return (_stage_matvec(E_ref, zx, nc, nx)
                + _stage_matvec(L_ref, zu, nc, nu))

    def gemvG(zx, zu):
        zxs = zx.reshape(Np1, nx, Bl)
        zus = zu.reshape(Np1, nu, Bl)
        tail = (_stage_matvec(A_ref, zxs[:-1].reshape(N * nx, Bl),
                              nx, nx).reshape(N, nx, Bl)
                + _stage_matvec(B_ref, zus[:-1].reshape(N * nu, Bl),
                                nx, nu).reshape(N, nx, Bl)
                - zxs[1:])
        return jnp.concatenate([-zxs[:1], tail],
                               axis=0).reshape(Np1 * nx, Bl)

    def gemvGT(l):
        ls = l.reshape(Np1, nx, Bl)
        lp = ls[1:].reshape(N * nx, Bl)
        atv = _stage_matvec_T(A_ref, lp, nx, nx).reshape(N, nx, Bl)
        btv = _stage_matvec_T(B_ref, lp, nx, nu).reshape(N, nu, Bl)
        zx = jnp.zeros((1, nx, Bl), f32)
        zu = jnp.zeros((1, nu, Bl), f32)
        yx = -ls + jnp.concatenate([atv, zx], axis=0)
        yu = jnp.concatenate([btv, zu], axis=0)
        return yx.reshape(Np1 * nx, Bl), yu.reshape(Np1 * nu, Bl)

    def gemvAT(v):
        yx = _stage_matvec_T(E_ref, v, nc, nx)
        yu = _stage_matvec_T(L_ref, v, nc, nu)
        return yx, yu

    if staged:
        # Full-horizon forcing values would be live across the whole
        # kernel; the staged paths read the data refs per stage instead.
        fx = fu = hh = bb = None
    else:
        fx = q_ref[...].reshape(Np1 * nx, Bl)
        fu = r_ref[...].reshape(Np1 * nu, Bl)
        hh = -jnp.concatenate(
            [x0_ref[...][None], c_ref[...]], axis=0).reshape(Np1 * nx, Bl)
        bb = -d_ref[...].reshape(Np1 * nc, Bl)

    def mater(x):
        """Round-trips a (1, B) reduction result through VMEM to
        force a canonical vector layout: sublane-reduction outputs
        carry replicated layouts that Mosaic cannot re-broadcast when
        they meet while-loop carries (Not implemented: Sublane
        broadcast)."""
        red_s[...] = x
        return red_s[...]

    def ssum(a):
        return jnp.sum(a * a, axis=0, keepdims=True)       # (1, B)

    def imax(a):
        return mater(jnp.max(jnp.abs(a), axis=0, keepdims=True))

    def inner_residual(zx, zu, l, v, y, bzx, bzu, bl, bv):
        hx, hu = gemvH(zx, zu)
        gx, gu = gemvGT(l)
        ax, au = gemvAT(v)
        rzx = fx + hx + gx + ax + sigma * (zx - bzx)
        rzu = fu + hu + gu + au + sigma * (zu - bzu)
        rl = hh - gemvG(zx, zu) + sigma * (l - bl)
        rv = pfb(y + sigma * (v - bv), v, alpha)
        return rzx, rzu, rl, rv

    def pnr(zx, zu, l, v, y):
        hx, hu = gemvH(zx, zu)
        gx, gu = gemvGT(l)
        ax, au = gemvAT(v)
        rzx = fx + hx + gx + ax
        rzu = fu + hu + gu + au
        rl = hh - gemvG(zx, zu)
        rv = (alpha * jnp.minimum(y, v)
              + (1.0 - alpha) * jnp.maximum(0.0, y)
              * jnp.maximum(0.0, v))
        return rzx, rzu, rl, rv

    def rnorm(r4):
        rzx, rzu, rl, rv = r4
        return mater(
            jnp.sqrt(ssum(rzx) + ssum(rzu) + ssum(rl) + ssum(rv)))

    def sel(m, a, b):
        """Per-instance select: m (1, B) bool; a/b (1, B) or
        (rows, B). Row-broadcast selects expand the mask explicitly
        with an add-broadcast (Mosaic supports sublane broadcast for
        arithmetic but not for select_n)."""
        if a.shape[0] == m.shape[0]:
            return jnp.where(m, a, b)
        mf = jnp.zeros(a.shape, a.dtype if a.dtype != jnp.int32
                       else jnp.float32)
        mf = mf + m.astype(mf.dtype)
        return jnp.where(mf > 0.5, a, b)

    def blend(m, a, b):
        """Select-free per-instance (1, B) select: b + m*(a - b).
        Mosaic fails to lower select_n on (1, B) operands coming out
        of reductions (replicated layouts), while arithmetic
        broadcasts are fine. NOT NaN-masking: a NaN in either operand
        leaks through; every call site either has both operands
        finite or only contaminates lanes that already exited with
        LINEAR_SOLVER_FAILED (whose outputs are taken from the
        pre-failure iterate)."""
        return b + m.astype(a.dtype) * (a - b)

    X = tuple  # state = (zx, zu, l, v, y), all 2-D (rows, B)

    def sel_x(m, a, b):
        return X(sel(m, ai, bi) for ai, bi in zip(a, b))

    STATE_NS = _state_ns(nx, nu, nc)

    def rd(ref, n):
        return ref[...].reshape(Np1 * n, Bl)

    def state(refs):
        """Reads a 5-ref state tuple (zx, zu, l, v, y) as 2-D values."""
        return X(rd(r, n) for r, n in zip(refs, STATE_NS))

    def dstep():
        return X((rd(dzx_s, nx), rd(dzu_s, nu), rd(dl_s, nx),
                  rd(dv_s, nc), rd(dy_s, nc)))

    def wr_state(refs, vals):
        for r, v_, n in zip(refs, vals, STATE_NS):
            r[...] = v_.reshape(Np1, n, Bl)

    def newton_step(zx, zu, l, v, y, bv, rzx, rzu, rl, rv):
        """Writes -r into scratch, runs the Riccati factor/solve,
        leaves the step (dzx..dy) in the d-refs, returns ok."""
        rzx_s[...] = (-rzx).reshape(Np1, nx, Bl)
        rzu_s[...] = (-rzu).reshape(Np1, nu, Bl)
        rl_s[...] = (-rl).reshape(Np1, nx, Bl)
        rv_s[...] = (-rv).reshape(Np1, nc, Bl)
        xv_s[...] = v.reshape(Np1, nc, Bl)
        xy_s[...] = y.reshape(Np1, nc, Bl)
        vb_s[...] = bv.reshape(Np1, nc, Bl)
        riccati_factor_solve(
            jnp.asarray(sigma, f32),
            Q_ref, R_ref, S_ref, A_ref, B_ref, E_ref, L_ref,
            xv_s, xy_s, vb_s, rzx_s, rzu_s, rl_s, rv_s,
            dzx_s, dzu_s, dl_s,
            Lc, Mc, SMc, SGc, None, None, th_s, h_s,
            N=N, nx=nx, nu=nu, nc=nc, alpha=alpha, store_AP=False,
            store_factors=not lowmem)
        dzx = rd(dzx_s, nx)
        dzu = rd(dzu_s, nu)
        dl = rd(dl_s, nx)
        # Dual recovery (riccati_linear_solver.cc:329-342); weights from
        # the shared guarded PFB gradient (riccati_pallas._pfb_weights).
        ys = y + sigma * (v - bv)
        ga, mus = _pfb_weights(ys, v, sigma, alpha)
        Adz = gemvA(dzx, dzu)
        dv_s[...] = ((-rv + ga * Adz) / mus).reshape(Np1, nc, Bl)
        dy_s[...] = (bb - Adz).reshape(Np1, nc, Bl)
        nan_ct = mater(jnp.sum(jnp.isnan(dzx).astype(f32), axis=0,
                               keepdims=True)
                       + jnp.sum(jnp.isnan(dzu).astype(f32), axis=0,
                                 keepdims=True)
                       + jnp.sum(jnp.isnan(dl).astype(f32), axis=0,
                                 keepdims=True))
        ok = nan_ct < 0.5
        return ok

    # ---------- staged (per-stage fori_loop) variants ----------
    # Same recurrences as the full-horizon closures above, computed one
    # stage at a time against the refs so only (n, B) slices are live.
    # Summation ORDER differs (per-stage partial sums instead of one
    # full-horizon reduction): values agree to roundoff.

    def _rd_refs(refs):
        return lambda s: tuple(r[s] for r in refs)

    def _rd_trial(I, t):
        """State view at xi + t*dx with the margin rule
        y <- y + t*(dy - b) (full_variable.cc:55-65); b = -d."""
        def rd(s):
            return (I[0][s] + t * dzx_s[s],
                    I[1][s] + t * dzu_s[s],
                    I[2][s] + t * dl_s[s],
                    I[3][s] + t * dv_s[s],
                    I[4][s] + t * (dy_s[s] + d_ref[s]))
        return rd

    def _stage_sq(s, has_prev, has_next, rdst, xb_rd, store):
        """Sum-of-squares row of the stage-s residual block; optionally
        stores the NEGATED residual (the Riccati rhs convention) plus
        the (v, y, vbar) rows the factorization reads. `store` requires
        an inner residual (xb_rd) — the stored vbar row comes from it."""
        assert not (store and xb_rd is None), \
            "store=True needs the prox center xb_rd"
        zxs, zus, ls, vs, ys = rdst(s)
        Ss = S_ref[s]
        rzx = (q_ref[s] + _mvv(Q_ref[s], zxs) + _mvv(_mT(Ss), zus) - ls
               + _mvv(_mT(E_ref[s]), vs))
        rzu = (r_ref[s] + _mvv(Ss, zxs) + _mvv(R_ref[s], zus)
               + _mvv(_mT(L_ref[s]), vs))
        if has_next:
            ln = rdst(s + 1)[2]
            rzx = rzx + _mvv(_mT(A_ref[s]), ln)
            rzu = rzu + _mvv(_mT(B_ref[s]), ln)
        if has_prev:
            prev = rdst(s - 1)
            rl = (-c_ref[s - 1]
                  - (_mvv(A_ref[s - 1], prev[0])
                     + _mvv(B_ref[s - 1], prev[1]) - zxs))
        else:
            rl = -x0_ref[...] + zxs          # hh(0) - Gz(0) = -x0 + zx0
        if xb_rd is not None:                # inner residual
            bzxs, bzus, bls, bvs, _ = xb_rd(s)
            rzx = rzx + sigma * (zxs - bzxs)
            rzu = rzu + sigma * (zus - bzus)
            rl = rl + sigma * (ls - bls)
            rv = pfb(ys + sigma * (vs - bvs), vs, alpha)
        else:                                # penalized natural residual
            rv = (alpha * jnp.minimum(ys, vs)
                  + (1.0 - alpha) * jnp.maximum(0.0, ys)
                  * jnp.maximum(0.0, vs))
        if store:
            rzx_s[s] = -rzx
            rzu_s[s] = -rzu
            rl_s[s] = -rl
            rv_s[s] = -rv
            xv_s[s] = vs
            xy_s[s] = ys
            vb_s[s] = bvs
        return (jnp.sum(rzx * rzx, axis=0, keepdims=True)
                + jnp.sum(rzu * rzu, axis=0, keepdims=True)
                + jnp.sum(rl * rl, axis=0, keepdims=True)
                + jnp.sum(rv * rv, axis=0, keepdims=True))

    def _staged_sq_sum(rdst, xb_rd, store):
        acc = _stage_sq(0, False, N >= 1, rdst, xb_rd, store)
        if N >= 2:
            acc = lax.fori_loop(
                1, N,
                lambda s, a: a + _stage_sq(s, True, True, rdst, xb_rd,
                                           store),
                acc)
        if N >= 1:
            acc = acc + _stage_sq(N, True, False, rdst, xb_rd, store)
        return acc

    def st_pnr_norm(refs):
        return mater(jnp.sqrt(_staged_sq_sum(_rd_refs(refs), None, False)))

    def st_sel(m, a, b):
        """NaN-safe per-lane select on a stage slice: expands the (1, B)
        mask arithmetically (select_n wants matching shapes) then uses a
        true select, so a NaN in the unchosen operand does not leak."""
        mf = jnp.zeros_like(a) + m.astype(a.dtype)
        return jnp.where(mf > 0, a, b)

    def st_pnr_norm_blend(I, K, m):
        """pnr norm at the per-lane selected state (m ? xi : xk) — the
        MAXITERATIONS best-of selection's residual (impl.h:188-199).
        NaN-safe: a failed lane's xi never contaminates the xk branch."""
        def rd(s):
            return tuple(st_sel(m, ri_[s], rk_[s])
                         for ri_, rk_ in zip(I, K))
        return mater(jnp.sqrt(_staged_sq_sum(rd, None, False)))

    def st_inner_norm_store(I, K):
        """|inner_residual(xi; xbar)|, leaving -ri and (v, y, vbar) in
        the Newton-step scratch refs."""
        return mater(jnp.sqrt(
            _staged_sq_sum(_rd_refs(I), _rd_refs(K), True)))

    def st_trial_norm(I, K, t):
        return mater(jnp.sqrt(
            _staged_sq_sum(_rd_trial(I, t), _rd_refs(K), False)))

    def st_newton_step(I, K, zero_row):
        """Riccati factor/solve from the scratch rhs (written by
        st_inner_norm_store), then staged dual recovery
        (riccati_linear_solver.cc:329-342). Returns the ok row."""
        riccati_factor_solve(
            jnp.asarray(sigma, f32),
            Q_ref, R_ref, S_ref, A_ref, B_ref, E_ref, L_ref,
            xv_s, xy_s, vb_s, rzx_s, rzu_s, rl_s, rv_s,
            dzx_s, dzu_s, dl_s,
            Lc, Mc, SMc, SGc, None, None, th_s, h_s,
            N=N, nx=nx, nu=nu, nc=nc, alpha=alpha, store_AP=False,
            store_factors=not lowmem)

        def dual_body(s, acc):
            vs = I[3][s]
            ys = I[4][s] + sigma * (vs - K[3][s])
            ga, mus = _pfb_weights(ys, vs, sigma, alpha)
            dzxs = dzx_s[s]
            dzus = dzu_s[s]
            Adz = _mvv(E_ref[s], dzxs) + _mvv(L_ref[s], dzus)
            dv_s[s] = (rv_s[s] + ga * Adz) / mus   # rv_s holds -rv
            dy_s[s] = -d_ref[s] - Adz
            nan = (jnp.sum(jnp.isnan(dzxs).astype(f32), axis=0,
                           keepdims=True)
                   + jnp.sum(jnp.isnan(dzus).astype(f32), axis=0,
                             keepdims=True)
                   + jnp.sum(jnp.isnan(dl_s[s]).astype(f32), axis=0,
                             keepdims=True))
            return acc + nan

        nan_ct = mater(lax.fori_loop(0, Np1, dual_body, zero_row))
        return nan_ct < 0.5

    def st_apply_step(I, tm):
        """xi <- xi + tm*dx in place, margin rule on y."""
        def body(s, z):
            I[0][s] = I[0][s] + tm * dzx_s[s]
            I[1][s] = I[1][s] + tm * dzu_s[s]
            I[2][s] = I[2][s] + tm * dl_s[s]
            I[3][s] = I[3][s] + tm * dv_s[s]
            I[4][s] = I[4][s] + tm * (dy_s[s] + d_ref[s])
            return z
        lax.fori_loop(0, Np1, body, jnp.int32(0))

    def st_copy(I, K):
        def body(s, z):
            for ri_, rk_ in zip(I, K):
                ri_[s] = rk_[s]
            return z
        lax.fori_loop(0, Np1, body, jnp.int32(0))

    def st_diff_norm(I, K):
        """||xi - xk|| over (zx, zu, l, v) — the var_norm components."""
        def stage(s):
            t = None
            for ri_, rk_ in zip(I[:4], K[:4]):
                dd = ri_[s] - rk_[s]
                ssq = jnp.sum(dd * dd, axis=0, keepdims=True)
                t = ssq if t is None else t + ssq
            return t
        acc = stage(0)
        acc = lax.fori_loop(1, Np1, lambda s, a: a + stage(s), acc)
        return mater(jnp.sqrt(acc))

    def st_init_state(K, zx0_ref, zu0_ref, l0_ref, v0_ref):
        """K <- warmstart with the margin recomputed: y = b - A z
        (CopyIntoVariable, impl.h:336-347); b = -d."""
        def body(s, z):
            zxs = zx0_ref[s]
            zus = zu0_ref[s]
            K[0][s] = zxs
            K[1][s] = zus
            K[2][s] = l0_ref[s]
            K[3][s] = v0_ref[s]
            K[4][s] = (-d_ref[s] - _mvv(E_ref[s], zxs)
                       - _mvv(L_ref[s], zus))
            return z
        lax.fori_loop(0, Np1, body, jnp.int32(0))

    def st_masked_write(z_out, l_out, v_out, y_out, mask, rd):
        """Masked per-stage write of the state view rd(s) into the
        output refs (z merges the x/u parts)."""
        def body(s, z):
            zxs, zus, ls, vs, ys = rd(s)
            zval = jnp.concatenate([zxs, zus], axis=0)
            mz = jnp.zeros_like(zval) + mask.astype(f32)
            z_out[s] = jnp.where(mz > 0.5, zval, z_out[s])
            ml = jnp.zeros_like(ls) + mask.astype(f32)
            l_out[s] = jnp.where(ml > 0.5, ls, l_out[s])
            mv = jnp.zeros_like(vs) + mask.astype(f32)
            v_out[s] = jnp.where(mv > 0.5, vs, v_out[s])
            y_out[s] = jnp.where(mv > 0.5, ys, y_out[s])
            return z
        lax.fori_loop(0, Np1, body, jnp.int32(0))

    def st_feasibility(I, K, tol_i):
        """Staged infeasibility certificates on dx = xi - xk
        (full_feasibility.cc:29-87; same accumulations as the
        full-horizon obody block, per stage). Returns (p_inf, d_inf)
        rows."""
        def dz(s):
            return (I[0][s] - K[0][s], I[1][s] - K[1][s],
                    I[2][s] - K[2][s], I[3][s] - K[3][s])

        def rmax(a):
            return jnp.max(a, axis=0, keepdims=True)

        def ramax(a):
            return jnp.max(jnp.abs(a), axis=0, keepdims=True)

        def rsum(a):
            return jnp.sum(a, axis=0, keepdims=True)

        def stage(s, has_prev, has_next):
            dzx, dzu, dl, dv = dz(s)
            Adz = _mvv(E_ref[s], dzx) + _mvv(L_ref[s], dzu)
            if has_prev:
                pzx, pzu, _, _ = dz(s - 1)
                Gdz = (_mvv(A_ref[s - 1], pzx)
                       + _mvv(B_ref[s - 1], pzu) - dzx)
            else:
                Gdz = -dzx
            Ss = S_ref[s]
            Hx = _mvv(Q_ref[s], dzx) + _mvv(_mT(Ss), dzu)
            Hu = _mvv(Ss, dzx) + _mvv(R_ref[s], dzu)
            ATx = _mvv(_mT(E_ref[s]), dv) - dl
            ATu = _mvv(_mT(L_ref[s]), dv)
            if has_next:
                dln = I[2][s + 1] - K[2][s + 1]
                ATx = ATx + _mvv(_mT(A_ref[s]), dln)
                ATu = ATu + _mvv(_mT(B_ref[s]), dln)
            hhs = -x0_ref[...] if not has_prev else -c_ref[s - 1]
            return (rmax(Adz), ramax(Gdz),
                    jnp.maximum(ramax(Hx), ramax(Hu)),
                    rsum(q_ref[s] * dzx) + rsum(r_ref[s] * dzu),
                    jnp.maximum(ramax(dzx), ramax(dzu)),
                    jnp.maximum(ramax(ATx), ramax(ATu)),
                    rsum(hhs * dl) + rsum(-d_ref[s] * dv),
                    jnp.maximum(ramax(dv), ramax(dl)))

        def merge(a, b):
            return (jnp.maximum(a[0], b[0]), jnp.maximum(a[1], b[1]),
                    jnp.maximum(a[2], b[2]), a[3] + b[3],
                    jnp.maximum(a[4], b[4]), jnp.maximum(a[5], b[5]),
                    a[6] + b[6], jnp.maximum(a[7], b[7]))

        acc = stage(0, False, N >= 1)
        if N >= 2:
            acc = lax.fori_loop(
                1, N, lambda s, a: merge(a, stage(s, True, True)), acc)
        if N >= 1:
            acc = merge(acc, stage(N, True, False))
        d1, d2, d3, d4, w, p1, p2, uu = [mater(a) for a in acc]
        d_inf = ((d1 <= w * tol_i) & (d2 <= tol_i * w)
                 & (d3 <= tol_i * w) & (d4 < 0) & (w > 1e-14))
        p_inf = (p1 <= tol_i * uu) & (p2 < 0)
        return p_inf, d_inf

    def st_forcing_norm():
        """sqrt(|f|^2 + |h|^2 + |b|^2): h = -[x0; c], b = -d, so the
        norms read the data refs directly."""
        def stage_sq(s, first):
            t = (jnp.sum(q_ref[s] * q_ref[s], axis=0, keepdims=True)
                 + jnp.sum(r_ref[s] * r_ref[s], axis=0, keepdims=True)
                 + jnp.sum(d_ref[s] * d_ref[s], axis=0, keepdims=True))
            hhs = x0_ref[...] if first else c_ref[s - 1]
            return t + jnp.sum(hhs * hhs, axis=0, keepdims=True)
        acc = stage_sq(0, True)
        acc = lax.fori_loop(
            1, Np1, lambda s, a: a + stage_sq(s, False), acc)
        return mater(jnp.sqrt(acc))

    return types.SimpleNamespace(
        f32=f32, Bl=Bl, Np1=Np1, sigma=sigma, alpha=alpha,
        staged=staged,
        gemvH=gemvH, gemvA=gemvA, gemvG=gemvG, gemvGT=gemvGT,
        gemvAT=gemvAT,
        fx=fx, fu=fu, hh=hh, bb=bb,
        mater=mater, ssum=ssum, imax=imax,
        inner_residual=inner_residual, pnr=pnr, rnorm=rnorm,
        sel=sel, blend=blend, sel_x=sel_x, X=X,
        state=state, dstep=dstep, wr_state=wr_state,
        newton_step=newton_step,
        st_pnr_norm=st_pnr_norm,
        st_sel=st_sel,
        st_pnr_norm_blend=st_pnr_norm_blend,
        st_init_state=st_init_state,
        st_masked_write=st_masked_write,
        st_feasibility=st_feasibility,
        st_inner_norm_store=st_inner_norm_store,
        st_trial_norm=st_trial_norm,
        st_newton_step=st_newton_step,
        st_apply_step=st_apply_step,
        st_copy=st_copy,
        st_diff_norm=st_diff_norm,
        st_forcing_norm=st_forcing_norm)


def _solve_subproblem(ctx, opts: Options, I_REFS, K_REFS,
                      itol, Ek_outer, newton0, active):
    """The inner semismooth Newton loop (impl.h:229-304) in-kernel.

    The iterate xi lives in the I refs, the (fixed) prox center
    xbar = xk in the K refs; only scalars/rows ride the while carry.
    On entry xi <- xk; on exit duals are projected. Returns
    (Eo, ninfo, lfail) as (1, B) rows.
    """
    i32 = jnp.int32
    f32 = ctx.f32
    X = ctx.X
    blend = ctx.blend
    bb = ctx.bb

    # Carried initializers derived from computed data rather than
    # constants: constant splat layouts meeting computed layouts at
    # the while-loop carry join would need Mosaic's unimplemented
    # sublane broadcast.
    zero_row = itol * 0.0
    one_row = zero_row + 1.0
    zeros_i = zero_row.astype(i32)

    merit0 = jnp.concatenate([zero_row] * NONMONOTONE_DEPTH, axis=0)

    # xi <- xk (impl.h:182).
    if ctx.staged:
        ctx.st_copy(I_REFS, K_REFS)
    else:
        for ri_, rk_ in zip(I_REFS, K_REFS):
            ri_[...] = rk_[...]

    def icond(c):
        (i, go) = c[0], c[1]
        return go & (i < opts.max_inner_iters)

    def ibody(c):
        (i, _, Eo, ninfo, merit_buf, idone_i, lfail_i,
         Ei_best, stall_ct) = c
        # Masks ride the carry as int32 rows: Mosaic cannot lower
        # (1, B) bool while-carries (sublane broadcast).
        idone = idone_i > 0
        lfail = lfail_i > 0
        if ctx.staged:
            # Writes -ri and (v, y, vbar) into the Newton-step scratch.
            Ei = ctx.st_inner_norm_store(I_REFS, K_REFS)
            Eo_new = ctx.st_pnr_norm(I_REFS)
        else:
            xi = ctx.state(I_REFS)
            xbar = ctx.state(K_REFS)
            ri = ctx.inner_residual(*xi, xbar[0], xbar[1], xbar[2],
                                    xbar[3])
            Ei = ctx.rnorm(ri)
            Eo_new = ctx.rnorm(ctx.pnr(*xi))

        brk = (((Ei <= itol) & (Eo_new < Ek_outer))
               | (Ei <= opts.inner_tol_min)
               | (ninfo >= opts.max_newton_iters))
        if opts.inner_stall_tol > 0.0:
            improved = Ei < Ei_best * (1.0 - opts.inner_stall_tol)
            stall_ct = blend(improved, jnp.zeros_like(stall_ct),
                             stall_ct + 1)
            brk = brk | (stall_ct >= 3)
        Ei_best = jnp.minimum(Ei_best, Ei)

        step = active & ~idone & ~brk & ~lfail
        if ctx.staged:
            ok = ctx.st_newton_step(I_REFS, K_REFS, zero_row)
        else:
            ok = ctx.newton_step(*xi, xbar[3], *ri)
        lfail_new = lfail | (step & ~ok)

        current_merit = 0.5 * Ei * Ei
        buf = jnp.concatenate(
            [current_merit, merit_buf[:-1]], axis=0)
        if opts.nonmonotone_linesearch:
            m0 = ctx.mater(jnp.max(buf, axis=0, keepdims=True))
        else:
            m0 = current_merit

        def lcond(lc):
            return lc[2] & (lc[0] < opts.max_linesearch_iters)

        def lbody(lc):
            j, t, _, _ = lc
            if ctx.staged:
                np_ = ctx.st_trial_norm(I_REFS, K_REFS, t)
            else:
                tb = t
                xi_ = ctx.state(I_REFS)
                d = ctx.dstep()
                # Trial x + t*dx with the margin rule
                # y <- y + t*(dy - b) (full_variable.cc:55-65).
                xp = X((xi_[0] + tb * d[0], xi_[1] + tb * d[1],
                        xi_[2] + tb * d[2], xi_[3] + tb * d[3],
                        xi_[4] + tb * (d[4] - bb)))
                xb = ctx.state(K_REFS)
                rp = ctx.inner_residual(*xp, xb[0], xb[1], xb[2], xb[3])
                np_ = ctx.rnorm(rp)
            mp = 0.5 * np_ * np_
            accept = mp <= m0 - 2.0 * t * opts.eta * current_merit
            acc_f = accept.astype(f32)
            t_next = t * (acc_f + (1.0 - acc_f) * opts.beta)
            go = jnp.any(~accept & step)
            return j + 1, t_next, go, accept.astype(jnp.int32)

        _, t_fin, _, _ = lax.while_loop(
            lcond, lbody,
            (i32(0), one_row, jnp.bool_(True), zeros_i))

        tm = step.astype(f32) * t_fin
        if ctx.staged:
            ctx.st_apply_step(I_REFS, tm)
        else:
            d = ctx.dstep()
            ctx.wr_state(I_REFS, X((
                xi[0] + tm * d[0], xi[1] + tm * d[1],
                xi[2] + tm * d[2], xi[3] + tm * d[3],
                xi[4] + tm * (d[4] - bb))))

        # Only successful steps count (the reference throws before
        # newton_iters_++ on factorization failure, impl.h:263-275;
        # core/algorithm.py matches).
        ninfo_new = ninfo + (step & ok).astype(jnp.int32)
        Eo_out = blend(active & ~idone, Eo_new, Eo)
        idone_new = idone | (brk & active) | ~active

        go = jnp.any(active & ~idone_new & ~lfail_new)
        return (i + 1, go, Eo_out, ninfo_new, buf,
                idone_new.astype(jnp.int32),
                lfail_new.astype(jnp.int32), Ei_best, stall_ct)

    init = (i32(0), jnp.any(active),
            zero_row, newton0, merit0,
            zeros_i, zeros_i,
            zero_row + jnp.inf, zeros_i)
    (_, _, Eo, ninfo, _, _, lfail_i, _, _) = lax.while_loop(
        icond, ibody, init)
    lfail = lfail_i > 0
    # Project duals (impl.h:301).
    iv_ref = I_REFS[3]
    iv_ref[...] = jnp.maximum(iv_ref[...], 0.0)
    return Eo, ninfo, lfail


def _make_solve_kernel(N, nx, nu, nc, opts: Options, lowmem: bool = False,
                       staged: bool = False):
    """Builds the full-solve kernel body closure for static dims +
    options. lowmem selects the recompute-factors Riccati mode (large
    stage dims); staged selects the per-stage fori_loop math (see
    _build_ctx) so large stage dims do not blow the register allocator
    into scoped-VMEM spill slots — the whole algorithm then runs in one
    kernel even for the CopolymerizationReactor class."""
    Np1 = N + 1
    ns = nx + nu

    def kernel(q_ref, r_ref, c_ref, x0_ref, d_ref,
               Q_ref, R_ref, S_ref, A_ref, B_ref, E_ref, L_ref,
               zx0_ref, zu0_ref, l0_ref, v0_ref,
               # outputs
               z_out, l_out, v_out, y_out,
               eflag_out, res_out, newton_out, prox_out, e0_out,
               # scratch: the Newton-step set, then the xk/xi iterate
               # state in VMEM refs — carrying whole iterates through the
               # while loops as SSA values makes the register allocator
               # spill every live copy to scoped-VMEM slots (measured
               # 144 MB of spill slots at nx=18/N=80); ref-based state
               # bounds the live set to the few vectors being combined.
               *scr):
        n_step = 15 if lowmem else 18
        step_scr = scr[:n_step]
        K_REFS = scr[n_step:n_step + 5]
        I_REFS = scr[n_step + 5:n_step + 10]
        red_s = scr[n_step + 10]

        ctx = _build_ctx(
            N, nx, nu, nc, opts, lowmem,
            (q_ref, r_ref, c_ref, x0_ref, d_ref,
             Q_ref, R_ref, S_ref, A_ref, B_ref, E_ref, L_ref),
            step_scr, red_s, staged=staged)
        f32 = ctx.f32
        Bl = ctx.Bl
        X = ctx.X
        blend = ctx.blend
        sel_x = ctx.sel_x
        mater = ctx.mater
        ssum = ctx.ssum
        imax = ctx.imax
        bb = ctx.bb
        fx, fu, hh = ctx.fx, ctx.fu, ctx.hh

        if staged:
            forcing = ctx.st_forcing_norm()
        else:
            forcing = mater(jnp.sqrt(ssum(fx) + ssum(fu) + ssum(hh)
                            + ssum(bb)))
        combo_tol = opts.abs_tol + opts.rel_tol * (1.0 + forcing)

        # ---------- initialization (impl.h:139-149) ----------
        if staged:
            ctx.st_init_state(
                K_REFS, zx0_ref, zu0_ref, l0_ref, v0_ref)
            E0 = ctx.st_pnr_norm(K_REFS)
            # ssum(ones) is exactly the row count (small-int f32 sums
            # are exact), so dx0 = ones has a closed-form norm.
            dxn0 = mater(E0 * 0.0 + float(
                (Np1 * (2 * nx + nu + nc)) ** 0.5))
        else:
            zx0 = zx0_ref[...].reshape(Np1 * nx, Bl)
            zu0 = zu0_ref[...].reshape(Np1 * nu, Bl)
            l0 = l0_ref[...].reshape(Np1 * nx, Bl)
            v0 = v0_ref[...].reshape(Np1 * nc, Bl)
            y0 = bb - ctx.gemvA(zx0, zu0)
            xk0 = X((zx0, zu0, l0, v0, y0))

            ones_zx = jnp.ones_like(zx0)
            ones_zu = jnp.ones_like(zu0)
            # Only ||dx|| crosses outer iterations (the stall test); the
            # full step is consumed within its own iteration.
            dxn0 = mater(jnp.sqrt(
                ssum(ones_zx) + ssum(ones_zu) + ssum(jnp.ones_like(l0))
                + ssum(jnp.ones_like(v0))))

            E0 = ctx.rnorm(ctx.pnr(*xk0))
        e0_out[...] = E0
        itol0 = jnp.clip(E0, opts.inner_tol_min, opts.inner_tol_max)

        i32 = jnp.int32
        zero_row = E0 * 0.0
        false_b = zero_row > 1.0
        zeros_i = zero_row.astype(i32)

        # ---------- outer proximal loop (impl.h:158-224) ----------
        def write_out(mask, xval):
            """Masked write of a state tuple into the output refs."""
            mz = jnp.zeros((Np1, ns, Bl), f32) + mask.astype(f32)
            z_out[...] = jnp.where(
                mz > 0.5,
                jnp.concatenate(
                    [xval[0].reshape(Np1, nx, Bl),
                     xval[1].reshape(Np1, nu, Bl)], axis=1), z_out[...])
            ml = jnp.zeros((Np1, nx, Bl), f32) + mask.astype(f32)
            l_out[...] = jnp.where(
                ml > 0.5, xval[2].reshape(Np1, nx, Bl), l_out[...])
            mv = jnp.zeros((Np1, nc, Bl), f32) + mask.astype(f32)
            v_out[...] = jnp.where(
                mv > 0.5, xval[3].reshape(Np1, nc, Bl), v_out[...])
            y_out[...] = jnp.where(
                mv > 0.5, xval[4].reshape(Np1, nc, Bl), y_out[...])

        def st_write_out(mask, rd):
            ctx.st_masked_write(z_out, l_out, v_out, y_out, mask, rd)

        def ocond(c):
            return c[1] & (c[0] < opts.max_prox_iters)

        def obody(c):
            (k, _, dxn, itol, Ek_prev, ninfo, pinfo, done_i, eflag,
             ores) = c
            done = done_i > 0
            if staged:
                Ek = ctx.st_pnr_norm(K_REFS)
            else:
                xk = ctx.state(K_REFS)
                Ek = ctx.rnorm(ctx.pnr(*xk))
            success = (Ek <= combo_tol) | (dxn <= opts.stall_tol)

            itol_new = jnp.clip(itol * opts.delta, opts.inner_tol_min, Ek)

            active = ~done & ~success
            Eo, ninfo_new, lfail = _solve_subproblem(
                ctx, opts, I_REFS, K_REFS, itol_new, Ek, ninfo, active)
            if not staged:
                xi = ctx.state(I_REFS)
                xk = ctx.state(K_REFS)  # re-read: shortens live ranges

                dx_new = X((xi[0] - xk[0], xi[1] - xk[1], xi[2] - xk[2],
                            xi[3] - xk[3], xi[4] - xk[4] + bb))
                dxn_new = mater(jnp.sqrt(
                    ssum(dx_new[0]) + ssum(dx_new[1]) + ssum(dx_new[2])
                    + ssum(dx_new[3])))
            else:
                dxn_new = ctx.st_diff_norm(I_REFS, K_REFS)
            dxn_out = blend(active, dxn_new, dxn)

            exhausted = active & (ninfo_new >= opts.max_newton_iters)
            better_xi = Eo < Ek
            if staged:
                res_bud = ctx.st_pnr_norm_blend(I_REFS, K_REFS, better_xi)
            else:
                xbud = sel_x(better_xi, xi, xk)
                res_bud = ctx.rnorm(ctx.pnr(*xbud))

            # Infeasibility detection (full_feasibility.cc:29-87).
            if opts.check_feasibility and staged:
                p_inf, d_inf = ctx.st_feasibility(
                    I_REFS, K_REFS, opts.infeas_tol)
            elif opts.check_feasibility:
                dzx_, dzu_, dl_, dv_ = (dx_new[0], dx_new[1], dx_new[2],
                                        dx_new[3])
                d1 = mater(jnp.max(ctx.gemvA(dzx_, dzu_), axis=0,
                                   keepdims=True))
                d2 = imax(ctx.gemvG(dzx_, dzu_))
                d3x, d3u = ctx.gemvH(dzx_, dzu_)
                d3 = jnp.maximum(imax(d3x), imax(d3u))
                d4 = mater(jnp.sum(fx * dzx_, axis=0, keepdims=True)
                           + jnp.sum(fu * dzu_, axis=0, keepdims=True))
                w = jnp.maximum(imax(dzx_), imax(dzu_))
                tol_i = opts.infeas_tol
                d_inf = ((d1 <= w * tol_i) & (d2 <= tol_i * w)
                         & (d3 <= tol_i * w) & (d4 < 0) & (w > 1e-14))
                p1x, p1u = ctx.gemvAT(dv_)
                g1x, g1u = ctx.gemvGT(dl_)
                p1 = jnp.maximum(imax(p1x + g1x), imax(p1u + g1u))
                p2 = mater(jnp.sum(hh * dl_, axis=0, keepdims=True)
                           + jnp.sum(bb * dv_, axis=0, keepdims=True))
                uu = jnp.maximum(imax(dv_), imax(dl_))
                p_inf = (p1 <= tol_i * uu) & (p2 < 0)
            else:
                p_inf = false_b
                d_inf = false_b
            p_inf = p_inf & active
            d_inf = d_inf & active
            infeas = p_inf | d_inf
            ezero = jnp.zeros((1, Bl), i32)
            eflag_infeas = blend(
                p_inf & d_inf,
                ezero + int(ExitFlag.PRIMAL_DUAL_INFEASIBLE),
                blend(p_inf, ezero + int(ExitFlag.PRIMAL_INFEASIBLE),
                      ezero + int(ExitFlag.DUAL_INFEASIBLE)))

            lfail = lfail & active
            done_new = done | success | lfail | exhausted | infeas
            # Priority chain applied in reverse so later blends override.
            eflag_new = blend(infeas, eflag_infeas, eflag)
            eflag_new = blend(
                exhausted, jnp.zeros_like(eflag)
                + int(ExitFlag.MAXITERATIONS), eflag_new)
            eflag_new = blend(
                lfail, jnp.zeros_like(eflag)
                + int(ExitFlag.LINEAR_SOLVER_FAILED), eflag_new)
            eflag_new = blend(success & ~done, jnp.zeros_like(eflag)
                              + int(ExitFlag.SUCCESS), eflag_new)

            # Write exiting instances' outputs now instead of carrying
            # them (saves an extra state copy in the while carry).
            newly = done_new & ~done
            if staged:
                succ_nd = success & ~done

                def rd_out(s):
                    out = []
                    for ci in range(5):
                        a = I_REFS[ci][s]
                        b = K_REFS[ci][s]
                        dxc = a - b if ci != 4 else a - b - d_ref[s]
                        xbudc = ctx.st_sel(better_xi, a, b)
                        v1 = ctx.st_sel(exhausted, xbudc, dxc)
                        v2 = ctx.st_sel(lfail, b, v1)
                        out.append(ctx.st_sel(succ_nd, b, v2))
                    return tuple(out)

                st_write_out(newly, rd_out)
            else:
                out_val = sel_x(
                    success & ~done, xk,
                    sel_x(lfail, xk, sel_x(exhausted, xbud, dx_new)))
                write_out(newly, out_val)
            ores_new = blend(infeas, Ek, ores)
            ores_new = blend(exhausted, res_bud, ores_new)
            ores_new = blend(lfail, Ek, ores_new)
            ores_new = blend(success & ~done, Ek, ores_new)

            cont = ~done_new
            if staged:
                # x(k+1) = xi, per stage (NaN-safe select).
                def adv_body(s, z):
                    for ri_, rk_ in zip(I_REFS, K_REFS):
                        rk_[s] = ctx.st_sel(cont, ri_[s], rk_[s])
                    return z
                lax.fori_loop(0, Np1, adv_body, jnp.int32(0))
            else:
                ctx.wr_state(K_REFS, sel_x(cont, xi, xk))  # x(k+1) = xi
            pinfo_new = pinfo + cont.astype(jnp.int32)
            Ek_keep = blend(done, Ek_prev, Ek)

            go = jnp.any(cont)
            return (k + 1, go, dxn_out, itol_new, Ek_keep,
                    ninfo_new, pinfo_new, done_new.astype(jnp.int32),
                    eflag_new, ores_new)

        # Output refs start undefined: initialize with the warmstart so
        # masked exit-writes compose against defined data.
        if staged:
            st_write_out(zero_row < 1.0,
                         lambda s: tuple(r[s] for r in K_REFS))
        else:
            ctx.wr_state(K_REFS, xk0)
            write_out(zero_row < 1.0, xk0)

        init = (i32(0), jnp.bool_(True), dxn0, itol0,
                E0, zeros_i, zeros_i, zeros_i,
                zeros_i + int(ExitFlag.MAXITERATIONS),
                E0)
        (_, _, _, _, Ek_f, ninfo_f, pinfo_f, done_fi, eflag_f,
         ores_f) = lax.while_loop(ocond, obody, init)
        done_f = done_fi > 0

        # Prox budget exhausted (impl.h:219-223): xk with last Ek.
        if staged:
            st_write_out(~done_f,
                         lambda s: tuple(r[s] for r in K_REFS))
        else:
            write_out(~done_f, ctx.state(K_REFS))
        out_res = blend(done_f, ores_f, Ek_f)
        eflag_fin = blend(done_f, eflag_f,
                          jnp.zeros((1, Bl), i32)
                          + int(ExitFlag.MAXITERATIONS))

        eflag_out[...] = eflag_fin
        res_out[...] = out_res
        newton_out[...] = ninfo_f
        prox_out[...] = pinfo_f

    return kernel


def _step_scratch_shapes(N, nx, nu, nc, tile_b, dtype, lowmem: bool):
    """VMEM scratch for one Newton step (matches _build_ctx's unpack)."""
    N1 = N + 1
    shapes = [
        pltpu.VMEM((N1, nx, tile_b), dtype),       # rzx_s
        pltpu.VMEM((N1, nu, tile_b), dtype),       # rzu_s
        pltpu.VMEM((N1, nx, tile_b), dtype),       # rl_s
        pltpu.VMEM((N1, nc, tile_b), dtype),       # rv_s
        pltpu.VMEM((N1, nc, tile_b), dtype),       # xv_s
        pltpu.VMEM((N1, nc, tile_b), dtype),       # xy_s
        pltpu.VMEM((N1, nc, tile_b), dtype),       # vb_s
        pltpu.VMEM((N1, nx, tile_b), dtype),       # dzx_s
        pltpu.VMEM((N1, nu, tile_b), dtype),       # dzu_s
        pltpu.VMEM((N1, nx, tile_b), dtype),       # dl_s
        pltpu.VMEM((N1, nc, tile_b), dtype),       # dv_s
        pltpu.VMEM((N1, nc, tile_b), dtype),       # dy_s
        pltpu.VMEM((N1, nx, nx, tile_b), dtype),   # Lc
    ]
    if not lowmem:
        shapes += [
            pltpu.VMEM((N1, nx, nx, tile_b), dtype),   # Mc
            pltpu.VMEM((N1, nu, nx, tile_b), dtype),   # SMc
            pltpu.VMEM((N1, nu, nu, tile_b), dtype),   # SGc
        ]
    shapes += [
        pltpu.VMEM((N1, nx, tile_b), dtype),       # th
        pltpu.VMEM((N1, nx, tile_b), dtype),       # h
    ]
    return shapes


def _state_scratch_shapes(N, nx, nu, nc, tile_b, dtype):
    N1 = N + 1
    return [
        pltpu.VMEM((N1, nx, tile_b), dtype),       # zx
        pltpu.VMEM((N1, nu, tile_b), dtype),       # zu
        pltpu.VMEM((N1, nx, tile_b), dtype),       # l
        pltpu.VMEM((N1, nc, tile_b), dtype),       # v
        pltpu.VMEM((N1, nc, tile_b), dtype),       # y
    ]


@vmem_jit(
    static_argnames=("options", "interpret", "tile_b", "lowmem", "staged"))
def fbstab_mpc_solve_fused(data, z0, l0, v0, options: Options,
                           interpret: bool = False, tile_b: int = TILE_B,
                           lowmem: bool = False, staged: bool = False):
    """Batched MPC solve through the fused kernel.

    data: MpcQPData (batch-first leaves); z0/l0/v0: (B, nz/nl/nv).
    Returns (Variable, CoreOut) batch-first, matching
    vmap(fbstab_solve)'s contract. The batch is processed in TILE_B-lane
    tiles; each tile is a complete solve, so there is no cross-tile sync.
    Standard mode launches the tiles as a pipelined Pallas grid so the
    next tile's HBM->VMEM input windows are double-buffered against the
    current tile's compute. lowmem selects the recompute-factors Riccati
    mode (bit-identical results, ~18 MB less VMEM per 128-lane tile at
    nx=18/N=80) so large stage dimensions fit; there the doubled input
    windows would not fit (cf. riccati_pallas), so tiles go through a
    serial lax.map with whole-array windows instead. staged selects the
    per-stage fori_loop kernel math (see _build_ctx) — required at large
    stage dims where full-horizon intermediates blow the register
    allocator into scoped-VMEM spill slots; it shares the serial
    lax.map tile launch.
    """
    opts = options.validated()
    B = z0.shape[0]
    N = data.A.shape[1]
    nx = data.A.shape[-1]
    nu = data.B.shape[-1]
    nc = data.E.shape[-2]
    N1, ns = N + 1, nx + nu
    dtype = z0.dtype
    serial = lowmem or staged

    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    pad = Bp - B
    T = Bp // tile_b

    def prep(a, shape):
        a = pad_batch(a, B, pad, shape)
        if serial:
            # (Bp, *shape) -> (T, *shape, tile_b): serial lax.map tiles.
            a = a.reshape((T, tile_b) + shape)
            return jnp.moveaxis(a, 1, -1)
        # (Bp, *shape) -> (*shape, Bp): pipelined-grid layout, the grid
        # blocks over the trailing batch axis in tile_b lanes.
        return jnp.moveaxis(a, 0, -1)

    ins = (
        prep(data.q, (N1, nx)), prep(data.r, (N1, nu)),
        prep(data.c, (N, nx)), prep(data.x0, (nx,)),
        prep(data.d, (N1, nc)),
        prep(data.Q, (N1, nx, nx)), prep(data.R, (N1, nu, nu)),
        prep(data.S, (N1, nu, nx)),
        prep(data.A, (N, nx, nx)), prep(data.B, (N, nx, nu)),
        prep(data.E, (N1, nc, nx)), prep(data.L, (N1, nc, nu)),
        prep(z0.reshape(B, N1, ns)[:, :, :nx].reshape(B, N1 * nx),
             (N1, nx)),
        prep(z0.reshape(B, N1, ns)[:, :, nx:].reshape(B, N1 * nu),
             (N1, nu)),
        prep(l0, (N1, nx)), prep(v0, (N1, nc)),
    )

    kernel = _make_solve_kernel(N, nx, nu, nc, opts, lowmem=lowmem,
                                staged=staged)
    in_shapes = (
        (N1, nx), (N1, nu), (N, nx), (nx,), (N1, nc),
        (N1, nx, nx), (N1, nu, nu), (N1, nu, nx),
        (N, nx, nx), (N, nx, nu), (N1, nc, nx), (N1, nc, nu),
        (N1, nx), (N1, nu), (N1, nx), (N1, nc),
    )
    out_sh = ((N1, ns), (N1, nx), (N1, nc), (N1, nc),
              (1,), (1,), (1,), (1,), (1,))
    out_dt = (dtype, dtype, dtype, dtype,
              jnp.int32, dtype, jnp.int32, jnp.int32, dtype)
    scratch = _step_scratch_shapes(N, nx, nu, nc, tile_b, dtype, lowmem)
    scratch += _state_scratch_shapes(N, nx, nu, nc, tile_b, dtype)  # xk
    scratch += _state_scratch_shapes(N, nx, nu, nc, tile_b, dtype)  # xi
    scratch += [pltpu.VMEM((1, tile_b), dtype)]    # red_s (see mater)

    if serial:
        vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shape = tuple(
            jax.ShapeDtypeStruct(s + (tile_b,), dt)
            for s, dt in zip(out_sh, out_dt))
        call = pl.pallas_call(
            kernel,
            in_specs=[vspec() for _ in ins],
            out_specs=tuple(vspec() for _ in out_shape),
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_KIB * 1024),
            interpret=interpret,
        )
        outs = lax.map(lambda a: call(*a), ins)

        def unprep(a, flat):
            # (T, *shape, tile_b) -> (B, flat)
            a = jnp.moveaxis(a, -1, 1).reshape((Bp,) + a.shape[1:-1])
            a = a[:B]
            return a.reshape(B, flat) if flat else a.reshape(B)
    else:
        def gspec(shape):
            nd = len(shape)
            return pl.BlockSpec(
                shape + (tile_b,),
                (lambda *i, _nd=nd: (0,) * _nd + (i[0],)),
                memory_space=pltpu.VMEM)

        out_shape = tuple(
            jax.ShapeDtypeStruct(s + (Bp,), dt)
            for s, dt in zip(out_sh, out_dt))
        outs = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[gspec(s) for s in in_shapes],
            out_specs=tuple(gspec(s) for s in out_sh),
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_KIB * 1024),
            interpret=interpret,
        )(*ins)

        def unprep(a, flat):
            # (*shape, Bp) -> (B, flat)
            a = jnp.moveaxis(a, -1, 0)[:B]
            return a.reshape(B, flat) if flat else a.reshape(B)

    z, l, v, y = (unprep(outs[0], N1 * ns), unprep(outs[1], N1 * nx),
                  unprep(outs[2], N1 * nc), unprep(outs[3], N1 * nc))
    x = Variable(z=z, l=l, v=v, y=y)
    res = unprep(outs[5], 0)
    eflag = unprep(outs[4], 0)
    core = CoreOut(
        eflag=eflag, residual=res,
        newton_iters=unprep(outs[6], 0), prox_iters=unprep(outs[7], 0),
        initial_residual=unprep(outs[8], 0), raw_residual=res,
        # Per-lane (B,) so batch consumers (sharded out_specs, adaptive
        # scatter, ragged trim) treat it like every other lane field.
        refine_steps=jnp.zeros_like(eflag))
    return x, core


# ------------------------------------------------------------------
# Subproblem kernel: one proximal subproblem per launch; the outer
# proximal loop runs in XLA (models/mpc_subfused.py).
# ------------------------------------------------------------------

def _make_subproblem_kernel(N, nx, nu, nc, opts: Options,
                            lowmem: bool = False):
    """One outer-iteration kernel: Ek / success / inner_tol / the whole
    inner Newton loop / dxn, computed IN-KERNEL so every quantity feeding
    an iteration-count decision comes from the same arithmetic as the
    full-solve kernel (mixing XLA-computed thresholds with kernel-computed
    residuals flips near-threshold exits — found by the copoly parity
    test). The XLA outer loop does only exit bookkeeping on the exported
    rows."""
    def kernel(q_ref, r_ref, c_ref, x0_ref, d_ref,
               Q_ref, R_ref, S_ref, A_ref, B_ref, E_ref, L_ref,
               bzx_ref, bzu_ref, bl_ref, bv_ref, by_ref,   # xbar = xk
               itol_ref, dxn_ref, n0_ref, done_ref,        # (1, B) rows
               # outputs
               izx, izu, il, iv, iy,                       # xi
               eo_out, ninfo_out, lfail_out,
               ek_out, succ_out, itol_out, dxn_out,
               # scratch
               *scr):
        n_step = 15 if lowmem else 18
        step_scr = scr[:n_step]
        red_s = scr[n_step]

        ctx = _build_ctx(
            N, nx, nu, nc, opts, lowmem,
            (q_ref, r_ref, c_ref, x0_ref, d_ref,
             Q_ref, R_ref, S_ref, A_ref, B_ref, E_ref, L_ref),
            step_scr, red_s, staged=True)
        mater = ctx.mater

        forcing = ctx.st_forcing_norm()
        combo_tol = opts.abs_tol + opts.rel_tol * (1.0 + forcing)

        K_REFS = (bzx_ref, bzu_ref, bl_ref, bv_ref, by_ref)
        I_REFS = (izx, izu, il, iv, iy)
        itol_prev = itol_ref[...]
        dxn_prev = dxn_ref[...]
        n0 = n0_ref[...]
        done = done_ref[...] > 0

        # Outer-iteration head (impl.h:162-180), in-kernel arithmetic.
        Ek = ctx.st_pnr_norm(K_REFS)
        success = (Ek <= combo_tol) | (dxn_prev <= opts.stall_tol)
        itol = jnp.clip(itol_prev * opts.delta, opts.inner_tol_min, Ek)
        active = ~done & ~success

        Eo, ninfo, lfail = _solve_subproblem(
            ctx, opts, I_REFS, K_REFS, itol, Ek, n0, active)

        # dx norm for the next iteration's stall test (impl.h:164,203).
        dxn_new = ctx.st_diff_norm(I_REFS, K_REFS)

        eo_out[...] = Eo
        ninfo_out[...] = ninfo
        lfail_out[...] = lfail.astype(jnp.int32)
        ek_out[...] = Ek
        succ_out[...] = success.astype(jnp.int32)
        itol_out[...] = itol
        dxn_out[...] = ctx.blend(active, dxn_new, dxn_prev)

    return kernel


def prep_subfused_data(data, B: int, tile_b: int = TILE_B):
    """Tiles batch-first MpcQPData into the (T, *shape, tile_b) layout the
    subproblem kernel's lax.map consumes. Built ONCE per solve, outside
    the outer proximal loop, so the transposes are loop invariants."""
    N = data.A.shape[1]
    nx = data.A.shape[-1]
    nu = data.B.shape[-1]
    nc = data.E.shape[-2]
    N1 = N + 1
    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    pad = Bp - B
    T = Bp // tile_b

    def prep(a, shape):
        a = pad_batch(a, B, pad, shape).reshape((T, tile_b) + shape)
        return jnp.moveaxis(a, 1, -1)

    return (
        prep(data.q, (N1, nx)), prep(data.r, (N1, nu)),
        prep(data.c, (N, nx)), prep(data.x0, (nx,)),
        prep(data.d, (N1, nc)),
        prep(data.Q, (N1, nx, nx)), prep(data.R, (N1, nu, nu)),
        prep(data.S, (N1, nu, nx)),
        prep(data.A, (N, nx, nx)), prep(data.B, (N, nx, nu)),
        prep(data.E, (N1, nc, nx)), prep(data.L, (N1, nc, nu)),
    )


def mpc_subproblem_fused(data_tiles, dims, xbar: Variable, itol_prev,
                         dxn_prev, newton0, done, options: Options,
                         interpret: bool = False, tile_b: int = TILE_B,
                         lowmem: bool = False):
    """One fused outer iteration over a batch: in-kernel Ek / success /
    inner-tolerance update / the whole inner Newton loop / dx norm.

    data_tiles: output of prep_subfused_data (loop-invariant).
    dims: (N, nx, nu, nc). xbar: batch-first Variable (the prox center;
    xi is initialized to it in-kernel). itol_prev/dxn_prev: (B,) f32;
    newton0: (B,) i32; done: (B,) bool. Inactive lanes (done or success)
    return xi = xbar, Eo = 0, unchanged counters — the cond-select
    semantics of the vmapped algorithm. Returns
    (xi, Eo, ninfo, lfail, Ek, success, itol, dxn), scalars as (B,).
    """
    opts = options.validated()
    N, nx, nu, nc = dims
    N1, ns = N + 1, nx + nu
    B = itol_prev.shape[0]
    dtype = itol_prev.dtype
    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    pad = Bp - B
    T = Bp // tile_b

    def prep(a, shape):
        a = pad_batch(a, B, pad, shape).reshape((T, tile_b) + shape)
        return jnp.moveaxis(a, 1, -1)

    zs = xbar.z.reshape(B, N1, ns)
    ins = data_tiles + (
        prep(zs[:, :, :nx].reshape(B, N1 * nx), (N1, nx)),
        prep(zs[:, :, nx:].reshape(B, N1 * nu), (N1, nu)),
        prep(xbar.l, (N1, nx)), prep(xbar.v, (N1, nc)),
        prep(xbar.y, (N1, nc)),
        prep(itol_prev[:, None], (1,)), prep(dxn_prev[:, None], (1,)),
        prep(newton0[:, None].astype(jnp.int32), (1,)),
        prep(done[:, None].astype(jnp.int32), (1,)),
    )

    kernel = _make_subproblem_kernel(N, nx, nu, nc, opts, lowmem=lowmem)
    out_sh = ((N1, nx), (N1, nu), (N1, nx), (N1, nc), (N1, nc),
              (1,), (1,), (1,), (1,), (1,), (1,), (1,))
    out_dt = (dtype, dtype, dtype, dtype, dtype,
              dtype, jnp.int32, jnp.int32,
              dtype, jnp.int32, dtype, dtype)
    out_shape = tuple(
        jax.ShapeDtypeStruct(s + (tile_b,), dt)
        for s, dt in zip(out_sh, out_dt))
    scratch = _step_scratch_shapes(N, nx, nu, nc, tile_b, dtype, lowmem)
    scratch += [pltpu.VMEM((1, tile_b), dtype)]    # red_s

    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_KIB * 1024)
    call = pl.pallas_call(
        kernel,
        in_specs=[vspec() for _ in ins],
        out_specs=tuple(vspec() for _ in out_shape),
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=cparams,
    )
    outs = lax.map(lambda a: call(*a), ins)

    def unprep(a, flat):
        a = jnp.moveaxis(a, -1, 1).reshape((Bp,) + a.shape[1:-1])
        a = a[:B]
        return a.reshape(B, flat) if flat else a.reshape(B)

    zx = unprep(outs[0], N1 * nx).reshape(B, N1, nx)
    zu = unprep(outs[1], N1 * nu).reshape(B, N1, nu)
    z = jnp.concatenate([zx, zu], axis=2).reshape(B, N1 * ns)
    xi = Variable(
        z=z, l=unprep(outs[2], N1 * nx),
        v=unprep(outs[3], N1 * nc), y=unprep(outs[4], N1 * nc))
    Eo = unprep(outs[5], 0)
    ninfo = unprep(outs[6], 0)
    lfail = unprep(outs[7], 0) > 0
    Ek = unprep(outs[8], 0)
    success = unprep(outs[9], 0) > 0
    itol = unprep(outs[10], 0)
    dxn = unprep(outs[11], 0)
    return xi, Eo, ninfo, lfail, Ek, success, itol, dxn
