"""Fully fused FBstab-MPC solver kernel.

One Pallas kernel runs the ENTIRE FBstab algorithm — outer proximal loop,
inner semismooth Newton loop, nonmonotone linesearch, feasibility checks,
exit bookkeeping — for a tile of TILE_B QP instances held in the lane
dimension, start to finish, with zero HBM round-trips between iterations.

Why: measured on v5e, arithmetic inside a compiled kernel costs ~12 ns per
vector op while every XLA HLO in a `lax.while_loop` body costs ~10-100 us
of dispatch/memory overhead; with ~500 HLOs per Newton iteration the
XLA-orchestrated solver spends >99% of its time on op overhead. Fusing the
whole algorithm turns each Newton iteration into ~10^4 VPU instructions on
(sublane, lane) tiles.

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

import functools
import os

# The fused kernel's working set exceeds the default 16 MiB scoped-VMEM
# budget (~9 MB per 128-lane tile at N=30/nx=8; ~72 MB in lowmem mode at
# the CopolymerizationReactor's N=80/nx=18); v5e has 128 MiB of VMEM per
# core, so the limit is raised to 112 MiB. Must be in the env before
# libtpu initializes, so it is set at import time (idempotent, merged
# with existing args).
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=114688"
if _VMEM_FLAG not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG).strip()

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fbstab_tpu.core.algorithm import NONMONOTONE_DEPTH, CoreOut
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.options import Options
from fbstab_tpu.ops.pfb import pfb
from fbstab_tpu.ops.riccati_pallas import riccati_factor_solve
from fbstab_tpu.solver_out import ExitFlag

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


def _make_solve_kernel(N, nx, nu, nc, opts: Options, lowmem: bool = False):
    """Builds the kernel body closure for static dims + options. lowmem
    selects the recompute-factors Riccati mode (large stage dims)."""
    Np1 = N + 1
    ns = nx + nu
    sigma = float(opts.sigma0)
    alpha = float(opts.alpha)

    def kernel(q_ref, r_ref, c_ref, x0_ref, d_ref,
               Q_ref, R_ref, S_ref, A_ref, B_ref, E_ref, L_ref,
               zx0_ref, zu0_ref, l0_ref, v0_ref,
               # outputs
               z_out, l_out, v_out, y_out,
               eflag_out, res_out, newton_out, prox_out, e0_out,
               # scratch for the Newton step (x/u parts separate: Mosaic
               # cannot reduce over the offset layouts produced by slicing
               # the stage dim at non-sublane-aligned nx boundaries), plus
               # the xk/xi iterate state in VMEM refs: carrying whole
               # iterates through the while loops as SSA values makes the
               # register allocator spill every live copy to scoped-VMEM
               # slots (measured 144 MB of spill slots at nx=18/N=80);
               # ref-based state bounds the live set to the few vectors
               # actually being combined.
               *scr):
        if lowmem:
            (rzx_s, rzu_s, rl_s, rv_s, xv_s, xy_s, vb_s,
             dzx_s, dzu_s, dl_s, dv_s, dy_s,
             kzx, kzu, kl, kv, ky, izx, izu, il, iv, iy,
             Lc, th_s, h_s, red_s) = scr
            Mc = SMc = SGc = None
        else:
            (rzx_s, rzu_s, rl_s, rv_s, xv_s, xy_s, vb_s,
             dzx_s, dzu_s, dl_s, dv_s, dy_s,
             kzx, kzu, kl, kv, ky, izx, izu, il, iv, iy,
             Lc, Mc, SMc, SGc, th_s, h_s, red_s) = scr
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

        forcing = mater(jnp.sqrt(ssum(fx) + ssum(fu) + ssum(hh)
                         + ssum(bb)))
        combo_tol = opts.abs_tol + opts.rel_tol * (1.0 + forcing)

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
            leaks through; every call site below either has both operands
            finite or only contaminates lanes that already exited with
            LINEAR_SOLVER_FAILED (whose outputs are taken from the
            pre-failure iterate)."""
            mf = m.astype(a.dtype) if a.dtype != jnp.int32 else \
                m.astype(jnp.int32)
            return b + mf * (a - b)

        X = tuple  # state = (zx, zu, l, v, y), all 2-D (rows, B)

        def sel_x(m, a, b):
            return X(sel(m, ai, bi) for ai, bi in zip(a, b))

        _STATE_NS = (nx, nu, nx, nc, nc)

        def rd(ref, n):
            return ref[...].reshape(Np1 * n, Bl)

        def kstate():
            return X((rd(kzx, nx), rd(kzu, nu), rd(kl, nx), rd(kv, nc),
                      rd(ky, nc)))

        def istate():
            return X((rd(izx, nx), rd(izu, nu), rd(il, nx), rd(iv, nc),
                      rd(iy, nc)))

        def dstep():
            return X((rd(dzx_s, nx), rd(dzu_s, nu), rd(dl_s, nx),
                      rd(dv_s, nc), rd(dy_s, nc)))

        def wr_state(refs, vals):
            for r, v_, n in zip(refs, vals, _STATE_NS):
                r[...] = v_.reshape(Np1, n, Bl)

        I_REFS = (izx, izu, il, iv, iy)
        K_REFS = (kzx, kzu, kl, kv, ky)

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
            # Dual recovery (riccati_linear_solver.cc:329-342).
            ys = y + sigma * (v - bv)
            rr = jnp.sqrt(ys * ys + v * v)
            deg = rr < 1e-13
            rr = jnp.where(deg, 1.0, rr)
            ga = alpha * (1.0 - ys / rr)
            gb = alpha * (1.0 - v / rr)
            inter = (ys > 0) & (v > 0)
            ga = jnp.where(inter, ga + (1.0 - alpha) * v, ga)
            gb = jnp.where(inter, gb + (1.0 - alpha) * ys, gb)
            dgn = alpha * (1.0 - 1.0 / jnp.sqrt(jnp.asarray(2.0, f32)))
            ga = jnp.where(deg, dgn, ga)
            gb = jnp.where(deg, dgn, gb)
            mus = gb + sigma * ga
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

        # ---------- initialization (impl.h:139-149) ----------
        zx0 = zx0_ref[...].reshape(Np1 * nx, Bl)
        zu0 = zu0_ref[...].reshape(Np1 * nu, Bl)
        l0 = l0_ref[...].reshape(Np1 * nx, Bl)
        v0 = v0_ref[...].reshape(Np1 * nc, Bl)
        y0 = bb - gemvA(zx0, zu0)
        xk0 = X((zx0, zu0, l0, v0, y0))

        ones_zx = jnp.ones_like(zx0)
        ones_zu = jnp.ones_like(zu0)
        # Only ||dx|| crosses outer iterations (the stall test); the full
        # step is consumed within its own iteration.
        dxn0 = mater(jnp.sqrt(
            ssum(ones_zx) + ssum(ones_zu) + ssum(jnp.ones_like(l0))
            + ssum(jnp.ones_like(v0))))

        E0 = rnorm(pnr(*xk0))
        e0_out[...] = E0
        itol0 = jnp.clip(E0, opts.inner_tol_min, opts.inner_tol_max)

        i32 = jnp.int32
        # Carried initializers derived from computed data rather than
        # constants: constant splat layouts meeting computed layouts at
        # the while-loop carry join would need Mosaic's unimplemented
        # sublane broadcast.
        zero_row = E0 * 0.0
        one_row = zero_row + 1.0
        zeros_i = zero_row.astype(i32)
        false_b = zero_row > 1.0

        # ---------- inner subproblem (impl.h:229-304) ----------
        # The iterate xi lives in the i-refs, the (fixed) prox center
        # xbar = xk in the k-refs; only scalars/rows ride the while carry.
        def solve_subproblem(itol, Ek_outer, newton0, active):
            merit0 = jnp.concatenate([zero_row] * NONMONOTONE_DEPTH,
                                     axis=0)

            # xi <- xk (impl.h:182).
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
                xi = istate()
                xbar = kstate()
                ri = inner_residual(*xi, xbar[0], xbar[1], xbar[2],
                                    xbar[3])
                Ei = rnorm(ri)
                Eo_new = rnorm(pnr(*xi))

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
                ok = newton_step(*xi, xbar[3], *ri)
                lfail_new = lfail | (step & ~ok)

                current_merit = 0.5 * Ei * Ei
                buf = jnp.concatenate(
                    [current_merit, merit_buf[:-1]], axis=0)
                if opts.nonmonotone_linesearch:
                    m0 = mater(jnp.max(buf, axis=0, keepdims=True))
                else:
                    m0 = current_merit

                def lcond(lc):
                    return lc[2] & (lc[0] < opts.max_linesearch_iters)

                def lbody(lc):
                    j, t, _, _ = lc
                    tb = t
                    xi_ = istate()
                    d = dstep()
                    # Trial x + t*dx with the margin rule
                    # y <- y + t*(dy - b) (full_variable.cc:55-65).
                    xp = X((xi_[0] + tb * d[0], xi_[1] + tb * d[1],
                            xi_[2] + tb * d[2], xi_[3] + tb * d[3],
                            xi_[4] + tb * (d[4] - bb)))
                    xb = kstate()
                    rp = inner_residual(*xp, xb[0], xb[1], xb[2], xb[3])
                    np_ = rnorm(rp)
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
                d = dstep()
                wr_state(I_REFS, X((
                    xi[0] + tm * d[0], xi[1] + tm * d[1],
                    xi[2] + tm * d[2], xi[3] + tm * d[3],
                    xi[4] + tm * (d[4] - bb))))

                ninfo_new = ninfo + step.astype(jnp.int32)
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
            iv[...] = jnp.maximum(iv[...], 0.0)
            return Eo, ninfo, lfail

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

        def ocond(c):
            return c[1] & (c[0] < opts.max_prox_iters)

        def obody(c):
            (k, _, dxn, itol, Ek_prev, ninfo, pinfo, done_i, eflag,
             ores) = c
            done = done_i > 0
            xk = kstate()
            Ek = rnorm(pnr(*xk))
            success = (Ek <= combo_tol) | (dxn <= opts.stall_tol)

            itol_new = jnp.clip(itol * opts.delta, opts.inner_tol_min, Ek)

            active = ~done & ~success
            Eo, ninfo_new, lfail = solve_subproblem(
                itol_new, Ek, ninfo, active)
            xi = istate()
            xk = kstate()    # re-read: shortens live ranges across the loop

            dx_new = X((xi[0] - xk[0], xi[1] - xk[1], xi[2] - xk[2],
                        xi[3] - xk[3], xi[4] - xk[4] + bb))
            dxn_new = mater(jnp.sqrt(
                ssum(dx_new[0]) + ssum(dx_new[1]) + ssum(dx_new[2])
                + ssum(dx_new[3])))
            dxn_out = blend(active, dxn_new, dxn)

            exhausted = active & (ninfo_new >= opts.max_newton_iters)
            better_xi = Eo < Ek
            xbud = sel_x(better_xi, xi, xk)
            res_bud = rnorm(pnr(*xbud))

            # Infeasibility detection (full_feasibility.cc:29-87).
            if opts.check_feasibility:
                dzx_, dzu_, dl_, dv_ = (dx_new[0], dx_new[1], dx_new[2],
                                        dx_new[3])
                d1 = mater(jnp.max(gemvA(dzx_, dzu_), axis=0,
                                   keepdims=True))
                d2 = imax(gemvG(dzx_, dzu_))
                d3x, d3u = gemvH(dzx_, dzu_)
                d3 = jnp.maximum(imax(d3x), imax(d3u))
                d4 = mater(jnp.sum(fx * dzx_, axis=0, keepdims=True)
                           + jnp.sum(fu * dzu_, axis=0, keepdims=True))
                w = jnp.maximum(imax(dzx_), imax(dzu_))
                tol_i = opts.infeas_tol
                d_inf = ((d1 <= w * tol_i) & (d2 <= tol_i * w)
                         & (d3 <= tol_i * w) & (d4 < 0) & (w > 1e-14))
                p1x, p1u = gemvAT(dv_)
                g1x, g1u = gemvGT(dl_)
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
            out_val = sel_x(
                success & ~done, xk,
                sel_x(lfail, xk, sel_x(exhausted, xbud, dx_new)))
            write_out(newly, out_val)
            ores_new = blend(infeas, Ek, ores)
            ores_new = blend(exhausted, res_bud, ores_new)
            ores_new = blend(lfail, Ek, ores_new)
            ores_new = blend(success & ~done, Ek, ores_new)

            cont = ~done_new
            wr_state(K_REFS, sel_x(cont, xi, xk))  # x(k+1) = xi
            pinfo_new = pinfo + cont.astype(jnp.int32)
            Ek_keep = blend(done, Ek_prev, Ek)

            go = jnp.any(cont)
            return (k + 1, go, dxn_out, itol_new, Ek_keep,
                    ninfo_new, pinfo_new, done_new.astype(jnp.int32),
                    eflag_new, ores_new)

        # Output refs start undefined: initialize with the warmstart so
        # masked exit-writes compose against defined data.
        wr_state(K_REFS, xk0)
        write_out(zero_row < 1.0, xk0)

        init = (i32(0), jnp.bool_(True), dxn0, itol0,
                E0, zeros_i, zeros_i, zeros_i,
                zeros_i + int(ExitFlag.MAXITERATIONS),
                E0)
        (_, _, _, _, Ek_f, ninfo_f, pinfo_f, done_fi, eflag_f,
         ores_f) = lax.while_loop(ocond, obody, init)
        done_f = done_fi > 0

        # Prox budget exhausted (impl.h:219-223): xk with last Ek.
        write_out(~done_f, kstate())
        out_res = blend(done_f, ores_f, Ek_f)
        eflag_fin = blend(done_f, eflag_f,
                          jnp.zeros((1, Bl), i32)
                          + int(ExitFlag.MAXITERATIONS))

        eflag_out[...] = eflag_fin
        res_out[...] = out_res
        newton_out[...] = ninfo_f
        prox_out[...] = pinfo_f

    return kernel


@functools.partial(
    jax.jit, static_argnames=("options", "interpret", "tile_b", "lowmem"))
def fbstab_mpc_solve_fused(data, z0, l0, v0, options: Options,
                           interpret: bool = False, tile_b: int = TILE_B,
                           lowmem: bool = False):
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
    serial lax.map with whole-array windows instead.
    """
    opts = options.validated()
    B = z0.shape[0]
    N = data.A.shape[1]
    nx = data.A.shape[-1]
    nu = data.B.shape[-1]
    nc = data.E.shape[-2]
    N1, ns = N + 1, nx + nu
    dtype = z0.dtype

    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    pad = Bp - B
    T = Bp // tile_b

    def prep(a, shape):
        a = a.reshape((B,) + shape)
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0)
        if lowmem:
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

    kernel = _make_solve_kernel(N, nx, nu, nc, opts, lowmem=lowmem)
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
    state = [
        pltpu.VMEM((N1, nx, tile_b), dtype),       # zx
        pltpu.VMEM((N1, nu, tile_b), dtype),       # zu
        pltpu.VMEM((N1, nx, tile_b), dtype),       # l
        pltpu.VMEM((N1, nc, tile_b), dtype),       # v
        pltpu.VMEM((N1, nc, tile_b), dtype),       # y
    ]
    scratch = [
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
        *state,                                    # xk refs
        *state,                                    # xi refs
        pltpu.VMEM((N1, nx, nx, tile_b), dtype),   # Lc
    ]
    if not lowmem:
        scratch += [
            pltpu.VMEM((N1, nx, nx, tile_b), dtype),   # Mc
            pltpu.VMEM((N1, nu, nx, tile_b), dtype),   # SMc
            pltpu.VMEM((N1, nu, nu, tile_b), dtype),   # SGc
        ]
    scratch += [
        pltpu.VMEM((N1, nx, tile_b), dtype),       # th
        pltpu.VMEM((N1, nx, tile_b), dtype),       # h
        pltpu.VMEM((1, tile_b), dtype),            # red_s (see mater)
    ]

    if lowmem:
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
            interpret=interpret,
        )(*ins)

        def unprep(a, flat):
            # (*shape, Bp) -> (B, flat)
            a = jnp.moveaxis(a, -1, 0)[:B]
            return a.reshape(B, flat) if flat else a.reshape(B)

    z, l, v, y = (unprep(outs[0], N1 * ns), unprep(outs[1], N1 * nx),
                  unprep(outs[2], N1 * nc), unprep(outs[3], N1 * nc))
    x = Variable(z=z, l=l, v=v, y=y)
    core = CoreOut(
        eflag=unprep(outs[4], 0), residual=unprep(outs[5], 0),
        newton_iters=unprep(outs[6], 0), prox_iters=unprep(outs[7], 0),
        initial_residual=unprep(outs[8], 0))
    return x, core
