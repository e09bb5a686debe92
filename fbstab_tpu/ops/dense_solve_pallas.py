"""Fully fused FBstab solver kernel for dense QPs.

The dense sibling of ops/mpc_solve_pallas.py: the whole FBstab algorithm
(outer proximal loop, inner Newton loop, nonmonotone linesearch,
feasibility checks) for a tile of TILE_B QP instances in the lane
dimension, covering both inequality-only (nl == 0) and
equality-constrained problems.

Same masked-lockstep semantics as vmap(fbstab_solve) (validated in
interpret mode), same Mosaic workarounds as the MPC kernel (2-D state,
(1, B) scalar rows, int32 mask carries, arithmetic blends, `mater`
layout round-trips — see that module's docstring and CLAUDE.md).

The Newton step is the quasi-definite block factorization of
models/dense_qp.py:  E = H + sigma*I + A' diag(Gamma) A, Le = chol(E),
then (for nl > 0) the SPD Schur complement S = sigma*I + W'W with
W = Le^{-1} G' (reference: dense_cholesky_solver.cc:32-127).
"""

from __future__ import annotations

# The scoped-VMEM env flag is set by fbstab_tpu/__init__.py (112 MiB,
# which covers this kernel's smaller working set). Appending a second,
# smaller duplicate here could SHRINK the effective budget for the MPC
# kernels if libtpu honors the last duplicate, so this module sets none;
# the per-compile channel is the vmem_jit(limit_kib=...) below and the
# CompilerParams on the pallas_call.

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fbstab_tpu.core.algorithm import NONMONOTONE_DEPTH, CoreOut
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.options import Options
from fbstab_tpu.ops.pfb import pfb
from fbstab_tpu.utils.compile import vmem_jit
from fbstab_tpu.ops.riccati_pallas import (
    _chol,
    _mm,
    _mv,
    _pfb_weights,
    pad_batch,
    _T,
    _tri_lower,
    _tri_upperT,
)
from fbstab_tpu.solver_out import ExitFlag

TILE_B = 128


def _make_dense_kernel(n, q, nl, opts: Options):
    """Kernel body for static sizes (nl == 0 statically removes every
    equality-block computation; the dummy l rows are never touched)."""
    sigma = float(opts.sigma0)
    alpha = float(opts.alpha)
    HAS_EQ = nl > 0
    nl_p = max(nl, 1)

    def kernel(H_ref, f_ref, G_ref, h_ref, A_ref, b_ref,
               z0_ref, l0_ref, v0_ref,
               z_out, l_out, v_out, y_out,
               eflag_out, res_out, newton_out, prox_out, e0_out,
               red_s):
        f32 = H_ref.dtype
        Bl = H_ref.shape[-1]
        Amat = A_ref[...]            # (q, n, B)
        Hmat = H_ref[...]            # (n, n, B)
        ff = f_ref[...]              # (n, B)
        bb = b_ref[...]              # (q, B)
        Gmat = G_ref[...]            # (nl_p, n, B); garbage rows if !HAS_EQ
        hv = h_ref[...]              # (nl_p, B)
        In = jnp.broadcast_to(jnp.eye(n, dtype=f32)[..., None], (n, n, Bl))
        if HAS_EQ:
            Il = jnp.broadcast_to(
                jnp.eye(nl, dtype=f32)[..., None], (nl, nl, Bl))

        def mater(x):
            red_s[...] = x
            return red_s[...]

        def ssum(a):
            return jnp.sum(a * a, axis=0, keepdims=True)

        def imax(a):
            return mater(jnp.max(jnp.abs(a), axis=0, keepdims=True))

        if HAS_EQ:
            forcing = mater(jnp.sqrt(ssum(ff) + ssum(hv) + ssum(bb)))
        else:
            forcing = mater(jnp.sqrt(ssum(ff) + ssum(bb)))
        combo_tol = opts.abs_tol + opts.rel_tol * (1.0 + forcing)

        # State X = (z, l, v, y); l is a dummy zero row when !HAS_EQ.
        def inner_residual(z, l, v, y, bz, bl, bv):
            rz = (ff + _mv(Hmat, z) + _mv(_T(Amat), v)
                  + sigma * (z - bz))
            rv = pfb(y + sigma * (v - bv), v, alpha)
            if HAS_EQ:
                rz = rz + _mv(_T(Gmat), l)
                rl = hv - _mv(Gmat, z) + sigma * (l - bl)
            else:
                rl = jnp.zeros((1, Bl), f32)
            return rz, rl, rv

        def pnr(z, l, v, y):
            rz = ff + _mv(Hmat, z) + _mv(_T(Amat), v)
            rv = (alpha * jnp.minimum(y, v)
                  + (1.0 - alpha) * jnp.maximum(0.0, y)
                  * jnp.maximum(0.0, v))
            if HAS_EQ:
                rz = rz + _mv(_T(Gmat), l)
                rl = hv - _mv(Gmat, z)
            else:
                rl = jnp.zeros((1, Bl), f32)
            return rz, rl, rv

        def rnorm(r3):
            rz, rl, rv = r3
            s = ssum(rz) + ssum(rv)
            if HAS_EQ:
                s = s + ssum(rl)
            return mater(jnp.sqrt(s))

        def blend(m, a, b):
            return b + m.astype(a.dtype) * (a - b)

        def sel(m, a, b):
            if a.shape[0] == m.shape[0]:
                return jnp.where(m, a, b)
            mf = jnp.zeros(a.shape, jnp.float32) + m.astype(jnp.float32)
            return jnp.where(mf > 0.5, a, b)

        X = tuple  # (z, l, v, y)

        def sel_x(m, a, b):
            return X(sel(m, ai, bi) for ai, bi in zip(a, b))

        def newton_step(z, l, v, y, bv, rz, rl, rv):
            """Quasi-definite block solve with the already-NEGATED
            residual (rz, rl, rv) (dense_cholesky_solver.cc:32-127)."""
            ys = y + sigma * (v - bv)
            gamma, mus = _pfb_weights(ys, v, sigma, alpha)
            GA = (gamma / mus)[:, None, :] * Amat          # (q, n, B)
            E = Hmat + sigma * In + _mm(_T(Amat), GA)
            Le = _chol(E)
            r1 = rz - _mv(_T(Amat), rv / mus)
            if HAS_EQ:
                r2 = -rl
                W = _tri_lower(Le, _T(Gmat))               # (n, nl, B)
                S = sigma * Il + _mm(_T(W), W)
                Ls = _chol(S)
                u = _tri_lower(Le, r1)
                rhs_l = _mv(_T(W), u) - r2
                dl = _tri_upperT(Ls, _tri_lower(Ls, rhs_l))
                rhs_z = r1 - _mv(_T(Gmat), dl)
                dz = _tri_upperT(Le, _tri_lower(Le, rhs_z))
                nan_ct = mater(
                    jnp.sum(jnp.isnan(dz).astype(f32), axis=0,
                            keepdims=True)
                    + jnp.sum(jnp.isnan(dl).astype(f32), axis=0,
                              keepdims=True))
            else:
                dl = jnp.zeros((1, Bl), f32)
                dz = _tri_upperT(Le, _tri_lower(Le, r1))
                nan_ct = mater(jnp.sum(jnp.isnan(dz).astype(f32), axis=0,
                                       keepdims=True))
            Adz = _mv(Amat, dz)
            dv = (rv + gamma * Adz) / mus
            dy = bb - Adz
            ok = nan_ct < 0.5
            return dz, dl, dv, dy, ok

        # ---------- initialization ----------
        z0 = z0_ref[...]
        l0 = l0_ref[...] if HAS_EQ else jnp.zeros((1, Bl), f32)
        v0 = v0_ref[...]
        y0 = bb - _mv(Amat, z0)
        xk0 = X((z0, l0, v0, y0))

        oz = jnp.ones_like(z0)
        ov = jnp.ones_like(v0)
        if HAS_EQ:
            dxn0 = mater(jnp.sqrt(ssum(oz) + ssum(jnp.ones_like(l0))
                                  + ssum(ov)))
        else:
            dxn0 = mater(jnp.sqrt(ssum(oz) + ssum(ov)))

        E0 = rnorm(pnr(*xk0))
        e0_out[...] = E0
        itol0 = jnp.clip(E0, opts.inner_tol_min, opts.inner_tol_max)

        i32 = jnp.int32
        zero_row = E0 * 0.0
        one_row = zero_row + 1.0
        zeros_i = zero_row.astype(i32)
        false_b = zero_row > 1.0

        # ---------- inner subproblem ----------
        def solve_subproblem(xk, itol, Ek_outer, newton0, active):
            merit0 = jnp.concatenate([zero_row] * NONMONOTONE_DEPTH,
                                     axis=0)

            def icond(c):
                return c[1] & (c[0] < opts.max_inner_iters)

            def ibody(c):
                (i, _, xi, Eo, ninfo, merit_buf, idone_i, lfail_i,
                 Ei_best, stall_ct) = c
                idone = idone_i > 0
                lfail = lfail_i > 0
                ri = inner_residual(xi[0], xi[1], xi[2], xi[3],
                                    xk[0], xk[1], xk[2])
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
                dz, dl, dv, dy, ok = newton_step(
                    xi[0], xi[1], xi[2], xi[3], xk[2],
                    -ri[0], -ri[1], -ri[2])
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
                    xp = X((xi[0] + t * dz, xi[1] + t * dl,
                            xi[2] + t * dv, xi[3] + t * (dy - bb)))
                    rp = inner_residual(xp[0], xp[1], xp[2], xp[3],
                                        xk[0], xk[1], xk[2])
                    np_ = rnorm(rp)
                    mp = 0.5 * np_ * np_
                    accept = mp <= m0 - 2.0 * t * opts.eta * current_merit
                    acc_f = accept.astype(f32)
                    t_next = t * (acc_f + (1.0 - acc_f) * opts.beta)
                    go = jnp.any(~accept & step)
                    return j + 1, t_next, go, accept.astype(i32)

                _, t_fin, _, _ = lax.while_loop(
                    lcond, lbody,
                    (i32(0), one_row, jnp.bool_(True), zeros_i))

                tm = step.astype(f32) * t_fin
                xi_new = X((xi[0] + tm * dz, xi[1] + tm * dl,
                            xi[2] + tm * dv, xi[3] + tm * (dy - bb)))

                # Successful steps only (reference impl.h:263-275;
                # matches core/algorithm.py).
                ninfo_new = ninfo + (step & ok).astype(i32)
                Eo_out = blend(active & ~idone, Eo_new, Eo)
                idone_new = idone | (brk & active) | ~active

                go = jnp.any(active & ~idone_new & ~lfail_new)
                return (i + 1, go, xi_new, Eo_out, ninfo_new, buf,
                        idone_new.astype(i32), lfail_new.astype(i32),
                        Ei_best, stall_ct)

            init = (i32(0), jnp.any(active), xk, zero_row, newton0,
                    merit0, zeros_i, zeros_i, zero_row + jnp.inf, zeros_i)
            (_, _, xi, Eo, ninfo, _, _, lfail_i, _, _) = lax.while_loop(
                icond, ibody, init)
            xi = X((xi[0], xi[1], jnp.maximum(xi[2], 0.0), xi[3]))
            return xi, Eo, ninfo, lfail_i > 0

        # ---------- outer proximal loop ----------
        def write_out(mask, xval):
            mz = jnp.zeros((n, Bl), f32) + mask.astype(f32)
            z_out[...] = jnp.where(mz > 0.5, xval[0], z_out[...])
            ml = jnp.zeros((nl_p, Bl), f32) + mask.astype(f32)
            l_out[...] = jnp.where(
                ml > 0.5,
                xval[1] if HAS_EQ else jnp.zeros((nl_p, Bl), f32),
                l_out[...])
            mv2 = jnp.zeros((q, Bl), f32) + mask.astype(f32)
            v_out[...] = jnp.where(mv2 > 0.5, xval[2], v_out[...])
            y_out[...] = jnp.where(mv2 > 0.5, xval[3], y_out[...])

        def ocond(c):
            return c[1] & (c[0] < opts.max_prox_iters)

        def obody(c):
            (k, _, xk, dxn, itol, Ek_prev, ninfo, pinfo, done_i, eflag,
             ores) = c
            done = done_i > 0
            Ek = rnorm(pnr(*xk))
            success = (Ek <= combo_tol) | (dxn <= opts.stall_tol)
            itol_new = jnp.clip(itol * opts.delta, opts.inner_tol_min, Ek)

            active = ~done & ~success
            xi, Eo, ninfo_new, lfail = solve_subproblem(
                xk, itol_new, Ek, ninfo, active)

            dx_new = X((xi[0] - xk[0], xi[1] - xk[1], xi[2] - xk[2],
                        xi[3] - xk[3] + bb))
            s_dx = ssum(dx_new[0]) + ssum(dx_new[2])
            if HAS_EQ:
                s_dx = s_dx + ssum(dx_new[1])
            dxn_new = mater(jnp.sqrt(s_dx))
            dxn_out = blend(active, dxn_new, dxn)

            exhausted = active & (ninfo_new >= opts.max_newton_iters)
            better_xi = Eo < Ek
            xbud = sel_x(better_xi, xi, xk)
            res_bud = rnorm(pnr(*xbud))

            if opts.check_feasibility:
                dz_, dl_, dv_ = dx_new[0], dx_new[1], dx_new[2]
                d1 = mater(jnp.max(_mv(Amat, dz_), axis=0, keepdims=True))
                d3 = imax(_mv(Hmat, dz_))
                d4 = mater(jnp.sum(ff * dz_, axis=0, keepdims=True))
                w = imax(dz_)
                tol_i = opts.infeas_tol
                d_inf = ((d1 <= w * tol_i) & (d3 <= tol_i * w)
                         & (d4 < 0) & (w > 1e-14))
                p1v = _mv(_T(Amat), dv_)
                p2 = jnp.sum(bb * dv_, axis=0, keepdims=True)
                uu_raw = jnp.max(jnp.abs(dv_), axis=0, keepdims=True)
                if HAS_EQ:
                    d2 = imax(_mv(Gmat, dz_))
                    d_inf = d_inf & (d2 <= tol_i * w)
                    p1v = p1v + _mv(_T(Gmat), dl_)
                    p2 = p2 + jnp.sum(hv * dl_, axis=0, keepdims=True)
                    uu_raw = jnp.maximum(
                        uu_raw, jnp.max(jnp.abs(dl_), axis=0,
                                        keepdims=True))
                p1 = imax(p1v)
                p2 = mater(p2)
                uu = mater(uu_raw)
                p_inf = (p1 <= tol_i * uu) & (p2 < 0)
            else:
                p_inf = false_b
                d_inf = false_b
            p_inf = p_inf & active
            d_inf = d_inf & active
            infeas = p_inf | d_inf
            ezero = zeros_i
            eflag_infeas = blend(
                p_inf & d_inf,
                ezero + int(ExitFlag.PRIMAL_DUAL_INFEASIBLE),
                blend(p_inf, ezero + int(ExitFlag.PRIMAL_INFEASIBLE),
                      ezero + int(ExitFlag.DUAL_INFEASIBLE)))

            lfail = lfail & active
            done_new = done | success | lfail | exhausted | infeas
            eflag_new = blend(infeas, eflag_infeas, eflag)
            eflag_new = blend(exhausted,
                              ezero + int(ExitFlag.MAXITERATIONS),
                              eflag_new)
            eflag_new = blend(lfail,
                              ezero + int(ExitFlag.LINEAR_SOLVER_FAILED),
                              eflag_new)
            eflag_new = blend(success & ~done,
                              ezero + int(ExitFlag.SUCCESS), eflag_new)

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
            xk_next = sel_x(cont, xi, xk)
            pinfo_new = pinfo + cont.astype(i32)
            Ek_keep = blend(done, Ek_prev, Ek)

            go = jnp.any(cont)
            return (k + 1, go, xk_next, dxn_out, itol_new, Ek_keep,
                    ninfo_new, pinfo_new, done_new.astype(i32),
                    eflag_new, ores_new)

        write_out(zero_row < 1.0, xk0)

        init = (i32(0), jnp.bool_(True), xk0, dxn0, itol0, E0,
                zeros_i, zeros_i, zeros_i,
                zeros_i + int(ExitFlag.MAXITERATIONS), E0)
        (_, _, xk_f, _, _, Ek_f, ninfo_f, pinfo_f, done_fi, eflag_f,
         ores_f) = lax.while_loop(ocond, obody, init)
        done_f = done_fi > 0

        write_out(~done_f, xk_f)
        out_res = blend(done_f, ores_f, Ek_f)
        eflag_fin = blend(done_f, eflag_f,
                          zeros_i + int(ExitFlag.MAXITERATIONS))

        eflag_out[...] = eflag_fin
        res_out[...] = out_res
        newton_out[...] = ninfo_f
        prox_out[...] = pinfo_f

    return kernel


@vmem_jit(static_argnames=("options", "interpret", "tile_b"),
          limit_kib=65536)
def fbstab_dense_solve_fused(data, z0, l0, v0, options: Options,
                             interpret: bool = False,
                             tile_b: int = TILE_B):
    """Batched dense solve through the fused kernel.

    data: DenseQPData with leading batch dim; z0/l0/v0: (B, n/nl/q).
    Returns (Variable, CoreOut) matching vmap(fbstab_solve)."""
    opts = options.validated()
    B, n = data.H.shape[0], data.H.shape[-1]
    q = data.A.shape[-2]
    nl = data.G.shape[-2]
    nl_p = max(nl, 1)
    dtype = z0.dtype

    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    pad = Bp - B
    T = Bp // tile_b

    def prep(a, shape):
        a = pad_batch(a, B, pad, shape).reshape((T, tile_b) + shape)
        return jnp.moveaxis(a, 1, -1)

    def prep_eq(a, shape):
        """Equality-block arrays; a zero dummy with nl_p rows when
        nl == 0 (the kernel statically skips every use)."""
        if nl > 0:
            return prep(a, shape)
        dummy_shape = (nl_p,) + shape[1:]
        return prep(jnp.zeros((B,) + dummy_shape, dtype), dummy_shape)

    ins = (
        prep(data.H, (n, n)), prep(data.f, (n,)),
        prep_eq(data.G, (nl, n)),
        prep_eq(data.h, (nl,)),
        prep(data.A, (q, n)), prep(data.b, (q,)),
        prep(z0, (n,)),
        prep_eq(l0, (nl,)),
        prep(v0, (q,)),
    )

    kernel = _make_dense_kernel(n, q, nl, opts)
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((n, tile_b), dtype),
        jax.ShapeDtypeStruct((nl_p, tile_b), dtype),
        jax.ShapeDtypeStruct((q, tile_b), dtype),
        jax.ShapeDtypeStruct((q, tile_b), dtype),
        jax.ShapeDtypeStruct((1, tile_b), jnp.int32),
        jax.ShapeDtypeStruct((1, tile_b), dtype),
        jax.ShapeDtypeStruct((1, tile_b), jnp.int32),
        jax.ShapeDtypeStruct((1, tile_b), jnp.int32),
        jax.ShapeDtypeStruct((1, tile_b), dtype),
    )

    call = pl.pallas_call(
        kernel,
        in_specs=[vspec() for _ in ins],
        out_specs=tuple(vspec() for _ in out_shape),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((1, tile_b), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )

    outs = lax.map(lambda a: call(*a), ins)

    def unprep(a, flat):
        a = jnp.moveaxis(a, -1, 1).reshape((Bp,) + a.shape[1:-1])
        a = a[:B]
        return a.reshape(B, flat) if flat else a.reshape(B)

    l = (unprep(outs[1], nl_p)[:, :nl] if nl > 0
         else jnp.zeros((B, 0), dtype))
    x = Variable(
        z=unprep(outs[0], n), l=l,
        v=unprep(outs[2], q), y=unprep(outs[3], q))
    res = unprep(outs[5], 0)
    eflag = unprep(outs[4], 0)
    core = CoreOut(
        eflag=eflag, residual=res,
        newton_iters=unprep(outs[6], 0), prox_iters=unprep(outs[7], 0),
        initial_residual=unprep(outs[8], 0), raw_residual=res,
        refine_steps=jnp.zeros_like(eflag))   # per-lane (B,), see mpc kernel
    return x, core
