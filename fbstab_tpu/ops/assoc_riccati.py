"""Parallel-in-horizon (associative-scan) Riccati Newton-step solver.

Solves the same sigma-regularized LQ saddle system as the sequential
Riccati recursion (models/mpc_qp.py::_riccati_solve, reference:
riccati_linear_solver.cc:77-344) in O(log N) depth instead of O(N):

    [ Hbar  G' ] [dz]   [r1]          Hbar = blockdiag([Qh Sh'; Sh Rh])
    [ -G  sigma*I ] [dl] = [rl]       (G dz)_0 = -x_0,
                                      (G dz)_i = A x_{i-1} + B u_{i-1} - x_i

which is the KKT system of the strictly convex problem

    min  sum_i 1/2 (x_i,u_i)' H_i (x_i,u_i) - r1_i'(x_i,u_i)
         + 1/(2 sigma) ||x_0 - rl_0||^2
         + sum_{i>=1} 1/(2 sigma) ||x_i - A x_{i-1} - B u_{i-1} - rl_i||^2

The TPU-first design (SURVEY.md section 2, parallelism item 4; the
optional parallel-in-N variant, cf. arXiv:1407.6898 and the
conditional-value-function composition of Sarkka & Garcia-Fernandez):

1. Per stage, eliminate u_i in closed form -> a quadratic "span element"
   F_i(x_i, x_{i+1}) = 1/2 a'P11 a + a'P12 b + 1/2 b'P22 b + p1'a + p2'b.
   The terminal stage yields an element with zero b-blocks.
2. A suffix `lax.associative_scan` combines adjacent spans by partially
   minimizing over the shared boundary state (associative; every inverse
   is of an SPD matrix K = P22_left + P11_right, guaranteed PD by the
   sigma-prox terms). The suffix combine starting at i is the value
   function V_i(x) = 1/2 x'J x + p'x.
3. The optimal states satisfy x_{i+1} = Phi_i x_i + c_i; a prefix
   associative scan of affine-map composition rolls out all states in
   O(log N) depth, then u, lambda are recovered stage-batched.

All heavy ops are (N, nx, nx)-batched matmuls/choleskys -> MXU-friendly;
this path targets long horizons (large N) at small batch, where the
sequential scan's O(N) dependency chain dominates latency. FLOP count is
O(N log N) vs the scan's O(N), so for large batches the sequential scan
(or the fused Pallas kernel) remains the throughput path.

Unlike the sequential recursion this computes the SAME algebraic solution
by a different operation order, so agreement with the scan path is to
roundoff (validated by the KKT-identity test at 1e-9 in f64), not
bitwise.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import lax

from fbstab_tpu.utils.compile import VMEM_LIMIT_KIB
from fbstab_tpu.ops.smallchol import (
    UNROLL_LIMIT,
    cho_solve_small,
    cholesky_small,
)


class _SpanElement(NamedTuple):
    """Quadratic form on the span's boundary states (a, b)."""

    P11: jnp.ndarray   # (..., nx, nx)
    P12: jnp.ndarray   # (..., nx, nx)
    P22: jnp.ndarray   # (..., nx, nx)
    p1: jnp.ndarray    # (..., nx)
    p2: jnp.ndarray    # (..., nx)


def _psolve(K, rhs):
    """SPD solve via Cholesky, batched over leading dims.

    rhs is (..., n, m) or (..., n). NaNs from a failed factorization
    propagate to the output (the jit analog of the reference's LLT info
    check, riccati_linear_solver.cc:131-136).

    Small matrices use the unrolled batched recurrences from
    ops/smallchol.py: XLA's blocked TPU cholesky expansion runs its
    internal matmuls at default (bf16-pass) precision regardless of the
    surrounding precision context, which silently destroys the
    ~1/sigma^2-conditioned combine tree in f32 (measured: copoly batches
    flip from 100% to 0% convergence exactly at the batch size where XLA
    switches to the blocked algorithm). The unrolled form is exact f32
    and faster at these sizes anyway.

    The solve is Jacobi-equilibrated: K's diagonal mixes O(1/sigma)
    prox-penalty entries with O(1) curvature entries, and near-active
    constraints push kappa(K) to ~1/sigma^2 — past eps at the f64
    default sigma0 = 1e-8. Symmetric diagonal scaling solves the SAME
    system (bitwise-different, algebraically identical) with pivots of
    uniform magnitude, which keeps the Cholesky from going negative on
    stiff iterates (measured: fixes spurious LINEAR_SOLVER_FAILED on
    mixed-activity instances that the sequential recursion handles)."""
    vec = rhs.ndim == K.ndim - 1
    s = lax.rsqrt(jnp.abs(_diag(K)) + jnp.finfo(K.dtype).tiny)
    Keq = K * s[..., :, None] * s[..., None, :]
    beq = rhs * s if vec else rhs * s[..., :, None]
    n = K.shape[-1]
    if n <= UNROLL_LIMIT:
        out = cho_solve_small(cholesky_small(Keq), beq)
        return out * s if vec else out * s[..., :, None]
    C = jnp.linalg.cholesky(Keq)
    if vec:
        beq = beq[..., None]
    y = jsl.solve_triangular(C, beq, lower=True)
    out = jsl.solve_triangular(jnp.swapaxes(C, -1, -2), y, lower=False)
    out = out[..., 0] if vec else out
    return out * s if vec else out * s[..., :, None]


def _diag(K):
    return jnp.diagonal(K, axis1=-2, axis2=-1)


def _combine(left: _SpanElement, right: _SpanElement) -> _SpanElement:
    """Eliminate the shared boundary state between two adjacent spans.

    K = P22_L + P11_R is SPD: P22 of every real-stage span is the SPD
    matrix inv(sigma*I + B Rhat^{-1} B') (by Woodbury) and P11 of every
    span is PD because the total objective is strictly convex."""
    K = left.P22 + right.P11
    T = jnp.swapaxes
    # Solve K once against the stacked right-hand sides.
    KiP12LT = _psolve(K, T(left.P12, -1, -2))       # K^{-1} P12_L'
    KiP12R = _psolve(K, right.P12)                  # K^{-1} P12_R
    w = left.p2 + right.p1
    Kiw = _psolve(K, w)
    P11 = left.P11 - left.P12 @ KiP12LT
    P12 = -left.P12 @ KiP12R
    P22 = right.P22 - T(right.P12, -1, -2) @ KiP12R
    p1 = left.p1 - jnp.einsum("...ij,...j->...i", left.P12, Kiw)
    p2 = right.p2 - jnp.einsum("...ji,...j->...i", right.P12, Kiw)
    # Re-symmetrize the diagonal blocks (roundoff control over deep
    # combine trees).
    P11 = 0.5 * (P11 + T(P11, -1, -2))
    P22 = 0.5 * (P22 + T(P22, -1, -2))
    return _SpanElement(P11, P12, P22, p1, p2)


def _stage_elements(Qh, Rh, Sh, A, B, r1x, r1u, rl, sigma):
    """Build the N stage elements + the terminal element.

    Stage i (0..N-1): F_i(a, b) = min_u of the stage cost plus the
    sigma-relaxed dynamics penalty linking a = x_i to b = x_{i+1};
    u-Hessian K_u = Rhat + B'B/sigma. Terminal: V_N(a) = min_u of the
    stage-N cost alone (zero b-blocks)."""
    N1, nx = Qh.shape[0], Qh.shape[-1]
    N = N1 - 1
    dtype = Qh.dtype
    sb = 1.0 / sigma
    T = jnp.swapaxes

    Qs, Rs, Ss = Qh[:-1], Rh[:-1], Sh[:-1]
    ct = rl[1:]                                     # (N, nx) = rl_{i+1}
    Ku = Rs + sb * T(B, -1, -2) @ B
    D = Ss + sb * T(B, -1, -2) @ A                  # (N, nu, nx)
    g = sb * jnp.einsum("nji,nj->ni", B, ct) - r1u[:-1]

    KiD = _psolve(Ku, D)                            # K_u^{-1} D
    KiBT = _psolve(Ku, T(B, -1, -2))                # K_u^{-1} B'
    Kig = _psolve(Ku, g)

    P11 = Qs + sb * T(A, -1, -2) @ A - T(D, -1, -2) @ KiD
    P12 = -sb * T(A, -1, -2) + sb * T(D, -1, -2) @ KiBT
    Ix = jnp.broadcast_to(jnp.eye(nx, dtype=dtype), (N, nx, nx))
    P22 = sb * Ix - (sb * sb) * (B @ KiBT)
    p1 = (-r1x[:-1] + sb * jnp.einsum("nji,nj->ni", A, ct)
          - jnp.einsum("nji,nj->ni", D, Kig))
    p2 = -sb * ct + sb * jnp.einsum("nij,nj->ni", B, Kig)

    # Terminal element: eliminate u_N from the stage-N cost.
    KN = Rh[N]
    KiS = _psolve(KN, Sh[N])
    Kir = _psolve(KN, r1u[N])
    P11N = Qh[N] - T(Sh[N], -1, -2) @ KiS
    p1N = -r1x[N] + jnp.einsum("ji,j->i", Sh[N], Kir)
    z_m = jnp.zeros((nx, nx), dtype)
    z_v = jnp.zeros((nx,), dtype)

    elems = _SpanElement(
        P11=jnp.concatenate([P11, P11N[None]], axis=0),
        P12=jnp.concatenate([P12, z_m[None]], axis=0),
        P22=jnp.concatenate([P22, z_m[None]], axis=0),
        p1=jnp.concatenate([p1, p1N[None]], axis=0),
        p2=jnp.concatenate([p2, z_v[None]], axis=0),
    )
    aux = (Ku, D, g, Kig, KiS, Kir)
    return elems, aux


def assoc_kkt_solve(Qh, Rh, Sh, A, B, r1x, r1u, rl, sigma):
    """Parallel solve of the sigma-regularized LQ saddle system.

    Inputs are stage-stacked: Qh/Rh/Sh (N+1, nx|nu, ...) barrier-augmented
    Hessian blocks, A/B (N, ...), r1x/r1u (N+1, ...) the (already
    negated/eliminated) stationarity residual, rl (N+1, nx) the equality
    residual. Returns (xs, us, lams) each (N+1, ...).

    The combine tree's matrices carry condition numbers up to ~1/sigma^2,
    so every matmul must run at full f32 precision on TPU (the default
    bf16 passes destroy the solve) — same measured fix as the KKT linear
    algebra in models/ (see docs/ARCHITECTURE.md).
    """
    with jax.default_matmul_precision("highest"):
        return _assoc_kkt_solve(Qh, Rh, Sh, A, B, r1x, r1u, rl, sigma)


def _assoc_kkt_solve(Qh, Rh, Sh, A, B, r1x, r1u, rl, sigma):
    N1, nx = Qh.shape[0], Qh.shape[-1]
    N = N1 - 1
    dtype = Qh.dtype
    sb = 1.0 / sigma
    T = jnp.swapaxes

    elems, aux = _stage_elements(Qh, Rh, Sh, A, B, r1x, r1u, rl, sigma)
    Ku, D, g, Kig, KiS, Kir = aux

    # Suffix combine: S_i = e_i o e_{i+1} o ... o e_N. With reverse=True
    # lax.associative_scan applies the operator as op(later, earlier), so
    # swap operands to keep left = smaller stage index.
    suff = lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True)
    J = suff.P11                                    # (N+1, nx, nx): V_i
    p = suff.p1                                     # (N+1, nx)

    # x_0 from the initial prox term 1/(2 sigma)||x - rl_0||^2 + V_0.
    I = jnp.eye(nx, dtype=dtype)
    x0 = _psolve(sb * I + J[0], sb * rl[0] - p[0])

    # Forward rollout x_{i+1} = Phi_i x_i + c_i with
    # (P22_i + J_{i+1}) b = -(P12_i' x_i + p2_i + p_{i+1}).
    Kf = elems.P22[:N] + J[1:]
    PhiRhs = -T(elems.P12[:N], -1, -2)
    Phi = _psolve(Kf, PhiRhs)
    c = _psolve(Kf, -(elems.p2[:N] + p[1:]))

    # Prefix affine composition M_i = Phi_i o ... o Phi_0 (apply earliest
    # first): op(earlier, later) = later o earlier.
    def aff_op(f, s):
        Pf, cf = f
        Ps, cs = s
        return (Ps @ Pf, jnp.einsum("...ij,...j->...i", Ps, cf) + cs)

    Ms, cs = lax.associative_scan(aff_op, (Phi, c))
    x_tail = jnp.einsum("nij,j->ni", Ms, x0) + cs   # x_1..x_N
    xs = jnp.concatenate([x0[None], x_tail], axis=0)

    # Stage-batched recovery of u_i (i < N):
    # u = -K_u^{-1} [ D x_i - B' x_{i+1}/sigma + g ].
    rhs_u = (jnp.einsum("nij,nj->ni", D, xs[:-1])
             - sb * jnp.einsum("nji,nj->ni", B, xs[1:]) + g)
    us_head = -_psolve(Ku, rhs_u)
    # u_N = K_N^{-1} (r1u_N - S_N x_N).
    uN = Kir - jnp.einsum("ij,j->i", KiS, xs[N])
    us = jnp.concatenate([us_head, uN[None]], axis=0)

    # lambda_0 = (rl_0 - x_0)/sigma;
    # lambda_{i+1} = (rl_{i+1} + A x_i + B u_i - x_{i+1})/sigma.
    lam0 = sb * (rl[0] - xs[0])
    lam_tail = sb * (rl[1:] + jnp.einsum("nij,nj->ni", A, xs[:-1])
                     + jnp.einsum("nij,nj->ni", B, us[:-1]) - xs[1:])
    lams = jnp.concatenate([lam0[None], lam_tail], axis=0)
    return xs, us, lams


# ------------------------------------------------------------------
# Batch-last implementation.
#
# For batched solves the (B, N, nx, nx) batch-first layout wastes the
# VPU: XLA tiles the trailing (nx, nx) pair onto (sublane, lane) and
# pads nx -> 128 lanes (~14% utilization at nx=18). Keeping the batch in
# the trailing (lane) axis — the same layout the Pallas kernels use via
# MpcQPDataT — fills the lanes with instances instead. Same math as
# above; stage-stacked (N, n, m, B) arrays throughout.
# ------------------------------------------------------------------

def _hp_einsum(spec, *args):
    return jnp.einsum(spec, *args, precision="highest")


def _mm_bl(X, Y):
    """(S, i, j, B) @ (S, j, k, B) -> (S, i, k, B)."""
    return _hp_einsum("sijb,sjkb->sikb", X, Y)


def _mv_bl(X, y):
    """(S, i, j, B) @ (S, j, B) -> (S, i, B)."""
    return _hp_einsum("sijb,sjb->sib", X, y)


def _T_bl(X):
    return jnp.swapaxes(X, 1, 2)


def _psolve_bl(K, rhs):
    """SPD solve, batch-last: K (S, n, n, B), rhs (S, n, B) or
    (S, n, m, B). Jacobi-equilibrated like _psolve; the unrolled batched
    recurrences are the riccati_pallas in-kernel helpers, vmapped over
    the stage axis.

    Measured null result (don't retry): wrapping this factor-and-solve
    in a Pallas kernel (stage-blocked (8, n, n, 128) windows, VMEM
    resident) gave exactly XLA-fallback performance on the copoly
    workload at B=512 — the batched assoc Newton step is ~26 ms and not
    dominated by these solves, so the kernel only added ~7 Mosaic
    compiles. XLA already fuses the unrolled recurrences acceptably at
    these shapes."""
    from fbstab_tpu.ops.riccati_pallas import (
        _chol as _chol_k,
        _tri_lower as _tri_lower_k,
        _tri_upperT as _tri_upperT_k,
    )
    # diag of (S, n, n, B) -> (S, B, n) -> (S, n, B)
    d = jnp.moveaxis(jnp.diagonal(K, axis1=1, axis2=2), -1, 1)
    s = lax.rsqrt(jnp.abs(d) + jnp.finfo(K.dtype).tiny)
    Keq = K * s[:, :, None, :] * s[:, None, :, :]
    smat = s if rhs.ndim == 3 else s[:, :, None, :]
    beq = rhs * smat
    L = jax.vmap(_chol_k)(Keq)
    t = jax.vmap(_tri_lower_k)(L, beq)
    return jax.vmap(_tri_upperT_k)(L, t) * smat


# Combine-kernel dispatch: "auto" fuses the whole span combination into
# one Pallas kernel per scan level on TPU f32 (profiled: the XLA
# lowering of a combine level is dominated by the pad/copy/small-fusion
# chains around the unrolled solves — ~90 ms per Newton step at copoly
# B=512, ~85% of solve time); "off" forces XLA; "interpret" runs the
# kernel in interpreter mode (CPU testing).
PALLAS_MODE = os.environ.get("FBSTAB_PALLAS", "auto")
_COMBINE_TILE_B = 128


def _combine_kernel_eligible(x):
    n = x.shape[1]
    if x.shape[0] == 0 or x.shape[-1] == 0:
        return False   # empty odd-level slices inside associative_scan
    if PALLAS_MODE == "off" or n > 32:
        return False
    if PALLAS_MODE == "interpret":
        return True
    return (jax.default_backend() == "tpu" and x.dtype == jnp.float32
            and x.shape[-1] >= _COMBINE_TILE_B)


@functools.lru_cache(maxsize=None)
def _make_combine_kernel(n: int):
    from fbstab_tpu.ops.riccati_pallas import (
        _chol as _chol_k,
        _mm as _mm_k,
        _mv as _mv_k,
        _T as _T_k,
        _tri_lower as _tri_lower_k,
        _tri_upperT as _tri_upperT_k,
    )

    def psolve(K, rhs):
        d = jnp.stack([K[i, i] for i in range(n)], axis=0)   # (n, TB)
        s = lax.rsqrt(jnp.abs(d) + jnp.finfo(K.dtype).tiny)
        Keq = K * s[:, None, :] * s[None, :, :]
        rscale = s[:, None, :] if rhs.ndim == 3 else s
        L = _chol_k(Keq)
        t = _tri_lower_k(L, rhs * rscale)
        return _tri_upperT_k(L, t) * rscale

    def kernel(l11, l12, l22, lp1, lp2, r11, r12, r22, rp1, rp2,
               o11, o12, o22, op1, op2):
        K = l22[...] + r11[...]
        L12, R12 = l12[...], r12[...]
        KiP12LT = psolve(K, _T_k(L12))
        KiP12R = psolve(K, R12)
        Kiw = psolve(K, lp2[...] + rp1[...])
        P11 = l11[...] - _mm_k(L12, KiP12LT)
        P22 = r22[...] - _mm_k(_T_k(R12), KiP12R)
        o11[...] = 0.5 * (P11 + _T_k(P11))
        o12[...] = -_mm_k(L12, KiP12R)
        o22[...] = 0.5 * (P22 + _T_k(P22))
        op1[...] = lp1[...] - _mv_k(L12, Kiw)
        op2[...] = rp2[...] - _mv_k(_T_k(R12), Kiw)

    return kernel


def _combine_bl_pallas(left: _SpanElement, right: _SpanElement
                       ) -> _SpanElement:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, n = left.P11.shape[0], left.P11.shape[1]
    Bb = left.P11.shape[-1]
    TB = min(_COMBINE_TILE_B, Bb)
    Bp = ((Bb + TB - 1) // TB) * TB
    if Bp != Bb:
        def padb(a):
            return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Bp - Bb)],
                           constant_values=1.0)
        left = _SpanElement(*(padb(a) for a in left))
        right = _SpanElement(*(padb(a) for a in right))
    T = Bp // TB

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (None,) + shape + (TB,),
            (lambda m_, t, _nd=nd: (m_,) + (0,) * _nd + (t,)),
            memory_space=pltpu.VMEM)

    mat, vec = spec((n, n)), spec((n,))
    ms = jax.ShapeDtypeStruct((M, n, n, Bp), left.P11.dtype)
    vs = jax.ShapeDtypeStruct((M, n, Bp), left.P11.dtype)
    outs = pl.pallas_call(
        _make_combine_kernel(n),
        grid=(M, T),
        in_specs=[mat, mat, mat, vec, vec, mat, mat, mat, vec, vec],
        out_specs=(mat, mat, mat, vec, vec),
        out_shape=(ms, ms, ms, vs, vs),
        interpret=(PALLAS_MODE == "interpret"),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_KIB * 1024),
    )(*left, *right)
    out = _SpanElement(*outs)
    if Bp != Bb:
        out = _SpanElement(*(a[..., :Bb] for a in out))
    return out


def _combine_bl(left: _SpanElement, right: _SpanElement) -> _SpanElement:
    """_combine with (S, n, n, B) leaves. On TPU f32 the whole
    combination (3 equilibrated SPD solves + 6 matmuls) is one fused
    Pallas kernel per scan level."""
    if _combine_kernel_eligible(left.P11):
        return _combine_bl_pallas(left, right)
    K = left.P22 + right.P11
    KiP12LT = _psolve_bl(K, _T_bl(left.P12))
    KiP12R = _psolve_bl(K, right.P12)
    w = left.p2 + right.p1
    Kiw = _psolve_bl(K, w)
    P11 = left.P11 - _mm_bl(left.P12, KiP12LT)
    P12 = -_mm_bl(left.P12, KiP12R)
    P22 = right.P22 - _mm_bl(_T_bl(right.P12), KiP12R)
    p1 = left.p1 - _mv_bl(left.P12, Kiw)
    p2 = right.p2 - _mv_bl(_T_bl(right.P12), Kiw)
    P11 = 0.5 * (P11 + _T_bl(P11))
    P22 = 0.5 * (P22 + _T_bl(P22))
    return _SpanElement(P11, P12, P22, p1, p2)


def assoc_kkt_solve_bl(Qh, Rh, Sh, A, B, r1x, r1u, rl, sigma):
    """Batch-last parallel solve: every array carries a trailing batch
    axis ((N+1, n, m, B) stage matrices, (N+1, n, B) vectors). Returns
    (xs, us, lams) each (N+1, n, B). Same algebra as assoc_kkt_solve."""
    with jax.default_matmul_precision("highest"):
        return _assoc_kkt_solve_bl(Qh, Rh, Sh, A, B, r1x, r1u, rl, sigma)


def _assoc_kkt_solve_bl(Qh, Rh, Sh, A, B, r1x, r1u, rl, sigma):
    N1, nx = Qh.shape[0], Qh.shape[1]
    Bb = Qh.shape[-1]
    N = N1 - 1
    dtype = Qh.dtype
    # sigma is a scalar or a per-instance (B,) vector (it is part of the
    # per-instance solver carry, so batched solves always pass (B,)).
    sig = jnp.asarray(sigma, dtype)
    if sig.ndim == 0:
        sb4 = sb3 = sb2 = 1.0 / sig
    else:
        sbv = 1.0 / sig
        sb4 = sbv[None, None, None, :]
        sb3 = sbv[None, None, :]
        sb2 = sbv[None, :]

    # ---- stage elements ----
    Qs, Rs, Ss = Qh[:-1], Rh[:-1], Sh[:-1]
    ct = rl[1:]
    BT = _T_bl(B)
    AT = _T_bl(A)
    Ku = Rs + sb4 * _mm_bl(BT, B)
    D = Ss + sb4 * _mm_bl(BT, A)
    g = sb3 * _mv_bl(BT, ct) - r1u[:-1]

    KiD = _psolve_bl(Ku, D)
    KiBT = _psolve_bl(Ku, BT)
    Kig = _psolve_bl(Ku, g)

    DT = _T_bl(D)
    P11 = Qs + sb4 * _mm_bl(AT, A) - _mm_bl(DT, KiD)
    P12 = -sb4 * AT + sb4 * _mm_bl(DT, KiBT)
    Ix = jnp.eye(nx, dtype=dtype)[None, :, :, None]
    P22 = sb4 * jnp.broadcast_to(Ix, (N, nx, nx, Bb)) - (
        sb4 * sb4) * _mm_bl(B, KiBT)
    p1 = -r1x[:-1] + sb3 * _mv_bl(AT, ct) - _mv_bl(DT, Kig)
    p2 = -sb3 * ct + sb3 * _mv_bl(B, Kig)

    # Terminal element (stage N, single-stage -> add a dummy stage axis
    # for the batched helpers).
    one = lambda a: a[None]
    KiS = _psolve_bl(one(Rh[N]), one(Sh[N]))[0]
    Kir = _psolve_bl(one(Rh[N]), one(r1u[N]))[0]
    P11N = Qh[N] - _hp_einsum("jib,jkb->ikb", Sh[N], KiS)
    p1N = -r1x[N] + _hp_einsum("jib,jb->ib", Sh[N], Kir)
    z_m = jnp.zeros((nx, nx, Bb), dtype)
    z_v = jnp.zeros((nx, Bb), dtype)

    elems = _SpanElement(
        P11=jnp.concatenate([P11, P11N[None]], axis=0),
        P12=jnp.concatenate([P12, z_m[None]], axis=0),
        P22=jnp.concatenate([P22, z_m[None]], axis=0),
        p1=jnp.concatenate([p1, p1N[None]], axis=0),
        p2=jnp.concatenate([p2, z_v[None]], axis=0),
    )

    # ---- suffix value functions ----
    suff = lax.associative_scan(
        lambda a, b: _combine_bl(b, a), elems, reverse=True)
    J, p = suff.P11, suff.p1

    # ---- x0 and forward rollout ----
    Ix0 = jnp.broadcast_to(jnp.eye(nx, dtype=dtype)[:, :, None],
                           (nx, nx, Bb))
    x0 = _psolve_bl(one(sb3 * Ix0 + J[0]),
                    one(sb2 * rl[0] - p[0]))[0]

    Kf = elems.P22[:N] + J[1:]
    Phi = _psolve_bl(Kf, -_T_bl(elems.P12[:N]))
    c = _psolve_bl(Kf, -(elems.p2[:N] + p[1:]))

    def aff_op(f, s):
        Pf, cf = f
        Ps, cs = s
        return (_mm_bl(Ps, Pf), _mv_bl(Ps, cf) + cs)

    Ms, cs = lax.associative_scan(aff_op, (Phi, c))
    x_tail = _hp_einsum("sijb,jb->sib", Ms, x0) + cs
    xs = jnp.concatenate([x0[None], x_tail], axis=0)

    # ---- recovery ----
    rhs_u = _mv_bl(D, xs[:-1]) - sb3 * _mv_bl(BT, xs[1:]) + g
    us_head = -_psolve_bl(Ku, rhs_u)
    uN = Kir - _hp_einsum("ijb,jb->ib", KiS, xs[N])
    us = jnp.concatenate([us_head, uN[None]], axis=0)

    lam0 = sb2 * (rl[0] - xs[0])
    lam_tail = sb3 * (rl[1:] + _mv_bl(A, xs[:-1])
                      + _mv_bl(B, us[:-1]) - xs[1:])
    lams = jnp.concatenate([lam0[None], lam_tail], axis=0)
    return xs, us, lams
