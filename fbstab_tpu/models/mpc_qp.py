"""MPC (linear-quadratic optimal control) QP specialization.

Covers the reference's MpcData (fbstab/components/mpc_data.{h,cc}),
RiccatiLinearSolver (fbstab/components/riccati_linear_solver.{h,cc}) and the
FBstabMpc facade (fbstab/fbstab_mpc.{h,cc}), re-designed for TPU.

The QP is (reference: mpc_data.h:18-41):

    min.  sum_{i=0}^N 1/2 [x(i)]' [Q(i) S(i)'] [x(i)] + [q(i)]' [x(i)]
                          [u(i)]  [S(i) R(i) ] [u(i)]   [r(i)]  [u(i)]
    s.t.  x(i+1) = A(i) x(i) + B(i) u(i) + c(i),  i = 0..N-1
          x(0) = x0
          E(i) x(i) + L(i) u(i) + d(i) <= 0,       i = 0..N

with nz = (N+1)(nx+nu), nl = (N+1)nx, nv = (N+1)nc.

TPU-first design decisions:
 - The reference's MatrixSequence containers (tools/matrix_sequence.h:18)
   become stacked arrays: Q is (N+1, nx, nx), A is (N, nx, nx), etc. The
   per-stage `for` loops in mpc_data.cc:17-238 become batched einsums over
   the stage axis — one fused matmul per operator instead of N+1 small gemvs,
   which is exactly what the MXU wants once a QP batch axis is vmapped in
   front.
 - The Riccati recursion (riccati_linear_solver.cc:77-344, after
   Rao-Wright-Rawlings 1998) is sequential in the horizon, so it is a
   `lax.scan` whose per-stage body is a handful of (nx, nx)/(nu, nu)
   Cholesky and triangular solves. Individually these matrices are
   TPU-hostile (tiny); the throughput comes from vmapping thousands of QP
   instances so each scan step runs batched factorizations.
 - Eigen LLT failure checks (riccati_linear_solver.cc:131-136) become NaN
   detection on the factor diagonals: XLA's cholesky emits NaNs for
   non-SPD inputs, and NaNs propagate through the scan to the flags.

The flat primal layout is stage-major, matching the reference's
column-reshaped views (mpc_data.cc:31-34): z = [x(0); u(0); ...; x(N); u(N)],
l = [l(0); ...; l(N)], v = [v(0); ...; v(N)].
"""

from __future__ import annotations

import functools
import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fbstab_tpu.core.algorithm import fbstab_solve
from fbstab_tpu.core.problem import ProblemOps
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.options import Options
from fbstab_tpu.ops.pfb import pfb_weights
from fbstab_tpu.ops.smallchol import (
    UNROLL_LIMIT,
    cholesky_small,
    solve_triangular_small,
)
from fbstab_tpu.solver_out import SolverOut


def _chol(A):
    """Batched Cholesky: unrolled VPU kernel for the small stage matrices
    (the common MPC case), XLA's blocked kernel beyond UNROLL_LIMIT."""
    if A.shape[-1] <= UNROLL_LIMIT:
        return cholesky_small(A)
    return jnp.linalg.cholesky(A)


def _tri(T, b, lower=True):
    if T.shape[-1] <= UNROLL_LIMIT:
        return solve_triangular_small(T, b, lower=lower)
    return jax.scipy.linalg.solve_triangular(T, b, lower=lower)


class MpcQPData(NamedTuple):
    """Stacked-array MPC problem data (reference: MpcData, mpc_data.h:43;
    FBstabMpc::ProblemData, fbstab_mpc.h:67-120).

    Stage counts: Q,R,S,q,r,E,L,d have N+1 entries; A,B,c have N.
    """

    Q: jnp.ndarray   # (N+1, nx, nx) state cost
    R: jnp.ndarray   # (N+1, nu, nu) input cost
    S: jnp.ndarray   # (N+1, nu, nx) cross cost
    q: jnp.ndarray   # (N+1, nx)
    r: jnp.ndarray   # (N+1, nu)
    A: jnp.ndarray   # (N, nx, nx) dynamics
    B: jnp.ndarray   # (N, nx, nu)
    c: jnp.ndarray   # (N, nx)
    E: jnp.ndarray   # (N+1, nc, nx) state constraint
    L: jnp.ndarray   # (N+1, nc, nu) input constraint
    d: jnp.ndarray   # (N+1, nc)
    x0: jnp.ndarray  # (nx,)


def mpc_dims(d: MpcQPData) -> tuple[int, int, int, int]:
    """(N, nx, nu, nc) from array shapes (static under trace)."""
    N = d.A.shape[-3]
    nx = d.A.shape[-1]
    nu = d.B.shape[-1]
    nc = d.E.shape[-2]
    return N, nx, nu, nc


class MpcQPDataT(NamedTuple):
    """MpcQPData plus batch-last ("T") copies of the stage matrices.

    The Pallas Newton-step kernel wants the batch in the lane (last)
    dimension; transposing inside the Newton loop would pay a strided
    HBM pass per iteration (measured ~10x slowdown at B=2048). The batched
    solver builds this extended pytree ONCE per solve, outside the loops —
    the transposed leaves ride along as loop invariants. The matrix-free
    operators only touch the batch-first fields, so MpcQPDataT is accepted
    anywhere MpcQPData is.
    """

    Q: jnp.ndarray
    R: jnp.ndarray
    S: jnp.ndarray
    q: jnp.ndarray
    r: jnp.ndarray
    A: jnp.ndarray
    B: jnp.ndarray
    c: jnp.ndarray
    E: jnp.ndarray
    L: jnp.ndarray
    d: jnp.ndarray
    x0: jnp.ndarray
    QT: jnp.ndarray  # (N+1, nx, nx, B)
    RT: jnp.ndarray  # (N+1, nu, nu, B)
    ST: jnp.ndarray  # (N+1, nu, nx, B)
    AT: jnp.ndarray  # (N, nx, nx, B)
    BT: jnp.ndarray  # (N, nx, nu, B)
    ET: jnp.ndarray  # (N+1, nc, nx, B)
    LT: jnp.ndarray  # (N+1, nc, nu, B)


def with_transposed(data: MpcQPData) -> MpcQPDataT:
    """Extends batch-first MPC data with batch-last stage-matrix copies."""
    t = lambda a: jnp.moveaxis(a, 0, -1)
    return MpcQPDataT(
        **data._asdict(),
        QT=t(data.Q), RT=t(data.R), ST=t(data.S),
        AT=t(data.A), BT=t(data.B), ET=t(data.E), LT=t(data.L))


# vmap in_axes for MpcQPDataT: base fields batch-first, T fields batch-last.
_DATA_T_AXES = MpcQPDataT(
    Q=0, R=0, S=0, q=0, r=0, A=0, B=0, c=0, E=0, L=0, d=0, x0=0,
    QT=-1, RT=-1, ST=-1, AT=-1, BT=-1, ET=-1, LT=-1)


def mpc_qp_data(Q, R, S, q, r, A, B, c, E, L, d, x0,
                dtype=jnp.float64) -> MpcQPData:
    """Builds an MpcQPData pytree with size validation mirroring
    MpcData::ValidateInputs (mpc_data.cc:291-363)."""
    arrs = {k: jnp.asarray(v, dtype) for k, v in dict(
        Q=Q, R=R, S=S, q=q, r=r, A=A, B=B, c=c, E=E, L=L, d=d, x0=x0).items()}
    data = MpcQPData(**arrs)
    N, nx, nu, nc = mpc_dims(data)
    if N <= 0:
        raise ValueError("Horizon length must be at least 1.")
    expect = dict(
        Q=(N + 1, nx, nx), R=(N + 1, nu, nu), S=(N + 1, nu, nx),
        q=(N + 1, nx), r=(N + 1, nu),
        A=(N, nx, nx), B=(N, nx, nu), c=(N, nx),
        E=(N + 1, nc, nx), L=(N + 1, nc, nu), d=(N + 1, nc), x0=(nx,))
    for name, want in expect.items():
        got = tuple(getattr(data, name).shape)
        if got != want:
            raise ValueError(
                f"mpc_qp_data: {name} has shape {got}, expected {want}.")
    return data


# ------------------------------------------------------------------
# Matrix-free data operators (reference: mpc_data.cc:17-289). Stage loops
# become einsums batched over the stage axis.
# ------------------------------------------------------------------

def _split_z(d: MpcQPData, z):
    """(nz,) -> stagewise ((N+1, nx), (N+1, nu))."""
    N, nx, nu, _ = mpc_dims(d)
    s = z.reshape(N + 1, nx + nu)
    return s[:, :nx], s[:, nx:]


def _gemvH(d: MpcQPData, x):
    """y(i) = [Q(i) S(i)'; S(i) R(i)] [vx(i); vu(i)]
    (reference: mpc_data.cc:17-65)."""
    vx, vu = _split_z(d, x)
    yx = (jnp.einsum("sij,sj->si", d.Q, vx, precision="highest")
          + jnp.einsum("sji,sj->si", d.S, vu, precision="highest"))
    yu = (jnp.einsum("sij,sj->si", d.S, vx, precision="highest")
          + jnp.einsum("sij,sj->si", d.R, vu, precision="highest"))
    return jnp.concatenate([yx, yu], axis=1).reshape(-1)


def _gemvA(d: MpcQPData, x):
    """y(i) = E(i) x(i) + L(i) u(i) (reference: mpc_data.cc:67-105)."""
    vx, vu = _split_z(d, x)
    y = (jnp.einsum("scj,sj->sc", d.E, vx, precision="highest")
         + jnp.einsum("scj,sj->sc", d.L, vu, precision="highest"))
    return y.reshape(-1)


def _gemvG(d: MpcQPData, x):
    """y(0) = -x(0); y(i) = A(i-1) x(i-1) + B(i-1) u(i-1) - x(i)
    (reference: mpc_data.cc:107-151)."""
    vx, vu = _split_z(d, x)
    head = -vx[:1]
    tail = (jnp.einsum("sij,sj->si", d.A, vx[:-1], precision="highest")
            + jnp.einsum("sij,sj->si", d.B, vu[:-1], precision="highest")
            - vx[1:])
    return jnp.concatenate([head, tail], axis=0).reshape(-1)


def _gemvGT(d: MpcQPData, l):
    """x(i) = -v(i) + A(i)' v(i+1) [i<N], x(N) = -v(N);
    u(i) = B(i)' v(i+1) [i<N], u(N) = 0
    (reference: mpc_data.cc:153-199)."""
    N, nx, nu, _ = mpc_dims(d)
    v = l.reshape(N + 1, nx)
    atv = jnp.einsum("sji,sj->si", d.A, v[1:], precision="highest")            # A' v(i+1)
    btv = jnp.einsum("sji,sj->si", d.B, v[1:], precision="highest")            # B' v(i+1)
    yx = -v + jnp.concatenate([atv, jnp.zeros_like(v[:1])], axis=0)
    yu = jnp.concatenate(
        [btv, jnp.zeros((1, nu), dtype=l.dtype)], axis=0)
    return jnp.concatenate([yx, yu], axis=1).reshape(-1)


def _gemvAT(d: MpcQPData, vflat):
    """x(i) = E(i)' v(i); u(i) = L(i)' v(i)
    (reference: mpc_data.cc:201-238)."""
    N, nx, nu, nc = mpc_dims(d)
    v = vflat.reshape(N + 1, nc)
    yx = jnp.einsum("sci,sc->si", d.E, v, precision="highest")
    yu = jnp.einsum("sci,sc->si", d.L, v, precision="highest")
    return jnp.concatenate([yx, yu], axis=1).reshape(-1)


def _f_vec(d: MpcQPData):
    """f = [(q(i); r(i))]_i (reference: axpyf, mpc_data.cc:240-259)."""
    return jnp.concatenate([d.q, d.r], axis=1).reshape(-1)


def _h_vec(d: MpcQPData):
    """h = -[x0; c(0); ...; c(N-1)] (reference: axpyh,
    mpc_data.cc:261-274)."""
    return -jnp.concatenate([d.x0[None, :], d.c], axis=0).reshape(-1)


def _b_vec(d: MpcQPData):
    """b = -[d(i)]_i (reference: axpyb, mpc_data.cc:276-289)."""
    return -d.d.reshape(-1)


def _forcing_norm(d: MpcQPData):
    """||(f, h, b)||_2 (reference: MpcData ctor, mpc_data.h:100-108)."""
    s = (jnp.sum(d.q * d.q) + jnp.sum(d.r * d.r) + jnp.sum(d.d * d.d)
         + jnp.sum(d.x0 * d.x0) + jnp.sum(d.c * d.c))
    return jnp.sqrt(s)


# ------------------------------------------------------------------
# Riccati-recursion Newton-step solver
# (reference: riccati_linear_solver.cc:77-344).
# ------------------------------------------------------------------

class RiccatiFactorization(NamedTuple):
    """Per-stage factors carried from factor() to newton_solve().

    Mirrors the mutable workspaces P_, SG_, M_, L_, SM_, AM_ of the
    reference (riccati_linear_solver.h:109-141), stacked over stages.
    """

    L: jnp.ndarray      # (N+1, nx, nx) chol of the Riccati matrix Pi
    M: jnp.ndarray      # (N+1, nx, nx) chol(Qhat + inv(L L'))
    SM: jnp.ndarray     # (N+1, nu, nx) Shat inv(M)'
    SG: jnp.ndarray     # (N+1, nu, nu) chol(Rhat - SM SM')
    AM: jnp.ndarray     # (N, nx, nx)   A inv(M)'
    P: jnp.ndarray      # (N, nx, nu)   (AM SM' - B) inv(SG)'
    gamma: jnp.ndarray  # (nv,)
    mus: jnp.ndarray    # (nv,)


def _riccati_factor(d: MpcQPData, x: Variable, xbar: Variable, sigma, alpha
                    ) -> RiccatiFactorization:
    """Barrier-augmented stage Hessians + forward Riccati matrix recursion
    (reference: RiccatiLinearSolver::Initialize,
    riccati_linear_solver.cc:77-210)."""
    return _riccati_factor_yv(d, x.y, x.v, xbar.v, sigma, alpha)


def _stage_hessians(d: MpcQPData, Gam, sigma):
    """Barrier-augmented stage Hessians, batched over stages
    (riccati_linear_solver.cc:101-123):
      Qhat = Q + sigma*I + E' diag(Gam) E
      Rhat = R + sigma*I + L' diag(Gam) L
      Shat = S + L' diag(Gam) E
    """
    N, nx, nu, nc = mpc_dims(d)
    dtype = d.Q.dtype
    Ix = jnp.eye(nx, dtype=dtype)
    Iu = jnp.eye(nu, dtype=dtype)
    Gs = Gam.reshape(N + 1, nc)
    GE = Gs[:, :, None] * d.E
    GL = Gs[:, :, None] * d.L
    Qh = d.Q + sigma * Ix + jnp.einsum(
        "sci,scj->sij", d.E, GE, precision="highest")
    Rh = d.R + sigma * Iu + jnp.einsum(
        "sci,scj->sij", d.L, GL, precision="highest")
    Sh = d.S + jnp.einsum(
        "sci,scj->sij", d.L, GE, precision="highest")
    return Qh, Rh, Sh


def _riccati_factor_yv(d: MpcQPData, y, v, vbar, sigma, alpha
                       ) -> RiccatiFactorization:
    N, nx, nu, nc = mpc_dims(d)
    dtype = d.Q.dtype
    Ix = jnp.eye(nx, dtype=dtype)
    solve_tri = _tri

    gamma, mus, Gam = pfb_weights(y, v, vbar, sigma, alpha)
    Qh, Rh, Sh = _stage_hessians(d, Gam, sigma)

    def cho_inverse(Lf):
        # inv(Lf Lf') via two triangular solves (the reference materializes
        # Linv_ the same way, riccati_linear_solver.cc:140-144).
        t = solve_tri(Lf, Ix, lower=True)
        return solve_tri(Lf.T, t, lower=False)

    def stage_factor(Lf, Qh_i, Rh_i, Sh_i):
        # M = chol(Qhat + inv(L L')); SM = Shat inv(M)';
        # SG = chol(Rhat - SM SM').  (cc:145-151, 160-168 / 212-228)
        M = _chol(Qh_i + cho_inverse(Lf))
        SM = solve_tri(M, Sh_i.T, lower=True).T
        SG = _chol(Rh_i - SM @ SM.T)
        return M, SM, SG

    def scan_body(Lf, inputs):
        Qh_i, Rh_i, Sh_i, A_i, B_i = inputs
        M, SM, SG = stage_factor(Lf, Qh_i, Rh_i, Sh_i)
        # AM = A inv(M)' (cc:153-159); P = (AM SM' - B) inv(SG)'
        # (cc:170-179); L(i+1) = chol(sigma*I + P P' + AM AM') (cc:181-188).
        AM = solve_tri(M, A_i.T, lower=True).T
        P = solve_tri(SG, (AM @ SM.T - B_i).T, lower=True).T
        L_next = _chol(sigma * Ix + P @ P.T + AM @ AM.T)
        return L_next, (Lf, M, SM, SG, AM, P)

    # Base case L(0) = chol(sigma*I) = sqrt(sigma)*I (cc:127).
    L0 = jnp.sqrt(jnp.asarray(sigma, dtype)) * Ix
    L_N, (Ls, Ms, SMs, SGs, AMs, Ps) = lax.scan(
        scan_body, L0, (Qh[:-1], Rh[:-1], Sh[:-1], d.A, d.B))

    # Terminal stage i = N (cc:191-209).
    M_N, SM_N, SG_N = stage_factor(L_N, Qh[N], Rh[N], Sh[N])

    return RiccatiFactorization(
        L=jnp.concatenate([Ls, L_N[None]], axis=0),
        M=jnp.concatenate([Ms, M_N[None]], axis=0),
        SM=jnp.concatenate([SMs, SM_N[None]], axis=0),
        SG=jnp.concatenate([SGs, SG_N[None]], axis=0),
        AM=AMs, P=Ps, gamma=gamma, mus=mus)


def _riccati_factor_ok(fact: RiccatiFactorization):
    """All stage Cholesky factorizations succeeded. XLA signals failure with
    NaNs, which propagate through the scan (the jit analog of the LLT info
    checks at riccati_linear_solver.cc:131-136)."""
    ok_m = jnp.all(jnp.isfinite(jnp.diagonal(fact.M, axis1=-2, axis2=-1)))
    ok_sg = jnp.all(jnp.isfinite(jnp.diagonal(fact.SG, axis1=-2, axis2=-1)))
    ok_l = jnp.all(jnp.isfinite(jnp.diagonal(fact.L, axis1=-2, axis2=-1)))
    return ok_m & ok_sg & ok_l


def _riccati_solve(d: MpcQPData, fact: RiccatiFactorization, rz, rl, rv
                   ) -> Variable:
    """Forward/backward vector recursions + dual recovery
    (reference: RiccatiLinearSolver::Solve,
    riccati_linear_solver.cc:212-344)."""
    N, nx, nu, nc = mpc_dims(d)
    solve_tri = _tri

    def cho_solve(Lf, b):
        return solve_tri(Lf.T, solve_tri(Lf, b, lower=True), lower=False)

    # Post-elimination residual r1 = rz - A'(rv./mus), r2 = -rl (cc:230-236).
    r1 = rz - _gemvAT(d, rv / fact.mus)
    r1s = r1.reshape(N + 1, nx + nu)
    rx, ru = r1s[:, :nx], r1s[:, nx:]
    r2 = (-rl).reshape(N + 1, nx)

    # Forward recursion for theta / h (cc:239-262):
    #   theta(0) = -rl(0); h(0) = inv(L L') theta(0) - rx(0)
    #   tx = inv(M) h;  tu = inv(SG)(SM tx + ru)
    #   theta(i+1) = P tu + AM tx + r2(i+1)
    #   h(i+1) = inv(L L') theta(i+1) - rx(i+1)
    th0 = r2[0]
    h0 = cho_solve(fact.L[0], th0) - rx[0]

    def fwd_body(h_i, inputs):
        M_i, SM_i, SG_i, P_i, AM_i, L_n, ru_i, r2_n, rx_n = inputs
        tx = solve_tri(M_i, h_i, lower=True)
        tu = solve_tri(SG_i, SM_i @ tx + ru_i, lower=True)
        th_n = P_i @ tu + AM_i @ tx + r2_n
        h_n = cho_solve(L_n, th_n) - rx_n
        return h_n, (th_n, h_n)

    _, (th_tail, h_tail) = lax.scan(
        fwd_body, h0,
        (fact.M[:-1], fact.SM[:-1], fact.SG[:-1], fact.P, fact.AM,
         fact.L[1:], ru[:-1], r2[1:], rx[1:]))
    th = jnp.concatenate([th0[None], th_tail], axis=0)
    h = jnp.concatenate([h0[None], h_tail], axis=0)

    # Backward recursion base case, stage N (cc:266-293):
    #   u(N) = inv(SG SG')(SM inv(M) h + ru)
    #   x(N) = -inv(M')(inv(M) h + SM' u(N))
    #   l(N) = -inv(L L')(x(N) + theta(N))
    txN = solve_tri(fact.M[N], h[N], lower=True)
    uN = cho_solve(fact.SG[N], fact.SM[N] @ txN + ru[N])
    xN = -solve_tri(fact.M[N].T, txN + fact.SM[N].T @ uN, lower=False)
    lN = -cho_solve(fact.L[N], xN + th[N])

    # Main backward loop i = N-1..0 carrying l(i+1) (cc:297-327):
    #   SG' u(i) = inv(SG)(SM inv(M) h + ru) + P' l(i+1)
    #   -M' x(i) = inv(M) h + SM' u(i) + AM' l(i+1)
    #   -L L' l(i) = theta(i) + x(i)
    def bwd_body(l_next, inputs):
        M_i, SM_i, SG_i, P_i, AM_i, L_i, h_i, th_i, ru_i = inputs
        tx = solve_tri(M_i, h_i, lower=True)
        ui = solve_tri(SG_i, SM_i @ tx + ru_i, lower=True)
        ui = solve_tri(SG_i.T, ui + P_i.T @ l_next, lower=False)
        xi = -solve_tri(
            M_i.T, tx + SM_i.T @ ui + AM_i.T @ l_next, lower=False)
        li = -cho_solve(L_i, th_i + xi)
        return li, (xi, ui, li)

    _, (xs, us, ls) = lax.scan(
        bwd_body, lN,
        (fact.M[:-1], fact.SM[:-1], fact.SG[:-1], fact.P, fact.AM,
         fact.L[:-1], h[:-1], th[:-1], ru[:-1]),
        reverse=True)

    dzs = jnp.concatenate([
        jnp.concatenate([xs, xN[None]], axis=0),
        jnp.concatenate([us, uN[None]], axis=0)], axis=1)
    dz = dzs.reshape(-1)
    dl = jnp.concatenate([ls, lN[None]], axis=0).reshape(-1)

    # Dual recovery (cc:329-342): dv = (rv + gamma .* A dz) ./ mus,
    # dy = b - A dz.
    Adz = _gemvA(d, dz)
    dv = (rv + fact.gamma * Adz) / fact.mus
    dy = _b_vec(d) - Adz
    return Variable(z=dz, l=dl, v=dv, y=dy)


# ------------------------------------------------------------------
# Fused Newton step: sequential scan implementation single-instance, the
# Pallas mega-kernel (ops/riccati_pallas.py) when batched on TPU. The
# custom_vmap boundary is what lets the vmapped solver swap the whole
# batched computation for one fused kernel call instead of per-instance
# grid steps.
# ------------------------------------------------------------------

# "auto": Pallas kernel for f32 TPU batches; "off": always the scan path;
# "interpret": kernel in interpreter mode (CPU testing).
PALLAS_MODE = os.environ.get("FBSTAB_PALLAS", "auto")

# Per-tile VMEM budgets (MB) for the fused kernels at TILE_B = 128. The
# scoped limit is raised to 112 MiB at import (ops/mpc_solve_pallas.py);
# the budgets leave headroom for Mosaic's own temporaries. Standard mode
# (stored stage factors) is preferred when it fits — the lowmem
# (recompute-factors) mode pays ~2x stage-factor FLOPs for the scratch.
_VMEM_STD_BUDGET_MB = 64.0
_VMEM_LOWMEM_BUDGET_MB = 90.0
# Beyond these the kernels are uncharted (compile time / register
# pressure), independent of VMEM.
_DIMS_CAP = dict(nx=32, nu=24, nc=48, N=160)
# The FULL-solve kernel keeps the entire iterate (zx, zu, l, v, y and its
# trial/step copies) live across its while-loops; beyond ~1000 state rows
# per lane tile the Mosaic register allocator spills the state to scoped
# VMEM slots and the program blows the VMEM budget outright (measured:
# copolymerization at 4941 rows wanted 232 MB of spill slots). Larger
# problems route to the standalone Newton-step kernel + wide-XLA outer
# loop instead, whose live set is per-stage matrices only.
_FULL_SOLVE_ROWS_CAP = 1024


def _state_rows(N, nx, nu, nc) -> int:
    return (N + 1) * (2 * nx + nu + 2 * nc)


def _fused_vmem_mb(N, nx, nu, nc, tile_b=128, lowmem=False) -> float:
    """Working-set model (MB) of the full-solve kernel per tile: inputs +
    outputs + scratch, mirroring fbstab_mpc_solve_fused's buffer list.
    The standalone Newton-step kernel's set is within a few MB of this
    (trades the warmstart inputs for residual inputs), so one model gates
    both."""
    # VMEM pads the lane dimension to 128 (CLAUDE.md perf rule 7), so a
    # smaller requested tile does not shrink the footprint.
    N1, b = N + 1, 4 * max(tile_b, 128) / 1e6
    mats = (N1 * nx * nx + N1 * nu * nu + N1 * nu * nx + N * nx * nx
            + N * nx * nu + N1 * nc * nx + N1 * nc * nu)
    vecs_in = N1 * nx + N1 * nu + N * nx + nx + N1 * nc  # q r c x0 d
    guesses = N1 * (2 * nx + nu + nc)
    outs = N1 * (nx + nu) + N1 * nx + 2 * N1 * nc + 5
    scr_vec = (3 * N1 * nx + N1 * nu + 4 * N1 * nc
               + N1 * nx + N1 * nu + 2 * N1 * nx + 1)
    scr_mat = N1 * nx * nx                                # Lc
    if not lowmem:
        scr_mat += N1 * nx * nx + N1 * nu * nx + N1 * nu * nu
    return b * (mats + vecs_in + guesses + outs + scr_vec + scr_mat)


def _dims_capped(N, nx, nu, nc) -> bool:
    return (nx <= _DIMS_CAP["nx"] and nu <= _DIMS_CAP["nu"]
            and nc <= _DIMS_CAP["nc"] and N <= _DIMS_CAP["N"])


def _kernel_mode(N, nx, nu, nc):
    """'std' | 'lowmem' | None: which fused-kernel variant fits VMEM."""
    if not _dims_capped(N, nx, nu, nc):
        return None
    if _fused_vmem_mb(N, nx, nu, nc) <= _VMEM_STD_BUDGET_MB:
        return "std"
    if _fused_vmem_mb(N, nx, nu, nc, lowmem=True) <= _VMEM_LOWMEM_BUDGET_MB:
        return "lowmem"
    return None


def _kernel_eligible(dtype, N, nx, nu, nc):
    """Newton-step-kernel gate: returns the kernel mode or None."""
    if PALLAS_MODE == "off":
        return None
    mode = _kernel_mode(N, nx, nu, nc)
    if PALLAS_MODE == "interpret":
        return mode
    if jax.default_backend() == "tpu" and dtype == jnp.float32:
        return mode
    return None


def _fused_step_impl(d, v, y, vbar, rz, rl, rv, sigma, alpha):
    fact = _riccati_factor_yv(d, y, v, vbar, sigma, alpha)
    ok = _riccati_factor_ok(fact)
    dx = _riccati_solve(d, fact, rz, rl, rv)
    return dx.z, dx.l, dx.v, dx.y, ok


@functools.lru_cache(maxsize=None)
def _make_fused_step(alpha: float):
    from jax.custom_batching import custom_vmap

    step = custom_vmap(
        lambda d, v, y, vbar, rz, rl, rv, sigma: _fused_step_impl(
            d, v, y, vbar, rz, rl, rv, sigma, alpha))

    @step.def_vmap
    def _rule(axis_size, in_batched, d, v, y, vbar, rz, rl, rv, sigma):
        data_b = all(jax.tree.leaves(in_batched[0]))
        vecs_b = all(in_batched[1:7])
        # sigma may arrive batched (B,) — the kernel takes a per-lane
        # (1, B) sigma row, so that is fine.
        # mpc_dims reads trailing axes, so batched leaves are fine as-is.
        N, nx, nu, nc = mpc_dims(d)
        mode = _kernel_eligible(v.dtype, N, nx, nu, nc)
        if (data_b and vecs_b and v.ndim == 2
                and mode is not None):
            from fbstab_tpu.ops.riccati_pallas import (
                riccati_newton_step_batched)
            dz, dl, dv, dy = riccati_newton_step_batched(
                d, v, y, vbar, rz, rl, rv, sigma, alpha,
                interpret=(PALLAS_MODE == "interpret"),
                lowmem=(mode == "lowmem"))
            ok = (jnp.all(jnp.isfinite(dz), axis=1)
                  & jnp.all(jnp.isfinite(dl), axis=1))
            return (dz, dl, dv, dy, ok), (True,) * 5
        # General fallback: vmap the sequential implementation with the
        # original batching pattern.
        axes = tuple(jax.tree.map(lambda b: 0 if b else None, f)
                     for f in in_batched)
        out = jax.vmap(
            functools.partial(_fused_step_impl, alpha=alpha),
            in_axes=axes)(d, v, y, vbar, rz, rl, rv, sigma)
        return out, (True,) * 5

    return step


def _mpc_newton_step(d, x: Variable, xbar: Variable, sigma, alpha, rz, rl,
                     rv):
    """ProblemOps.newton_step for the MPC class: returns (dx, ok)."""
    step = _make_fused_step(float(alpha))
    dz, dl, dv, dy, ok = step(d, x.v, x.y, xbar.v, rz, rl, rv,
                              jnp.asarray(sigma, x.v.dtype))
    return Variable(z=dz, l=dl, v=dv, y=dy), ok


MPC_OPS = ProblemOps(
    gemvH=_gemvH, gemvA=_gemvA, gemvG=_gemvG, gemvAT=_gemvAT, gemvGT=_gemvGT,
    f_vec=_f_vec, h_vec=_h_vec, b_vec=_b_vec, forcing_norm=_forcing_norm,
    factor=_riccati_factor, factor_ok=_riccati_factor_ok,
    newton_solve=_riccati_solve,
    newton_step=_mpc_newton_step,
)


# ------------------------------------------------------------------
# Parallel-in-horizon (associative-scan) Riccati variant
# (ops/assoc_riccati.py): O(log N) depth per Newton step for long
# horizons. Solves the same system as _riccati_solve in a different
# floating-point order, so iterate paths can differ at roundoff.
# ------------------------------------------------------------------

# "auto" switches the single-instance solve to the parallel Riccati at
# these horizons. Measured single-instance crossovers (double
# integrator): TPU v5e f32 — assoc wins already at N=60 (1.7x) and by
# 30.9x at N=480 (the scan path per-stage HLO dispatch dominates);
# CPU f64 — crossover near N=240.
ASSOC_MIN_HORIZON_TPU = 48
ASSOC_MIN_HORIZON = 192


def _assoc_newton_solve(d: MpcQPData, fact: RiccatiFactorization,
                        rz, rl, rv) -> Variable:
    """ProblemOps.newton_solve via the parallel Riccati. `fact` supplies
    only the PFB weights; the stage Hessians are rebuilt (cheap, stage
    batched) and the factorization work happens inside the parallel
    solve itself."""
    from fbstab_tpu.ops.assoc_riccati import assoc_kkt_solve

    N, nx, nu, nc = mpc_dims(d)
    # sigma is not threaded through newton_solve; recover it from the
    # factorization's base case L(0) = sqrt(sigma)*I.
    sigma = fact.L[0, 0, 0] ** 2
    Qh, Rh, Sh = _stage_hessians(d, fact.gamma / fact.mus, sigma)

    r1 = rz - _gemvAT(d, rv / fact.mus)
    r1s = r1.reshape(N + 1, nx + nu)
    rls = rl.reshape(N + 1, nx)
    xs, us, lams = assoc_kkt_solve(
        Qh, Rh, Sh, d.A, d.B, r1s[:, :nx], r1s[:, nx:], rls, sigma)

    dz = jnp.concatenate([xs, us], axis=1).reshape(-1)
    dl = lams.reshape(-1)
    Adz = _gemvA(d, dz)
    dv = (rv + fact.gamma * Adz) / fact.mus
    dy = _b_vec(d) - Adz
    return Variable(z=dz, l=dl, v=dv, y=dy)


def _assoc_step_impl(d, v, y, vbar, rz, rl, rv, sigma, alpha):
    """Single-instance parallel-Riccati Newton step (batch-first math)."""
    from fbstab_tpu.ops.assoc_riccati import assoc_kkt_solve

    N, nx, nu, nc = mpc_dims(d)
    gamma, mus, Gam = pfb_weights(y, v, vbar, sigma, alpha)
    Qh, Rh, Sh = _stage_hessians(d, Gam, sigma)

    r1 = rz - _gemvAT(d, rv / mus)
    r1s = r1.reshape(N + 1, nx + nu)
    rls = rl.reshape(N + 1, nx)
    xs, us, lams = assoc_kkt_solve(
        Qh, Rh, Sh, d.A, d.B, r1s[:, :nx], r1s[:, nx:], rls, sigma)

    dz = jnp.concatenate([xs, us], axis=1).reshape(-1)
    dl = lams.reshape(-1)
    Adz = _gemvA(d, dz)
    dv = (rv + gamma * Adz) / mus
    dy = _b_vec(d) - Adz
    ok = jnp.all(jnp.isfinite(dz)) & jnp.all(jnp.isfinite(dl))
    return dz, dl, dv, dy, ok


def _assoc_step_batched(d, v, y, vbar, rz, rl, rv, sigma, alpha):
    """Batched parallel-Riccati Newton step, batch-LAST layout.

    Inside the custom_vmap rule the MpcQPDataT T-leaves arrive
    canonicalized batch-first; moveaxis(0, -1) undoes that exactly (a
    no-op for XLA — same trick as riccati_newton_step_batched), so the
    whole combine tree runs on (N, n, m, B) arrays with instances
    filling the lane dimension instead of a padded-out nx."""
    from fbstab_tpu.ops.assoc_riccati import assoc_kkt_solve_bl

    N, nx, nu, nc = mpc_dims(d)
    N1, ns = N + 1, nx + nu
    Bq = v.shape[0]
    dtype = v.dtype
    hp = functools.partial(jnp.einsum, precision="highest")
    tm = lambda a: jnp.moveaxis(a, 0, -1)
    tv = lambda a, k: jnp.moveaxis(a.reshape(Bq, N1, k), 0, -1)

    # sigma is scalar or per-instance (B,) — it is part of the solver
    # carry, so batched solves always pass (B,).
    sig = jnp.asarray(sigma, dtype)
    sig_col = sig[:, None] if sig.ndim else sig      # vs (B, nv) arrays
    sig4 = sig[None, None, None, :] if sig.ndim else sig

    ET, LT = tm(d.ET), tm(d.LT)
    gamma, mus, Gam = pfb_weights(y, v, vbar, sig_col, alpha)
    GamT = tv(Gam, nc)
    GE = GamT[:, :, None, :] * ET
    GL = GamT[:, :, None, :] * LT
    Ix = jnp.eye(nx, dtype=dtype)[None, :, :, None]
    Iu = jnp.eye(nu, dtype=dtype)[None, :, :, None]
    QhT = tm(d.QT) + sig4 * Ix + hp("scib,scjb->sijb", ET, GE)
    RhT = tm(d.RT) + sig4 * Iu + hp("scib,scjb->sijb", LT, GL)
    ShT = tm(d.ST) + hp("scib,scjb->sijb", LT, GE)

    w = tv(rv / mus, nc)
    rzT = jnp.moveaxis(rz.reshape(Bq, N1, ns), 0, -1)   # (N1, ns, B)
    r1xT = rzT[:, :nx] - hp("scib,scb->sib", ET, w)
    r1uT = rzT[:, nx:] - hp("scib,scb->sib", LT, w)
    rlT = tv(rl, nx)

    xs, us, lams = assoc_kkt_solve_bl(
        QhT, RhT, ShT, tm(d.AT), tm(d.BT), r1xT, r1uT, rlT, sig)

    dz = jnp.moveaxis(jnp.concatenate([xs, us], axis=1),
                      -1, 0).reshape(Bq, N1 * ns)
    dl = jnp.moveaxis(lams, -1, 0).reshape(Bq, N1 * nx)
    AdzT = hp("scib,sib->scb", ET, xs) + hp("scib,sib->scb", LT, us)
    Adz = jnp.moveaxis(AdzT, -1, 0).reshape(Bq, N1 * nc)
    dv = (rv + gamma * Adz) / mus
    dy = -d.d.reshape(Bq, N1 * nc) - Adz
    ok = (jnp.all(jnp.isfinite(dz), axis=1)
          & jnp.all(jnp.isfinite(dl), axis=1))
    return dz, dl, dv, dy, ok


@functools.lru_cache(maxsize=None)
def _make_assoc_step(alpha: float):
    from jax.custom_batching import custom_vmap

    step = custom_vmap(
        lambda d, v, y, vbar, rz, rl, rv, sigma: _assoc_step_impl(
            d, v, y, vbar, rz, rl, rv, sigma, alpha))

    @step.def_vmap
    def _rule(axis_size, in_batched, d, v, y, vbar, rz, rl, rv, sigma):
        data_b = all(jax.tree.leaves(in_batched[0]))
        vecs_b = all(in_batched[1:7])
        # sigma is part of the per-instance solver carry, so it arrives
        # batched (B,) in real solves — the batch-last implementation
        # broadcasts it per lane.
        if (data_b and vecs_b and v.ndim == 2
                and isinstance(d, MpcQPDataT)):
            out = _assoc_step_batched(
                d, v, y, vbar, rz, rl, rv, sigma, alpha)
            return out, (True,) * 5
        axes = tuple(jax.tree.map(lambda b: 0 if b else None, f)
                     for f in in_batched)
        out = jax.vmap(
            functools.partial(_assoc_step_impl, alpha=alpha),
            in_axes=axes)(d, v, y, vbar, rz, rl, rv, sigma)
        return out, (True,) * 5

    return step


def _assoc_newton_step(d, x: Variable, xbar: Variable, sigma, alpha,
                       rz, rl, rv):
    """ProblemOps.newton_step via the parallel Riccati: weights + stage
    Hessians + the associative-scan solve, no sequential recursion.
    Batched solves dispatch to the batch-last implementation via
    custom_vmap."""
    step = _make_assoc_step(float(alpha))
    dz, dl, dv, dy, ok = step(d, x.v, x.y, xbar.v, rz, rl, rv,
                              jnp.asarray(sigma, x.v.dtype))
    return Variable(z=dz, l=dl, v=dv, y=dy), ok


MPC_OPS_ASSOC = MPC_OPS._replace(
    newton_step=_assoc_newton_step, newton_solve=_assoc_newton_solve)


def _pick_mpc_ops(data: MpcQPData, riccati: str) -> ProblemOps:
    if riccati == "scan":
        return MPC_OPS
    if riccati == "assoc":
        return MPC_OPS_ASSOC
    if riccati != "auto":
        raise ValueError(
            f"riccati must be 'auto', 'scan' or 'assoc', got {riccati!r}")
    N = mpc_dims(data)[0]
    thresh = (ASSOC_MIN_HORIZON_TPU if jax.default_backend() == "tpu"
              else ASSOC_MIN_HORIZON)
    return MPC_OPS_ASSOC if N >= thresh else MPC_OPS


# ------------------------------------------------------------------
# Functional entry points.
# ------------------------------------------------------------------

def solve_mpc_qp(data: MpcQPData, z0, l0, v0, options: Options = Options(),
                 riccati: str = "auto"):
    """Jittable single-instance MPC solve. Returns (Variable, CoreOut).

    riccati: 'auto' (parallel associative-scan Riccati for horizons
    N >= ASSOC_MIN_HORIZON, sequential scan otherwise), 'scan', or
    'assoc'. Both solve the same Newton system; iterate paths agree to
    roundoff only."""
    return fbstab_solve(_pick_mpc_ops(data, riccati), data, z0, l0, v0,
                        options)


def _fused_solve_eligible(data: MpcQPData, dtype):
    """Gate for the fully fused solver kernel (ops/mpc_solve_pallas.py):
    f32 TPU batches whose per-tile VMEM working set fits the budget AND
    whose carried state fits the register file (_FULL_SOLVE_ROWS_CAP).
    Returns the kernel mode ('std' | 'lowmem') or None; ineligible
    problems fall to the Newton-step-kernel + XLA outer loop path."""
    if PALLAS_MODE == "off":
        return None
    N, nx, nu, nc = mpc_dims(data)
    if _state_rows(N, nx, nu, nc) > _FULL_SOLVE_ROWS_CAP:
        return None
    mode = _kernel_mode(N, nx, nu, nc)
    if PALLAS_MODE == "interpret":
        return mode
    if jax.default_backend() == "tpu" and dtype == jnp.float32:
        return mode
    return None


# The subproblem kernel's compiled footprint is the working-set model
# PLUS Mosaic register-spill slots. The kernel computes its residual /
# norm / linesearch math per-stage (staged mode, see _build_ctx in
# ops/mpc_solve_pallas.py) precisely to bound those slots: the
# full-horizon formulation measured 115 MB of spill at nx=18/N=80 —
# past the 128 MB physical VMEM of v5e (and shrinking the lane tile
# does not help: VMEM pads lanes to 128). The factor covers the staged
# kernel's remaining spill (the per-stage Riccati matrices); the budget
# equals the raised scoped-VMEM limit the kernels declare
# (utils/compile.py VMEM_LIMIT_KIB = 112 MiB), so anything the gate
# admits is within what the compile is allowed to use.
_SUBFUSED_SPILL_FACTOR = 1.4
_SUBFUSED_BUDGET_MB = 112.0


def _subfused_eligible(data: MpcQPData, dtype):
    """Gate for the fused-subproblem tier (ops/mpc_solve_pallas.py::
    mpc_subproblem_fused driven by models/mpc_subfused.py): kernel-mode
    VMEM fit but carried state beyond the full-solve kernel's cap.
    Returns (mode, tile_b) with mode 'std' | 'lowmem', or None."""
    if PALLAS_MODE == "off":
        return None
    N, nx, nu, nc = mpc_dims(data)
    if _state_rows(N, nx, nu, nc) <= _FULL_SOLVE_ROWS_CAP:
        return None                 # the full-solve kernel takes it
    mode = _kernel_mode(N, nx, nu, nc)
    if mode is None:
        return None
    # One candidate only: lanes pad to 128, so smaller tiles cost the
    # same VMEM and would only serialize more launches.
    tile_b = 128
    mb = _fused_vmem_mb(N, nx, nu, nc, tile_b=tile_b,
                        lowmem=(mode == "lowmem"))
    if mb * _SUBFUSED_SPILL_FACTOR > _SUBFUSED_BUDGET_MB:
        return None
    if PALLAS_MODE == "interpret":
        return mode, tile_b
    if jax.default_backend() == "tpu" and dtype == jnp.float32:
        return mode, tile_b
    return None


# Beyond-envelope BATCHED dispatch: scan, at every stage dimension
# (round-5 revision of the round-4 stage-dim gate). The round-4 raw-tier
# crossover (B=256: nx=2/N=480 scan 3.6x, nx=18/N=320 assoc 1.9x) put
# copoly-class stage dims on the batched assoc Riccati; round-5
# re-measurement on the CONTRACT path and at large batch reversed it
# (scratch/tpu_beyond_envelope.py / tpu_beyond_diag.py / _copoly320_fix):
#   nx=18 N=320 B=256: the contract stack (refine corrections through
#     the same dispatch) on SCAN runs 91.2 QPs/s at the full f64-verified
#     1e-6 contract — above the 80.8 QPs/s the assoc tier measured RAW
#     in round 4 — and the assoc compilation with the refine graph
#     KERNEL-FAULTED the TPU worker (twice: also at nx=2/N=480/B=2048);
#   nx=2 N=480 B=2048: scan 211 QPs/s — no VMEM-spill cliff at large
#     batch for beyond-envelope shapes (the rule-2 cliff is the
#     within-envelope headline class, where the fused kernel is the fix).
# The batched assoc tier remains available as riccati='assoc' (and is
# parity-tested on CPU — the span algebra is correct; f64 CPU matches
# scan to 1e-9 at N=320), but auto no longer routes product batches to
# a path that can fault the worker under the contract stack.
# Single-instance dispatch is different: there the lanes are EMPTY and
# the scan is pure dispatch latency — assoc wins from N >= 48
# (ASSOC_MIN_HORIZON_TPU above).


def beyond_envelope_noeq(data: MpcQPData, dtype, backend=None) -> bool:
    """Round-5 measured policy: beyond the fused-kernel envelope the
    TPU f32 product path runs UNEQUILIBRATED. Measured at B=256
    (scratch/tpu_beyond_diag.py / tpu_walk_validate.py, f64-verified):

      copoly nx=18 N=320: equilibrated contract compilation STAGNATES
        (0% success, ni p50 ~93, both scan and assoc; the same options
        converge on CPU — a TPU-compilation-sensitive knife edge) while
        the unequilibrated contract path meets the full 1e-6 contract
        at 91.2 QPs/s (res64 max 5.4e-8, 2 refine steps);
      di nx=2 N=480: the equilibrated refinement stalls at ~7e-5 even
        with the round-5 walk window; unequilibrated reaches 100%
        <= 1e-6 (max 9.1e-7) at 175 QPs/s.

    Equilibration remains essential INSIDE the envelope (the ServoMotor
    / Spacecraft conditioning story, models/scaling.py); beyond it the
    badly-scaled plants cannot meet the f32 contract either way, and
    the well-scaled ones only meet it without the scaling transform."""
    N, nx, nu, nc = mpc_dims(data)
    backend = backend or jax.default_backend()
    return (_kernel_mode(N, nx, nu, nc) is None
            and dtype == jnp.float32 and backend == "tpu")


def gate_mpc_options(data: MpcQPData, dtype, options):
    """Applies the beyond-envelope no-equilibration policy to an Options
    instance (the single implementation every batched MPC entry point
    shares: the dispatcher, the adaptive wrappers, the receding-horizon
    driver). Passing an explicit precomputed `scaling=` to
    solve_mpc_qp_batch or the adaptive wrappers bypasses the gate —
    that is the deliberate escape hatch for callers who really want the
    (measured-broken there) equilibrated compilation, e.g. to reproduce
    the round-5 evidence. The receding-horizon driver has no scaling
    parameter and always applies the gate."""
    import dataclasses as _dc

    o = options.validated()
    if o.equilibrate and beyond_envelope_noeq(data, dtype):
        o = _dc.replace(o, equilibrate=False)
    return o


def _auto_batch_riccati(data: MpcQPData, dtype, backend=None) -> str:
    """Shape-based batch dispatch policy (riccati='auto'):

     - within the fused-kernel envelope (`_kernel_mode` not None), the
       scan-ops path is right: eligible batches land on a fused tier and
       the rest engage the Newton-step kernel via custom_vmap;
     - beyond it (N > 160, nx > 32, or past the VMEM model), on TPU f32
       batches stay on the vmapped sequential scan at every stage
       dimension (see the measured round-5 revision above). On CPU the
       assoc path wins only at long horizons (crossover near
       N=ASSOC_MIN_HORIZON).
    """
    N, nx, nu, nc = mpc_dims(data)
    if _kernel_mode(N, nx, nu, nc) is not None:
        return "scan"
    backend = backend or jax.default_backend()
    if backend == "tpu" and dtype == jnp.float32:
        return "scan"
    return "assoc" if N >= ASSOC_MIN_HORIZON else "scan"


def _solve_mpc_qp_batch_raw(data: MpcQPData, z0, l0, v0,
                            options: Options, riccati: str):
    if riccati == "auto":
        riccati = _auto_batch_riccati(data, z0.dtype)
    if riccati == "assoc":
        if not isinstance(data, MpcQPDataT):
            data = with_transposed(data)
        return jax.vmap(
            lambda d, z, l, v: fbstab_solve(
                MPC_OPS_ASSOC, d, z, l, v, options),
            in_axes=(_DATA_T_AXES, 0, 0, 0),
        )(data, z0, l0, v0)
    if riccati != "scan":
        raise ValueError(
            f"riccati must be 'auto', 'scan' or 'assoc', got {riccati!r}")
    mode = _fused_solve_eligible(data, z0.dtype)
    if mode is not None:
        from fbstab_tpu.ops.mpc_solve_pallas import fbstab_mpc_solve_fused
        base = data if not isinstance(data, MpcQPDataT) else MpcQPData(
            **{k: getattr(data, k) for k in MpcQPData._fields})
        return fbstab_mpc_solve_fused(
            base, z0, l0, v0, options,
            interpret=(PALLAS_MODE == "interpret"),
            lowmem=(mode == "lowmem"))
    sub = _subfused_eligible(data, z0.dtype)
    if sub is not None:
        mode, tile_b = sub
        from fbstab_tpu.models.mpc_subfused import fbstab_mpc_solve_subfused
        return fbstab_mpc_solve_subfused(
            data, z0, l0, v0, options,
            interpret=(PALLAS_MODE == "interpret"),
            tile_b=tile_b, lowmem=(mode == "lowmem"))
    if not isinstance(data, MpcQPDataT):
        data = with_transposed(data)
    return jax.vmap(
        lambda d, z, l, v: fbstab_solve(MPC_OPS, d, z, l, v, options),
        in_axes=(_DATA_T_AXES, 0, 0, 0),
    )(data, z0, l0, v0)


def solve_mpc_qp_batch(data: MpcQPData, z0, l0, v0,
                       options: Options = Options(),
                       riccati: str = "auto", scaling=None):
    """Batched MPC solve: leading batch axis on every data array and guess.
    The TPU 'DP' analog of running one solver per control loop
    (SURVEY.md section 2).

    Dispatch, fastest first:
     1. the fully fused Pallas solver kernel (TPU + f32, VMEM-fitting
        stage dims) — the whole algorithm in one kernel per
        128-instance tile;
     2. the fused-subproblem tier (large stage dims such as the
        CopolymerizationReactor class, whose carried state spills the
        full-solve kernel): one kernel launch per proximal subproblem,
        XLA outer loop;
     3. vmap of the XLA-orchestrated solver, whose Newton step is the
        fused Riccati kernel via custom_vmap (TPU) or the lax.scan path
        (CPU / f64);
     4. beyond the kernel envelope (N > 160 / nx > 32 / past the VMEM
        model): the vmapped sequential scan at EVERY stage dimension,
        unequilibrated (riccati='auto' policy, `_auto_batch_riccati` +
        `gate_mpc_options` — round-5 revision: the contract stack on
        scan outruns the old raw-tier assoc numbers and the batched
        assoc compilation can kernel-fault the TPU worker with the
        refine graph attached; `riccati="assoc"` remains available
        explicitly).

    riccati: 'auto' (default, the policy above), 'scan' (force the
    sequential-recursion ops; eligible batches still use the fused
    kernels), or 'assoc' (force the parallel associative-scan Riccati
    Newton step, vmapped batch-last).

    f32 product defaults (`Options.single_precision()`):
     - `options.equilibrate` Ruiz-scales the problem before the solve
       (models/scaling.py) — the solver runs in the equilibrated
       geometry and the reported residuals are re-evaluated in ORIGINAL
       units at the returned point;
     - `options.refine_steps > 0` polishes converged instances with
       mixed-precision iterative refinement (equilibration-
       preconditioned corrections) until `options.refine_target`; the
       returned solution is then a `VariableDF` double-float pair
       meeting the reference's 1e-6 accuracy contract (`.hi()` gives
       the f32 Variable view), `CoreOut.residual` the double-float-
       verified value and `CoreOut.raw_residual` the pre-refinement
       one. With refinement off the solution is a plain Variable.

    scaling: optional precomputed batched MpcScaling for `data` (from
    vmap(ruiz_mpc_scaling)) — receding-horizon drivers compute it once
    per plant and reuse it every control step. When engaged and not
    given, the Ruiz scaling is computed ONCE here and shared by the
    solve, the failure-retry pass, and the refinement loop."""
    opts = options.validated()
    from fbstab_tpu.models.refine import refine_engaged
    from fbstab_tpu.models.scaling import (
        ruiz_mpc_scaling, scaling_engaged, solve_scaled_mpc)

    # Beyond-envelope TPU f32 batches run unequilibrated (measured
    # round-5 policy, gate_mpc_options) unless the caller supplied a
    # precomputed scaling explicitly — the documented escape hatch.
    if scaling is None:
        opts = gate_mpc_options(data, z0.dtype, opts)

    scal = scaling
    if scal is None and scaling_engaged(opts, z0.dtype):
        base = (MpcQPData(**{f: getattr(data, f)
                             for f in MpcQPData._fields})
                if isinstance(data, MpcQPDataT) else data)
        scal = jax.vmap(ruiz_mpc_scaling)(base)

    # Refinement re-reports residual/raw_residual in df-verified
    # original units at every lane, so the scaled solve's own f32
    # re-evaluation would be dead work (skip_residual_rewrite).
    will_refine = refine_engaged(opts, z0.dtype)

    def scaled_solve(o, d, z, l, v):
        return solve_scaled_mpc(
            lambda dd, zz, ll, vv: _solve_mpc_qp_batch_raw(
                dd, zz, ll, vv, o, riccati), d, z, l, v, o, scal=scal,
            skip_residual_rewrite=will_refine)

    x, core = scaled_solve(opts, data, z0, l0, v0)
    if opts.retry_failed and z0.dtype == jnp.float32:
        from fbstab_tpu.models.scaling import (
            merge_failed_retry, retry_options)
        from fbstab_tpu.solver_out import ExitFlag
        fail = core.eflag == int(ExitFlag.LINEAR_SOLVER_FAILED)

        # Failed lanes restart from the caller's guess (their last
        # iterate is near the singular configuration that failed);
        # everyone else re-enters AT their solution and exits
        # immediately, keeping the lockstep pass cheap. The whole pass
        # rides a lax.cond on "any lane failed": the common zero-failure
        # batch skips the second solve at RUNTIME (measured ~5 ms of the
        # headline solve), while the compiled program keeps the branch.
        def _do_retry(_):
            m = fail[:, None]
            x2, core2 = scaled_solve(
                retry_options(opts), data,
                jnp.where(m, z0, x.z), jnp.where(m, l0, x.l),
                jnp.where(m, v0, x.v))
            return merge_failed_retry(x, core, x2, core2)

        x, core = lax.cond(jnp.any(fail), _do_retry,
                           lambda _: (x, core), None)
    from fbstab_tpu.models.refine import refine_engaged
    if refine_engaged(opts, z0.dtype):
        from fbstab_tpu.models.refine import refine_solution_mpc
        return refine_solution_mpc(data, x, core, opts, scal=scal)
    return x, core


# ------------------------------------------------------------------
# Facade (reference: FBstabMpc, fbstab_mpc.h:56).
# ------------------------------------------------------------------

class FBstabMpc:
    """Allocate-once/solve-many facade for MPC QPs.

    Sizes follow fbstab_mpc.cc:70-72: nz = (N+1)(nx+nu), nl = (N+1)nx,
    nv = (N+1)nc. The jitted solve is cached per (sizes, options); warmstarts
    thread the returned Variable back in, matching the reference's
    overwrite-the-guess contract (fbstab_algorithm.h:129-142).
    """

    def __init__(self, N: int, nx: int, nu: int, nc: int,
                 dtype=jnp.float64, stream=None):
        if N <= 0 or nx <= 0 or nu <= 0 or nc <= 0:
            raise ValueError("FBstabMpc requires N, nx, nu, nc > 0.")
        self.N, self.nx, self.nu, self.nc = N, nx, nu, nc
        self.nz = (N + 1) * (nx + nu)
        self.nl = (N + 1) * nx
        self.nv = (N + 1) * nc
        self.dtype = dtype
        self._options = Options.default()
        self._stream = stream
        self._compiled = None

    def update_options(self, options: Options) -> None:
        """Reference: FBstabMpc::UpdateOptions (fbstab_mpc.cc:95-99)."""
        self._options = options.validated()
        self._compiled = None

    def set_stream(self, stream) -> None:
        """Injects an OutputStream that receives ALL solver output —
        the ITER / ITER_DETAILED tables (via an ordered debug callback
        from inside the jitted solve) and the FINAL summary — the
        reference's Solve(qp, &x, os) embedder hook
        (tools/output_stream.h:15-38, fbstab_dense.h:136-149). Triggers
        a recompile (the sink is bound at trace time)."""
        self._stream = stream
        self._compiled = None

    @property
    def options(self) -> Options:
        return self._options

    @staticmethod
    def default_options() -> Options:
        return Options.default()

    @staticmethod
    def reliable_options() -> Options:
        return Options.reliable()

    def _get_compiled(self):
        if self._compiled is None:
            opts = self._options
            from fbstab_tpu.utils.compile import tpu_compiler_options

            stream = self._stream

            def f(d, z, l, v):
                from fbstab_tpu.models.refine import (
                    refine_engaged, refine_solution_mpc)
                from fbstab_tpu.models.scaling import (
                    scaling_engaged, solve_scaled_mpc)
                if not (scaling_engaged(opts, z.dtype)
                        or refine_engaged(opts, z.dtype)):
                    return fbstab_solve(MPC_OPS, d, z, l, v, opts,
                                        stream=stream)
                # f32 product path: batch the instance and reuse the
                # equilibrated + refined batch machinery.
                bat = lambda t: jax.tree.map(lambda a: a[None], t)
                unbat = lambda t: jax.tree.map(lambda a: a[0], t)
                raw = lambda dd, zz, ll, vv: jax.vmap(
                    lambda d1, z1, l1, v1: fbstab_solve(
                        MPC_OPS, d1, z1, l1, v1, opts, stream=stream)
                )(dd, zz, ll, vv)
                will_refine = refine_engaged(opts, z.dtype)
                xb, coreb = solve_scaled_mpc(
                    raw, bat(d), z[None], l[None], v[None], opts,
                    skip_residual_rewrite=will_refine)
                if will_refine:
                    xb, coreb = refine_solution_mpc(bat(d), xb, coreb,
                                                    opts)
                return unbat(xb), unbat(coreb)

            self._compiled = jax.jit(
                f, compiler_options=tpu_compiler_options())
        return self._compiled

    def solve(self, data: MpcQPData, x0: Optional[Variable] = None,
              stream=None) -> tuple[Variable, SolverOut]:
        """Solves one MPC QP from the warmstart x0 (origin if omitted).
        `stream` overrides the FINAL-summary sink for this call (use
        set_stream to also capture the traced ITER tables)."""
        self._validate(data)
        if x0 is None:
            x0 = Variable(
                z=jnp.zeros((self.nz,), self.dtype),
                l=jnp.zeros((self.nl,), self.dtype),
                v=jnp.zeros((self.nv,), self.dtype),
                y=jnp.zeros((self.nv,), self.dtype))
        fn = self._get_compiled()
        t0 = time.perf_counter()
        x, core = fn(data, x0.z, x0.l, x0.v)
        # Time by materializing a small output: block_until_ready does not
        # reliably block through the axon TPU tunnel (CLAUDE.md), so it
        # under-reports on the very hardware this targets.
        np.asarray(core.residual)
        elapsed = time.perf_counter() - t0
        out = SolverOut(
            eflag=core.eflag, residual=core.residual,
            newton_iters=core.newton_iters, prox_iters=core.prox_iters,
            solve_time=jnp.asarray(elapsed),
            initial_residual=core.initial_residual,
            raw_residual=core.raw_residual,
            refine_steps=core.refine_steps)
        self._maybe_print_final(out, data, x, stream)
        return x, out

    def _validate(self, data: MpcQPData) -> None:
        N, nx, nu, nc = self.N, self.nx, self.nu, self.nc
        expect = dict(
            Q=(N + 1, nx, nx), R=(N + 1, nu, nu), S=(N + 1, nu, nx),
            q=(N + 1, nx), r=(N + 1, nu),
            A=(N, nx, nx), B=(N, nx, nu), c=(N, nx),
            E=(N + 1, nc, nx), L=(N + 1, nc, nu), d=(N + 1, nc), x0=(nx,))
        for name, want in expect.items():
            got = tuple(getattr(data, name).shape)
            if got != want:
                raise ValueError(
                    f"FBstabMpc.solve: {name} has shape {got}, "
                    f"expected {want}.")

    def _maybe_print_final(self, out: SolverOut, data: MpcQPData,
                           x: Variable, stream=None) -> None:
        from fbstab_tpu.options import Display
        from fbstab_tpu.utils.printing import print_final
        if self._options.display_level < Display.FINAL:
            return
        from fbstab_tpu.core.residuals import (
            penalized_natural_residual, residual_block_norms)
        from fbstab_tpu.models.refine import VariableDF
        if isinstance(x, VariableDF):
            x = x.hi()
        bn = residual_block_norms(penalized_natural_residual(
            MPC_OPS, data, x, self._options.alpha))
        combo = float(self._options.abs_tol + self._options.rel_tol
                      * (1.0 + _forcing_norm(data)))
        print_final(out, self._options, stream=stream or self._stream,
                    block_norms=bn, combo_tol=combo)
