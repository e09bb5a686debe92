"""Fused Pallas TPU kernel for the Riccati Newton step.

One kernel performs, for a tile of QP instances living in the lane
dimension, the entire Newton-step linear solve of the MPC path:

  PFB weights -> barrier-augmented stage Hessians -> forward Riccati matrix
  recursion -> forward vector recursion -> backward substitution -> dual
  recovery

i.e. the work of RiccatiLinearSolver::Initialize + ::Solve in the reference
(riccati_linear_solver.cc:77-344), with identical recurrences. See
fbstab_tpu/models/mpc_qp.py for the stage-by-stage semantics; this module
only changes *where* the arithmetic runs.

Why a mega-kernel: the XLA implementation is a `lax.scan` whose body is
~100 tiny (nx, nx)-shaped ops. On TPU every HLO on such shapes costs ~1-2us
of fixed overhead and the sequential scan prevents pipelining, so a
30-stage factorization costs ~10ms/iteration regardless of batch width —
and at large batch the scan's stacked stage workspaces blow past VMEM and
spill (measured 33x cliff from B=1024 to B=2048). Inside one Pallas kernel
the same arithmetic is a stream of VPU vector instructions on
(sublane, lane) = (n, TILE_B) registers with all stage state held in VMEM
scratch: no per-op dispatch, no HBM round trips, and batch scaling is
linear in grid steps.

Layout: batch-LAST everywhere inside the kernel. A stage matrix is
(n, n, TILE_B): n x n occupies sublanes, TILE_B = 128 instances occupy
lanes, so an unrolled small-matrix op is one (8, 128) VPU tile op across
128 QP instances. The host-side wrapper transposes from the solver's
batch-first layout (XLA hoists the loop-invariant data transposes out of
the Newton while-loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fbstab_tpu.ops.pfb import ZERO_TOLERANCE
from fbstab_tpu.utils.compile import VMEM_LIMIT_KIB, vmem_jit

TILE_B = 128


# ------------------------------------------------------------------
# Batch-last small-matrix algebra. All operands are (n, m, B) or (n, B)
# jnp values inside the kernel; loops over the small dims are unrolled so
# every op is a full-lane VPU instruction.
# ------------------------------------------------------------------

def _T(A):
    """Transpose the matrix dims of a (n, m, B) stack."""
    return jnp.swapaxes(A, 0, 1)


def _mm(A, B):
    """(m, k, B) @ (k, n, B) -> (m, n, B), unrolled over m and k."""
    m, k, _ = A.shape
    rows = []
    for i in range(m):
        acc = A[i, 0][None, :] * B[0]
        for kk in range(1, k):
            acc = acc + A[i, kk][None, :] * B[kk]
        rows.append(acc)
    return jnp.stack(rows)


def _mv(A, x):
    """(m, k, B) @ (k, B) -> (m, B)."""
    m, k, _ = A.shape
    rows = []
    for i in range(m):
        acc = A[i, 0] * x[0]
        for kk in range(1, k):
            acc = acc + A[i, kk] * x[kk]
        rows.append(acc)
    return jnp.stack(rows)


def _chol(A):
    """Lower Cholesky of a (n, n, B) SPD stack, unrolled (same recurrence
    as ops/smallchol.py, batch-last)."""
    n = A.shape[0]
    cols = []
    for k in range(n):
        dinv = lax.rsqrt(A[k, k])
        col = A[:, k] * dinv[None, :]
        if k > 0:
            col = jnp.concatenate([
                jnp.zeros((k,) + col.shape[1:], col.dtype), col[k:]],
                axis=0)
        cols.append(col)
        A = A - col[:, None, :] * col[None, :, :]
    return jnp.stack(cols, axis=1)


def _tri_lower(L, b):
    """Solve L x = b, L (n, n, B) lower, b (n, B) or (n, m, B)."""
    n = L.shape[0]
    xs = [None] * n
    r = b
    for k in range(n):
        if r.ndim == 3:
            xk = r[k] / L[k, k][None, :]                # (m, B)
            contrib = L[:, k][:, None, :] * xk[None]    # (n, m, B)
        else:
            xk = r[k] / L[k, k]                         # (B,)
            contrib = L[:, k] * xk[None]                # (n, B)
        r = r - contrib
        xs[k] = xk
    return jnp.stack(xs)


def _tri_upperT(L, b):
    """Solve L' x = b given the lower factor L."""
    n = L.shape[0]
    xs = [None] * n
    r = b
    for k in range(n - 1, -1, -1):
        # Column k of L' is row k of L: L'[i, k] = L[k, i].
        if r.ndim == 3:
            xk = r[k] / L[k, k][None, :]
            contrib = L[k, :][:, None, :] * xk[None]
        else:
            xk = r[k] / L[k, k]
            contrib = L[k, :] * xk[None]
        r = r - contrib
        xs[k] = xk
    return jnp.stack(xs)


def _cho_solve(L, b):
    return _tri_upperT(L, _tri_lower(L, b))


def _solve_right_LT(X, M):
    """X inv(M)' for lower M: solve M Y' = X' -> Y = (_tri_lower(M, X'))'."""
    return _T(_tri_lower(M, _T(X)))


def _pfb_weights(ys, v, sigma, alpha):
    """gamma, mus per constraint (dense_cholesky_solver.cc:129-148 /
    riccati_linear_solver.cc:346-365, batch-last elementwise)."""
    r = jnp.sqrt(ys * ys + v * v)
    degenerate = r < ZERO_TOLERANCE
    r_safe = jnp.where(degenerate, 1.0, r)
    ga = alpha * (1.0 - ys / r_safe)
    gb = alpha * (1.0 - v / r_safe)
    interior = (ys > 0) & (v > 0)
    ga = jnp.where(interior, ga + (1.0 - alpha) * v, ga)
    gb = jnp.where(interior, gb + (1.0 - alpha) * ys, gb)
    dgn = alpha * (1.0 - 1.0 / jnp.sqrt(jnp.asarray(2.0, ys.dtype)))
    ga = jnp.where(degenerate, dgn, ga)
    gb = jnp.where(degenerate, dgn, gb)
    gamma = ga
    mus = gb + sigma * ga
    return gamma, mus


# ------------------------------------------------------------------
# The kernel.
# ------------------------------------------------------------------

def riccati_factor_solve(
        sigma,
        Q_ref, R_ref, S_ref, A_ref, B_ref, E_ref, L_ref,
        v_ref, y_ref, vbar_ref,
        rzx_ref, rzu_ref, rl_ref, rv_ref,
        dzx_ref, dzu_ref, dl_ref,
        Lc_ref, Mc_ref, SMc_ref, SGc_ref, AMc_ref, Pc_ref,
        th_ref, h_ref,
        *, N, nx, nu, nc, alpha, store_AP: bool = True,
        store_factors: bool = True):
    """In-kernel Riccati factor + solve over one batch tile (batch-last).

    Reads the iterate pieces (v, y, vbar) and the NEGATED inner residual
    from refs, writes (dz, dl) into the output refs. The primal x/u parts
    are SEPARATE refs: slicing the stage dimension at non-sublane-aligned
    nx boundaries gives Mosaic offset layouts it cannot reduce over. Reused by both the
    standalone Newton-step kernel and the full-solve kernel
    (ops/mpc_solve_pallas.py). Per-stage PFB weights and the
    post-elimination residual are recomputed where needed instead of being
    stored, trading a few VPU ops for ~2 MB of VMEM scratch.

    store_factors=False is the large-stage-dimension (low-VMEM) mode: only
    the Riccati carry Cholesky factors Lc are stored; the per-stage
    factors M/SM/SGc are recomputed from Lc in the vector passes
    (Mc_ref/SMc_ref/SGc_ref may then be None). The recomputation repeats
    the exact arithmetic of the forward pass on identical inputs, so the
    results are bit-identical to the storing mode; it trades ~2x stage-
    factor FLOPs for the (N+1)*(nx*nx + nu*nx + nu*nu) scratch, which is
    what lets nx~18-32 problems (e.g. the CopolymerizationReactor
    benchmark, /root/reference/fbstab/test/ocp_generator.cc:73-169) fit
    the per-tile VMEM budget.
    """
    f32 = Q_ref.dtype
    B_lanes = Q_ref.shape[-1]

    # sigma is a scalar (full-solve kernel: part of the in-kernel carry
    # semantics) or a per-lane (1, B) row (standalone Newton-step kernel:
    # sigma is per-instance solver-carry state). Vector contexts
    # broadcast either form directly; matrix (n, m, B) contexts need the
    # extra leading axis.
    sig_m = sigma if jnp.ndim(sigma) == 0 else sigma[None]
    sqsig_m = (jnp.sqrt(sigma) if jnp.ndim(sigma) == 0
               else jnp.sqrt(sigma)[None])

    Ix = jnp.broadcast_to(
        jnp.eye(nx, dtype=f32)[..., None], (nx, nx, B_lanes))
    Iu = jnp.broadcast_to(
        jnp.eye(nu, dtype=f32)[..., None], (nu, nu, B_lanes))

    def stage_weights(i):
        """(gamma, mus) at stage i (riccati_linear_solver.cc:91-99)."""
        vi = v_ref[i]
        ys = y_ref[i] + sigma * (vi - vbar_ref[i])
        return _pfb_weights(ys, vi, sigma, alpha)

    def stage_r1(i, mus_i):
        """r1(i) = rz(i) - [E(i); L(i)]'(rv(i) ./ mus(i))
        (riccati_linear_solver.cc:230-235), split into (x, u) parts."""
        rvm = rv_ref[i] / mus_i                       # (nc, B)
        Ei = E_ref[i]
        Li = L_ref[i]
        etv = Ei[0] * rvm[0][None]
        ltv = Li[0] * rvm[0][None]
        for c in range(1, nc):
            etv = etv + Ei[c] * rvm[c][None]
            ltv = ltv + Li[c] * rvm[c][None]
        return rzx_ref[i] - etv, rzu_ref[i] - ltv

    def stage_hessians(i):
        """Qhat, Rhat, Shat at stage i (riccati_linear_solver.cc:101-123)."""
        gamma, mus = stage_weights(i)
        Gi = gamma / mus                              # (nc, B)
        Ei = E_ref[i]
        Li = L_ref[i]
        GE = Gi[:, None, :] * Ei                      # (nc, nx, B)
        GL = Gi[:, None, :] * Li                      # (nc, nu, B)
        Qh = Q_ref[i] + sig_m * Ix + _mm(_T(Ei), GE)
        Rh = R_ref[i] + sig_m * Iu + _mm(_T(Li), GL)
        Sh = S_ref[i] + _mm(_T(Li), GE)
        return Qh, Rh, Sh

    def stage_factor(Lf, i):
        """M, SM, SG at stage i from the carried Riccati factor Lf
        (riccati_linear_solver.cc:140-151, 191-209)."""
        Qh, Rh, Sh = stage_hessians(i)
        Linv = _cho_solve(Lf, Ix)
        M = _chol(Qh + Linv)
        SM = _solve_right_LT(Sh, M)
        SG = _chol(Rh - _mm(SM, _T(SM)))
        return M, SM, SG

    # ---- Forward matrix recursion (cc:125-188). ----
    L0 = sqsig_m * Ix

    def stage_AP(i, M_i, SM_i, SG_i):
        """AM = A inv(M)', P = (AM SM' - B) inv(SG)' at stage i from the
        stage factors (recompute mode trades ~20% extra VPU work for the
        AMc/Pc scratch, ~1.4 MB per 128-lane tile)."""
        AM = _solve_right_LT(A_ref[i], M_i)
        P = _solve_right_LT(_mm(AM, _T(SM_i)) - B_ref[i], SG_i)
        return AM, P

    def fwd_mat_body(i, Lf):
        M, SM, SG = stage_factor(Lf, i)
        AM = _solve_right_LT(A_ref[i], M)
        P = _solve_right_LT(_mm(AM, _T(SM)) - B_ref[i], SG)
        L_next = _chol(sig_m * Ix + _mm(P, _T(P)) + _mm(AM, _T(AM)))
        Lc_ref[i] = Lf
        if store_factors:
            Mc_ref[i] = M
            SMc_ref[i] = SM
            SGc_ref[i] = SG
        if store_AP:
            AMc_ref[i] = AM
            Pc_ref[i] = P
        return L_next

    L_N = lax.fori_loop(0, N, fwd_mat_body, L0)
    M_N, SM_N, SG_N = stage_factor(L_N, N)
    Lc_ref[N] = L_N
    if store_factors:
        Mc_ref[N] = M_N
        SMc_ref[N] = SM_N
        SGc_ref[N] = SG_N

    def stage_factors_at(i):
        """(M, SM, SG) at stage i: stored, or recomputed from Lc (the
        recompute repeats the forward pass's arithmetic bit-for-bit)."""
        if store_factors:
            return Mc_ref[i], SMc_ref[i], SGc_ref[i]
        return stage_factor(Lc_ref[i], i)

    # ---- Forward vector recursion (cc:239-262). ----
    _, mus0 = stage_weights(0)
    r1x0, _ = stage_r1(0, mus0)
    th0 = -rl_ref[0]                  # r2(0) = -rl(0)
    h0 = _cho_solve(L0, th0) - r1x0
    th_ref[0] = th0
    h_ref[0] = h0

    def fwd_vec_body(i, h_i):
        _, mus_i = stage_weights(i)
        _, r1u_i = stage_r1(i, mus_i)
        M_i, SM_i, SG_i = stage_factors_at(i)
        if store_AP:
            AM_i, P_i = AMc_ref[i], Pc_ref[i]
        else:
            AM_i, P_i = stage_AP(i, M_i, SM_i, SG_i)
        tx = _tri_lower(M_i, h_i)
        tu = _tri_lower(SG_i, _mv(SM_i, tx) + r1u_i)
        th_n = _mv(P_i, tu) + _mv(AM_i, tx) - rl_ref[i + 1]
        _, mus_n = stage_weights(i + 1)
        r1x_n, _ = stage_r1(i + 1, mus_n)
        h_n = _cho_solve(Lc_ref[i + 1], th_n) - r1x_n
        th_ref[i + 1] = th_n
        h_ref[i + 1] = h_n
        return h_n

    h_N = lax.fori_loop(0, N, fwd_vec_body, h0)

    # ---- Backward recursion (cc:266-327). ----
    _, mus_N = stage_weights(N)
    _, r1u_N = stage_r1(N, mus_N)
    txN = _tri_lower(M_N, h_N)
    uN = _cho_solve(SG_N, _mv(SM_N, txN) + r1u_N)
    xN = -_tri_upperT(M_N, txN + _mv(_T(SM_N), uN))
    lN = -_cho_solve(L_N, xN + th_ref[N])
    dzx_ref[N] = xN
    dzu_ref[N] = uN
    dl_ref[N] = lN

    def bwd_body(k, l_next):
        i = N - 1 - k
        M, SM, SG = stage_factors_at(i)
        _, mus_i = stage_weights(i)
        _, r1u_i = stage_r1(i, mus_i)
        if store_AP:
            AM_i, P_i = AMc_ref[i], Pc_ref[i]
        else:
            AM_i, P_i = stage_AP(i, M, SM, SG)
        tx = _tri_lower(M, h_ref[i])
        ui = _tri_lower(SG, _mv(SM, tx) + r1u_i)
        ui = _tri_upperT(SG, ui + _mv(_T(P_i), l_next))
        xi = -_tri_upperT(
            M, tx + _mv(_T(SM), ui) + _mv(_T(AM_i), l_next))
        li = -_cho_solve(Lc_ref[i], th_ref[i] + xi)
        dzx_ref[i] = xi
        dzu_ref[i] = ui
        dl_ref[i] = li
        return li

    lax.fori_loop(0, N, bwd_body, lN)


def _newton_step_kernel(
        sigma_ref,
        Q_ref, R_ref, S_ref, A_ref, B_ref, E_ref, L_ref,
        v_ref, y_ref, vbar_ref,
        rzx_ref, rzu_ref, rl_ref, rv_ref,
        dzx_ref, dzu_ref, dl_ref,
        *scratch, N, nx, nu, nc, alpha, lowmem=False):
    """Standalone Newton-step kernel: one riccati_factor_solve per tile.
    Dual recovery (dv, dy) happens outside as wide XLA einsums. lowmem
    drops the stored stage factors (see riccati_factor_solve)."""
    if lowmem:
        Lc_ref, th_ref, h_ref = scratch
        Mc_ref = SMc_ref = SGc_ref = AMc_ref = Pc_ref = None
    else:
        (Lc_ref, Mc_ref, SMc_ref, SGc_ref, AMc_ref, Pc_ref, th_ref,
         h_ref) = scratch
    riccati_factor_solve(
        sigma_ref[...],
        Q_ref, R_ref, S_ref, A_ref, B_ref, E_ref, L_ref,
        v_ref, y_ref, vbar_ref,
        rzx_ref, rzu_ref, rl_ref, rv_ref,
        dzx_ref, dzu_ref, dl_ref,
        Lc_ref, Mc_ref, SMc_ref, SGc_ref, AMc_ref, Pc_ref,
        th_ref, h_ref,
        N=N, nx=nx, nu=nu, nc=nc, alpha=alpha,
        store_AP=not lowmem, store_factors=not lowmem)


# ------------------------------------------------------------------
# Host-side wrapper.
# ------------------------------------------------------------------

def pad_batch(a, B, pad, shape):
    """Reshape to (B, *shape) and replicate instance 0 to pad the batch
    to a tile multiple. The single padding scheme shared by every
    fused-kernel wrapper (here, ops/mpc_solve_pallas.py,
    ops/dense_solve_pallas.py); the layout transform that follows —
    serial tiles, grid lanes, or batch-last — stays at the call site."""
    a = a.reshape((B,) + shape)
    if pad:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0)
    return a


def _to_bl(a):
    """batch-first (B, ...) -> batch-last (..., B)."""
    return jnp.moveaxis(a, 0, -1)


def _from_bl(a):
    return jnp.moveaxis(a, -1, 0)


@vmem_jit(static_argnames=("alpha", "interpret", "tile_b", "lowmem"))
def riccati_newton_step_batched(data, v, y, vbar, rz, rl, rv, sigma,
                                alpha: float, interpret: bool = False,
                                tile_b: int = TILE_B,
                                lowmem: bool = False):
    """Batched fused Newton step.

    data: MpcQPData with leading batch dim B on every leaf.
    v, y, vbar: (B, nv) iterate pieces; rz, rl, rv: (B, nz/nl/nv) the
    *negated* inner residual; sigma: scalar. lowmem selects the
    recompute-factors kernel mode for large stage dimensions.
    Returns (dz, dl, dv, dy) batch-first.
    """
    B = v.shape[0]
    N = data.A.shape[1]
    nx = data.A.shape[-1]
    nu = data.B.shape[-1]
    nc = data.E.shape[-2]
    N1 = N + 1
    ns = nx + nu
    dtype = v.dtype

    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    pad = Bp - B

    def prep(a, shape):
        return _to_bl(pad_batch(a, B, pad, shape))

    # Stage matrices: when the caller pre-transposed them (MpcQPDataT built
    # outside the Newton loop), custom_vmap canonicalization has applied
    # moveaxis(-1, 0); prep's moveaxis(0, -1) cancels it exactly, so the
    # kernel reads the loop-invariant batch-last buffers with no per-call
    # transpose (pad == 0 keeps the chain transparent to XLA).
    has_t = hasattr(data, "QT")
    Qb = prep(data.QT if has_t else data.Q, (N1, nx, nx))
    Rb = prep(data.RT if has_t else data.R, (N1, nu, nu))
    Sb = prep(data.ST if has_t else data.S, (N1, nu, nx))
    Ab = prep(data.AT if has_t else data.A, (N, nx, nx))
    Bb = prep(data.BT if has_t else data.B, (N, nx, nu))
    Eb = prep(data.ET if has_t else data.E, (N1, nc, nx))
    Lb = prep(data.LT if has_t else data.L, (N1, nc, nu))
    vb = prep(v, (N1, nc))
    yb = prep(y, (N1, nc))
    vbarb = prep(vbar, (N1, nc))
    rzs = rz.reshape(B, N1, ns)
    rzxb = prep(rzs[:, :, :nx].reshape(B, N1 * nx), (N1, nx))
    rzub = prep(rzs[:, :, nx:].reshape(B, N1 * nu), (N1, nu))
    rlb = prep(rl, (N1, nx))
    rvb = prep(rv, (N1, nc))

    # sigma is scalar or per-instance (B,) (part of the solver carry in
    # batched solves); either way the kernel gets a per-lane (1, B) row.
    sig_a = jnp.asarray(sigma, dtype).reshape(-1)
    sig_b = jnp.broadcast_to(sig_a, (B,))
    sig = prep(sig_b[:, None], (1,))                  # (1, Bp)

    grid = (Bp // tile_b,)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape + (tile_b,),
            (lambda *i, _nd=nd: (0,) * _nd + (i[0],)),
            memory_space=pltpu.VMEM)

    in_specs = [
        spec((1,)),
        spec((N1, nx, nx)), spec((N1, nu, nu)), spec((N1, nu, nx)),
        spec((N, nx, nx)), spec((N, nx, nu)),
        spec((N1, nc, nx)), spec((N1, nc, nu)),
        spec((N1, nc)), spec((N1, nc)), spec((N1, nc)),
        spec((N1, nx)), spec((N1, nu)), spec((N1, nx)), spec((N1, nc)),
    ]
    out_specs = (spec((N1, nx)), spec((N1, nu)), spec((N1, nx)))
    out_shape = (
        jax.ShapeDtypeStruct((N1, nx, Bp), dtype),
        jax.ShapeDtypeStruct((N1, nu, Bp), dtype),
        jax.ShapeDtypeStruct((N1, nx, Bp), dtype),
    )
    # Large-dims (lowmem) tiles are launched via lax.map with whole-tile
    # windows instead of a pipelined grid: grid pipelining DOUBLE-buffers
    # the input windows, and at nx=18/N=80 the doubled stage matrices
    # alone exceed physical VMEM (measured 153 MB > 128 MB). The HBM
    # loads are microseconds against milliseconds of compute per tile, so
    # pipelining buys nothing here anyway.
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    map_in_specs = [vspec() for _ in range(15)]
    map_out_specs = (vspec(), vspec(), vspec())
    map_out_shape = (
        jax.ShapeDtypeStruct((N1, nx, tile_b), dtype),
        jax.ShapeDtypeStruct((N1, nu, tile_b), dtype),
        jax.ShapeDtypeStruct((N1, nx, tile_b), dtype),
    )
    if lowmem:
        scratch = [
            pltpu.VMEM((N1, nx, nx, tile_b), dtype),   # Lc
            pltpu.VMEM((N1, nx, tile_b), dtype),       # th
            pltpu.VMEM((N1, nx, tile_b), dtype),       # h
        ]
    else:
        scratch = [
            pltpu.VMEM((N1, nx, nx, tile_b), dtype),   # Lc
            pltpu.VMEM((N1, nx, nx, tile_b), dtype),   # Mc
            pltpu.VMEM((N1, nu, nx, tile_b), dtype),   # SMc
            pltpu.VMEM((N1, nu, nu, tile_b), dtype),   # SGc
            pltpu.VMEM((N, nx, nx, tile_b), dtype),    # AMc
            pltpu.VMEM((N, nx, nu, tile_b), dtype),    # Pc
            pltpu.VMEM((N1, nx, tile_b), dtype),       # th
            pltpu.VMEM((N1, nx, tile_b), dtype),       # h
        ]

    kernel = functools.partial(
        _newton_step_kernel, N=N, nx=nx, nu=nu, nc=nc, alpha=alpha,
        lowmem=lowmem)

    ins = (sig, Qb, Rb, Sb, Ab, Bb, Eb, Lb, vb, yb, vbarb, rzxb, rzub,
           rlb, rvb)
    # Self-declared scoped-VMEM budget: the process-global
    # LIBTPU_INIT_ARGS flag only applies when the fused-solver modules
    # were imported before the first TPU compile.
    cparams = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_KIB * 1024)
    if lowmem:
        call = pl.pallas_call(
            kernel,
            in_specs=map_in_specs,
            out_specs=map_out_specs,
            out_shape=map_out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=cparams,
        )
        T = Bp // tile_b

        def tiles(a):
            # (..., Bp) -> (T, ..., tile_b)
            moved = jnp.moveaxis(a, -1, 0).reshape(
                (T, tile_b) + a.shape[:-1])
            return jnp.moveaxis(moved, 1, -1)

        tiled = tuple(tiles(a) for a in ins)
        outs = lax.map(lambda t: call(*t), tiled)
        dzx_t, dzu_t, dl_t = (
            jnp.moveaxis(jnp.moveaxis(o, -1, 1).reshape(
                (Bp,) + o.shape[1:-1]), 0, -1)
            for o in outs)
    else:
        dzx_t, dzu_t, dl_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=cparams,
        )(*ins)

    dzx = _from_bl(dzx_t)[:B]
    dzu = _from_bl(dzu_t)[:B]
    dz = jnp.concatenate([dzx, dzu], axis=2).reshape(B, N1 * ns)
    dl = _from_bl(dl_t)[:B].reshape(B, N1 * nx)

    # Dual recovery outside the kernel (riccati_linear_solver.cc:329-342):
    # these are wide batched einsums, cheap in XLA and not worth VMEM.
    sig_col = sig_b[:, None]                          # (B, 1)
    from fbstab_tpu.ops.pfb import pfb_weights
    gamma, mus, _ = pfb_weights(y, v, vbar, sig_col, alpha)
    dzs = dz.reshape(B, N1, ns)
    Adz = (jnp.einsum("bscj,bsj->bsc", data.E, dzs[:, :, :nx])
           + jnp.einsum("bscj,bsj->bsc", data.L, dzs[:, :, nx:])
           ).reshape(B, N1 * nc)
    dv = (rv + gamma * Adz) / mus
    dy = -data.d.reshape(B, N1 * nc) - Adz
    return dz, dl, dv, dy
