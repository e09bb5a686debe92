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

RUIZ_ITERS = 12


class MpcScaling(NamedTuple):
    """Per-stage diagonal scalings (see module docstring)."""

    dx: jnp.ndarray   # (N+1, nx)
    du: jnp.ndarray   # (N+1, nu)
    de: jnp.ndarray   # (N+1, nc)
    kc: jnp.ndarray   # scalar cost scaling


def _safe(n):
    return jnp.where(n > 0, n, 1.0)


def equilibrate_mpc(d: MpcQPData, iters: int = RUIZ_ITERS
                    ) -> tuple[MpcQPData, MpcScaling]:
    """Ruiz equilibration of one MPC QP (jittable; vmap for batches).

    Iterates d <- d / sqrt(inf-norm of the scaled row/column), with state
    columns floored at 1 by the dynamics' -I entries, then normalizes the
    cost block by a scalar kc (the OSQP-style cost scaling).
    """
    N, nx, nu, nc = mpc_dims(d)
    dtype = d.Q.dtype
    dx0 = jnp.ones((N + 1, nx), dtype)
    du0 = jnp.ones((N + 1, nu), dtype)
    de0 = jnp.ones((N + 1, nc), dtype)

    def scaled_blocks(dx, du, de):
        Qs = dx[:, :, None] * d.Q * dx[:, None, :]
        Ss = du[:, :, None] * d.S * dx[:, None, :]
        Rs = du[:, :, None] * d.R * du[:, None, :]
        As = d.A * dx[:-1][:, None, :] / dx[1:][:, :, None]
        Bs = d.B * du[:-1][:, None, :] / dx[1:][:, :, None]
        Es = de[:, :, None] * d.E * dx[:, None, :]
        Ls = de[:, :, None] * d.L * du[:, None, :]
        return Qs, Ss, Rs, As, Bs, Es, Ls

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

        # Inequality rows.
        rowe = jnp.maximum(amax(Es, 2), amax(Ls, 2))

        upd = lambda cur, nrm: cur * lax.rsqrt(_safe(nrm))
        return (upd(dx, colx), upd(du, colu), upd(de, rowe)), None

    (dx, du, de), _ = lax.scan(body, (dx0, du0, de0), None, length=iters)

    Qs, Ss, Rs, As, Bs, Es, Ls = scaled_blocks(dx, du, de)
    cost_mag = jnp.maximum(jnp.max(jnp.abs(Qs)), jnp.max(jnp.abs(Rs)))
    cost_mag = jnp.maximum(cost_mag, jnp.max(jnp.abs(Ss)))
    cost_mag = jnp.maximum(cost_mag, jnp.max(jnp.abs(dx * d.q)))
    cost_mag = jnp.maximum(cost_mag, jnp.max(jnp.abs(du * d.r)))
    kc = 1.0 / jnp.clip(_safe(cost_mag), 1e-8, 1e8)

    scaled = MpcQPData(
        Q=kc * Qs, R=kc * Rs, S=kc * Ss,
        q=kc * dx * d.q, r=kc * du * d.r,
        A=As, B=Bs, c=d.c / dx[1:],
        E=Es, L=Ls, d=de * d.d,
        x0=d.x0 / dx[0])
    return scaled, MpcScaling(dx=dx, du=du, de=de, kc=kc)


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


def equilibrate_dense(d, iters: int = RUIZ_ITERS):
    """Ruiz equilibration of one dense QP (models/dense_qp.DenseQPData).
    Returns (scaled_data, DenseScaling): z = dz*z', l = dl*l'/kc,
    v = de*v'/kc, y = y'/de."""
    nz = d.H.shape[-1]
    nl = d.G.shape[-2]
    nv = d.A.shape[-2]
    dtype = d.H.dtype
    dz0 = jnp.ones((nz,), dtype)
    dl0 = jnp.ones((max(nl, 1),), dtype)[:nl]
    de0 = jnp.ones((nv,), dtype)

    def scaled(dz, dl, de):
        Hs = dz[:, None] * d.H * dz[None, :]
        Gs = dl[:, None] * d.G * dz[None, :]
        As = de[:, None] * d.A * dz[None, :]
        return Hs, Gs, As

    def body(carry, _):
        dz, dl, de = carry
        Hs, Gs, As = scaled(dz, dl, de)
        colz = jnp.max(jnp.abs(Hs), axis=0)
        if nl > 0:
            colz = jnp.maximum(colz, jnp.max(jnp.abs(Gs), axis=0))
        colz = jnp.maximum(colz, jnp.max(jnp.abs(As), axis=0))
        rowl = (jnp.max(jnp.abs(Gs), axis=1) if nl > 0
                else jnp.zeros((0,), dtype))
        rowe = jnp.max(jnp.abs(As), axis=1)
        upd = lambda cur, nrm: cur * lax.rsqrt(_safe(nrm))
        return (upd(dz, colz), upd(dl, rowl), upd(de, rowe)), None

    (dz, dl, de), _ = lax.scan(body, (dz0, dl0, de0), None, length=iters)

    Hs, Gs, As = scaled(dz, dl, de)
    cost_mag = jnp.maximum(jnp.max(jnp.abs(Hs)),
                           jnp.max(jnp.abs(dz * d.f)))
    kc = 1.0 / jnp.clip(_safe(cost_mag), 1e-8, 1e8)

    scaled_data = type(d)(
        H=kc * Hs, f=kc * dz * d.f,
        G=Gs, h=dl * d.h, A=As, b=de * d.b)
    return scaled_data, DenseScaling(dz=dz, dl=dl, de=de, kc=kc)


def dense_scale_factors(s: DenseScaling):
    kc = s.kc[..., None] if s.kc.ndim else s.kc
    return s.dz, s.dl / kc, s.de / kc, s.de


def scale_dense_variable(x: Variable, s: DenseScaling) -> Variable:
    dzf, lf, vf, def_ = dense_scale_factors(s)
    return Variable(z=x.z / dzf, l=x.l / lf, v=x.v / vf, y=x.y * def_)


def unscale_dense_variable(x: Variable, s: DenseScaling) -> Variable:
    dzf, lf, vf, def_ = dense_scale_factors(s)
    return Variable(z=x.z * dzf, l=x.l * lf, v=x.v * vf, y=x.y / def_)
