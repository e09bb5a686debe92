"""Residual functions for the FBstab optimality systems.

Mirrors FullResidual (fbstab/components/full_residual.{h,cc}): the
three-block residual (rz, rl, rv) with its three flavors, plus the blockwise
norm/merit conventions. Here residuals are plain pytrees returned by pure
functions; the cached block norms of the reference become values computed
alongside.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fbstab_tpu.core.problem import ProblemOps
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.ops.pfb import pfb


class Residual(NamedTuple):
    z: jnp.ndarray  # stationarity block (nz,)
    l: jnp.ndarray  # equality block (nl,)
    v: jnp.ndarray  # complementarity block (nv,)


def residual_norm(r: Residual):
    """sqrt(|rz|^2 + |rl|^2 + |rv|^2), matching the blockwise composition of
    FullResidual::Norm (full_residual.cc:39-41)."""
    s = jnp.sum(r.z * r.z) + jnp.sum(r.l * r.l) + jnp.sum(r.v * r.v)
    return jnp.sqrt(s)


def residual_block_norms(r: Residual):
    """(|rz|, |rl|, |rv|), the cached per-block norms of the reference
    (full_residual.h z_norm()/l_norm()/v_norm(), used by the ITER display
    tables, fbstab_algorithm-impl.h:414-430)."""
    return (jnp.sqrt(jnp.sum(r.z * r.z)),
            jnp.sqrt(jnp.sum(r.l * r.l)),
            jnp.sqrt(jnp.sum(r.v * r.v)))


def merit(norm):
    """Merit = 0.5 * ||r||^2 (full_residual.cc:43-47)."""
    return 0.5 * norm * norm


def inner_residual(ops: ProblemOps, data, x: Variable, xbar: Variable,
                   sigma, alpha) -> Residual:
    """Proximal-subproblem residual (full_residual.cc:49-74):

      rz = H z + f + G' l + A' v + sigma*(z - zbar)
      rl = h - G z + sigma*(l - lbar)
      rv = pfb(y + sigma*(v - vbar), v)
    """
    rz = (ops.f_vec(data) + ops.gemvH(data, x.z) + ops.gemvGT(data, x.l)
          + ops.gemvAT(data, x.v) + sigma * (x.z - xbar.z))
    rl = ops.h_vec(data) - ops.gemvG(data, x.z) + sigma * (x.l - xbar.l)
    ys = x.y + sigma * (x.v - xbar.v)
    rv = pfb(ys, x.v, alpha)
    return Residual(z=rz, l=rl, v=rv)


def natural_residual(ops: ProblemOps, data, x: Variable) -> Residual:
    """KKT natural residual, paper (17) (full_residual.cc:76-97):

      rz = H z + f + G' l + A' v
      rl = h - G z
      rv = min(y, v)
    """
    rz = (ops.f_vec(data) + ops.gemvH(data, x.z) + ops.gemvGT(data, x.l)
          + ops.gemvAT(data, x.v))
    rl = ops.h_vec(data) - ops.gemvG(data, x.z)
    rv = jnp.minimum(x.y, x.v)
    return Residual(z=rz, l=rl, v=rv)


def penalized_natural_residual(ops: ProblemOps, data, x: Variable,
                               alpha) -> Residual:
    """Penalized natural residual, the convergence metric
    (full_residual.cc:99-109):

      rv <- alpha * min(y, v) + (1 - alpha) * max(0, y) * max(0, v)
    """
    r = natural_residual(ops, data, x)
    rv = (alpha * r.v
          + (1.0 - alpha) * jnp.maximum(0.0, x.y) * jnp.maximum(0.0, x.v))
    return Residual(z=r.z, l=r.l, v=rv)
