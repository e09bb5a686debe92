"""Primal/dual infeasibility detection (paper Alg. 3).

Mirrors FullFeasibility::CheckFeasibility (fbstab/components/
full_feasibility.cc:25-88) exactly, including the infinity-norm scalings and
the hard 1e-14 floor on ||z||_inf. Returns booleans instead of an enum so the
caller can form the per-instance exit flag branchlessly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fbstab_tpu.core.problem import ProblemOps
from fbstab_tpu.core.variable import Variable


class FeasibilityResult(NamedTuple):
    primal_feasible: jnp.ndarray  # bool scalar
    dual_feasible: jnp.ndarray    # bool scalar


def _inf_norm(x):
    # max over an empty axis is invalid; nl can be 0 for dense QPs.
    if x.shape[-1] == 0:
        return jnp.zeros((), dtype=x.dtype)
    return jnp.max(jnp.abs(x))


def check_feasibility(ops: ProblemOps, data, x: Variable,
                      tol) -> FeasibilityResult:
    """Evaluates the infeasibility certificates at the proximal step x = dx.

    Dual infeasibility (unbounded objective) is declared when
      max(A z) <= tol*||z||_inf  and  ||G z||_inf <= tol*||z||_inf  and
      ||H z||_inf <= tol*||z||_inf  and  f'z < 0  and  ||z||_inf > 1e-14.

    Primal infeasibility when
      ||A'v + G'l||_inf <= tol*max(||v||_inf, ||l||_inf)  and
      b'v + h'l < 0.

    Reference: full_feasibility.cc:29-77.
    """
    z, l, v = x.z, x.l, x.v

    d1 = jnp.max(ops.gemvA(data, z))          # max(A z)
    d2 = _inf_norm(ops.gemvG(data, z))        # ||G z||_inf
    d3 = _inf_norm(ops.gemvH(data, z))        # ||H z||_inf
    d4 = jnp.vdot(ops.f_vec(data), z)         # f' z
    w = _inf_norm(z)
    dual_infeasible = (
        (d1 <= w * tol) & (d2 <= tol * w) & (d3 <= tol * w)
        & (d4 < 0) & (w > 1e-14)
    )

    p1 = _inf_norm(ops.gemvAT(data, v) + ops.gemvGT(data, l))
    p2 = jnp.vdot(ops.h_vec(data), l) + jnp.vdot(ops.b_vec(data), v)
    u = jnp.maximum(_inf_norm(v), _inf_norm(l))
    primal_infeasible = (p1 <= tol * u) & (p2 < 0)

    return FeasibilityResult(
        primal_feasible=~primal_infeasible,
        dual_feasible=~dual_infeasible,
    )
