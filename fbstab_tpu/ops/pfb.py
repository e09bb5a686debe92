"""Penalized Fischer-Burmeister (PFB) function and its generalized gradient.

Pure elementwise functions, fully vectorized over constraint and batch
dimensions (VPU work under jit; XLA fuses them into the surrounding
residual/weight computations).

Semantics follow the reference exactly:
 - pfb value:      fbstab/components/full_residual.cc:115-118
 - pfb gradient:   fbstab/components/dense_cholesky_solver.cc:129-148
   (3-branch formula with zero_tolerance = 1e-13,
    dense_cholesky_solver.h:94; identical code in
    riccati_linear_solver.cc:346-365)
"""

from __future__ import annotations

import jax.numpy as jnp

# Reference: DenseCholeskySolver::zero_tolerance_ (dense_cholesky_solver.h:94).
ZERO_TOLERANCE = 1e-13


def pfb(a, b, alpha):
    """Penalized Fischer-Burmeister function.

    pfb(a, b) = alpha * (a + b - sqrt(a^2 + b^2))
              + (1 - alpha) * max(0, a) * max(0, b)

    Reference: FullResidual::pfb (full_residual.cc:115-118).
    """
    fb = a + b - jnp.sqrt(a * a + b * b)
    return alpha * fb + (1.0 - alpha) * jnp.maximum(0.0, a) * jnp.maximum(0.0, b)


def pfb_gradient(a, b, alpha):
    """An element of the C-differential of the PFB function.

    Returns (ga, gb), the subgradient components w.r.t. a and b, using the
    same 3-branch selection as the reference (dense_cholesky_solver.cc:129-148):

      r = sqrt(a^2 + b^2)
      r <  1e-13:        ga = gb = alpha * (1 - 1/sqrt(2))
      a > 0 and b > 0:   ga = alpha*(1 - a/r) + (1-alpha)*b
                         gb = alpha*(1 - b/r) + (1-alpha)*a
      otherwise:         ga = alpha*(1 - a/r)
                         gb = alpha*(1 - b/r)

    Implemented branchlessly with jnp.where; the r==0 division is guarded so
    no NaN is produced in the untaken branch.
    """
    r = jnp.sqrt(a * a + b * b)
    degenerate = r < ZERO_TOLERANCE
    r_safe = jnp.where(degenerate, 1.0, r)

    ga_fb = alpha * (1.0 - a / r_safe)
    gb_fb = alpha * (1.0 - b / r_safe)

    interior = (a > 0) & (b > 0)
    ga = jnp.where(interior, ga_fb + (1.0 - alpha) * b, ga_fb)
    gb = jnp.where(interior, gb_fb + (1.0 - alpha) * a, gb_fb)

    d = alpha * (1.0 - 1.0 / jnp.sqrt(jnp.asarray(2.0, dtype=r.dtype)))
    ga = jnp.where(degenerate, d, ga)
    gb = jnp.where(degenerate, d, gb)
    return ga, gb


def pfb_weights(y, v, vbar, sigma, alpha):
    """Newton-system diagonal weights used by both linear solvers.

    For each constraint i, with ys = y_i + sigma*(v_i - vbar_i):
      (g, m0) = pfb_gradient(ys, v_i)
      gamma_i = g
      mu_i    = m0 + sigma * g
      Gamma_i = gamma_i / mu_i

    Reference: dense_cholesky_solver.cc:54-64 and
    riccati_linear_solver.cc:91-99.

    Returns (gamma, mus, Gamma).
    """
    ys = y + sigma * (v - vbar)
    g, m0 = pfb_gradient(ys, v, alpha)
    gamma = g
    mus = m0 + sigma * g
    return gamma, mus, gamma / mus
