"""Exit flags and structured solver output.

Mirrors ExitFlag and SolverOut from the reference
(fbstab/fbstab_algorithm.h:17-37), extended with a per-instance
LINEAR_SOLVER_FAILED code: under jit there are no exceptions, so the
reference's `throw std::runtime_error` on factorization failure
(fbstab_algorithm-impl.h:263-267) becomes a status code instead.
"""

from __future__ import annotations

import enum
from typing import NamedTuple

import jax.numpy as jnp


class ExitFlag(enum.IntEnum):
    """Return codes (reference: fbstab_algorithm.h:17-24)."""

    SUCCESS = 0
    DIVERGENCE = 1
    MAXITERATIONS = 2
    PRIMAL_INFEASIBLE = 3
    DUAL_INFEASIBLE = 4
    PRIMAL_DUAL_INFEASIBLE = 5
    # TPU-native extension: factorization failure is a per-instance status,
    # not an exception (SURVEY.md section 5 "failure detection").
    LINEAR_SOLVER_FAILED = 6


class SolverOut(NamedTuple):
    """Structured result pytree (reference: fbstab_algorithm.h:30-37).

    Each field is a scalar array per solved instance; under vmap they become
    batched arrays. `solve_time` is wall-clock seconds measured by the
    (non-traced) facade; -1.0 means timing unavailable, matching the
    reference's convention.

    When mixed-precision refinement is engaged (Options.refine_steps > 0 on
    an f32 solve), `residual` is the double-float-verified penalized natural
    residual at the refined solution and `raw_residual` keeps the solver's
    own (f32-floored) value; otherwise the two are equal.

    Non-SUCCESS lanes under refinement: the returned point passes through
    untouched (an infeasibility exit returns a CERTIFICATE, not a
    solution, fbstab_algorithm-impl.h:209), and both `residual` and
    `raw_residual` report the double-float penalized-natural-residual
    evaluated AT that returned point in original units — for a
    certificate lane this is a point diagnostic, not a convergence
    measure (it will be large; judge those lanes by `eflag`, as the
    reference does). The solver's internal residual is in equilibrated
    units when Options.equilibrate is on and is not reported.
    """

    eflag: jnp.ndarray           # int32, ExitFlag value
    residual: jnp.ndarray        # final penalized natural residual norm
    newton_iters: jnp.ndarray    # int32
    prox_iters: jnp.ndarray      # int32
    solve_time: jnp.ndarray      # seconds; -1.0 when timing disabled
    initial_residual: jnp.ndarray
    raw_residual: jnp.ndarray    # pre-refinement residual (== residual
                                 # when refinement is off)
    refine_steps: jnp.ndarray = 0  # EXECUTED refinement iterations
                                 # (batch-global early-exit loop count;
                                 # Options.refine_steps is the maximum)
