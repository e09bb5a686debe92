"""Solver options for FBstab-TPU.

Mirrors the reference option surface (fbstab/fbstab_algorithm.h:48-82 and
fbstab/fbstab_algorithm-impl.h:7-74 in dliaomcp/fbstab): the same 20 fields,
the same Default / Reliable profiles and the same saturation-based validation.

Options are a *static* pytree: every field is a Python scalar, so a jitted
solve specializes on the option values (the TPU analog of the reference's
allocate-once / solve-many pattern). Changing options triggers a retrace,
which matches the intended usage (options are set once per solver object).
"""

from __future__ import annotations

import dataclasses
import enum

import jax


class Display(enum.IntEnum):
    """Verbosity levels (reference: fbstab_algorithm.h:40-45)."""

    OFF = 0
    FINAL = 1
    ITER = 2
    ITER_DETAILED = 3


def _saturate(x: float, lo: float, hi: float) -> float:
    """Clamp x into [lo, hi] (reference: tools/utilities.h saturate)."""
    return min(max(x, lo), hi)


@dataclasses.dataclass(frozen=True)
class Options:
    """Algorithm parameters (reference: fbstab_algorithm.h:48-82).

    Field defaults follow AlgorithmParameters::DefaultParameters()
    (fbstab_algorithm-impl.h:33-59), which is what both reference facades
    install at construction time.
    """

    sigma0: float = 1e-8        # initial (and in practice, constant) prox strength
    sigma_max: float = 1e-6
    sigma_min: float = 1e-12
    alpha: float = 0.95         # penalized-FB blending parameter
    beta: float = 0.75          # linesearch backtracking factor
    eta: float = 1e-8           # sufficient decrease parameter
    delta: float = 0.2          # subproblem tolerance reduction factor
    gamma: float = 0.1          # reserved: sigma reduction factor

    abs_tol: float = 1e-6
    rel_tol: float = 1e-12
    stall_tol: float = 1e-10
    infeas_tol: float = 1e-8

    inner_tol_max: float = 1e-2
    inner_tol_min: float = 1e-12

    max_newton_iters: int = 200
    max_prox_iters: int = 30
    max_inner_iters: int = 50
    max_linesearch_iters: int = 20

    check_feasibility: bool = True
    nonmonotone_linesearch: bool = True
    display_level: Display = Display.OFF

    # TPU-native extension (no reference counterpart): exit the inner Newton
    # loop after 3 consecutive iterations without a relative residual
    # improvement of at least this factor. 0.0 disables the guard, which
    # preserves exact reference iterate paths; the single-precision profile
    # enables it because f32 residuals plateau at the roundoff floor and
    # would otherwise burn the whole Newton budget in lockstep-batched
    # solves.
    inner_stall_tol: float = 0.0

    # TPU-native extension: mixed-precision iterative-refinement steps
    # applied to float32 solves by the batch dispatchers / facades
    # (models/refine.py). Each step evaluates the KKT residual in
    # double-float (two-f32 compensated) arithmetic and applies one f32
    # fused-Newton correction; the iterate is carried as a double-float
    # pair. This is how the f32 TPU path meets the reference's default
    # 1e-6 accuracy contract (fbstab_algorithm-impl.h:43-44): the raw f32
    # path floors at ~1e-5 (evaluation roundoff) and even the f32-ROUNDED
    # refined point floors at ~5e-6 (representation error, measured on
    # v5e) — the returned double-float pair reaches <= 4.5e-7 at 3 steps
    # on the bench workload, f64-host-verified. 0 disables refinement.
    # This is the MAXIMUM step count: the product loop exits early once
    # every converged lane's double-float residual is under
    # refine_target (well-scaled batches stop after ~2 steps); the
    # single_precision profile defaults to 48.
    refine_steps: int = 0

    # Early-exit target for the refinement loop: the reference's default
    # accuracy contract (abs_tol 1e-6, fbstab_algorithm-impl.h:43-44).
    refine_target: float = 1e-6

    # Proximal sigma for the refinement correction solves; 0.0 means
    # "use sigma0". The refinement's linear contraction rate scales with
    # sigma (the corrections are proximally regularized Newton steps),
    # so a smaller value converges in fewer steps; it can be far smaller
    # than the solver's sigma0 because each correction starts from a
    # near-KKT point (and a failed factorization retries at 8x sigma
    # automatically, so an aggressive choice is self-correcting).
    refine_sigma: float = 0.0

    # Re-solve lanes that exit LINEAR_SOLVER_FAILED with a 4x larger
    # proximal sigma (warmstarted from their last iterate) — the
    # regularize-and-retry pass the reference leaves as a TODO
    # (riccati_linear_solver.cc:129-130), done batch-masked: non-failed
    # lanes re-enter AT their solutions and exit immediately, so the
    # pass costs a few percent. f32 batch dispatchers only.
    retry_failed: bool = False

    # Ruiz equilibration of the problem data before f32 solves
    # (models/scaling.py): fixes the cond(K)*eps_f32 accuracy floor on
    # badly scaled problems (e.g. the reference's ServoMotor plant,
    # cost spread 1e7). Changes iterate paths, so the f64 default is
    # off for reference parity; single_precision turns it on.
    equilibrate: bool = False

    def validated(self) -> "Options":
        """Returns a copy with every field saturated into its documented safe
        range (reference: AlgorithmParameters::ValidateOptions,
        fbstab_algorithm-impl.h:7-31)."""
        sigma0 = max(self.sigma0, 1e-10)
        sigma_max = _saturate(self.sigma_max, 1e-6, 1e2)
        sigma_min = _saturate(self.sigma_min, 1e-13, 1e-8)
        sigma0 = _saturate(sigma0, sigma_min, sigma_max)
        return dataclasses.replace(
            self,
            sigma0=sigma0,
            sigma_max=sigma_max,
            sigma_min=sigma_min,
            alpha=_saturate(self.alpha, 0.001, 0.999),
            beta=_saturate(self.beta, 0.1, 0.99),
            eta=_saturate(self.eta, 1e-12, 0.499),
            delta=_saturate(self.delta, 0.0001, 0.99),
            gamma=_saturate(self.gamma, 0.001, 0.9),
            abs_tol=max(self.abs_tol, 1e-14),
            rel_tol=max(self.rel_tol, 0.0),
            stall_tol=max(self.stall_tol, 1e-14),
            infeas_tol=max(self.infeas_tol, 1e-14),
            inner_tol_max=_saturate(self.inner_tol_max, 1e-8, 1e2),
            inner_tol_min=_saturate(self.inner_tol_min, 1e-14, 1e-2),
            max_newton_iters=max(self.max_newton_iters, 1),
            max_prox_iters=max(self.max_prox_iters, 1),
            max_inner_iters=max(self.max_inner_iters, 1),
            max_linesearch_iters=max(self.max_linesearch_iters, 1),
            inner_stall_tol=_saturate(self.inner_stall_tol, 0.0, 0.5),
            refine_steps=int(_saturate(self.refine_steps, 0, 96)),
            refine_target=max(self.refine_target, 1e-14),
            refine_sigma=(0.0 if self.refine_sigma == 0.0
                          else _saturate(self.refine_sigma, 1e-8, 1e-1)),
        )

    @staticmethod
    def default() -> "Options":
        """Recommended settings (reference: DefaultParameters,
        fbstab_algorithm-impl.h:33-59)."""
        return Options()

    @staticmethod
    def single_precision() -> "Options":
        """Settings tuned for float32 TPU runs (no reference counterpart:
        the reference is double-precision only).

        The default sigma0 = 1e-8 puts ~1/sigma ~ 1e8 conditioning into the
        Newton system, which float32 Cholesky cannot absorb (observed
        LINEAR_SOLVER_FAILED on TPU v5e). sigma0 = 1e-4 keeps the system
        well-conditioned in f32. Residual evaluation in f32 has a noise
        floor around eps * problem scale * sqrt(n) ~ 1e-5 on moderate
        problems (measured stalls at 1-3e-5 on the bench workload), so the
        tolerances sit above it: abs_tol 1e-4 with rel_tol 1e-6 for scale,
        and stall_tol 1e-7 so f32-stalled iterates exit SUCCESS instead of
        burning the Newton budget (stall exits are SUCCESS in the
        reference too, fbstab_algorithm-impl.h:162-169).

        refine_steps = 48 (maximum) with refine_target 1e-6: the batch
        dispatchers polish converged f32 solutions with mixed-precision
        iterative refinement (early exit at the target — well-scaled
        batches stop after ~2 executed steps) so the returned
        double-float solution meets the reference's default 1e-6
        accuracy contract — the product default on TPU, not an opt-in.
        refine_sigma = 1e-5: the corrections' proximal regularization is
        30x smaller than the solver's sigma0 (they start from a near-KKT
        point, so the factorization tolerates it, and rejected steps
        auto-escalate 8x with a damping reset) — measured on v5e the
        contraction rate improves monotonically with smaller sigma:
        3e-4 gave 3 executed steps, 3e-5 gave 2 (residual 4.5e-7 ->
        8.9e-8 on the 8192-QP bench batch), and 1e-5 keeps the headline
        at 2 steps while cutting the rough-floor copoly class from 6
        steps to 4 (+22% contract throughput there) at unchanged
        success and contract margins everywhere measured. The 48-step budget exists for the hard tail, not
        the common case: perturbed SpacecraftRelativeMotion instances
        are budget-bound at 24 (5/128 lanes finished at 1.3e-6..7.6e-6)
        and all reach the contract by 34 steps (measured v5e, worst
        8.9e-7); the early exit keeps well-scaled batches at ~2.

        equilibrate = True: Ruiz-scale the problem before the f32 solve
        and precondition the refinement corrections with it — required
        for badly scaled problems (the reference's ServoMotor /
        SpacecraftRelativeMotion plants) where cond(K)*eps_f32 otherwise
        floors the achievable accuracy orders above the contract.
        """
        return dataclasses.replace(
            Options(),
            sigma0=3e-4,
            sigma_max=1e-2,
            sigma_min=1e-6,
            abs_tol=1e-4,
            rel_tol=1e-6,
            stall_tol=1e-6,
            infeas_tol=1e-6,
            inner_tol_min=1e-7,
            inner_stall_tol=1e-3,
            refine_steps=48,
            refine_sigma=1e-5,
            equilibrate=True,
            retry_failed=True,
        )

    @staticmethod
    def reliable() -> "Options":
        """Settings for hard / ill-conditioned problems (reference:
        ReliableParameters, fbstab_algorithm-impl.h:61-74)."""
        return dataclasses.replace(
            Options(),
            sigma0=1e-4,
            sigma_max=1e-2,
            sigma_min=1e-10,
            beta=0.9,
            abs_tol=1e-4,
            rel_tol=1e-6,
            max_linesearch_iters=40,
            max_newton_iters=500,
            max_prox_iters=100,
            nonmonotone_linesearch=False,
        )


# Options carry only Python scalars: register as a static (leaf-less) pytree so
# jitted solvers specialize on the option values.
jax.tree_util.register_static(Options)
