"""Dense QP specialization: data ops + Newton-step solver + facade.

Covers the reference's DenseData (fbstab/components/dense_data.{h,cc}),
DenseCholeskySolver (fbstab/components/dense_cholesky_solver.{h,cc}) and the
FBstabDense facade (fbstab/fbstab_dense.{h,cc}), re-designed for TPU:

 - DenseData's Eigen::Map zero-copy views become a plain pytree of arrays
   (device-resident; zero-copy is the default in JAX).
 - DenseCholeskySolver factors the indefinite saddle matrix
   K = [E G'; G -sigma*I] with Eigen's pivoted LDL'
   (dense_cholesky_solver.cc:66-78). JAX/TPU has no batched pivoted LDL',
   and none is needed: K is symmetric *quasi-definite* (E > 0, -sigma*I < 0
   with sigma > 0), so the block factorization
       E = Le Le'                  (Cholesky)
       S = sigma*I + W' W,  W = Le^{-1} G'   (SPD Schur complement)
       S = Ls Ls'                  (Cholesky)
   is the unpivoted LDL' in block form — stable for quasi-definite systems
   and composed entirely of batched-friendly Cholesky/triangular ops that XLA
   maps onto the MXU. It also handles the nl = 0 corner naturally (the
   reference probes exactly this Eigen edge case in
   fbstab/test/eigen_tests.cc:36-59).
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

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
    """Unrolled batched Cholesky for small systems (XLA's blocked kernel
    has ~ms serialized latency on TPU for tiny matrices, see
    ops/smallchol.py), XLA beyond UNROLL_LIMIT."""
    if A.shape[-1] <= UNROLL_LIMIT:
        return cholesky_small(A)
    return jnp.linalg.cholesky(A)


def _tri(T, b, lower=True):
    if T.shape[-1] <= UNROLL_LIMIT:
        return solve_triangular_small(T, b, lower=lower)
    return jax.scipy.linalg.solve_triangular(T, b, lower=lower)


class DenseQPData(NamedTuple):
    """Problem data for  min 1/2 z'Hz + f'z  s.t.  Gz = h, Az <= b
    (reference: FBstabDense::ProblemData, fbstab_dense.h:55-64)."""

    H: jnp.ndarray  # (nz, nz) PSD Hessian
    f: jnp.ndarray  # (nz,)
    G: jnp.ndarray  # (nl, nz)
    h: jnp.ndarray  # (nl,)
    A: jnp.ndarray  # (nv, nz)
    b: jnp.ndarray  # (nv,)


def dense_qp_data(H, f, G=None, h=None, A=None, b=None,
                  dtype=jnp.float64) -> DenseQPData:
    """Builds a DenseQPData pytree, defaulting missing equality blocks to
    zero-size arrays (nl = 0 is allowed, as in the reference)."""
    H = jnp.asarray(H, dtype)
    nz = H.shape[0]
    if G is None:
        G = jnp.zeros((0, nz), dtype)
        h = jnp.zeros((0,), dtype)
    return DenseQPData(
        H=H, f=jnp.asarray(f, dtype),
        G=jnp.asarray(G, dtype), h=jnp.asarray(h, dtype),
        A=jnp.asarray(A, dtype), b=jnp.asarray(b, dtype))


# ------------------------------------------------------------------
# Data operations (reference: dense_data.cc:12-41; trivial explicit-matrix
# matvecs — XLA fuses the surrounding axpys into them).
# ------------------------------------------------------------------

# All matmuls request full-f32 accumulation: TPU's default reduced
# matmul precision poisons the KKT factorizations (measured: every
# instance LINEAR_SOLVER_FAILED on the bench workload at default
# precision, all SUCCESS at highest).
def _pm(a, b):
    return jnp.matmul(a, b, precision="highest")


def _gemvH(d: DenseQPData, x):
    return _pm(d.H, x)


def _gemvA(d: DenseQPData, x):
    return _pm(d.A, x)


def _gemvG(d: DenseQPData, x):
    return _pm(d.G, x)


def _gemvAT(d: DenseQPData, v):
    return _pm(d.A.T, v)


def _gemvGT(d: DenseQPData, l):
    return _pm(d.G.T, l)


def _forcing_norm(d: DenseQPData):
    """||(f, h, b)||_2 (reference: dense_data.h:72-73)."""
    return jnp.sqrt(jnp.sum(d.f**2) + jnp.sum(d.h**2) + jnp.sum(d.b**2))


# ------------------------------------------------------------------
# Newton-step solver (reference: dense_cholesky_solver.cc:32-127).
# ------------------------------------------------------------------

class DenseFactorization(NamedTuple):
    Le: jnp.ndarray     # (nz, nz) lower Cholesky factor of E
    W: jnp.ndarray      # (nz, nl) = Le^{-1} G'
    Ls: jnp.ndarray     # (nl, nl) lower Cholesky factor of the Schur S
    gamma: jnp.ndarray  # (nv,)
    mus: jnp.ndarray    # (nv,)
    sigma: jnp.ndarray  # scalar


def _factor(d: DenseQPData, x: Variable, xbar: Variable, sigma, alpha
            ) -> DenseFactorization:
    """Forms and factors the Newton system, paper (28)/(29)
    (dense_cholesky_solver.cc:32-79)."""
    nz = d.H.shape[0]
    gamma, mus, Gamma = pfb_weights(x.y, x.v, xbar.v, sigma, alpha)

    # E = H + sigma*I + A' * diag(Gamma) * A
    E = d.H + sigma * jnp.eye(nz, dtype=d.H.dtype)
    E = E + _pm(d.A.T, Gamma[:, None] * d.A)
    Le = _chol(E)

    # W = Le^{-1} G',  S = sigma*I + W'W  (SPD Schur complement of E in K).
    W = _tri(Le, d.G.T, lower=True)
    nl = d.G.shape[0]
    S = sigma * jnp.eye(nl, dtype=d.H.dtype) + _pm(W.T, W)
    Ls = _chol(S)

    return DenseFactorization(Le=Le, W=W, Ls=Ls, gamma=gamma, mus=mus,
                              sigma=jnp.asarray(sigma, d.H.dtype))


def _factor_ok(fact: DenseFactorization):
    """True if both Cholesky factorizations succeeded. XLA's cholesky signals
    failure with NaNs rather than an error (the jit analog of
    Eigen::ComputationInfo, dense_cholesky_solver.cc:72-78)."""
    ok_e = jnp.all(jnp.isfinite(jnp.diagonal(fact.Le)))
    ok_s = jnp.all(jnp.isfinite(jnp.diagonal(fact.Ls)))
    return ok_e & ok_s


def _newton_solve(d: DenseQPData, fact: DenseFactorization, rz, rl, rv
                  ) -> Variable:
    """Solves the Newton system given the factorization
    (dense_cholesky_solver.cc:81-127):

        [E  G'] [dz] = [rz - A'(rv ./ mus)]
        [G -sI] [dl]   [-rl]
        diag(mus) dv = rv + diag(gamma) A dz
        dy = b - A dz

    via block elimination:  u = Le^{-1} r1;  (W'W + sI) dl = W'u - r2;
    E dz = r1 - G' dl.
    """
    solve_tri = _tri

    r1 = rz - _pm(d.A.T, rv / fact.mus)
    r2 = -rl

    u = solve_tri(fact.Le, r1, lower=True)
    rhs_l = _pm(fact.W.T, u) - r2
    tl = solve_tri(fact.Ls, rhs_l, lower=True)
    dl = solve_tri(fact.Ls.T, tl, lower=False)

    rhs_z = r1 - _pm(d.G.T, dl)
    tz = solve_tri(fact.Le, rhs_z, lower=True)
    dz = solve_tri(fact.Le.T, tz, lower=False)

    Adz = _pm(d.A, dz)
    dv = (rv + fact.gamma * Adz) / fact.mus
    dy = d.b - Adz
    return Variable(z=dz, l=dl, v=dv, y=dy)


DENSE_OPS = ProblemOps(
    gemvH=_gemvH, gemvA=_gemvA, gemvG=_gemvG, gemvAT=_gemvAT, gemvGT=_gemvGT,
    f_vec=lambda d: d.f, h_vec=lambda d: d.h, b_vec=lambda d: d.b,
    forcing_norm=_forcing_norm,
    factor=_factor, factor_ok=_factor_ok, newton_solve=_newton_solve,
)


# ------------------------------------------------------------------
# Functional entry points.
# ------------------------------------------------------------------

def solve_dense_qp(data: DenseQPData, z0, l0, v0,
                   options: Options = Options()):
    """Jittable single-instance dense solve. Returns (Variable, CoreOut)."""
    return fbstab_solve(DENSE_OPS, data, z0, l0, v0, options)


PALLAS_MODE = os.environ.get("FBSTAB_PALLAS", "auto")


def _fused_dense_eligible(data: DenseQPData, dtype) -> bool:
    """Gate for the fused dense solver kernel: f32 TPU batches of
    inequality-only QPs with VMEM-friendly sizes."""
    if PALLAS_MODE == "off":
        return False
    nl = data.G.shape[-2]
    n = data.H.shape[-1]
    q = data.A.shape[-2]
    dims_ok = n <= 64 and q <= 128 and nl <= 64
    if PALLAS_MODE == "interpret":
        return dims_ok
    return (jax.default_backend() == "tpu" and dtype == jnp.float32
            and dims_ok)


def solve_dense_qp_batch(data: DenseQPData, z0, l0, v0,
                         options: Options = Options(), scaling=None):
    """Batched dense solve: every array in `data` and the guesses carry a
    leading batch dimension. Masked-lockstep semantics via vmapped
    while_loops (the reference has no batch mode; this is the TPU 'DP'
    analog, SURVEY.md section 2). On TPU, f32 batches dispatch to the
    fully fused Pallas solver kernel (ops/dense_solve_pallas.py).

    f32 product defaults: equilibration + mixed-precision refinement to
    the 1e-6 contract, as in solve_mpc_qp_batch (the returned solution
    is a VariableDF double-float pair when refinement engages).

    scaling: optional precomputed batched DenseScaling for `data` (from
    vmap(ruiz_dense_scaling)) — multi-pass callers (the two-phase
    adaptive path, receding-horizon drivers) compute it once and reuse
    it; when engaged and not given it is computed ONCE here and shared
    by the solve, the failure-retry pass, and the refinement loop."""
    opts = options.validated()

    def raw_with(o):
        def raw(d, z, l, v):
            if _fused_dense_eligible(d, z.dtype):
                from fbstab_tpu.ops.dense_solve_pallas import (
                    fbstab_dense_solve_fused)
                return fbstab_dense_solve_fused(
                    d, z, l, v, o,
                    interpret=(PALLAS_MODE == "interpret"))
            return jax.vmap(
                lambda d1, z1, l1, v1: fbstab_solve(DENSE_OPS, d1, z1, l1,
                                                    v1, o)
            )(d, z, l, v)
        return raw

    from fbstab_tpu.models.refine import refine_engaged
    from fbstab_tpu.models.scaling import (
        ruiz_dense_scaling, scaling_engaged, solve_scaled_dense)
    # Compute the Ruiz scaling ONCE and share it across the solve, the
    # failure-retry pass, and the refinement loop.
    scal = scaling
    if scal is None and scaling_engaged(opts, z0.dtype):
        scal = jax.vmap(ruiz_dense_scaling)(data)
    # Refinement re-reports residual/raw_residual in df-verified
    # original units at every lane (skip the f32 re-evaluation).
    will_refine = refine_engaged(opts, z0.dtype)
    x, core = solve_scaled_dense(raw_with(opts), data, z0, l0, v0, opts,
                                 scal=scal,
                                 skip_residual_rewrite=will_refine)
    if opts.retry_failed and z0.dtype == jnp.float32:
        from jax import lax

        from fbstab_tpu.models.scaling import (
            merge_failed_retry, retry_options)
        from fbstab_tpu.solver_out import ExitFlag
        # The retry profile must reach the SOLVER, not just the scaling
        # wrapper (fixed round 4: the retry pass previously re-ran the
        # identical options and could only succeed by luck of the
        # warmstart). The pass rides a lax.cond on "any lane failed" so
        # zero-failure batches skip the second solve at runtime.
        ropts = retry_options(opts)
        fail = core.eflag == int(ExitFlag.LINEAR_SOLVER_FAILED)

        def _do_retry(_):
            m = fail[:, None]
            x2, core2 = solve_scaled_dense(
                raw_with(ropts), data, jnp.where(m, z0, x.z),
                jnp.where(m, l0, x.l), jnp.where(m, v0, x.v), ropts,
                scal=scal, skip_residual_rewrite=will_refine)
            return merge_failed_retry(x, core, x2, core2)

        x, core = lax.cond(jnp.any(fail), _do_retry,
                           lambda _: (x, core), None)
    if will_refine:
        from fbstab_tpu.models.refine import refine_solution_dense
        return refine_solution_dense(data, x, core, opts, scal=scal)
    return x, core


# ------------------------------------------------------------------
# Facade (reference: FBstabDense, fbstab_dense.h:50).
# ------------------------------------------------------------------

class FBstabDense:
    """Allocate-once/solve-many facade for dense QPs.

    The reference pre-allocates all workspaces in its constructor
    (fbstab_dense.cc:18-42) so Solve is allocation-free; the TPU analog is
    compiling the solve once per (nz, nl, nv, options) and reusing the
    executable. Warmstarting works the same way: Solve reads and returns the
    primal-dual guess (the caller threads it between calls).
    """

    def __init__(self, nz: int, nl: int, nv: int, dtype=jnp.float64,
                 stream=None):
        if nz <= 0 or nv <= 0 or nl < 0:
            raise ValueError("FBstabDense requires nz > 0, nv > 0, nl >= 0.")
        self.nz, self.nl, self.nv = nz, nl, nv
        self.dtype = dtype
        self._options = Options.default()
        self._stream = stream
        self._compiled = None

    def update_options(self, options: Options) -> None:
        """Reference: FBstabDense::UpdateOptions (fbstab_dense.cc:44-48)."""
        self._options = options.validated()
        self._compiled = None

    def set_stream(self, stream) -> None:
        """Injects an OutputStream receiving ALL solver output (ITER
        tables from inside the jitted solve + the FINAL summary) — the
        reference's Solve(qp, &x, os) embedder hook
        (tools/output_stream.h:15-38). Triggers a recompile."""
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
                    refine_engaged, refine_solution_dense)
                from fbstab_tpu.models.scaling import (
                    scaling_engaged, solve_scaled_dense)
                if not (scaling_engaged(opts, z.dtype)
                        or refine_engaged(opts, z.dtype)):
                    return fbstab_solve(DENSE_OPS, d, z, l, v, opts,
                                        stream=stream)
                bat = lambda t: jax.tree.map(lambda a: a[None], t)
                unbat = lambda t: jax.tree.map(lambda a: a[0], t)
                raw = lambda dd, zz, ll, vv: jax.vmap(
                    lambda d1, z1, l1, v1: fbstab_solve(
                        DENSE_OPS, d1, z1, l1, v1, opts, stream=stream)
                )(dd, zz, ll, vv)
                will_refine = refine_engaged(opts, z.dtype)
                xb, coreb = solve_scaled_dense(
                    raw, bat(d), z[None], l[None], v[None], opts,
                    skip_residual_rewrite=will_refine)
                if will_refine:
                    xb, coreb = refine_solution_dense(bat(d), xb, coreb,
                                                      opts)
                return unbat(xb), unbat(coreb)

            self._compiled = jax.jit(
                f, compiler_options=tpu_compiler_options())
        return self._compiled

    def solve(self, data: DenseQPData, x0: Optional[Variable] = None,
              stream=None) -> tuple[Variable, SolverOut]:
        """Solves one QP. x0 is the warmstart (origin if omitted); the
        returned Variable replaces it, matching the reference's
        overwrite-the-guess contract (fbstab_algorithm.h:129-142).
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

    def _validate(self, data: DenseQPData) -> None:
        nz, nl, nv = self.nz, self.nl, self.nv
        shapes = {
            "H": (data.H.shape, (nz, nz)), "f": (data.f.shape, (nz,)),
            "G": (data.G.shape, (nl, nz)), "h": (data.h.shape, (nl,)),
            "A": (data.A.shape, (nv, nz)), "b": (data.b.shape, (nv,)),
        }
        for name, (got, want) in shapes.items():
            if tuple(got) != want:
                raise ValueError(
                    f"FBstabDense.solve: {name} has shape {got}, "
                    f"expected {want}.")

    def _maybe_print_final(self, out: SolverOut, data: DenseQPData,
                           x: Variable, stream=None) -> None:
        from fbstab_tpu.options import Display
        from fbstab_tpu.utils.printing import print_final
        if self._options.display_level < Display.FINAL:
            return
        # Closing table (impl.h:529-537): blockwise PNR norms at the
        # returned point. (For infeasibility exits the returned point is
        # the certificate, so the norms describe it rather than the last
        # iterate — documented deviation.)
        from fbstab_tpu.core.residuals import (
            penalized_natural_residual, residual_block_norms)
        from fbstab_tpu.models.refine import VariableDF
        if isinstance(x, VariableDF):
            x = x.hi()
        bn = residual_block_norms(penalized_natural_residual(
            DENSE_OPS, data, x, self._options.alpha))
        combo = float(self._options.abs_tol + self._options.rel_tol
                      * (1.0 + _forcing_norm(data)))
        print_final(out, self._options, stream=stream or self._stream,
                    block_norms=bn, combo_tol=combo)
