"""The QP-class abstraction: a bundle of pure functions over a data pytree.

The reference achieves QP-class genericity through compile-time duck typing:
the algorithm template is parameterized over Variable/Residual/LinearSolver/
Feasibility roles whose required methods are documented in
fbstab/components/abstract_components.h, and all matrix access goes through
the Data object's 8 BLAS-like virtuals (gemvH/A/G/AT/GT, axpyf/h/b,
ForcingNorm) so H, G, A are never materialized by the algorithm layer.

The TPU-native equivalent: `ProblemOps`, a static bundle of jittable pure
functions closed over nothing, each taking the (traced) data pytree
explicitly. The algorithm layer (core/algorithm.py) is generic over this
bundle; specializations live in models/dense_qp.py and models/mpc_qp.py.
Because the bundle is static, jit specializes the whole solve per QP class
while the data stays traced (so one compiled solver serves any problem
instance of the same shape — the trace-once/solve-many analog of the
reference's allocate-once design).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

from fbstab_tpu.core.variable import Variable


class ProblemOps(NamedTuple):
    """Pure-function contract for a QP class.

    Matrix-vector products (reference contract:
    abstract_components.h Data role, :24-62):
      gemvH(data, x)  -> H  @ x     (nz,)
      gemvA(data, x)  -> A  @ x     (nv,)
      gemvG(data, x)  -> G  @ x     (nl,)
      gemvAT(data, v) -> A' @ v     (nz,)
      gemvGT(data, l) -> G' @ l     (nz,)

    Forcing vectors:
      f_vec(data) -> (nz,)   linear cost
      h_vec(data) -> (nl,)   equality rhs
      b_vec(data) -> (nv,)   inequality rhs
      forcing_norm(data) -> scalar  ||(f, h, b)||_2

    Newton-step linear solver (reference contract:
    abstract_components.h LinearSolver role, :291-338):
      factor(data, x, xbar, sigma, alpha) -> factorization pytree
      factor_ok(fact) -> bool scalar (True if all factorizations succeeded;
          the jit-safe analog of LinearSolver::Initialize returning false)
      newton_solve(data, fact, rz, rl, rv) -> Variable dx solving the Newton
          system with dx.y = b - A dx.z already populated
    """

    gemvH: Callable[[Any, Any], Any]
    gemvA: Callable[[Any, Any], Any]
    gemvG: Callable[[Any, Any], Any]
    gemvAT: Callable[[Any, Any], Any]
    gemvGT: Callable[[Any, Any], Any]
    f_vec: Callable[[Any], Any]
    h_vec: Callable[[Any], Any]
    b_vec: Callable[[Any], Any]
    forcing_norm: Callable[[Any], Any]
    factor: Callable[..., Any]
    factor_ok: Callable[[Any], Any]
    newton_solve: Callable[..., Variable]
    # Optional fused Newton step replacing factor + factor_ok + newton_solve
    # in one call: (data, x, xbar, sigma, alpha, rz, rl, rv) -> (dx, ok)
    # with (rz, rl, rv) the negated inner residual. QP classes provide this
    # when they have a fused kernel (the MPC path's Pallas Riccati kernel);
    # None means the algorithm uses the three-call contract.
    newton_step: Any = None
