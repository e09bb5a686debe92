"""Dense integration tests: the behavioral contract.

These are re-derived from the five reference end-to-end solves in
fbstab/test/fbstab_dense_unit_tests.cc (FeasibleQP :28-61, FeasibleQPwithEQ
:75-104, DegenerateQP :121-177, InfeasibleQP :195-217, UnboundedQP :233-256),
all at abs_tol = 1e-8 with analytic oracles.
"""

import numpy as np
import jax.numpy as jnp

from fbstab_tpu import (
    ExitFlag,
    FBstabDense,
    Options,
    dense_qp_data,
)


def _options():
    return Options(abs_tol=1e-8)


def test_feasible_qp():
    """H=[[3,1],[1,1]], f=[10,5], A=[[-1,0],[0,1]], b=0; solution
    z=(0,-5), v=(5,0)."""
    data = dense_qp_data(
        H=[[3.0, 1.0], [1.0, 1.0]], f=[10.0, 5.0],
        A=[[-1.0, 0.0], [0.0, 1.0]], b=[0.0, 0.0])
    solver = FBstabDense(2, 0, 2)
    solver.update_options(_options())
    x, out = solver.solve(data)

    assert int(out.eflag) == ExitFlag.SUCCESS
    np.testing.assert_allclose(np.asarray(x.z), [0.0, -5.0], atol=1e-8)
    np.testing.assert_allclose(np.asarray(x.v), [5.0, 0.0], atol=1e-8)


def test_feasible_qp_with_eq():
    """Adds one equality constraint; solution z=(0.25, 0.75)."""
    data = dense_qp_data(
        H=[[4.0, 1.0], [1.0, 2.0]], f=[1.0, 1.0],
        G=[[1.0, 1.0]], h=[1.0],
        A=[[-1.0, 0.0], [0.0, -1.0]], b=[0.0, 0.0])
    solver = FBstabDense(2, 1, 2)
    solver.update_options(_options())
    x, out = solver.solve(data)

    assert int(out.eflag) == ExitFlag.SUCCESS
    np.testing.assert_allclose(np.asarray(x.z), [0.25, 0.75], atol=1e-8)


def test_degenerate_qp():
    """Rank-deficient H; the primal solution set is {1} x [1, 3]. Check
    z0 ~= 1, z1 in [1,3], and the KKT residual to 1e-6."""
    H = np.array([[1.0, 0.0], [0.0, 0.0]])
    f = np.array([1.0, 0.0])
    A = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0],
                  [-1.0, 0.0], [0.0, -1.0]])
    b = np.array([0.0, 3.0, 3.0, -1.0, -1.0])
    data = dense_qp_data(H=H, f=f, A=A, b=b)
    solver = FBstabDense(2, 0, 5)
    solver.update_options(_options())
    x, out = solver.solve(data)

    assert int(out.eflag) == ExitFlag.SUCCESS
    z = np.asarray(x.z)
    v = np.asarray(x.v)
    y = np.asarray(x.y)
    np.testing.assert_allclose(z[0], 1.0, atol=1e-8)
    # Membership in the solution set, up to the solve tolerance (the exact
    # boundary z1 = 1 is attained up to roundoff).
    assert 1.0 - 1e-8 <= z[1] <= 3.0 + 1e-8

    r1 = H @ z + f + A.T @ v
    r2 = np.minimum(y, v)
    assert np.linalg.norm(r1) + np.linalg.norm(r2) <= 1e-6


def test_infeasible_qp():
    """No z satisfies Az <= b -> PRIMAL_INFEASIBLE."""
    data = dense_qp_data(
        H=[[1.0, 0.0], [0.0, 0.0]], f=[1.0, -1.0],
        A=[[1.0, 1.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]],
        b=[0.0, 3.0, 3.0, -1.0, -1.0])
    solver = FBstabDense(2, 0, 5)
    solver.update_options(_options())
    _, out = solver.solve(data)

    assert int(out.eflag) == ExitFlag.PRIMAL_INFEASIBLE


def test_unbounded_qp():
    """Objective unbounded below -> DUAL_INFEASIBLE."""
    data = dense_qp_data(
        H=[[1.0, 0.0], [0.0, 0.0]], f=[1.0, -1.0],
        A=[[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0], [0.0, -1.0]],
        b=[0.0, 3.0, -1.0, -1.0])
    solver = FBstabDense(2, 0, 4)
    solver.update_options(_options())
    _, out = solver.solve(data)

    assert int(out.eflag) == ExitFlag.DUAL_INFEASIBLE


def test_warmstart_reuse():
    """Warmstarting from the previous solution converges immediately
    (the reference's documented MPC workflow, README.md:20)."""
    data = dense_qp_data(
        H=[[3.0, 1.0], [1.0, 1.0]], f=[10.0, 5.0],
        A=[[-1.0, 0.0], [0.0, 1.0]], b=[0.0, 0.0])
    solver = FBstabDense(2, 0, 2)
    solver.update_options(_options())
    x1, out1 = solver.solve(data)
    x2, out2 = solver.solve(data, x0=x1)

    assert int(out2.eflag) == ExitFlag.SUCCESS
    assert int(out2.newton_iters) <= int(out1.newton_iters)
    assert int(out2.prox_iters) == 0
    np.testing.assert_allclose(np.asarray(x2.z), np.asarray(x1.z), atol=1e-10)
