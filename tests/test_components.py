"""Component-level numeric oracles revived from the reference's disabled
unit tests (fbstab/components/test/dense_unit_tests.h, disabled at
components/BUILD.bazel:112-144 — SURVEY.md section 4.2 flags their oracles
as worth keeping).

Fixture QP (dense_unit_tests.h:39-42):
  H = [[3,1],[1,1]], f = [1,6], A = [[-1,0],[0,1]], b = [0,-1], no
  equalities.
"""

import jax.numpy as jnp
import numpy as np

from fbstab_tpu.core.residuals import inner_residual, natural_residual
from fbstab_tpu.core.variable import Variable, fill_like, var_axpy
from fbstab_tpu.core.feasibility import check_feasibility
from fbstab_tpu.models.dense_qp import DENSE_OPS, dense_qp_data


def fixture():
    return dense_qp_data(
        H=[[3.0, 1.0], [1.0, 1.0]], f=[1.0, 6.0],
        A=[[-1.0, 0.0], [0.0, 1.0]], b=[0.0, -1.0])


def make_var(d, z, v):
    z = jnp.asarray(z, jnp.float64)
    v = jnp.asarray(v, jnp.float64)
    l = jnp.zeros((0,), jnp.float64)
    y = DENSE_OPS.b_vec(d) - DENSE_OPS.gemvA(d, z)
    return Variable(z=z, l=l, v=v, y=y)


def test_variable_margin_and_axpy():
    """y = b - A z after fill, and axpy preserves the margin identity
    (dense_unit_tests.h DenseVariableTests)."""
    d = fixture()
    x = fill_like(make_var(d, [0, 0], [0, 0]), 1.0,
                  DENSE_OPS.b_vec(d), lambda z: DENSE_OPS.gemvA(d, z))
    np.testing.assert_allclose(
        x.y, np.asarray(d.b) - np.asarray(d.A) @ np.asarray(x.z), atol=0)

    y = fill_like(x, -1.0, DENSE_OPS.b_vec(d),
                  lambda z: DENSE_OPS.gemvA(d, z))
    a = 0.35
    out = var_axpy(a, x, y, DENSE_OPS.b_vec(d))
    z_exp = a * np.asarray(x.z) + np.asarray(y.z)
    np.testing.assert_allclose(out.z, z_exp, atol=1e-15)
    np.testing.assert_allclose(out.v, a * np.asarray(x.v) + np.asarray(y.v),
                               atol=1e-15)
    np.testing.assert_allclose(
        out.y, np.asarray(d.b) - np.asarray(d.A) @ z_exp, atol=1e-15)


def test_inner_residual_oracle():
    """Hand-computed inner residual values to 1e-14
    (dense_unit_tests.h InnerResidualCalculation):
    x.z=(1,5), x.v=(0.4,2), xbar.z=(-5,6), xbar.v=(-9,1), sigma=0.5,
    alpha=0.95 -> rz=(11.6,13.5), rv=(0.480683041678573,-8.88473245759182).
    """
    d = fixture()
    x = make_var(d, [1.0, 5.0], [0.4, 2.0])
    xbar = make_var(d, [-5.0, 6.0], [-9.0, 1.0])
    r = inner_residual(DENSE_OPS, d, x, xbar, 0.5, 0.95)
    np.testing.assert_allclose(r.z, [11.6, 13.5], atol=1e-14)
    np.testing.assert_allclose(
        r.v, [0.480683041678573, -8.88473245759182], atol=1e-14)


def test_natural_residual_oracle():
    """rz=(8.6,14.0), rv=(0.4,-6) (dense_unit_tests.h
    NaturalResidualCalculation)."""
    d = fixture()
    x = make_var(d, [1.0, 5.0], [0.4, 2.0])
    r = natural_residual(DENSE_OPS, d, x)
    np.testing.assert_allclose(r.z, [8.6, 14.0], atol=1e-14)
    np.testing.assert_allclose(r.v, [0.4, -6.0], atol=1e-14)


def test_dense_newton_system_identity():
    """Plug (dz, dv) back into [Hs A'; -CA D] dx = r and demand 1e-12
    (dense_unit_tests.h LinearSolverResidual)."""
    d = fixture()
    x = make_var(d, [1.0, 5.0], [0.4, 2.0])
    xbar = make_var(d, [-5.0, 6.0], [-9.0, 1.0])
    sigma, alpha = 0.5, 0.95

    fact = DENSE_OPS.factor(d, x, xbar, sigma, alpha)
    rz = jnp.ones(2)
    rl = jnp.zeros(0)
    rv = jnp.ones(2)
    dx = DENSE_OPS.newton_solve(d, fact, rz, rl, rv)

    H = np.asarray(d.H)
    A = np.asarray(d.A)
    Hs = H + sigma * np.eye(2)
    C = np.diag(np.asarray(fact.gamma))
    D = np.diag(np.asarray(fact.mus))
    K = np.block([[Hs, A.T], [-C @ A, D]])
    sol = np.concatenate([np.asarray(dx.z), np.asarray(dx.v)])
    rhs = np.concatenate([np.asarray(rz), np.asarray(rv)])
    assert np.linalg.norm(K @ sol - rhs) < 1e-12


def test_primal_infeasibility_certificate():
    """v = (1,0,0,1,1) certifies primal infeasibility of the paper's
    example QP (dense_unit_tests.h PrimalInfeasibilityDetection,
    arXiv:1901.04046)."""
    d = dense_qp_data(
        H=[[1.0, 0.0], [0.0, 0.0]], f=[1.0, -1.0],
        A=[[1, 1], [1, 0], [0, 1], [-1, 0], [0, -1]],
        b=[0.0, 3.0, 3.0, -1.0, -1.0])
    dx = make_var(d, [0.0, 0.0], [1.0, 0.0, 0.0, 1.0, 1.0])
    feas = check_feasibility(DENSE_OPS, d, dx, 1e-8)
    assert bool(feas.dual_feasible)
    assert not bool(feas.primal_feasible)


def test_dual_infeasibility_certificate():
    """z = (0,1) is a direction of unbounded descent
    (dense_unit_tests.h DualInfeasibilityDetection, arXiv:1901.04046)."""
    d = dense_qp_data(
        H=[[1.0, 0.0], [0.0, 0.0]], f=[1.0, -1.0],
        A=[[0, 0], [1, 0], [-1, 0], [0, -1]],
        b=[0.0, 3.0, -1.0, -1.0])
    dx = make_var(d, [0.0, 1.0], [0.0, 0.0, 0.0, 0.0])
    feas = check_feasibility(DENSE_OPS, d, dx, 1e-8)
    assert not bool(feas.dual_feasible)
    assert bool(feas.primal_feasible)
