"""Batched facades (FBstabDenseBatch / FBstabMpcBatch): the reference's
five dense integration behaviors (fbstab_dense_unit_tests.cc:28-256) in
ONE batch through the construct-once facade, plus warmstart carry, stats,
refinement engagement and the MPC carry path (VERDICT r2 item 4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fbstab_tpu.models.batch_facade import FBstabDenseBatch, FBstabMpcBatch
from fbstab_tpu.models.dense_qp import DenseQPData
from fbstab_tpu.options import Options
from fbstab_tpu.solver_out import ExitFlag


def _five_reference_qps():
    """The five reference dense QPs padded to a common shape
    (nz=2, nl=1, nv=5) with vacuous rows (0'z <= 1 and 0'z = 0)."""
    nz, nl, nv = 2, 1, 5
    H = np.zeros((5, nz, nz))
    f = np.zeros((5, nz))
    G = np.zeros((5, nl, nz))
    h = np.zeros((5, nl))
    A = np.zeros((5, nv, nz))
    b = np.ones((5, nv))          # vacuous: 0'z <= 1

    # 1. FeasibleQP (:28-61): z* = (0,-5), v* = (5,0).
    H[0] = [[3, 1], [1, 1]]
    f[0] = [10, 5]
    A[0, :2] = [[-1, 0], [0, 1]]
    b[0, :2] = 0
    # 2. FeasibleQPwithEQ (:75-104): z* = (0.25, 0.75).
    H[1] = [[4, 1], [1, 2]]
    f[1] = [1, 1]
    G[1, 0] = [1, 1]
    h[1, 0] = 1
    A[1, :2] = [[-1, 0], [0, -1]]
    b[1, :2] = 0
    # 3. DegenerateQP (:121-177): solution set {1} x [1,3].
    H[2] = [[1, 0], [0, 0]]
    f[2] = [1, 0]
    A[2] = [[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]]
    b[2] = [0, 3, 3, -1, -1]
    # 4. InfeasibleQP (:195-217).
    H[3] = [[1, 0], [0, 0]]
    f[3] = [1, -1]
    A[3] = [[1, 1], [1, 0], [0, 1], [-1, 0], [0, -1]]
    b[3] = [0, 3, 3, -1, -1]
    # 5. UnboundedQP (:233-256).
    H[4] = [[1, 0], [0, 0]]
    f[4] = [1, -1]
    A[4, :4] = [[0, 0], [1, 0], [-1, 0], [0, -1]]
    b[4, :4] = [0, 3, -1, -1]

    to = lambda a: jnp.asarray(a, jnp.float64)
    return DenseQPData(H=to(H), f=to(f), G=to(G), h=to(h), A=to(A),
                       b=to(b))


def test_five_reference_behaviors_in_one_batch():
    data = _five_reference_qps()
    solver = FBstabDenseBatch(B=5, nz=2, nl=1, nv=5, dtype=jnp.float64,
                              options=Options(abs_tol=1e-8))
    x, out, stats = solver.solve(data)

    ef = np.asarray(out.eflag)
    assert ef[0] == int(ExitFlag.SUCCESS)
    assert ef[1] == int(ExitFlag.SUCCESS)
    assert ef[2] == int(ExitFlag.SUCCESS)
    assert ef[3] == int(ExitFlag.PRIMAL_INFEASIBLE)
    assert ef[4] == int(ExitFlag.DUAL_INFEASIBLE)

    z = np.asarray(x.z)
    np.testing.assert_allclose(z[0], [0.0, -5.0], atol=1e-8)
    np.testing.assert_allclose(np.asarray(x.v)[0, :2], [5.0, 0.0],
                               atol=1e-8)
    np.testing.assert_allclose(z[1], [0.25, 0.75], atol=1e-8)
    np.testing.assert_allclose(z[2][0], 1.0, atol=1e-8)
    assert 1.0 - 1e-8 <= z[2][1] <= 3.0 + 1e-8
    # Degenerate lane KKT identity at 1e-6 (the reference's check).
    H2 = np.asarray(data.H)[2]
    r1 = H2 @ z[2] + np.asarray(data.f)[2] \
        + np.asarray(data.A)[2].T @ np.asarray(x.v)[2]
    r2 = np.minimum(np.asarray(x.y)[2], np.asarray(x.v)[2])
    assert np.linalg.norm(r1) + np.linalg.norm(r2) <= 1e-6

    assert int(stats.num_success) == 3
    assert int(stats.num_infeasible) == 2
    assert int(stats.num_failed) == 0


def test_warmstart_carry_across_calls():
    data = _five_reference_qps()
    solver = FBstabDenseBatch(B=5, nz=2, nl=1, nv=5, dtype=jnp.float64,
                              options=Options(abs_tol=1e-8))
    x1, out1, _ = solver.solve(data)
    x2, out2, _ = solver.solve(data)      # carried from x1 automatically

    ok = np.asarray(out1.eflag) == int(ExitFlag.SUCCESS)
    n1, n2 = np.asarray(out1.newton_iters), np.asarray(out2.newton_iters)
    assert np.all(n2[ok] <= n1[ok])
    assert np.all(np.asarray(out2.prox_iters)[ok] == 0)
    np.testing.assert_allclose(np.asarray(x2.z)[ok], np.asarray(x1.z)[ok],
                               atol=1e-10)

    solver.reset_warmstart()
    x3, out3, _ = solver.solve(data)
    np.testing.assert_array_equal(np.asarray(out3.newton_iters), n1)


def test_f32_facade_refines_by_default(monkeypatch):
    """The f32 facade default engages refinement: VariableDF solution,
    verified residual in `out.residual`, raw f32 value kept."""
    import fbstab_tpu.models.dense_qp as dense
    from bench import build_dense_batch
    from fbstab_tpu.models.refine import VariableDF

    monkeypatch.setattr(dense, "PALLAS_MODE", "off")
    B = 16
    data, _, _, _ = build_dense_batch(B, 8, 12, jnp.float32)
    solver = FBstabDenseBatch(B=B, nz=8, nl=0, nv=12)
    assert solver.options.refine_steps == 48
    x, out, stats = solver.solve(data)
    assert isinstance(x, VariableDF)
    assert np.all(np.asarray(out.eflag) == 0)
    assert np.median(np.asarray(out.residual)) \
        < np.median(np.asarray(out.raw_residual))
    assert int(stats.num_success) == B

    # Carry works off the hi view.
    x2, out2, _ = solver.solve(data)
    assert np.all(np.asarray(out2.newton_iters)
                  <= np.asarray(out.newton_iters))


def test_mpc_batch_facade_quickstart(monkeypatch):
    """The 3-line batched MPC workflow: construct, solve, re-solve with
    the shifted warmstart carry."""
    import fbstab_tpu.models.mpc_qp as mpc
    from bench import build_batch
    from fbstab_tpu.models.refine import VariableDF

    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    B, N, nx, nu, nc = 8, 10, 4, 2, 4
    data, _, _, _ = build_batch(B, N, nx, nu, nc, jnp.float32)
    solver = FBstabMpcBatch(B=B, N=N, nx=nx, nu=nu, nc=nc)
    x, out, stats = solver.solve(data)
    assert isinstance(x, VariableDF)
    assert int(stats.num_success) == B

    # Next control step: new x0, automatic shifted warmstart.
    data2 = data._replace(x0=data.x0 * 0.9)
    x2, out2, stats2 = solver.solve(data2)
    assert int(stats2.num_success) == B
    assert (np.asarray(out2.newton_iters).mean()
            <= np.asarray(out.newton_iters).mean())


def test_shape_validation():
    data = _five_reference_qps()
    solver = FBstabDenseBatch(B=4, nz=2, nl=1, nv=5, dtype=jnp.float64)
    try:
        solver.solve(data)
    except ValueError as e:
        assert "shape" in str(e)
    else:
        raise AssertionError("expected a shape ValueError")
