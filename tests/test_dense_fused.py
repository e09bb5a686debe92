"""Dense fused solver kernel vs. the XLA path (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import fbstab_tpu.models.dense_qp as dq
from fbstab_tpu.models.dense_qp import DenseQPData, solve_dense_qp_batch
from fbstab_tpu.ops.dense_solve_pallas import fbstab_dense_solve_fused
from fbstab_tpu.options import Options
from fbstab_tpu.solver_out import ExitFlag


def _mixed_batch(B=8, n=6, q=10):
    rng = np.random.default_rng(0)
    M = rng.standard_normal((B, n, n))
    H = M @ np.transpose(M, (0, 2, 1)) / n + np.eye(n)
    H[3, :, :] = 0.0
    H[3, 0, 0] = 1.0                      # rank-deficient instance
    f = rng.standard_normal((B, n))
    A = rng.standard_normal((B, q, n))
    b = np.abs(rng.standard_normal((B, q))) + 0.5
    data = DenseQPData(
        H=jnp.asarray(H), f=jnp.asarray(f),
        G=jnp.zeros((B, 0, n)), h=jnp.zeros((B, 0)),
        A=jnp.asarray(A), b=jnp.asarray(b))
    return data, jnp.zeros((B, n)), jnp.zeros((B, 0)), jnp.zeros((B, q))


def test_dense_fused_matches_reference(monkeypatch):
    monkeypatch.setattr(dq, "PALLAS_MODE", "off")
    jax.clear_caches()
    data, z0, l0, v0 = _mixed_batch()
    opts = Options(abs_tol=1e-8)
    x_ref, core_ref = solve_dense_qp_batch(data, z0, l0, v0, opts)
    x_f, core_f = fbstab_dense_solve_fused(
        data, z0, l0, v0, opts, interpret=True, tile_b=4)
    np.testing.assert_array_equal(core_f.eflag, core_ref.eflag)
    np.testing.assert_array_equal(core_f.newton_iters,
                                  core_ref.newton_iters)
    np.testing.assert_allclose(x_f.z, x_ref.z, atol=1e-9)
    np.testing.assert_allclose(x_f.v, x_ref.v, atol=1e-9)


def test_dense_fused_infeasible_flags(monkeypatch):
    """Infeasible + unbounded instances get the right flags through the
    kernel (mirrors fbstab_dense_unit_tests.cc:195-256)."""
    monkeypatch.setattr(dq, "PALLAS_MODE", "off")
    jax.clear_caches()
    # inst 0: feasible; inst 1: primal infeasible (z <= -1, -z <= -2);
    # inst 2: unbounded (x2 unconstrained, f2 < 0, H singular).
    H = jnp.stack([jnp.eye(2),
                   jnp.eye(2),
                   jnp.asarray([[1.0, 0.0], [0.0, 0.0]])])
    f = jnp.asarray([[1.0, 1.0], [0.0, 0.0], [1.0, -1.0]])
    A = jnp.stack([
        jnp.asarray([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]]),
        jnp.asarray([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]]),
        jnp.asarray([[1.0, 0.0], [-1.0, 0.0], [0.0, 0.0], [0.0, 0.0]])])
    b = jnp.asarray([[1.0, 1.0, 1.0, 1.0],
                     [-1.0, -2.0, 1.0, 1.0],
                     [3.0, -1.0, 1.0, 1.0]])
    data = DenseQPData(H=H, f=f, G=jnp.zeros((3, 0, 2)),
                       h=jnp.zeros((3, 0)), A=A, b=b)
    x, core = fbstab_dense_solve_fused(
        data, jnp.zeros((3, 2)), jnp.zeros((3, 0)), jnp.zeros((3, 4)),
        Options(abs_tol=1e-8), interpret=True, tile_b=4)
    ef = np.asarray(core.eflag)
    assert ef[0] == ExitFlag.SUCCESS
    assert ef[1] == ExitFlag.PRIMAL_INFEASIBLE
    assert ef[2] == ExitFlag.DUAL_INFEASIBLE


def test_dense_fused_equality_constraints(monkeypatch):
    """nl > 0: Schur-complement block solve inside the kernel matches the
    XLA path exactly (iteration counts and iterates)."""
    monkeypatch.setattr(dq, "PALLAS_MODE", "off")
    jax.clear_caches()
    B, n, q, nl = 8, 4, 6, 2
    rng = np.random.default_rng(0)
    M = rng.standard_normal((B, n, n))
    H = M @ np.transpose(M, (0, 2, 1)) / n + np.eye(n)
    data = DenseQPData(
        H=jnp.asarray(H),
        f=jnp.asarray(rng.standard_normal((B, n))),
        G=jnp.asarray(rng.standard_normal((B, nl, n))),
        h=jnp.asarray(0.1 * rng.standard_normal((B, nl))),
        A=jnp.asarray(rng.standard_normal((B, q, n))),
        b=jnp.asarray(np.abs(rng.standard_normal((B, q))) + 1.0))
    z0 = jnp.zeros((B, n))
    l0 = jnp.zeros((B, nl))
    v0 = jnp.zeros((B, q))
    opts = Options(abs_tol=1e-8)
    x_ref, core_ref = solve_dense_qp_batch(data, z0, l0, v0, opts)
    x_f, core_f = fbstab_dense_solve_fused(
        data, z0, l0, v0, opts, interpret=True, tile_b=4)
    np.testing.assert_array_equal(core_f.eflag, core_ref.eflag)
    np.testing.assert_array_equal(core_f.newton_iters,
                                  core_ref.newton_iters)
    np.testing.assert_allclose(x_f.z, x_ref.z, atol=1e-9)
    np.testing.assert_allclose(x_f.l, x_ref.l, atol=1e-9)
    np.testing.assert_allclose(x_f.v, x_ref.v, atol=1e-9)
