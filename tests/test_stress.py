"""Stress tests: Reliable profile on hard problems, infeasible MPC
instances, degenerate batches (SURVEY.md section 7 step 9)."""

import jax
import jax.numpy as jnp
import numpy as np

from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.models.dense_qp import dense_qp_data, solve_dense_qp
from fbstab_tpu.models.mpc_qp import mpc_dims, solve_mpc_qp
from fbstab_tpu.options import Options
from fbstab_tpu.solver_out import ExitFlag


def _solve_dense(data, opts):
    nz = data.H.shape[0]
    nl = data.G.shape[0]
    nv = data.A.shape[0]
    return jax.jit(
        lambda d, z, l, v: solve_dense_qp(d, z, l, v, opts)
    )(data, jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv))


def test_reliable_profile_on_ill_conditioned_qp():
    """A badly scaled rank-deficient QP solves under ReliableOptions
    (reference: ReliableParameters, fbstab_algorithm-impl.h:61-74)."""
    # Hessian with condition number 1e8 plus a zero eigenvalue direction.
    D = np.diag([1e4, 1e-4, 0.0])
    Q = np.array([[1.0, 0.5, 0.0], [0.5, 1.0, 0.5], [0.0, 0.5, 1.0]])
    H = Q @ D @ Q.T
    f = np.array([1.0, -2.0, 0.5])
    A = np.vstack([np.eye(3), -np.eye(3)])
    b = np.ones(6)
    data = dense_qp_data(H=H, f=f, A=A, b=b)
    x, out = _solve_dense(data, Options.reliable())
    assert int(out.eflag) == ExitFlag.SUCCESS
    # KKT check at the reliable tolerance.
    z = np.asarray(x.z)
    v = np.asarray(x.v)
    r = H @ z + f + A.T @ v
    assert np.linalg.norm(r) < 1e-3
    assert np.all(A @ z <= b + 1e-6)


def test_mpc_primal_infeasible_detected():
    """A double integrator with an unreachable hard state bound at stage 1
    is flagged PRIMAL_INFEASIBLE with the certificate in the output."""
    data, _ = ocp_fixtures.double_integrator(3)
    # x0 = (-1, 0): stage-1 position is x0_pos + x0_vel = -1, but the
    # constraint set demands x >= 0, and u cannot influence stage-1
    # position -> infeasible.
    data = data._replace(x0=jnp.array([-1.0, 0.0]))
    N, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    x, out = jax.jit(
        lambda d, z, l, v: solve_mpc_qp(d, z, l, v, Options(abs_tol=1e-8))
    )(data, jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv))
    assert int(out.eflag) == ExitFlag.PRIMAL_INFEASIBLE
    # The output carries the certificate (v, l), not a solution
    # (fbstab_algorithm-impl.h:209): check the Farkas conditions.
    from fbstab_tpu.models.mpc_qp import MPC_OPS
    vv, ll = x.v, x.l
    p1 = float(jnp.max(jnp.abs(
        MPC_OPS.gemvAT(data, vv) + MPC_OPS.gemvGT(data, ll))))
    p2 = float(MPC_OPS.h_vec(data) @ ll + MPC_OPS.b_vec(data) @ vv)
    u = max(float(jnp.max(jnp.abs(vv))), float(jnp.max(jnp.abs(ll))))
    assert p1 <= 1e-8 * u
    assert p2 < 0


def test_degenerate_batch_mixed_outcomes():
    """Batch of (solvable, degenerate, unbounded) QPs: per-instance flags."""
    H_ok = np.eye(2)
    H_deg = np.array([[1.0, 0.0], [0.0, 0.0]])  # rank deficient
    f_ok = np.array([1.0, 1.0])
    f_unb = np.array([1.0, -1.0])
    A_box = np.vstack([np.eye(2), -np.eye(2)])   # box |x| <= 1
    b_box = np.ones(4)
    # x2 unconstrained (zero rows are vacuous), f2 = -1 => unbounded below.
    A_unb = np.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 0.0], [0.0, 0.0]])
    b_unb = np.array([3.0, -1.0, 1.0, 1.0])

    Hs = jnp.stack([jnp.asarray(H_ok), jnp.asarray(H_deg),
                    jnp.asarray(H_deg)])
    fs = jnp.stack([jnp.asarray(f_ok), jnp.asarray(f_ok),
                    jnp.asarray(f_unb)])
    As = jnp.stack([jnp.asarray(A_box), jnp.asarray(A_box),
                    jnp.asarray(A_unb)])
    bs = jnp.stack([jnp.asarray(b_box), jnp.asarray(b_box),
                    jnp.asarray(b_unb)])
    from fbstab_tpu.models.dense_qp import DenseQPData, solve_dense_qp_batch
    data = DenseQPData(H=Hs, f=fs, G=jnp.zeros((3, 0, 2)),
                       h=jnp.zeros((3, 0)), A=As, b=bs)
    x, core = solve_dense_qp_batch(
        data, jnp.zeros((3, 2)), jnp.zeros((3, 0)), jnp.zeros((3, 4)),
        Options(abs_tol=1e-8))
    ef = np.asarray(core.eflag)
    assert ef[0] == ExitFlag.SUCCESS
    assert ef[1] == ExitFlag.SUCCESS          # degenerate but solvable
    assert ef[2] == ExitFlag.DUAL_INFEASIBLE  # unbounded below
    # Degenerate instance still satisfies its box and minimizes x2.
    np.testing.assert_allclose(np.asarray(x.z[1]), [-1.0, -1.0], atol=1e-6)
