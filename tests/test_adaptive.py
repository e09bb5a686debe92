"""Two-phase adaptive batch solving tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from fbstab_tpu.models.dense_qp import DENSE_OPS, DenseQPData
from fbstab_tpu.models.mpc_qp import MPC_OPS, mpc_dims
from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.options import Options
from fbstab_tpu.parallel.adaptive import solve_batch_adaptive
from fbstab_tpu.solver_out import ExitFlag


def test_adaptive_matches_oneshot_dense():
    """Random dense batch: two-phase result converges everywhere and
    matches a full-budget one-shot solve."""
    B, n, q = 16, 8, 12
    rng = np.random.default_rng(0)
    M = rng.standard_normal((B, n, n))
    H = M @ np.transpose(M, (0, 2, 1)) / n + np.eye(n)
    data = DenseQPData(
        H=jnp.asarray(H), f=jnp.asarray(rng.standard_normal((B, n))),
        G=jnp.zeros((B, 0, n)), h=jnp.zeros((B, 0)),
        A=jnp.asarray(rng.standard_normal((B, q, n))),
        b=jnp.asarray(np.abs(rng.standard_normal((B, q))) + 0.5))
    z0 = jnp.zeros((B, n))
    l0 = jnp.zeros((B, 0))
    v0 = jnp.zeros((B, q))
    opts = Options(abs_tol=1e-8)

    x, core = solve_batch_adaptive(
        DENSE_OPS, data, z0, l0, v0, opts,
        phase1_newton_iters=4, pad_multiple=4)
    assert (np.asarray(core.eflag) == ExitFlag.SUCCESS).all()

    from fbstab_tpu.models.dense_qp import solve_dense_qp_batch
    x_ref, core_ref = solve_dense_qp_batch(data, z0, l0, v0, opts)
    np.testing.assert_allclose(x.z, x_ref.z, atol=1e-6)


def test_adaptive_preserves_infeasibility_flags():
    """Infeasible instances detected in phase 1 are not retried."""
    data, _ = ocp_fixtures.double_integrator(3)
    B = 4
    batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
    # Instances 1, 3 infeasible (stage-1 position below 0 unreachably).
    x0s = jnp.asarray([[0.1, 0.0], [-1.0, 0.0], [0.2, 0.0], [-2.0, 0.0]])
    batch = batch._replace(x0=x0s)
    N, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc

    x, core = solve_batch_adaptive(
        MPC_OPS, batch, jnp.zeros((B, nz)), jnp.zeros((B, nl)),
        jnp.zeros((B, nv)), Options(abs_tol=1e-8),
        phase1_newton_iters=30, pad_multiple=2)
    ef = np.asarray(core.eflag)
    assert ef[0] == ExitFlag.SUCCESS
    assert ef[2] == ExitFlag.SUCCESS
    assert ef[1] == ExitFlag.PRIMAL_INFEASIBLE
    assert ef[3] == ExitFlag.PRIMAL_INFEASIBLE
