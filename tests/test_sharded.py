"""Sharded batch solving on the 8-virtual-device CPU mesh (the cluster-free
multi-chip test pattern, SURVEY.md section 4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.models.dense_qp import DenseQPData, solve_dense_qp
from fbstab_tpu.models.mpc_qp import mpc_dims, solve_mpc_qp
from fbstab_tpu.options import Options
from fbstab_tpu.parallel.sharded import (
    batch_stats,
    make_mesh,
    shard_batch,
    sharded_dense_solver,
    sharded_mpc_solver,
)
from fbstab_tpu.solver_out import ExitFlag


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_mesh()


def _tile(tree, B):
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), tree)


class TestShardedMpc:
    def test_batch_matches_single(self, mesh):
        """16 double-integrator instances with varying x0 sharded over 8
        devices agree with per-instance single solves."""
        B = 16
        data, _ = ocp_fixtures.double_integrator(5)
        batch = _tile(data, B)
        # Keep x0 inside the reachable feasible set (state box [0, 2]).
        x0s = jnp.stack([
            jnp.array([0.05 * i, 0.01 * i]) for i in range(B)])
        batch = batch._replace(x0=x0s)

        N, nx, nu, nc = mpc_dims(data)
        nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
        z0 = jnp.zeros((B, nz))
        l0 = jnp.zeros((B, nl))
        v0 = jnp.zeros((B, nv))

        opts = Options(abs_tol=1e-8)
        solver = sharded_mpc_solver(mesh, opts)
        args = shard_batch(mesh, (batch, z0, l0, v0))
        x, core, stats = solver(*args)

        assert int(stats.num_success) == B
        assert int(stats.num_failed) == 0
        assert float(stats.max_residual) <= 1e-6

        # Spot-check instance 3 against a single solve.
        i = 3
        single = jax.tree.map(lambda a: a[i], batch)
        xs, outs = jax.jit(
            lambda d, z, l, v: solve_mpc_qp(d, z, l, v, opts)
        )(single, z0[i], l0[i], v0[i])
        np.testing.assert_allclose(x.z[i], xs.z, atol=1e-9)
        np.testing.assert_allclose(x.v[i], xs.v, atol=1e-9)

    def test_output_sharding(self, mesh):
        """Solver outputs stay sharded over the mesh (no implicit gather)."""
        B = 8
        data, _ = ocp_fixtures.double_integrator(3)
        batch = _tile(data, B)
        N, nx, nu, nc = mpc_dims(data)
        nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
        solver = sharded_mpc_solver(mesh, Options())
        args = shard_batch(
            mesh, (batch, jnp.zeros((B, nz)), jnp.zeros((B, nl)),
                   jnp.zeros((B, nv))))
        x, core, stats = solver(*args)
        assert len(x.z.sharding.device_set) == 8


class TestShardedDense:
    def test_mixed_feasible_infeasible_batch(self, mesh):
        """A batch mixing feasible and primal-infeasible instances produces
        per-instance exit flags (the reference can only report one problem
        at a time; batched status is the TPU extension, SURVEY.md sec 5)."""
        B = 8
        # Feasible: min z^2 s.t. z <= 1. Infeasible variant: z <= -1, -z <= -2
        # (z >= 2), mirroring fbstab_dense_unit_tests.cc:195-217.
        H = jnp.broadcast_to(jnp.eye(2), (B, 2, 2))
        f = jnp.zeros((B, 2))
        G = jnp.zeros((B, 0, 2))
        h = jnp.zeros((B, 0))
        A = jnp.broadcast_to(
            jnp.array([[1.0, 0.0], [-1.0, 0.0]]), (B, 2, 2))
        infeasible = (jnp.arange(B) % 2).astype(bool)
        b_feas = jnp.array([1.0, 1.0])
        b_infeas = jnp.array([-1.0, -2.0])
        b = jnp.where(infeasible[:, None], b_infeas, b_feas)
        data = DenseQPData(H=H, f=f, G=G, h=h, A=A, b=b)

        solver = sharded_dense_solver(mesh, Options(abs_tol=1e-8))
        args = shard_batch(
            mesh, (data, jnp.zeros((B, 2)), jnp.zeros((B, 0)),
                   jnp.zeros((B, 2))))
        x, core, stats = solver(*args)

        eflags = np.asarray(core.eflag)
        assert (eflags[~np.asarray(infeasible)] == ExitFlag.SUCCESS).all()
        assert (eflags[np.asarray(infeasible)]
                == ExitFlag.PRIMAL_INFEASIBLE).all()
        assert int(stats.num_success) == B // 2
        assert int(stats.num_infeasible) == B // 2
