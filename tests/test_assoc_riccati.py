"""Parallel (associative-scan) Riccati Newton-step solver tests.

Same contract as the sequential recursion: the KKT-identity pattern of
mpc_component_unit_tests.h:386-461 (plug the step back into the Newton
system), full-solve agreement with the scan path, and long-horizon
behavior that is the variant's reason to exist."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fbstab_tpu.models.mpc_qp as mpc
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.models.mpc_qp import (
    MPC_OPS,
    MPC_OPS_ASSOC,
    mpc_dims,
    solve_mpc_qp,
)
from fbstab_tpu.models.ocp_fixtures import (
    double_integrator,
    servo_motor,
)
from fbstab_tpu.options import Options
from fbstab_tpu.solver_out import ExitFlag

from test_mpc_solve import random_mpc


class TestAssocKKTIdentity:
    """The parallel solve must satisfy the same Newton system as the
    sequential recursion, to roundoff."""

    @pytest.mark.parametrize("dims", [(8, 4, 3, 5), (40, 3, 2, 4),
                                      (63, 5, 2, 6)])
    def test_kkt_identity(self, dims):
        N, nx, nu, nc = dims
        d = random_mpc(jax.random.PRNGKey(11), N=N, nx=nx, nu=nu, nc=nc)
        nz = (N + 1) * (nx + nu)
        nl = (N + 1) * nx
        nv = (N + 1) * nc

        key = jax.random.PRNGKey(5)
        kz, kl, kv, ky, kr1, kr2, kr3 = jax.random.split(key, 7)
        rn = lambda k, n: jax.random.normal(k, (n,), dtype=jnp.float64)
        x = Variable(z=rn(kz, nz), l=rn(kl, nl),
                     v=jnp.abs(rn(kv, nv)), y=rn(ky, nv))
        sigma, alpha = 1e-4, 0.95
        rz, rl, rv = rn(kr1, nz), rn(kr2, nl), rn(kr3, nv)

        dx, ok = mpc._assoc_newton_step(
            d, x, x, sigma, alpha, rz, rl, rv)
        assert bool(ok)
        gamma, mus, _ = mpc.pfb_weights(x.y, x.v, x.v, sigma, alpha)

        lhs_z = (MPC_OPS.gemvH(d, dx.z) + sigma * dx.z
                 + MPC_OPS.gemvGT(d, dx.l) + MPC_OPS.gemvAT(d, dx.v))
        np.testing.assert_allclose(lhs_z, rz, atol=1e-8)
        lhs_l = -MPC_OPS.gemvG(d, dx.z) + sigma * dx.l
        np.testing.assert_allclose(lhs_l, rl, atol=1e-8)
        Adz = MPC_OPS.gemvA(d, dx.z)
        np.testing.assert_allclose(mus * dx.v - gamma * Adz, rv,
                                   atol=1e-8)
        np.testing.assert_allclose(dx.y, MPC_OPS.b_vec(d) - Adz,
                                   atol=1e-8)

    def test_matches_sequential_step(self):
        """The two solvers compute the same algebraic solution; agreement
        is to roundoff (different operation order), not bitwise."""
        d = random_mpc(jax.random.PRNGKey(3), N=24, nx=4, nu=2, nc=4)
        N, nx, nu, nc = mpc_dims(d)
        nz = (N + 1) * (nx + nu)
        nl = (N + 1) * nx
        nv = (N + 1) * nc
        key = jax.random.PRNGKey(9)
        kz, kl, kv, ky, kr1, kr2, kr3 = jax.random.split(key, 7)
        rn = lambda k, n: jax.random.normal(k, (n,), dtype=jnp.float64)
        x = Variable(z=rn(kz, nz), l=rn(kl, nl),
                     v=jnp.abs(rn(kv, nv)), y=rn(ky, nv))
        sigma, alpha = 1e-6, 0.95
        rz, rl, rv = rn(kr1, nz), rn(kr2, nl), rn(kr3, nv)

        fact = MPC_OPS.factor(d, x, x, sigma, alpha)
        dx_seq = MPC_OPS.newton_solve(d, fact, rz, rl, rv)
        dx_par = MPC_OPS_ASSOC.newton_solve(d, fact, rz, rl, rv)
        scale = 1.0 + float(jnp.max(jnp.abs(dx_seq.z)))
        np.testing.assert_allclose(
            np.asarray(dx_par.z), np.asarray(dx_seq.z),
            atol=1e-7 * scale)
        np.testing.assert_allclose(
            np.asarray(dx_par.l), np.asarray(dx_seq.l),
            atol=1e-7 * scale / sigma ** 0.5)


class TestAssocFullSolve:
    def test_double_integrator_solution_parity(self):
        data, _ = double_integrator(20)
        N, nx, nu, nc = mpc_dims(data)
        nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
        z0 = jnp.zeros(nz)
        l0 = jnp.zeros(nl)
        v0 = jnp.zeros(nv)
        opts = Options(abs_tol=1e-9)
        xs, cs = solve_mpc_qp(data, z0, l0, v0, opts, riccati="scan")
        xa, ca = solve_mpc_qp(data, z0, l0, v0, opts, riccati="assoc")
        assert int(cs.eflag) == int(ExitFlag.SUCCESS)
        assert int(ca.eflag) == int(ExitFlag.SUCCESS)
        np.testing.assert_allclose(np.asarray(xa.z), np.asarray(xs.z),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(xa.v), np.asarray(xs.v),
                                   atol=1e-7)

    def test_servo_motor(self):
        data, _ = servo_motor(25)
        N, nx, nu, nc = mpc_dims(data)
        nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
        x, core = solve_mpc_qp(
            data, jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv),
            Options(abs_tol=1e-8), riccati="assoc")
        assert int(core.eflag) == int(ExitFlag.SUCCESS)
        assert float(core.residual) <= 1e-6

    def test_long_horizon_auto_dispatch(self):
        """N >= ASSOC_MIN_HORIZON uses the parallel path under 'auto';
        the solve converges to the contract tolerance."""
        N = max(mpc.ASSOC_MIN_HORIZON, mpc.ASSOC_MIN_HORIZON_TPU, 120)
        data, _ = double_integrator(N)
        _N, nx, nu, nc = mpc_dims(data)
        nz = (N + 1) * (nx + nu)
        nl = (N + 1) * nx
        nv = (N + 1) * nc
        assert mpc._pick_mpc_ops(data, "auto") is MPC_OPS_ASSOC
        x, core = solve_mpc_qp(
            data, jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv),
            Options(abs_tol=1e-8), riccati="auto")
        assert int(core.eflag) == int(ExitFlag.SUCCESS)
        assert float(core.residual) <= 1e-6

    def test_batched_assoc(self):
        """vmapped parallel path: mixed warmstarts, all converge and match
        the scan-path batch."""
        from bench import build_batch
        B = 6
        data, z0, l0, v0 = build_batch(B, 16, 4, 2, 4, jnp.float64)
        xs, cs = mpc.solve_mpc_qp_batch(
            data, z0, l0, v0, Options(abs_tol=1e-9), riccati="scan")
        xa, ca = mpc.solve_mpc_qp_batch(
            data, z0, l0, v0, Options(abs_tol=1e-9), riccati="assoc")
        assert np.all(np.asarray(cs.eflag) == int(ExitFlag.SUCCESS))
        assert np.all(np.asarray(ca.eflag) == int(ExitFlag.SUCCESS))
        np.testing.assert_allclose(np.asarray(xa.z), np.asarray(xs.z),
                                   atol=1e-6)
