"""MPC path tests.

Mirrors the reference's behavioral contract:
 - fbstab/test/fbstab_mpc_unit_tests.cc — five end-to-end solves at
   abs_tol=1e-8, including the MATLAB quadprog oracle on the N=2 double
   integrator (:37-47),
 - fbstab/components/test/mpc_component_unit_tests.h — matrix-free operator
   checks (here against an explicit materialization, which subsumes the
   hand-computed oracles) and the algebraic KKT identity on the Riccati
   Newton step (:386-461).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbstab_tpu.core.variable import Variable
from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.models.mpc_qp import (
    MPC_OPS,
    FBstabMpc,
    MpcQPData,
    mpc_dims,
    solve_mpc_qp,
)
from fbstab_tpu.options import Options
from fbstab_tpu.solver_out import ExitFlag


def materialize(d: MpcQPData):
    """Builds the explicit (H, f, G, h, A, b) for an MPC QP, the form the
    matrix-free ops implicitly represent (mpc_data.h:29-41)."""
    N, nx, nu, nc = mpc_dims(d)
    ns = nx + nu
    nz, nl, nv = (N + 1) * ns, (N + 1) * nx, (N + 1) * nc

    H = np.zeros((nz, nz))
    A_mat = np.zeros((nv, nz))
    G = np.zeros((nl, nz))
    for i in range(N + 1):
        zi = i * ns
        Qi, Ri, Si = np.array(d.Q[i]), np.array(d.R[i]), np.array(d.S[i])
        H[zi:zi + nx, zi:zi + nx] = Qi
        H[zi:zi + nx, zi + nx:zi + ns] = Si.T
        H[zi + nx:zi + ns, zi:zi + nx] = Si
        H[zi + nx:zi + ns, zi + nx:zi + ns] = Ri
        A_mat[i * nc:(i + 1) * nc, zi:zi + nx] = np.array(d.E[i])
        A_mat[i * nc:(i + 1) * nc, zi + nx:zi + ns] = np.array(d.L[i])

    G[0:nx, 0:nx] = -np.eye(nx)
    for i in range(1, N + 1):
        zi, zp = i * ns, (i - 1) * ns
        G[i * nx:(i + 1) * nx, zp:zp + nx] = np.array(d.A[i - 1])
        G[i * nx:(i + 1) * nx, zp + nx:zp + ns] = np.array(d.B[i - 1])
        G[i * nx:(i + 1) * nx, zi:zi + nx] = -np.eye(nx)

    f = np.concatenate(
        [np.concatenate([d.q[i], d.r[i]]) for i in range(N + 1)])
    h = -np.concatenate([np.array(d.x0)] +
                        [np.array(d.c[i]) for i in range(N)])
    b = -np.array(d.d).reshape(-1)
    return H, f, G, h, A_mat, b


def random_mpc(key, N=5, nx=3, nu=2, nc=4):
    """A random strictly-convex MPC QP with nonzero S, c, and all blocks."""
    ks = jax.random.split(key, 12)
    rn = lambda k, sh: jax.random.normal(k, sh, dtype=jnp.float64)
    Qr = rn(ks[0], (N + 1, nx, nx))
    Q = jnp.einsum("sij,skj->sik", Qr, Qr) / nx + 2.0 * jnp.eye(nx)
    Rr = rn(ks[1], (N + 1, nu, nu))
    R = jnp.einsum("sij,skj->sik", Rr, Rr) / nu + 2.0 * jnp.eye(nu)
    S = 0.1 * rn(ks[2], (N + 1, nu, nx))
    return MpcQPData(
        Q=Q, R=R, S=S,
        q=rn(ks[3], (N + 1, nx)), r=rn(ks[4], (N + 1, nu)),
        A=0.5 * rn(ks[5], (N, nx, nx)), B=rn(ks[6], (N, nx, nu)),
        c=rn(ks[7], (N, nx)),
        E=rn(ks[8], (N + 1, nc, nx)), L=rn(ks[9], (N + 1, nc, nu)),
        d=rn(ks[10], (N + 1, nc)) - 1.0,
        x0=rn(ks[11], (nx,)))


class TestMatrixFreeOps:
    """Matrix-free gemv/forcing ops vs. explicit materialization (stronger
    than the hand oracles in mpc_component_unit_tests.h:99-272)."""

    @pytest.fixture(scope="class")
    def prob(self):
        d = random_mpc(jax.random.PRNGKey(0))
        return d, materialize(d)

    def test_gemvH(self, prob):
        d, (H, *_), = prob
        x = np.linspace(-1, 1, H.shape[0])
        np.testing.assert_allclose(
            MPC_OPS.gemvH(d, jnp.asarray(x)), H @ x, atol=1e-12)

    def test_gemvA_and_AT(self, prob):
        d, (_, _, _, _, A_mat, _) = prob
        x = np.linspace(-1, 1, A_mat.shape[1])
        v = np.linspace(1, -1, A_mat.shape[0])
        np.testing.assert_allclose(
            MPC_OPS.gemvA(d, jnp.asarray(x)), A_mat @ x, atol=1e-12)
        np.testing.assert_allclose(
            MPC_OPS.gemvAT(d, jnp.asarray(v)), A_mat.T @ v, atol=1e-12)

    def test_gemvG_and_GT(self, prob):
        d, (_, _, G, _, _, _) = prob
        x = np.linspace(-1, 1, G.shape[1])
        l = np.linspace(1, -1, G.shape[0])
        np.testing.assert_allclose(
            MPC_OPS.gemvG(d, jnp.asarray(x)), G @ x, atol=1e-12)
        np.testing.assert_allclose(
            MPC_OPS.gemvGT(d, jnp.asarray(l)), G.T @ l, atol=1e-12)

    def test_forcing_vectors(self, prob):
        d, (_, f, _, h, _, b) = prob
        np.testing.assert_allclose(MPC_OPS.f_vec(d), f, atol=1e-14)
        np.testing.assert_allclose(MPC_OPS.h_vec(d), h, atol=1e-14)
        np.testing.assert_allclose(MPC_OPS.b_vec(d), b, atol=1e-14)
        np.testing.assert_allclose(
            MPC_OPS.forcing_norm(d),
            np.sqrt(f @ f + h @ h + b @ b), atol=1e-12)


class TestRiccatiKKTIdentity:
    """Plug the Riccati Newton step back into the Newton system and demand
    ~1e-9 — validates the factorization without trusting it (the reference's
    best test pattern, mpc_component_unit_tests.h:386-461)."""

    def test_kkt_identity(self):
        d = random_mpc(jax.random.PRNGKey(7), N=8, nx=4, nu=3, nc=5)
        N, nx, nu, nc = mpc_dims(d)
        nz = (N + 1) * (nx + nu)
        nl = (N + 1) * nx
        nv = (N + 1) * nc

        key = jax.random.PRNGKey(3)
        kz, kl, kv, ky, kr1, kr2, kr3 = jax.random.split(key, 7)
        rn = lambda k, n: jax.random.normal(k, (n,), dtype=jnp.float64)
        x = Variable(z=rn(kz, nz), l=rn(kl, nl),
                     v=jnp.abs(rn(kv, nv)), y=rn(ky, nv))
        xbar = x
        sigma, alpha = 1e-4, 0.95

        fact = MPC_OPS.factor(d, x, xbar, sigma, alpha)
        assert bool(MPC_OPS.factor_ok(fact))

        rz, rl, rv = rn(kr1, nz), rn(kr2, nl), rn(kr3, nv)
        dx = MPC_OPS.newton_solve(d, fact, rz, rl, rv)

        # (H + sigma*I) dz + G' dl + A' dv == rz
        lhs_z = (MPC_OPS.gemvH(d, dx.z) + sigma * dx.z
                 + MPC_OPS.gemvGT(d, dx.l) + MPC_OPS.gemvAT(d, dx.v))
        np.testing.assert_allclose(lhs_z, rz, atol=1e-9)

        # -G dz + sigma dl == rl
        lhs_l = -MPC_OPS.gemvG(d, dx.z) + sigma * dx.l
        np.testing.assert_allclose(lhs_l, rl, atol=1e-9)

        # mus .* dv - gamma .* (A dz) == rv
        Adz = MPC_OPS.gemvA(d, dx.z)
        np.testing.assert_allclose(
            fact.mus * dx.v - fact.gamma * Adz, rv, atol=1e-9)

        # dy = b - A dz
        np.testing.assert_allclose(dx.y, MPC_OPS.b_vec(d) - Adz, atol=1e-9)


def _solve_fixture(data, abs_tol=1e-8):
    opts = Options(abs_tol=abs_tol)
    N, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    z0 = jnp.zeros(nz, jnp.float64)
    l0 = jnp.zeros(nl, jnp.float64)
    v0 = jnp.zeros(nv, jnp.float64)
    return jax.jit(
        lambda d, z, l, v: solve_mpc_qp(d, z, l, v, opts)
    )(data, z0, l0, v0)


class TestMpcIntegration:
    """End-to-end solves (fbstab_mpc_unit_tests.cc)."""

    def test_double_integrator_oracle(self):
        """N=2 double integrator vs. the MATLAB quadprog oracle
        (fbstab_mpc_unit_tests.cc:37-47), componentwise to 1e-8."""
        data, _ = ocp_fixtures.double_integrator(2)
        x, out = _solve_fixture(data)
        assert int(out.eflag) == ExitFlag.SUCCESS
        assert float(out.residual) <= 1e-6

        zopt = np.array([
            -5.31028204670497e-14, 5.02854354118183e-13, 0.311688311338095,
            5.35637944798588e-13, 0.311688311339015, -0.0779220779990502,
            0.311688311339667, 0.233766233340057, -0.103896103779874])
        lopt = np.array([
            -5.24675324688535, -4.49350649223710, -3.55844155822323,
            -0.935064934014372, -1.48051948022526, 0.233766233996585])
        vopt = np.array([
            1.06213597221667e-13, -1.41190425869539e-21, 0, 0, 0, 0,
            -1.50393600622818e-21, -8.75144622575045e-10, 0, 0, 0, 0,
            -8.75144611157041e-10, -6.56358459377444e-10, 0, 0, 0, 0])

        np.testing.assert_allclose(x.z, zopt, atol=1e-8)
        np.testing.assert_allclose(x.l, lopt, atol=1e-8)
        np.testing.assert_allclose(x.v, vopt, atol=1e-8)

    @pytest.mark.parametrize("builder,N", [
        (ocp_fixtures.double_integrator, 20),
        (ocp_fixtures.servo_motor, 25),
        (ocp_fixtures.spacecraft_relative_motion, 40),
        (ocp_fixtures.copolymerization_reactor, 80),
    ])
    def test_benchmark_success(self, builder, N):
        """Long-horizon benchmark problems solve to SUCCESS with residual
        <= 1e-6 (fbstab_mpc_unit_tests.cc:62-148)."""
        data, _ = builder(N)
        x, out = _solve_fixture(data)
        assert int(out.eflag) == ExitFlag.SUCCESS, (
            f"eflag={int(out.eflag)} residual={float(out.residual)}")
        assert float(out.residual) <= 1e-6

    def test_facade_and_warmstart(self):
        """FBstabMpc facade: cold solve then warmstarted resolve converges
        in fewer Newton iterations (the MPC workflow, README.md:20)."""
        data, _ = ocp_fixtures.servo_motor(10)
        solver = FBstabMpc(N=10, nx=4, nu=1, nc=4)
        opts = Options(abs_tol=1e-8)
        solver.update_options(opts)
        x, out = solver.solve(data)
        assert int(out.eflag) == ExitFlag.SUCCESS
        x2, out2 = solver.solve(data, x0=x)
        assert int(out2.eflag) == ExitFlag.SUCCESS
        assert int(out2.newton_iters) <= int(out.newton_iters)

    def test_dense_mpc_agreement(self):
        """The MPC path and the dense path solve the same materialized QP to
        the same solution (cross-solver consistency check; no reference
        counterpart but implied by mpc_data.h:29-41)."""
        from fbstab_tpu.models.dense_qp import dense_qp_data, solve_dense_qp

        data, _ = ocp_fixtures.double_integrator(4)
        H, f, G, h, A_mat, b = materialize(data)
        ddata = dense_qp_data(H=H, f=f, G=G, h=h, A=A_mat, b=b)

        x_mpc, out_mpc = _solve_fixture(data)
        nz = H.shape[0]
        opts = Options(abs_tol=1e-8)
        x_dense, out_dense = jax.jit(
            lambda d, z, l, v: solve_dense_qp(d, z, l, v, opts)
        )(ddata, jnp.zeros(nz), jnp.zeros(G.shape[0]),
          jnp.zeros(A_mat.shape[0]))

        assert int(out_mpc.eflag) == ExitFlag.SUCCESS
        assert int(out_dense.eflag) == ExitFlag.SUCCESS
        np.testing.assert_allclose(x_mpc.z, x_dense.z, atol=1e-6)
        np.testing.assert_allclose(x_mpc.l, x_dense.l, atol=1e-6)
        np.testing.assert_allclose(x_mpc.v, x_dense.v, atol=1e-6)
