"""Pallas Riccati kernel tests (interpreter mode on the CPU backend).

Validates the fused kernel against the sequential scan implementation:
once at the Newton-step level (exact recurrence parity) and once through
the full solver via the custom_vmap dispatch path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fbstab_tpu.models.mpc_qp as mpc
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.models.mpc_qp import MPC_OPS, mpc_dims
from fbstab_tpu.options import Options
from fbstab_tpu.ops.riccati_pallas import riccati_newton_step_batched
from tests.test_mpc_solve import random_mpc


def test_kernel_matches_scan_implementation():
    """Fused kernel vs. factor+solve on random data, f64, 1e-10."""
    B = 4
    key = jax.random.PRNGKey(0)
    ds = [random_mpc(k, N=6, nx=4, nu=2, nc=3)
          for k in jax.random.split(key, B)]
    data = jax.tree.map(lambda *a: jnp.stack(a), *ds)
    nz, nl, nv = 7 * 6, 7 * 4, 7 * 3
    kk = jax.random.split(jax.random.PRNGKey(1), 7)
    rn = lambda k, n: jax.random.normal(k, (B, n), dtype=jnp.float64)
    x = Variable(z=rn(kk[0], nz), l=rn(kk[1], nl),
                 v=jnp.abs(rn(kk[2], nv)), y=rn(kk[3], nv))
    rz, rl, rv = rn(kk[4], nz), rn(kk[5], nl), rn(kk[6], nv)
    sigma, alpha = 1e-4, 0.95

    def ref_step(d, xx, a, b, c):
        fact = MPC_OPS.factor(d, xx, xx, sigma, alpha)
        return MPC_OPS.newton_solve(d, fact, a, b, c)

    dx_ref = jax.vmap(ref_step)(data, x, rz, rl, rv)
    dz, dl, dv, dy = riccati_newton_step_batched(
        data, x.v, x.y, x.v, rz, rl, rv, sigma, alpha,
        interpret=True, tile_b=4)

    np.testing.assert_allclose(dz, dx_ref.z, atol=1e-10)
    np.testing.assert_allclose(dl, dx_ref.l, atol=1e-10)
    np.testing.assert_allclose(dv, dx_ref.v, atol=1e-10)
    np.testing.assert_allclose(dy, dx_ref.y, atol=1e-10)


def test_full_solve_through_kernel_dispatch(monkeypatch):
    """Batched solve with PALLAS_MODE=interpret routes the Newton step
    through the kernel and reproduces the scan-path solution."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "interpret")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    B = 4
    data, _ = ocp_fixtures.double_integrator(5)
    batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
    x0s = jnp.stack([jnp.array([0.05 * i, 0.01 * i]) for i in range(B)])
    batch = batch._replace(x0=x0s)
    N, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    z0 = jnp.zeros((B, nz))
    l0 = jnp.zeros((B, nl))
    v0 = jnp.zeros((B, nv))

    opts = Options(abs_tol=1e-8)
    x_k, core_k = mpc.solve_mpc_qp_batch(batch, z0, l0, v0, opts)
    assert (np.asarray(core_k.eflag) == 0).all()

    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()
    x_s, core_s = mpc.solve_mpc_qp_batch(batch, z0, l0, v0, opts)

    np.testing.assert_allclose(x_k.z, x_s.z, atol=1e-9)
    np.testing.assert_allclose(x_k.v, x_s.v, atol=1e-9)
    assert (np.asarray(core_k.newton_iters)
            == np.asarray(core_s.newton_iters)).all()
