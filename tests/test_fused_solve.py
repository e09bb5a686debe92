"""Fully fused solver kernel vs. the XLA-orchestrated path (interpret
mode, CPU): identical exit flags, iteration counts, and solutions."""

import jax
import jax.numpy as jnp
import numpy as np

import fbstab_tpu.models.mpc_qp as mpc
from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.models.mpc_qp import mpc_dims, solve_mpc_qp_batch
from fbstab_tpu.ops.mpc_solve_pallas import fbstab_mpc_solve_fused
from fbstab_tpu.options import Options


def _batch(B, N=6):
    data, _ = ocp_fixtures.double_integrator(N)
    batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
    x0s = jnp.asarray([
        [0.0, 0.0], [1.5, 0.3], [-1.0, 0.0], [0.3, -0.2],
        [1.9, 0.05], [-2.5, 0.0], [0.7, 0.6], [1.0, -0.9]][:B])
    batch = batch._replace(x0=x0s)
    N_, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N_ + 1) * (nx + nu), (N_ + 1) * nx, (N_ + 1) * nc
    return batch, jnp.zeros((B, nz)), jnp.zeros((B, nl)), jnp.zeros((B, nv))


def test_fused_matches_reference_path(monkeypatch):
    """Mixed batch (varying iteration counts + infeasible instances):
    per-instance exit flags and iteration counts match exactly, iterates
    match to relative fp tolerance."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    batch, z0, l0, v0 = _batch(8)
    opts = Options(abs_tol=1e-8)
    x_ref, core_ref = solve_mpc_qp_batch(batch, z0, l0, v0, opts)
    x_f, core_f = fbstab_mpc_solve_fused(
        batch, z0, l0, v0, opts, interpret=True, tile_b=8)

    np.testing.assert_array_equal(core_f.eflag, core_ref.eflag)
    np.testing.assert_array_equal(core_f.newton_iters,
                                  core_ref.newton_iters)
    np.testing.assert_array_equal(core_f.prox_iters, core_ref.prox_iters)
    # Certificates can be huge; compare relatively.
    scale = 1.0 + np.abs(np.asarray(x_ref.v))
    np.testing.assert_allclose(
        np.asarray(x_f.v) / scale, np.asarray(x_ref.v) / scale, atol=1e-9)
    np.testing.assert_allclose(x_f.z, x_ref.z, atol=1e-9)
    np.testing.assert_allclose(
        core_f.residual, core_ref.residual, rtol=1e-9, atol=1e-12)


def test_fused_tile_padding(monkeypatch):
    """B not a multiple of the tile: padded lanes are dropped correctly."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    batch, z0, l0, v0 = _batch(5)
    opts = Options(abs_tol=1e-8)
    x_ref, core_ref = solve_mpc_qp_batch(batch, z0, l0, v0, opts)
    x_f, core_f = fbstab_mpc_solve_fused(
        batch, z0, l0, v0, opts, interpret=True, tile_b=4)
    np.testing.assert_array_equal(core_f.eflag, core_ref.eflag)
    np.testing.assert_allclose(x_f.z, x_ref.z, atol=1e-9)
