"""Staged (per-stage fori_loop) mode of the fully fused solver kernel vs
the XLA-orchestrated path: identical exit flags and iteration counts,
solutions to fp tolerance (interpret mode, CPU).

Staged mode exists for large stage dims (the copolymerization class),
where full-horizon kernel intermediates blow the Mosaic register
allocator into scoped-VMEM spill slots (see _build_ctx in
ops/mpc_solve_pallas.py). These tests pin its semantics at small dims,
where the reference path is cheap to run in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np

import fbstab_tpu.models.mpc_qp as mpc
from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.models.mpc_qp import mpc_dims, solve_mpc_qp_batch
from fbstab_tpu.options import Options
from fbstab_tpu.ops.mpc_solve_pallas import fbstab_mpc_solve_fused
from fbstab_tpu.solver_out import ExitFlag

from tests.test_subfused import _copoly_batch, _di_batch


def test_staged_fused_matches_reference_path(monkeypatch):
    """Mixed batch (varying iteration counts + infeasible instances):
    the staged full-solve kernel matches the XLA path exactly on exit
    flags and iteration counts."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    batch, z0, l0, v0 = _di_batch(8)
    opts = Options(abs_tol=1e-8)
    x_ref, core_ref = solve_mpc_qp_batch(batch, z0, l0, v0, opts)
    x_s, core_s = fbstab_mpc_solve_fused(
        batch, z0, l0, v0, opts, interpret=True, tile_b=8, staged=True)

    np.testing.assert_array_equal(core_s.eflag, core_ref.eflag)
    np.testing.assert_array_equal(core_s.newton_iters,
                                  core_ref.newton_iters)
    np.testing.assert_array_equal(core_s.prox_iters, core_ref.prox_iters)
    scale = 1.0 + np.abs(np.asarray(x_ref.v))
    np.testing.assert_allclose(
        np.asarray(x_s.v) / scale, np.asarray(x_ref.v) / scale, atol=1e-9)
    np.testing.assert_allclose(x_s.z, x_ref.z, atol=1e-9)
    np.testing.assert_allclose(
        core_s.residual, core_ref.residual, rtol=1e-9, atol=1e-12)


def test_staged_fused_copoly_lowmem_padding(monkeypatch):
    """Copolymerization stage dims (nx=18, nu=5, nc=10) at a short
    horizon, staged + lowmem scratch, B=3 with tile_b=2 (tile
    padding)."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    batch, z0, l0, v0 = _copoly_batch(B=3, N=4)
    opts = Options(abs_tol=1e-8)
    x_ref, core_ref = solve_mpc_qp_batch(batch, z0, l0, v0, opts)
    x_s, core_s = fbstab_mpc_solve_fused(
        batch, z0, l0, v0, opts, interpret=True, tile_b=2, lowmem=True,
        staged=True)

    assert np.all(np.asarray(core_ref.eflag) == int(ExitFlag.SUCCESS))
    np.testing.assert_array_equal(core_s.eflag, core_ref.eflag)
    np.testing.assert_array_equal(core_s.newton_iters,
                                  core_ref.newton_iters)
    np.testing.assert_allclose(x_s.z, x_ref.z, atol=1e-9)
    np.testing.assert_allclose(
        core_s.residual, core_ref.residual, rtol=1e-9, atol=1e-12)


def test_staged_fused_warmstart_and_infeasible(monkeypatch):
    """Warmstart-from-solution (prox_iters == 0 path: the success exit on
    the very first outer iteration writes xk) plus an infeasible lane —
    exercises the staged masked output writes and feasibility
    certificates."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    batch, z0, l0, v0 = _di_batch(4)
    # Lane 3: infeasible instance (upper bound below lower bound).
    d = np.array(batch.d)
    d[3] = np.abs(d[3]) * 0.0 - 1.0
    E = np.array(batch.E)
    E[3, :, 0::2] = 0.0
    L = np.array(batch.L)
    L[3] = 0.0
    batch = batch._replace(d=jnp.asarray(d), E=jnp.asarray(E),
                           L=jnp.asarray(L))
    opts = Options(abs_tol=1e-8)

    x_ref, core_ref = solve_mpc_qp_batch(batch, z0, l0, v0, opts)
    # Re-solve warmstarted from the reference solution.
    x_ref2, core_ref2 = solve_mpc_qp_batch(
        batch, x_ref.z, x_ref.l, x_ref.v, opts)
    x_s, core_s = fbstab_mpc_solve_fused(
        batch, x_ref.z, x_ref.l, x_ref.v, opts, interpret=True, tile_b=4,
        staged=True)

    np.testing.assert_array_equal(core_s.eflag, core_ref2.eflag)
    np.testing.assert_array_equal(core_s.prox_iters, core_ref2.prox_iters)
    np.testing.assert_array_equal(core_s.newton_iters,
                                  core_ref2.newton_iters)
    np.testing.assert_allclose(x_s.z, x_ref2.z, atol=1e-9)
