"""Fused-subproblem tier (models/mpc_subfused.py + the subproblem kernel
in ops/mpc_solve_pallas.py) vs. the XLA-orchestrated path: identical exit
flags and iteration counts, solutions to fp tolerance (interpret mode,
CPU). This is the large-stage-dimension tier, so the copolymerization
class is the primary fixture."""

import jax
import jax.numpy as jnp
import numpy as np

import fbstab_tpu.models.mpc_qp as mpc
from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.models.mpc_qp import mpc_dims, solve_mpc_qp_batch
from fbstab_tpu.models.mpc_subfused import fbstab_mpc_solve_subfused
from fbstab_tpu.options import Options
from fbstab_tpu.solver_out import ExitFlag


def _di_batch(B, N=6):
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


def _copoly_batch(B, N):
    data, _ = ocp_fixtures.copolymerization_reactor(N)
    batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
    rng = np.random.default_rng(0)
    batch = batch._replace(
        x0=jnp.asarray(0.02 * rng.standard_normal((B, 18))))
    N_, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N_ + 1) * (nx + nu), (N_ + 1) * nx, (N_ + 1) * nc
    return batch, jnp.zeros((B, nz)), jnp.zeros((B, nl)), jnp.zeros((B, nv))


def test_subfused_matches_reference_path(monkeypatch):
    """Mixed batch (varying iteration counts + infeasible instances):
    the XLA-outer-loop + fused-subproblem solver matches the reference
    path exactly on exit flags and iteration counts."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    batch, z0, l0, v0 = _di_batch(8)
    opts = Options(abs_tol=1e-8)
    x_ref, core_ref = solve_mpc_qp_batch(batch, z0, l0, v0, opts)
    x_s, core_s = fbstab_mpc_solve_subfused(
        batch, z0, l0, v0, opts, interpret=True, tile_b=8)

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


def test_subfused_copoly_lowmem_padding(monkeypatch):
    """Copolymerization stage dims (nx=18, nu=5, nc=10) at a short
    horizon, lowmem scratch, B=3 with tile_b=2 (exercises tile
    padding)."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    batch, z0, l0, v0 = _copoly_batch(B=3, N=4)
    opts = Options(abs_tol=1e-8)
    x_ref, core_ref = solve_mpc_qp_batch(batch, z0, l0, v0, opts)
    x_s, core_s = fbstab_mpc_solve_subfused(
        batch, z0, l0, v0, opts, interpret=True, tile_b=2, lowmem=True)

    assert np.all(np.asarray(core_ref.eflag) == int(ExitFlag.SUCCESS))
    np.testing.assert_array_equal(core_s.eflag, core_ref.eflag)
    np.testing.assert_array_equal(core_s.newton_iters,
                                  core_ref.newton_iters)
    np.testing.assert_allclose(x_s.z, x_ref.z, atol=1e-9)
    np.testing.assert_allclose(
        core_s.residual, core_ref.residual, rtol=1e-9, atol=1e-12)


def test_subfused_dispatch_gates():
    """The subfused tier takes kernel-VMEM-fitting problems whose carried
    state exceeds the full-solve kernel's cap — and only those."""
    import fbstab_tpu.models.mpc_qp as m

    def gate(N, nx, nu, nc):
        rows = m._state_rows(N, nx, nu, nc)
        mode = m._kernel_mode(N, nx, nu, nc)
        if rows <= m._FULL_SOLVE_ROWS_CAP or mode is None:
            return None
        for cand in (128, 64, 32):
            mb = m._fused_vmem_mb(N, nx, nu, nc, tile_b=cand,
                                  lowmem=(mode == "lowmem"))
            if mb * m._SUBFUSED_SPILL_FACTOR <= m._SUBFUSED_BUDGET_MB:
                return mode, cand
        return None

    # Copolymerization: rows 4941 > 1024, lowmem VMEM fit at full tile
    # (the staged kernel bounds Mosaic spill; see _SUBFUSED_SPILL_FACTOR).
    assert gate(80, 18, 5, 10) == ("lowmem", 128)
    # Spacecraft N=40: rows 1599 > 1024, std VMEM fit at full tile.
    assert gate(40, 6, 3, 12) == ("std", 128)
    # Bench shape: full-solve kernel takes it.
    assert gate(30, 8, 3, 6) is None
    # Beyond the VMEM budget: XLA path.
    assert gate(200, 32, 8, 16) is None


def test_subfused_routed_by_batch_dispatcher(monkeypatch):
    """solve_mpc_qp_batch routes a rows-over-cap problem to the subfused
    tier (PALLAS_MODE='interpret' on CPU) and the result matches the
    pure-XLA path."""
    # Double integrator at N=62: rows = 63*17 = 1071 > 1024, std mode.
    batch, z0, l0, v0 = _di_batch(3, N=62)
    opts = Options(abs_tol=1e-8)

    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()
    x_ref, core_ref = solve_mpc_qp_batch(batch, z0, l0, v0, opts)

    monkeypatch.setattr(mpc, "PALLAS_MODE", "interpret")
    assert mpc._subfused_eligible(batch, z0.dtype) == ("std", 128)
    assert mpc._fused_solve_eligible(batch, z0.dtype) is None
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()
    x_s, core_s = solve_mpc_qp_batch(batch, z0, l0, v0, opts)
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    np.testing.assert_array_equal(core_s.eflag, core_ref.eflag)
    np.testing.assert_array_equal(core_s.newton_iters,
                                  core_ref.newton_iters)
    np.testing.assert_allclose(x_s.z, x_ref.z, atol=1e-9)
