"""Fused solver kernel under shard_map on the 8-virtual-device CPU mesh
(interpret mode): the multi-chip configuration of BASELINE.json config 5."""

import jax
import jax.numpy as jnp
import numpy as np

import fbstab_tpu.models.mpc_qp as mpc
from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.models.mpc_qp import mpc_dims, solve_mpc_qp_batch
from fbstab_tpu.options import Options
from fbstab_tpu.parallel.sharded import (
    make_mesh,
    shard_batch,
    sharded_mpc_solver_fused,
)


def test_sharded_fused_matches_reference(monkeypatch):
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()

    B = 16
    data, _ = ocp_fixtures.double_integrator(4)
    batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
    x0s = jnp.stack([jnp.array([0.04 * i, 0.01 * i]) for i in range(B)])
    batch = batch._replace(x0=x0s)
    N, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    z0 = jnp.zeros((B, nz))
    l0 = jnp.zeros((B, nl))
    v0 = jnp.zeros((B, nv))
    opts = Options(abs_tol=1e-8)

    mesh = make_mesh()
    solver = sharded_mpc_solver_fused(
        mesh, opts, interpret=True, tile_b=2)
    args = shard_batch(mesh, (batch, z0, l0, v0))
    x, core, stats = solver(*args)

    x_ref, core_ref = solve_mpc_qp_batch(batch, z0, l0, v0, opts)
    np.testing.assert_array_equal(core.eflag, core_ref.eflag)
    np.testing.assert_array_equal(core.newton_iters, core_ref.newton_iters)
    np.testing.assert_allclose(x.z, x_ref.z, atol=1e-9)
    assert int(stats.num_success) == B
    # Outputs remain sharded over all 8 devices.
    assert len(x.z.sharding.device_set) == 8


def test_sharded_fused_ragged_tiles(monkeypatch):
    """Per-shard batch NOT a multiple of the kernel tile (B = 8 devices x
    6 instances with tile_b = 4): each shard pads its last tile
    internally and the padding must not leak into results. Compared
    against the UNSHARDED fused kernel (48 = 12 whole tiles, no padding)
    — same arithmetic, so results must be bit-exact; any difference is a
    padding leak."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()

    B = 8 * 6
    data, _ = ocp_fixtures.double_integrator(4)
    batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
    x0s = jnp.stack(
        [jnp.array([0.04 * (i % 20), 0.01 * (i % 11)]) for i in range(B)])
    batch = batch._replace(x0=x0s)
    N, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    z0 = jnp.zeros((B, nz))
    l0 = jnp.zeros((B, nl))
    v0 = jnp.zeros((B, nv))
    opts = Options(abs_tol=1e-8)

    mesh = make_mesh()
    solver = sharded_mpc_solver_fused(mesh, opts, interpret=True, tile_b=4)
    args = shard_batch(mesh, (batch, z0, l0, v0))
    x, core, stats = solver(*args)

    from fbstab_tpu.ops.mpc_solve_pallas import fbstab_mpc_solve_fused
    x_ref, core_ref = fbstab_mpc_solve_fused(
        batch, z0, l0, v0, opts, interpret=True, tile_b=4)
    for a, b in zip(jax.tree.leaves((x, core)),
                    jax.tree.leaves((x_ref, core_ref))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(stats.num_success) == B
