"""Ragged global batches + padding-safe stats (VERDICT r2 item 5):
B = 1001 over the 8-virtual-device CPU mesh must pad transparently and
report stats that exclude the padding."""

import jax
import jax.numpy as jnp
import numpy as np

from fbstab_tpu.options import Options
from fbstab_tpu.parallel.ragged import (
    masked_batch_stats,
    pad_batch_for_mesh,
    solve_dense_ragged,
    solve_mpc_ragged,
)
from fbstab_tpu.parallel.sharded import make_mesh
from fbstab_tpu.solver_out import ExitFlag


def test_pad_batch_for_mesh_shapes():
    mesh = make_mesh()
    n_dev = mesh.devices.size
    assert n_dev == 8
    tree = (jnp.ones((1001, 3)), jnp.zeros((1001,)))
    padded, valid = pad_batch_for_mesh(mesh, tree)
    assert padded[0].shape[0] == 1008 and padded[1].shape[0] == 1008
    assert int(valid.sum()) == 1001
    # Padding repeats the last instance.
    np.testing.assert_array_equal(
        np.asarray(padded[0][1001:]),
        np.broadcast_to(np.asarray(padded[0][1000]), (7, 3)))
    # tile alignment
    padded2, valid2 = pad_batch_for_mesh(mesh, tree, tile_b=16)
    assert padded2[0].shape[0] == 1024

    # Already-divisible batches pass through untouched.
    tree8 = (jnp.ones((16, 2)),)
    same, v8 = pad_batch_for_mesh(mesh, tree8)
    assert same[0] is tree8[0]
    assert int(v8.sum()) == 16


def test_ragged_dense_b1001_on_8_devices():
    from bench import build_dense_batch

    B = 1001
    data, z0, l0, v0 = build_dense_batch(B, 4, 6, jnp.float64)
    # Poison two instances to infeasibility (contradictory rows) so the
    # stats have something to count beyond SUCCESS.
    A = np.array(data.A)
    b = np.array(data.b)
    for i in (100, 999):
        A[i, 0, :] = A[i, 1, :] = 0.0
        A[i, 0, 0], A[i, 1, 0] = 1.0, -1.0
        b[i, 0], b[i, 1] = -1.0, -1.0      # z0 <= -1 and z0 >= 1
    data = data._replace(A=jnp.asarray(A), b=jnp.asarray(b))

    x, core, stats = solve_dense_ragged(
        data, z0, l0, v0, Options(abs_tol=1e-8))
    assert core.eflag.shape[0] == B                    # trimmed
    assert x.z.shape[0] == B
    assert int(stats.num_instances) == B               # padding excluded
    ef = np.asarray(core.eflag)
    n_inf = int(np.sum((ef >= int(ExitFlag.PRIMAL_INFEASIBLE))
                       & (ef <= int(ExitFlag.PRIMAL_DUAL_INFEASIBLE))))
    assert int(stats.num_infeasible) == n_inf == 2
    assert int(stats.num_success) == int(np.sum(ef == 0))
    assert int(stats.num_success) + n_inf == B
    # Stats match an unsharded ground-truth reduction over the real lanes.
    res = np.asarray(core.residual)
    assert float(stats.max_residual) == res.max()
    np.testing.assert_allclose(float(stats.mean_residual), res.mean(),
                               rtol=1e-12)


def test_ragged_mpc_xla_path():
    from bench import build_batch

    B = 37                                  # 37 -> 40 on 8 devices
    data, z0, l0, v0 = build_batch(B, 5, 3, 2, 4, jnp.float64)
    x, core, stats = solve_mpc_ragged(
        data, z0, l0, v0, Options(), fused=False)
    assert core.eflag.shape[0] == B
    assert int(stats.num_instances) == B
    assert int(stats.num_success) == B
    assert int(stats.total_newton_iters) == \
        int(np.asarray(core.newton_iters).sum())


def test_masked_stats_excludes_padding():
    from fbstab_tpu.core.algorithm import CoreOut

    eflag = jnp.asarray([0, 0, 2, 0, 0, 0], jnp.int32)   # last 2 = padding
    res = jnp.asarray([1e-8, 2e-8, 0.5, 3e-8, 9.0, 9.0])
    ni = jnp.asarray([3, 4, 50, 5, 99, 99], jnp.int32)
    core = CoreOut(eflag=eflag, residual=res, newton_iters=ni,
                   prox_iters=ni, initial_residual=res, raw_residual=res)
    valid = jnp.asarray([1, 1, 1, 1, 0, 0], bool)
    s = masked_batch_stats(core, valid)
    assert int(s.num_instances) == 4
    assert int(s.num_success) == 3
    assert int(s.num_failed) == 1
    assert float(s.max_residual) == 0.5
    assert int(s.total_newton_iters) == 62
    assert int(s.max_newton_iters) == 50
