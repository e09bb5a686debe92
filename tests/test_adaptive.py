"""Two-phase adaptive batch solving tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import fbstab_tpu.models.dense_qp as dense
import fbstab_tpu.models.mpc_qp as mpc
from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.models.mpc_qp import mpc_dims
from fbstab_tpu.options import Options
from fbstab_tpu.parallel.adaptive import (
    solve_dense_qp_batch_adaptive,
    solve_mpc_qp_batch_adaptive,
)
from fbstab_tpu.solver_out import ExitFlag


def _dense_batch(B, n, q, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((B, n, n))
    H = M @ np.transpose(M, (0, 2, 1)) / n + np.eye(n)
    data = dense.DenseQPData(
        H=jnp.asarray(H), f=jnp.asarray(rng.standard_normal((B, n))),
        G=jnp.zeros((B, 0, n)), h=jnp.zeros((B, 0)),
        A=jnp.asarray(rng.standard_normal((B, q, n))),
        b=jnp.asarray(np.abs(rng.standard_normal((B, q))) + 0.5))
    return data, jnp.zeros((B, n)), jnp.zeros((B, 0)), jnp.zeros((B, q))


def test_adaptive_matches_oneshot_dense():
    """Random dense batch: two-phase result converges everywhere and
    matches a full-budget one-shot solve."""
    B, n, q = 16, 8, 12
    data, z0, l0, v0 = _dense_batch(B, n, q)
    opts = Options(abs_tol=1e-8)

    x, core = solve_dense_qp_batch_adaptive(
        data, z0, l0, v0, opts, phase1_newton_iters=4, pad_multiple=4)
    assert (np.asarray(core.eflag) == ExitFlag.SUCCESS).all()

    x_ref, core_ref = dense.solve_dense_qp_batch(data, z0, l0, v0, opts)
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

    x, core = solve_mpc_qp_batch_adaptive(
        batch, jnp.zeros((B, nz)), jnp.zeros((B, nl)),
        jnp.zeros((B, nv)), Options(abs_tol=1e-8),
        phase1_newton_iters=30, pad_multiple=2)
    ef = np.asarray(core.eflag)
    assert ef[0] == ExitFlag.SUCCESS
    assert ef[2] == ExitFlag.SUCCESS
    assert ef[1] == ExitFlag.PRIMAL_INFEASIBLE
    assert ef[3] == ExitFlag.PRIMAL_INFEASIBLE


def test_adaptive_on_fused_kernel_path(monkeypatch):
    """Both phases through the fused Pallas solver kernel (interpret):
    instances that converge in phase 1 must match the one-shot fused
    solve bit-for-bit (they are never re-solved), and stragglers must
    still converge in phase 2."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "interpret")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    data, _ = ocp_fixtures.double_integrator(4)
    B = 8
    batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
    x0s = jnp.stack(
        [jnp.array([0.2 * i, 0.01 * i]) for i in range(B)])  # mixed hardness
    batch = batch._replace(x0=x0s)
    N, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    z0 = jnp.zeros((B, nz))
    l0 = jnp.zeros((B, nl))
    v0 = jnp.zeros((B, nv))
    opts = Options(abs_tol=1e-8)

    x1, core1 = mpc.solve_mpc_qp_batch(
        batch, z0, l0, v0,
        Options(abs_tol=1e-8, max_newton_iters=6))
    x, core = solve_mpc_qp_batch_adaptive(
        batch, z0, l0, v0, opts, phase1_newton_iters=6, pad_multiple=2)
    x_ref, core_ref = mpc.solve_mpc_qp_batch(batch, z0, l0, v0, opts)

    conv1 = np.asarray(core1.eflag) == int(ExitFlag.SUCCESS)
    assert conv1.any() and not conv1.all()     # phases actually split
    # Converged-in-phase-1 lanes: identical to the one-shot phase-1 run.
    for name in ("z", "l", "v", "y"):
        np.testing.assert_array_equal(
            np.asarray(getattr(x, name))[conv1],
            np.asarray(getattr(x1, name))[conv1])
    # Everyone ends SUCCESS and agrees with the full solve numerically.
    assert (np.asarray(core.eflag) == int(ExitFlag.SUCCESS)).all()
    np.testing.assert_allclose(x.z, x_ref.z, atol=1e-6)


def test_device_adaptive_matches_oneshot_and_is_jittable():
    """The device-side two-phase scheme (fixed shapes, no host sync) must
    converge everywhere under jit and match a full-budget one-shot
    solve (VERDICT r2 item 6)."""
    from fbstab_tpu.models.dense_qp import solve_dense_qp_batch
    from fbstab_tpu.parallel.adaptive import solve_batch_adaptive_device

    B, n, q = 16, 8, 12
    data, z0, l0, v0 = _dense_batch(B, n, q)
    opts = Options(abs_tol=1e-8)

    fn = jax.jit(lambda d, z, l, v: solve_batch_adaptive_device(
        solve_dense_qp_batch, None, d, z, l, v, opts,
        phase1_newton_iters=4, phase2_size=16))
    x, core = fn(data, z0, l0, v0)
    assert (np.asarray(core.eflag) == ExitFlag.SUCCESS).all()

    x1, core1 = solve_dense_qp_batch(data, z0, l0, v0, opts)
    np.testing.assert_allclose(np.asarray(x.z), np.asarray(x1.z),
                               atol=1e-6)
    # Retried lanes accumulate both phases' iterations.
    assert (np.asarray(core.newton_iters)
            >= np.asarray(core1.newton_iters)).any()


def test_device_adaptive_under_sharded_mesh():
    """Composes with shard_map over the 8-virtual-device mesh: each shard
    compacts its own stragglers; stats reduce over the global batch."""
    from fbstab_tpu.parallel.sharded import (
        make_mesh, shard_batch, sharded_mpc_solver_adaptive)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    B = 32
    data, _ = ocp_fixtures.double_integrator(5)
    batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
    rng = np.random.default_rng(3)
    batch = batch._replace(
        x0=jnp.asarray(0.05 * np.abs(rng.standard_normal((B, 2)))))
    nz, nl, nv = 6 * 3, 6 * 2, 6 * 6
    z0 = jnp.zeros((B, nz))
    l0 = jnp.zeros((B, nl))
    v0 = jnp.zeros((B, nv))
    solver = sharded_mpc_solver_adaptive(
        mesh, Options(abs_tol=1e-8), phase1_newton_iters=3,
        phase2_size=4)
    args = shard_batch(mesh, (batch, z0, l0, v0))
    x, core, stats = solver(*args)
    assert int(stats.num_instances) == B
    assert int(stats.num_success) == B, np.asarray(core.eflag)
    # Cross-check against the unsharded one-shot solve.
    from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch
    x1, core1 = solve_mpc_qp_batch(batch, z0, l0, v0,
                                   Options(abs_tol=1e-8))
    np.testing.assert_allclose(np.asarray(x.z), np.asarray(x1.z),
                               atol=1e-6)


def test_device_adaptive_overflow_fallback():
    """Straggler counts beyond phase2_size (ADVICE r4 item 2): with the
    fallback pass (default) every lane still converges and matches the
    one-shot solve; with it off, overflow lanes keep their phase-1
    budget exit — the documented trade."""
    from fbstab_tpu.models.dense_qp import solve_dense_qp_batch
    from fbstab_tpu.parallel.adaptive import solve_batch_adaptive_device

    B, n, q = 16, 8, 12
    data, z0, l0, v0 = _dense_batch(B, n, q)
    opts = Options(abs_tol=1e-8)
    kw = dict(phase1_newton_iters=2, phase2_size=2)

    x, core = jax.jit(lambda d, z, l, v: solve_batch_adaptive_device(
        solve_dense_qp_batch, None, d, z, l, v, opts, **kw))(
        data, z0, l0, v0)
    assert (np.asarray(core.eflag) == ExitFlag.SUCCESS).all()
    x1, _ = dense.solve_dense_qp_batch(data, z0, l0, v0, opts)
    np.testing.assert_allclose(np.asarray(x.z), np.asarray(x1.z),
                               atol=1e-6)

    _, core2 = jax.jit(lambda d, z, l, v: solve_batch_adaptive_device(
        solve_dense_qp_batch, None, d, z, l, v, opts,
        phase2_fallback=False, **kw))(data, z0, l0, v0)
    ef = np.asarray(core2.eflag)
    assert (ef == ExitFlag.MAXITERATIONS).any()


def test_facade_adaptive_knobs_plumbed():
    """The batch facades expose the two-phase knobs (ADVICE r4 item 2):
    tiny phase-1 budget + small capacity still converges everywhere via
    the fallback pass."""
    from fbstab_tpu.models.batch_facade import FBstabDenseBatch

    B, n, q = 8, 6, 8
    data, z0, l0, v0 = _dense_batch(B, n, q)
    solver = FBstabDenseBatch(B, n, 0, q, dtype=data.H.dtype,
                              options=Options(abs_tol=1e-8),
                              adaptive=True, phase1_newton_iters=3,
                              phase2_size=2)
    assert solver.phase1_newton_iters == 3
    assert solver.phase2_size == 2
    x, out, stats = solver.solve(data)
    assert int(stats.num_success) == B


def test_device_adaptive_three_stage_schedule():
    """solve_batch_adaptive_schedule with an intermediate same-profile
    stage: converges everywhere, matches one-shot, accumulates
    iteration counts across stages (round-5 schedule generalization)."""
    from fbstab_tpu.models.dense_qp import solve_dense_qp_batch
    from fbstab_tpu.parallel.adaptive import solve_batch_adaptive_schedule

    B, n, q = 16, 8, 12
    data, z0, l0, v0 = _dense_batch(B, n, q)
    opts = Options(abs_tol=1e-8)

    x, core = jax.jit(lambda d, z, l, v: solve_batch_adaptive_schedule(
        solve_dense_qp_batch, None, d, z, l, v, opts,
        stages=[(3, None, "same"), (6, 8, "same"), (None, 8, "reliable")],
    ))(data, z0, l0, v0)
    assert (np.asarray(core.eflag) == ExitFlag.SUCCESS).all()
    x1, core1 = dense.solve_dense_qp_batch(data, z0, l0, v0, opts)
    np.testing.assert_allclose(np.asarray(x.z), np.asarray(x1.z),
                               atol=1e-6)
    # Lanes that went through later stages accumulated their budgets.
    assert int(np.max(np.asarray(core.newton_iters))) >= 4
