"""Worker process for the multi-process distributed test
(tests/test_multiprocess.py). Not collected by pytest (no test_ prefix).

Each worker joins a 2-process jax.distributed coordination service with 4
virtual CPU devices, forms the GLOBAL 8-device mesh, assembles its
process-local slice of a batched MPC workload into a global sharded
array, runs the sharded solver, and checks the globally reduced
BatchStats — the honest multi-host analog of SURVEY.md section 4.3
("CPU-backend multi-process JAX tests for the sharded batch path").

Usage: python mp_worker.py <process_id> <num_processes> <coordinator_port>
The parent must set XLA_FLAGS=--xla_force_host_platform_device_count=4.
Exits 0 on success; any assertion/exception exits nonzero.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    from fbstab_tpu.models.mpc_qp import mpc_dims
    from fbstab_tpu.models.ocp_fixtures import double_integrator
    from fbstab_tpu.options import Options
    from fbstab_tpu.parallel.sharded import BATCH_AXIS, make_mesh, \
        sharded_mpc_solver

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == nprocs * n_local, (n_global, nprocs, n_local)

    mesh = make_mesh(jax.devices())
    spec = NamedSharding(mesh, PartitionSpec(BATCH_AXIS))

    # Global workload: B instances, each process materializes only the
    # rows its local devices own (data-parallel input pipeline shape).
    B = 4 * n_global
    N = 4
    data, _ = double_integrator(N, dtype=jnp.float64)
    nN, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (nN + 1) * (nx + nu), (nN + 1) * nx, (nN + 1) * nc

    def rows(lo, hi):
        return np.stack(
            [np.asarray([0.05 * (i % 30), 0.01 * (i % 17)], np.float64)
             for i in range(lo, hi)])

    lo, hi = pid * (B // nprocs), (pid + 1) * (B // nprocs)

    def globalize(local_np, trailing):
        return jax.make_array_from_process_local_data(
            spec, local_np, (B,) + trailing)

    local_rows = hi - lo
    data_local = jax.tree.map(
        lambda a: np.broadcast_to(np.asarray(a), (local_rows,) + a.shape),
        data)
    data_local = data_local._replace(x0=rows(lo, hi))
    batch = jax.tree.map(
        lambda a: globalize(np.ascontiguousarray(a), a.shape[1:]),
        data_local)
    z0 = globalize(np.zeros((local_rows, nz)), (nz,))
    l0 = globalize(np.zeros((local_rows, nl)), (nl,))
    v0 = globalize(np.zeros((local_rows, nv)), (nv,))

    solver = sharded_mpc_solver(mesh, Options(abs_tol=1e-8))
    x, core, stats = solver(batch, z0, l0, v0)
    jax.block_until_ready((x, core, stats))

    # Stats are globally reduced (replicated): every process must see the
    # full batch converged.
    assert int(stats.num_instances) == B, int(stats.num_instances)
    assert int(stats.num_success) == B, (
        f"only {int(stats.num_success)}/{B} converged")
    assert float(stats.max_residual) <= 1e-6

    # Local shards of the solution must satisfy their own KKT margins.
    for shard in x.v.addressable_shards:
        assert np.all(np.asarray(shard.data) >= -1e-12)

    jax.distributed.shutdown()
    print(f"worker {pid}: OK ({n_local} local / {n_global} global devices)")


if __name__ == "__main__":
    main()
