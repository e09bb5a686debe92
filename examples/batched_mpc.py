"""Batched scenario-MPC on one chip: thousands of independent MPC QPs
solved in lockstep (the TPU 'DP' analog of the reference's one-solve-per-
call API). On TPU f32 the batch dispatches to the fused Pallas solver
kernel; on CPU the same code runs the XLA path.

Run:  python examples/batched_mpc.py [batch_size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import fbstab_tpu  # noqa: F401  (sets the TPU scoped-VMEM budget early)
from fbstab_tpu import Options, solve_mpc_qp_batch
from fbstab_tpu.models.mpc_qp import mpc_dims
from fbstab_tpu.models.ocp_fixtures import double_integrator
from fbstab_tpu.parallel.sharded import batch_stats
from fbstab_tpu.utils.compile import tpu_compiler_options


def main():
    on_tpu = jax.default_backend() == "tpu"
    B = int(sys.argv[1]) if len(sys.argv) > 1 else (2048 if on_tpu else 64)
    dtype = jnp.float32 if on_tpu else jnp.float64
    opts = Options.single_precision() if on_tpu else Options()

    # One shared plant, B different initial states (scenario MPC).
    data, _ = double_integrator(20, dtype=dtype)
    N, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
    # Small perturbations: the benchmark fixture's nominal x0 sits on its
    # feasibility boundary, so scenarios fan out inside the feasible set.
    x0s = jnp.stack([
        jnp.asarray([0.004 * (i % 20), 0.002 * (i % 13)], dtype)
        for i in range(B)])
    batch = batch._replace(x0=x0s)

    solve = jax.jit(
        lambda d, z, l, v: solve_mpc_qp_batch(d, z, l, v, opts),
        compiler_options=tpu_compiler_options())
    z0 = jnp.zeros((B, nz), dtype)
    l0 = jnp.zeros((B, nl), dtype)
    v0 = jnp.zeros((B, nv), dtype)

    x, core = solve(batch, z0, l0, v0)       # compile + warm
    np.asarray(core.residual)
    t0 = time.perf_counter()
    x, core = solve(batch._replace(x0=x0s * 0.999), z0, l0, v0)
    np.asarray(core.residual)                # materialize => reliable timing
    dt = time.perf_counter() - t0

    stats = jax.jit(batch_stats)(core)
    print(f"{B} MPC QPs (nx={nx}, nu={nu}, N={N}) on "
          f"{jax.default_backend()}: {dt * 1e3:.1f} ms "
          f"({B / dt:,.0f} QPs/s)")
    print(f"converged {int(stats.num_success)}/{B}, "
          f"max residual {float(stats.max_residual):.2e}, "
          f"max newton iters {int(stats.max_newton_iters)}")


if __name__ == "__main__":
    main()
