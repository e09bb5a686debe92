"""Multi-chip sharded batch solving.

The reference is single-threaded by contract (SURVEY.md section 2: zero
threads/processes/devices; the solvers are documented "not thread safe",
dense_cholesky_solver.h:27, riccati_linear_solver.h:47-48). Its users scale
by running one solver instance per control loop. The TPU-native scaling
story replaces that with:

 1. vmap over a batch of independent QP instances (per chip), and
 2. pjit/sharding of the batch axis over a `jax.sharding.Mesh` so XLA
    partitions the solve across chips with zero communication in the hot
    loop — instances are independent, so the only collectives are the
    small post-solve reductions in `batch_stats` (done-mask all-reduce,
    residual psum), which ride ICI.

This module is backend-agnostic: the same code drives a TPU slice or the
8-virtual-device CPU mesh used in tests
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from fbstab_tpu.core.algorithm import fbstab_solve
from fbstab_tpu.models.dense_qp import DENSE_OPS
from fbstab_tpu.models.mpc_qp import MPC_OPS
from fbstab_tpu.options import Options
from fbstab_tpu.utils.compile import tpu_compiler_options

BATCH_AXIS = "batch"


def make_mesh(devices=None, axis_name: str = BATCH_AXIS) -> Mesh:
    """A 1-D device mesh over the batch axis. For independent QP instances
    a flat data-parallel mesh is the whole story: there is no tensor to
    shard inside one (tiny) QP, so the mesh has a single axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = BATCH_AXIS):
    """Places a pytree of batch-leading arrays with the batch axis sharded
    over the mesh (remaining axes replicated). The batch size must divide
    evenly by the mesh size; pad with duplicate instances otherwise."""
    sharding = NamedSharding(mesh, PartitionSpec(axis_name))
    return jax.device_put(tree, sharding)


class BatchStats(NamedTuple):
    """Batch-level convergence summary. Computing these from sharded solver
    outputs under jit lowers to the done-mask/residual collectives over ICI
    described in SURVEY.md section 2."""

    num_instances: jnp.ndarray
    num_success: jnp.ndarray        # eflag == SUCCESS count (done-mask sum)
    num_infeasible: jnp.ndarray     # primal/dual/both infeasibility count
    num_failed: jnp.ndarray         # maxiters + linear solver failures
    max_residual: jnp.ndarray
    mean_residual: jnp.ndarray
    total_newton_iters: jnp.ndarray
    max_newton_iters: jnp.ndarray


def batch_stats(core_out) -> BatchStats:
    """Reduces a batched CoreOut/SolverOut into BatchStats (jittable)."""
    from fbstab_tpu.solver_out import ExitFlag
    eflag = core_out.eflag
    n = eflag.shape[0]
    success = eflag == int(ExitFlag.SUCCESS)
    infeas = ((eflag >= int(ExitFlag.PRIMAL_INFEASIBLE))
              & (eflag <= int(ExitFlag.PRIMAL_DUAL_INFEASIBLE)))
    return BatchStats(
        num_instances=jnp.asarray(n, jnp.int32),
        num_success=jnp.sum(success).astype(jnp.int32),
        num_infeasible=jnp.sum(infeas).astype(jnp.int32),
        num_failed=jnp.asarray(n, jnp.int32)
        - jnp.sum(success | infeas).astype(jnp.int32),
        max_residual=jnp.max(core_out.residual),
        mean_residual=jnp.mean(core_out.residual),
        total_newton_iters=jnp.sum(core_out.newton_iters),
        max_newton_iters=jnp.max(core_out.newton_iters),
    )


def _make_sharded_solver(ops, mesh: Mesh, options: Options,
                         axis_name: str, with_stats: bool):
    spec = NamedSharding(mesh, PartitionSpec(axis_name))
    is_mpc = ops is MPC_OPS

    def solve(data, z0, l0, v0):
        def raw(d, z, l, v):
            if is_mpc:
                # One-time batch-last stage-matrix copies, exactly like
                # solve_mpc_qp_batch: the Newton-step kernel wants the
                # batch in lanes, and transposing inside the Newton loop
                # costs a strided HBM pass per iteration (mpc_qp.py,
                # measured ~10x).
                from fbstab_tpu.models.mpc_qp import (
                    _DATA_T_AXES, MpcQPDataT, with_transposed)
                if not isinstance(d, MpcQPDataT):
                    d = with_transposed(d)
                axes = (_DATA_T_AXES, 0, 0, 0)
            else:
                axes = (0, 0, 0, 0)
            return jax.vmap(
                lambda d1, z1, l1, v1: fbstab_solve(ops, d1, z1, l1, v1,
                                                    options),
                in_axes=axes,
            )(d, z, l, v)

        from fbstab_tpu.models.refine import refine_engaged
        from fbstab_tpu.models.scaling import (
            ruiz_dense_scaling, ruiz_mpc_scaling, scaling_engaged,
            solve_scaled_dense, solve_scaled_mpc)
        opts = options.validated()
        scaled = solve_scaled_mpc if is_mpc else solve_scaled_dense
        ruiz = ruiz_mpc_scaling if is_mpc else ruiz_dense_scaling
        # Ruiz scaling computed once per shard and shared by the solve
        # and the refinement loop; the f32 residual rewrite is skipped
        # when refinement re-reports in df-verified original units.
        scal = (jax.vmap(ruiz)(data)
                if scaling_engaged(opts, z0.dtype) else None)
        will_refine = refine_engaged(opts, z0.dtype)
        x, core = scaled(raw, data, z0, l0, v0, opts, scal=scal,
                         skip_residual_rewrite=will_refine)
        if will_refine:
            from fbstab_tpu.models.refine import (
                refine_solution_dense, refine_solution_mpc)
            refine = refine_solution_mpc if is_mpc else refine_solution_dense
            x, core = refine(data, x, core, opts, scal=scal)
        if with_stats:
            return x, core, batch_stats(core)
        return x, core

    n_out = 3 if with_stats else 2
    out_shardings = (spec, spec) + (
        (NamedSharding(mesh, PartitionSpec()),) if with_stats else ())
    return jax.jit(solve, in_shardings=(spec,) * 4,
                   out_shardings=out_shardings[:n_out],
                   compiler_options=tpu_compiler_options())


def sharded_dense_solver(mesh: Mesh, options: Options = Options(),
                         axis_name: str = BATCH_AXIS,
                         with_stats: bool = True):
    """Compiles a dense batch solver partitioned over the mesh.

    Returns a function (data, z0, l0, v0) -> (Variable, CoreOut[, stats])
    where every input carries a leading batch axis sharded per
    `shard_batch`. The per-instance while_loops run masked lockstep within
    each shard; shards never synchronize until the stats reduction.
    """
    return _make_sharded_solver(DENSE_OPS, mesh, options, axis_name,
                                with_stats)


def sharded_mpc_solver(mesh: Mesh, options: Options = Options(),
                       axis_name: str = BATCH_AXIS,
                       with_stats: bool = True):
    """Compiles an MPC batch solver partitioned over the mesh (see
    sharded_dense_solver)."""
    return _make_sharded_solver(MPC_OPS, mesh, options, axis_name,
                                with_stats)


def sharded_mpc_solver_adaptive(mesh: Mesh, options: Options = Options(),
                                axis_name: str = BATCH_AXIS,
                                with_stats: bool = True,
                                phase1_newton_iters: int = 16,
                                phase2_size: int | None = None):
    """MPC batch solver running the DEVICE-SIDE two-phase adaptive scheme
    (parallel/adaptive.solve_batch_adaptive_device) on each shard under
    shard_map: fixed-shape phase-2 compaction, no host sync — the
    tail-latency tool composed with the flagship multi-chip path
    (VERDICT r2 item 6). Each shard compacts its OWN stragglers; the
    only collectives remain the post-solve stats reductions."""
    try:
        from jax import shard_map
    except ImportError:  # older JAX
        from jax.experimental.shard_map import shard_map

    from fbstab_tpu.parallel.adaptive import (
        solve_mpc_qp_batch_adaptive_device)

    spec4 = (PartitionSpec(axis_name),) * 4

    def local_solve(data, z0, l0, v0):
        return solve_mpc_qp_batch_adaptive_device(
            data, z0, l0, v0, options,
            phase1_newton_iters=phase1_newton_iters,
            phase2_size=phase2_size)

    out_specs = (PartitionSpec(axis_name), PartitionSpec(axis_name))
    try:
        sharded = shard_map(local_solve, mesh=mesh, in_specs=spec4,
                            out_specs=out_specs, check_vma=False)
    except TypeError:
        sharded = shard_map(local_solve, mesh=mesh, in_specs=spec4,
                            out_specs=out_specs, check_rep=False)

    def solve(data, z0, l0, v0):
        x, core = sharded(data, z0, l0, v0)
        if with_stats:
            return x, core, batch_stats(core)
        return x, core

    return jax.jit(solve, compiler_options=tpu_compiler_options())


def sharded_mpc_solver_fused(mesh: Mesh, options: Options = Options(),
                             axis_name: str = BATCH_AXIS,
                             with_stats: bool = True,
                             interpret: bool = False,
                             tile_b: int | None = None):
    """MPC batch solver running the fully fused Pallas solver kernel on
    each device's shard of the batch (shard_map over the mesh).

    This is the multi-chip configuration behind BASELINE.json config 5
    (1M warmstarted MPC QPs over a slice): instances are independent, each
    chip streams its local batch through the fused kernel, and only the
    `batch_stats` reductions cross ICI. The per-shard batch must divide
    evenly (pad with `shard_batch`'s contract).
    """
    try:
        from jax import shard_map
    except ImportError:  # older JAX
        from jax.experimental.shard_map import shard_map

    from fbstab_tpu.ops.mpc_solve_pallas import TILE_B, fbstab_mpc_solve_fused

    tb = TILE_B if tile_b is None else tile_b
    spec4 = (PartitionSpec(axis_name),) * 4

    def local_solve(data, z0, l0, v0):
        if tile_b is None and not interpret:
            # Production path: the full per-shard dispatch, so large
            # stage dims get the lowmem/staged/subfused tiers instead of
            # a hard-coded std-mode kernel that would blow scoped VMEM.
            from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch
            return solve_mpc_qp_batch(data, z0, l0, v0, options)
        # Explicit-knob path (tests / CPU interpret proxies).
        return fbstab_mpc_solve_fused(
            data, z0, l0, v0, options, interpret=interpret, tile_b=tb)

    # check_vma=False: the pallas_call's ShapeDtypeStructs don't carry
    # varying-mesh-axis metadata (older JAX spells it check_rep).
    out_specs = (PartitionSpec(axis_name), PartitionSpec(axis_name))
    try:
        sharded = shard_map(local_solve, mesh=mesh, in_specs=spec4,
                            out_specs=out_specs, check_vma=False)
    except TypeError:
        sharded = shard_map(local_solve, mesh=mesh, in_specs=spec4,
                            out_specs=out_specs, check_rep=False)

    def solve(data, z0, l0, v0):
        x, core = sharded(data, z0, l0, v0)
        if with_stats:
            return x, core, batch_stats(core)
        return x, core

    # The fused kernel inside needs the raised scoped-VMEM budget; this
    # jit is the top-level compile, so the option rides here.
    return jax.jit(solve, compiler_options=tpu_compiler_options())
