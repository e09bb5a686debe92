"""Two-phase adaptive batch solving (tail-latency mitigation).

A vmapped solve is masked-lockstep: every instance pays for the slowest
one, and on realistic batches the Newton-iteration distribution has a long
tail (measured p50 ~ 16, p100 ~ 95 on the bench workload). The fix exploits
the solver's warmstart contract (the same mechanism the reference documents
for receding-horizon reuse, fbstab_algorithm.h:129-142): run phase 1 with a
small iteration budget, then re-solve only the unconverged instances —
warmstarted from where they stopped — with the full budget. Phase 2's batch
is a gather of the (few) hard instances, so the common case costs
budget-1 iterations instead of p100.

Throughput = B / (t_phase1 + t_phase2) where phase 2 is ~tail-fraction of
the work. Everything stays on device; only the repacking indices cross the
host boundary.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from fbstab_tpu.core.algorithm import fbstab_solve
from fbstab_tpu.options import Options
from fbstab_tpu.solver_out import ExitFlag


def _pad_to(idx: np.ndarray, multiple: int, total: int) -> np.ndarray:
    """Pads an index list to a multiple of `multiple` by repeating the
    first index (duplicates are harmless: same solve, result ignored)."""
    if multiple <= 1 or len(idx) % multiple == 0:
        return idx
    pad = multiple - len(idx) % multiple
    filler = np.full(pad, idx[0] if len(idx) else 0, idx.dtype)
    return np.concatenate([idx, filler])


def solve_batch_adaptive(ops, data, z0, l0, v0, options: Options,
                         phase1_newton_iters: int = 25,
                         pad_multiple: int = 128):
    """Two-phase batched solve over any ProblemOps QP class.

    Returns (Variable, CoreOut) batch-first, equivalent to the one-shot
    batched solve up to instances that converge in phase 2 instead of 1.
    `pad_multiple` keeps phase-2 shapes friendly to the Pallas batch tiles
    (and bounds recompilation: phase-2 batch sizes are rounded up).
    """
    opts1 = dataclasses.replace(
        options.validated(), max_newton_iters=phase1_newton_iters)
    opts2 = options.validated()

    solve1 = jax.jit(jax.vmap(
        lambda d, z, l, v: fbstab_solve(ops, d, z, l, v, opts1)))
    x1, core1 = solve1(data, z0, l0, v0)

    eflag = np.asarray(core1.eflag)
    # Phase 1 exits: SUCCESS / infeasibility verdicts are final;
    # MAXITERATIONS (budget) and LINEAR_SOLVER_FAILED get a second chance
    # with the full budget and the reliable-leaning warmstart.
    retry = np.where((eflag == ExitFlag.MAXITERATIONS)
                     | (eflag == ExitFlag.LINEAR_SOLVER_FAILED))[0]
    if len(retry) == 0:
        return x1, core1

    idx = _pad_to(retry, pad_multiple, eflag.shape[0])
    take = lambda tree: jax.tree.map(lambda a: a[idx], tree)
    sub_data = take(data)
    sub_x = take(x1)

    solve2 = jax.jit(jax.vmap(
        lambda d, z, l, v: fbstab_solve(ops, d, z, l, v, opts2)))
    x2, core2 = solve2(sub_data, sub_x.z, sub_x.l, sub_x.v)

    # Scatter phase-2 results back (drop pad duplicates).
    k = len(retry)
    upd = lambda a, b: a.at[retry].set(b[:k])
    x = jax.tree.map(upd, x1, x2)
    core = jax.tree.map(upd, core1, core2)
    # Iteration counters: phase totals accumulate.
    core = core._replace(
        newton_iters=core.newton_iters.at[retry].add(
            core1.newton_iters[retry]),
        prox_iters=core.prox_iters.at[retry].add(core1.prox_iters[retry]))
    return x, core
