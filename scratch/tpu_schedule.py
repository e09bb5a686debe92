"""Round-5 schedule sweep: multi-stage adaptive schedules vs the r4
two-phase headline on the B=8192 contract workload.

Motivation (scratch/tpu_segments.py, v5e): the compacted re-solve is
nearly free (phase2 at P=2048: 1.9 ms) while every full-batch lockstep
iteration costs ~12 ms/iter-ish in aggregate (phase1 at budget 16:
233 ms). p50 per-lane need is 10, so stage-0 budgets near p50 with a
half-batch intermediate stage should bring the full-batch pass down
from 16 to ~10-12 effective iterations.

Usage: python scratch/tpu_schedule.py [B]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=114688"
if _VMEM_FLAG not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG).strip()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import fbstab_tpu  # noqa: F401
from bench import build_batch, f64_pnr_np
from fbstab_tpu.options import Options
from fbstab_tpu.parallel.adaptive import (
    solve_mpc_qp_batch_adaptive_schedule)
from fbstab_tpu.utils.compile import tpu_compiler_options

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
opts = Options.single_precision()
data, z0, l0, v0 = build_batch(B, 30, 8, 3, 6, jnp.float32)

SCHEDULES = {
    # r4 headline as shipped (two-stage), for the same-session baseline.
    "16_P2048r": [(16, None, "same"), (None, 2048, "reliable")],
    # shrink P2 toward the measured tail (924/8192 stragglers).
    "16_P1024r": [(16, None, "same"), (None, 1024, "reliable")],
    # three-stage: stage-0 at ~p50, same-profile intermediate.
    "10_4096s16_P1024r": [(10, None, "same"), (16, 4096, "same"),
                          (None, 1024, "reliable")],
    "11_4096s18_P1024r": [(11, None, "same"), (18, 4096, "same"),
                          (None, 1024, "reliable")],
    "12_4096s20_P1024r": [(12, None, "same"), (20, 4096, "same"),
                          (None, 1024, "reliable")],
    # aggressive: two same-profile compactions.
    "9_4096s14_2048s20_P512r": [(9, None, "same"), (14, 4096, "same"),
                                (20, 2048, "same"),
                                (None, 512, "reliable")],
}


def run(name, stages):
    fn = jax.jit(
        lambda d, z, l, v: solve_mpc_qp_batch_adaptive_schedule(
            d, z, l, v, opts, stages),
        compiler_options=tpu_compiler_options())
    t0 = time.perf_counter()
    x, core = fn(data, z0, l0, v0)
    np.asarray(core.residual)
    t_compile = time.perf_counter() - t0
    ts = []
    for i in range(1, 4):
        fresh = data._replace(x0=data.x0 * (1.0 + 1e-6 * i))
        t0 = time.perf_counter()
        x, core = fn(fresh, z0, l0, v0)
        np.asarray(core.residual)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    succ = float(np.mean(np.asarray(core.eflag) == 0))
    sol = x.to_float64()
    res64 = f64_pnr_np(fresh, sol.z, sol.l, sol.v, opts.alpha)
    print(f"{name:28s} {B / t:8.0f} QPs/s  t={t * 1e3:6.1f} ms  "
          f"success={succ:.4f}  res64 max={res64.max():.2e} "
          f"frac<=1e-6={float(np.mean(res64 <= 1e-6)):.4f}  "
          f"(compile {t_compile:.0f}s)", flush=True)
    return B / t, succ, float(res64.max())


for name, stages in SCHEDULES.items():
    try:
        run(name, stages)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
