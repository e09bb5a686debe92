"""Refinement cost anatomy on the headline workload (round-4 item 2).

The contract path spends ~108 ms (23%) in refinement (scratch/tpu_overhead
measured raw=0.348s vs full=0.472s). Decompose it:

  1. fixed part: the two fresh _pnr_df_at_mpc evaluations + Ruiz/scale
  2. per-step slope: time at forced k = 1, 2, 3 steps (target=0)
  3. sigma sweep: does a smaller refine sigma buy a faster linear rate
     (fewer executed steps at the same 1e-6 quality)?

Run: python scratch/tpu_refine_cost.py
"""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch  # noqa: E402
from fbstab_tpu.models.refine import refine_solution_mpc  # noqa: E402
from fbstab_tpu.options import Options  # noqa: E402

bench._setup_cache()
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
N, nx, nu, nc = 30, 8, 3, 6
dtype = jnp.float32
data, z0, l0, v0 = bench.build_batch(B, N, nx, nu, nc, dtype)
full = Options.single_precision()
raw_opts = dataclasses.replace(full, refine_steps=0, retry_failed=False)


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(out[1].residual)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[1].residual)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


# Raw solve once; refine separately so the refine cost is isolated.
fsolve = bench._jit(lambda d, z, l, v: solve_mpc_qp_batch(
    d, z, l, v, raw_opts))
t_raw, (x, core) = timeit(fsolve, data, z0, l0, v0)
print(f"raw solve: {t_raw:.4f}s", flush=True)

# Sigma sweep at the default early-exit target: a smaller refine sigma
# should contract faster per step (fewer executed steps = most of the
# contract path's 106 ms refine cost). Compiles are slow through the
# tunnel, so sweep only the decision-relevant points.
for sig in (3e-4, 3e-5, 1e-5):
    o = dataclasses.replace(full, sigma0=sig)
    fr = bench._jit(lambda d, xx, cc, oo=o: refine_solution_mpc(
        d, xx, cc, oo))
    t, (xr, cr) = timeit(fr, data, x, core)
    steps = bench.executed_refine_steps(cr)
    sol = xr.to_float64()
    res64 = bench.f64_pnr_np(data, sol.z, sol.l, sol.v, full.alpha)
    print(f"refine sigma={sig:.0e}: {t:.4f}s steps={steps} "
          f"res64 med={np.median(res64):.2e} max={res64.max():.2e} "
          f"frac<=1e-6={float(np.mean(res64 <= 1e-6)):.4f}", flush=True)
