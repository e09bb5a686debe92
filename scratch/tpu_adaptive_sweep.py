"""Phase-1 budget sweep for two-phase adaptive on the UNIFORM headline
workload (B=8192, nx=8, contract path).

One-shot lockstep runs 2169 tile-iters (34 per 128-lane tile) against a
per-lane mean of 11.2 Newton iters: every tile waits on its own tail. An
aggressive phase-1 budget caps that wait and re-solves the stragglers
compacted into few tiles. The adaptive module's docstring records
"roughly throughput-neutral" from an early phase1=25 measurement on the
raw path; this sweep asks whether a tighter budget beats one-shot under
the shipped contract defaults.

Run: python scratch/tpu_adaptive_sweep.py [budgets...]
"""
import sys, time; sys.path.insert(0, "/root/repo")
import bench
bench._setup_cache()
import numpy as np
import jax, jax.numpy as jnp
from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch
from fbstab_tpu.options import Options
from fbstab_tpu.parallel.adaptive import solve_mpc_qp_batch_adaptive

B = 8192
N, nx, nu, nc = 30, 8, 3, 6
dtype = jnp.float32
opts = Options.single_precision()
data, z0, l0, v0 = bench.build_batch(B, N, nx, nu, nc, dtype)

budgets = [int(a) for a in sys.argv[1:]] or [10, 14, 18, 25]

one = bench._jit(lambda d, z, l, v: solve_mpc_qp_batch(d, z, l, v, opts))
x, core = one(data, z0, l0, v0)
np.asarray(core.residual)
ts = []
for i in range(1, 4):
    fresh = data._replace(x0=data.x0 * (1 + 1e-6 * i))
    t0 = time.perf_counter()
    _, c = one(fresh, z0, l0, v0)
    np.asarray(c.residual)
    ts.append(time.perf_counter() - t0)
t_one = min(ts)
print(f"one-shot: {t_one:.4f}s = {B/t_one:.0f} QPs/s "
      f"ni_mean={float(np.mean(np.asarray(c.newton_iters))):.1f}",
      flush=True)

for k1 in budgets:
    fn = lambda d: solve_mpc_qp_batch_adaptive(
        d, z0, l0, v0, opts, phase1_newton_iters=k1)
    xa, ca = fn(data)
    np.asarray(ca.residual)
    ts = []
    for i in range(1, 4):
        fresh = data._replace(x0=data.x0 * (1 + 1e-6 * i))
        t0 = time.perf_counter()
        xa, ca = fn(fresh)
        np.asarray(ca.residual)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    ef = np.asarray(ca.eflag)
    sol = xa.to_float64()
    res64 = bench.f64_pnr_np(fresh, sol.z, sol.l, sol.v, opts.alpha)
    nretry = int(np.sum((ef == 0) & (np.asarray(ca.newton_iters) > k1)))
    print(f"phase1={k1:3d}: {t:.4f}s = {B/t:.0f} QPs/s "
          f"({t_one/t:.2f}x one-shot) success={float((ef==0).mean()):.4f} "
          f"res64 max={res64.max():.2e} frac<=1e-6="
          f"{float(np.mean(res64 <= 1e-6)):.4f} retried~{nretry}",
          flush=True)
