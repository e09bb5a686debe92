"""Phase-1 budget sweep for DEVICE-SIDE two-phase adaptive on the
UNIFORM headline workload (B=8192, nx=8, contract path).

One-shot lockstep runs 2169 tile-iters (34 per 128-lane tile) against a
per-lane mean of 11.2 Newton iters: every tile waits on its own tail.
Phase 1 capped at k1 + a fixed-size warmstarted phase 2 for the
stragglers converts per-tile tail waits into one compacted straggler
batch. (The HOST adaptive variant is useless for this measurement: its
gather/scatter/refine run eagerly through the tunnel at ~27 ms per
dispatch — measured 811 QPs/s. The device variant is one jit.)

Run: python scratch/tpu_adaptive_sweep.py [budgets...]
"""
import sys, time; sys.path.insert(0, "/root/repo")
import bench
bench._setup_cache()
import numpy as np
import jax, jax.numpy as jnp
from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch
from fbstab_tpu.options import Options
from fbstab_tpu.parallel.adaptive import solve_mpc_qp_batch_adaptive_device

B = 8192
P = 2048                      # phase-2 capacity (stragglers at k1=14: ~868)
N, nx, nu, nc = 30, 8, 3, 6
dtype = jnp.float32
opts = Options.single_precision()
data, z0, l0, v0 = bench.build_batch(B, N, nx, nu, nc, dtype)

budgets = [int(a) for a in sys.argv[1:]] or [12, 16, 20]

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
  try:
    fn = bench._jit(
        lambda d, z, l, v, k=k1: solve_mpc_qp_batch_adaptive_device(
            d, z, l, v, opts, phase1_newton_iters=k, phase2_size=P))
    xa, ca = fn(data, z0, l0, v0)
    np.asarray(ca.residual)
    ts = []
    for i in range(1, 4):
        fresh = data._replace(x0=data.x0 * (1 + 1e-6 * i))
        t0 = time.perf_counter()
        xa, ca = fn(fresh, z0, l0, v0)
        np.asarray(ca.residual)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    ef = np.asarray(ca.eflag)
    sol = xa.to_float64()
    res64 = bench.f64_pnr_np(fresh, sol.z, sol.l, sol.v, opts.alpha)
    ni = np.asarray(ca.newton_iters)
    nretry = int(np.sum(ni > k1))
    print(f"phase1={k1:3d} P={P}: {t:.4f}s = {B/t:.0f} QPs/s "
          f"({t_one/t:.2f}x one-shot) success={float((ef==0).mean()):.4f} "
          f"res64 max={res64.max():.2e} frac<=1e-6="
          f"{float(np.mean(res64 <= 1e-6)):.4f} retried~{nretry}",
          flush=True)
  except Exception as e:
    print(f"phase1={k1}: FAILED {type(e).__name__}: {e}"[:300], flush=True)
