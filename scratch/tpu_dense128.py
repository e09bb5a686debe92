"""Dense scale tier measurement (round-4 item 5, carried from r2 #8).

The fused dense kernel gates at n <= 64, q <= 128, nl <= 64
(models/dense_qp.py); beyond it a dense batch lands on the vmapped XLA
path with no recorded number. Measure the XLA path at n=128/q=256 and
n=64/q=128 (both tiers at the same B) so the cliff/no-cliff answer is
recorded: is there a dense VMEM cliff like the MPC scan path's 33x one?

Run: python scratch/tpu_dense128.py [B]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fbstab_tpu.models.dense_qp import (  # noqa: E402
    _fused_dense_eligible, solve_dense_qp_batch)
from fbstab_tpu.options import Options  # noqa: E402

bench._setup_cache()
B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
opts = Options.single_precision()
dtype = jnp.float32


def measure(n, q, B):
    data, z0, l0, v0 = bench.build_dense_batch(B, n, q, dtype)
    fn = bench._jit(lambda d, z, l, v: solve_dense_qp_batch(
        d, z, l, v, opts))
    x, core = fn(data, z0, l0, v0)
    np.asarray(core.residual)
    ts = []
    for i in range(1, 4):
        fresh = data._replace(f=data.f * (1 + 1e-6 * i))
        t0 = time.perf_counter()
        x, core = fn(fresh, z0, l0, v0)
        np.asarray(core.residual)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    succ = float(np.mean(np.asarray(core.eflag) == 0))
    tier = "fused" if _fused_dense_eligible(data, dtype) else "xla"
    print(f"dense n={n:4d} q={q:4d} B={B:6d} tier={tier:5s} t={t:.4f}s "
          f"qps={B / t:9.0f} success={succ:.4f}", flush=True)
    return B / t


q64 = measure(64, 128, B)       # largest fused-tier point
q128 = measure(128, 256, B)     # beyond the gate: vmapped XLA path
# Cube-law FLOP scaling would predict ~8x between the sizes; report the
# measured ratio so the cliff/no-cliff answer is quantitative.
print(f"fused(n=64)/xla(n=128) throughput ratio: {q64 / q128:.1f}x "
      f"(pure n^3 FLOP scaling predicts ~8x)")
