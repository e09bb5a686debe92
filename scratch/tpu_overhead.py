"""Where does the contract path's 25% go? (round-4 item 2)

Times the headline workload (B=8192, N=30, nx=8) under option variants:
  raw        : refine 0, equilibrate off, retry off  (the r02 23.2k path)
  +equil     : equilibrate only
  +retry     : equilibrate + retry_failed
  full       : the shipped single_precision default (+ refinement)
and reports the executed refine step count for the full path.
"""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (sets LIBTPU_INIT_ARGS before backend init)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch  # noqa: E402
from fbstab_tpu.options import Options  # noqa: E402

bench._setup_cache()
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
N, nx, nu, nc = 30, 8, 3, 6
dtype = jnp.float32
data, z0, l0, v0 = bench.build_batch(B, N, nx, nu, nc, dtype)

full = Options.single_precision()
variants = {
    "raw": dataclasses.replace(full, refine_steps=0, equilibrate=False,
                               retry_failed=False),
    "+equil": dataclasses.replace(full, refine_steps=0, retry_failed=False),
    "+retry": dataclasses.replace(full, refine_steps=0),
    "full": full,
}

for name, opts in variants.items():
    fn = bench._jit(lambda d, z, l, v, o=opts: solve_mpc_qp_batch(
        d, z, l, v, o))
    x, core = fn(data, z0, l0, v0)
    np.asarray(core.residual)
    ts = []
    for i in range(1, 4):
        fresh = data._replace(x0=data.x0 * (1.0 + 1e-6 * i))
        t0 = time.perf_counter()
        x, core = fn(fresh, z0, l0, v0)
        np.asarray(core.residual)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    extra = ""
    if name == "full":
        extra = (f" refine_steps_executed="
                 f"{bench.executed_refine_steps(core)}")
    succ = float(np.mean(np.asarray(core.eflag) == 0))
    print(f"{name:7s} t={t:.4f}s qps={B / t:9.0f} success={succ:.4f}{extra}",
          flush=True)
