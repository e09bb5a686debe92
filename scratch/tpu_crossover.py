"""Place the beyond-envelope scan-vs-assoc crossover in stage dimension.

Measured endpoints (round 4, scratch/tpu_longbatch.py / tpu_copoly320.py):
nx=2 (double integrator, N=480): scan 128.3 QPs/s vs assoc 35.8 (scan 3.6x)
nx=18 (copoly, N=320):           assoc 80.8 QPs/s vs scan 41.8 (assoc 1.9x)
This script fills the middle: servo (nx=4) and spacecraft (nx=6) at N=480.
"""
import sys, time; sys.path.insert(0, "/root/repo")
import bench
bench._setup_cache()
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
import fbstab_tpu.models.mpc_qp as mpc
from fbstab_tpu.models.ocp_fixtures import servo_motor, spacecraft_relative_motion
from fbstab_tpu.options import Options

B = 256
dtype = jnp.float32
N = 480
opts = dataclasses.replace(Options.single_precision(), refine_steps=0,
                           equilibrate=False, retry_failed=False)
for name, plant in (("servo nx=4", servo_motor),
                    ("spacecraft nx=6", spacecraft_relative_motion)):
    data, _ = plant(N, dtype=dtype)
    _, nx, nu, nc = mpc.mpc_dims(data)
    batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
    rng = np.random.default_rng(0)
    batch = batch._replace(
        x0=jnp.asarray(0.02 * np.abs(rng.standard_normal((B, nx))), dtype))
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    z0 = jnp.zeros((B, nz), dtype)
    l0 = jnp.zeros((B, nl), dtype)
    v0 = jnp.zeros((B, nv), dtype)
    for mode in ("assoc", "scan"):
        fn = bench._jit(lambda d, z, l, v, m=mode: mpc.solve_mpc_qp_batch(
            d, z, l, v, opts, riccati=m))
        t0 = time.time()
        x, core = fn(batch, z0, l0, v0)
        np.asarray(core.residual)
        tc = time.time() - t0
        ts = []
        for i in range(1, 3):
            fresh = batch._replace(x0=batch.x0 * (1 + 1e-6 * i))
            t0 = time.perf_counter()
            x, core = fn(fresh, z0, l0, v0)
            np.asarray(core.residual)
            ts.append(time.perf_counter() - t0)
        ef = np.asarray(core.eflag)
        print(f"{name} N={N} {mode}: compile+1st {tc:.0f}s "
              f"qps={B/min(ts):.1f} success={float((ef==0).mean()):.3f}",
              flush=True)
