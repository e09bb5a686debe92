import sys, time; sys.path.insert(0, "/root/repo")
import bench
bench._setup_cache()
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch
from fbstab_tpu.parallel.adaptive import solve_mpc_qp_batch_adaptive_device
from fbstab_tpu.options import Options

B = 8192
dtype = jnp.float32
data, z0, l0, v0 = bench.build_batch(B, 30, 8, 3, 6, dtype)
# Mixed difficulty: 5% of instances get a 10x larger initial state and a
# tighter input box -> long active-set tails.
rng = np.random.default_rng(5)
hard = rng.random(B) < 0.05
x0 = np.array(data.x0); x0[hard] *= 6.0
d = np.array(data.d); d[hard] = -0.35
data = data._replace(x0=jnp.asarray(x0, dtype), d=jnp.asarray(d, dtype))
opts = dataclasses.replace(Options.single_precision(), refine_steps=0,
                           equilibrate=False, retry_failed=False)

one = bench._jit(lambda dd, z, l, v: solve_mpc_qp_batch(dd, z, l, v, opts))
p2 = dataclasses.replace(opts, max_newton_iters=400, max_prox_iters=60,
                         refine_steps=0)
ada = bench._jit(lambda dd, z, l, v: solve_mpc_qp_batch_adaptive_device(
    dd, z, l, v, opts, phase1_newton_iters=25, phase2_size=1024,
    phase2_options=p2))
ada16 = bench._jit(lambda dd, z, l, v: solve_mpc_qp_batch_adaptive_device(
    dd, z, l, v, opts, phase1_newton_iters=16, phase2_size=1024,
    phase2_options=p2))

for name, fn in (("one-shot", one), ("device-adaptive-25", ada),
                 ("device-adaptive-16", ada16)):
    x, core = fn(data, z0, l0, v0)
    np.asarray(core.residual)
    ts = []
    for i in range(1, 4):
        fresh = data._replace(x0=data.x0 * (1 + 1e-6*i))
        t0 = time.perf_counter()
        x, core = fn(fresh, z0, l0, v0)
        np.asarray(core.residual)
        ts.append(time.perf_counter() - t0)
    ef = np.asarray(core.eflag)
    ni = np.asarray(core.newton_iters)
    print(f"{name}: qps={B/min(ts):.0f} success={float((ef==0).mean()):.4f} "
          f"ni p50={np.percentile(ni,50):.0f} p99={np.percentile(ni,99):.0f} max={ni.max()}",
          flush=True)
