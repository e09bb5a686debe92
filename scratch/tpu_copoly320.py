import sys, time; sys.path.insert(0, "/root/repo")
import bench
bench._setup_cache()
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
import fbstab_tpu.models.mpc_qp as mpc
from fbstab_tpu.models.ocp_fixtures import copolymerization_reactor
from fbstab_tpu.options import Options

B = 256
dtype = jnp.float32
N = 320   # beyond the N=160 kernel cap, copoly stage dims (nx=18)
data, _ = copolymerization_reactor(N, dtype=dtype)
_, nx, nu, nc = mpc.mpc_dims(data)
batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
rng = np.random.default_rng(0)
batch = batch._replace(x0=jnp.asarray(0.02*rng.standard_normal((B, nx)), dtype))
nz, nl, nv = (N+1)*(nx+nu), (N+1)*nx, (N+1)*nc
z0 = jnp.zeros((B, nz), dtype); l0 = jnp.zeros((B, nl), dtype); v0 = jnp.zeros((B, nv), dtype)
opts = dataclasses.replace(Options.single_precision(), refine_steps=0, equilibrate=False,
                           retry_failed=False)
for mode in ("assoc", "scan"):
    fn = bench._jit(lambda d, z, l, v, m=mode: mpc.solve_mpc_qp_batch(d, z, l, v, opts, riccati=m))
    t0 = time.time()
    x, core = fn(batch, z0, l0, v0)
    np.asarray(core.residual)
    tc = time.time() - t0
    ts = []
    for i in range(1, 3):
        fresh = batch._replace(x0=batch.x0 * (1 + 1e-6*i))
        t0 = time.perf_counter()
        x, core = fn(fresh, z0, l0, v0)
        np.asarray(core.residual)
        ts.append(time.perf_counter() - t0)
    ef = np.asarray(core.eflag)
    print(f"{mode}: compile {tc:.0f}s qps={B/min(ts):.1f} success={float((ef==0).mean()):.3f}",
          flush=True)
