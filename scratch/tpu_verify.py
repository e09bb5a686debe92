import os, sys, time
sys.path.insert(0, "/root/repo")
import bench
bench._setup_cache()
import numpy as np
import jax, jax.numpy as jnp
from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch
from fbstab_tpu.options import Options
from fbstab_tpu.models.refine import VariableDF

B = 1024
data, z0, l0, v0 = bench.build_batch(B, 30, 8, 3, 6, jnp.float32)
opts = Options.single_precision()
fn = bench._jit(lambda d, z, l, v: solve_mpc_qp_batch(d, z, l, v, opts))
t0 = time.time()
x, core = fn(data, z0, l0, v0)
np.asarray(core.residual)
print("compile+run", time.time() - t0, "s", flush=True)
assert isinstance(x, VariableDF)
sol = x.to_float64()
r64 = bench.f64_pnr_np(data, sol.z, sol.l, sol.v, opts.alpha)
ef = np.asarray(core.eflag)
print("TPU fused+refined: success", float((ef==0).mean()),
      "max res64", r64.max(), "med", np.median(r64), flush=True)
assert (ef == 0).all() and r64.max() <= 1e-6
print("TPU VERIFY OK", flush=True)
