"""Diagnose the perturbed-Spacecraft refinement tail: are the lanes that
miss 1e-6 budget-bound (steps == refine_steps) or stalled?"""
import sys; sys.path.insert(0, "/root/repo")
import bench
bench._setup_cache()
import numpy as np
import jax, jax.numpy as jnp
from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.models.mpc_qp import mpc_dims, solve_mpc_qp_batch
from fbstab_tpu.options import Options
from fbstab_tpu.solver_out import ExitFlag

B, N, pert = 128, 40, 0.001
dtype = jnp.float32
opts = Options.single_precision()
data, _ = ocp_fixtures.spacecraft_relative_motion(N, dtype=dtype)
_, nx, nu, nc = mpc_dims(data)
batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
rng = np.random.default_rng(7)
scale = float(np.max(np.abs(np.asarray(data.x0)))) or 0.02
offs = pert * scale * np.abs(rng.standard_normal((B, nx)))
offs[0] = 0.0
batch = batch._replace(x0=jnp.asarray(np.asarray(data.x0)[None] + offs, dtype))
nz = (N + 1) * (nx + nu)
z0 = jnp.zeros((B, nz), dtype)
l0 = jnp.zeros((B, (N + 1) * nx), dtype)
v0 = jnp.zeros((B, (N + 1) * nc), dtype)
fn = bench._jit(lambda d, z, l, v: solve_mpc_qp_batch(d, z, l, v, opts))
x, core = fn(batch, z0, l0, v0)
res = np.asarray(core.residual)
np.asarray(res)
ef = np.asarray(core.eflag)
steps = np.asarray(core.refine_steps)
raw = np.asarray(core.raw_residual)
sol = x.to_float64()
res64 = bench.f64_pnr_np(batch, sol.z, sol.l, sol.v, opts.alpha)
print(f"steps: min={steps.min()} max={steps.max()} mean={steps.mean():.1f}")
bad = np.where((ef == int(ExitFlag.SUCCESS)) & (res64 > 1e-6))[0]
print(f"{len(bad)} lanes over 1e-6:")
for i in bad:
    print(f"  lane {i}: res64={res64[i]:.3e} reported={res[i]:.3e} "
          f"raw={raw[i]:.3e} steps={steps[i]} eflag={ef[i]}")
ni = np.asarray(core.newton_iters) if hasattr(core, "newton_iters") else None
if ni is not None and len(bad):
    print(f"  newton_iters on bad lanes: {ni[bad]}")
    print(f"  newton_iters p50={np.percentile(ni, 50)} max={ni.max()}")
