"""Is the CPU-compiled double-float KKT residual itself the ~7e-5 floor?

Evaluates _pnr_df_at_mpc at a refined point on the servo plant, jitted
vs eager vs host-f64 truth. If the jitted CPU value drifts from f64 at
the 1e-4 level, XLA:CPU is breaking the error-free transforms and the
refinement Newton corrections are computed from noise.

Run: python scratch/cpu_df_accuracy.py
"""
import sys

sys.path.insert(0, "/root/repo")
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import fbstab_tpu.models.mpc_qp as mpc  # noqa: E402
from fbstab_tpu.models import ocp_fixtures  # noqa: E402
from fbstab_tpu.models.refine import _pnr_df_at_mpc  # noqa: E402
from fbstab_tpu.options import Options  # noqa: E402
from bench import f64_pnr_np  # noqa: E402

mpc.PALLAS_MODE = "off"

dtype = jnp.float32
opts = Options.single_precision()
data, _ = ocp_fixtures.servo_motor(25, dtype=dtype)
N, nx, nu, nc = mpc.mpc_dims(data)
B = 4
batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
rng = np.random.default_rng(7)
scale = float(np.max(np.abs(np.asarray(data.x0))))
batch = batch._replace(x0=jnp.asarray(
    np.asarray(data.x0)[None]
    + 0.05 * scale * np.abs(rng.standard_normal((B, nx))), dtype))
nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
z0 = jnp.zeros((B, nz), dtype)
l0 = jnp.zeros((B, nl), dtype)
v0 = jnp.zeros((B, nv), dtype)

# The shipped product point (double-float pair).
x, core = jax.jit(lambda d, z, l, v: mpc.solve_mpc_qp_batch(
    d, z, l, v, opts))(batch, z0, l0, v0)

sol = x.to_float64()
truth = f64_pnr_np(batch, sol.z, sol.l, sol.v, opts.alpha)

jitted = np.asarray(jax.jit(lambda d, s: _pnr_df_at_mpc(
    d, s, opts.alpha))(batch, x))
with jax.disable_jit():
    eager = np.asarray(_pnr_df_at_mpc(batch, x, opts.alpha))

print(f"f64 truth   : {truth}")
print(f"df jit CPU  : {jitted}")
print(f"df eager CPU: {eager}")
print(f"jit/truth rel err  : {np.abs(jitted - truth) / truth}")
print(f"eager/truth rel err: {np.abs(eager - truth) / truth}")
print(f"reported core.residual: {np.asarray(core.residual)}")
