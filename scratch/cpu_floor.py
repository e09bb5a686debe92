"""Chase the XLA:CPU double-float noise floor (round-4 item 7).

tests/test_contract.py loosens the servo/spacecraft floors to 3e-4/1e-3
because the CPU-compiled refinement while_loop orbits above the TPU
floor. Reproduce and decompose:

  1. while-loop product path (solve_mpc_qp_batch, the shipped thing)
  2. the same solve + Python-unrolled refine (refine_mpc_batch)
  3. the same solve + eager (non-jit) unrolled refine

If (2)/(3) reach ~1e-6 where (1) does not, the while_loop compilation is
the culprit (barrier or carry-layout issue); if all three floor the same,
the correction solve itself is the limit on CPU.

Run: python scratch/cpu_floor.py [plant]
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
from fbstab_tpu.models.refine import (  # noqa: E402
    refine_mpc_batch, refine_solution_mpc)
from fbstab_tpu.models.scaling import (  # noqa: E402
    apply_mpc_scaling, ruiz_mpc_scaling, scale_mpc_variable,
    unscale_mpc_variable_df)
from fbstab_tpu.options import Options  # noqa: E402
from bench import f64_pnr_np  # noqa: E402

mpc.PALLAS_MODE = "off"

PLANTS = {
    "servo": (ocp_fixtures.servo_motor, 25, 4, 0.05),
    "spacecraft": (ocp_fixtures.spacecraft_relative_motion, 40, 3, 0.002),
    "copoly": (ocp_fixtures.copolymerization_reactor, 80, 2, 0.05),
    "di": (ocp_fixtures.double_integrator, 20, 4, 0.05),
}
name = sys.argv[1] if len(sys.argv) > 1 else "servo"
plant, horizon, B, pert = PLANTS[name]

dtype = jnp.float32
opts = Options.single_precision()
data, _ = plant(horizon, dtype=dtype)
N, nx, nu, nc = mpc.mpc_dims(data)
batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
rng = np.random.default_rng(7)
scale = float(np.max(np.abs(np.asarray(data.x0)))) or 0.02
batch = batch._replace(x0=jnp.asarray(
    np.asarray(data.x0)[None]
    + pert * scale * np.abs(rng.standard_normal((B, nx))), dtype))
nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
z0 = jnp.zeros((B, nz), dtype)
l0 = jnp.zeros((B, nl), dtype)
v0 = jnp.zeros((B, nv), dtype)


def res64_of(sol):
    s = sol.to_float64() if hasattr(sol, "to_float64") else sol
    z = np.asarray(s.z, np.float64)
    l = np.asarray(s.l, np.float64)
    v = np.asarray(s.v, np.float64)
    return f64_pnr_np(batch, z, l, v, opts.alpha)


# 1. shipped product path (while_loop refine inside jit)
x1, core1 = jax.jit(lambda d, z, l, v: mpc.solve_mpc_qp_batch(
    d, z, l, v, opts))(batch, z0, l0, v0)
r1 = res64_of(x1)
print(f"[{name}] 1. shipped while-loop path : max res64 = {r1.max():.3e} "
      f"steps={int(np.max(np.asarray(core1.refine_steps)))}")

# raw solve for paths 2/3
raw_opts = dataclasses.replace(opts, refine_steps=0)
xr, corer = jax.jit(lambda d, z, l, v: mpc.solve_mpc_qp_batch(
    d, z, l, v, raw_opts))(batch, z0, l0, v0)
print(f"[{name}]    raw solve               : max res64 = "
      f"{res64_of(xr).max():.3e}")

# 2. jitted Python-unrolled refine on the scaled problem
def unrolled(d, x, steps):
    scal = jax.vmap(ruiz_mpc_scaling)(d)
    sdata = jax.vmap(apply_mpc_scaling)(d, scal)
    xs = scale_mpc_variable(x, scal)
    refined_s, hist = refine_mpc_batch(sdata, xs, opts, steps=steps)
    return unscale_mpc_variable_df(refined_s, scal), hist


for steps in (3, 6, 12):
    x2, hist = jax.jit(lambda d, x: unrolled(d, x, steps))(batch, xr)
    r2 = res64_of(x2)
    print(f"[{name}] 2. jit unrolled k={steps:2d}      : max res64 = "
          f"{r2.max():.3e}")

# 3. eager unrolled refine
with jax.disable_jit():
    x3, hist = unrolled(batch, xr, 6)
r3 = res64_of(x3)
print(f"[{name}] 3. eager unrolled k=6      : max res64 = {r3.max():.3e}")
