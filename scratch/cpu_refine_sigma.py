"""Refine-sigma sweep on CPU (round-4 items 2+7): does a smaller
proximal sigma in the refinement corrections buy a faster linear rate
(lower floor at the same budget)?

Run: python scratch/cpu_refine_sigma.py [plant]
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
from fbstab_tpu.models.refine import refine_solution_mpc  # noqa: E402
from fbstab_tpu.options import Options  # noqa: E402
from bench import f64_pnr_np, executed_refine_steps  # noqa: E402

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
    return f64_pnr_np(batch, np.asarray(s.z, np.float64),
                      np.asarray(s.l, np.float64),
                      np.asarray(s.v, np.float64), opts.alpha)


raw_opts = dataclasses.replace(opts, refine_steps=0)
xr, corer = jax.jit(lambda d, z, l, v: mpc.solve_mpc_qp_batch(
    d, z, l, v, raw_opts))(batch, z0, l0, v0)
print(f"[{name}] raw: max res64 = {res64_of(xr).max():.3e}")

for sig in (3e-4, 1e-4, 3e-5, 1e-5, 3e-6):
    o = dataclasses.replace(opts, sigma0=sig)
    xp, cp = jax.jit(lambda d, x, c, oo=o: refine_solution_mpc(
        d, x, c, oo))(batch, xr, corer)
    r = res64_of(xp)
    print(f"[{name}] refine sigma={sig:.0e}: max res64 = {r.max():.3e} "
          f"steps={executed_refine_steps(cp)}")
