"""Round-5 VERDICT item 3 prototype: can the Python-unrolled refine loop
(models/refine.refine_mpc_batch — compiles OUTSIDE while bodies, where
XLA:CPU df arithmetic is exact) pin the four reference plants near the
1e-6 contract in CPU CI, where the product path's while-body df breakage
floors servo/spacecraft at 2e-4/5e-4?

Sweep sigma x steps per plant, equilibrated coordinates.
"""
import dataclasses
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import sys; sys.path.insert(0, "/root/repo")
import fbstab_tpu.models.mpc_qp as mpc
from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.models.mpc_qp import mpc_dims
from fbstab_tpu.models.refine import refine_mpc_batch
from fbstab_tpu.models.scaling import (
    apply_mpc_scaling, ruiz_mpc_scaling, scale_mpc_variable,
    unscale_mpc_variable_df)
from fbstab_tpu.options import Options

sys.path.insert(0, "/root/repo")
from bench import f64_pnr_np  # noqa: E402

mpc.PALLAS_MODE = "off"

PLANTS = [
    (ocp_fixtures.double_integrator, 20),
    (ocp_fixtures.servo_motor, 25),
    (ocp_fixtures.spacecraft_relative_motion, 40),
    (ocp_fixtures.copolymerization_reactor, 80),
]

B = 4
opts = Options.single_precision()
raw_opts = dataclasses.replace(opts, refine_steps=0)

for plant, N in PLANTS:
    data, _ = plant(N, dtype=jnp.float32)
    _, nx, nu, nc = mpc_dims(data)
    batch = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                         data)
    rng = np.random.default_rng(7)
    scale = float(np.max(np.abs(np.asarray(data.x0)))) or 0.02
    offs = 0.02 * scale * np.abs(rng.standard_normal((B, nx)))
    offs[0] = 0.0
    batch = batch._replace(
        x0=jnp.asarray(np.asarray(data.x0)[None] + offs, jnp.float32))
    nz = (N + 1) * (nx + nu)
    z0 = jnp.zeros((B, nz), jnp.float32)
    l0 = jnp.zeros((B, (N + 1) * nx), jnp.float32)
    v0 = jnp.zeros((B, (N + 1) * nc), jnp.float32)
    x, core = mpc.solve_mpc_qp_batch(batch, z0, l0, v0, raw_opts)
    ef = np.asarray(core.eflag)
    raw64 = f64_pnr_np(batch, np.asarray(x.z, np.float64),
                       np.asarray(x.l, np.float64),
                       np.asarray(x.v, np.float64), opts.alpha)
    print(f"{plant.__name__}: eflag={ef} raw_res64={raw64}")

    scal = jax.vmap(ruiz_mpc_scaling)(batch)
    sdata = jax.vmap(apply_mpc_scaling)(batch, scal)
    xs = scale_mpc_variable(x, scal)
    for sigma in (1e-3, 1e-4, 1e-5):
        for steps in (6, 8, 12):
            ropts = dataclasses.replace(opts, sigma0=sigma)
            refined_s, hist = refine_mpc_batch(sdata, xs, ropts,
                                               steps=steps)
            refined = unscale_mpc_variable_df(refined_s, scal)
            sol = refined.to_float64()
            res64 = f64_pnr_np(batch, sol.z, sol.l, sol.v, opts.alpha)
            print(f"  sigma={sigma:g} steps={steps}: "
                  f"res64={['%.2e' % r for r in res64]}")
