"""Validate the round-5 walk-window refinement on TPU: the two
beyond-envelope contract failures, both equilibration settings.
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
import bench

bench._setup_cache()
import numpy as np
import jax
import jax.numpy as jnp

import fbstab_tpu.models.mpc_qp as mpc
from bench import f64_pnr_np
from fbstab_tpu.models.ocp_fixtures import (
    copolymerization_reactor, double_integrator)
from fbstab_tpu.options import Options

dtype = jnp.float32
opts = Options.single_precision()
noeq = dataclasses.replace(opts, equilibrate=False)


def make_batch(plant, N, B, pert=0.02):
    data, _ = plant(N, dtype=dtype)
    _, nx, nu, nc = mpc.mpc_dims(data)
    batch = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), data)
    rng = np.random.default_rng(0)
    scale = float(np.max(np.abs(np.asarray(data.x0)))) or 0.02
    batch = batch._replace(x0=jnp.asarray(
        np.asarray(data.x0)[None]
        + pert * scale * np.abs(rng.standard_normal((B, nx))), dtype))
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    return (batch, jnp.zeros((B, nz), dtype), jnp.zeros((B, nl), dtype),
            jnp.zeros((B, nv), dtype))


def run(label, args, o):
    batch, z0, l0, v0 = args
    B = z0.shape[0]
    fn = bench._jit(lambda d, z, l, v: mpc.solve_mpc_qp_batch(
        d, z, l, v, o, riccati="auto"))
    t0 = time.perf_counter()
    x, core = fn(batch, z0, l0, v0)
    np.asarray(core.residual)
    tc = time.perf_counter() - t0
    ts = []
    for i in (1, 2):
        fresh = batch._replace(x0=batch.x0 * (1 + 1e-6 * i))
        t0 = time.perf_counter()
        x, core = fn(fresh, z0, l0, v0)
        np.asarray(core.residual)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    ef = np.asarray(core.eflag)
    ok = ef == 0
    msg = (f"{label:36s} {B / t:7.1f} QPs/s success={ok.mean():.3f} "
           f"(compile {tc:.0f}s)")
    if hasattr(x, "to_float64") and ok.any():
        sol = x.to_float64()
        res64 = f64_pnr_np(fresh, sol.z, sol.l, sol.v, o.alpha)
        msg += (f" res64[ok] max={res64[ok].max():.2e} "
                f"frac<=1e-6={float(np.mean(res64[ok] <= 1e-6)):.4f} "
                f"rs max={np.asarray(core.refine_steps).max()}")
    else:
        msg += (f" ni p50="
                f"{np.percentile(np.asarray(core.newton_iters), 50):.0f}")
    print(msg, flush=True)


# NOTE (round 5, post-gate): solve_mpc_qp_batch now applies
# gate_mpc_options, so passing default options (equilibrate=True) at
# these beyond-envelope shapes runs the SAME unequilibrated program as
# `noeq` — both rows below measure the gated product path. To reproduce
# the round-5 eq-stagnation evidence, bypass the gate by passing an
# explicit precomputed `scaling=` (see gate_mpc_options docstring) or
# check out the pre-gate commit (a6de30c^).
di = make_batch(double_integrator, 480, 256)
run("di N=480 contract gated(default) WALK", di, opts)
run("di N=480 contract noeq WALK", di, noeq)
cp = make_batch(copolymerization_reactor, 320, 256)
run("copoly N=320 contract noeq WALK", cp, noeq)
run("copoly N=320 contract gated(default) WALK", cp, opts)
