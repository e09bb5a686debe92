"""Diagnose the round-5 beyond-envelope contract failures:
 (a) copoly N=320 contract path, assoc Newton step: 0% success — is the
     assoc span algebra the culprit (try riccati='scan' same config)?
 (b) di N=480: refinement exhausts its budget at ~9e-5 — does a larger
     refine_sigma (better-conditioned corrections) reach the contract?
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


def run(label, args, o, riccati):
    batch, z0, l0, v0 = args
    B = z0.shape[0]
    fn = bench._jit(lambda d, z, l, v: mpc.solve_mpc_qp_batch(
        d, z, l, v, o, riccati=riccati))
    t0 = time.perf_counter()
    x, core = fn(batch, z0, l0, v0)
    np.asarray(core.residual)
    t = time.perf_counter() - t0
    ef = np.asarray(core.eflag)
    uniq, cnt = np.unique(ef, return_counts=True)
    ok = ef == 0
    msg = (f"{label:40s} t={t:6.1f}s success={ok.mean():.3f} "
           f"eflags={dict(zip(uniq.tolist(), cnt.tolist()))}")
    if hasattr(x, "to_float64") and ok.any():
        sol = x.to_float64()
        res64 = f64_pnr_np(batch, sol.z, sol.l, sol.v, o.alpha)
        msg += (f" res64[ok] max={res64[ok].max():.2e} "
                f"frac<=1e-6={float(np.mean(res64[ok] <= 1e-6)):.4f} "
                f"rs max={np.asarray(core.refine_steps).max()}")
    else:
        msg += (f" raw med={np.median(np.asarray(core.raw_residual)):.2e}"
                f" ni p50={np.percentile(np.asarray(core.newton_iters), 50):.0f}")
    print(msg, flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "copoly"):
    args = make_batch(copolymerization_reactor, 320, 256)
    run("copoly N=320 contract SCAN", args, opts, "scan")
    raw = dataclasses.replace(opts, refine_steps=0, equilibrate=False,
                              retry_failed=False)
    run("copoly N=320 raw ASSOC (r4 config)", args, raw, "assoc")
    run("copoly N=320 raw SCAN", args, raw, "scan")
    # equilibrated but unrefined, assoc: isolates scaling-vs-assoc
    eq = dataclasses.replace(opts, refine_steps=0)
    run("copoly N=320 equil-only ASSOC", args, eq, "assoc")

if which in ("all", "di480"):
    args = make_batch(double_integrator, 480, 256)
    for rs in (1e-4, 3e-4):
        o = dataclasses.replace(opts, refine_sigma=rs)
        run(f"di N=480 contract refine_sigma={rs:g}", args, o, "auto")
