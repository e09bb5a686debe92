"""copoly N=320 contract failure triage (round 5): the equilibrated
contract compilation stagnates on TPU while raw/equil-only converge.
Tests: (a) contract with equilibrate=False (refine preconditions on the
raw problem), (b) smaller batch B=32 contract (B-dependence), at both
riccati modes where cheap.
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
from fbstab_tpu.models.ocp_fixtures import copolymerization_reactor
from fbstab_tpu.options import Options

dtype = jnp.float32
opts = Options.single_precision()


def make_batch(B, N=320, pert=0.02):
    data, _ = copolymerization_reactor(N, dtype=dtype)
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
    ts = []
    for i in range(1, 3):
        fresh = batch._replace(x0=batch.x0 * (1 + 1e-6 * i))
        t0 = time.perf_counter()
        x, core = fn(fresh, z0, l0, v0)
        np.asarray(core.residual)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    ef = np.asarray(core.eflag)
    ok = ef == 0
    uniq, cnt = np.unique(ef, return_counts=True)
    msg = (f"{label:44s} {B / t:7.1f} QPs/s success={ok.mean():.3f} "
           f"eflags={dict(zip(uniq.tolist(), cnt.tolist()))} "
           f"ni p50={np.percentile(np.asarray(core.newton_iters), 50):.0f}")
    if hasattr(x, "to_float64") and ok.any():
        sol = x.to_float64()
        res64 = f64_pnr_np(fresh, sol.z, sol.l, sol.v, o.alpha)
        msg += (f" res64[ok] max={res64[ok].max():.2e} "
                f"frac<=1e-6={float(np.mean(res64[ok] <= 1e-6)):.4f} "
                f"rs max={np.asarray(core.refine_steps).max()}")
    print(msg, flush=True)


noeq = dataclasses.replace(opts, equilibrate=False)
args256 = make_batch(256)
run("copoly N=320 B=256 contract-noeq SCAN", args256, noeq, "scan")
run("copoly N=320 B=256 contract-noeq ASSOC", args256, noeq, "assoc")
args32 = make_batch(32)
run("copoly N=320 B=32 contract SCAN", args32, opts, "scan")
