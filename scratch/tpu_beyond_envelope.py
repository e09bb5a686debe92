"""Round-5 VERDICT item 5 + ADVICE item 3: the beyond-kernel-envelope
tier measured on the CONTRACT path (shipped defaults: equilibrate +
chunked refine + conditional retry), plus the scan-vs-assoc dispatch
re-checked at B=2048 (the vmapped-scan VMEM-cliff question).

Shapes: copoly-class nx=18 at N=320, double-integrator-class nx=2 at
N=480 (both beyond the kernel envelope N<=160), B=256 contract path;
then nx=2/N=480 and nx=4/N=480 raw tier at B=2048 scan-vs-assoc.
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
    copolymerization_reactor, double_integrator, servo_motor)
from fbstab_tpu.options import Options

dtype = jnp.float32


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


def run(label, args, opts, riccati="auto", verify=True):
    batch, z0, l0, v0 = args
    B = z0.shape[0]
    fn = bench._jit(lambda d, z, l, v: mpc.solve_mpc_qp_batch(
        d, z, l, v, opts, riccati=riccati))
    t0 = time.perf_counter()
    x, core = fn(batch, z0, l0, v0)
    np.asarray(core.residual)
    tc = time.perf_counter() - t0
    ts = []
    for i in range(1, 3):
        fresh = batch._replace(x0=batch.x0 * (1 + 1e-6 * i))
        t0 = time.perf_counter()
        x, core = fn(fresh, z0, l0, v0)
        np.asarray(core.residual)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    ef = np.asarray(core.eflag)
    succ = float((ef == 0).mean())
    uniq, cnt = np.unique(ef, return_counts=True)
    msg = (f"{label:34s} {B / t:8.1f} QPs/s  t={t:6.3f}s "
           f"success={succ:.3f} eflags={dict(zip(uniq.tolist(), cnt.tolist()))} "
           f"(compile {tc:.0f}s)")
    if verify:
        sol = (x.to_float64() if hasattr(x, "to_float64") else None)
        ok = ef == 0
        if sol is not None and ok.any():
            res64 = f64_pnr_np(fresh, sol.z, sol.l, sol.v, opts.alpha)
            msg += (f"  res64 max={res64[ok].max():.2e} "
                    f"frac<=1e-6={float(np.mean(res64[ok] <= 1e-6)):.4f}")
            rs = np.asarray(core.refine_steps)
            msg += f" refine_steps max={rs.max()}"
        elif sol is not None:
            msg += (f"  NO SUCCESS LANES; raw med="
                    f"{np.median(np.asarray(core.raw_residual)):.2e} "
                    f"ni p50={np.percentile(np.asarray(core.newton_iters), 50):.0f}")
    print(msg, flush=True)


contract = Options.single_precision()
raw = dataclasses.replace(contract, refine_steps=0, equilibrate=False,
                          retry_failed=False)

# --- contract path, beyond-envelope shapes, B=256 (VERDICT item 5) ---
print("== contract path (shipped defaults), B=256 ==", flush=True)
run("copoly nx=18 N=320 auto(assoc)", make_batch(
    copolymerization_reactor, 320, 256), contract)
run("di nx=2 N=480 auto(scan)", make_batch(
    double_integrator, 480, 256), contract)

# --- ADVICE item 3: scan-vs-assoc at B=2048, small stage dims ---
print("== raw tier, B=2048, scan vs assoc (VMEM-cliff check) ==",
      flush=True)
for plant, N, nm in ((double_integrator, 480, "di nx=2"),
                     (servo_motor, 480, "servo nx=4")):
    args = make_batch(plant, N, 2048)
    for mode in ("scan", "assoc"):
        run(f"{nm} N={N} B=2048 {mode}", args, raw, riccati=mode,
            verify=False)
