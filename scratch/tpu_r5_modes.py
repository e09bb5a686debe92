"""Round-5 items 6/7/8 measurements:
 - warmstart (receding-horizon) sweep with the device two-phase inside
   the scan, phase-1 budget swept (warmstarted steps need fewer iters)
 - dense beyond-kernel tier (n=128, q=256) one-shot vs two-phase
 - dense saturated-throughput check at B=32768 / 65536 (post chunk-256)

Usage: python scratch/tpu_r5_modes.py [warmstart|dense128|densesweep]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=114688"
if _VMEM_FLAG not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG).strip()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import fbstab_tpu  # noqa: F401
from bench import build_batch, build_dense_batch, f64_pnr_np
from fbstab_tpu.options import Options
from fbstab_tpu.utils.compile import tpu_compiler_options

_jit = lambda f: jax.jit(f, compiler_options=tpu_compiler_options())
opts = Options.single_precision()


def warmstart():
    from fbstab_tpu.models.receding_horizon import simulate_batch

    B, steps = 8192, 8
    dataB, _, _, _ = build_batch(B, 30, 8, 3, 6, jnp.float32)
    shared = jax.tree.map(lambda a: a[0], dataB)
    x0s = dataB.x0

    def run(label, **kw):
        fn = _jit(lambda d, x0: simulate_batch(d, steps, x0, opts, **kw))
        t0 = time.perf_counter()
        res = fn(shared, x0s)
        np.asarray(res.residual)
        tc = time.perf_counter() - t0
        x0p = x0s * 1.0001
        np.asarray(x0p)
        t0 = time.perf_counter()
        res = fn(shared, x0p)
        np.asarray(res.residual)
        t = time.perf_counter() - t0
        succ = float(np.mean(np.asarray(res.eflag) == 0))
        ni = np.asarray(res.newton_iters)
        print(f"warmstart {label:26s} {B * steps / t:8.0f} QPs/s "
              f"t={t:.2f}s success={succ:.4f} "
              f"ni p50={np.percentile(ni, 50):.0f} "
              f"p99={np.percentile(ni, 99):.0f} max={ni.max()} "
              f"(compile {tc:.0f}s)", flush=True)

    run("one-shot")
    for p1 in (6, 8, 12, 16):
        run(f"adaptive p1={p1}", adaptive=True, phase1_newton_iters=p1)


def dense128():
    from fbstab_tpu.models.dense_qp import solve_dense_qp_batch
    from fbstab_tpu.parallel.adaptive import (
        solve_dense_qp_batch_adaptive_device)

    B, n, q = 2048, 128, 256
    data, z0, l0, v0 = build_dense_batch(B, n, q, jnp.float32)

    def run(label, mk):
        fn = _jit(mk)
        t0 = time.perf_counter()
        x, core = fn(data, z0, l0, v0)
        np.asarray(core.residual)
        tc = time.perf_counter() - t0
        ts = []
        for i in range(1, 3):
            fresh = data._replace(f=data.f * (1.0 + 1e-6 * i))
            t0 = time.perf_counter()
            x, core = fn(fresh, z0, l0, v0)
            np.asarray(core.residual)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        ef = np.asarray(core.eflag)
        succ = float((ef == 0).mean())
        ni = np.asarray(core.newton_iters)
        print(f"dense128 {label:22s} {B / t:8.1f} QPs/s t={t:.3f}s "
              f"success={succ:.4f} ni p50={np.percentile(ni, 50):.0f} "
              f"max={ni.max()} (compile {tc:.0f}s)", flush=True)

    run("one-shot", lambda d, z, l, v: solve_dense_qp_batch(
        d, z, l, v, opts))
    for p1 in (10, 16, 25):
        run(f"adaptive p1={p1}",
            lambda d, z, l, v, p1=p1: solve_dense_qp_batch_adaptive_device(
                d, z, l, v, opts, phase1_newton_iters=p1,
                phase2_size=max(B // 8, 128)))


def densesweep():
    from fbstab_tpu.models.dense_qp import solve_dense_qp_batch

    for B in (32768, 65536):
        data, z0, l0, v0 = build_dense_batch(B, 32, 64, jnp.float32)
        fn = _jit(lambda d, z, l, v: solve_dense_qp_batch(d, z, l, v,
                                                          opts))
        t0 = time.perf_counter()
        x, core = fn(data, z0, l0, v0)
        np.asarray(core.residual)
        tc = time.perf_counter() - t0
        ts = []
        for i in range(1, 4):
            fresh = data._replace(f=data.f * (1.0 + 1e-6 * i))
            t0 = time.perf_counter()
            x, core = fn(fresh, z0, l0, v0)
            np.asarray(core.residual)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        succ = float(np.mean(np.asarray(core.eflag) == 0))
        print(f"dense B={B}: {B / t:9.0f} QPs/s t={t:.3f}s "
              f"success={succ:.4f} (compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "warmstart"
    dict(warmstart=warmstart, dense128=dense128,
         densesweep=densesweep)[mode]()
