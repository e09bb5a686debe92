"""Round-5 ablations on the headline two-phase configuration (B=8192):
where do the ~30 ms between sum-of-segments and FULL go, and what does
each round-5 product change cost?

 - fallback on/off (the lax.cond overflow pass, runtime-skipped here)
 - P2 512 / 1024 / 2048
 - the XLA wrapper around phase-1 (transpose + scale + unscale passes)
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
from bench import build_batch, f64_pnr_np
from fbstab_tpu.models.mpc_qp import (
    solve_mpc_qp_batch, with_transposed)
from fbstab_tpu.models.scaling import apply_mpc_scaling, ruiz_mpc_scaling
from fbstab_tpu.options import Options
from fbstab_tpu.parallel.adaptive import (
    solve_mpc_qp_batch_adaptive_device)
from fbstab_tpu.utils.compile import tpu_compiler_options

B = 8192
opts = Options.single_precision()
data, z0, l0, v0 = build_batch(B, 30, 8, 3, 6, jnp.float32)
_jit = lambda f: jax.jit(f, compiler_options=tpu_compiler_options())


def timeit(fn, args, probe, label, n=3):
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(probe(out))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(probe(out))
        ts.append(time.perf_counter() - t0)
    print(f"{label:30s} {min(ts) * 1e3:8.1f} ms (compile {tc:.0f}s)",
          flush=True)
    return min(ts), out


# Re-measure null dispatch in this session for drift tracking.
g = _jit(lambda d: d.x0 * 1.0)
timeit(g, (data,), lambda o: o[:1, :1], "null dispatch")

# Wrapper pieces around phase-1.
tr = _jit(lambda d: with_transposed(d))
timeit(tr, (data,), lambda o: o.QT[:1, :1, :1, :1]
       if hasattr(o, "QT") else o.Q[:1, :1, :1, :1], "with_transposed(B)")
ru = _jit(lambda d: jax.vmap(ruiz_mpc_scaling)(d))
_, scal = timeit(ru, (data,), lambda o: o.kc[:1], "ruiz(B)")
ap = _jit(lambda d, s: jax.vmap(apply_mpc_scaling)(d, s))
timeit(ap, (data, scal), lambda o: o.Q[:1, :1, :1, :1],
       "apply_scaling(B)")

# FULL program: fallback on/off x P2.
for fb in (True, False):
    for P2 in (2048, 1024, 512):
        f = _jit(lambda d, z, l, v, fb=fb, P2=P2:
                 solve_mpc_qp_batch_adaptive_device(
                     d, z, l, v, opts, phase1_newton_iters=16,
                     phase2_size=P2, phase2_fallback=fb))
        t, (x, core) = timeit(f, (data, z0, l0, v0),
                              lambda o: o[1].residual[:1],
                              f"FULL fb={int(fb)} P2={P2}")
        succ = float(np.mean(np.asarray(core.eflag) == 0))
        sol = x.to_float64()
        res64 = f64_pnr_np(data, sol.z, sol.l, sol.v, opts.alpha)
        print(f"   -> {B / t:8.0f} QPs/s success={succ:.4f} "
              f"res64 max={res64.max():.2e}", flush=True)
