"""Round-5 VERDICT item 2: account for the two-phase headline's gap to
its issue bound. Times each segment of the adaptive pipeline as its own
jit at the headline shapes (B=8192, N=30, nx=8, nu=3, nc=6) and checks
that the segments sum to the measured end-to-end time.

Usage: python scratch/tpu_segments.py [B] [phase1] [P2]
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

import fbstab_tpu  # noqa: F401  (sets LIBTPU_INIT_ARGS before devices)
from bench import build_batch
from fbstab_tpu.models.mpc_qp import (
    MpcQPData, MpcQPDataT, solve_mpc_qp_batch, with_transposed)
from fbstab_tpu.models.refine import refine_solution_mpc, _pnr_df_at_mpc
from fbstab_tpu.models.scaling import ruiz_mpc_scaling
from fbstab_tpu.options import Options
from fbstab_tpu.parallel.adaptive import (
    reliable_leaning, solve_mpc_qp_batch_adaptive_device)
from fbstab_tpu.solver_out import ExitFlag
from fbstab_tpu.utils.compile import tpu_compiler_options

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
PHASE1 = int(sys.argv[2]) if len(sys.argv) > 2 else 16
P2 = int(sys.argv[3]) if len(sys.argv) > 3 else max(B // 4, 128)

opts = Options.single_precision()
opts1 = dataclasses.replace(opts, max_newton_iters=PHASE1, refine_steps=0)
opts2 = dataclasses.replace(reliable_leaning(opts), refine_steps=0)

data, z0, l0, v0 = build_batch(B, 30, 8, 3, 6, jnp.float32)
# keep data raw: bench.py main passes MpcQPData and lets the dispatch transpose

_jit = lambda f: jax.jit(f, compiler_options=tpu_compiler_options())


def timeit(fn, args, probe, n=3, label=""):
    t_c0 = time.perf_counter()
    out = fn(*args)
    np.asarray(probe(out))
    t_compile = time.perf_counter() - t_c0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(probe(out))
        ts.append(time.perf_counter() - t0)
    print(f"{label:28s} {min(ts) * 1e3:9.1f} ms   (compile+first "
          f"{t_compile:.1f}s)", flush=True)
    return min(ts), out


# G. fixed dispatch overhead: a trivial jit at the same data size.
g = _jit(lambda d: d.x0 * 1.0)
t_null, _ = timeit(g, (data,), lambda o: o[:1, :1], label="null dispatch")

# A. Ruiz equilibration alone.
a = _jit(lambda d: jax.vmap(ruiz_mpc_scaling)(d))
t_ruiz, scal = timeit(a, (data,), lambda o: o.kc[:1], label="ruiz(B)")

# B. phase-1 solve (budget 16, no refine), scaling threaded.
b = _jit(lambda d, z, l, v, s: solve_mpc_qp_batch(
    d, z, l, v, opts1, scaling=s))
t_p1, (x1, core1) = timeit(b, (data, z0, l0, v0, scal),
                           lambda o: o[1].residual[:1], label="phase1(B)")
ni1 = np.asarray(core1.newton_iters)
retry = np.asarray(
    (core1.eflag == int(ExitFlag.MAXITERATIONS))
    | (core1.eflag == int(ExitFlag.LINEAR_SOLVER_FAILED)))
print(f"  phase1: retry count = {retry.sum()} / {B}"
      f" (p50 ni {np.percentile(ni1, 50):.0f})", flush=True)


# C. gather (nonzero + take of data/x/scal).
def gather(d, x1z, x1l, x1v, s, ef):
    r = ((ef == int(ExitFlag.MAXITERATIONS))
         | (ef == int(ExitFlag.LINEAR_SOLVER_FAILED)))
    idx = jnp.nonzero(r, size=P2, fill_value=0)[0]
    take = lambda t: jax.tree.map(lambda a: a[idx], t)
    return take(d), take((x1z, x1l, x1v)), take(s), idx


c = _jit(gather)
t_ga, (subd, subx, subs, idx) = timeit(
    c, (data, x1.z, x1.l, x1.v, scal, core1.eflag),
    lambda o: o[3][:1], label=f"gather(P={P2})")

# D. phase-2 solve at P.
d_ = _jit(lambda dd, z, l, v, s: solve_mpc_qp_batch(
    dd, z, l, v, opts2, scaling=s))
t_p2, (x2, core2) = timeit(d_, (subd, subx[0], subx[1], subx[2], subs),
                           lambda o: o[1].residual[:1],
                           label=f"phase2(P={P2})")

# E. refine on the merged full batch (scal threaded).
def refine(dd, xz, xl, xv, xy, ef, ni, s):
    core = core1._replace(eflag=ef, newton_iters=ni)
    from fbstab_tpu.core.variable import Variable
    return refine_solution_mpc(dd, Variable(z=xz, l=xl, v=xv, y=xy),
                               core, opts, scal=s)


e = _jit(refine)
t_rf, _ = timeit(e, (data, x1.z, x1.l, x1.v, x1.y, core1.eflag,
                     core1.newton_iters, scal),
                 lambda o: o[1].residual[:1], label="refine(B)")

# H. the final fresh df evaluation alone.
h = _jit(lambda dd, z, l, v: _pnr_df_at_mpc(
    dd, type("S", (), {"z": z, "l": l, "v": v})(), opts.alpha))
t_df, _ = timeit(h, (data, x1.z, x1.l, x1.v),
                 lambda o: o[:1], label="pnr_df(B)")

# F. full end-to-end two-phase adaptive (the headline program).
f = _jit(lambda dd, z, l, v: solve_mpc_qp_batch_adaptive_device(
    dd, z, l, v, opts, phase1_newton_iters=PHASE1, phase2_size=P2))
t_full, (xf, cf) = timeit(f, (data, z0, l0, v0),
                          lambda o: o[1].residual[:1], label="FULL adaptive")
succ = float(np.mean(np.asarray(cf.eflag) == 0))
print(f"\nFULL: {B / t_full:.0f} QPs/s  success={succ:.4f}")
seg = dict(null=t_null, ruiz=t_ruiz, phase1=t_p1 - t_null,
           gather=t_ga - t_null, phase2=t_p2 - t_null,
           refine=t_rf - t_null, pnr_df=t_df - t_null)
print("segments (ms):", {k: round(v * 1e3, 1) for k, v in seg.items()})
explained = (t_ruiz - t_null) + seg["phase1"] + seg["gather"] \
    + seg["phase2"] + seg["refine"] + t_null
print(f"sum(ruiz+p1+gather+p2+refine)+null = {explained * 1e3:.1f} ms "
      f"vs full {t_full * 1e3:.1f} ms "
      f"({100 * explained / t_full:.1f}% explained)")
