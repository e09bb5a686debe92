"""The MXU question, measured (round-4 item 1).

Can lax.dot_general / the MXU beat the VPU column-unrolled stage matvec
on the copoly-class stage blocks (nx=18, N=80, 128-lane tiles)?

Structure of the argument:

1. PER-LANE stage matrices (the general case: every batch lane has its
   own matrix, e.g. the Riccati factorization blocks, whose per-lane PFB
   weights make them per-lane even for shared plants):
   c[i, b] = sum_j M[i, j, b] * w[j, b] is a lane-batched matmul, NOT a
   matmul — the MXU computes one shared contraction c[i,k] = A[i,:]@B[:,k].
   The only MXU encoding is block-diagonal replication: 128 18x18 blocks
   in a 2304x2304 operand = (18/2304)*18 useful columns -> 1.98%
   utilization, i.e. the MXU does 50x the useful FLOPs. Not measurable
   because it is not even expressible in Mosaic without materializing the
   2304x2304 operand (2.6 MB per stage per operand). The VPU form does
   exactly the useful FLOPs at full 8x128 vector width.

2. SHARED stage matrices (the copoly bench's plant data is broadcast):
   out(s) = M @ w(s) IS a real (18,18)@(18,128) matmul per stage. This
   script measures, in-kernel on hardware:
     a. vpu_perlane: the shipped _stage_matvec form on (N1,18,18,128)
     b. vpu_shared : the same unrolled form with a (N1,18,18) shared M
     c. mxu_shared : per-stage jnp.dot on the shared M (static unroll)
   and reports ns per stage-matvec for each.

Run: python scratch/tpu_mxu.py [T_iters]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (sets LIBTPU_INIT_ARGS before backend init)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from fbstab_tpu.utils.compile import VMEM_LIMIT_KIB  # noqa: E402

bench._setup_cache()

N1, n, B = 81, 18, 128
T = int(sys.argv[1]) if len(sys.argv) > 1 else 200
SCALE = 0.9 / n  # keep the iterated vector bounded


def vpu_perlane_kernel(M_ref, w_ref, out_ref):
    def body(t, w):
        ws = w.reshape(N1, n, B)
        acc = M_ref[:, :, 0] * ws[:, 0][:, None]
        for j in range(1, n):
            acc = acc + M_ref[:, :, j] * ws[:, j][:, None]
        return (acc * SCALE).reshape(N1 * n, B)

    out_ref[:] = lax.fori_loop(0, T, body, w_ref[:])


def vpu_shared_kernel(M_ref, w_ref, out_ref):
    def body(t, w):
        ws = w.reshape(N1, n, B)
        acc = M_ref[:, :, 0][:, :, None] * ws[:, 0][:, None]
        for j in range(1, n):
            acc = acc + M_ref[:, :, j][:, :, None] * ws[:, j][:, None]
        return (acc * SCALE).reshape(N1 * n, B)

    out_ref[:] = lax.fori_loop(0, T, body, w_ref[:])


def mxu_shared_kernel(M_ref, w_ref, out_ref, scr):
    def body(t, _):
        # Read the carried vector from whichever buffer holds it, do one
        # (18,18)@(18,128) MXU dot per stage (static unroll), write back.
        w = scr[:]
        outs = []
        for s in range(N1):
            Ms = M_ref[s]                       # (n, n)
            ws = w[s * n:(s + 1) * n, :]        # (n, B)
            outs.append(jnp.dot(Ms, ws, preferred_element_type=jnp.float32))
        scr[:] = jnp.concatenate(outs, axis=0) * SCALE
        return 0

    scr[:] = w_ref[:]
    lax.fori_loop(0, T, body, 0)
    out_ref[:] = scr[:]


def run(name, kernel, M, w, scratch=False):
    kw = dict(
        out_shape=jax.ShapeDtypeStruct((N1 * n, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_KIB * 1024),
    )
    if scratch:
        kw["scratch_shapes"] = [pltpu.VMEM((N1 * n, B), jnp.float32)]
    from fbstab_tpu.utils.compile import tpu_compiler_options
    fn = jax.jit(lambda M_, w_: pl.pallas_call(kernel, **kw)(M_, w_),
                 compiler_options=tpu_compiler_options())
    out = fn(M, w)
    np.asarray(out)                      # warm + materialize
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(M, w)
        np.asarray(out[:1, :1])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    per_mv = t / (T * N1)
    print(f"{name:12s} total={t * 1e3:8.3f} ms  "
          f"per stage-matvec={per_mv * 1e9:8.1f} ns  "
          f"(T={T}, N1={N1}, n={n}, B={B})", flush=True)
    return per_mv, np.asarray(out)


rng = np.random.default_rng(0)
Mp = jnp.asarray(rng.standard_normal((N1, n, n, B)), jnp.float32)
Ms = jnp.asarray(rng.standard_normal((N1, n, n)), jnp.float32)
w0 = jnp.asarray(rng.standard_normal((N1 * n, B)), jnp.float32)

t_vpu_pl, _ = run("vpu_perlane", vpu_perlane_kernel, Mp, w0)
t_vpu_sh, o_v = run("vpu_shared", vpu_shared_kernel, Ms, w0)
t_mxu_sh, o_m = run("mxu_shared", mxu_shared_kernel, Ms, w0, scratch=True)
err = float(np.max(np.abs(o_v - o_m)) / (np.max(np.abs(o_v)) + 1e-30))
print(f"mxu-vs-vpu shared parity: rel err {err:.2e}")
print(f"speedups: shared-VPU/perlane {t_vpu_pl / t_vpu_sh:.2f}x, "
      f"shared-MXU/perlane {t_vpu_pl / t_mxu_sh:.2f}x, "
      f"shared-MXU/shared-VPU {t_vpu_sh / t_mxu_sh:.2f}x")
