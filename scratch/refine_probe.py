"""Round-3 design probe: after 3-step mixed-precision refinement, is the
f64-verified residual of the F32-ROUNDED point (hi only) under 1e-6, or do
we need to hand the caller the double-float pair to meet the contract?

Run on the real TPU: python scratch/refine_probe.py [B]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (sets LIBTPU_INIT_ARGS before jax init)

bench._setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch  # noqa: E402
from fbstab_tpu.models.refine import refine_mpc_batch  # noqa: E402
from fbstab_tpu.options import Options  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
N, nx, nu, nc = 30, 8, 3, 6
dtype = jnp.float32
opts = Options.single_precision()
data, z0, l0, v0 = bench.build_batch(B, N, nx, nu, nc, dtype)

fs = bench._jit(lambda d, z, l, v: solve_mpc_qp_batch(d, z, l, v, opts))
for steps in (2, 3, 4):
    fr = bench._jit(lambda d, x, s=steps: refine_mpc_batch(d, x, opts,
                                                           steps=s))
    x, core = fs(data, z0, l0, v0)
    np.asarray(core.residual)
    refined, hist = fr(data, x)
    np.asarray(hist[-1])

    sol_df = refined.to_float64()           # hi + lo in f64
    hi = refined.hi()                       # f32 rounding
    res_df = bench.f64_pnr_np(data, sol_df.z, sol_df.l, sol_df.v, opts.alpha)
    res_hi = bench.f64_pnr_np(
        data, np.asarray(hi.z, np.float64), np.asarray(hi.l, np.float64),
        np.asarray(hi.v, np.float64), opts.alpha)
    res_raw = bench.f64_pnr_np(
        data, np.asarray(x.z, np.float64), np.asarray(x.l, np.float64),
        np.asarray(x.v, np.float64), opts.alpha)
    print(f"steps={steps} B={B}")
    print(f"  raw f32 point : med={np.median(res_raw):.3e} "
          f"max={res_raw.max():.3e} frac<=1e-6={np.mean(res_raw <= 1e-6):.4f}")
    print(f"  refined hi+lo : med={np.median(res_df):.3e} "
          f"max={res_df.max():.3e} frac<=1e-6={np.mean(res_df <= 1e-6):.4f}")
    print(f"  refined hi    : med={np.median(res_hi):.3e} "
          f"max={res_hi.max():.3e} frac<=1e-6={np.mean(res_hi <= 1e-6):.4f}")
    # On-device df-evaluated norm at the df point (what the product would
    # report without host work):
    dev = np.asarray(hist[-1], np.float64)
    err = np.abs(dev - res_df) / np.maximum(res_df, 1e-300)
    print(f"  device df-norm vs host f64: max rel err {err.max():.2e}")
