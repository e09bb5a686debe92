"""Operating-point sweep of the contract-default paths (round-4 item 8).

CLAUDE.md perf rule 7: a jitted batch call through the tunnel has ~20 ms
fixed overhead and the round-3 default added equilibrate+refine to every
mode without re-sweeping B. Sweeps the headline MPC contract path and the
dense contract path over batch sizes and reports QPs/s at each.

Run: python scratch/tpu_bsweep.py [mpc|dense]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (sets LIBTPU_INIT_ARGS before backend init)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fbstab_tpu.options import Options  # noqa: E402

bench._setup_cache()
which = sys.argv[1] if len(sys.argv) > 1 else "mpc"
opts = Options.single_precision()
dtype = jnp.float32


def timeit(fn, args, perturb):
    out = fn(*args)
    np.asarray(out[1].residual)
    ts = []
    for i in range(1, 4):
        fresh = perturb(args, i)
        t0 = time.perf_counter()
        out = fn(*fresh)
        np.asarray(out[1].residual)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


if which == "mpc":
    from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch

    N, nx, nu, nc = 30, 8, 3, 6
    for B in (4096, 8192, 16384, 32768):
        data, z0, l0, v0 = bench.build_batch(B, N, nx, nu, nc, dtype)
        fn = bench._jit(lambda d, z, l, v: solve_mpc_qp_batch(
            d, z, l, v, opts))
        t, (x, core) = timeit(
            fn, (data, z0, l0, v0),
            lambda a, i: (a[0]._replace(x0=a[0].x0 * (1 + 1e-6 * i)),)
            + a[1:])
        succ = float(np.mean(np.asarray(core.eflag) == 0))
        steps = bench.executed_refine_steps(core)
        print(f"mpc B={B:6d} t={t:.4f}s qps={B / t:9.0f} "
              f"success={succ:.4f} refine_steps={steps}", flush=True)
else:
    from fbstab_tpu.models.dense_qp import solve_dense_qp_batch

    for B in (4096, 8192, 16384, 32768, 65536):
        data, z0, l0, v0 = bench.build_dense_batch(B, 32, 64, dtype)
        fn = bench._jit(lambda d, z, l, v: solve_dense_qp_batch(
            d, z, l, v, opts))
        t, (x, core) = timeit(
            fn, (data, z0, l0, v0),
            lambda a, i: (a[0]._replace(f=a[0].f * (1 + 1e-6 * i)),)
            + a[1:])
        succ = float(np.mean(np.asarray(core.eflag) == 0))
        print(f"dense B={B:6d} t={t:.4f}s qps={B / t:9.0f} "
              f"success={succ:.4f}", flush=True)
