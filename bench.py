"""Headline benchmark: batched MPC QP throughput per chip.

Workload per BASELINE.json config 4: a batch of MPC OCPs with nx=8, nu=3,
N=30 (quadcopter-scale scenario MPC, input-box constrained), solved by the
vmapped Riccati FBstab path in float32 on one chip. Baseline target:
10,000 MPC QPs/sec/chip (BASELINE.json north_star; the reference publishes
no numbers of its own, BASELINE.md).

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Raise the scoped-VMEM budget for the fused solver kernel before libtpu
# initializes (see fbstab_tpu/ops/mpc_solve_pallas.py).
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=65536"
if _VMEM_FLAG not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG).strip()

BASELINE_QPS = 10_000.0


def build_batch(B: int, N: int, nx: int, nu: int, nc: int, dtype):
    """B input-box-constrained OCP instances: shared stable plant, varied
    initial states and cost offsets (scenario-MPC shape)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # Stable-ish discrete dynamics and controllable input map.
    A1 = np.eye(nx) + 0.08 * rng.standard_normal((nx, nx)) / np.sqrt(nx)
    B1 = 0.2 * rng.standard_normal((nx, nu))
    Q1 = np.eye(nx)
    R1 = 0.1 * np.eye(nu)
    S1 = np.zeros((nu, nx))
    # Input box |u| <= 1 -> nc = 2*nu rows; pad with vacuous rows if nc
    # exceeds 2*nu.
    L1 = np.zeros((nc, nu))
    L1[:nu, :] = np.eye(nu)
    L1[nu:2 * nu, :] = -np.eye(nu)
    E1 = np.zeros((nc, nx))
    d1 = -np.ones(nc)

    def tile(M, length):
        return np.broadcast_to(M, (B, length) + M.shape).copy()

    Np1 = N + 1
    data = dict(
        Q=tile(Q1, Np1), R=tile(R1, Np1), S=tile(S1, Np1),
        q=0.1 * rng.standard_normal((B, Np1, nx)),
        r=np.zeros((B, Np1, nu)),
        A=tile(A1, N), B=tile(B1, N), c=np.zeros((B, N, nx)),
        E=tile(E1, Np1), L=tile(L1, Np1), d=tile(d1, Np1),
        x0=rng.standard_normal((B, nx)))

    from fbstab_tpu.models.mpc_qp import MpcQPData
    jdata = MpcQPData(**{k: jnp.asarray(v, dtype) for k, v in data.items()})

    nz, nl, nv = Np1 * (nx + nu), Np1 * nx, Np1 * nc
    z0 = jnp.zeros((B, nz), dtype)
    l0 = jnp.zeros((B, nl), dtype)
    v0 = jnp.zeros((B, nv), dtype)
    return jdata, z0, l0, v0


def build_dense_batch(B: int, n: int, q: int, dtype):
    """B random strictly convex inequality-constrained dense QPs
    (BASELINE.json config 3: 4096 QPs, n=32, q=64)."""
    import jax.numpy as jnp

    from fbstab_tpu.models.dense_qp import DenseQPData

    rng = np.random.default_rng(1)
    M = rng.standard_normal((B, n, n))
    H = M @ np.transpose(M, (0, 2, 1)) / n + 2.0 * np.eye(n)
    f = rng.standard_normal((B, n))
    A = rng.standard_normal((B, q, n))
    b = np.abs(rng.standard_normal((B, q))) + 0.5   # origin feasible
    data = DenseQPData(
        H=jnp.asarray(H, dtype), f=jnp.asarray(f, dtype),
        G=jnp.zeros((B, 0, n), dtype), h=jnp.zeros((B, 0), dtype),
        A=jnp.asarray(A, dtype), b=jnp.asarray(b, dtype))
    z0 = jnp.zeros((B, n), dtype)
    l0 = jnp.zeros((B, 0), dtype)
    v0 = jnp.zeros((B, q), dtype)
    return data, z0, l0, v0


def run_dense(B=None):
    """Secondary benchmark (python bench.py dense): batched dense QPs."""
    import jax
    import jax.numpy as jnp

    from fbstab_tpu.models.dense_qp import solve_dense_qp_batch
    from fbstab_tpu.options import Options

    platform = jax.devices()[0].platform
    if B is None:
        B = 256 if platform == "cpu" else 4096
    dtype = jnp.float32
    opts = Options.single_precision()
    args = build_dense_batch(B, 32, 64, dtype)
    fn = jax.jit(lambda d, z, l, v: solve_dense_qp_batch(d, z, l, v, opts))
    data, z0, l0, v0 = args
    x, core = fn(data, z0, l0, v0)
    success = float(np.mean(np.asarray(core.eflag) == 0))
    times = []
    for i in range(1, 4):
        fresh = data._replace(f=data.f * (1.0 + 1e-6 * i))
        t0 = time.perf_counter()
        x, core = fn(fresh, z0, l0, v0)
        np.asarray(core.residual)
        times.append(time.perf_counter() - t0)
    qps = B / min(times)
    print(f"bench[dense]: platform={platform} B={B} success={success:.3f} "
          f"times={['%.3f' % t for t in times]}", file=sys.stderr)
    print(json.dumps({
        "metric": "dense_qps_per_chip",
        "value": round(qps, 1),
        "unit": "QPs/s",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


def run_warmstart(B=None, steps=8):
    """Receding-horizon sweep (python bench.py warmstart): repeated solves
    with shifted warmstarts, the reference's documented MPC workflow
    (README.md:20) at batch scale — BASELINE.json config 2."""
    import jax
    import jax.numpy as jnp

    from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch
    from fbstab_tpu.options import Options

    platform = jax.devices()[0].platform
    if B is None:
        B = 256 if platform == "cpu" else 8192
    N, nx, nu, nc = 30, 8, 3, 6
    dtype = jnp.float32
    opts = Options.single_precision()
    data, z0, l0, v0 = build_batch(B, N, nx, nu, nc, dtype)

    fn = jax.jit(lambda d, z, l, v: solve_mpc_qp_batch(d, z, l, v, opts))
    x, core = fn(data, z0, l0, v0)           # cold solve + compile
    np.asarray(core.residual)

    # Closed-loop-style sweep: decay x0 toward the origin each step and
    # warmstart from the previous solution.
    t0 = time.perf_counter()
    total = 0
    for k in range(steps):
        data = data._replace(x0=data.x0 * 0.8)
        x, core = fn(data, x.z, x.l, x.v)
        total += B
    np.asarray(core.residual)
    elapsed = time.perf_counter() - t0
    qps = total / elapsed
    success = float(np.mean(np.asarray(core.eflag) == 0))
    print(f"bench[warmstart]: platform={platform} B={B} steps={steps} "
          f"success={success:.3f} t={elapsed:.2f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "mpc_warmstart_qps_per_chip",
        "value": round(qps, 1),
        "unit": "QPs/s",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


def main():
    import os

    import jax

    # Persistent compilation cache: the fused Pallas kernel has a long
    # one-time Mosaic compile; cache it across bench invocations.
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fbstab_tpu.models.mpc_qp import solve_mpc_qp_batch
    from fbstab_tpu.options import Options

    platform = jax.devices()[0].platform
    on_cpu = platform == "cpu"
    B = 256 if on_cpu else 8192
    N, nx, nu, nc = 30, 8, 3, 6
    dtype = jnp.float32
    opts = Options.single_precision()

    args = build_batch(B, N, nx, nu, nc, dtype)
    data, z0, l0, v0 = args

    def compile_and_warm():
        f = jax.jit(
            lambda d, z, l, v: solve_mpc_qp_batch(d, z, l, v, opts))
        xx, cc = f(data, z0, l0, v0)
        np.asarray(cc.residual)
        return f, xx, cc

    # Compile + warm up. Timing forces a (small) device->host residual copy
    # because block_until_ready is unreliable through the axon TPU tunnel.
    # Robustness: if the fused-kernel compile fails (Mosaic/tunnel hiccup),
    # fall back to the XLA path at a smaller batch so the bench always
    # reports a number.
    try:
        fn, x, core = compile_and_warm()
    except Exception as e:  # noqa: BLE001
        print(f"bench: fused path failed ({type(e).__name__}); "
              "falling back to the XLA path", file=sys.stderr)
        import fbstab_tpu.models.mpc_qp as _mpc
        _mpc.PALLAS_MODE = "off"
        jax.clear_caches()
        B = 512
        args = build_batch(B, N, nx, nu, nc, dtype)
        data, z0, l0, v0 = args
        fn, x, core = compile_and_warm()
    success = float(np.mean(np.asarray(core.eflag) == 0))
    if success < 0.99:
        print(f"bench: WARNING only {success:.1%} instances converged",
              file=sys.stderr)

    times = []
    for i in range(1, 4):
        fresh = data._replace(x0=data.x0 * (1.0 + 1e-6 * i))
        t0 = time.perf_counter()
        x, core = fn(fresh, z0, l0, v0)
        np.asarray(core.residual)
        times.append(time.perf_counter() - t0)

    qps = B / min(times)
    print(f"bench: platform={platform} B={B} N={N} nx={nx} nu={nu} nc={nc} "
          f"success={success:.3f} times={['%.3f' % t for t in times]}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "mpc_qps_per_chip",
        "value": round(qps, 1),
        "unit": "QPs/s",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "dense":
        run_dense()
    elif len(sys.argv) > 1 and sys.argv[1] == "warmstart":
        run_warmstart()
    else:
        main()
