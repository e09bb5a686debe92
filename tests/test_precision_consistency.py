"""f32-vs-f64 consistency and NaN-surfacing checks (SURVEY.md §5
"race detection / sanitizers": the reference has none — single-threaded
C++ with -Werror; the TPU-native equivalents are float-consistency tests
and the NaN-as-failure convention)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import fbstab_tpu.models.mpc_qp as mpc
from bench import build_batch, build_dense_batch
from fbstab_tpu.models.dense_qp import solve_dense_qp_batch
from fbstab_tpu.options import Options
from fbstab_tpu.solver_out import ExitFlag


def test_f32_f64_consistency_mpc():
    """The f32 profile must land within its own tolerance band of the f64
    solution on the bench workload: per-instance primal gap bounded by a
    modest multiple of the f32 abs_tol."""
    B = 32
    data64, z0, l0, v0 = build_batch(B, 30, 8, 3, 6, jnp.float64)
    x64, core64 = mpc.solve_mpc_qp_batch(
        data64, z0, l0, v0, Options(abs_tol=1e-9))
    assert np.all(np.asarray(core64.eflag) == int(ExitFlag.SUCCESS))

    to32 = lambda t: jax.tree.map(lambda a: a.astype(jnp.float32), t)
    opts32 = Options.single_precision()
    x32, core32 = mpc.solve_mpc_qp_batch(
        to32(data64), z0.astype(jnp.float32), l0.astype(jnp.float32),
        v0.astype(jnp.float32), opts32)
    assert np.all(np.asarray(core32.eflag) == int(ExitFlag.SUCCESS))

    # The f32 product default refines: the returned solution is a
    # double-float pair whose residual meets the 1e-6 contract, so the
    # primal gap to the f64 oracle tightens far below the raw f32 band.
    from fbstab_tpu.models.refine import VariableDF
    assert isinstance(x32, VariableDF)
    assert np.all(np.asarray(core32.residual)
                  <= np.asarray(core32.raw_residual) + 1e-12)
    sol32 = x32.to_float64()
    gap = np.max(np.abs(sol32.z - np.asarray(x64.z)))
    scale = 1.0 + np.max(np.abs(np.asarray(x64.z)))
    assert gap / scale < 30 * opts32.abs_tol, f"gap {gap:.2e}"
    # Refined accuracy: within a small multiple of the 1e-6 contract.
    assert gap / scale < 1e-4, f"refined gap {gap:.2e}"


def test_f32_f64_consistency_dense():
    B = 32
    data64, z0, l0, v0 = build_dense_batch(B, 16, 24, jnp.float64)
    from fbstab_tpu.models.dense_qp import DENSE_OPS  # noqa: F401
    x64, core64 = solve_dense_qp_batch(
        data64, z0, l0, v0, Options(abs_tol=1e-9))
    assert np.all(np.asarray(core64.eflag) == int(ExitFlag.SUCCESS))

    to32 = lambda t: jax.tree.map(lambda a: a.astype(jnp.float32), t)
    opts32 = Options.single_precision()
    x32, core32 = solve_dense_qp_batch(
        to32(data64), z0.astype(jnp.float32), l0.astype(jnp.float32),
        v0.astype(jnp.float32), opts32)
    assert np.all(np.asarray(core32.eflag) == int(ExitFlag.SUCCESS))
    from fbstab_tpu.models.refine import VariableDF
    assert isinstance(x32, VariableDF)
    sol32 = x32.to_float64()
    gap = np.max(np.abs(sol32.z - np.asarray(x64.z)))
    scale = 1.0 + np.max(np.abs(np.asarray(x64.z)))
    assert gap / scale < 30 * opts32.abs_tol, f"gap {gap:.2e}"
    assert gap / scale < 1e-4, f"refined gap {gap:.2e}"


def test_nan_data_surfaces_as_failure_not_nan_output():
    """NaN-poisoned problem data must come back as a per-instance
    LINEAR_SOLVER_FAILED (or detected-infeasible) flag, never as NaN in a
    SUCCESS lane — the batched analog of the reference's
    throw-on-factorization-failure (fbstab_algorithm-impl.h:263-267)."""
    B = 4
    data, z0, l0, v0 = build_batch(B, 5, 3, 2, 4, jnp.float64)
    Q = np.array(data.Q)
    Q[1] = np.nan                      # poison instance 1 only
    data = data._replace(Q=jnp.asarray(Q))
    x, core = mpc.solve_mpc_qp_batch(data, z0, l0, v0, Options())
    ef = np.asarray(core.eflag)
    assert ef[1] != int(ExitFlag.SUCCESS)
    ok = ef == int(ExitFlag.SUCCESS)
    assert ok[0] and ok[2] and ok[3]   # neighbors unaffected
    assert np.all(np.isfinite(np.asarray(x.z)[ok]))
