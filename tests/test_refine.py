"""Iterative refinement: f32 solves polished to the 1e-6 contract.

The reference's accuracy contract is a KKT residual <= 1e-6
(fbstab_algorithm-impl.h:43-44); the raw f32 path floors near 1e-5. These
tests run the f32 pipeline end-to-end on CPU (same IEEE f32 arithmetic as
the TPU path) and verify the refined solutions against FULL float64
residual evaluation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import fbstab_tpu.models.mpc_qp as mpc
from bench import build_batch
from fbstab_tpu.core.residuals import (
    penalized_natural_residual,
    residual_norm,
)
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.models.refine import refine_mpc_batch
from fbstab_tpu.options import Options


def _f64_pnr(data, x: Variable, alpha: float) -> np.ndarray:
    """Ground-truth residual: everything recomputed in float64."""
    d64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float64)),
                       data)
    x64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float64)), x)
    # The margin must be consistent in f64: y = b - A z.
    y64 = jax.vmap(lambda d, z: mpc.MPC_OPS.b_vec(d)
                   - mpc.MPC_OPS.gemvA(d, z))(d64, x64.z)
    x64 = x64._replace(y=y64)
    norms = jax.vmap(lambda d, xx: residual_norm(
        penalized_natural_residual(mpc.MPC_OPS, d, xx, alpha)))(d64, x64)
    return np.asarray(norms)


def test_refine_reaches_contract(monkeypatch):
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    B = 48
    opts = Options.single_precision()
    raw_opts = dataclasses.replace(opts, refine_steps=0)
    data, z0, l0, v0 = build_batch(B, 30, 8, 3, 6, jnp.float32)
    x, core = mpc.solve_mpc_qp_batch(data, z0, l0, v0, raw_opts)
    assert np.all(np.asarray(core.eflag) == 0)

    raw = _f64_pnr(data, x, opts.alpha)
    refined, hist = refine_mpc_batch(data, x, opts, steps=3)
    pol64 = refined.to_float64()
    pol = _f64_pnr(data, pol64.hi() if hasattr(pol64, "hi") else pol64,
                   opts.alpha)

    # >= 95% of instances meet the reference contract; in practice all do.
    frac = float(np.mean(pol <= 1e-6))
    assert frac >= 0.95, (
        f"only {frac:.0%} reached 1e-6; raw med {np.median(raw):.2e}, "
        f"polished med {np.median(pol):.2e}")
    # And the polish must actually help vs the raw f32 floor.
    assert np.median(pol) < np.median(raw) * 1e-1

    # The in-pipeline df residual history tracks the f64 truth.
    h_final = np.asarray(hist)[-1]
    np.testing.assert_allclose(h_final, pol, rtol=0.3, atol=1e-9)


def test_refine_dense_reaches_contract(monkeypatch):
    """Dense analog: f32 batch + polish -> f64-verified residual <= 1e-6."""
    import fbstab_tpu.models.dense_qp as dense
    from bench import build_dense_batch
    from fbstab_tpu.models.refine import refine_dense_batch

    monkeypatch.setattr(dense, "PALLAS_MODE", "off")
    jax.clear_caches()

    B = 48
    opts = Options.single_precision()
    data, z0, l0, v0 = build_dense_batch(B, 16, 24, jnp.float32)
    x, core = dense.solve_dense_qp_batch(
        data, z0, l0, v0, dataclasses.replace(opts, refine_steps=0))
    assert np.all(np.asarray(core.eflag) == 0)

    refined, hist = refine_dense_batch(data, x, opts, steps=3)
    sol = refined.to_float64()

    d64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float64)),
                       data)
    x64 = jax.tree.map(lambda a: jnp.asarray(a), sol)
    y64 = jax.vmap(lambda d, z: d.b - d.A @ z)(d64, x64.z)
    x64 = x64._replace(y=y64)
    norms = jax.vmap(lambda d, xx: residual_norm(
        penalized_natural_residual(dense.DENSE_OPS, d, xx, opts.alpha))
    )(d64, x64)
    res = np.asarray(norms)
    assert float(np.mean(res <= 1e-6)) >= 0.95, (
        f"polished med {np.median(res):.2e} max {res.max():.2e}")


def test_refine_f64_materialization_exceeds_f32(monkeypatch):
    """The refined point carried as hi+lo must be strictly more accurate
    than its f32 rounding — i.e. the lo parts carry real information."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    B = 16
    opts = Options.single_precision()
    data, z0, l0, v0 = build_batch(B, 30, 8, 3, 6, jnp.float32)
    x, _ = mpc.solve_mpc_qp_batch(
        data, z0, l0, v0, dataclasses.replace(opts, refine_steps=0))
    refined, _ = refine_mpc_batch(data, x, opts, steps=3)
    full = _f64_pnr(data, refined.to_float64(), opts.alpha)
    rounded = _f64_pnr(data, refined.hi(), opts.alpha)
    assert np.median(full) <= np.median(rounded)
    assert np.median(full) <= 1e-7


def test_dispatcher_refines_by_default(monkeypatch):
    """Round-3 contract integration: Options.single_precision() engages
    refinement inside solve_mpc_qp_batch itself — the returned solution
    is a double-float pair, CoreOut.residual is the df-verified value,
    raw_residual keeps the f32 one, and the f64-recomputed residual of
    the returned point meets the 1e-6 contract (VERDICT r2 item 1)."""
    from fbstab_tpu.models.refine import VariableDF

    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    B = 32
    opts = Options.single_precision()
    assert opts.refine_steps == 48         # the product default
    data, z0, l0, v0 = build_batch(B, 30, 8, 3, 6, jnp.float32)
    x, core = mpc.solve_mpc_qp_batch(data, z0, l0, v0, opts)
    assert np.all(np.asarray(core.eflag) == 0)
    assert isinstance(x, VariableDF)

    res = np.asarray(core.residual)
    raw = np.asarray(core.raw_residual)
    assert np.median(res) < np.median(raw) * 1e-1

    truth = _f64_pnr(data, x.to_float64(), opts.alpha)
    assert float(np.mean(truth <= 1e-6)) >= 0.95
    # The reported (device df) residual tracks the f64 truth.
    np.testing.assert_allclose(res, truth, rtol=0.3, atol=1e-9)


def test_refine_preserves_certificates(monkeypatch):
    """Non-SUCCESS lanes must pass through the refinement hook untouched:
    an infeasibility exit returns a certificate, not a solution."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()
    import dataclasses as dc

    from fbstab_tpu.models.refine import VariableDF
    from fbstab_tpu.solver_out import ExitFlag

    B = 8
    opts = Options.single_precision()
    data, z0, l0, v0 = build_batch(B, 10, 4, 2, 4, jnp.float32)
    # Make instance 3 primal infeasible: contradictory bounds on the
    # first input — row 0 is u0 + d0 <= 0 (u0 <= -2) and row nu+0 is
    # -u0 + d2 <= 0 (u0 >= 3); bench.build_batch has nu = 2, nc = 4.
    d_np = np.array(data.d)
    d_np[3, :, 0] = 2.0
    d_np[3, :, 2] = 3.0
    data = data._replace(d=jnp.asarray(d_np, jnp.float32))

    raw_x, raw_core = mpc.solve_mpc_qp_batch(
        data, z0, l0, v0, dc.replace(opts, refine_steps=0))
    x, core = mpc.solve_mpc_qp_batch(data, z0, l0, v0, opts)
    assert isinstance(x, VariableDF)
    ef = np.asarray(core.eflag)
    assert ef[3] in (int(ExitFlag.PRIMAL_INFEASIBLE),
                     int(ExitFlag.PRIMAL_DUAL_INFEASIBLE))
    np.testing.assert_array_equal(np.asarray(core.eflag),
                                  np.asarray(raw_core.eflag))
    # The certificate lane is bit-identical to the unrefined output,
    # with zero lo parts; its residual report is the double-float
    # evaluation at the SAME point (round 4: the refined path skips the
    # f32 re-evaluation and reports res0 everywhere, so the value agrees
    # with the raw path's f32 evaluation to f32 roundoff, not bitwise).
    np.testing.assert_array_equal(np.asarray(x.z[0])[3],
                                  np.asarray(raw_x.z)[3])
    assert np.all(np.asarray(x.z[1])[3] == 0.0)
    np.testing.assert_allclose(
        float(np.asarray(core.residual)[3]),
        float(np.asarray(raw_core.residual)[3]), rtol=1e-4)


def test_chunked_refine_matches_global(monkeypatch):
    """The chunked early-exit refine loop (lax.map over _refine_chunk
    lanes, round 4) must deliver the same contract as the batch-global
    loop: every lane at the f64-verified target, per-lane step counts
    reported per chunk (a hard chunk does not inflate the others')."""
    import fbstab_tpu.models.refine as refine_mod
    from fbstab_tpu.models.refine import VariableDF

    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    B = 16
    opts = Options.single_precision()
    data, z0, l0, v0 = build_batch(B, 10, 4, 2, 4, jnp.float32)

    # Global loop (chunk >= B).
    monkeypatch.setattr(refine_mod, "_refine_chunk", lambda rows: B)
    xg, cg = mpc.solve_mpc_qp_batch(data, z0, l0, v0, opts)
    # Chunked loop (4 chunks of 4).
    monkeypatch.setattr(refine_mod, "_refine_chunk", lambda rows: 4)
    jax.clear_caches()
    xc, cc = mpc.solve_mpc_qp_batch(data, z0, l0, v0, opts)

    assert isinstance(xc, VariableDF)
    assert np.array_equal(np.asarray(cg.eflag), np.asarray(cc.eflag))
    for x_, c_ in ((xg, cg), (xc, cc)):
        sol = x_.to_float64()
        r64 = _f64_pnr(data, sol, opts.alpha)
        assert np.all(r64 <= 1e-6), r64
        # Reported residual is the fresh loop-independent evaluation.
        np.testing.assert_allclose(np.asarray(c_.residual, np.float64),
                                   r64, rtol=0.3, atol=1e-9)
    # Per-lane executed counts are constant within a chunk.
    steps = np.asarray(cc.refine_steps).reshape(4, 4)
    assert np.all(steps == steps[:, :1])
    assert np.all(steps >= 1)


def test_chunked_raw_residual_matches_host_f64(monkeypatch):
    """res0 — reported as raw_residual (and as residual on non-improved
    lanes) and used in the final accept decision — must be evaluated
    OUTSIDE the chunked lax.map: XLA:CPU breaks the double-float
    error-free transforms inside compiled loop bodies (CLAUDE.md rule
    10; lax.map lowers to scan). With the round-5 entry hoist the value
    matches host-f64 truth at the raw point even when chunking engages
    (ADVICE r4 item 1: CPU tests previously only hit the global
    fallback, B below the chunk size)."""
    import fbstab_tpu.models.refine as refine_mod

    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    B = 16
    opts = Options.single_precision()
    data, z0, l0, v0 = build_batch(B, 10, 4, 2, 4, jnp.float32)
    # The raw point: refine_steps=0 returns the identical pre-refine x.
    x_raw, _ = mpc.solve_mpc_qp_batch(
        data, z0, l0, v0, dataclasses.replace(opts, refine_steps=0))
    truth = _f64_pnr(data, x_raw, opts.alpha)

    monkeypatch.setattr(refine_mod, "_refine_chunk", lambda rows: 4)
    jax.clear_caches()
    _, core = mpc.solve_mpc_qp_batch(data, z0, l0, v0, opts)
    np.testing.assert_allclose(
        np.asarray(core.raw_residual, np.float64), truth,
        rtol=1e-2, atol=1e-9)
