"""Smoke tests for bench.py entry points (CPU, tiny shapes).

The driver runs `python bench.py` at the end of every round; these tests
keep the bench harness itself from rotting between runs. Each mode must
print exactly one JSON line with the metric/value/unit/vs_baseline keys
(the bench contract) and report full convergence on its easy smoke
workload. Heavy modes with their own suite coverage (sharded, sparse,
diff, longhorizon) are exercised by their library tests instead.
"""

import json
import sys

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench  # noqa: E402


def _run_json(capsys, fn, *args, **kwargs):
    fn(*args, **kwargs)
    cap = capsys.readouterr()
    out = cap.out.strip().splitlines()
    assert len(out) == 1, f"expected one JSON line, got {out}"
    rec = json.loads(out[0])
    # The driver contract requires these four keys; modes may add more
    # (e.g. the main mode's perf_model / contract-verification fields).
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0
    return rec, cap.err


def test_million_mode_smoke(capsys):
    rec, err = _run_json(capsys, bench.run_million, B=4, steps=2)
    assert rec["metric"] == "mpc_million_qps_per_chip"
    assert "success=1.000" in err


@pytest.mark.parametrize("builder,nbatch", [
    (bench.build_batch, 3), (bench.build_dense_batch, 3)])
def test_builders_shapes(builder, nbatch):
    if builder is bench.build_batch:
        import jax.numpy as jnp
        data, z0, l0, v0 = builder(nbatch, 5, 3, 2, 4, jnp.float64)
        assert data.Q.shape == (nbatch, 6, 3, 3)
    else:
        import jax.numpy as jnp
        data, z0, l0, v0 = builder(nbatch, 4, 6, jnp.float64)
        assert data.H.shape == (nbatch, 4, 4)
    assert z0.shape[0] == nbatch


def test_perf_model_reports_executed_refine_steps():
    """The perf model's refine term must use the EXECUTED early-exit loop
    count, not Options.refine_steps (round-3 bug: feeding the max of 24
    put the model at an impossible 185% of its own issue bound)."""
    import numpy as np

    ni = np.full(256, 11, np.int32)
    pm_exec = bench.mpc_perf_model(256, 30, 8, 3, 6, ni, 0.05, 3)
    pm_max = bench.mpc_perf_model(256, 30, 8, 3, 6, ni, 0.05, 24)
    assert pm_exec["executed_refine_steps"] == 3
    # The refine term must actually enter the bound (max >> executed).
    assert pm_max["issue_bound_s"] > pm_exec["issue_bound_s"] * 1.5


def test_dispatch_returns_executed_refine_steps(monkeypatch):
    """CoreOut.refine_steps carries the executed count out of the batch
    dispatcher: positive when refinement engages, and strictly below the
    24-step maximum on an easy well-scaled batch (the early exit)."""
    import jax.numpy as jnp
    import numpy as np

    import fbstab_tpu.models.mpc_qp as mpc
    from fbstab_tpu.options import Options

    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    import jax

    jax.clear_caches()
    mpc._make_fused_step.cache_clear()
    opts = Options.single_precision()
    data, z0, l0, v0 = bench.build_batch(8, 10, 4, 2, 4, jnp.float32)
    x, core = mpc.solve_mpc_qp_batch(data, z0, l0, v0, opts)
    executed = bench.executed_refine_steps(core)
    assert 0 < executed < opts.refine_steps
    # Raw path: no refinement -> zero executed steps.
    import dataclasses
    opts0 = dataclasses.replace(opts, refine_steps=0)
    _, core0 = mpc.solve_mpc_qp_batch(data, z0, l0, v0, opts0)
    assert bench.executed_refine_steps(core0) == 0
    assert np.all(np.asarray(core.eflag) == 0)


def test_perf_model_two_phase_compaction():
    """The two-phase model must credit straggler COMPACTION: 16 tiles
    that each contain one 40-iteration lane pay 40 tile-iters apiece in
    one-shot lockstep, but under (phase1=16, P>=16) the 16 stragglers
    share one phase-2 tile."""
    import numpy as np

    B, tile = 2048, 128
    ni = np.full(B, 10, np.int32)
    ni[::tile] = 40                    # one straggler per tile
    one = bench.mpc_perf_model(B, 30, 8, 3, 6, ni, 0.05, 2)
    two = bench.mpc_perf_model(B, 30, 8, 3, 6, ni, 0.05, 2,
                               two_phase=(16, 512))
    assert one["lockstep_tile_iters"] == 16 * 40
    # phase1: 16 tiles x min(40, 16) + phase2: one tile x (40 - 16)
    assert two["lockstep_tile_iters"] == 16 * 16 + 24
    assert two["issue_bound_s"] < one["issue_bound_s"]


def test_plant_contract_gate_requires_perturbed_lanes():
    """contract_met gating (round-5 VERDICT item 4): a single perturbed
    lane above 1e-6 must flip the per-plant gate, not just a nominal
    regression."""
    assert bench.plant_contract_ok(True, 5e-7, 1.0, True)
    assert not bench.plant_contract_ok(True, 5e-7, 0.992, True)
    assert not bench.plant_contract_ok(True, 2e-6, 1.0, True)
    assert not bench.plant_contract_ok(False, 5e-7, 1.0, True)
    assert not bench.plant_contract_ok(True, 5e-7, 0.0, False)
