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
