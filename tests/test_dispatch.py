"""Kernel-dispatch gates: every reference benchmark plant must land on
an engaged fused path (the round-1 gap was the copolymerization class
falling off the kernel cliff onto the slow scan path — VERDICT.md item
1). Pins the gate decisions so budget-model edits cannot silently
de-route a problem class."""

import jax.numpy as jnp
import pytest

import fbstab_tpu.models.mpc_qp as m
from fbstab_tpu.models.ocp_fixtures import (
    copolymerization_reactor,
    double_integrator,
    servo_motor,
    spacecraft_relative_motion,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # Gate decisions only; no kernels launch in this test.
    monkeypatch.setattr(m, "PALLAS_MODE", "interpret")


@pytest.mark.parametrize("plant,horizon,full,subfused", [
    (double_integrator, 20, True, None),
    (servo_motor, 25, True, None),
    (spacecraft_relative_motion, 40, False, ("std", 128)),
    (copolymerization_reactor, 80, False, ("lowmem", 128)),
])
def test_reference_plants_route_to_a_kernel(plant, horizon, full,
                                            subfused):
    data, _ = plant(horizon, dtype=jnp.float32)
    N, nx, nu, nc = m.mpc_dims(data)
    mode = m._kernel_mode(N, nx, nu, nc)
    assert mode is not None, "plant fell off the kernel cliff"
    on_full = m._state_rows(N, nx, nu, nc) <= m._FULL_SOLVE_ROWS_CAP
    assert on_full == full
    assert m._subfused_eligible(data, jnp.float32) == subfused
    # The gate's modeled footprint (with spill) must fit the budget the
    # kernels declare.
    mb = m._fused_vmem_mb(N, nx, nu, nc, lowmem=(mode == "lowmem"))
    assert mb * m._SUBFUSED_SPILL_FACTOR <= m._SUBFUSED_BUDGET_MB


def test_smaller_tile_does_not_shrink_the_model():
    """VMEM pads lanes to 128 (CLAUDE.md perf rule 7): the footprint
    model must not reward smaller tiles."""
    assert (m._fused_vmem_mb(30, 8, 3, 6, tile_b=32)
            == m._fused_vmem_mb(30, 8, 3, 6, tile_b=128))


def test_batch_auto_beyond_kernel_caps_policy():
    """riccati='auto' (the solve_mpc_qp_batch default) beyond the
    fused-kernel envelope: on TPU f32 batches stay on the vmapped
    sequential scan at EVERY stage dimension (round-5 revision: the
    contract stack on scan outruns the round-4 raw-tier assoc numbers
    at nx=18/N=320, scan shows no large-B VMEM cliff at these shapes,
    and the assoc compilation with the refine graph kernel-faulted the
    TPU worker — see models/mpc_qp.py policy comment)."""
    # Long horizon, tiny stage blocks: scan (measured 211 QPs/s at
    # N=480 nx=2 B=2048 raw; 128.3 vs assoc 35.8 at B=256).
    d480, _ = double_integrator(480, dtype=jnp.float32)
    assert m._auto_batch_riccati(d480, jnp.float32, backend="tpu") \
        == "scan"
    # Beyond-envelope copoly-class stage dims: ALSO scan since round 5
    # (contract-path scan 91.2 QPs/s at the full 1e-6 contract vs the
    # raw-tier assoc 80.8).
    d320, _ = copolymerization_reactor(320, dtype=jnp.float32)
    assert m._auto_batch_riccati(d320, jnp.float32, backend="tpu") \
        == "scan"
    # State dim beyond the nx cap (synthetic shapes; values irrelevant).
    nx, nu, nc, N = 40, 4, 6, 30
    big = m.MpcQPData(
        Q=jnp.zeros((N + 1, nx, nx)), R=jnp.zeros((N + 1, nu, nu)),
        S=jnp.zeros((N + 1, nu, nx)), q=jnp.zeros((N + 1, nx)),
        r=jnp.zeros((N + 1, nu)), A=jnp.zeros((N, nx, nx)),
        B=jnp.zeros((N, nx, nu)), c=jnp.zeros((N, nx)),
        E=jnp.zeros((N + 1, nc, nx)), L=jnp.zeros((N + 1, nc, nu)),
        d=jnp.zeros((N + 1, nc)), x0=jnp.zeros((nx,)))
    assert m._auto_batch_riccati(big, jnp.float32, backend="tpu") \
        == "scan"
    # On CPU the assoc path wins only at long horizons.
    assert m._auto_batch_riccati(d480, jnp.float64, backend="cpu") \
        == "assoc"
    assert m._auto_batch_riccati(big, jnp.float64, backend="cpu") \
        == "scan"
    # Within the kernel envelope the scan-ops path (which engages the
    # fused kernels) stays the choice on any backend.
    d20, _ = double_integrator(20, dtype=jnp.float32)
    assert m._auto_batch_riccati(d20, jnp.float32, backend="tpu") \
        == "scan"


def test_beyond_envelope_noeq_policy():
    """Round-5 policy pin: beyond the fused-kernel envelope the TPU f32
    product path runs unequilibrated (the equilibrated compilation
    measured 0% success at copoly N=320 and a refine stall at di N=480;
    the unequilibrated contract path meets 1e-6 on both)."""
    d320, _ = copolymerization_reactor(320, dtype=jnp.float32)
    assert m.beyond_envelope_noeq(d320, jnp.float32, backend="tpu")
    d480, _ = double_integrator(480, dtype=jnp.float32)
    assert m.beyond_envelope_noeq(d480, jnp.float32, backend="tpu")
    # Inside the envelope (the ServoMotor conditioning story) the
    # equilibration stays on.
    d20, _ = double_integrator(20, dtype=jnp.float32)
    assert not m.beyond_envelope_noeq(d20, jnp.float32, backend="tpu")
    # CPU and f64 paths are untouched.
    assert not m.beyond_envelope_noeq(d320, jnp.float32, backend="cpu")
    assert not m.beyond_envelope_noeq(d320, jnp.float64, backend="tpu")
