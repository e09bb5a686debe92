"""Closed-loop receding-horizon driver tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fbstab_tpu.models import ocp_fixtures
from fbstab_tpu.models.receding_horizon import (
    shift_warmstart,
    simulate,
    simulate_batch,
)
from fbstab_tpu.models.mpc_qp import MPC_OPS, FBstabMpc, mpc_dims
from fbstab_tpu.options import Options


def test_shift_preserves_margin_identity():
    data, _ = ocp_fixtures.double_integrator(6)
    solver = FBstabMpc(6, 2, 1, 6)
    solver.update_options(Options(abs_tol=1e-8))
    x, out = solver.solve(data)
    shifted = shift_warmstart(x, data)
    y_expect = MPC_OPS.b_vec(data) - MPC_OPS.gemvA(data, shifted.z)
    np.testing.assert_allclose(shifted.y, y_expect, atol=1e-14)
    # Stage k of the shifted z equals stage k+1 of the original.
    N, nx, nu, nc = mpc_dims(data)
    zs = np.asarray(x.z).reshape(N + 1, nx + nu)
    ss = np.asarray(shifted.z).reshape(N + 1, nx + nu)
    np.testing.assert_allclose(ss[:-1], zs[1:], atol=0)


def test_closed_loop_regulates_servo():
    """20 closed-loop steps on the servo motor: every solve succeeds and
    the tracking error |x1 - 30deg| shrinks."""
    data, sim = ocp_fixtures.servo_motor(10)
    res = jax.jit(lambda: simulate(data, 20, Options(abs_tol=1e-8)))()
    assert (np.asarray(res.eflag) == 0).all()
    target = 30.0 * np.pi / 180.0
    err0 = abs(float(res.x[0][0]) - target)
    errT = abs(float(res.x[-1][0]) - target)
    assert errT < 0.05 * max(err0, 1e-9)
    # Input constraint respected.
    assert np.max(np.abs(np.asarray(res.u))) <= 220.0 + 1e-6


def test_warmstart_reduces_iterations():
    """After the first step, warmstarted solves need fewer Newton
    iterations than the cold first solve (the point of the carry)."""
    data, _ = ocp_fixtures.double_integrator(8)
    res = simulate(data._replace(x0=jnp.array([1.5, 0.0])), 10,
                   Options(abs_tol=1e-8))
    newtons = np.asarray(res.newton_iters)  # per-step counts
    assert (np.asarray(res.eflag) == 0).all()
    assert newtons[-1] <= newtons[0]
    assert newtons[1:].mean() <= newtons[0]


def test_batched_scenarios():
    data, _ = ocp_fixtures.double_integrator(5)
    x0s = jnp.stack([jnp.array([0.1 * i, 0.0]) for i in range(4)])
    res = simulate_batch(data, 5, x0s, Options(abs_tol=1e-8))
    assert res.x.shape == (4, 6, 2)
    assert (np.asarray(res.eflag) == 0).all()


def test_batched_scenarios_adaptive_matches_oneshot():
    """simulate_batch(adaptive=True) composes the device two-phase solve
    under the control-step scan (round-5 VERDICT item 6): same
    trajectories as the one-shot sweep within solver tolerance, all
    steps SUCCESS."""
    data, _ = ocp_fixtures.double_integrator(5)
    x0s = jnp.stack([jnp.array([0.15 * i, 0.01 * i]) for i in range(4)])
    opts = Options(abs_tol=1e-8)
    one = simulate_batch(data, 5, x0s, opts)
    ada = simulate_batch(data, 5, x0s, opts, adaptive=True,
                         phase1_newton_iters=4, phase2_size=4)
    assert (np.asarray(ada.eflag) == 0).all()
    np.testing.assert_allclose(np.asarray(ada.u), np.asarray(one.u),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ada.x), np.asarray(one.x),
                               atol=1e-6)
