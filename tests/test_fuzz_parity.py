"""Randomized adversarial parity fuzz: fused kernels vs the XLA path.

Batches mixing feasible / degenerate / primal-infeasible / dual-infeasible /
solver-failure instances with random warmstarts, solved by the fused Pallas
kernels (interpret mode, f64) and the vmapped XLA-orchestrated path, with
EXACT per-instance exit-flag and iteration-count parity demanded. This is
the test-philosophy upgrade of the reference's algebraic spot checks
(/root/reference/fbstab/components/test/dense_unit_tests.h:172-213) aimed at
the kernels' masked-lockstep exit logic: lanes that exit at different times
via different flags share tiles with lanes that keep iterating (including
lanes whose Newton factorization NaNs mid-solve, the `blend` NaN-leak
scenario of ops/mpc_solve_pallas.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fbstab_tpu.models.dense_qp as dense
import fbstab_tpu.models.mpc_qp as mpc
from fbstab_tpu.core.feasibility import check_feasibility
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.models.dense_qp import DENSE_OPS, DenseQPData
from fbstab_tpu.models.mpc_qp import MPC_OPS, MpcQPData, mpc_dims
from fbstab_tpu.options import Options
from fbstab_tpu.ops.dense_solve_pallas import fbstab_dense_solve_fused
from fbstab_tpu.ops.mpc_solve_pallas import fbstab_mpc_solve_fused
from fbstab_tpu.solver_out import ExitFlag

# Bounded budgets keep the lockstep fuzz batches fast while preserving
# parity (both paths run the same options).
FUZZ_OPTS = Options(abs_tol=1e-8, max_newton_iters=60, max_prox_iters=15)


def _rand_orth(rng, n):
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    return q


def _random_dense_instance(rng, n, q, nl, cls):
    """One dense QP of a given adversarial class (randomly rotated):
    0 = strictly convex feasible, 1 = degenerate (rank-deficient H, boxed),
    2 = primal infeasible, 3 = dual infeasible (unbounded),
    4 = indefinite H (factorization-failure bait)."""
    R = _rand_orth(rng, n)
    A = rng.standard_normal((q, n))
    b = np.abs(rng.standard_normal(q)) + 0.3          # origin feasible
    f = rng.standard_normal(n)
    if cls == 0:
        M = rng.standard_normal((n, n))
        H = M @ M.T / n + np.diag(0.5 + rng.random(n))
    elif cls == 1:
        M = rng.standard_normal((n, max(1, n // 2)))
        H = M @ M.T
        # Box the primal so the degenerate directions stay bounded.
        A[: 2 * n if 2 * n <= q else q] = np.vstack(
            [np.eye(n), -np.eye(n)])[: min(2 * n, q)]
        b[: min(2 * n, q)] = 1.0 + rng.random(min(2 * n, q))
    elif cls == 2:
        M = rng.standard_normal((n, n))
        H = M @ M.T / n + np.eye(n)
        a = rng.standard_normal(n)
        A[0], b[0] = a, -1.0                           # a'z <= -1
        A[1], b[1] = -a, -1.0                          # a'z >= +1
    elif cls == 3:
        # Canonical unbounded: null direction e_n, f decreasing along it,
        # A non-increasing and G zero along it; then rotate by R.
        H = np.diag(np.concatenate([0.5 + rng.random(n - 1), [0.0]]))
        f[n - 1] = -1.0 - rng.random()
        A[:, n - 1] = -np.abs(rng.standard_normal(q))
        H = R @ H @ R.T
        A = A @ R.T
        f = R @ f
    else:
        M = rng.standard_normal((n, n))
        H = M @ M.T / n - 1.5 * np.eye(n)              # indefinite
    G = rng.standard_normal((nl, n)) if nl else np.zeros((0, n))
    h = rng.standard_normal(nl) if nl else np.zeros(0)
    if nl and cls == 3:
        # Keep the rotated e_n direction in G's null space so the problem
        # stays unbounded with equalities present.
        G[:, -1] = 0.0
        G = G @ R.T
        h = 0.1 * rng.standard_normal(nl)
    if nl >= 2 and cls == 2 and rng.random() < 0.5:
        # Alternative primal infeasibility through the equality block.
        G[1] = G[0]
        h[0], h[1] = 0.0, 1.0
    return H, f, G, h, A, b


def _dense_fuzz_batch(B, n, q, nl, seed):
    rng = np.random.default_rng(seed)
    rows = [_random_dense_instance(rng, n, q, nl, i % 5) for i in range(B)]
    data = DenseQPData(
        H=jnp.asarray(np.stack([r[0] for r in rows])),
        f=jnp.asarray(np.stack([r[1] for r in rows])),
        G=jnp.asarray(np.stack([r[2] for r in rows])),
        h=jnp.asarray(np.stack([r[3] for r in rows])),
        A=jnp.asarray(np.stack([r[4] for r in rows])),
        b=jnp.asarray(np.stack([r[5] for r in rows])))
    z0 = jnp.asarray(rng.standard_normal((B, n)))
    l0 = jnp.asarray(rng.standard_normal((B, nl)))
    v0 = jnp.asarray(rng.standard_normal((B, q)))     # negative duals too
    return data, z0, l0, v0


def _assert_parity(core_f, core_ref, x_f, x_ref, ops, data, opts):
    """Parity contract between the fused kernel and the XLA path:

    - exit flags: EXACT on every lane;
    - converged (SUCCESS) lanes: exact Newton/prox iteration parity and
      matching iterates/residuals;
    - infeasibility lanes: the fused path's returned certificate must
      itself satisfy Alg. 3's conditions (re-evaluated through the XLA
      operators). Iterates are NOT compared there: on unbounded problems
      the iterate path is chaotic, so the two implementations' different
      (both valid) summation orders legitimately reach different — equally
      valid — certificates. (Verified separately: the fused kernel is
      exactly permutation-equivariant, so divergence is per-lane
      arithmetic sensitivity, not cross-lane leakage.)
    """
    eflag = np.asarray(core_ref.eflag)
    np.testing.assert_array_equal(np.asarray(core_f.eflag), eflag)
    succ = eflag == int(ExitFlag.SUCCESS)
    np.testing.assert_array_equal(
        np.asarray(core_f.newton_iters)[succ],
        np.asarray(core_ref.newton_iters)[succ])
    np.testing.assert_array_equal(
        np.asarray(core_f.prox_iters)[succ],
        np.asarray(core_ref.prox_iters)[succ])
    for name in ("z", "l", "v", "y"):
        a = np.asarray(getattr(x_f, name))[succ]
        r = np.asarray(getattr(x_ref, name))[succ]
        if a.size == 0:
            continue
        scale = 1.0 + np.abs(r)
        np.testing.assert_allclose(a / scale, r / scale, atol=5e-8,
                                   err_msg=f"block {name}")
    np.testing.assert_allclose(np.asarray(core_f.residual)[succ],
                               np.asarray(core_ref.residual)[succ],
                               rtol=1e-7, atol=1e-10)

    # Certificate lanes: validate the fused output as a certificate.
    feas = jax.vmap(
        lambda d, z, l, v, y: check_feasibility(
            ops, d, Variable(z=z, l=l, v=v, y=y),
            opts.validated().infeas_tol * 10.0)
    )(data, x_f.z, x_f.l, x_f.v, x_f.y)
    p_lane = (eflag == int(ExitFlag.PRIMAL_INFEASIBLE)) | (
        eflag == int(ExitFlag.PRIMAL_DUAL_INFEASIBLE))
    d_lane = (eflag == int(ExitFlag.DUAL_INFEASIBLE)) | (
        eflag == int(ExitFlag.PRIMAL_DUAL_INFEASIBLE))
    assert not np.any(np.asarray(feas.primal_feasible)[p_lane]), \
        "fused PRIMAL_INFEASIBLE lane returned a non-certificate"
    assert not np.any(np.asarray(feas.dual_feasible)[d_lane]), \
        "fused DUAL_INFEASIBLE lane returned a non-certificate"


def _assert_permutation_equivariant(solve, data, z0, l0, v0, seed):
    """Lane independence: permuting the batch must permute the outputs
    bit-exactly. This is the direct adversarial probe of the kernels'
    masking/blend logic (a NaN or state leak across lanes inside a tile
    would break it)."""
    B = z0.shape[0]
    x1, c1 = solve(data, z0, l0, v0)
    perm = np.random.default_rng(seed).permutation(B)
    take = lambda t: jax.tree.map(lambda a: a[perm], t)
    x2, c2 = solve(take(data), z0[perm], l0[perm], v0[perm])
    for a, b in zip(jax.tree.leaves((x1, c1)), jax.tree.leaves((x2, c2))):
        np.testing.assert_array_equal(np.asarray(a)[perm], np.asarray(b))


def _class_coverage(eflag, expect_classes):
    """The generator intends specific outcomes; demand each appears at
    least once so the fuzz keeps exercising every exit path."""
    present = set(int(e) for e in np.asarray(eflag))
    for c in expect_classes:
        assert int(c) in present, (
            f"fuzz batch lost coverage of {c!r}; eflags = {sorted(present)}")


@pytest.mark.parametrize("nl", [0, 3])
def test_dense_fuzz_parity(monkeypatch, nl):
    monkeypatch.setattr(dense, "PALLAS_MODE", "off")
    jax.clear_caches()

    B, n, q = 40, 6, 10
    data, z0, l0, v0 = _dense_fuzz_batch(B, n, q, nl, seed=nl + 7)
    x_ref, core_ref = dense.solve_dense_qp_batch(data, z0, l0, v0, FUZZ_OPTS)
    x_f, core_f = fbstab_dense_solve_fused(
        data, z0, l0, v0, FUZZ_OPTS, interpret=True, tile_b=8)

    _assert_parity(core_f, core_ref, x_f, x_ref, DENSE_OPS, data, FUZZ_OPTS)
    _class_coverage(core_ref.eflag, [
        ExitFlag.SUCCESS, ExitFlag.PRIMAL_INFEASIBLE,
        ExitFlag.DUAL_INFEASIBLE])
    _assert_permutation_equivariant(
        lambda d, z, l, v: fbstab_dense_solve_fused(
            d, z, l, v, FUZZ_OPTS, interpret=True, tile_b=8),
        data, z0, l0, v0, seed=nl)

    # KKT contract on converged lanes (reference accuracy demonstrated at
    # residual <= 1e-6, fbstab_dense_unit_tests.cc).
    ok = np.asarray(core_ref.eflag) == int(ExitFlag.SUCCESS)
    res = np.asarray(core_ref.residual)
    assert np.all(res[ok] <= 1e-6)


def _random_mpc_instance(rng, N, nx, nu, nc, cls):
    """One MPC QP of a given class: 0 = feasible, 1 = degenerate (Q = 0),
    2 = primal infeasible (contradictory state constraint on x0),
    3 = indefinite Q (factorization-failure bait),
    4 = unbounded (zero cost curvature, linear input cost, vacuous
    constraints)."""
    N1 = N + 1

    def spd(k, scale=1.0):
        M = rng.standard_normal((k, k))
        return M @ M.T / k + scale * np.eye(k)

    Q = np.stack([spd(nx) for _ in range(N1)])
    Rm = np.stack([spd(nu, 0.5) for _ in range(N1)])
    S = 0.1 * rng.standard_normal((N1, nu, nx))
    qv = 0.5 * rng.standard_normal((N1, nx))
    rv = 0.5 * rng.standard_normal((N1, nu))
    A = np.stack([np.eye(nx) + 0.1 * rng.standard_normal((nx, nx))
                  for _ in range(N)])
    Bm = 0.5 * rng.standard_normal((N, nx, nu))
    c = 0.1 * rng.standard_normal((N, nx))
    # Input box plus slack rows.
    E = np.zeros((N1, nc, nx))
    L = np.zeros((N1, nc, nu))
    L[:, :nu] = np.eye(nu)
    L[:, nu:2 * nu] = -np.eye(nu)
    d = -np.ones((N1, nc)) * (1.0 + rng.random((N1, nc)))
    x0 = rng.standard_normal(nx)

    if cls == 1:
        Q[:] = 0.0
        S[:] = 0.0
    elif cls == 2:
        e = rng.standard_normal(nx)
        E[0, 0], L[0, 0], d[0, 0] = e, 0.0, 1.0       # e'x0 <= -1
        E[0, 1], L[0, 1], d[0, 1] = -e, 0.0, 1.0      # e'x0 >= +1
    elif cls == 3:
        Q = np.stack([spd(nx) - 2.5 * np.eye(nx) for _ in range(N1)])
    elif cls == 4:
        Q[:] = 0.0
        Rm[:] = 0.0
        S[:] = 0.0
        qv[:] = 0.0
        rv[:] = 1.0
        E[:] = 0.0
        L[:] = 0.0
        d[:] = -1.0
    return Q, Rm, S, qv, rv, A, Bm, c, E, L, d, x0


def _mpc_fuzz_batch(B, N, nx, nu, nc, seed):
    rng = np.random.default_rng(seed)
    rows = [_random_mpc_instance(rng, N, nx, nu, nc, i % 5)
            for i in range(B)]
    fields = ["Q", "R", "S", "q", "r", "A", "B", "c", "E", "L", "d", "x0"]
    data = MpcQPData(**{
        f: jnp.asarray(np.stack([r[i] for r in rows]))
        for i, f in enumerate(fields)})
    N1 = N + 1
    nz, nl_, nv = N1 * (nx + nu), N1 * nx, N1 * nc
    z0 = jnp.asarray(rng.standard_normal((B, nz)))
    l0 = jnp.asarray(rng.standard_normal((B, nl_)))
    v0 = jnp.asarray(rng.standard_normal((B, nv)))
    return data, z0, l0, v0


def test_mpc_fuzz_parity(monkeypatch):
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    B, N, nx, nu, nc = 40, 5, 3, 2, 4
    data, z0, l0, v0 = _mpc_fuzz_batch(B, N, nx, nu, nc, seed=11)
    x_ref, core_ref = mpc.solve_mpc_qp_batch(data, z0, l0, v0, FUZZ_OPTS)
    x_f, core_f = fbstab_mpc_solve_fused(
        data, z0, l0, v0, FUZZ_OPTS, interpret=True, tile_b=8)

    _assert_parity(core_f, core_ref, x_f, x_ref, MPC_OPS, data, FUZZ_OPTS)
    _class_coverage(core_ref.eflag, [
        ExitFlag.SUCCESS, ExitFlag.PRIMAL_INFEASIBLE,
        ExitFlag.DUAL_INFEASIBLE, ExitFlag.LINEAR_SOLVER_FAILED])
    _assert_permutation_equivariant(
        lambda d, z, l, v: fbstab_mpc_solve_fused(
            d, z, l, v, FUZZ_OPTS, interpret=True, tile_b=8),
        data, z0, l0, v0, seed=3)

    ok = np.asarray(core_ref.eflag) == int(ExitFlag.SUCCESS)
    assert ok.sum() >= B // 5                         # feasible class held
    assert np.all(np.asarray(core_ref.residual)[ok] <= 1e-6)


def test_mpc_fuzz_parity_warmstarted_from_solution(monkeypatch):
    """Re-solving from the returned iterate (the receding-horizon pattern)
    must also agree exactly — hammers the zero-iteration exits and the
    project-duals handling of certificate-shaped warmstarts."""
    monkeypatch.setattr(mpc, "PALLAS_MODE", "off")
    jax.clear_caches()
    mpc._make_fused_step.cache_clear()

    B, N, nx, nu, nc = 16, 5, 3, 2, 4
    data, z0, l0, v0 = _mpc_fuzz_batch(B, N, nx, nu, nc, seed=23)
    x1, _ = mpc.solve_mpc_qp_batch(data, z0, l0, v0, FUZZ_OPTS)
    x_ref, core_ref = mpc.solve_mpc_qp_batch(
        data, x1.z, x1.l, x1.v, FUZZ_OPTS)
    x_f, core_f = fbstab_mpc_solve_fused(
        data, x1.z, x1.l, x1.v, FUZZ_OPTS, interpret=True, tile_b=8)
    _assert_parity(core_f, core_ref, x_f, x_ref, MPC_OPS, data, FUZZ_OPTS)
