"""Sparse QP path (FBstabSparse): the reference's planned-but-unshipped
QP class (/root/reference/README.md:47, ROADMAP.md:10-13), completed here
on the native sparse LDL'.

Contract tests: the five reference dense integration behaviors
(fbstab/test/fbstab_dense_unit_tests.cc) through the sparse path, parity
against the dense path on random sparse QPs, batched solves with mixed
outcomes, warmstarts, and the three-call linear-solver contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbstab_tpu import (
    ExitFlag,
    FBstabSparse,
    Options,
    dense_qp_data,
    solve_dense_qp,
    solve_sparse_qp,
    solve_sparse_qp_batch,
    sparse_qp_data,
)
from fbstab_tpu.core.algorithm import fbstab_solve


def _options():
    return Options(abs_tol=1e-8)


def _solve(pat, data, opts=None):
    nz, nl, nv = pat.nz, pat.nl, pat.nv
    return solve_sparse_qp(
        pat, data, jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv),
        opts if opts is not None else _options())


def test_feasible_qp():
    pat, data = sparse_qp_data(
        H=[[3.0, 1.0], [1.0, 1.0]], f=[10.0, 5.0],
        A=[[-1.0, 0.0], [0.0, 1.0]], b=[0.0, 0.0])
    x, core = _solve(pat, data)
    assert int(core.eflag) == ExitFlag.SUCCESS
    np.testing.assert_allclose(np.asarray(x.z), [0.0, -5.0], atol=1e-8)
    np.testing.assert_allclose(np.asarray(x.v), [5.0, 0.0], atol=1e-8)


def test_feasible_qp_with_eq():
    pat, data = sparse_qp_data(
        H=[[4.0, 1.0], [1.0, 2.0]], f=[1.0, 1.0],
        G=[[1.0, 1.0]], h=[1.0],
        A=[[-1.0, 0.0], [0.0, -1.0]], b=[0.0, 0.0])
    x, core = _solve(pat, data)
    assert int(core.eflag) == ExitFlag.SUCCESS
    np.testing.assert_allclose(np.asarray(x.z), [0.25, 0.75], atol=1e-8)


def test_degenerate_qp():
    H = np.array([[1.0, 0.0], [0.0, 0.0]])
    f = np.array([1.0, 0.0])
    A = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0],
                  [-1.0, 0.0], [0.0, -1.0]])
    b = np.array([0.0, 3.0, 3.0, -1.0, -1.0])
    pat, data = sparse_qp_data(H=H, f=f, A=A, b=b)
    x, core = _solve(pat, data)
    assert int(core.eflag) == ExitFlag.SUCCESS
    z, v, y = np.asarray(x.z), np.asarray(x.v), np.asarray(x.y)
    np.testing.assert_allclose(z[0], 1.0, atol=1e-8)
    assert 1.0 - 1e-8 <= z[1] <= 3.0 + 1e-8
    r1 = H @ z + f + A.T @ v
    r2 = np.minimum(y, v)
    assert np.linalg.norm(r1) + np.linalg.norm(r2) <= 1e-6


def test_infeasible_qp():
    pat, data = sparse_qp_data(
        H=[[1.0, 0.0], [0.0, 0.0]], f=[1.0, -1.0],
        A=[[1.0, 1.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]],
        b=[0.0, 3.0, 3.0, -1.0, -1.0])
    _, core = _solve(pat, data)
    assert int(core.eflag) == ExitFlag.PRIMAL_INFEASIBLE


def test_unbounded_qp():
    pat, data = sparse_qp_data(
        H=[[1.0, 0.0], [0.0, 0.0]], f=[1.0, -1.0],
        A=[[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0], [0.0, -1.0]],
        b=[0.0, 3.0, -1.0, -1.0])
    _, core = _solve(pat, data)
    assert int(core.eflag) == ExitFlag.DUAL_INFEASIBLE


def _random_sparse_qp(rng, nz=12, nl=3, nv=8):
    M = rng.standard_normal((nz, nz)) * (rng.random((nz, nz)) < 0.3)
    H = M @ M.T + 0.1 * np.eye(nz)
    H = np.where(np.abs(H) < 0.05, 0.0, H)
    H = (H + H.T) / 2 + 0.2 * np.eye(nz)
    f = rng.standard_normal(nz)
    G = rng.standard_normal((nl, nz)) * (rng.random((nl, nz)) < 0.4)
    h = rng.standard_normal(nl) * 0.3
    A = rng.standard_normal((nv, nz)) * (rng.random((nv, nz)) < 0.4)
    b = np.abs(rng.standard_normal(nv)) + 0.5
    return H, f, G, h, A, b


def test_matches_dense_path_on_random_sparse_qps():
    """Same QP through the sparse CSR/LDL' path and the dense
    block-Cholesky path: identical exit flags, solutions to 1e-6."""
    rng = np.random.default_rng(0)
    opts = Options(abs_tol=1e-9)
    for _ in range(5):
        H, f, G, h, A, b = _random_sparse_qp(rng)
        nz, nl, nv = H.shape[0], G.shape[0], A.shape[0]
        dd = dense_qp_data(H, f, G, h, A, b)
        xd, cd = solve_dense_qp(
            dd, jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv), opts)
        pat, ds = sparse_qp_data(H, f, G, h, A, b)
        xs, cs = _solve(pat, ds, opts)
        assert int(cd.eflag) == int(cs.eflag) == ExitFlag.SUCCESS
        np.testing.assert_allclose(
            np.asarray(xd.z), np.asarray(xs.z), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(xd.l), np.asarray(xs.l), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(xd.v), np.asarray(xs.v), atol=1e-6)


def test_batched_mixed_outcomes_and_kkt():
    """One jitted batch over a shared pattern: per-instance exit flags
    (feasible lanes SUCCESS with KKT residual ~0, an infeasible lane
    flagged PRIMAL_INFEASIBLE) — masked-lockstep semantics."""
    rng = np.random.default_rng(1)
    # Pattern covering both problem families: the infeasible reference QP
    # embedded alongside perturbed feasible instances of itself is not
    # expressible with one pattern unless values share structure, so use
    # the feasible random family and make lane 2 infeasible via b.
    H, f, G, h, A, b = _random_sparse_qp(rng, nz=6, nl=0, nv=6)
    G = np.zeros((0, 6))
    h = np.zeros((0,))
    # Append the contradictory rows  a'z <= -1, -a'z <= -1  by reusing two
    # existing rows' pattern: instead, make lane 2 infeasible by flipping
    # b on a pair of opposing rows. Construct A with an explicit opposing
    # pair so one pattern serves both outcomes.
    A = np.vstack([A, A[0:1], -A[0:1]])
    b = np.concatenate([b, [1.0, 1.0]])
    pat, d0 = sparse_qp_data(H, f, G, h, A, b)

    B = 6
    dB = jax.tree.map(lambda a: jnp.stack([a] * B), d0)
    # Lane 2: b_pair = (-1, -1) makes  a'z <= -1 and a'z >= 1  contradict.
    bB = dB.b.at[2, -2].set(-1.0).at[2, -1].set(-1.0)
    dB = dB._replace(b=bB)
    z0 = jnp.zeros((B, 6))
    l0 = jnp.zeros((B, 0))
    v0 = jnp.zeros((B, A.shape[0]))
    xB, cB = jax.jit(lambda d, z, l, v: solve_sparse_qp_batch(
        pat, d, z, l, v, _options()))(dB, z0, l0, v0)
    eflags = np.asarray(cB.eflag)
    assert eflags[2] == ExitFlag.PRIMAL_INFEASIBLE
    ok = [i for i in range(B) if i != 2]
    assert np.all(eflags[ok] == ExitFlag.SUCCESS)
    for i in ok[:2]:
        z = np.asarray(xB.z[i])
        v = np.asarray(xB.v[i])
        r = H @ z + np.asarray(dB.f[i]) + A.T @ v
        assert np.max(np.abs(r)) < 1e-7


def test_facade_warmstart_and_validation():
    pat, data = sparse_qp_data(
        H=[[3.0, 1.0], [1.0, 1.0]], f=[10.0, 5.0],
        A=[[-1.0, 0.0], [0.0, 1.0]], b=[0.0, 0.0])
    s = FBstabSparse(pat, _options())
    x1, out1 = s.solve(data)
    x2, out2 = s.solve(data, x0=x1)
    assert int(out2.eflag) == ExitFlag.SUCCESS
    assert int(out2.prox_iters) == 0
    np.testing.assert_allclose(np.asarray(x2.z), np.asarray(x1.z),
                               atol=1e-10)
    with pytest.raises(ValueError, match="f has shape"):
        s.solve(data._replace(f=jnp.zeros(3)))


def test_pattern_reuse_across_value_instances():
    """One pattern, new values (the analyze-once/factor-many contract of
    the reference wrapper): second instance solves without re-analysis."""
    from fbstab_tpu import pattern_values
    rng = np.random.default_rng(2)
    H, f, G, h, A, b = _random_sparse_qp(rng)
    pat, d1 = sparse_qp_data(H, f, G, h, A, b)
    # Same structure, rescaled values.
    d2 = pattern_values(pat, 2.0 * H, f + 1.0, G, h, A, b + 0.5)
    x1, c1 = _solve(pat, d1)
    x2, c2 = _solve(pat, d2)
    assert int(c1.eflag) == int(c2.eflag) == ExitFlag.SUCCESS
    assert not np.allclose(np.asarray(x1.z), np.asarray(x2.z))


def test_three_call_contract_matches_fused_newton_step():
    """factor/factor_ok/newton_solve produce the same iterates as the
    fused newton_step (both feed the same native LDL')."""
    rng = np.random.default_rng(3)
    H, f, G, h, A, b = _random_sparse_qp(rng, nz=8, nl=2, nv=5)
    pat, data = sparse_qp_data(H, f, G, h, A, b)
    opts = _options()
    z0, l0, v0 = jnp.zeros(8), jnp.zeros(2), jnp.zeros(5)
    x_fused, c_fused = fbstab_solve(pat.ops, data, z0, l0, v0, opts)
    ops3 = pat.ops._replace(newton_step=None)
    x3, c3 = fbstab_solve(ops3, data, z0, l0, v0, opts)
    assert int(c_fused.eflag) == int(c3.eflag) == ExitFlag.SUCCESS
    assert int(c_fused.newton_iters) == int(c3.newton_iters)
    np.testing.assert_allclose(
        np.asarray(x_fused.z), np.asarray(x3.z), atol=1e-12)


def test_orderings_agree():
    """RCM and natural orderings factor different patterns but must give
    the same solution (any symmetric permutation of a quasi-definite K is
    factorizable)."""
    rng = np.random.default_rng(4)
    H, f, G, h, A, b = _random_sparse_qp(rng)
    pr, dr = sparse_qp_data(H, f, G, h, A, b, ordering="rcm")
    pn, dn = sparse_qp_data(H, f, G, h, A, b, ordering="natural")
    xr, cr = _solve(pr, dr)
    xn, cn = _solve(pn, dn)
    assert int(cr.eflag) == int(cn.eflag) == ExitFlag.SUCCESS
    np.testing.assert_allclose(np.asarray(xr.z), np.asarray(xn.z),
                               atol=1e-8)


def test_mpc_benchmark_through_sparse_path():
    """Cross-solver validation: the double-integrator MPC benchmark
    (reference OcpGenerator problem) materialized into its sparse
    block-banded form and solved by FBstabSparse must match the Riccati
    path's solution to 1e-7. MPC KKT systems are exactly the structured
    sparse class the reference's planned FBstabSparse targets."""
    from fbstab_tpu.models.mpc_qp import solve_mpc_qp
    from fbstab_tpu.models.ocp_fixtures import double_integrator
    from tests.test_mpc_solve import materialize

    md, _ = double_integrator(10, dtype=jnp.float64)
    H, f, G, h, A, b = materialize(md)
    nz, nl, nv = H.shape[0], G.shape[0], A.shape[0]

    xr, cr = solve_mpc_qp(md, jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv),
                          _options())
    pat, ds = sparse_qp_data(H, f, G, h, A, b)
    xs, cs = _solve(pat, ds)
    assert int(cr.eflag) == int(cs.eflag) == ExitFlag.SUCCESS
    np.testing.assert_allclose(np.asarray(xr.z), np.asarray(xs.z),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(xr.v), np.asarray(xs.v),
                               atol=1e-7)
    # The block-banded KKT pattern should factor with modest fill.
    assert pat.lnnz < 0.2 * (pat.n * (pat.n + 1)) // 2


def test_mpc_sparse_bridge_matches_materialization_and_riccati():
    """mpc_sparse_pattern/mpc_sparse_values build the block-banded MPC QP
    directly as CSR (no dense materialization): gemvs match the explicit
    matrices, the solve matches the Riccati path, and fill stays O(N)."""
    import sys
    sys.path.insert(0, "tests")
    from fbstab_tpu.models.mpc_qp import mpc_dims, solve_mpc_qp
    from fbstab_tpu.models.sparse_qp import (
        mpc_sparse_pattern, mpc_sparse_values)
    from tests.test_mpc_solve import materialize, random_mpc

    data = random_mpc(jax.random.key(3), N=6, nx=3, nu=2, nc=4)
    N, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    pat = mpc_sparse_pattern(N, nx, nu, nc)
    vals = mpc_sparse_values(data)

    H, f, G, h, A, b = materialize(data)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(nz))
    np.testing.assert_allclose(np.asarray(pat.ops.gemvH(vals, x)), H @ x,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(pat.ops.gemvG(vals, x)), G @ x,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(pat.ops.gemvA(vals, x)), A @ x,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(vals.f), f, atol=0)
    np.testing.assert_allclose(np.asarray(vals.h), h, atol=0)
    np.testing.assert_allclose(np.asarray(vals.b), b, atol=0)

    opts = Options(abs_tol=1e-9)
    zeros = (jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv))
    xs, cs = solve_sparse_qp(pat, vals, *zeros, opts)
    xr, cr = solve_mpc_qp(data, *zeros, opts)
    assert int(cs.eflag) == int(cr.eflag) == ExitFlag.SUCCESS
    np.testing.assert_allclose(np.asarray(xs.z), np.asarray(xr.z),
                               atol=1e-6)
    # Block-banded => O(N) fill: doubling the horizon roughly doubles
    # nnz(L) (a dense factor would quadruple it).
    pat2 = mpc_sparse_pattern(2 * N, nx, nu, nc)
    assert pat2.lnnz < 2.6 * pat.lnnz


def test_nan_data_fails_cleanly():
    """NaN in H must surface as a non-SUCCESS flag, not a crash or a
    silent NaN solution marked SUCCESS."""
    pat, data = sparse_qp_data(
        H=[[3.0, 1.0], [1.0, 1.0]], f=[10.0, 5.0],
        A=[[-1.0, 0.0], [0.0, 1.0]], b=[0.0, 0.0])
    bad = data._replace(Hx=data.Hx.at[0].set(jnp.nan))
    _, core = _solve(pat, bad)
    assert int(core.eflag) != ExitFlag.SUCCESS
