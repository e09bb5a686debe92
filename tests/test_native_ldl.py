"""Native (C) sparse LDL' backend: parity with the NumPy path and the
reference wrapper's contract (factor a quasi-definite matrix, solve to
1e-12 — mirrors /root/reference/tools/qdldl/test/qdldl_test.cc:34-58).
"""

import numpy as np
import pytest

from fbstab_tpu.utils import native_ldl
from fbstab_tpu.utils.sparse_ldl import SparseLDL

needs_native = pytest.mark.skipif(
    not native_ldl.available(), reason="no C compiler available")


def _random_qd_csc(n, rng, density=0.15):
    """Random symmetric quasi-definite matrix, upper triangle in CSC."""
    M = rng.standard_normal((n, n)) * (rng.random((n, n)) < density)
    M = (M + M.T) / 2 + np.diag(10.0 + rng.random(n))
    Ap, Ai, Ax = [0], [], []
    for j in range(n):
        for i in range(j + 1):
            if M[i, j] != 0.0 or i == j:
                Ai.append(i)
                Ax.append(M[i, j])
        Ap.append(len(Ai))
    return (M, np.asarray(Ap, np.int64), np.asarray(Ai, np.int64),
            np.asarray(Ax, float))


def _kkt_csc():
    """The reference test's shape: a small quasi-definite KKT matrix
    [H + sigma*I, G'; G, -sigma*I] stored upper-triangular."""
    rng = np.random.default_rng(7)
    nz, nl, sigma = 6, 4, 1e-2
    H = rng.standard_normal((nz, nz))
    H = H @ H.T
    G = rng.standard_normal((nl, nz))
    n = nz + nl
    K = np.zeros((n, n))
    K[:nz, :nz] = H + sigma * np.eye(nz)
    K[:nz, nz:] = G.T
    K[nz:, :nz] = G
    K[nz:, nz:] = -sigma * np.eye(nl)
    Ap, Ai, Ax = [0], [], []
    for j in range(n):
        for i in range(j + 1):
            if K[i, j] != 0.0 or i == j:
                Ai.append(i)
                Ax.append(K[i, j])
        Ap.append(len(Ai))
    return (K, np.asarray(Ap, np.int64), np.asarray(Ai, np.int64),
            np.asarray(Ax, float))


@needs_native
def test_native_solves_quasidefinite_kkt_to_1em12():
    K, Ap, Ai, Ax = _kkt_csc()
    n = K.shape[0]
    s = SparseLDL(n, Ap, Ai, backend="native")
    s.factor(Ax)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n)
    x = b.copy()
    s.solve(x)
    assert np.linalg.norm(K @ x - b) <= 1e-12


@needs_native
def test_native_matches_python_bit_for_bit():
    rng = np.random.default_rng(3)
    for n in (5, 23, 80):
        M, Ap, Ai, Ax = _random_qd_csc(n, rng)
        sp = SparseLDL(n, Ap, Ai, backend="python")
        sn = SparseLDL(n, Ap, Ai, backend="native")
        assert sn.backend == "native" and sp.backend == "python"
        sp.factor(Ax)
        sn.factor(Ax)
        assert np.array_equal(sp.parent, sn.parent)
        assert np.array_equal(sp.Lp, sn.Lp)
        assert np.array_equal(sp.Li, sn.Li)
        assert np.array_equal(sp.Lx, sn.Lx)
        assert np.array_equal(sp.D, sn.D)
        b = rng.standard_normal(n)
        xp, xn = b.copy(), b.copy()
        sp.solve(xp)
        sn.solve(xn)
        assert np.array_equal(xp, xn)


@needs_native
def test_native_batch_factor_solve_matches_python():
    rng = np.random.default_rng(5)
    n, B = 40, 8
    M, Ap, Ai, Ax = _random_qd_csc(n, rng)
    AxB = np.tile(Ax, (B, 1)) * (1.0 + 0.01 * rng.random((B, Ax.size)))
    rhs = rng.standard_normal((B, n))
    xn, xp = rhs.copy(), rhs.copy()
    sn = SparseLDL(n, Ap, Ai, backend="native")
    sp = SparseLDL(n, Ap, Ai, backend="python")
    assert sn.factor_solve_batch(AxB, xn) == 0
    assert sp.factor_solve_batch(AxB, xp) == 0
    assert np.array_equal(xn, xp)


@needs_native
def test_native_zero_pivot_contract():
    s = SparseLDL(1, [0, 1], [0], backend="native")
    with pytest.raises(ZeroDivisionError, match="column 0"):
        s.factor(np.array([0.0]))
    # Batched: the bad instance reports its column, others still solve.
    rng = np.random.default_rng(9)
    n = 10
    M, Ap, Ai, Ax = _random_qd_csc(n, rng, density=0.0)  # diagonal matrix
    AxB = np.stack([Ax, Ax])
    AxB[1, :] = 0.0  # second instance singular at column 0
    rhs = rng.standard_normal((2, n))
    x = rhs.copy()
    st = SparseLDL(n, Ap, Ai, backend="native").factor_solve_batch(AxB, x)
    assert st == 1
    assert np.allclose(np.diag(M) * x[0], rhs[0], atol=1e-12)
    assert np.array_equal(x[1], rhs[1])  # untouched


@needs_native
def test_native_rejects_malformed_pattern():
    # Missing explicit diagonal in column 1.
    with pytest.raises(ValueError, match="column 1"):
        SparseLDL(2, [0, 1, 2], [0, 0], backend="native")


@needs_native
def test_size_validation_before_native_calls():
    """Mis-sized arrays must raise, never reach the C kernels (OOB)."""
    s = SparseLDL(2, [0, 1, 3], [0, 0, 1], backend="native")
    s.factor(np.array([2.0, 0.5, 3.0]))
    with pytest.raises(ValueError):
        s.solve(np.zeros(1))
    with pytest.raises(ValueError):
        s.factor(np.zeros(2))
    with pytest.raises(ValueError):
        s.factor_solve_batch(np.ones((6, 3)), np.ones((2, 2)))
    with pytest.raises(ValueError):
        SparseLDL(2, [0, 1, 3], [0, 0], backend="native")  # short Ai


@needs_native
def test_solve_after_batch_matches_python_contract():
    """factor_solve_batch leaves the last instance's factor loaded on
    both backends (solve() must not raise afterwards)."""
    for backend in ("native", "python"):
        s = SparseLDL(2, [0, 1, 3], [0, 0, 1], backend=backend)
        AxB = np.tile([2.0, 0.5, 3.0], (2, 1))
        xB = np.ones((2, 2))
        assert s.factor_solve_batch(AxB, xB) == 0
        x = np.ones(2)
        s.solve(x)  # must not raise
        assert np.all(np.isfinite(x))


def test_python_backend_always_available():
    rng = np.random.default_rng(11)
    M, Ap, Ai, Ax = _random_qd_csc(12, rng)
    s = SparseLDL(12, Ap, Ai, backend="python")
    s.factor(Ax)
    b = rng.standard_normal(12)
    x = b.copy()
    s.solve(x)
    assert np.linalg.norm(M @ x - b) <= 1e-12
