"""Sparse LDL' tool tests, mirroring tools/qdldl/test/qdldl_test.cc."""

import numpy as np
import pytest

from fbstab_tpu.utils.sparse_ldl import SparseLDL


def test_quasi_definite_factorization():
    """The reference's 10x10 quasi-definite example
    (qdldl_test.cc:34-58, after oxfordcontrol/qdldl's example.c):
    factor, solve, and check ||Ax - b|| <= 1e-12."""
    n = 10
    Ap = [0, 1, 2, 4, 5, 6, 8, 10, 12, 14, 17]
    Ai = [0, 1, 1, 2, 3, 4, 1, 5, 0, 6, 3, 7, 6, 8, 1, 2, 9]
    Ax = [1.0, 0.460641, -0.121189, 0.417928, 0.177828,
          0.1, -0.0290058, -1.0, 0.350321, -0.441092,
          -0.0845395, -0.316228, 0.178663, -0.299077, 0.182452,
          -1.56506, -0.1]
    b = np.arange(1.0, 11.0)

    ldl = SparseLDL(n, Ap, Ai)
    ldl.factor(Ax)
    x = b.copy()
    ldl.solve(x)

    # Reconstruct dense symmetric A from the upper triangle.
    A = np.zeros((n, n))
    for j in range(n):
        for p in range(Ap[j], Ap[j + 1]):
            A[Ai[p], j] = Ax[p]
    A = A + np.triu(A, 1).T
    assert np.linalg.norm(A @ x - b) <= 1e-12


def test_pattern_reuse_across_factorizations():
    """Analyze once, factor twice with different values (the allocate-once
    contract of the wrapper)."""
    n = 3
    Ap = [0, 1, 2, 4]
    Ai = [0, 1, 0, 2]
    ldl = SparseLDL(n, Ap, Ai)
    for scale in (1.0, 3.0):
        vals = np.array([2.0, -1.0, 0.5, -2.0]) * scale
        ldl.factor(vals)
        b = np.array([1.0, 2.0, 3.0])
        x = b.copy()
        ldl.solve(x)
        A = np.array([[vals[0], 0, vals[2]],
                      [0, vals[1], 0],
                      [vals[2], 0, vals[3]]])
        np.testing.assert_allclose(A @ x, b, atol=1e-13)


def test_missing_diagonal_rejected():
    with pytest.raises(ValueError):
        SparseLDL(2, [0, 1, 1], [0])


def test_zero_pivot_detected():
    ldl = SparseLDL(2, [0, 1, 2], [0, 1])
    with pytest.raises(ZeroDivisionError):
        ldl.factor([1.0, 0.0])
