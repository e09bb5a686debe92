"""Unit tests for the unrolled batched small-matrix kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbstab_tpu.ops.smallchol import (
    cho_solve_small,
    cholesky_small,
    solve_triangular_small,
)


@pytest.mark.parametrize("n", [1, 2, 3, 8, 17])
def test_cholesky_matches_lapack(n):
    rng = np.random.default_rng(n)
    M = rng.standard_normal((5, n, n))
    A = jnp.asarray(M @ np.transpose(M, (0, 2, 1)) + n * np.eye(n))
    L = cholesky_small(A)
    np.testing.assert_allclose(L, np.linalg.cholesky(np.asarray(A)),
                               atol=1e-12)
    # Strictly upper part is exactly zero.
    assert np.all(np.triu(np.asarray(L), 1) == 0.0)


@pytest.mark.parametrize("rhs_shape", [(), (4,)])
def test_triangular_solves(rhs_shape):
    n = 6
    rng = np.random.default_rng(0)
    M = rng.standard_normal((3, n, n))
    A = M @ np.transpose(M, (0, 2, 1)) + n * np.eye(n)
    L = np.linalg.cholesky(A)
    b = rng.standard_normal((3, n) + rhs_shape)

    x = solve_triangular_small(jnp.asarray(L), jnp.asarray(b), lower=True)
    ref = np.stack([
        np.linalg.solve(L[i], b[i]) for i in range(3)])
    np.testing.assert_allclose(x, ref, atol=1e-12)

    xu = solve_triangular_small(
        jnp.asarray(np.transpose(L, (0, 2, 1))), jnp.asarray(b), lower=False)
    refu = np.stack([
        np.linalg.solve(L[i].T, b[i]) for i in range(3)])
    np.testing.assert_allclose(xu, refu, atol=1e-12)


def test_cho_solve():
    n = 5
    rng = np.random.default_rng(1)
    M = rng.standard_normal((n, n))
    A = M @ M.T + n * np.eye(n)
    L = np.linalg.cholesky(A)
    b = rng.standard_normal(n)
    x = cho_solve_small(jnp.asarray(L), jnp.asarray(b))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), atol=1e-11)


def test_non_spd_produces_nan():
    A = jnp.asarray(np.diag([1.0, -1.0, 2.0]))
    L = cholesky_small(A)
    assert bool(jnp.any(jnp.isnan(L)))


def test_vmap_and_jit():
    n = 4
    rng = np.random.default_rng(2)
    M = rng.standard_normal((16, n, n))
    A = jnp.asarray(M @ np.transpose(M, (0, 2, 1)) + n * np.eye(n))
    L = jax.jit(jax.vmap(cholesky_small))(A)
    np.testing.assert_allclose(L, np.linalg.cholesky(np.asarray(A)),
                               atol=1e-12)
