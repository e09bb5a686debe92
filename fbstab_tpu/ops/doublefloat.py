"""Double-float ("two-float") arithmetic for TPU accuracy recovery.

TPU v5e has no f64 hardware, but the reference's accuracy contract is a
1e-6 KKT residual (fbstab_algorithm-impl.h:43-44) — below the f32
round-off floor of residual evaluation (~1e-5 on the bench problems).
This module represents a value as an unevaluated sum hi + lo of two f32s
(~2x24 = 48 significand bits, unit roundoff ~ 4e-15) using the classic
error-free transformations:

 - two_sum:  Knuth's branch-free exact addition (6 flops)
 - two_prod: Dekker's exact product via 2^12+1 splitting (17 flops);
   exact when the underlying f32 multiply/add are IEEE round-to-nearest,
   which the TPU VPU provides. (If a compiler ever contracts parts of the
   error expression into FMAs the error term only gets MORE accurate.)

All functions are elementwise over arrays and jit/vmap-safe. A DF value
is a plain (hi, lo) tuple of equal-shape arrays.

Used by models/refine.py for compensated residual evaluation + iterative
refinement on top of the f32 solver path. Tested against f64 oracles in
tests/test_doublefloat.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _opaque(x):
    """Hides a value's defining expression from XLA's algebraic
    simplifier. The error-free transforms below are only exact if the
    compiler does NOT apply value-changing rewrites like
    (a + b) - a -> b; under jit, fused loop bodies were measured to lose
    the compensation terms exactly that way (the refinement loop's df
    residual degraded to plain-f32 accuracy inside lax.while_loop while
    the identical eager computation stayed exact). optimization_barrier
    is free at runtime — it only pins the dataflow."""
    return lax.optimization_barrier(x)

# Dekker split constant for f32 (2^12 + 1). For f64 inputs (CPU testing)
# the same algorithms work with the f64 constant; the split picks the
# constant from the dtype.
_SPLIT_F32 = 4097.0          # 2^12 + 1
_SPLIT_F64 = 134217729.0     # 2^27 + 1


def _split_const(dtype):
    return _SPLIT_F32 if dtype == jnp.float32 else _SPLIT_F64


def two_sum(a, b):
    """Exact addition: s + e == a + b with s = fl(a + b)."""
    s = _opaque(a + b)
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Exact addition assuming |a| >= |b| (3 flops)."""
    s = _opaque(a + b)
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Exact product: p + e == a * b with p = fl(a * b) (Dekker)."""
    p = _opaque(a * b)
    c = jnp.asarray(_split_const(a.dtype), a.dtype)
    a_big = _opaque(c * a)
    a_hi = a_big - (a_big - a)
    a_lo = a - a_hi
    b_big = _opaque(c * b)
    b_hi = b_big - (b_big - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def df(hi, lo=None):
    """Lifts an array (or pair) into DF form."""
    if lo is None:
        lo = jnp.zeros_like(hi)
    return (hi, lo)


def df_to(x):
    """Collapses a DF to its nearest single-float value."""
    return x[0] + x[1]


def df_neg(x):
    return (-x[0], -x[1])


def df_add(x, y):
    """DF + DF (Dekker/Knuth add, ~2 ulp accurate)."""
    s, e = two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    return fast_two_sum(s, e)


def df_add_f(x, a):
    """DF + float."""
    s, e = two_sum(x[0], a)
    e = e + x[1]
    return fast_two_sum(s, e)


def df_sub(x, y):
    return df_add(x, df_neg(y))


def df_mul_ff(a, b):
    """float * float -> DF (exact)."""
    return two_prod(a, b)


def df_mul_f(x, a):
    """DF * float."""
    p, e = two_prod(x[0], a)
    e = e + x[1] * a
    return fast_two_sum(p, e)


def df_mul(x, y):
    """DF * DF."""
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(p, e)


def df_div_f(x, a):
    """DF / float via one Newton correction on the f32 quotient."""
    q = x[0] / a
    # remainder r = x - q*a computed exactly-ish in DF
    p, e = two_prod(q, a)
    r = df_add(x, (-p, -e))
    return fast_two_sum(q, df_to(r) / a)


def df_sqrt(x):
    """sqrt(DF) via one Newton step: s + (x - s^2) / (2 s)."""
    s = jnp.sqrt(x[0])
    p, e = two_prod(s, s)
    r = df_add(x, (-p, -e))
    # Guard s == 0 (sqrt of 0): correction is 0 there.
    denom = jnp.where(s > 0, 2.0 * s, jnp.ones_like(s))
    corr = jnp.where(s > 0, df_to(r) / denom, jnp.zeros_like(s))
    return fast_two_sum(s, corr)


def df_min(x, y):
    """Elementwise min by hi-then-lo lexicographic comparison."""
    take_x = (x[0] < y[0]) | ((x[0] == y[0]) & (x[1] <= y[1]))
    return (jnp.where(take_x, x[0], y[0]), jnp.where(take_x, x[1], y[1]))


def df_max0(x):
    """max(0, DF)."""
    pos = (x[0] > 0) | ((x[0] == 0) & (x[1] > 0))
    return (jnp.where(pos, x[0], 0.0), jnp.where(pos, x[1], 0.0))


def df_where(pred, x, y):
    return (jnp.where(pred, x[0], y[0]), jnp.where(pred, x[1], y[1]))


def df_matvec(M, x):
    """Compensated matvec over the LAST axis of M: M (..., m, k) float,
    x = (hi, lo) DF with shape (..., k) -> DF (..., m).

    Unrolls the k contraction in a Python loop of error-free transforms;
    XLA fuses the unrolled chain, so the HBM traffic stays ~one pass over
    M. Intended for the small QP contraction dims (k <= ~64)."""
    hi, lo = x
    acc = df(jnp.zeros(M.shape[:-1], M.dtype))
    for j in range(M.shape[-1]):
        m = M[..., j]
        p, e = two_prod(m, hi[..., j:j + 1])
        e = e + m * lo[..., j:j + 1]
        acc = df_add(acc, (p, e))
    return acc


def df_matvec_T(M, x):
    """Compensated transposed matvec: M (..., m, k) float,
    x DF (..., m) -> DF (..., k) computing M'x."""
    hi, lo = x
    acc = df(jnp.zeros(M.shape[:-2] + (M.shape[-1],), M.dtype))
    for i in range(M.shape[-2]):
        m = M[..., i, :]
        p, e = two_prod(m, hi[..., i:i + 1])
        e = e + m * lo[..., i:i + 1]
        acc = df_add(acc, (p, e))
    return acc
