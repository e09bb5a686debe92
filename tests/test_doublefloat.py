"""Double-float arithmetic vs f64 oracles (CPU).

The error-free transformations must be EXACT (two_sum/two_prod) or
near-f64 accurate (compound ops); these tests pin that against numpy
float64 on the f32 instantiations used on TPU.
"""

import jax.numpy as jnp
import numpy as np

from fbstab_tpu.ops.doublefloat import (
    df,
    df_add,
    df_div_f,
    df_matvec,
    df_matvec_T,
    df_mul,
    df_sqrt,
    df_to,
    two_prod,
    two_sum,
)

RNG = np.random.default_rng(42)


def _r32(*shape, scale=1.0):
    return jnp.asarray(scale * RNG.standard_normal(shape), jnp.float32)


def _up(p):
    return np.asarray(p[0], np.float64) + np.asarray(p[1], np.float64)


def test_two_sum_exact():
    a, b = _r32(4096), _r32(4096, scale=1e-6)
    s, e = two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact)


def test_two_prod_exact():
    # f32*f32 is exactly representable in f64 (48 <= 53 bits), so the
    # pair must reproduce the f64 product bit-for-bit.
    a, b = _r32(4096, scale=3.0), _r32(4096)
    p, e = two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


def test_df_compound_accuracy():
    a, b = _r32(1024), _r32(1024)
    x = two_prod(a, b)
    y = two_sum(a, -b)
    s = df_add(x, y)
    m = df_mul(x, y)
    ax, ay = _up(x), _up(y)
    np.testing.assert_allclose(_up(s), ax + ay, rtol=1e-13, atol=1e-18)
    np.testing.assert_allclose(_up(m), ax * ay, rtol=1e-12, atol=1e-18)

    q = df_div_f(x, a)
    np.testing.assert_allclose(_up(q), ax / np.asarray(a, np.float64),
                               rtol=1e-12, atol=1e-18)

    pos = df_add(two_prod(a, a), df(jnp.float32(1e-3) * jnp.ones(1024,
                                                                 jnp.float32)))
    r = df_sqrt(pos)
    np.testing.assert_allclose(_up(r), np.sqrt(_up(pos)), rtol=1e-12)


def test_df_sqrt_cancellation():
    """The pfb cancellation scenario: y + v - sqrt(y^2 + v^2) with
    |y| << v must come out accurate to ~1e-12 absolute, far below the
    ~1e-7 f32 round-off of the naive evaluation."""
    y = jnp.asarray(1e-5 * RNG.standard_normal(512), jnp.float32)
    v = jnp.asarray(1.0 + RNG.random(512), jnp.float32)
    s = df_sqrt(df_add(df_mul(df(y), df(y)), df_mul(df(v), df(v))))
    fb = df_add(df_add(df(y), df(v)), (-s[0], -s[1]))
    y64, v64 = np.asarray(y, np.float64), np.asarray(v, np.float64)
    exact = y64 + v64 - np.sqrt(y64 * y64 + v64 * v64)
    np.testing.assert_allclose(_up(fb), exact, atol=1e-12)


def test_df_matvec_accuracy():
    M = _r32(8, 7, 6, 5)
    xhi = _r32(8, 7, 5)
    xlo = _r32(8, 7, 5, scale=1e-8)
    out = df_matvec(M, (xhi, xlo))
    M64 = np.asarray(M, np.float64)
    x64 = np.asarray(xhi, np.float64) + np.asarray(xlo, np.float64)
    exact = np.einsum("bsij,bsj->bsi", M64, x64)
    np.testing.assert_allclose(_up(out), exact, rtol=1e-11, atol=1e-14)

    outT = df_matvec_T(M, (out[0], out[1]))
    exactT = np.einsum("bsij,bsi->bsj", M64, exact)
    np.testing.assert_allclose(_up(outT), exactT, rtol=1e-10, atol=1e-13)


def test_df_to_rounding():
    a = _r32(64)
    e = _r32(64, scale=1e-9)
    s, lo = two_sum(a, e)
    np.testing.assert_array_equal(df_to((s, lo)), s + lo)
