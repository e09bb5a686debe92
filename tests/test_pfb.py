"""Unit tests for the penalized FB function and gradient.

Oracles re-derived from the reference formulas (full_residual.cc:115-118,
dense_cholesky_solver.cc:129-148) with a NumPy scalar re-implementation,
checked to 1e-14 in the spirit of the reference's disabled component tests
(SURVEY.md section 4.2).
"""

import numpy as np
import jax.numpy as jnp

from fbstab_tpu.ops.pfb import ZERO_TOLERANCE, pfb, pfb_gradient, pfb_weights


def pfb_oracle(a, b, alpha):
    fb = a + b - np.sqrt(a * a + b * b)
    return alpha * fb + (1 - alpha) * max(0.0, a) * max(0.0, b)


def pfb_gradient_oracle(a, b, alpha):
    r = np.sqrt(a * a + b * b)
    d = 1.0 / np.sqrt(2.0)
    if r < ZERO_TOLERANCE:
        return alpha * (1 - d), alpha * (1 - d)
    if a > 0 and b > 0:
        return (alpha * (1 - a / r) + (1 - alpha) * b,
                alpha * (1 - b / r) + (1 - alpha) * a)
    return alpha * (1 - a / r), alpha * (1 - b / r)


SAMPLES = [
    (0.0, 0.0), (1e-14, -1e-14), (1.0, 1.0), (2.0, -3.0), (-2.0, 3.0),
    (-1.0, -1.0), (5.0, 0.0), (0.0, 5.0), (1e-13, 1e-13), (1e3, 1e-3),
    (-1e-8, 1e8),
]


def test_pfb_matches_oracle():
    alpha = 0.95
    for a, b in SAMPLES:
        got = float(pfb(jnp.float64(a), jnp.float64(b), alpha))
        want = pfb_oracle(a, b, alpha)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-14)


def test_pfb_gradient_matches_oracle():
    for alpha in (0.95, 0.5):
        for a, b in SAMPLES:
            ga, gb = pfb_gradient(jnp.float64(a), jnp.float64(b), alpha)
            wa, wb = pfb_gradient_oracle(a, b, alpha)
            np.testing.assert_allclose(float(ga), wa, rtol=0, atol=1e-14)
            np.testing.assert_allclose(float(gb), wb, rtol=0, atol=1e-14)


def test_pfb_gradient_no_nan_at_origin():
    ga, gb = pfb_gradient(jnp.float64(0.0), jnp.float64(0.0), 0.95)
    assert np.isfinite(float(ga)) and np.isfinite(float(gb))


def test_pfb_weights_formula():
    """gamma = ga, mu = gb + sigma*ga, Gamma = gamma/mu
    (dense_cholesky_solver.cc:54-60)."""
    alpha, sigma = 0.95, 1e-8
    y = jnp.array([1.0, -2.0, 0.0, 3.0])
    v = jnp.array([0.5, 1.0, 0.0, -1.0])
    vbar = jnp.array([0.4, 1.1, 0.0, -0.9])
    gamma, mus, Gamma = pfb_weights(y, v, vbar, sigma, alpha)
    for i in range(4):
        ys = float(y[i]) + sigma * (float(v[i]) - float(vbar[i]))
        ga, gb = pfb_gradient_oracle(ys, float(v[i]), alpha)
        np.testing.assert_allclose(float(gamma[i]), ga, atol=1e-15)
        np.testing.assert_allclose(float(mus[i]), gb + sigma * ga, atol=1e-15)
        np.testing.assert_allclose(float(Gamma[i]), ga / (gb + sigma * ga),
                                   atol=1e-15)
