"""Primal-dual variable pytree.

The reference's FullVariable (fbstab/components/full_variable.{h,cc}) is a
mutable (z, l, v, y) quadruple whose constraint margin y = b - A z is
maintained *algebraically* through every axpy (full_variable.cc:55-65) so the
hot loops never pay a gemv for it. The TPU-native equivalent is an immutable
NamedTuple pytree with the same margin-preserving update rules; the four
reference workspaces (x1..x4) become loop-carried values.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Variable(NamedTuple):
    """Primal-dual point.

    z: decision variables            (nz,)
    l: equality duals                (nl,)
    v: inequality duals              (nv,)
    y: constraint margin b - A z     (nv,)
    """

    z: jnp.ndarray
    l: jnp.ndarray
    v: jnp.ndarray
    y: jnp.ndarray


def var_axpy(a, x: Variable, acc: Variable, b_vec) -> Variable:
    """acc + a*x with the margin identity preserved.

    The margin update is y <- acc.y + a*(x.y - b), so that if both margins
    satisfy y = b - A z then the result does too, with no gemv
    (reference: FullVariable::axpy, full_variable.cc:55-65).
    """
    return Variable(
        z=acc.z + a * x.z,
        l=acc.l + a * x.l,
        v=acc.v + a * x.v,
        y=acc.y + a * (x.y - b_vec),
    )


def var_norm(x: Variable):
    """2-norm over (z, l, v) only; y is excluded
    (reference: FullVariable::Norm, full_variable.cc:77-83)."""
    s = (
        jnp.sum(x.z * x.z)
        + jnp.sum(x.l * x.l)
        + jnp.sum(x.v * x.v)
    )
    return jnp.sqrt(s)


def project_duals(x: Variable) -> Variable:
    """v <- max(v, 0) (reference: FullVariable::ProjectDuals,
    full_variable.cc:75)."""
    return x._replace(v=jnp.maximum(x.v, 0.0))


def fill_like(x: Variable, a, b_vec, gemv_a) -> Variable:
    """All of (z, l, v) set to the constant a, margin re-initialized as
    y = b - A z (reference: FullVariable::Fill + InitializeConstraintMargin,
    full_variable.cc:41-53)."""
    z = jnp.full_like(x.z, a)
    l = jnp.full_like(x.l, a)
    v = jnp.full_like(x.v, a)
    return Variable(z=z, l=l, v=v, y=b_vec - gemv_a(z))
