"""utils/compile.py: scoped-VMEM compiler-option forwarding.

The TPU-only assertion (options actually attached and honored) can only
run on real TPU; here we pin the CPU-side contract the suite relies on:
no options on non-TPU backends, nested calls never carry options (JAX
forbids it), and the wrapper preserves jit semantics.
"""

import jax
import jax.numpy as jnp

from fbstab_tpu.utils.compile import (
    VMEM_LIMIT_KIB,
    tpu_compiler_options,
    vmem_jit,
)


def test_options_none_on_cpu():
    assert jax.default_backend() == "cpu"
    assert tpu_compiler_options() is None
    assert tpu_compiler_options(65536) is None


def test_vmem_jit_top_level_and_static_args():
    calls = []

    @vmem_jit(static_argnames=("k",))
    def f(x, k=2):
        calls.append(k)
        return x * k

    assert f(jnp.float32(3.0)) == 6.0
    assert f(jnp.float32(3.0), k=4) == 12.0
    # static_argnames respected: one trace per k value.
    assert sorted(calls) == [2, 4]


def test_vmem_jit_nested_under_outer_jit():
    @vmem_jit
    def f(x):
        return x + 1

    # Must not raise "compiler_options on nested jit" on any backend.
    out = jax.jit(lambda x: f(x) * 2)(jnp.float32(1.0))
    assert out == 4.0


def test_vmem_jit_vmem_limit_constant_matches_init_flag():
    import fbstab_tpu  # noqa: F401  (sets LIBTPU_INIT_ARGS)
    import os

    assert f"--xla_tpu_scoped_vmem_limit_kib={VMEM_LIMIT_KIB}" in \
        os.environ.get("LIBTPU_INIT_ARGS", "")
