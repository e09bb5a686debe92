"""Per-compile forwarding of the scoped-VMEM budget.

The fused solver kernels need a scoped-VMEM budget above the 16 MiB
default (see ops/mpc_solve_pallas.py). Two delivery channels exist:

1. ``LIBTPU_INIT_ARGS`` env var — honored when libtpu initializes in
   this process (set in ``fbstab_tpu/__init__.py``). Remote-compile
   tunnels (axon's chipless AOT helper) snapshot the *terminal's* env
   instead and silently drop it.
2. Per-compile ``compiler_options`` — serialized into the XLA
   CompileOptions proto as env_option_overrides and applied by whichever
   process runs the backend compiler, local or remote. This is the only
   channel that survives a remote-compile tunnel.

``vmem_jit`` below is ``jax.jit`` plus channel 2: when the call is
top-level (not inside an ambient trace) and the default backend is TPU,
the jit carries ``{"xla_tpu_scoped_vmem_limit_kib": <limit>}``. Under an
outer jit the plain variant is used (JAX forbids compiler_options on
nested jits) — the OUTER jit owns the compile, so callers that wrap
framework entry points in their own ``jax.jit`` must pass
``compiler_options=tpu_compiler_options()`` themselves (bench.py does).
Non-TPU backends reject the TPU-only option, so it is never attached
there; the CPU test suite runs the plain jits.
"""

from __future__ import annotations

import functools

import jax

try:  # jax 0.9 internal; degrade to "always top-level" if it moves.
    from jax._src.core import trace_state_clean as _trace_state_clean
except ImportError:  # pragma: no cover
    def _trace_state_clean() -> bool:
        return True

#: Scoped-VMEM budget (KiB) for the fused MPC kernels: 112 MiB of the
#: 128 MiB physical VMEM on v5e, leaving headroom for Mosaic's own use.
VMEM_LIMIT_KIB = 114688


def tpu_compiler_options(limit_kib: int = VMEM_LIMIT_KIB):
    """compiler_options dict raising the scoped-VMEM budget, or None when
    the default backend is not TPU (the option is TPU-only and other
    backends reject unknown overrides). Initializes the backend."""
    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(int(limit_kib))}


def vmem_jit(fun=None, *, static_argnames=(), limit_kib: int = VMEM_LIMIT_KIB):
    """``jax.jit`` that attaches the scoped-VMEM compiler option on
    top-level TPU calls. Usable as ``@vmem_jit`` or
    ``@vmem_jit(static_argnames=..., limit_kib=...)``."""
    if fun is None:
        return functools.partial(
            vmem_jit, static_argnames=static_argnames, limit_kib=limit_kib)

    plain = jax.jit(fun, static_argnames=static_argnames)
    with_opts = {}

    @functools.wraps(fun)
    def wrapper(*args, **kwargs):
        if not _trace_state_clean():
            return plain(*args, **kwargs)
        opts = tpu_compiler_options(limit_kib)
        if opts is None:
            return plain(*args, **kwargs)
        jitted = with_opts.get(limit_kib)
        if jitted is None:
            jitted = with_opts[limit_kib] = jax.jit(
                fun, static_argnames=static_argnames, compiler_options=opts)
        return jitted(*args, **kwargs)

    wrapper._plain = plain  # for tests / introspection
    return wrapper
