"""Probe: what precision do the beyond-envelope path's small batched
einsums actually run at on TPU? If XLA lowers them to single-pass-bf16
MXU dots, per-op relative error is ~1e-2/-3 and both round-5
beyond-envelope contract failures (copoly N=320 stagnation, di N=480
refine stall) are explained; explicit precision=HIGHEST is then the fix.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

rng = np.random.default_rng(0)
for B, n in ((256, 18), (256, 2), (8192, 8)):
    A = rng.standard_normal((B, n, n))
    x = rng.standard_normal((B, n))
    ref = np.einsum("bij,bj->bi", A, x)
    Aj = jnp.asarray(A, jnp.float32)
    xj = jnp.asarray(x, jnp.float32)

    for label, fn in (
        ("default", jax.jit(lambda a, b: jnp.einsum("bij,bj->bi", a, b))),
        ("HIGHEST", jax.jit(lambda a, b: jnp.einsum(
            "bij,bj->bi", a, b, precision=lax.Precision.HIGHEST))),
        ("mul+sum", jax.jit(lambda a, b: jnp.sum(a * b[:, None, :],
                                                 axis=-1))),
    ):
        out = np.asarray(fn(Aj, xj), np.float64)
        err = np.max(np.abs(out - ref) / (np.abs(ref) + 1e-9))
        print(f"B={B} n={n} {label:8s} max rel err {err:.2e}", flush=True)

# And a long-recursion probe: 480 sequential (n x n) matvecs, the di
# Riccati-recursion error profile.
n, N = 2, 480
M = rng.standard_normal((N, n, n)) * 0.7
v0 = rng.standard_normal((n,))
ref = v0.copy()
for k in range(N):
    ref = M[k] @ ref / np.linalg.norm(M[k] @ ref)
Mj = jnp.asarray(M, jnp.float32)


def chain(precision):
    def body(c, m):
        y = jnp.einsum("ij,j->i", m, c, precision=precision)
        return y / jnp.linalg.norm(y), None
    return jax.jit(lambda v: lax.scan(body, v, Mj)[0])


for label, p in (("default", None), ("HIGHEST", lax.Precision.HIGHEST)):
    out = np.asarray(chain(p)(jnp.asarray(v0, jnp.float32)), np.float64)
    print(f"chain N={N} n={n} {label:8s} rel err "
          f"{np.max(np.abs(out - ref) / (np.abs(ref) + 1e-9)):.2e}",
          flush=True)
