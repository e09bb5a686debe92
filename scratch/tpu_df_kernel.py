"""Do the error-free transforms survive Mosaic compilation?

The XLA-level df ops (ops/doublefloat.py) pin their dataflow with
lax.optimization_barrier because XLA's algebraic simplifier rewrites
(a + b) - a -> b. Inside a Pallas TPU kernel there is no
optimization_barrier; the question is whether Mosaic's lowering performs
value-changing float rewrites (reassociation / FMA contraction that
breaks Dekker's product, simplification that cancels two_sum's
compensation). If the transforms stay exact in-kernel, a fused df-KKT
refinement kernel is buildable; if not, that avenue is dead.

Checks two_sum and two_prod elementwise on adversarial magnitude spreads
plus a compensated dot product, against f64 host truth.
"""
import sys; sys.path.insert(0, "/root/repo")
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import fbstab_tpu  # noqa: F401  (sets the VMEM env before backend init)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _two_prod(a, b):
    p = a * b
    c = jnp.float32(4097.0)
    a_big = c * a
    a_hi = a_big - (a_big - a)
    a_lo = a - a_hi
    b_big = c * b
    b_hi = b_big - (b_big - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def kernel(a_ref, b_ref, s_ref, e_ref, p_ref, pe_ref, dh_ref, dl_ref):
    a = a_ref[...]
    b = b_ref[...]
    s, e = _two_sum(a, b)
    p, pe = _two_prod(a, b)
    s_ref[...] = s
    e_ref[...] = e
    p_ref[...] = p
    pe_ref[...] = pe
    # Compensated dot product along axis 0 (sublanes): sum_i a_i * b_i
    # accumulated in df.
    hi = jnp.zeros_like(a[0:1])
    lo = jnp.zeros_like(a[0:1])
    for i in range(a.shape[0]):
        ph, pl_ = _two_prod(a[i:i+1], b[i:i+1])
        hi, e1 = _two_sum(hi, ph)
        lo = lo + (e1 + pl_)
        hi, e2 = _two_sum(hi, lo)
        lo = e2
    dh_ref[...] = hi
    dl_ref[...] = lo


def run(interpret):
    rng = np.random.default_rng(0)
    R, C = 8, 128
    # Adversarial spreads: magnitudes differing by up to 2^30.
    a = (rng.standard_normal((R, C)) *
         np.exp2(rng.integers(-15, 15, (R, C)))).astype(np.float32)
    b = (rng.standard_normal((R, C)) *
         np.exp2(rng.integers(-15, 15, (R, C)))).astype(np.float32)
    out = jax.jit(functools.partial(
        pl.pallas_call,
        out_shape=[jax.ShapeDtypeStruct((R, C), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((1, C), jnp.float32)] * 2,
        interpret=interpret)(kernel))(a, b)
    s, e, p, pe, dh, dl = map(np.asarray, out)
    a64, b64 = a.astype(np.float64), b.astype(np.float64)
    ts_exact = np.all(s.astype(np.float64) + e.astype(np.float64)
                      == a64 + b64)
    tp_exact = np.all(p.astype(np.float64) + pe.astype(np.float64)
                      == a64 * b64)
    dot64 = (a64 * b64).sum(0)
    dot_df = dh[0].astype(np.float64) + dl[0].astype(np.float64)
    rel = np.max(np.abs(dot_df - dot64) /
                 np.maximum(np.abs(dot64), 1e-30))
    f32_rel = np.max(np.abs((a * b).sum(0, dtype=np.float32)
                            .astype(np.float64) - dot64) /
                     np.maximum(np.abs(dot64), 1e-30))
    mode = "interpret" if interpret else "mosaic"
    print(f"[{mode}] two_sum exact: {ts_exact}  two_prod exact: {tp_exact}  "
          f"dot df rel err: {rel:.2e} (plain f32: {f32_rel:.2e})",
          flush=True)
    return ts_exact and tp_exact


if __name__ == "__main__":
    ok_i = run(interpret=True)
    if jax.devices()[0].platform == "tpu":
        ok_m = run(interpret=False)
        sys.exit(0 if (ok_i and ok_m) else 1)
    sys.exit(0 if ok_i else 1)
