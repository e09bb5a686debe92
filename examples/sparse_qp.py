"""Large sparse QP through FBstabSparse — the QP class the reference
only ever planned (ROADMAP): CSR data ops + native C sparse LDL' with
RCM ordering, batched over host cores.

Run:  python examples/sparse_qp.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np

from fbstab_tpu import FBstabSparse, Options, sparse_qp_data


def main():
    jax.config.update("jax_platforms", "cpu")   # host-hybrid path
    jax.config.update("jax_enable_x64", True)

    # A banded 1-D "contact" problem: tridiagonal stiffness, box-ish
    # inequality rows, a handful of coupling equalities.
    rng = np.random.default_rng(0)
    nz, nl, nv = 600, 30, 300
    H = np.zeros((nz, nz))
    for i in range(nz):
        H[i, i] = 2.0 + rng.random()
        if i + 1 < nz:
            H[i, i + 1] = H[i + 1, i] = -0.9
    f = rng.standard_normal(nz)
    G = np.zeros((nl, nz))
    for j in range(nl):
        G[j, rng.choice(nz, 4, replace=False)] = rng.standard_normal(4)
    h = rng.standard_normal(nl) * 0.1
    A = np.zeros((nv, nz))
    for j in range(nv):
        A[j, rng.choice(nz, 3, replace=False)] = rng.standard_normal(3)
    b = np.abs(rng.standard_normal(nv)) + 1.0

    t0 = time.perf_counter()
    pattern, data = sparse_qp_data(H, f, G, h, A, b)
    print(f"symbolic analysis {time.perf_counter() - t0:.2f}s: "
          f"KKT nnz {pattern.knnz}, nnz(L) {pattern.lnnz} "
          f"(RCM-ordered), LDL backend: {pattern._ldl.backend}")

    solver = FBstabSparse(pattern, Options(abs_tol=1e-8))
    x, out = solver.solve(data)                  # compile + solve
    x, out = solver.solve(data, x0=x)            # warmstarted re-solve
    print(f"eflag {int(out.eflag)}, residual {float(out.residual):.2e}, "
          f"warm prox iters {int(out.prox_iters)}, "
          f"solve {float(out.solve_time) * 1e3:.1f} ms")

    # KKT sanity on the host.
    z, v, l = np.asarray(x.z), np.asarray(x.v), np.asarray(x.l)
    stat = H @ z + f + G.T @ l + A.T @ v
    print(f"stationarity ||Hz+f+G'l+A'v|| = {np.linalg.norm(stat):.2e}")


if __name__ == "__main__":
    main()
