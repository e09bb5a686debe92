"""Sparse QP specialization: CSR data ops + native sparse-LDL' Newton
solver + FBstabSparse facade.

The reference PLANNED this QP class and never shipped it: FBstabSparse is
a roadmap item (/root/reference/README.md:47, ROADMAP.md:10-13) whose only
groundwork is the QDLDL wrapper (tools/qdldl/qdldl_wrapper.h:19). This
module completes that design in the new framework:

 - Matrix-free data ops (the 8-gemv Data contract,
   fbstab/components/abstract_components.h:24-62) over CSR values:
   gathers + segment-sums, jittable and vmappable. The sparsity PATTERN is
   static (baked into the trace, like shapes); the VALUES are the traced
   data pytree — the trace-once/solve-many analog of the reference's
   zero-copy Eigen maps.
 - Newton-step solver: the same quasi-definite KKT system the dense path
   solves (K = [H + sigma*I + A'*diag(Gamma)*A, G'; G, -sigma*I], paper
   (28)/(29), dense_cholesky_solver.cc:52-78) — but assembled sparse
   (precomputed static scatter maps; one fused scatter-add under jit) and
   factored by the native C sparse LDL' (native/sparse_ldl.c) through
   `jax.pure_callback`. Sparse triangular elimination is pointer-chasing
   — host CPU work by design; see utils/sparse_ldl.py. The symbolic
   analysis runs once per pattern, factor/solve are allocation-free.

Placement in the TPU design: batched dense/MPC solves are the TPU hot
path (Pallas kernels); the sparse path is the host-hybrid solver for
large unstructured sparse QPs that would be quadratically wasteful to
materialize dense. On the CPU backend the callback is free; on TPU each
Newton step round-trips to the host — correct, but intended for CPU use.
"""

from __future__ import annotations

import functools
import threading
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fbstab_tpu.core.algorithm import fbstab_solve
from fbstab_tpu.core.problem import ProblemOps
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.options import Options
from fbstab_tpu.ops.pfb import pfb_weights
from fbstab_tpu.solver_out import SolverOut
from fbstab_tpu.utils.sparse_ldl import SparseLDL


class _CSRPattern(NamedTuple):
    """Static CSR pattern (indptr, indices) of an (m, n) matrix, plus the
    precomputed per-entry row ids that make gemv a single segment-sum."""

    indptr: np.ndarray   # (m+1,) int64
    indices: np.ndarray  # (nnz,) int64, column of each entry
    row_ids: np.ndarray  # (nnz,) int64, row of each entry
    m: int
    n: int

    @property
    def nnz(self) -> int:
        return int(self.indptr[-1])


def _csr_pattern(indptr, indices, m: int, n: int) -> _CSRPattern:
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int64)
    if indptr.shape != (m + 1,):
        raise ValueError(f"indptr must have length {m + 1}.")
    row_ids = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    return _CSRPattern(indptr=indptr, indices=indices, row_ids=row_ids,
                       m=m, n=n)


def _csr_from_dense_mask(M: np.ndarray) -> _CSRPattern:
    m, n = M.shape
    mask = M != 0.0
    indptr = np.zeros(m + 1, np.int64)
    np.cumsum(mask.sum(axis=1), out=indptr[1:])
    indices = np.nonzero(mask)[1].astype(np.int64)
    return _csr_pattern(indptr, indices, m, n)


def _gemv(pat: _CSRPattern, vals, x):
    """CSR matvec: y = M @ x, one gather + one segment-sum (jittable,
    vmappable; indices are static constants in the trace)."""
    if pat.nnz == 0:
        return jnp.zeros((pat.m,), x.dtype)
    return jax.ops.segment_sum(
        vals * x[pat.indices], pat.row_ids, num_segments=pat.m,
        indices_are_sorted=True)


def _gemv_t(pat: _CSRPattern, vals, y):
    """Transposed CSR matvec: x = M' @ y."""
    if pat.nnz == 0:
        return jnp.zeros((pat.n,), y.dtype)
    return jax.ops.segment_sum(
        vals * y[pat.row_ids], pat.indices, num_segments=pat.n)


def _host_workers() -> int:
    import os
    return max(1, min(8, os.cpu_count() or 1))


def _fill_reducing_perm(n: int, entries, ordering: str):
    """(perm, iperm) with new index a <-> old index perm[a]. RCM over
    K's adjacency when requested and scipy is present; identity
    otherwise."""
    ident = np.arange(n, dtype=np.int64)
    if ordering == "natural" or n <= 2:
        return ident, ident.copy()
    try:
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee
    except ImportError:  # pragma: no cover
        return ident, ident.copy()
    rows, cols = [], []
    for i, j in entries:
        rows.append(i)
        cols.append(j)
        if i != j:
            rows.append(j)
            cols.append(i)
    M = coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n)).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(M, symmetric_mode=True),
                      np.int64)
    iperm = np.empty(n, np.int64)
    iperm[perm] = ident
    return perm, iperm


class SparsePattern:
    """Symbolic side of a sparse QP: CSR patterns of H (full symmetric),
    G, A, and everything derived from them — the upper-triangular CSC
    pattern of the quasi-definite KKT matrix K, the static scatter maps
    that assemble K's values under jit, and the sparse LDL' symbolic
    factorization (elimination tree, nnz(L)).

    Build once per problem structure and reuse across solves/batches
    (the analog of the reference wrapper's analyze-in-constructor,
    qdldl_wrapper.h:24-45). Hashable by identity: jit specializes per
    pattern object.

    ``ordering``: fill-reducing symmetric permutation of K. "rcm"
    (default) uses reverse Cuthill-McKee on K's adjacency; "natural"
    keeps the [z; l] order. Any symmetric permutation is numerically
    safe here — K is quasi-definite, hence strongly factorizable
    (the reference's QDLDL likewise takes a caller-chosen permutation).
    """

    def __init__(self, H: _CSRPattern, G: _CSRPattern, A: _CSRPattern,
                 ordering: str = "rcm"):
        if H.m != H.n:
            raise ValueError("H must be square.")
        nz, nl, nv = H.n, G.m, A.m
        if G.n != nz or A.n != nz:
            raise ValueError("G and A must have nz columns.")
        if ordering not in ("rcm", "natural"):
            raise ValueError(f"Unknown ordering {ordering!r}.")
        self.H, self.G, self.A = H, G, A
        self.nz, self.nl, self.nv = nz, nl, nv
        self.n = nz + nl

        # ---- K's upper-triangular entry set (natural [z; l] coords) ---
        entries = set()
        for j in range(self.n):
            entries.add((j, j))   # sigma*I / -sigma*I diagonals
        h_items = []  # (H data idx, i, j) for upper-triangle entries
        for p in range(H.nnz):
            i, j = int(H.row_ids[p]), int(H.indices[p])
            if i <= j:
                h_items.append((p, i, j))
                entries.add((i, j))
        a_items = []  # (p, q, row k, i, j): A'*diag(Gamma)*A contributions
        for k in range(nv):
            lo, hi = int(A.indptr[k]), int(A.indptr[k + 1])
            row = [(p, int(A.indices[p])) for p in range(lo, hi)]
            for p, ci in row:
                for q, cj in row:
                    if ci <= cj:
                        a_items.append((p, q, k, ci, cj))
                        entries.add((ci, cj))
        g_items = []  # (G data idx, i, nz + j): the G' off-diagonal block
        for p in range(G.nnz):
            j, i = int(G.row_ids[p]), int(G.indices[p])
            g_items.append((p, i, nz + j))
            entries.add((i, nz + j))

        # ---- fill-reducing permutation: new index a <-> old perm[a] ---
        self.perm, self.iperm = _fill_reducing_perm(
            self.n, entries, ordering)
        ip = self.iperm

        def _ppos(i, j):
            a, b = int(ip[i]), int(ip[j])
            return (a, b) if a <= b else (b, a)

        # ---- permuted CSC with sorted rows (diagonal last per column) -
        cols: list[list[int]] = [[] for _ in range(self.n)]
        for i, j in entries:
            a, b = _ppos(i, j)
            cols[b].append(a)
        Kp = np.zeros(self.n + 1, np.int64)
        Ki = np.empty(len(entries), np.int64)
        pos = {}
        q = 0
        for j in range(self.n):
            for i in sorted(cols[j]):
                pos[(i, j)] = q
                Ki[q] = i
                q += 1
            Kp[j + 1] = q
        self.Kp, self.Ki = Kp, Ki
        self.knnz = q

        # ---- static scatter maps for jit-side value assembly ----------
        self.h_src = np.asarray([p for p, _, _ in h_items], np.int64)
        self.h_dst = np.asarray([pos[_ppos(i, j)] for _, i, j in h_items],
                                np.int64)
        self.a_src1 = np.asarray([p for p, _, _, _, _ in a_items], np.int64)
        self.a_src2 = np.asarray([q_ for _, q_, _, _, _ in a_items],
                                 np.int64)
        self.a_row = np.asarray([k for _, _, k, _, _ in a_items], np.int64)
        self.a_dst = np.asarray(
            [pos[_ppos(i, j)] for _, _, _, i, j in a_items], np.int64)
        self.g_src = np.asarray([p for p, _, _ in g_items], np.int64)
        self.g_dst = np.asarray([pos[_ppos(i, j)] for _, i, j in g_items],
                                np.int64)
        self.zdiag = np.asarray([pos[_ppos(j, j)] for j in range(nz)],
                                np.int64)
        self.ldiag = np.asarray(
            [pos[_ppos(nz + j, nz + j)] for j in range(nl)], np.int64)

        # ---- sparse LDL' symbolic analysis (native when available) ----
        self._ldl = SparseLDL(self.n, Kp, Ki)
        self.lnnz = self._ldl.nnz
        self._lock = threading.Lock()
        self._thread_local = threading.local()
        self._pool = None
        # Fix the canonical L row indices once: the fill pattern of the
        # up-looking factorization depends only on (Kp, Ki), so a dummy
        # quasi-definite factorization writes the Li every later solve
        # shares read-only (worker threads factor into private Li
        # scratch, see _factor_into).
        dummy = np.zeros(self.knnz, np.float64)
        dummy[self.zdiag] = 1.0
        if self.ldiag.size:
            dummy[self.ldiag] = -1.0
        self._ldl.factor(dummy)
        self.ops = _make_ops(self)

    # ---- host side of the Newton step (runs under pure_callback) ------
    #
    # Batched callbacks shard instances over a small thread pool: the
    # native factor/solve are ctypes calls that release the GIL, so a
    # B-instance batch factors on all host cores in parallel. Each
    # worker owns thread-local numeric buffers (the symbolic arrays
    # parent/Lp/Li are shared read-only); the pure-NumPy fallback stays
    # serial under the pattern lock.

    def _factor_into(self, Kv_row, Lx_out, Dinv_out) -> bool:
        """Factor one instance into caller slices; False on failure."""
        if self._ldl._native:
            from fbstab_tpu.utils import native_ldl
            s = self._ldl
            tl = self._thread_local
            if not hasattr(tl, "ws"):
                tl.ws = native_ldl._Workspace(self.n)
                tl.D = np.empty(self.n, np.float64)
                # Per-thread Li scratch: numeric factorization rewrites
                # the (pattern-deterministic) row indices; the canonical
                # copy in self._ldl.Li was fixed at construction and is
                # shared read-only by the solves.
                tl.Li = np.empty(self.lnnz, np.int64)
            try:
                native_ldl.factor(self.n, s.Ap, s.Ai, Kv_row, s.parent,
                                  s.Lp, tl.Li, Lx_out, tl.D, Dinv_out,
                                  tl.ws)
                return bool(np.isfinite(tl.D).all())
            except ZeroDivisionError:
                return False
        with self._lock:
            try:
                self._ldl.factor(Kv_row)
                good = bool(np.isfinite(self._ldl.D).all())
            except ZeroDivisionError:
                return False
            if good:
                Lx_out[:] = self._ldl.Lx
                Dinv_out[:] = self._ldl.Dinv
            return good

    def _solve_into(self, Lx_row, Dinv_row, x_row) -> None:
        """In-place solve of one instance from explicit factors."""
        if self._ldl._native:
            from fbstab_tpu.utils import native_ldl
            s = self._ldl
            native_ldl.solve(self.n, s.Lp, s.Li, Lx_row, Dinv_row, x_row)
            return
        with self._lock:
            s = self._ldl
            s.Lx[:] = Lx_row
            s.Dinv[:] = Dinv_row
            s._factored = True
            s.solve(x_row)

    def _map_batch(self, B, work) -> None:
        """Run work(b) for b in range(B), threaded when the native
        backend (GIL-releasing) is in use and the batch warrants it."""
        if B >= 4 and self._ldl._native:
            from concurrent.futures import ThreadPoolExecutor
            if self._pool is None:
                with self._lock:
                    if self._pool is None:
                        self._pool = ThreadPoolExecutor(
                            max_workers=_host_workers())
            list(self._pool.map(work, range(B)))
        else:
            for b in range(B):
                work(b)

    def _host_factor(self, Kv):
        """(..., knnz) K values -> (Lx (..., lnnz), Dinv (..., n), ok)."""
        dt = Kv.dtype
        lead = Kv.shape[:-1]
        B = int(np.prod(lead, dtype=np.int64)) if lead else 1
        KvB = np.ascontiguousarray(
            np.asarray(Kv, np.float64).reshape(B, self.knnz))
        Lx = np.empty((B, self.lnnz), np.float64)
        Dinv = np.empty((B, self.n), np.float64)
        ok = np.empty(B, bool)

        def work(b):
            good = self._factor_into(KvB[b], Lx[b], Dinv[b])
            if not good:
                Lx[b] = np.nan
                Dinv[b] = np.nan
            ok[b] = good

        self._map_batch(B, work)
        return (Lx.reshape(lead + (self.lnnz,)).astype(dt),
                Dinv.reshape(lead + (self.n,)).astype(dt),
                ok.reshape(lead))

    def _host_solve(self, Lx, Dinv, rhs):
        """(..., lnnz), (..., n), (..., n) -> solution (..., n)."""
        dt = rhs.dtype
        lead = rhs.shape[:-1]
        B = int(np.prod(lead, dtype=np.int64)) if lead else 1
        LxB = np.ascontiguousarray(
            np.asarray(Lx, np.float64).reshape(B, self.lnnz))
        DinvB = np.ascontiguousarray(
            np.asarray(Dinv, np.float64).reshape(B, self.n))
        xB = np.asarray(rhs, np.float64).reshape(B, self.n).copy()
        self._map_batch(B, lambda b: self._solve_into(
            LxB[b], DinvB[b], xB[b]))
        return xB.reshape(rhs.shape).astype(dt)

    def _host_factor_solve(self, Kv, rhs):
        """Fused factor+solve: one host round-trip per Newton step."""
        dt = rhs.dtype
        lead = rhs.shape[:-1]
        B = int(np.prod(lead, dtype=np.int64)) if lead else 1
        KvB = np.ascontiguousarray(
            np.asarray(Kv, np.float64).reshape(B, self.knnz))
        xB = np.asarray(rhs, np.float64).reshape(B, self.n).copy()
        ok = np.empty(B, bool)
        Lx = np.empty((B, self.lnnz), np.float64)
        Dinv = np.empty((B, self.n), np.float64)

        def work(b):
            good = self._factor_into(KvB[b], Lx[b], Dinv[b])
            if good:
                self._solve_into(Lx[b], Dinv[b], xB[b])
            else:
                xB[b] = np.nan
            ok[b] = good

        self._map_batch(B, work)
        return xB.reshape(rhs.shape).astype(dt), ok.reshape(lead)


class SparseQPData(NamedTuple):
    """Numeric values for a fixed SparsePattern:
    min 1/2 z'Hz + f'z  s.t.  Gz = h, Az <= b. Hx/Gx/Ax are the CSR value
    arrays of the pattern's H/G/A (H stored full symmetric)."""

    Hx: jnp.ndarray  # (nnz(H),)
    f: jnp.ndarray   # (nz,)
    Gx: jnp.ndarray  # (nnz(G),)
    h: jnp.ndarray   # (nl,)
    Ax: jnp.ndarray  # (nnz(A),)
    b: jnp.ndarray   # (nv,)


def sparse_qp_data(H, f, G=None, h=None, A=None, b=None,
                   dtype=jnp.float64, ordering: str = "rcm"):
    """Builds (SparsePattern, SparseQPData) from dense arrays, keeping
    only structural nonzeros. The pattern is reusable: pack new values
    for the same structure with `pattern_values`."""
    H = np.asarray(H, np.float64)
    nz = H.shape[0]
    if not np.allclose(H, H.T):
        raise ValueError("H must be symmetric.")
    if A is None or b is None:
        raise ValueError(
            "A and b are required (nv >= 1), as in FBstabDense.")
    if G is None:
        G = np.zeros((0, nz))
        h = np.zeros((0,))
    G = np.asarray(G, np.float64)
    A = np.asarray(A, np.float64)
    pat = SparsePattern(_csr_from_dense_mask(H), _csr_from_dense_mask(G),
                        _csr_from_dense_mask(A), ordering=ordering)
    return pat, pattern_values(pat, H, f, G, h, A, b, dtype=dtype)


def pattern_values(pat: SparsePattern, H, f, G, h, A, b,
                   dtype=jnp.float64) -> SparseQPData:
    """Packs dense arrays into the value pytree for an existing pattern
    (entries outside the pattern must be zero)."""
    H, G, A = (np.asarray(M, np.float64) for M in (H, G, A))

    def _pack(pat_m: _CSRPattern, M):
        return jnp.asarray(M[pat_m.row_ids, pat_m.indices], dtype)

    return SparseQPData(
        Hx=_pack(pat.H, H), f=jnp.asarray(f, dtype),
        Gx=_pack(pat.G, G), h=jnp.asarray(h, dtype),
        Ax=_pack(pat.A, A), b=jnp.asarray(b, dtype))


# ----------------------------------------------------------------------
# ProblemOps over a static pattern.
# ----------------------------------------------------------------------

# ----------------------------------------------------------------------
# MPC -> sparse bridge: the block-banded MPC QP built directly as CSR
# patterns/values, with no dense (nz x nz) materialization. The pattern
# depends only on the stage dims (structural zeros inside stage blocks
# are kept), so one pattern serves every instance of a given shape; the
# value packer is jittable.
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def mpc_sparse_pattern(N: int, nx: int, nu: int, nc: int,
                       ordering: str = "rcm") -> "SparsePattern":
    """SparsePattern of the MPC QP with horizon N and stage dims
    (nx, nu, nc): H block-diagonal with (nx+nu) stage blocks, A
    block-diagonal with (nc, nx+nu) stage blocks, G the dynamics
    bidiagonal [A_{i-1} B_{i-1} | -I] (reference layout:
    mpc_data.cc:107-151 / tests/test_mpc_solve.py::materialize)."""
    ns = nx + nu
    nz, nl, nv = (N + 1) * ns, (N + 1) * nx, (N + 1) * nc

    # H: dense (ns, ns) block per stage, row-major within the block.
    h_indptr = np.arange(nz + 1, dtype=np.int64) * ns
    h_indices = np.concatenate([
        np.tile(np.arange(i * ns, (i + 1) * ns, dtype=np.int64), ns)
        for i in range(N + 1)]) if nz else np.zeros(0, np.int64)

    # A: dense (nc, ns) block per stage.
    a_indptr = np.arange(nv + 1, dtype=np.int64) * ns
    a_indices = np.concatenate([
        np.tile(np.arange(i * ns, (i + 1) * ns, dtype=np.int64), nc)
        for i in range(N + 1)]) if nv else np.zeros(0, np.int64)

    # G: block row 0 is -I on x_0; block row i >= 1 is
    # [A_{i-1} B_{i-1}] on stage i-1 plus -I on x_i (diagonal entry per
    # row, stored last so each row is sorted).
    g_indptr = [0]
    g_indices = []
    for r in range(nx):                      # block 0
        g_indices.append(r)
        g_indptr.append(len(g_indices))
    for i in range(1, N + 1):
        prev = (i - 1) * ns
        for r in range(nx):
            g_indices.extend(range(prev, prev + ns))
            g_indices.append(i * ns + r)
            g_indptr.append(len(g_indices))
    return SparsePattern(
        _csr_pattern(h_indptr, h_indices, nz, nz),
        _csr_pattern(np.asarray(g_indptr, np.int64),
                     np.asarray(g_indices, np.int64), nl, nz),
        _csr_pattern(a_indptr, a_indices, nv, nz),
        ordering=ordering)


def mpc_sparse_values(data) -> SparseQPData:
    """Packs MpcQPData stage arrays into the value pytree for
    `mpc_sparse_pattern` of the same dims (jittable; entry order matches
    the pattern construction)."""
    Q, R, S = data.Q, data.R, data.S
    Np1, nx = Q.shape[0], Q.shape[1]
    nu = R.shape[1]
    # H stage blocks [[Q, S'], [S, R]], row-major.
    top = jnp.concatenate([Q, jnp.swapaxes(S, 1, 2)], axis=2)
    bot = jnp.concatenate([S, R], axis=2)
    Hx = jnp.concatenate([top, bot], axis=1).reshape(-1)
    # A stage blocks [E, L].
    Ax = jnp.concatenate([data.E, data.L], axis=2).reshape(-1)
    # G: -I block, then per-stage [A B | -1-diagonal].
    dtype = Q.dtype
    neg1 = jnp.full((Np1 - 1, nx, 1), -1.0, dtype)
    body = jnp.concatenate([data.A, data.B, neg1], axis=2).reshape(-1)
    Gx = jnp.concatenate([jnp.full((nx,), -1.0, dtype), body])
    f = jnp.concatenate([data.q, data.r], axis=1).reshape(-1)
    h = -jnp.concatenate([data.x0, data.c.reshape(-1)])
    b = -data.d.reshape(-1)
    return SparseQPData(Hx=Hx, f=f, Gx=Gx, h=h, Ax=Ax, b=b)


class SparseFactorization(NamedTuple):
    Lx: jnp.ndarray     # (nnz(L),)
    Dinv: jnp.ndarray   # (nz + nl,)
    ok: jnp.ndarray     # bool scalar
    gamma: jnp.ndarray  # (nv,)
    mus: jnp.ndarray    # (nv,)


def _make_ops(pat: SparsePattern) -> ProblemOps:
    """The ProblemOps bundle for one pattern. Gemvs are segment-sums;
    the Newton step assembles K's values with precomputed scatter maps
    and round-trips factor+solve through the native LDL' in ONE
    pure_callback per Newton iteration."""

    def gemvH(d, x):
        return _gemv(pat.H, d.Hx, x)

    def gemvA(d, x):
        return _gemv(pat.A, d.Ax, x)

    def gemvG(d, x):
        return _gemv(pat.G, d.Gx, x)

    def gemvAT(d, v):
        return _gemv_t(pat.A, d.Ax, v)

    def gemvGT(d, l):
        return _gemv_t(pat.G, d.Gx, l)

    def forcing_norm(d):
        return jnp.sqrt(jnp.sum(d.f**2) + jnp.sum(d.h**2) + jnp.sum(d.b**2))

    def _assemble(d: SparseQPData, Gamma, sigma):
        """Upper-triangular values of K = [H + sigma*I + A'*diag(Gamma)*A,
        G'; G, -sigma*I] — a handful of fused scatter-adds."""
        dtype = d.Hx.dtype
        Kv = jnp.zeros((pat.knnz,), dtype)
        if pat.h_src.size:
            Kv = Kv.at[pat.h_dst].add(d.Hx[pat.h_src])
        if pat.a_dst.size:
            contrib = Gamma[pat.a_row] * d.Ax[pat.a_src1] * d.Ax[pat.a_src2]
            Kv = Kv.at[pat.a_dst].add(contrib)
        if pat.g_dst.size:
            Kv = Kv.at[pat.g_dst].add(d.Gx[pat.g_src])
        Kv = Kv.at[pat.zdiag].add(sigma)
        if pat.ldiag.size:
            Kv = Kv.at[pat.ldiag].add(-sigma)
        return Kv

    def factor(d, x, xbar, sigma, alpha) -> SparseFactorization:
        gamma, mus, Gamma = pfb_weights(x.y, x.v, xbar.v, sigma, alpha)
        Kv = _assemble(d, Gamma, sigma)
        dtype = Kv.dtype
        out_shapes = (
            jax.ShapeDtypeStruct((pat.lnnz,), dtype),
            jax.ShapeDtypeStruct((pat.n,), dtype),
            jax.ShapeDtypeStruct((), jnp.bool_),
        )
        Lx, Dinv, ok = jax.pure_callback(
            pat._host_factor, out_shapes, Kv, vmap_method="expand_dims")
        return SparseFactorization(Lx=Lx, Dinv=Dinv, ok=ok,
                                   gamma=gamma, mus=mus)

    def factor_ok(fact: SparseFactorization):
        return fact.ok

    def _recover(d, dzl, rv, gamma, mus):
        dz = dzl[:pat.nz]
        dl = dzl[pat.nz:]
        Adz = _gemv(pat.A, d.Ax, dz)
        dv = (rv + gamma * Adz) / mus
        dy = d.b - Adz
        return Variable(z=dz, l=dl, v=dv, y=dy)

    def newton_solve(d, fact: SparseFactorization, rz, rl, rv) -> Variable:
        r1 = rz - gemvAT(d, rv / fact.mus)
        # Permute into the fill-reducing ordering the factorization uses
        # (static gathers): K' y = (P r), x = y at iperm.
        rhs = jnp.concatenate([r1, -rl])[pat.perm]
        sol = jax.pure_callback(
            pat._host_solve, jax.ShapeDtypeStruct((pat.n,), rhs.dtype),
            fact.Lx, fact.Dinv, rhs, vmap_method="expand_dims")
        return _recover(d, sol[pat.iperm], rv, fact.gamma, fact.mus)

    def newton_step(d, x, xbar, sigma, alpha, rz, rl, rv):
        """Fused factor + solve: one host round-trip per Newton step
        (the optional ProblemOps.newton_step contract)."""
        gamma, mus, Gamma = pfb_weights(x.y, x.v, xbar.v, sigma, alpha)
        Kv = _assemble(d, Gamma, sigma)
        r1 = rz - gemvAT(d, rv / mus)
        rhs = jnp.concatenate([r1, -rl])[pat.perm]
        out_shapes = (
            jax.ShapeDtypeStruct((pat.n,), rhs.dtype),
            jax.ShapeDtypeStruct((), jnp.bool_),
        )
        sol, ok = jax.pure_callback(
            pat._host_factor_solve, out_shapes, Kv, rhs,
            vmap_method="expand_dims")
        return _recover(d, sol[pat.iperm], rv, gamma, mus), ok

    return ProblemOps(
        gemvH=gemvH, gemvA=gemvA, gemvG=gemvG, gemvAT=gemvAT,
        gemvGT=gemvGT,
        f_vec=lambda d: d.f, h_vec=lambda d: d.h, b_vec=lambda d: d.b,
        forcing_norm=forcing_norm,
        factor=factor, factor_ok=factor_ok, newton_solve=newton_solve,
        newton_step=newton_step,
    )


# ----------------------------------------------------------------------
# Functional entry points + facade.
# ----------------------------------------------------------------------

def solve_sparse_qp(pattern: SparsePattern, data: SparseQPData,
                    z0, l0, v0, options: Options = Options()):
    """Single-instance sparse solve. Returns (Variable, CoreOut)."""
    return fbstab_solve(pattern.ops, data, z0, l0, v0, options)


def solve_sparse_qp_batch(pattern: SparsePattern, data: SparseQPData,
                          z0, l0, v0, options: Options = Options()):
    """Batched sparse solve (shared pattern, batched values): vmapped
    masked-lockstep solves; the host callback receives the whole batch of
    KKT systems per Newton step and factors them in one native sweep."""
    return jax.vmap(
        lambda d, z, l, v: fbstab_solve(pattern.ops, d, z, l, v, options)
    )(data, z0, l0, v0)


class FBstabSparse:
    """Allocate-once/solve-many facade for sparse QPs — the API the
    reference's roadmap sketches for FBstabSparse (README.md:47), shaped
    like FBstabDense/FBstabMpc: construct per problem structure, solve
    many value instances, warmstart by passing the previous solution."""

    def __init__(self, pattern: SparsePattern,
                 options: Optional[Options] = None):
        self.pattern = pattern
        self._options = options if options is not None else Options()
        self._compiled = None

    def update_options(self, options: Options) -> None:
        self._options = options.validated()
        self._compiled = None

    @staticmethod
    def default_options() -> Options:
        return Options.default()

    @staticmethod
    def reliable_options() -> Options:
        return Options.reliable()

    def _get_compiled(self):
        if self._compiled is None:
            opts = self._options
            pat = self.pattern
            self._compiled = jax.jit(
                lambda d, z, l, v: fbstab_solve(pat.ops, d, z, l, v, opts))
        return self._compiled

    def solve(self, data: SparseQPData, x0: Optional[Variable] = None
              ) -> "tuple[Variable, SolverOut]":
        import time

        pat = self.pattern
        nz, nl, nv = pat.nz, pat.nl, pat.nv
        for name, arr, nn in (("Hx", data.Hx, pat.H.nnz), ("f", data.f, nz),
                              ("Gx", data.Gx, pat.G.nnz), ("h", data.h, nl),
                              ("Ax", data.Ax, pat.A.nnz), ("b", data.b, nv)):
            if tuple(arr.shape) != (nn,):
                raise ValueError(
                    f"FBstabSparse.solve: {name} has shape "
                    f"{tuple(arr.shape)}, expected {(nn,)}.")
        dtype = data.f.dtype
        if x0 is None:
            z0 = jnp.zeros((nz,), dtype)
            l0 = jnp.zeros((nl,), dtype)
            v0 = jnp.zeros((nv,), dtype)
        else:
            z0, l0, v0 = x0.z, x0.l, x0.v
        t0 = time.perf_counter()
        x, core = self._get_compiled()(data, z0, l0, v0)
        # Materialize a small output for reliable timing (CLAUDE.md:
        # block_until_ready is unreliable through the axon TPU tunnel).
        np.asarray(core.residual)
        elapsed = time.perf_counter() - t0
        out = SolverOut(
            eflag=core.eflag, residual=core.residual,
            newton_iters=core.newton_iters, prox_iters=core.prox_iters,
            solve_time=jnp.asarray(elapsed),
            initial_residual=core.initial_residual,
            raw_residual=core.raw_residual,
            refine_steps=core.refine_steps)
        self._maybe_print_final(out, data, x)
        return x, out

    def _maybe_print_final(self, out: SolverOut, data: SparseQPData,
                           x: Variable) -> None:
        from fbstab_tpu.core.residuals import (
            penalized_natural_residual, residual_block_norms)
        from fbstab_tpu.options import Display
        from fbstab_tpu.utils.printing import print_final
        if self._options.display_level < Display.FINAL:
            return
        ops = self.pattern.ops
        bn = residual_block_norms(penalized_natural_residual(
            ops, data, x, self._options.alpha))
        combo = float(self._options.abs_tol + self._options.rel_tol
                      * (1.0 + ops.forcing_norm(data)))
        print_final(out, self._options, block_norms=bn, combo_tol=combo)
