"""ctypes binding for the native sparse-LDL' kernel.

Builds ``fbstab_tpu/native/sparse_ldl.c`` with the system C compiler into
a shared object next to the source (first use only; cached afterwards)
and exposes the three entry points with NumPy-friendly signatures. The
reference ships its sparse LDL' as a C library behind a thin C++ wrapper
(tools/qdldl/qdldl_wrapper.h:19, BUILD.bazel:14-27); this is the same
split here — C hot loops, Python orchestration — with
utils/sparse_ldl.py's pure-NumPy implementation as the always-available
fallback when no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "sparse_ldl.c")
_SO = os.path.join(_NATIVE_DIR, "_sparse_ldl.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_I64 = ctypes.POINTER(ctypes.c_int64)
_F64 = ctypes.POINTER(ctypes.c_double)


def _compile() -> Optional[str]:
    """Build the shared object if missing/stale; return its path or None."""
    if os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    for cc in ("cc", "gcc", "clang"):
        tmp = None
        try:
            # Build to a temp name then rename: atomic under concurrent
            # first-use from several test processes.
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_NATIVE_DIR)
            os.close(fd)
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, _SO)
            return _SO
        except (OSError, subprocess.SubprocessError):
            if tmp is not None:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
            continue
    return None


def load() -> Optional[ctypes.CDLL]:
    """The configured CDLL, building it on first call; None if no C
    compiler is available (callers fall back to the NumPy path)."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _compile()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.fbstab_ldl_etree.restype = ctypes.c_int64
        lib.fbstab_ldl_etree.argtypes = [
            ctypes.c_int64, _I64, _I64, _I64, _I64, _I64]
        lib.fbstab_ldl_factor.restype = ctypes.c_int64
        lib.fbstab_ldl_factor.argtypes = [
            ctypes.c_int64, _I64, _I64, _F64, _I64, _I64, _I64, _F64,
            _F64, _F64, _F64, _I64, _I64, _I64]
        lib.fbstab_ldl_solve.restype = None
        lib.fbstab_ldl_solve.argtypes = [
            ctypes.c_int64, _I64, _I64, _F64, _F64, _F64]
        lib.fbstab_ldl_factor_solve_batch.restype = ctypes.c_int64
        lib.fbstab_ldl_factor_solve_batch.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _I64, _I64, _F64, _I64, _I64,
            _I64, _F64, _F64, _F64, _F64, _I64, _I64, _I64, _F64,
            ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _ip(a: np.ndarray):
    return a.ctypes.data_as(_I64)


def _fp(a: np.ndarray):
    return a.ctypes.data_as(_F64)


def etree(n: int, Ap: np.ndarray, Ai: np.ndarray):
    """(parent, Lnz, nnz) for the upper-triangular CSC pattern, or raises
    ValueError on a malformed column (same contract as the NumPy path)."""
    lib = load()
    assert lib is not None
    parent = np.empty(n, np.int64)
    Lnz = np.empty(n, np.int64)
    work = np.empty(n, np.int64)
    nnz = lib.fbstab_ldl_etree(
        n, _ip(Ap), _ip(Ai), _ip(parent), _ip(Lnz), _ip(work))
    if nnz < 0:
        raise ValueError(
            "Each column must be upper-triangular with an explicit "
            f"diagonal entry (column {-nnz - 1}).")
    return parent, Lnz, int(nnz)


class _Workspace:
    """Factor/solve scratch, allocated once per pattern (allocation-free
    factor/solve calls, matching the reference wrapper)."""

    def __init__(self, n: int):
        self.Y = np.zeros(n, np.float64)
        self.pattern = np.empty(n, np.int64)
        self.flag = np.empty(n, np.int64)
        self.Lnz_cur = np.empty(n, np.int64)


def factor(n, Ap, Ai, Ax, parent, Lp, Li, Lx, D, Dinv, ws: _Workspace):
    """Numeric factorization into (Li, Lx, D, Dinv); raises
    ZeroDivisionError on a zero pivot (same contract as the NumPy path)."""
    lib = load()
    assert lib is not None
    st = lib.fbstab_ldl_factor(
        n, _ip(Ap), _ip(Ai), _fp(Ax), _ip(parent), _ip(Lp), _ip(Li),
        _fp(Lx), _fp(D), _fp(Dinv), _fp(ws.Y), _ip(ws.pattern),
        _ip(ws.flag), _ip(ws.Lnz_cur))
    if st != 0:
        raise ZeroDivisionError(
            f"Zero pivot at column {st - 1}: matrix is not "
            "quasi-definite with this ordering.")


def solve(n, Lp, Li, Lx, Dinv, x):
    lib = load()
    assert lib is not None
    lib.fbstab_ldl_solve(n, _ip(Lp), _ip(Li), _fp(Lx), _fp(Dinv), _fp(x))


def factor_solve_batch(n, Ap, Ai, AxB, parent, Lp, Li, Lx, D, Dinv,
                       ws: _Workspace, xB):
    """Factor+solve a batch sharing one pattern: AxB (batch, annz) values,
    xB (batch, n) rhs solved in place. Returns 0 or the 1-based column of
    the first zero pivot (that instance's rhs is left untouched)."""
    lib = load()
    assert lib is not None
    batch, annz = AxB.shape
    return int(lib.fbstab_ldl_factor_solve_batch(
        batch, n, _ip(Ap), _ip(Ai), _fp(AxB), _ip(parent), _ip(Lp),
        _ip(Li), _fp(Lx), _fp(D), _fp(Dinv), _fp(ws.Y), _ip(ws.pattern),
        _ip(ws.flag), _ip(ws.Lnz_cur), _fp(xB), annz))
