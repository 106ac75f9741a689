"""ctypes bindings for the native host runtime (csrc/hostlin.cpp).

Builds the shared library with g++ on first use (cached next to the
source); every entry point has a pure-numpy fallback so the framework
degrades gracefully where no compiler exists.

This is the framework's C++ runtime layer (SURVEY.md section 2.2): the
TPU compute path stays in XLA/Pallas, while host-side sparse
materialization, format conversion, and the SuperLU-grade block-tridiagonal
oracle run native.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "hostlin.cpp")
_SO = os.path.join(_REPO, "csrc", "libhostlin.so")

_lock = threading.Lock()
_lib = None
_tried = False

_c128 = np.ctypeslib.ndpointer(np.complex128, flags="C_CONTIGUOUS")
_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=300)
        return _SO
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None (fallback mode)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.stencil_to_csr.restype = ctypes.c_int64
        lib.stencil_to_csr.argtypes = [_c128] * 5 + [ctypes.c_int64] * 2 \
            + [_i32, _i32, _c128]
        lib.coo_to_csr.restype = None
        lib.coo_to_csr.argtypes = [_i32, _i32, _c128, ctypes.c_int64,
                                   ctypes.c_int64, _i32, _i32, _c128]
        lib.csr_spmv.restype = None
        lib.csr_spmv.argtypes = [_i32, _i32, _c128, _c128,
                                 ctypes.c_int64, _c128]
        lib.block_thomas_factor.restype = ctypes.c_int
        lib.block_thomas_factor.argtypes = [_c128] * 5 \
            + [ctypes.c_int64] * 2 + [_c128, _i32]
        lib.block_thomas_solve.restype = None
        lib.block_thomas_solve.argtypes = [_c128, _c128, _c128, _i32,
                                           ctypes.c_int64, ctypes.c_int64,
                                           _c128]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def stencil_to_csr(cc, cw, ce, cs, cn):
    """(L, n) complex fields -> (indptr, indices, data) CSR arrays."""
    cc, cw, ce, cs, cn = (np.ascontiguousarray(x, np.complex128)
                          for x in (cc, cw, ce, cs, cn))
    L, n = cc.shape
    lib = get_lib()
    if lib is None:  # numpy fallback via scipy-free diagonal construction
        from .sparse import Stencil5
        import jax.numpy as jnp
        A = Stencil5(*(jnp.asarray(x) for x in (cc, cw, ce, cs, cn)))
        sp = A.toscipy()
        return (np.asarray(sp.indptr, np.int32),
                np.asarray(sp.indices, np.int32), sp.data)
    indptr = np.empty(L * n + 1, np.int32)
    indices = np.empty(5 * L * n, np.int32)
    data = np.empty(5 * L * n, np.complex128)
    nnz = lib.stencil_to_csr(cc.reshape(-1), cw.reshape(-1), ce.reshape(-1),
                             cs.reshape(-1), cn.reshape(-1), L, n,
                             indptr, indices, data)
    return indptr, indices[:nnz].copy(), data[:nnz].copy()


def coo_to_csr(row, col, val, nrows):
    row = np.ascontiguousarray(row, np.int32)
    col = np.ascontiguousarray(col, np.int32)
    val = np.ascontiguousarray(val, np.complex128)
    lib = get_lib()
    if lib is None:
        order = np.argsort(row, kind="stable")
        indptr = np.zeros(nrows + 1, np.int32)
        np.add.at(indptr, row + 1, 1)
        return (np.cumsum(indptr, dtype=np.int32), col[order].copy(),
                val[order].copy())
    nnz = row.shape[0]
    indptr = np.empty(nrows + 1, np.int32)
    indices = np.empty(nnz, np.int32)
    data = np.empty(nnz, np.complex128)
    lib.coo_to_csr(row, col, val, nnz, nrows, indptr, indices, data)
    return indptr, indices, data


def csr_spmv(indptr, indices, data, x):
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.complex128)
    x = np.ascontiguousarray(x, np.complex128)
    lib = get_lib()
    nrows = indptr.shape[0] - 1
    if lib is None:
        y = np.zeros(nrows, np.complex128)
        rows = np.repeat(np.arange(nrows), np.diff(indptr))
        np.add.at(y, rows, data * x[indices])
        return y
    y = np.empty(nrows, np.complex128)
    lib.csr_spmv(indptr, indices, data, x, nrows, y)
    return y


class BlockThomasFactorization:
    """Host-native block-tridiagonal factorization (the SuperLU-grade
    oracle): factor once, solve many RHS."""

    def __init__(self, cw, cc, ce, cs, cn):
        self.fields = tuple(np.ascontiguousarray(x, np.complex128)
                            for x in (cw, cc, ce, cs, cn))
        L, n = self.fields[1].shape
        self.L, self.n = L, n
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native hostlin library unavailable")
        self._work = np.empty(L * n * n, np.complex128)
        self._piv = np.empty(L * n, np.int32)
        rc = lib.block_thomas_factor(
            *(f.reshape(-1) for f in self.fields), L, n,
            self._work, self._piv)
        if rc != 0:
            raise np.linalg.LinAlgError("singular diagonal block")

    def solve(self, rhs):
        rhs = np.ascontiguousarray(rhs, np.complex128).reshape(self.L, self.n)
        out = rhs.copy()
        get_lib().block_thomas_solve(
            self.fields[3].reshape(-1), self.fields[4].reshape(-1),
            self._work, self._piv, self.L, self.n, out.reshape(-1))
        return out
