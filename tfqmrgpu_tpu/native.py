"""Loader for the native C++ components (native/).

Two shared libraries:

* ``libtfqmrgpu_plan.so`` -- the pure-C++ analysis step (pairs/starts,
  subset, column compression; reference semantics of tfqmrgpu.cu:136-351 with
  binary-search membership).  Used by ``plan.create_plan`` as a faster
  backend for very large patterns; always cross-checked by tests against the
  vectorized NumPy implementation.
* ``libtfqmrgpu_tpu.so`` -- the reference-parity C API (tfqmrgpu_tpu.h) that
  embeds CPython; consumed by C/Fortran users and exercised here through
  ctypes for tests.

``build()`` compiles both with the in-tree Makefile on first use.
Set TFQ_NATIVE=0 to disable the native plan backend.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_DIR = os.path.join(_NATIVE_DIR, "lib")

_plan_lib = None
_plan_tried = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
_u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")


def build(verbose: bool = False) -> bool:
    """Compile the native libraries; returns True on success."""
    try:
        r = subprocess.run(["make", "-C", _NATIVE_DIR],
                           capture_output=not verbose, text=True, timeout=300)
        return r.returncode == 0
    except Exception:
        return False


def _needs_build(path: str) -> bool:
    """True when the library is missing or older than any native source
    (stale binaries must never be silently loaded -- the libraries are not
    committed, they are built on first use)."""
    if not os.path.exists(path):
        return True
    lib_mtime = os.path.getmtime(path)
    for sub in ("src", "include", "Makefile"):
        p = os.path.join(_NATIVE_DIR, sub)
        if os.path.isfile(p):
            if os.path.getmtime(p) > lib_mtime:
                return True
        elif os.path.isdir(p):
            for name in os.listdir(p):
                if os.path.getmtime(os.path.join(p, name)) > lib_mtime:
                    return True
    return False


def _load_plan_lib() -> Optional[ctypes.CDLL]:
    global _plan_lib, _plan_tried
    if _plan_tried:
        return _plan_lib
    _plan_tried = True
    if os.environ.get("TFQ_NATIVE", "1") == "0":
        return None
    path = os.path.join(_LIB_DIR, "libtfqmrgpu_plan.so")
    if _needs_build(path):
        if not build() or not os.path.exists(path):
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.tfq_plan_pairs_count.restype = ctypes.c_longlong
    lib.tfq_plan_pairs_count.argtypes = [
        ctypes.c_int, ctypes.c_int, _i32p, _i32p, _i32p, _i32p, _u32p]
    lib.tfq_plan_pairs_fill.restype = ctypes.c_longlong
    lib.tfq_plan_pairs_fill.argtypes = [
        ctypes.c_int, ctypes.c_int, _i32p, _i32p, _i32p, _i32p, _u32p]
    lib.tfq_plan_subset.restype = ctypes.c_longlong
    lib.tfq_plan_subset.argtypes = [
        ctypes.c_int, ctypes.c_int, _i32p, _i32p, _i32p, _i32p, _u32p]
    lib.tfq_plan_compress_columns.restype = ctypes.c_longlong
    lib.tfq_plan_compress_columns.argtypes = [
        ctypes.c_longlong, _i32p, ctypes.c_longlong, _u32p, _u16p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
    _plan_lib = lib
    return lib


def plan_backend_available() -> bool:
    return _load_plan_lib() is not None


def native_plan_tables(mb: int, index_offset: int,
                       rowptr_a, colind_a, rowptr_x, colind_x,
                       rowptr_b, colind_b):
    """Run the native analysis; returns
    (starts u32[nnzbX+1], pairs u32[nPairs,2], subset u32[nnzbB],
     colindx u16[nnzbX], original_cols i32[ncols]) or raises TfqmrgpuError
    with the same packed status codes as the NumPy path."""
    from .errors import TfqmrgpuError

    lib = _load_plan_lib()
    if lib is None:
        raise RuntimeError("native plan backend unavailable")

    def as_i32(x):
        return np.ascontiguousarray(np.asarray(x, dtype=np.int32))

    rowptr_a, colind_a = as_i32(rowptr_a), as_i32(colind_a)
    rowptr_x, colind_x = as_i32(rowptr_x), as_i32(colind_x)
    rowptr_b, colind_b = as_i32(rowptr_b), as_i32(colind_b)
    nnzb_x = int(rowptr_x[mb] - index_offset)
    nnzb_b = int(rowptr_b[mb] - index_offset)

    starts = np.zeros(nnzb_x + 1, dtype=np.uint32)
    n = lib.tfq_plan_pairs_count(mb, index_offset, rowptr_a, colind_a,
                                 rowptr_x, colind_x, starts)
    if n < 0:
        raise TfqmrgpuError(int(-n), "native pairs_count")
    pairs = np.zeros((int(n), 2), dtype=np.uint32)
    n2 = lib.tfq_plan_pairs_fill(mb, index_offset, rowptr_a, colind_a,
                                 rowptr_x, colind_x,
                                 pairs.reshape(-1))
    if n2 != n:
        raise TfqmrgpuError(14, f"native pairs_fill count mismatch {n2}!={n}")

    subset = np.zeros(max(nnzb_b, 1), dtype=np.uint32)
    st = lib.tfq_plan_subset(mb, index_offset, rowptr_x, colind_x,
                             rowptr_b, colind_b, subset)
    if st < 0:
        raise TfqmrgpuError(int(-st), "native subset")
    subset = subset[:nnzb_b]

    colindx = np.zeros(nnzb_x, dtype=np.uint16)
    original = np.zeros(65536, dtype=np.int32)
    nc = lib.tfq_plan_compress_columns(
        nnzb_x, colind_x, nnzb_b, subset, colindx, original)
    if nc < 0:
        raise TfqmrgpuError(int(-nc), "native compress_columns")
    return starts, pairs, subset, colindx, original[: int(nc)].copy()


# --------------------------------------------------------------- C API lib

_capi_lib = None
_capi_tried = False


def load_capi() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the embedded-CPython C API library.  For
    in-process ctypes use the embedded interpreter is the CURRENT one, so the
    bridge module must be importable (it is, in-tree)."""
    global _capi_lib, _capi_tried
    if _capi_tried:
        return _capi_lib
    _capi_tried = True
    path = os.path.join(_LIB_DIR, "libtfqmrgpu_tpu.so")
    if _needs_build(path):
        if not build() or not os.path.exists(path):
            return None
    try:
        _capi_lib = ctypes.CDLL(path, mode=ctypes.RTLD_GLOBAL)
    except OSError:
        return None
    return _capi_lib
