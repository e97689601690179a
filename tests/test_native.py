"""Tests for the native C++ components.

* the pure-C++ analysis step (libtfqmrgpu_plan.so) must produce bit-identical
  tables to the vectorized NumPy create_plan on random patterns, for C and
  Fortran index offsets, and return the same packed error codes;
* the embedded-CPython C API (libtfqmrgpu_tpu.so) must drive the full
  10-step workflow from C calling conventions (exercised via ctypes, which is
  exactly what a C or Fortran program does through the .so).
"""

import ctypes

import numpy as np
import pytest

from tfqmrgpu_tpu import create_plan, native
from tfqmrgpu_tpu.errors import Status, TfqmrgpuError

from conftest import dense_from_bsr, make_random_problem

pytestmark = pytest.mark.skipif(
    not native.plan_backend_available(),
    reason="native toolchain unavailable")


def test_native_plan_matches_numpy(rng):
    for trial in range(4):
        a, x, b = make_random_problem(rng, mb=20, lm=4, ln=4, ncols=5,
                                      x_fill=0.5, seed_shift=trial)
        plan = create_plan(a, x, b)
        starts, pairs, subset, colindx, orig = native.native_plan_tables(
            a.nrows, 0, a.rowptr, a.colind, x.rowptr, x.colind,
            b.rowptr, b.colind)
        np.testing.assert_array_equal(starts, plan.starts)
        np.testing.assert_array_equal(pairs, plan.pairs)
        np.testing.assert_array_equal(subset, plan.subset)
        np.testing.assert_array_equal(colindx, plan.colindx)
        np.testing.assert_array_equal(orig, plan.original_colind_x)


def test_native_plan_fortran_offset(rng):
    a, x, b = make_random_problem(rng, mb=12, lm=4, ln=4, ncols=3)
    plan = create_plan(a, x, b)
    starts, pairs, subset, colindx, orig = native.native_plan_tables(
        a.nrows, 1, a.rowptr + 1, a.colind + 1, x.rowptr + 1, x.colind + 1,
        b.rowptr + 1, b.colind + 1)
    np.testing.assert_array_equal(starts, plan.starts)
    np.testing.assert_array_equal(pairs, plan.pairs)
    np.testing.assert_array_equal(subset, plan.subset)
    # column compression works on RAW indices (reference: tfqmrgpu.cu:254) --
    # a constant shift leaves the compressed ids unchanged
    np.testing.assert_array_equal(colindx, plan.colindx)
    np.testing.assert_array_equal(orig, plan.original_colind_x + 1)


def test_native_b_not_subset_status(rng):
    a, x, b = make_random_problem(rng, mb=8, lm=4, ln=4, ncols=2)
    bad_rowptr_b = np.zeros(9, np.int32)
    bad_rowptr_b[1:] = 1
    bad_colind_b = np.array([x.ncols + 7], np.int32)
    with pytest.raises(TfqmrgpuError) as ei:
        native.native_plan_tables(a.nrows, 0, a.rowptr, a.colind,
                                  x.rowptr, x.colind,
                                  bad_rowptr_b, bad_colind_b)
    assert ei.value.code == int(Status.B_IS_NOT_SUBSET_OF_X)


def test_capi_shared_library_ten_steps(rng):
    """Drive the 10-step C workflow through libtfqmrgpu_tpu.so (C ABI)."""
    lib = native.load_capi()
    if lib is None:
        pytest.skip("C API library unavailable")

    lm, ln = 4, 8
    a, x, b = make_random_problem(rng, mb=10, lm=lm, ln=ln, ncols=3,
                                  x_fill=1.0)

    c_i64 = ctypes.c_int64
    handle = c_i64(0)
    assert lib.tfqmrgpuCreateHandle(ctypes.byref(handle)) == 0
    assert handle.value != 0

    def i32arr(v):
        return np.ascontiguousarray(np.asarray(v, np.int32))

    rpa, cia = i32arr(a.rowptr), i32arr(a.colind)
    rpx, cix = i32arr(x.rowptr), i32arr(x.colind)
    rpb, cib = i32arr(b.rowptr), i32arr(b.colind)
    plan = c_i64(0)
    st = lib.tfqmrgpu_bsrsv_createPlan(
        handle, ctypes.byref(plan), ctypes.c_int(a.nrows),
        rpa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(a.nnzb),
        cia.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rpx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(x.nnzb),
        cix.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rpb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(b.nnzb),
        cib.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(0), ctypes.c_int(0))
    assert st == 0, lib.tfqmrgpuGetErrorString(st)

    size = ctypes.c_size_t(0)
    st = lib.tfqmrgpu_bsrsv_bufferSize(
        handle, plan, lm, lm, ln, ln, ctypes.c_char(b"z"),
        ctypes.byref(size))
    assert st == 0 and size.value > 0

    buf = ctypes.c_void_p(0)
    assert lib.tfqmrgpuCreateWorkspace(ctypes.byref(buf), size,
                                       ctypes.c_char(b"d")) == 0
    assert lib.tfqmrgpu_bsrsv_setBuffer(handle, plan, buf) == 0

    amat = np.ascontiguousarray(
        np.stack([a.data.real, a.data.imag], -1).astype(np.float64))
    bmat = np.ascontiguousarray(
        np.stack([b.data.real, b.data.imag], -1).astype(np.float64))
    st = lib.tfqmrgpu_bsrsv_setMatrix(
        handle, plan, ctypes.c_char(b"A"),
        amat.ctypes.data_as(ctypes.c_void_p), ctypes.c_char(b"z"),
        lm, lm, ctypes.c_char(b"n"), ctypes.c_int(0x55))
    assert st == 0
    st = lib.tfqmrgpu_bsrsv_setMatrix(
        handle, plan, ctypes.c_char(b"B"),
        bmat.ctypes.data_as(ctypes.c_void_p), ctypes.c_char(b"z"),
        lm, ln, ctypes.c_char(b"n"), ctypes.c_int(0x55))
    assert st == 0

    st = lib.tfqmrgpu_bsrsv_solve(handle, plan, ctypes.c_double(1e-9),
                                  ctypes.c_int(300))
    assert st == 0, lib.tfqmrgpuGetErrorString(st)

    resid = ctypes.c_double(0)
    iters = ctypes.c_int32(0)
    fl = ctypes.c_double(0)
    fla = ctypes.c_double(0)
    assert lib.tfqmrgpu_bsrsv_getInfo(
        handle, plan, ctypes.byref(resid), ctypes.byref(iters),
        ctypes.byref(fl), ctypes.byref(fla)) == 0
    assert resid.value <= 1e-9 and iters.value > 0

    xmat = np.zeros((x.nnzb, lm, ln, 2), np.float64)
    st = lib.tfqmrgpu_bsrsv_getMatrix(
        handle, plan, ctypes.c_char(b"X"),
        xmat.ctypes.data_as(ctypes.c_void_p), ctypes.c_char(b"z"),
        lm, ln, ctypes.c_char(b"n"), ctypes.c_int(0x55))
    assert st == 0

    xc = xmat[..., 0] + 1j * xmat[..., 1]
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(x.with_data(xc), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    assert np.max(np.abs(ad @ xd - bd)) < 1e-6

    assert lib.tfqmrgpu_bsrsv_destroyPlan(handle, plan) == 0
    assert lib.tfqmrgpuDestroyHandle(handle) == 0

    # error decoding is pure C (works without Python)
    lib.tfqmrgpuGetErrorString.restype = ctypes.c_char_p
    msg = lib.tfqmrgpuGetErrorString(13)
    assert b"subset" in msg


def test_capi_allowed_block_sizes():
    lib = native.load_capi()
    if lib is None:
        pytest.skip("C API library unavailable")
    number = ctypes.c_int32(0)
    sizes = np.zeros(64, np.int32)
    st = lib.tfqmrgpu_bsrsv_allowedBlockSizes(
        ctypes.byref(number), sizes.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)), 64)
    assert st == 0 and number.value == 15
    assert (sizes[0], sizes[1]) == (4, 4)
    assert lib.tfqmrgpu_bsrsv_blockSizeMissing(32, 32) == 0
    assert lib.tfqmrgpu_bsrsv_blockSizeMissing(3, 7) != 0


def test_capi_one_call_bsrsv_m(rng):
    """The mixed-precision one-caller through the C ABI (the mode the
    reference declares but disables, tfqmrgpu.cu:42)."""
    lib = native.load_capi()
    if lib is None:
        pytest.skip("C API library unavailable")

    lm, ln = 4, 8
    a, x, b = make_random_problem(rng, mb=8, lm=lm, ln=ln, ncols=2,
                                  x_fill=1.0)

    def i32arr(v):
        return np.ascontiguousarray(np.asarray(v, np.int32))

    def riri(c):
        return np.ascontiguousarray(
            np.stack([c.real, c.imag], -1).astype(np.float64))

    rpa, cia = i32arr(a.rowptr), i32arr(a.colind)
    rpx, cix = i32arr(x.rowptr), i32arr(x.colind)
    rpb, cib = i32arr(b.rowptr), i32arr(b.colind)
    amat, bmat = riri(a.data), riri(b.data)
    xmat = np.zeros((x.nnzb, lm, ln, 2), np.float64)
    iters = ctypes.c_int32(400)           # in: cap, out: achieved
    resid = ctypes.c_float(1e-10)         # in: threshold, out: achieved
    i32p = ctypes.POINTER(ctypes.c_int32)
    st = lib.tfqmrgpu_bsrsv_m(
        ctypes.c_int(a.nrows), lm, ln,
        rpa.ctypes.data_as(i32p), ctypes.c_int(a.nnzb),
        cia.ctypes.data_as(i32p),
        amat.ctypes.data_as(ctypes.c_void_p), ctypes.c_char(b"n"),
        rpx.ctypes.data_as(i32p), ctypes.c_int(x.nnzb),
        cix.ctypes.data_as(i32p),
        xmat.ctypes.data_as(ctypes.c_void_p), ctypes.c_char(b"n"),
        rpb.ctypes.data_as(i32p), ctypes.c_int(b.nnzb),
        cib.ctypes.data_as(i32p),
        bmat.ctypes.data_as(ctypes.c_void_p), ctypes.c_char(b"n"),
        ctypes.byref(iters), ctypes.byref(resid),
        ctypes.c_int(0), ctypes.c_int(0))
    assert st == 0
    assert iters.value > 0
    xc = xmat[..., 0] + 1j * xmat[..., 1]
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(x.with_data(xc), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    # z-quality residual out of the mixed path
    assert np.max(np.abs(ad @ xd - bd)) < 1e-8
