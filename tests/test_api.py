"""Tests for the call-by-call C-API-parity layer (api.py).

Exercises the reference's 10-step default workflow (tfqmrgpu.cu:700-791)
call by call, the one-call bsrsv_z/_c conveniences, the introspection
functions, and the status-code error paths.
"""

import numpy as np
import pytest

from tfqmrgpu_tpu import api
from tfqmrgpu_tpu.errors import Status, decode_status
from tfqmrgpu_tpu.ops.layout import LAYOUT_RIRIRIRI, to_planes

from conftest import dense_from_bsr, make_random_problem


def _riri(c):
    """Complex [nnzb, d1, d2] -> RIRIRIRI real array (the C host layout)."""
    return np.ascontiguousarray(
        np.stack([c.real, c.imag], axis=-1)).astype(np.float64)


def test_ten_step_workflow(rng):
    lm, ln = 4, 8
    a, x, b = make_random_problem(rng, mb=10, lm=lm, ln=ln, ncols=3, x_fill=1.0)

    st, h = api.create_handle()
    assert st == 0
    assert api.set_stream(h, 7) == 0
    st, s = api.get_stream(h)
    assert (st, s) == (0, 7)

    out = api.bsrsv_create_plan(h, a.nrows, a.rowptr, a.colind,
                                x.rowptr, x.colind, b.rowptr, b.colind)
    assert not isinstance(out, int), api.print_error(out if isinstance(out, int) else 0)
    st, p = out
    assert st == 0

    out = api.bsrsv_buffer_size(h, p, lm, lm, ln, ln, "z")
    assert not isinstance(out, int)
    st, nbytes = out
    assert st == 0 and nbytes > 0

    st, ws = api.create_workspace(nbytes)
    assert st == 0
    assert api.bsrsv_set_buffer(h, p, ws) == 0
    st, tok = api.bsrsv_get_buffer(h, p)
    assert (st, tok) == (0, ws)

    assert api.bsrsv_set_matrix(h, p, "A", _riri(a.data), "z", lm, lm,
                                "n", LAYOUT_RIRIRIRI) == 0
    assert api.bsrsv_set_matrix(h, p, "B", _riri(b.data), "z", lm, ln,
                                "n", LAYOUT_RIRIRIRI) == 0

    assert api.bsrsv_solve(h, p, 1e-9, 300) == 0

    st, resid, iters, flops, flops_all = api.bsrsv_get_info(h, p)
    assert st == 0
    assert resid <= 1e-9 and iters > 0 and flops > 0 and flops_all >= flops

    out = api.bsrsv_get_matrix(h, p, "X", "z", lm, ln, "n", LAYOUT_RIRIRIRI)
    assert not isinstance(out, int)
    st, xval = out
    assert st == 0

    # verify A @ X == B densely
    xc = xval[..., 0] + 1j * xval[..., 1]
    xs = x.with_data(xc)
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(xs, lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    assert np.max(np.abs(ad @ xd - bd)) < 1e-6

    assert api.destroy_workspace(ws) == 0
    assert api.bsrsv_destroy_plan(h, p) == 0
    assert api.destroy_handle(h) == 0


def test_set_matrix_before_set_buffer_is_deferred(rng):
    """setMatrix before setBuffer is queued and applied at setBuffer time."""
    lm, ln = 4, 4
    a, x, b = make_random_problem(rng, mb=8, lm=lm, ln=ln, ncols=2)
    st, h = api.create_handle()
    st, p = api.bsrsv_create_plan(h, a.nrows, a.rowptr, a.colind,
                                  x.rowptr, x.colind, b.rowptr, b.colind)
    st, _ = api.bsrsv_buffer_size(h, p, lm, lm, ln, ln, "z")
    assert api.bsrsv_set_matrix(h, p, "A", _riri(a.data)) == 0
    assert api.bsrsv_set_matrix(h, p, "B", _riri(b.data)) == 0
    assert api.bsrsv_set_buffer(h, p) == 0
    assert api.bsrsv_solve(h, p, 1e-8, 200) == 0
    api.bsrsv_destroy_plan(h, p)
    api.destroy_handle(h)


def test_one_call_bsrsv_z(rng):
    lm, ln = 4, 8
    a, x, b = make_random_problem(rng, mb=10, lm=lm, ln=ln, ncols=3, x_fill=1.0)
    st, xval, iters, resid = api.bsrsv_z(
        a.nrows, lm, ln,
        a.rowptr, a.colind, _riri(a.data), "n",
        x.rowptr, x.colind, None, "n",
        b.rowptr, b.colind, _riri(b.data), "n",
        max_iterations=300, threshold=1e-9)
    assert st == 0
    assert resid <= 1e-9
    xc = xval[..., 0] + 1j * xval[..., 1]
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(x.with_data(xc), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    assert np.max(np.abs(ad @ xd - bd)) < 1e-6


def test_one_call_bsrsv_c(rng):
    lm = ln = 4
    a, x, b = make_random_problem(rng, mb=8, lm=lm, ln=ln, ncols=2,
                                  dtype=np.complex64)
    st, xval, iters, resid = api.bsrsv_c(
        a.nrows, lm, ln,
        a.rowptr, a.colind, _riri(a.data).astype(np.float32), "n",
        x.rowptr, x.colind, None, "n",
        b.rowptr, b.colind, _riri(b.data).astype(np.float32), "n",
        max_iterations=300, threshold=1e-4)
    assert st == 0
    assert resid <= 1e-4


def test_introspection():
    st, n, flat = api.bsrsv_allowed_block_sizes()
    assert st == 0 and n == 15 and len(flat) == 30
    assert api.bsrsv_block_size_missing(32, 32) == 0
    assert api.bsrsv_block_size_missing(3, 7) == int(Status.BLOCKSIZE_MISSING)


def test_error_paths(rng):
    # invalid handle / plan ids
    assert decode_status(api.destroy_handle(999999))[0] == int(
        Status.POINTER_INVALID)
    assert decode_status(api.bsrsv_destroy_plan(0, 999999))[0] == int(
        Status.POINTER_INVALID)
    st, _, _, _, _ = api.bsrsv_get_info(0, 999999)
    assert decode_status(st)[0] == int(Status.POINTER_INVALID)

    # B not subset of X -> B_IS_NOT_SUBSET_OF_X status (not an exception)
    lm = 4
    a, x, b = make_random_problem(rng, mb=6, lm=lm, ln=lm, ncols=2)
    bad_rowptr_b = np.array([0] + [1] * 6, dtype=np.int32)
    bad_colind_b = np.array([x.ncols + 3], dtype=np.int32)  # not in X
    st, h = api.create_handle()
    out = api.bsrsv_create_plan(h, a.nrows, a.rowptr, a.colind,
                                x.rowptr, x.colind,
                                bad_rowptr_b, bad_colind_b)
    assert isinstance(out, int)
    assert decode_status(out)[0] == int(Status.B_IS_NOT_SUBSET_OF_X)

    # solve before setBuffer -> NO_INFO_PASSED
    st, p = api.bsrsv_create_plan(h, a.nrows, a.rowptr, a.colind,
                                  x.rowptr, x.colind, b.rowptr, b.colind)
    assert decode_status(api.bsrsv_solve(h, p))[0] == int(
        Status.NO_INFO_PASSED)

    # wrong precision char at bufferSize
    out = api.bsrsv_buffer_size(h, p, lm, lm, lm, lm, "q")
    assert isinstance(out, int)
    assert decode_status(out)[0] == int(Status.PRECISION_MISSMATCH)
    api.bsrsv_destroy_plan(h, p)
    api.destroy_handle(h)
