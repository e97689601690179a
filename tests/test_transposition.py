"""Conjugate/adjoint transposition modes ('h'/'c'/'*') and the real
mixed-precision 'm' path through the plan-based C API.

Reference semantics: set_or_getMatrix resolves the transposition char into
an 'n'/'t' flag plus an imaginary scale of -1 (tfqmrgpu.cu:492-500) --
'h'/'c' mean transpose+conjugate (the LAPACK Hermitian adjoint), '*' means
conjugate only, all case-insensitive.  The reference declares precision 'm'
but disables it (tfqmrgpu.cu:42); here 'm' = c-iterate + z-refine.
"""

import numpy as np
import pytest

from tfqmrgpu_tpu import api
from tfqmrgpu_tpu.errors import Status, TfqmrgpuError, decode_status
from tfqmrgpu_tpu.ops import layout as layout_ops
from tfqmrgpu_tpu.solver import Solver

from conftest import dense_from_bsr, make_random_problem


def _riri(c):
    return np.ascontiguousarray(
        np.stack([c.real, c.imag], axis=-1)).astype(np.float64)


# ------------------------------------------------------------- layout level

def test_resolve_transposition_chars():
    assert layout_ops.resolve_transposition("n") == ("n", False)
    assert layout_ops.resolve_transposition("t") == ("t", False)
    assert layout_ops.resolve_transposition("h") == ("t", True)
    assert layout_ops.resolve_transposition("c") == ("t", True)
    assert layout_ops.resolve_transposition("*") == ("n", True)
    # case-insensitive, like the reference's IgnoreCase bit trick
    assert layout_ops.resolve_transposition("H") == ("t", True)
    assert layout_ops.resolve_transposition("C") == ("t", True)
    assert layout_ops.resolve_transposition("N") == ("n", False)
    # explicit conjugate flag composes (XOR) with the char
    assert layout_ops.resolve_transposition("h", conjugate=True) == ("t", False)
    assert layout_ops.resolve_transposition("*", conjugate=True) == ("n", False)
    with pytest.raises(TfqmrgpuError) as ei:
        layout_ops.resolve_transposition("q")
    assert decode_status(ei.value.status)[0] == int(Status.TANSPOSITION_UNKNOWN)


def test_to_planes_adjoint_and_conjugate(rng):
    blocks = (rng.standard_normal((3, 4, 4))
              + 1j * rng.standard_normal((3, 4, 4)))
    re_h, im_h = layout_ops.to_planes(blocks, 3, 4, 4, trans="h")
    np.testing.assert_allclose(re_h + 1j * im_h,
                               np.conj(np.swapaxes(blocks, 1, 2)))
    re_s, im_s = layout_ops.to_planes(blocks, 3, 4, 4, trans="*")
    np.testing.assert_allclose(re_s + 1j * im_s, np.conj(blocks))
    # 'c' == 'h', and scale composes on top of conjugation
    re_c, im_c = layout_ops.to_planes(blocks, 3, 4, 4, trans="C", scale=2.0)
    np.testing.assert_allclose(re_c + 1j * im_c,
                               2.0 * np.conj(np.swapaxes(blocks, 1, 2)))


def test_from_planes_adjoint_roundtrip(rng):
    blocks = (rng.standard_normal((2, 3, 3))
              + 1j * rng.standard_normal((2, 3, 3)))
    re, im = blocks.real.copy(), blocks.imag.copy()
    out = layout_ops.from_planes(re, im, trans="h",
                                 layout=layout_ops.LAYOUT_RIRIRIRI)
    got = out[..., 0] + 1j * out[..., 1]
    np.testing.assert_allclose(got, np.conj(np.swapaxes(blocks, 1, 2)))


# ------------------------------------------------------------ solver level

def test_solver_adjoint_set_matrix(rng):
    """Uploading A with trans='c' must solve conj(A_blocks^T) X == B.

    (Per-block adjoint, matching the reference's per-block
    transpose_blocks_kernel semantics.)
    """
    lm, ln = 4, 8
    a, x, b = make_random_problem(rng, mb=8, lm=lm, ln=ln, ncols=2,
                                  x_fill=1.0)
    # make the per-block adjoint operator still diagonally dominant: it is,
    # because the diagonal blocks stay dominant under per-block adjoint
    s = Solver(a, x, b, precision="z")
    s.set_matrix("A", a.data, trans="c")   # overrides the 'n' upload
    info = s.solve(tolerance=1e-9, max_iterations=300)
    assert info.return_status == 0
    xs = x.with_data(s.get_matrix("X"))
    # dense operator with each block adjointed in place
    a_adj = a.with_data(np.conj(np.swapaxes(a.data, 1, 2)))
    ad = dense_from_bsr(a_adj, lm, lm)
    xd = dense_from_bsr(xs, lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    assert np.max(np.abs(ad @ xd - bd)) < 1e-6


def test_solver_conjugate_only_roundtrip(rng):
    """trans='*' on upload == solving with conj(A); getMatrix(trans='*')
    conjugates the result back."""
    lm, ln = 4, 4
    a, x, b = make_random_problem(rng, mb=6, lm=lm, ln=ln, ncols=2,
                                  x_fill=1.0)
    s = Solver(a, x, b, precision="z")
    s.set_matrix("A", a.data, trans="*")   # overrides the 'n' upload
    s.set_matrix("B", np.conj(b.data))
    info = s.solve(tolerance=1e-9, max_iterations=300)
    assert info.return_status == 0
    # conj(A) Xc = conj(B)  =>  A conj(Xc) = B
    x_back = s.get_matrix("X", trans="*")
    xs = x.with_data(x_back)
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(xs, lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    assert np.max(np.abs(ad @ xd - bd)) < 1e-6


# --------------------------------------------------------------- C API level

def test_api_set_matrix_adjoint(rng):
    """A reference call sequence using trans='c' works unmodified."""
    lm, ln = 4, 8
    a, x, b = make_random_problem(rng, mb=8, lm=lm, ln=ln, ncols=2,
                                  x_fill=1.0)
    st, h = api.create_handle()
    out = api.bsrsv_create_plan(h, a.nrows, a.rowptr, a.colind,
                                x.rowptr, x.colind, b.rowptr, b.colind)
    st, p = out
    st, _ = api.bsrsv_buffer_size(h, p, lm, lm, ln, ln, "z")
    assert api.bsrsv_set_buffer(h, p) == 0
    assert api.bsrsv_set_matrix(h, p, "A", _riri(a.data), "z", lm, lm,
                                "c", layout_ops.LAYOUT_RIRIRIRI) == 0
    assert api.bsrsv_set_matrix(h, p, "B", _riri(b.data), "z", lm, ln,
                                "n", layout_ops.LAYOUT_RIRIRIRI) == 0
    assert api.bsrsv_solve(h, p, 1e-9, 300) == 0
    st, xval = api.bsrsv_get_matrix(h, p, "X", "z", lm, ln, "n",
                                    layout_ops.LAYOUT_RIRIRIRI)
    assert st == 0
    xc = xval[..., 0] + 1j * xval[..., 1]
    a_adj = a.with_data(np.conj(np.swapaxes(a.data, 1, 2)))
    ad = dense_from_bsr(a_adj, lm, lm)
    xd = dense_from_bsr(x.with_data(xc), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    assert np.max(np.abs(ad @ xd - bd)) < 1e-6
    api.bsrsv_destroy_plan(h, p)
    api.destroy_handle(h)


def test_api_unknown_transposition_status(rng):
    lm, ln = 4, 4
    a, x, b = make_random_problem(rng, mb=4, lm=lm, ln=ln, ncols=1,
                                  x_fill=1.0)
    st, h = api.create_handle()
    _, p = api.bsrsv_create_plan(h, a.nrows, a.rowptr, a.colind,
                                 x.rowptr, x.colind, b.rowptr, b.colind)
    api.bsrsv_buffer_size(h, p, lm, lm, ln, ln, "z")
    api.bsrsv_set_buffer(h, p)
    st = api.bsrsv_set_matrix(h, p, "A", _riri(a.data), "z", lm, lm,
                              "q", layout_ops.LAYOUT_RIRIRIRI)
    assert decode_status(st)[0] == int(Status.TANSPOSITION_UNKNOWN)
    api.bsrsv_destroy_plan(h, p)
    api.destroy_handle(h)


# ------------------------------------------------------------- mixed 'm'

def test_plan_api_mixed_precision(rng):
    """precision='m' through the plan API: c-iterate + z-refine, residual
    at z quality (NOT the old behavior of silently aliasing to 'c')."""
    lm, ln = 4, 8
    a, x, b = make_random_problem(rng, mb=10, lm=lm, ln=ln, ncols=3,
                                  x_fill=1.0)
    st, h = api.create_handle()
    _, p = api.bsrsv_create_plan(h, a.nrows, a.rowptr, a.colind,
                                 x.rowptr, x.colind, b.rowptr, b.colind)
    out = api.bsrsv_buffer_size(h, p, lm, lm, ln, ln, "m")
    assert not isinstance(out, int)
    st, nbytes = out
    assert st == 0 and nbytes > 0
    assert api.bsrsv_set_buffer(h, p) == 0
    assert api.bsrsv_set_matrix(h, p, "A", _riri(a.data), "m", lm, lm,
                                "n", layout_ops.LAYOUT_RIRIRIRI) == 0
    assert api.bsrsv_set_matrix(h, p, "B", _riri(b.data), "m", lm, ln,
                                "n", layout_ops.LAYOUT_RIRIRIRI) == 0
    assert api.bsrsv_solve(h, p, 1e-10, 400) == 0
    st, resid, iters, flops, flops_all = api.bsrsv_get_info(h, p)
    assert st == 0 and resid <= 1e-10 and iters > 0
    st, xval = api.bsrsv_get_matrix(h, p, "X", "m", lm, ln, "n",
                                    layout_ops.LAYOUT_RIRIRIRI)
    assert st == 0
    xc = xval[..., 0] + 1j * xval[..., 1]
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(x.with_data(xc), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    # z-quality residual: far below anything float32 iteration alone gives
    assert np.max(np.abs(ad @ xd - bd)) < 1e-8
    api.bsrsv_destroy_plan(h, p)
    api.destroy_handle(h)


def test_one_call_bsrsv_m(rng):
    lm, ln = 4, 8
    a, x, b = make_random_problem(rng, mb=8, lm=lm, ln=ln, ncols=2,
                                  x_fill=1.0)
    st, xval, iters, resid = api.bsrsv_m(
        a.nrows, lm, ln,
        a.rowptr, a.colind, _riri(a.data), "n",
        x.rowptr, x.colind, None, "n",
        b.rowptr, b.colind, _riri(b.data), "n",
        max_iterations=400, threshold=1e-10)
    assert st == 0
    xc = xval[..., 0] + 1j * xval[..., 1]
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(x.with_data(xc), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    assert np.max(np.abs(ad @ xd - bd)) < 1e-8
