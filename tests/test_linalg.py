"""ops.linalg + ops.blocksparse correctness vs NumPy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from tfqmrgpu_tpu.ops import linalg
from tfqmrgpu_tpu.ops.blocksparse import BlockSparseAction, spmm_pairs
from tfqmrgpu_tpu.plan import create_plan

from conftest import dense_from_bsr, make_random_problem


def cpair(rng, shape, dtype=np.float64):
    return (jnp.asarray(rng.standard_normal(shape).astype(dtype)),
            jnp.asarray(rng.standard_normal(shape).astype(dtype)))


def tocplx(p):
    return np.asarray(p[0]) + 1j * np.asarray(p[1])


def test_dotp_nrm2(rng):
    nnzb, lm, ln, ncols = 17, 4, 8, 3
    x = cpair(rng, (nnzb, lm, ln))
    y = cpair(rng, (nnzb, lm, ln), np.float32)
    colindx = jnp.asarray(rng.integers(0, ncols, nnzb).astype(np.int32))
    zr, zi = linalg.dotp(x, y, colindx, ncols)
    xc, yc = tocplx(x), tocplx(y)
    want = np.zeros((ncols, ln), complex)
    for inz in range(nnzb):
        want[int(colindx[inz])] += (xc[inz] * yc[inz]).sum(axis=0)  # unconjugated
    np.testing.assert_allclose(np.asarray(zr) + 1j * np.asarray(zi), want,
                               rtol=1e-6)

    d = linalg.nrm2(x, colindx, ncols)
    want_n = np.zeros((ncols, ln))
    for inz in range(nnzb):
        want_n[int(colindx[inz])] += (np.abs(xc[inz]) ** 2).sum(axis=0)
    np.testing.assert_allclose(np.asarray(d), want_n, rtol=1e-12)


def test_axpy_xpay(rng):
    nnzb, lm, ln, ncols = 11, 4, 8, 3
    x = cpair(rng, (nnzb, lm, ln))
    y = cpair(rng, (nnzb, lm, ln))
    a = cpair(rng, (ncols, ln))
    colindx = jnp.asarray(rng.integers(0, ncols, nnzb).astype(np.int32))
    ac = tocplx(a)[np.asarray(colindx)][:, None, :]

    got = linalg.axpy(y, x, a, colindx)
    np.testing.assert_allclose(tocplx(got), ac * tocplx(x) + tocplx(y),
                               rtol=1e-12)
    got = linalg.xpay(y, a, x, colindx)
    np.testing.assert_allclose(tocplx(got), tocplx(x) + ac * tocplx(y),
                               rtol=1e-12)


def test_add_rhs_and_unit_blocks(rng):
    nnzv, nnzb, lm, ln = 9, 4, 4, 8
    v = cpair(rng, (nnzv, lm, ln))
    b = cpair(rng, (nnzb, lm, ln))
    subset = jnp.asarray(np.array([1, 3, 6, 8], np.int32))
    got = linalg.add_rhs(v, b, -1.0, subset)
    want = tocplx(v).copy()
    for i, s in enumerate([1, 3, 6, 8]):
        want[s] -= tocplx(b)[i]
    np.testing.assert_allclose(tocplx(got), want, rtol=1e-12)

    ub = linalg.set_unit_blocks(2, lm, ln, jnp.float64)
    u = tocplx(ub)
    for j in range(ln):
        np.testing.assert_allclose(u[0, j % lm, j], 1.0)
    assert np.count_nonzero(u) == 2 * ln


@pytest.mark.parametrize("engine", ["xla"])
def test_spmm_against_dense(rng, engine):
    lm, ln = 4, 8
    a, x, b = make_random_problem(rng, mb=10, lm=lm, ln=ln, ncols=3)
    plan = create_plan(a, x, b)
    action = BlockSparseAction.from_plan(
        plan, a.data.real.copy(), a.data.imag.copy(), engine=engine, ln=ln)
    xv = cpair(rng, (plan.nnzb_x, lm, ln))
    y = action.multiply(xv)
    # dense oracle
    a_dense = dense_from_bsr(a, lm, lm)
    x_dense = np.zeros((x.nrows * lm, x.ncols * ln), complex)
    row_of_x = x.row_of()
    xc = tocplx(xv)
    for inz in range(plan.nnzb_x):
        r, c = int(row_of_x[inz]), int(x.colind[inz])
        x_dense[r * lm:(r + 1) * lm, c * ln:(c + 1) * ln] = xc[inz]
    y_dense = a_dense @ x_dense
    yc = tocplx(y)
    for inz in range(plan.nnzb_x):
        r, c = int(row_of_x[inz]), int(x.colind[inz])
        np.testing.assert_allclose(
            yc[inz], y_dense[r * lm:(r + 1) * lm, c * ln:(c + 1) * ln],
            rtol=1e-10, atol=1e-10)


def test_layout_roundtrips(rng):
    """to_planes/from_planes over all three reference layouts x transpose
    (reference: transpose_blocks_kernel, tfqmrgpu_linalg.hxx:282-380)."""
    from tfqmrgpu_tpu.ops import layout as L

    nnzb, d1, d2 = 5, 4, 8
    c = (rng.standard_normal((nnzb, d1, d2))
         + 1j * rng.standard_normal((nnzb, d1, d2)))
    for lay in (L.LAYOUT_RIRIRIRI, L.LAYOUT_RRRRIIII, L.LAYOUT_RRIIRRII):
        flat = L.from_planes(c.real, c.imag, layout=lay)
        re, im = L.to_planes(flat, nnzb, d1, d2, layout=lay)
        np.testing.assert_allclose(re, c.real)
        np.testing.assert_allclose(im, c.imag)
    # transpose + conjugate + scale
    re, im = L.to_planes(c, nnzb, d1, d2, trans="t", conjugate=True,
                         scale=2.0)
    np.testing.assert_allclose(re, 2 * np.swapaxes(c.real, 1, 2))
    np.testing.assert_allclose(im, -2 * np.swapaxes(c.imag, 1, 2))


def test_layout_errors(rng):
    from tfqmrgpu_tpu.errors import TfqmrgpuError
    from tfqmrgpu_tpu.ops import layout as L

    import pytest as _pytest

    c = rng.standard_normal((2, 4, 4, 2))
    with _pytest.raises(TfqmrgpuError):
        L.to_planes(c, 2, 4, 4, layout=0x99)
    with _pytest.raises(TfqmrgpuError):
        L.to_planes(c, 2, 4, 4, trans="q")
