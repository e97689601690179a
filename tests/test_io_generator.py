"""FD generator + XML I/O tests, ending in the reference's acceptance test:
generate FD_example -> solve -> compare against the embedded dense reference
(maxdev gate 1e-5, bench_tfqmrgpu.cu:192; residual tolerance 1e-9)."""

import numpy as np
import pytest

import tfqmrgpu_tpu as tq
from tfqmrgpu_tpu.generator import FD_COEFFS, generate_fd_problem
from tfqmrgpu_tpu.io.xmlio import read_xml, write_xml


def test_fd_coefficients_checksum():
    # every stencil row sums to zero (the reference asserts this,
    # tfqmrgpu_generate_FD_example.cxx:391-398)
    for nfd, (denom, coeff) in FD_COEFFS.items():
        assert coeff[0] + 2 * sum(coeff[1:]) == 0
        assert len(coeff) == nfd + 1


@pytest.mark.parametrize("dim,be", [(1, 4), (2, 2), (3, 2)])
def test_stencil_row_sums_zero(dim, be):
    """With energy=0 the assembled operator rows sum to zero (Laplacian)."""
    prob = generate_fd_problem(rsb=0.1, rtb=2.9, block_edge=be,
                               dimension=dim, nfd=4)
    a = prob.a_with_data()
    bs = prob.params["bs"]
    # sum of each point row over all blocks in the block row must be ~0 for
    # interior rows; check the row of the source block (deep interior)
    row0 = int(np.flatnonzero(np.diff(prob.b.rowptr))[0])
    lo, hi = prob.a.rowptr[row0], prob.a.rowptr[row0 + 1]
    if hi - lo == len(prob.a_stencil):  # fully interior
        row_sum = np.sum([a.data[i].real for i in range(lo, hi)],
                         axis=(0, 2))
        np.testing.assert_allclose(row_sum, 0.0, atol=1e-12)


def test_generator_structure_3d():
    prob = generate_fd_problem(rsb=1.75, rtb=6.75, block_edge=2,
                               dimension=3, nfd=4)
    assert prob.params["bs"] == 8
    assert prob.x.ncols == 1          # rsb/2 = 0.875 -> single source block
    assert prob.b.nnzb == 1
    assert prob.a.nrows == prob.x.nrows
    assert len(prob.a_stencil) == 13  # 1 + 2*(stencil_range=2)*3 blocks
    # B is subset of X and the plan accepts the problem
    plan = tq.create_plan(prob.a, prob.x, prob.b)
    assert plan.nnzb_x == prob.x.nnzb


def test_xml_roundtrip(tmp_path):
    prob = generate_fd_problem(rsb=1.2, rtb=3.5, block_edge=2, dimension=2,
                               reference=True, nfd=4)
    fn = str(tmp_path / "fd.xml")
    write_xml(prob, fn)
    xp = read_xml(fn)
    assert xp.tolerance == prob.tolerance
    for got, want in ((xp.a, prob.a), (xp.b, prob.b), (xp.x, prob.x)):
        np.testing.assert_array_equal(got.rowptr, want.rowptr)
        np.testing.assert_array_equal(got.colind, want.colind)
    np.testing.assert_allclose(xp.a.data, prob.a_with_data().data,
                               rtol=1e-14)
    np.testing.assert_allclose(xp.b.data, prob.b_with_data().data)
    assert xp.x_has_reference
    np.testing.assert_allclose(xp.x.data.real,
                               prob.x_reference.astype(np.float64),
                               rtol=1e-6)


@pytest.mark.parametrize("engine", ["xla", "dense"])
def test_fd_acceptance_2d(tmp_path, engine):
    """The minimum end-to-end slice: generate -> XML -> solve -> residual
    below tolerance and maxdev < 1e-5 vs the dense reference solution."""
    prob = generate_fd_problem(rsb=1.75, rtb=4.5, block_edge=2, dimension=2,
                               reference=True, nfd=4)
    fn = str(tmp_path / "fd2d.xml")
    write_xml(prob, fn)
    xp = read_xml(fn)
    xs, info = tq.solve(xp.a, xp.x, xp.b, precision="z", engine=engine,
                        tolerance=xp.tolerance, max_iterations=2000)
    assert info.return_status == 0
    assert info.residuum_reached <= xp.tolerance
    maxdev = np.max(np.abs(xs.data - xp.x.data))
    assert maxdev < 1e-5


def test_plan_file_golden_assets():
    """Parse the reference's golden pair plans when available."""
    import os

    from tfqmrgpu_tpu.io.planfile import read_plan_file

    path = "/root/reference/test/multiplication/plan_unordered.14-287-16"
    if not os.path.exists(path):
        pytest.skip("golden asset not mounted")
    pf = read_plan_file(path)
    assert (pf.nnzb_y, pf.nnzb_a, pf.nnzb_x) == (4490, 13109, 4490)
    assert pf.pairs.shape[0] == 50526
    # the reordered variant has identical pair multiset per Y block
    pf2 = read_plan_file(path.replace("unordered", "reordered"))
    assert pf2.pairs.shape[0] == pf.pairs.shape[0]
    d1 = {}
    for (ia, ix), iy in zip(
            pf.pairs, np.repeat(pf.y_order, np.diff(pf.starts.astype(np.int64)))):
        d1.setdefault(int(iy), set()).add((int(ia), int(ix)))
    d2 = {}
    for (ia, ix), iy in zip(
            pf2.pairs, np.repeat(pf2.y_order, np.diff(pf2.starts.astype(np.int64)))):
        d2.setdefault(int(iy), set()).add((int(ia), int(ix)))
    assert d1 == d2


def test_generator_cli(tmp_path, monkeypatch):
    import os

    from tfqmrgpu_tpu.generator import main

    monkeypatch.chdir(tmp_path)
    assert main(["1.2", "3.0", "2", "2", "0.0", "no", "0", "4"]) == 0
    assert os.path.exists(tmp_path / "FD_example.xml")
    xp = read_xml(str(tmp_path / "FD_example.xml"))
    assert not xp.x_has_reference
