"""Legacy-format round-trip + CLI bench driver (tfQMR mode) tests."""

import numpy as np

from tfqmrgpu_tpu.io.legacy import read_legacy, write_legacy

from conftest import make_random_problem


def test_legacy_roundtrip(tmp_path, rng):
    a, x, b = make_random_problem(rng, mb=8, lm=4, ln=4, ncols=2)
    x2 = x.with_data(np.zeros((x.nnzb, 4, 4), complex))
    path = str(tmp_path / "problem.dat")
    write_legacy(path, a, b, x2, tolerance=1e-8)
    p = read_legacy(path, echo=0)
    assert p.tolerance == 1e-8
    np.testing.assert_array_equal(p.a.rowptr, a.rowptr)
    np.testing.assert_array_equal(p.a.colind, a.colind)
    np.testing.assert_allclose(p.a.data, a.data)
    np.testing.assert_allclose(p.b.data, b.data)
    assert p.b.nrows == a.nrows


def test_legacy_pads_short_b(tmp_path, rng):
    """B with fewer rows than X gets empty rows appended
    (tfqmrgpu_example_reader.hxx:193-213)."""
    a, x, b = make_random_problem(rng, mb=6, lm=4, ln=4, ncols=2)
    import dataclasses

    nshort = int(np.flatnonzero(np.diff(b.rowptr) > 0).max()) + 1
    b_short = dataclasses.replace(b, nrows=nshort,
                                  rowptr=b.rowptr[: nshort + 1])
    x2 = x.with_data(np.zeros((x.nnzb, 4, 4), complex))
    path = str(tmp_path / "short.dat")
    write_legacy(path, a, b_short, x2)
    p = read_legacy(path)
    assert p.b.nrows == x.nrows
    assert p.b.rowptr.shape[0] == x.nrows + 1


def test_bench_tfqmr_mode_on_generated_fd(tmp_path):
    """End-to-end: generate FD_example.xml with reference solution, run the
    CLI bench tfQMR mode, expect the quality gate to pass (reference
    recipe: README.md:61-63)."""
    from tfqmrgpu_tpu.bench import bench_tfqmr
    from tfqmrgpu_tpu.generator import generate_fd_problem
    from tfqmrgpu_tpu.io.xmlio import write_xml

    prob = generate_fd_problem(rsb=0.5, rtb=2.5, block_edge=2, dimension=2,
                               reference=True, nfd=2)
    path = str(tmp_path / "FD_example.xml")
    write_xml(prob, path)
    assert bench_tfqmr(path, "z", nrep=1, max_iterations=400, echo=0) == 0


def test_errors_cli(capsys):
    from tfqmrgpu_tpu.errors import main

    assert main(["13013"]) == 0
    out = capsys.readouterr().out
    assert "subset" in out and "line=13" in out
