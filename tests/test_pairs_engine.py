"""The 'pairs' solver engine: pair-plan Pallas SpMM + fused-layout vectors."""

import numpy as np
import pytest

from tfqmrgpu_tpu import Solver
from tfqmrgpu_tpu.errors import Status

from conftest import dense_from_bsr, make_random_problem


def _solve_and_check(a, x, b, lm, ln, tol=1e-5):
    s = Solver(a, x, b, precision="c", engine="pairs")
    info = s.solve(tolerance=tol, max_iterations=400)
    assert info.return_status == int(Status.SUCCESS)
    got = s.get_matrix("X")
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(x.with_data(got), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    dev = np.max(np.abs(ad @ xd - bd)) / np.max(np.abs(bd))
    assert dev < 50 * tol, dev
    return info


def test_pairs_engine_full_pattern(rng):
    lm = ln = 8
    a, x, b = make_random_problem(rng, mb=10, lm=lm, ln=ln, ncols=3,
                                  x_fill=1.0, dtype=np.complex64)
    info = _solve_and_check(a, x, b, lm, ln)
    # iteration parity vs the reference-shaped xla engine
    s2 = Solver(a, x, b, precision="c", engine="xla")
    i2 = s2.solve(tolerance=1e-5, max_iterations=400)
    assert abs(info.iterations_needed - i2.iterations_needed) <= 2


def test_pairs_engine_sparse_pattern(rng):
    lm = ln = 4
    a, x, b = make_random_problem(rng, mb=16, lm=lm, ln=ln, ncols=4,
                                  x_fill=1.0, dtype=np.complex64)
    _solve_and_check(a, x, b, lm, ln)


def test_pairs_engine_bf16x6(rng, monkeypatch):
    """Full tfQMR loop with the bf16x6 multiply (3-way splits, exact-f32
    quality): must converge like 'highest', not like the ~1e-4-floor
    bf16x4 mode."""
    monkeypatch.setenv("TFQ_PAIRS_MM_PREC", "bf16x6")
    lm = ln = 16
    a, x, b = make_random_problem(rng, mb=8, lm=lm, ln=ln, ncols=2,
                                  x_fill=1.0, dtype=np.complex64)
    info = _solve_and_check(a, x, b, lm, ln, tol=1e-6)
    monkeypatch.setenv("TFQ_PAIRS_MM_PREC", "highest")
    s2 = Solver(a, x, b, precision="c", engine="pairs")
    i2 = s2.solve(tolerance=1e-6, max_iterations=400)
    assert abs(info.iterations_needed - i2.iterations_needed) <= 2


def test_pairs_engine_z_ozaki(rng):
    """precision='z' on the pairs engine: the Ozaki slice multiply + f64
    vector ops must reach tolerances far beyond any f32 path and match
    the dense-z solve."""
    import jax

    jax.config.update("jax_enable_x64", True)
    lm = ln = 16
    a, x, b = make_random_problem(rng, mb=8, lm=lm, ln=ln, ncols=2,
                                  x_fill=1.0, dtype=np.complex128)
    tol = 1e-11
    s = Solver(a, x, b, precision="z", engine="pairs")
    info = s.solve(tolerance=tol, max_iterations=400)
    assert info.return_status == int(Status.SUCCESS)
    got = s.get_matrix("X")
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(x.with_data(got), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    dev = np.max(np.abs(ad @ xd - bd)) / np.max(np.abs(bd))
    assert dev < 1e-9, dev
    s2 = Solver(a, x, b, precision="z", engine="dense")
    i2 = s2.solve(tolerance=tol, max_iterations=400)
    assert abs(info.iterations_needed - i2.iterations_needed) <= 2


def test_pairs_engine_rejects_z_small_lm(rng):
    """lm < 16 cannot tile the bf16 oz windows: a clear error, not a
    Mosaic compile failure."""
    from tfqmrgpu_tpu.errors import TfqmrgpuError

    a, x, b = make_random_problem(rng, mb=6, lm=4, ln=4, ncols=2,
                                  dtype=np.complex128)
    with pytest.raises(TfqmrgpuError):
        Solver(a, x, b, precision="z", engine="pairs")


def test_pairs_engine_tile_pipe_solve(rng, monkeypatch):
    """Full tfQMR solve through the TILE-pipelined resident kernel
    (forced via env; auto only triggers on wide grouped lanes): the
    iterate must match the default step-pipelined engine exactly."""
    lm = ln = 4
    a, x, b = make_random_problem(rng, mb=12, lm=lm, ln=ln, ncols=4,
                                  x_fill=0.7, dtype=np.complex64)
    xu, infou = None, None
    import tfqmrgpu_tpu as tq

    xu, infou = tq.solve(a, x, b, precision="c", engine="pairs",
                         tolerance=1e-4, max_iterations=400)
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "4")
    monkeypatch.setenv("TFQ_PAIRS_RESIDENT", "1")
    monkeypatch.setenv("TFQ_PAIRS_TILEPIPE", "1")
    xt, infot = tq.solve(a, x, b, precision="c", engine="pairs",
                         tolerance=1e-4, max_iterations=400)
    assert abs(infot.iterations_needed - infou.iterations_needed) <= 2
    scale = np.abs(xu.data).max()
    assert np.abs(xt.data - xu.data).max() / scale < 1e-4


def test_pairs_engine_z_ozaki_grouped(rng, monkeypatch):
    """precision='z' with a forced column group (r3): the grouped Ozaki
    multiply + f64 grouped primitives must match the ungrouped 'z' solve
    (same iterate, f64-quality residuals)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    lm = ln = 16
    a, x, b = make_random_problem(rng, mb=8, lm=lm, ln=ln, ncols=2,
                                  x_fill=1.0, dtype=np.complex128)
    tol = 1e-11
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "2")
    s = Solver(a, x, b, precision="z", engine="pairs")
    assert s._gp is not None and s._gp.group_size == 2
    assert not s._pp_plan.resident
    info = s.solve(tolerance=tol, max_iterations=400)
    assert info.return_status == int(Status.SUCCESS)
    got = s.get_matrix("X")
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(x.with_data(got), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    dev = np.max(np.abs(ad @ xd - bd)) / np.max(np.abs(bd))
    assert dev < 1e-9, dev
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "1")
    s2 = Solver(a, x, b, precision="z", engine="pairs")
    assert s2._gp is None
    i2 = s2.solve(tolerance=tol, max_iterations=400)
    assert abs(info.iterations_needed - i2.iterations_needed) <= 2
