"""Solver-level superblock integration (VERDICT r4 ask #3): small-block
problems (LM <= 8) solved through the pairs engine in MERGED space must
reproduce the fine-grained solve -- same iterate quality, comparable
iteration counts -- with dead merged slots masked through the whole
while_loop (the merged_x_mask contract, ops/superblock.py)."""

import numpy as np
import pytest

from tfqmrgpu_tpu.errors import Status
from tfqmrgpu_tpu.solver import Solver

from conftest import dense_from_bsr, make_random_problem


def _residual(a, x, b, got, lm, ln):
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(x.with_data(got), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    return np.max(np.abs(ad @ xd - bd)) / np.max(np.abs(bd))


@pytest.mark.parametrize("lm,ln,f", [(8, 8, 4), (4, 8, 4)])
def test_super_solver_c_matches_dense(rng, lm, ln, f, monkeypatch):
    monkeypatch.setenv("TFQ_SOLVER_SUPER", str(f))
    a, x, b = make_random_problem(rng, mb=24, lm=lm, ln=ln, ncols=4,
                                  x_fill=1.0, dtype=np.complex64)
    s = Solver(a, x, b, precision="c", engine="pairs", echo=0)
    assert s._sup is not None and s._sup.f_row == f
    assert s._pp_plan.lm == f * lm
    info = s.solve(tolerance=1e-4, max_iterations=400)
    assert info.return_status == int(Status.SUCCESS)
    dev = _residual(a, x, b, s.get_matrix("X"), lm, ln)
    assert dev < 2e-4, dev
    sd = Solver(a, x, b, precision="c", engine="dense")
    infod = sd.solve(tolerance=1e-4, max_iterations=400)
    assert abs(info.iterations_needed - infod.iterations_needed) <= 3


def test_super_solver_z_quality(rng, monkeypatch):
    """'z' at LM=8 through the merged Ozaki kernel (LM'=32) must reach
    f64-class residuals -- the FD-example configuration the reference
    itself ships (tfqmrgpu_generate_FD_example.cxx:916-923)."""
    monkeypatch.setenv("TFQ_SOLVER_SUPER", "4")
    lm = ln = 8
    a, x, b = make_random_problem(rng, mb=20, lm=lm, ln=ln, ncols=4,
                                  x_fill=1.0, dtype=np.complex128)
    s = Solver(a, x, b, precision="z", engine="pairs", echo=0)
    assert s._sup is not None
    info = s.solve(tolerance=1e-10, max_iterations=400)
    assert info.return_status == int(Status.SUCCESS)
    dev = _residual(a, x, b, s.get_matrix("X"), lm, ln)
    assert dev < 1e-9, dev
    # iteration parity with the (emulated-f64) dense engine
    sd = Solver(a, x, b, precision="z", engine="dense")
    infod = sd.solve(tolerance=1e-10, max_iterations=400)
    assert abs(info.iterations_needed - infod.iterations_needed) <= 3


def test_super_auto_routing_size_floor(rng, monkeypatch):
    """auto: a tiny 'z' LM=8 problem stays on its old engine (the size
    floor refuses the transform); forcing the factor engages it."""
    a, x, b = make_random_problem(rng, mb=10, lm=8, ln=8, ncols=4,
                                  x_fill=1.0, dtype=np.complex128)
    s = Solver(a, x, b, precision="z", engine="auto")
    assert s._sup is None
    monkeypatch.setenv("TFQ_SOLVER_SUPER", "4")
    s2 = Solver(a, x, b, precision="z", engine="pairs")
    assert s2._sup is not None


def test_super_solver_checkpoint_restart(rng, monkeypatch):
    """X0-restart (solve_checkpointed's engine) composes with the merged
    space: a warm restart from a partial iterate must converge."""
    monkeypatch.setenv("TFQ_SOLVER_SUPER", "4")
    lm = ln = 8
    a, x, b = make_random_problem(rng, mb=16, lm=lm, ln=ln, ncols=4,
                                  x_fill=1.0, dtype=np.complex64)
    s = Solver(a, x, b, precision="c", engine="pairs")
    assert s._sup is not None
    s.solve(tolerance=1e-30, max_iterations=12)       # partial
    s.set_matrix("X", s.get_matrix("X"))
    info = s.solve(tolerance=1e-4, max_iterations=400)
    assert info.return_status == int(Status.SUCCESS)
    dev = _residual(a, x, b, s.get_matrix("X"), lm, ln)
    assert dev < 2e-4, dev


def test_auto_z_midsize_lm_falls_back(rng, monkeypatch):
    """auto 'z' with 8 < LM < 16 (no superblock factor reaches the oz
    kernel's LM >= 16) must FALL BACK to the block-list engine like it
    always did -- not raise from the constructor (r5 review)."""
    a, x, b = make_random_problem(rng, mb=8, lm=12, ln=12, ncols=2,
                                  x_fill=1.0, dtype=np.complex128)
    s = Solver(a, x, b, precision="z", engine="auto")
    assert s.engine in ("xla", "dense")
    info = s.solve(tolerance=1e-9, max_iterations=300)
    assert info.return_status == int(Status.SUCCESS)
    # and LM <= 8 with the superblock explicitly disabled
    monkeypatch.setenv("TFQ_SOLVER_SUPER", "0")
    a2, x2, b2 = make_random_problem(rng, mb=8, lm=8, ln=8, ncols=2,
                                     x_fill=1.0, dtype=np.complex128)
    s2 = Solver(a2, x2, b2, precision="z", engine="auto")
    assert s2.engine in ("xla", "dense")


def test_z_resident_repack_solves(rng, monkeypatch):
    """The grouped-resident 'z' path (xi8 int8 panel held whole in the
    kernel window; r5): with the size floor lowered, a small problem
    must take the resident repack and solve to f64 quality."""
    monkeypatch.setenv("TFQ_Z_RESIDENT_MIN_MB", "0")
    lm = ln = 32
    a, x, b = make_random_problem(rng, mb=10, lm=lm, ln=ln, ncols=2,
                                  x_fill=1.0, dtype=np.complex128)
    s = Solver(a, x, b, precision="z", engine="pairs")
    assert s._pp_plan is not None and s._pp_plan.resident
    info = s.solve(tolerance=1e-10, max_iterations=300)
    assert info.return_status == int(Status.SUCCESS)
    dev = _residual(a, x, b, s.get_matrix("X"), lm, ln)
    assert dev < 1e-9, dev
