"""Mixed-precision ('m') mode: c iterations + z refinement."""

import numpy as np

import tfqmrgpu_tpu as tq
from tfqmrgpu_tpu.errors import Status

from conftest import dense_from_bsr, make_random_problem


def test_bsrsv_m_reaches_f64_residual(rng):
    lm = ln = 4
    a, x, b = make_random_problem(rng, mb=10, lm=lm, ln=ln, ncols=3,
                                  x_fill=1.0)
    xs, info = tq.bsrsv_m(a, x, b, tolerance=1e-10, max_iterations=500)
    assert info.return_status == int(Status.SUCCESS)
    assert info.residuum_reached <= 1e-10
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(xs, lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    assert np.max(np.abs(ad @ xd - bd)) / np.max(np.abs(bd)) < 1e-8


def test_mixed_cheaper_z_phase(rng):
    """The z-refinement after the c phase needs far fewer f64 iterations
    than a from-scratch z solve."""
    lm = ln = 4
    a, x, b = make_random_problem(rng, mb=10, lm=lm, ln=ln, ncols=2,
                                  x_fill=1.0)
    _, info_z = tq.bsrsv_z(a, x, b, tolerance=1e-10, max_iterations=500)
    sc = tq.Solver(a, x, b, precision="c")
    ic = sc.solve(tolerance=1e-5, max_iterations=500)
    sz = tq.Solver(a, x, b, precision="z")
    sz.set_matrix("X", sc.get_matrix("X").astype(np.complex128))
    iz = sz.solve(tolerance=1e-10, max_iterations=500)
    assert iz.iterations_needed < info_z.iterations_needed
