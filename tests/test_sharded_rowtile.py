"""Mesh-sharded row-tile engine: parity with the single-device solve."""

import jax
import numpy as np
import pytest

from tfqmrgpu_tpu import Solver, create_plan
from tfqmrgpu_tpu.parallel import make_mesh
from tfqmrgpu_tpu.parallel.sharded_rowtile import ShardedRowTileSolver

from conftest import dense_from_bsr, make_random_problem

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 simulated devices")


@pytest.mark.parametrize("pr", [2, 4])
def test_sharded_rowtile_matches_single_device(rng, pr):
    lm = ln = 4
    a, x, b = make_random_problem(rng, mb=16, lm=lm, ln=ln, ncols=3,
                                  x_fill=1.0, dtype=np.complex64)
    tol = 1e-4
    s0 = Solver(a, x, b, precision="c", engine="pallas")
    i0 = s0.solve(tolerance=tol, max_iterations=300)

    plan = create_plan(a, x, b)
    plan.lm, plan.ln = lm, ln
    mesh = make_mesh(pr, 1)
    sp = ShardedRowTileSolver(plan, mesh, interpret=True, r_tile=2)
    got, info = sp.solve(a.data.real, a.data.imag,
                         b.data.real, b.data.imag,
                         tolerance=tol, max_iterations=300)
    assert info["return_status"] == 0
    assert abs(info["iterations"] - i0.iterations_needed) <= 1
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(x.with_data(got), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    assert np.max(np.abs(ad @ xd - bd)) / np.max(np.abs(bd)) < 50 * tol


def test_solve_sharded_one_call(rng):
    """The high-level mesh convenience picks an engine and solves."""
    from tfqmrgpu_tpu.parallel import solve_sharded

    lm = ln = 8
    a, x, b = make_random_problem(rng, mb=8, lm=lm, ln=ln, ncols=2,
                                  x_fill=1.0, dtype=np.complex64)
    got, info = solve_sharded(a, x, b, n_devices=4, tolerance=1e-4,
                              max_iterations=300)
    assert info["return_status"] == 0 and info["engine"] == "rowtile"
    ad = dense_from_bsr(a, lm, lm)
    xd = dense_from_bsr(x.with_data(got), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    assert np.max(np.abs(ad @ xd - bd)) / np.max(np.abs(bd)) < 5e-3
