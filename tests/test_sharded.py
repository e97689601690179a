"""Multi-device solver tests on the simulated 8-device CPU mesh: the sharded
solve must reproduce the single-device solve (same probe/stopping semantics,
same solution)."""

import jax
import numpy as np
import pytest

import tfqmrgpu_tpu as tq
from tfqmrgpu_tpu import core
from tfqmrgpu_tpu.ops.blocksparse import BlockSparseAction
from tfqmrgpu_tpu.parallel import make_mesh, partition_plan
from tfqmrgpu_tpu.parallel.sharded import sharded_solve
from tfqmrgpu_tpu.plan import create_plan

from conftest import make_random_problem

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices")


def _single_device_reference(plan, a, b, lm, ln, tol, maxiter):
    import jax.numpy as jnp

    action = BlockSparseAction.from_plan(
        plan, a.data.real.copy(), a.data.imag.copy(), ln=ln)
    v3 = core.make_shadow_vector(plan.nnzb_x, lm, ln)
    v2 = (jnp.asarray(b.data.real.copy()), jnp.asarray(b.data.imag.copy()))
    colindx = jnp.asarray(plan.colindx.astype(np.int32))
    subset = jnp.asarray(plan.subset.astype(np.int32))
    return core.solve_core(action, v2, v3, colindx, subset, tol, maxiter,
                           ncols=plan.ncols, lm=lm, ln=ln)


@pytest.mark.parametrize("pr,pc", [(2, 1), (4, 1), (2, 2), (4, 2), (8, 1)])
def test_sharded_matches_single(rng, pr, pc):
    lm, ln = 4, 8
    a, x, b = make_random_problem(rng, mb=24, lm=lm, ln=ln, ncols=6,
                                  x_fill=0.6)
    plan = create_plan(a, x, b)
    plan.lm, plan.ln = lm, ln
    tol, maxiter = 1e-8, 500

    ref = _single_device_reference(plan, a, b, lm, ln, tol, maxiter)
    part = partition_plan(plan, pr, pc)
    mesh = make_mesh(pr, pc)
    x_re, x_im, info = sharded_solve(
        plan, part, mesh, a.data.real.copy(), a.data.imag.copy(),
        b.data.real.copy(), b.data.imag.copy(),
        tolerance=tol, max_iterations=maxiter)

    assert info["return_status"] == int(ref.return_status)
    # identical algorithm & probe schedule -> identical iteration count
    assert info["iterations"] == int(ref.iterations)
    ref_x = np.asarray(ref.x[0]) + 1j * np.asarray(ref.x[1])
    got_x = x_re + 1j * x_im
    np.testing.assert_allclose(got_x, ref_x, atol=1e-10)
    assert abs(info["residuum"] - float(ref.residuum)) < 1e-12


def test_sharded_trivial_rhs(rng):
    lm, ln = 4, 4
    a, x, b = make_random_problem(rng, mb=16, lm=lm, ln=ln, ncols=4,
                                  x_fill=0.8)
    plan = create_plan(a, x, b)
    plan.lm, plan.ln = lm, ln
    part = partition_plan(plan, 2, 2)
    mesh = make_mesh(2, 2)
    x_re, x_im, info = sharded_solve(
        plan, part, mesh, a.data.real.copy(), a.data.imag.copy(),
        np.zeros((plan.nnzb_b, lm, ln)), np.zeros((plan.nnzb_b, lm, ln)),
        tolerance=1e-8, max_iterations=500, rhs_trivial=True)
    assert info["return_status"] == 0
    assert info["residuum"] <= 1e-8
