"""Weak-scaling harness on the simulated 8-device CPU mesh."""

from tfqmrgpu_tpu.parallel.scaling import run_point, weak_scaling_report


def test_weak_scaling_iteration_parity():
    p1 = run_point(1, 1, mb_per_shard=8, lm=4, ln=4, ncols=2,
                   tolerance=1e-6, max_iterations=200, repeats=1)
    p2 = run_point(2, 1, mb_per_shard=8, lm=4, ln=4, ncols=2,
                   tolerance=1e-6, max_iterations=200, repeats=1)
    assert p1.status == 0 and p2.status == 0
    # the 2-shard problem is larger, but the banded structure keeps the
    # iteration count in the same neighborhood; both must converge
    assert p2.mb == 2 * p1.mb
    assert p2.n_pairs > p1.n_pairs


def test_weak_scaling_report_shape():
    rep = weak_scaling_report(max_devices=2, mb_per_shard=8, lm=4, ln=4,
                              ncols=2, tolerance=1e-6, max_iterations=200,
                              repeats=1)
    assert [r["pr"] for r in rep] == [1, 2]
    assert rep[0]["efficiency"] == 1.0
    assert all(r["iterations"] > 0 for r in rep)
