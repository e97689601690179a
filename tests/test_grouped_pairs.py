"""Tests for the column-grouped pair transform (ops/pairpanel.pack_grouped):
grouping semantics, full-intersection validation, and grouped-multiply
correctness vs the NumPy pair walk (reference semantics,
bench_tfqmrgpu.cu:353-419) through the unchanged pair-panel kernel."""

import numpy as np
import pytest

from tfqmrgpu_tpu.ops import pairpanel as pp


def _sparse_intersection_plan(rng, mb=14, ncols=6, fill=0.55,
                              stencil=(0, 1, 2, -1)):
    """Banded A over a PARTIALLY occupied (row, col) X grid; pair list is
    the full (Y exists, A exists, X exists) intersection -- the invariant
    createPlan guarantees (tfqmrgpu.cu:183-230)."""
    rows_a, cols_a = [0], []
    for i in range(mb):
        cs = sorted({(i + s) % mb for s in stencil})
        cols_a.extend(cs)
        rows_a.append(len(cols_a))
    rowptr_a, colind_a = np.array(rows_a), np.array(cols_a)
    occ = rng.random((mb, ncols)) < fill
    occ[np.arange(mb) % ncols == 0, 0] = True     # keep every col non-empty
    for c in range(ncols):
        occ[rng.integers(mb), c] = True
    for r in range(mb):
        if not occ[r].any():
            occ[r, rng.integers(ncols)] = True
    xr, xc = np.nonzero(occ)
    o = np.lexsort((xc, xr))                       # CSR (row-major) ids
    xr, xc = xr[o], xc[o]
    xid = {(int(r), int(c)): i for i, (r, c) in enumerate(zip(xr, xc))}
    pa, px, py = [], [], []
    for iy, (r, c) in enumerate(zip(xr, xc)):
        for ia in range(rowptr_a[r], rowptr_a[r + 1]):
            k = int(colind_a[ia])
            if (k, int(c)) in xid:
                pa.append(ia)
                px.append(xid[(k, int(c))])
                py.append(iy)
    pa, px, py = map(np.asarray, (pa, px, py))
    sh = rng.permutation(len(pa))
    return pa[sh], px[sh], py[sh], len(colind_a), len(xr), xr, xc


def _np_pairwalk(pa, px, py, a, x, ny):
    y = np.zeros((ny, a.shape[1], x.shape[2]), complex)
    for i in range(len(pa)):
        y[py[i]] += a[pa[i]] @ x[px[i]]
    return y


@pytest.mark.parametrize("group_size", [2, 3])
def test_grouped_multiply_matches_pairwalk(rng, group_size):
    lm = ln = 4
    pa, px, py, na, nx, xr, xc = _sparse_intersection_plan(rng)
    gp = pp.pack_grouped(pa, px, py, nx, ln, group_size)
    assert gp.nnzb2 <= nx                    # grouping merges cells
    assert gp.ln2 == group_size * ln
    assert len(gp.pair_a2) < len(pa)         # A dedup across grouped cols

    a = rng.standard_normal((na, lm, lm)) + 1j * rng.standard_normal(
        (na, lm, lm))
    x = rng.standard_normal((nx, lm, ln)) + 1j * rng.standard_normal(
        (nx, lm, ln))
    want = _np_pairwalk(pa, px, py, a, x, nx)

    plan = pp.pack_pair_plan(gp.pair_a2, gp.pair_x2, gp.pair_y2,
                             gp.nnzb2, gp.nnzb2, lm, gp.ln2, r_tile=1,
                             row_of=gp.row_of2, col_of=gp.col_of2)
    import jax.numpy as jnp

    x2 = pp.grouped_blocks(gp, x.real.astype(np.float32)), \
        pp.grouped_blocks(gp, x.imag.astype(np.float32))
    a_panels = jnp.asarray(pp.build_a_panels(
        plan, a.real.astype(np.float32), a.imag.astype(np.float32)))
    mult = pp.make_pairpanel_multiply(plan, a_panels, precision="highest",
                                      interpret=True)
    xf = jnp.asarray(pp.permute_x(plan, np.asarray(x2[0]), np.asarray(x2[1])))
    yre2, yim2 = pp.unpermute_y(plan, np.asarray(mult(xf)))
    got = (pp.ungroup_blocks(gp, yre2)
           + 1j * pp.ungroup_blocks(gp, yim2))
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-5


def test_grouped_roundtrip(rng):
    lm, ln = 4, 4
    pa, px, py, na, nx, xr, xc = _sparse_intersection_plan(rng)
    gp = pp.pack_grouped(pa, px, py, nx, ln, 2)
    x = rng.standard_normal((nx, lm, ln)).astype(np.float32)
    cells = pp.grouped_blocks(gp, x)
    assert cells.shape == (gp.nnzb2, lm, gp.ln2)
    back = pp.ungroup_blocks(gp, np.asarray(cells))
    np.testing.assert_array_equal(back, x)
    # absent lanes are exactly zero
    lanes = np.asarray(cells).reshape(
        gp.nnzb2, lm, gp.group_size, ln).transpose(0, 2, 1, 3)
    present = np.zeros((gp.nnzb2, gp.group_size), bool)
    present[gp.cell_of_blk, gp.lane_of_blk] = True
    assert np.all(lanes[~present] == 0)


def test_grouped_rejects_truncated_pair_list(rng):
    """Dropping a pair WITHOUT changing the recovered geometry breaks the
    full-intersection invariant (a drop that re-splits the geometry can
    still be a valid finer-grained intersection -- that case must pass)."""
    pa, px, py, na, nx, xr, xc = _sparse_intersection_plan(rng)
    row0, col0 = pp.recover_geometry(pa, px, py, nx)
    for drop in range(len(pa)):
        keep = np.arange(len(pa)) != drop
        row1, col1 = pp.recover_geometry(pa[keep], px[keep], py[keep], nx)
        if row1.max() == row0.max() and col1.max() == col0.max():
            with pytest.raises(ValueError,
                               match="full pattern intersection"):
                pp.pack_grouped(pa[keep], px[keep], py[keep], nx, 4, 2)
            return
    pytest.skip("every pair was geometry-load-bearing")


def test_grouped_rejects_duplicate_pairs(rng):
    pa, px, py, na, nx, xr, xc = _sparse_intersection_plan(rng)
    pa2 = np.concatenate([pa, pa[:1]])
    px2 = np.concatenate([px, px[:1]])
    py2 = np.concatenate([py, py[:1]])
    with pytest.raises(ValueError, match="duplicate"):
        pp.pack_grouped(pa2, px2, py2, nx, 4, 2)


def test_auto_group_size_golden_like(rng):
    """On a column-sparse plan the model should prefer grouping; on a
    single-column plan it must return 1."""
    pa, px, py, na, nx, xr, xc = _sparse_intersection_plan(
        rng, mb=20, ncols=8, fill=0.3)
    best, ests = pp.auto_group_size(pa, px, py, nx, 32, 32)
    assert 1 in ests and best in ests
    assert ests[2]["a_ms"] < ests[1]["a_ms"]          # dedup helps A bytes
    # degenerate: one column -> no grouping possible
    pa1, px1, py1, na1, nx1, _, _ = _sparse_intersection_plan(
        rng, mb=10, ncols=1, fill=1.0)
    best1, ests1 = pp.auto_group_size(pa1, px1, py1, nx1, 32, 32)
    assert best1 == 1


# ------------------------------------------------- solver integration

def test_solver_pairs_grouped_matches_ungrouped(rng, monkeypatch):
    """On a COLUMN-SPARSE X pattern (absent lanes exercised) the grouped
    pairs engine must reproduce the ungrouped engine's iterate -- same
    recurrence, same per-RHS status, same solution blocks."""
    import tfqmrgpu_tpu as tq
    from conftest import make_random_problem

    lm, ln = 4, 4
    a, x, b = make_random_problem(rng, mb=10, lm=lm, ln=ln, ncols=4,
                                  x_fill=0.6)
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "2")
    xg, infog = tq.solve(a, x, b, precision="c", engine="pairs",
                         tolerance=1e-4, max_iterations=400)
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "1")
    xu, infou = tq.solve(a, x, b, precision="c", engine="pairs",
                         tolerance=1e-4, max_iterations=400)
    assert abs(infog.iterations_needed - infou.iterations_needed) <= 2
    np.testing.assert_array_equal(np.asarray(infog.rhs_status),
                                  np.asarray(infou.rhs_status))
    scale = np.abs(xu.data).max()
    assert np.abs(xg.data - xu.data).max() / scale < 1e-4


def test_solver_pairs_grouped_matches_dense(rng, monkeypatch):
    """With a FULL X pattern the grouped solve must reach the dense
    solution (the iterate can represent it exactly)."""
    import tfqmrgpu_tpu as tq
    from conftest import make_random_problem, dense_from_bsr

    lm, ln = 4, 4
    a, x, b = make_random_problem(rng, mb=10, lm=lm, ln=ln, ncols=4,
                                  x_fill=1.0)
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "2")
    xg, infog = tq.solve(a, x, b, precision="c", engine="pairs",
                         tolerance=1e-4, max_iterations=400)
    a_d = dense_from_bsr(a, lm, lm)
    b_d = dense_from_bsr(b, lm, ln)
    x_d = dense_from_bsr(xg, lm, ln)
    res = np.abs(a_d @ x_d - b_d).max() / np.abs(b_d).max()
    assert res < 2e-3, res


def test_solver_grouped_auto_falls_back(rng, monkeypatch):
    """ncols=1 problems cannot group; auto must run ungrouped."""
    import tfqmrgpu_tpu as tq
    from tfqmrgpu_tpu.solver import Solver
    from conftest import make_random_problem

    a, x, b = make_random_problem(rng, mb=8, lm=4, ln=4, ncols=1,
                                  x_fill=1.0)
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "0")
    s = Solver(a, x, b, precision="c", engine="pairs")
    assert s._gp is None
    info = s.solve(tolerance=1e-4, max_iterations=300)
    assert info.residuum_reached <= 1e-4


def test_grouped_bucketed_multiply(rng):
    """ku-bucketed kernel over a grouped plan (the bench's b>1 path)."""
    import jax.numpy as jnp

    lm = ln = 4
    pa, px, py, na, nx, xr, xc = _sparse_intersection_plan(rng)
    gp = pp.pack_grouped(pa, px, py, nx, ln, 2)
    plan = pp.pack_pair_plan(gp.pair_a2, gp.pair_x2, gp.pair_y2,
                             gp.nnzb2, gp.nnzb2, lm, gp.ln2, r_tile=1,
                             row_of=gp.row_of2, col_of=gp.col_of2)
    bplan = pp.bucketize(plan, n_buckets=2)
    a = rng.standard_normal((na, lm, lm)) + 1j * rng.standard_normal(
        (na, lm, lm))
    x = rng.standard_normal((nx, lm, ln)) + 1j * rng.standard_normal(
        (nx, lm, ln))
    want = _np_pairwalk(pa, px, py, a, x, nx)
    panels = pp.build_a_panels_bucketed_device(
        bplan, jnp.asarray(a.real.astype(np.float32)),
        jnp.asarray(a.imag.astype(np.float32)))
    mult = pp.BucketedMultiply(bplan, panels, precision="highest",
                               interpret=True)
    x2r = np.asarray(pp.grouped_blocks(gp, x.real.astype(np.float32)))
    x2i = np.asarray(pp.grouped_blocks(gp, x.imag.astype(np.float32)))
    xf = jnp.asarray(pp.permute_x(plan, x2r, x2i))
    yh = np.asarray(mult(xf))
    yre2, yim2 = pp.unpermute_y(plan, yh)
    got = (pp.ungroup_blocks(gp, yre2) + 1j * pp.ungroup_blocks(gp, yim2))
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-5


def test_refine_groups_cuts_dedup_cost(rng):
    """The swap refinement must (a) preserve the partition -- same columns,
    same per-group sizes -- and (b) never increase the TRUE grouped cost
    (deduped pair count = A blocks streamed per multiply)."""
    pa, px, py, na, nx, xr, xc = _sparse_intersection_plan(
        rng, mb=20, ncols=8, fill=0.4)
    row, col = pp.recover_geometry(pa, px, py, nx)
    ncol = int(col.max()) + 1
    au, inv = np.unique(pa, return_inverse=True)
    pmb = np.zeros((au.shape[0], ncol), bool)
    pmb[inv, col[py]] = True
    rbool = np.zeros((int(row.max()) + 1, ncol), bool)
    rbool[row, col] = True

    def dedup_cost(groups):
        cost = 0
        for g in groups:
            cost += int(pmb[:, g].any(axis=1).sum())
        return cost

    greedy = pp._group_columns(rbool, 3)
    refined = pp._refine_groups(greedy, pmb)
    assert sorted(len(g) for g in greedy) == sorted(len(g) for g in refined)
    assert sorted(c for g in refined for c in g) == list(range(ncol))
    assert dedup_cost(refined) <= dedup_cost(greedy)
    # the exact set-partition DP can only match or beat the hill-climb
    if ncol % 4 == 0:
        opt = pp._optimal_groups(pmb, 4)
        ref4 = pp._refine_groups(pp._group_columns(rbool, 4), pmb)
        assert opt is not None
        assert sorted(c for g in opt for c in g) == list(range(ncol))
        assert all(len(g) == 4 for g in opt)
        assert dedup_cost(opt) <= dedup_cost(ref4)
    # default pack path uses the refined groups and still validates
    gp = pp.pack_grouped(pa, px, py, nx, 4, 3)
    assert len(gp.pair_a2) <= dedup_cost(greedy)
