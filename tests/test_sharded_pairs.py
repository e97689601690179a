"""Mesh-sharded pairs engine: parity with the single-device pairs solve,
across shard counts, t_step batching, and the halo-overlap tile split."""

import numpy as np
import pytest

from tfqmrgpu_tpu import Solver, create_plan
from tfqmrgpu_tpu.parallel import make_mesh
from tfqmrgpu_tpu.parallel.sharded_pairs import ShardedPairsSolver

from conftest import dense_from_bsr, make_random_problem


def _check(sp, a, x, b, tol, i0):
    got, info = sp.solve(a.data.real, a.data.imag,
                         b.data.real, b.data.imag,
                         tolerance=tol, max_iterations=300)
    assert info["return_status"] == 0
    assert abs(info["iterations"] - i0.iterations_needed) <= 1
    ad = dense_from_bsr(a, a.data.shape[1], a.data.shape[1])
    lm, ln = b.data.shape[1], b.data.shape[2]
    xd = dense_from_bsr(x.with_data(got), lm, ln)
    bd = dense_from_bsr(b, lm, ln)
    assert np.max(np.abs(ad @ xd - bd)) / np.max(np.abs(bd)) < 50 * tol


@pytest.mark.parametrize("pr", [2, 4])
def test_sharded_pairs_matches_single_device(rng, pr):
    lm = ln = 4
    a, x, b = make_random_problem(rng, mb=12, lm=lm, ln=ln, ncols=3,
                                  x_fill=1.0, dtype=np.complex64)
    tol = 1e-4
    s0 = Solver(a, x, b, precision="c", engine="pairs")
    i0 = s0.solve(tolerance=tol, max_iterations=300)

    plan = create_plan(a, x, b)
    plan.lm, plan.ln = lm, ln
    mesh = make_mesh(pr, 1)
    sp = ShardedPairsSolver(plan, mesh, interpret=True)
    _check(sp, a, x, b, tol, i0)


def test_sharded_pairs_t_step_batching(rng):
    """t_step > 1 groups tiles per grid step; results must be identical."""
    lm = ln = 4
    a, x, b = make_random_problem(rng, mb=16, lm=lm, ln=ln, ncols=4,
                                  x_fill=1.0, dtype=np.complex64)
    tol = 1e-4
    s0 = Solver(a, x, b, precision="c", engine="pairs")
    i0 = s0.solve(tolerance=tol, max_iterations=300)

    plan = create_plan(a, x, b)
    plan.lm, plan.ln = lm, ln
    mesh = make_mesh(2, 1)
    sp = ShardedPairsSolver(plan, mesh, interpret=True, t_step=4)
    assert sp.t_step >= 1    # may have been lowered by the window check
    _check(sp, a, x, b, tol, i0)


def test_sharded_pairs_bf16x6(rng):
    """The mesh engine's xsplit=3 window path (bf16x6: 3-way bf16 split X
    replicas, raw-f32 A panels split in-kernel) must converge like
    'highest' -- exact-f32 quality, not the bf16x4 ~1e-4 floor."""
    lm = ln = 16
    a, x, b = make_random_problem(rng, mb=8, lm=lm, ln=ln, ncols=2,
                                  x_fill=1.0, dtype=np.complex64)
    tol = 1e-6
    s0 = Solver(a, x, b, precision="c", engine="pairs")
    i0 = s0.solve(tolerance=tol, max_iterations=300)

    plan = create_plan(a, x, b)
    plan.lm, plan.ln = lm, ln
    mesh = make_mesh(2, 1)
    sp = ShardedPairsSolver(plan, mesh, interpret=True,
                            precision="bf16x6")
    _check(sp, a, x, b, tol, i0)


def test_sharded_pairs_overlap_split(rng, monkeypatch):
    """The local/remote tile split (halo overlap) must not change results;
    at least one shard must actually have local tiles for this pattern."""
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "1")  # keep the geometry local
    lm = ln = 4
    # banded A keeps pair windows narrow -> interior tiles are local
    from tfqmrgpu_tpu.bsr import Bsr

    mb, ncols = 96, 2    # big enough that each of the 2 shards
    # spans several X windows -> interior tiles qualify as local.
    # CLAMPED band (no wrap): a circulant band's seam tile spans the
    # whole pattern, forcing one giant window and zero local tiles
    rng2 = np.random.default_rng(7)
    rows_l, cols_l = [0], []
    for i in range(mb):
        cols_l.extend(c for c in (i - 1, i, i + 1) if 0 <= c < mb)
        rows_l.append(len(cols_l))
    rowptr_a = np.asarray(rows_l, np.int32)
    colind_a = np.asarray(cols_l, np.int32)
    a_data = (rng2.standard_normal((len(cols_l), lm, lm))
              + 1j * rng2.standard_normal((len(cols_l), lm, lm))
              ).astype(np.complex64)
    for i in range(mb):
        row = slice(rowptr_a[i], rowptr_a[i + 1])
        j = np.flatnonzero(colind_a[row] == i)[0] + rowptr_a[i]
        a_data[j] += 12.0 * lm * np.eye(lm)
    a = Bsr(mb, mb, rowptr_a, colind_a, a_data, name="A")
    rowptr_x = np.arange(mb + 1, dtype=np.int32) * ncols
    colind_x = np.tile(np.arange(ncols, dtype=np.int32), mb)
    x = Bsr(mb, ncols, rowptr_x, colind_x, name="X")
    rowptr_b = np.zeros(mb + 1, np.int32)
    rowptr_b[1: ncols + 1] = np.arange(1, ncols + 1)
    rowptr_b[ncols + 1:] = ncols
    colind_b = np.arange(ncols, dtype=np.int32)
    b_data = (rng2.standard_normal((ncols, lm, ln))
              + 1j * rng2.standard_normal((ncols, lm, ln))
              ).astype(np.complex64)
    b = Bsr(mb, ncols, rowptr_b, colind_b, b_data, name="B")

    tol = 1e-4
    s0 = Solver(a, x, b, precision="c", engine="pairs")
    i0 = s0.solve(tolerance=tol, max_iterations=300)

    plan = create_plan(a, x, b)
    plan.lm, plan.ln = lm, ln
    mesh = make_mesh(2, 1)
    sp = ShardedPairsSolver(plan, mesh, interpret=True, overlap=True)
    sp_no = ShardedPairsSolver(plan, mesh, interpret=True, overlap=False)
    assert not sp_no.overlap and sp_no.n_loc == 0
    _check(sp_no, a, x, b, tol, i0)
    if sp.overlap:
        assert sp.n_loc > 0 and sp.p + sp.q < sp.tiles_local
        _check(sp, a, x, b, tol, i0)
    else:
        pytest.skip("pattern yielded no local tiles at this shard count")


def test_sharded_pairs_grouped_matches_ungrouped(rng, monkeypatch):
    """Column grouping in the sharded engine: forced G=2 must reproduce
    the ungrouped sharded result on a column-sparse pattern."""
    lm = ln = 4
    a, x, b = make_random_problem(rng, mb=12, lm=lm, ln=ln, ncols=4,
                                  x_fill=0.6, dtype=np.complex64)
    tol = 1e-4
    plan = create_plan(a, x, b)
    plan.lm, plan.ln = lm, ln
    mesh = make_mesh(2, 1)
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "2")
    sp_g = ShardedPairsSolver(plan, mesh, interpret=True)
    assert sp_g.gp is not None and sp_g.gp.group_size == 2
    xg, ig = sp_g.solve(a.data.real.astype(np.float32),
                        a.data.imag.astype(np.float32),
                        b.data.real.astype(np.float32),
                        b.data.imag.astype(np.float32),
                        tolerance=tol, max_iterations=300)
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "1")
    sp_u = ShardedPairsSolver(plan, mesh, interpret=True)
    assert sp_u.gp is None
    xu, iu = sp_u.solve(a.data.real.astype(np.float32),
                        a.data.imag.astype(np.float32),
                        b.data.real.astype(np.float32),
                        b.data.imag.astype(np.float32),
                        tolerance=tol, max_iterations=300)
    assert abs(ig["iterations"] - iu["iterations"]) <= 2
    scale = np.abs(xu).max()
    assert np.abs(xg - xu).max() / scale < 1e-4


def test_sharded_pairs_resident_local_matches_windowed(rng, monkeypatch):
    """Per-shard resident local windows (the shard's whole X slice as one
    constant-index VMEM window) must be bit-identical to the windowed
    local path on a pattern with local tiles."""
    lm = ln = 4
    from tfqmrgpu_tpu.bsr import Bsr

    # CLAMPED (non-wrapping) band: a circulant band's wrap seam gives one
    # tile a full-pattern X span, which forces a single giant window and
    # leaves no shard-local tiles at all
    mb, ncols = 96, 2
    rng2 = np.random.default_rng(7)
    rows, cols = [0], []
    for i in range(mb):
        cs = [c for c in (i - 1, i, i + 1) if 0 <= c < mb]
        cols.extend(cs)
        rows.append(len(cols))
    rowptr_a = np.asarray(rows, np.int32)
    colind_a = np.asarray(cols, np.int32)
    a_data = (rng2.standard_normal((len(cols), lm, lm))
              + 1j * rng2.standard_normal((len(cols), lm, lm))
              ).astype(np.complex64)
    for i in range(mb):
        row = slice(rowptr_a[i], rowptr_a[i + 1])
        j = np.flatnonzero(colind_a[row] == i)[0] + rowptr_a[i]
        a_data[j] += 12.0 * lm * np.eye(lm)
    a = Bsr(mb, mb, rowptr_a, colind_a, a_data, name="A")
    rowptr_x = np.arange(mb + 1, dtype=np.int32) * ncols
    colind_x = np.tile(np.arange(ncols, dtype=np.int32), mb)
    x = Bsr(mb, ncols, rowptr_x, colind_x, name="X")
    rowptr_b = np.zeros(mb + 1, np.int32)
    rowptr_b[1: ncols + 1] = np.arange(1, ncols + 1)
    rowptr_b[ncols + 1:] = ncols
    colind_b = np.arange(ncols, dtype=np.int32)
    b_data = (rng2.standard_normal((ncols, lm, ln))
              + 1j * rng2.standard_normal((ncols, lm, ln))
              ).astype(np.complex64)
    b = Bsr(mb, ncols, rowptr_b, colind_b, b_data, name="B")

    plan = create_plan(a, x, b)
    plan.lm, plan.ln = lm, ln
    mesh = make_mesh(2, 1)
    got = {}
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "1")   # keep the geometry local
    # pin ONE windowed pack layout so the two runs differ only in the
    # local-call window mode (resident VMEM slice vs streamed windows)
    monkeypatch.setenv("TFQ_PAIRS_RESIDENT", "0")
    monkeypatch.setenv("TFQ_PAIRS_MAX_STRIDE", "1")
    for res in ("0", "1"):
        monkeypatch.setenv("TFQ_SHARDED_RESIDENT", res)
        sp = ShardedPairsSolver(plan, mesh, interpret=True, overlap=True)
        if not sp.overlap:
            pytest.skip("pattern yielded no local tiles")
        assert not sp.resident_plan
        assert sp.loc_resident == (res == "1")
        xr, info = sp.solve(a.data.real, a.data.imag,
                            b.data.real, b.data.imag,
                            tolerance=1e-4, max_iterations=40)
        got[res] = (xr, info["iterations"])
    assert got["0"][1] == got["1"][1]
    np.testing.assert_array_equal(got["0"][0], got["1"][0])


def _banded_problem(mb, ncols, lm, ln, seed=7):
    """CLAMPED tridiagonal band (no wrap) with full X and B = first
    ``ncols`` unit-ish rows -- the pattern every local/remote split test
    uses (interior tiles are shard-local)."""
    from tfqmrgpu_tpu.bsr import Bsr

    rng2 = np.random.default_rng(seed)
    rows, cols = [0], []
    for i in range(mb):
        cols.extend(c for c in (i - 1, i, i + 1) if 0 <= c < mb)
        rows.append(len(cols))
    rowptr_a = np.asarray(rows, np.int32)
    colind_a = np.asarray(cols, np.int32)
    a_data = (rng2.standard_normal((len(cols), lm, lm))
              + 1j * rng2.standard_normal((len(cols), lm, lm))
              ).astype(np.complex64)
    for i in range(mb):
        row = slice(rowptr_a[i], rowptr_a[i + 1])
        j = np.flatnonzero(colind_a[row] == i)[0] + rowptr_a[i]
        a_data[j] += 12.0 * lm * np.eye(lm)
    a = Bsr(mb, mb, rowptr_a, colind_a, a_data, name="A")
    rowptr_x = np.arange(mb + 1, dtype=np.int32) * ncols
    colind_x = np.tile(np.arange(ncols, dtype=np.int32), mb)
    x = Bsr(mb, ncols, rowptr_x, colind_x, name="X")
    rowptr_b = np.zeros(mb + 1, np.int32)
    rowptr_b[1: ncols + 1] = np.arange(1, ncols + 1)
    rowptr_b[ncols + 1:] = ncols
    colind_b = np.arange(ncols, dtype=np.int32)
    b_data = (rng2.standard_normal((ncols, lm, ln))
              + 1j * rng2.standard_normal((ncols, lm, ln))
              ).astype(np.complex64)
    b = Bsr(mb, ncols, rowptr_b, colind_b, b_data, name="B")
    return a, x, b


def test_sharded_pairs_resident_plan(rng, monkeypatch):
    """A RESIDENT-packed plan (single full-panel window, absolute copy
    sources) must shard: the local call holds the shard's X slice
    resident, the remote call the full gathered panel; results must match
    a windowed-pack sharded solve and the single-device solve."""
    lm = ln = 4
    a, x, b = _banded_problem(96, 2, lm, ln)
    tol = 1e-4
    s0 = Solver(a, x, b, precision="c", engine="pairs")
    i0 = s0.solve(tolerance=tol, max_iterations=300)

    plan = create_plan(a, x, b)
    plan.lm, plan.ln = lm, ln
    mesh = make_mesh(2, 1)
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "1")
    monkeypatch.setenv("TFQ_PAIRS_RESIDENT", "1")
    sp = ShardedPairsSolver(plan, mesh, interpret=True, overlap=True)
    assert sp.resident_plan, "pack did not choose the resident layout"
    if sp.overlap:
        assert sp.n_loc > 0 and sp.loc_resident
    _check(sp, a, x, b, tol, i0)

    # grouped + resident (the single-chip champion layout: G-lane cells,
    # resident window) over the mesh
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "2")
    sp_g = ShardedPairsSolver(plan, mesh, interpret=True, overlap=True)
    assert sp_g.gp is not None and sp_g.gp.group_size == 2
    assert sp_g.resident_plan
    _check(sp_g, a, x, b, tol, i0)


def test_sharded_pairs_neighbor_halo(rng, monkeypatch):
    """Neighbor-halo mode: on a resident-packed banded plan the remote
    call must read an extended local window assembled from two ppermute
    edge slabs (constant per-shard ICI bytes), and the solve must match
    both the all_gather path and the single-device iterate."""
    lm = ln = 4
    # ONE block column: the relabeled order is then row order, so shard
    # boundaries cut the band and boundary tiles really read neighbor
    # rows (with >= 2 columns the col-major relabeling makes shard
    # boundaries fall between independent columns -> nothing to halo)
    a, x, b = _banded_problem(96, 1, lm, ln)
    tol = 1e-4
    s0 = Solver(a, x, b, precision="c", engine="pairs")
    i0 = s0.solve(tolerance=tol, max_iterations=300)

    plan = create_plan(a, x, b)
    plan.lm, plan.ln = lm, ln
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "1")
    monkeypatch.setenv("TFQ_PAIRS_RESIDENT", "1")
    for pr in (2, 4):
        mesh = make_mesh(pr, 1)
        sp = ShardedPairsSolver(plan, mesh, interpret=True, overlap=True)
        if not sp.halo:
            pytest.skip(f"halo not engaged at pr={pr}")
        assert sp.resident_plan and (sp.h_lo or sp.h_hi)
        got_h, info_h = sp.solve(a.data.real, a.data.imag,
                                 b.data.real, b.data.imag,
                                 tolerance=tol, max_iterations=300)
        monkeypatch.setenv("TFQ_SHARDED_HALO", "0")
        sp_g = ShardedPairsSolver(plan, mesh, interpret=True, overlap=True)
        monkeypatch.delenv("TFQ_SHARDED_HALO")
        assert not sp_g.halo
        got_g, info_g = sp_g.solve(a.data.real, a.data.imag,
                                   b.data.real, b.data.imag,
                                   tolerance=tol, max_iterations=300)
        assert info_h["iterations"] == info_g["iterations"]
        np.testing.assert_array_equal(got_h, got_g)
        assert abs(info_h["iterations"] - i0.iterations_needed) <= 1


def test_sharded_pairs_tile_pipe(rng, monkeypatch):
    """TILE-pipelined resident kernels in the sharded engine (forced via
    env; auto only triggers on wide grouped lanes): local and remote
    calls run per-tile buffers with rebased per-tile programs, results
    must match the step-pipelined sharded solve exactly."""
    lm = ln = 4
    a, x, b = _banded_problem(96, 1, lm, ln)
    tol = 1e-4
    plan = create_plan(a, x, b)
    plan.lm, plan.ln = lm, ln
    mesh = make_mesh(2, 1)
    monkeypatch.setenv("TFQ_PAIRS_COLGROUP", "1")
    monkeypatch.setenv("TFQ_PAIRS_RESIDENT", "1")
    monkeypatch.setenv("TFQ_PAIRS_TILEPIPE", "1")
    sp_t = ShardedPairsSolver(plan, mesh, interpret=True, overlap=True)
    assert sp_t.resident_plan and sp_t.tile_pipe
    got_t, info_t = sp_t.solve(a.data.real, a.data.imag,
                               b.data.real, b.data.imag,
                               tolerance=tol, max_iterations=300)
    monkeypatch.setenv("TFQ_PAIRS_TILEPIPE", "0")
    sp_s = ShardedPairsSolver(plan, mesh, interpret=True, overlap=True)
    assert not sp_s.tile_pipe
    got_s, info_s = sp_s.solve(a.data.real, a.data.imag,
                               b.data.real, b.data.imag,
                               tolerance=tol, max_iterations=300)
    assert info_t["iterations"] == info_s["iterations"]
    np.testing.assert_array_equal(got_t, got_s)
