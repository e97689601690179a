"""Superblock row-merge (ops/superblock.py): the TPU-native fast path for
the reference's small block sizes (LM in {4,8}, allowed_block_sizes.h:4-18).

Exactness model under test: merged products restricted to live fine slots
equal the fine pair-list multiply bit-for-bit in f64 (zero fill-in, only
true fine products arise -- see the module docstring's argument)."""

import os

import numpy as np
import pytest

from tfqmrgpu_tpu.ops import pairpanel as pp
from tfqmrgpu_tpu.ops import superblock as sb

GOLDEN = "/root/reference/test/multiplication/plan_unordered.14-287-16"

def random_full_intersection(nrow, ncol, p_x=0.5, p_a=0.4, seed=7):
    """Random BSR-style (X pattern, A pattern) with the FULL-INTERSECTION
    pair list the reference's createPlan emits (tfqmrgpu.cu:183-230)."""
    rng = np.random.default_rng(seed)
    xp = rng.random((nrow, ncol)) < p_x
    for r in range(nrow):
        if not xp[r].any():
            xp[r, rng.integers(ncol)] = True
    ap = rng.random((nrow, nrow)) < p_a
    np.fill_diagonal(ap, True)
    xr, xc = np.nonzero(xp)
    nnzb = len(xr)
    bid = -np.ones((nrow, ncol), np.int64)
    bid[xr, xc] = np.arange(nnzb)
    ar, ac = np.nonzero(ap)
    pa, px, py = [], [], []
    for a_id, (i, k) in enumerate(zip(ar, ac)):
        for c in range(ncol):
            if xp[i, c] and xp[k, c]:
                py.append(bid[i, c])
                px.append(bid[k, c])
                pa.append(a_id)
    return (np.asarray(pa), np.asarray(px), np.asarray(py), nnzb, len(ar),
            xr, xc)


def ref_multiply(pa, px, py, a, x, nnzb):
    y = np.zeros((nnzb, a.shape[1], x.shape[2]), np.result_type(a, x))
    for t in range(len(pa)):
        y[py[t]] += a[pa[t]] @ x[px[t]]
    return y


@pytest.mark.parametrize("f_row", [2, 4])
def test_rowmerge_exact_random(f_row):
    lm, ln = 8, 8
    rng = np.random.default_rng(100 + f_row)
    for trial in range(3):
        nrow, ncol = int(rng.integers(6, 24)), int(rng.integers(2, 6))
        pa, px, py, nnzb, nnzba, _, _ = random_full_intersection(
            nrow, ncol, seed=trial)
        a = rng.standard_normal((nnzba, lm, lm))
        x = rng.standard_normal((nnzb, lm, ln))
        y_ref = ref_multiply(pa, px, py, a, x, nnzb)
        rm = sb.pack_rowmerge(pa, px, py, nnzb, lm, ln, f_row)
        a2 = sb.merge_a_blocks(rm, a)
        x2 = sb.merge_xy_blocks(rm, x)
        y2 = ref_multiply(rm.pair_a2, rm.pair_x2, rm.pair_y2, a2, x2,
                          rm.n_cells)
        got = sb.unmerge_xy_blocks(rm, y2)
        np.testing.assert_allclose(got, y_ref, rtol=0, atol=1e-12)
        # dead X slots are zero (required: a nonzero dead slot would
        # pollute live Y slots through live fine A blocks)
        mask = sb.merged_x_mask(rm)
        np.testing.assert_array_equal(x2 * mask, x2)


def test_rowmerge_composes_with_colgroup():
    """pack_grouped (lane widening) then pack_rowmerge: the (8,8) ->
    (32,32) route the bench takes for the smallest reference sizes."""
    lm, ln = 8, 8
    rng = np.random.default_rng(11)
    pa, px, py, nnzb, nnzba, _, _ = random_full_intersection(20, 6, p_x=0.6)
    a = rng.standard_normal((nnzba, lm, lm))
    x = rng.standard_normal((nnzb, lm, ln))
    y_ref = ref_multiply(pa, px, py, a, x, nnzb)
    row_g, col_g = pp.recover_geometry(pa, px, py, nnzb)
    gp = pp.pack_grouped(pa, px, py, nnzb, ln, 4,
                         row_of=row_g, col_of=col_g)
    rm = sb.pack_rowmerge(gp.pair_a2, gp.pair_x2, gp.pair_y2, gp.nnzb2,
                          lm, gp.ln2, 4, row_of=gp.row_of2,
                          col_of=gp.col_of2, verify=False)
    a2 = sb.merge_a_blocks(rm, a)
    xg = np.asarray(pp.grouped_blocks(gp, x))
    x2 = sb.merge_xy_blocks(rm, xg)
    y2 = ref_multiply(rm.pair_a2, rm.pair_x2, rm.pair_y2, a2, x2,
                      rm.n_cells)
    got = pp.ungroup_blocks(gp, sb.unmerge_xy_blocks(rm, y2))
    np.testing.assert_allclose(got, y_ref, rtol=0, atol=1e-12)


def test_rowmerge_rejects_partial_pair_list():
    """Dropping a pair from a full intersection must be detected -- a
    merged product would otherwise add the dropped term to a live slot."""
    pa, px, py, nnzb, _, xr, xc = random_full_intersection(12, 4)
    # drop a pair whose A block has other pairs (so the used-A column-set
    # check must see the hole); pin the TRUE geometry (a bare re-recovery
    # could legitimize the reduced list by splitting fragments)
    counts = np.bincount(pa)
    t = int(np.flatnonzero(counts[pa] >= 2)[0])
    keep = np.ones(len(pa), bool)
    keep[t] = False
    with pytest.raises(ValueError, match="full pattern intersection"):
        sb.pack_rowmerge(pa[keep], px[keep], py[keep], nnzb, 8, 8, 2,
                         row_of=xr, col_of=xc)


def test_rowmerge_rejects_duplicate_triples():
    pa, px, py, nnzb, _, _, _ = random_full_intersection(8, 3)
    pa2 = np.concatenate([pa, pa[:1]])
    px2 = np.concatenate([px, px[:1]])
    py2 = np.concatenate([py, py[:1]])
    with pytest.raises(ValueError, match="duplicate"):
        sb.pack_rowmerge(pa2, px2, py2, nnzb, 8, 8, 2)


def test_merge_blocks_jax_parity():
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    pa, px, py, nnzb, nnzba, _, _ = random_full_intersection(10, 3)
    a = rng.standard_normal((nnzba, 8, 8)).astype(np.float32)
    x = rng.standard_normal((nnzb, 8, 8)).astype(np.float32)
    rm = sb.pack_rowmerge(pa, px, py, nnzb, 8, 8, 2)
    np.testing.assert_array_equal(np.asarray(sb.merge_a_blocks(rm,
                                                               jnp.asarray(a))),
                                  sb.merge_a_blocks(rm, a))
    np.testing.assert_array_equal(np.asarray(
        sb.merge_xy_blocks(rm, jnp.asarray(x))), sb.merge_xy_blocks(rm, x))


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="reference golden plan not present")
def test_rowmerge_golden_plan_quality():
    """The merged golden plan must stay within the measured MAC-inflation
    envelope (the quality the small-block speedup projection rests on)."""
    from tfqmrgpu_tpu.io.planfile import read_plan_file

    pf = read_plan_file(GOLDEN)
    pa = pf.pairs[:, 0].astype(np.int64)
    px = pf.pairs[:, 1].astype(np.int64)
    py = np.repeat(pf.y_order, np.diff(pf.starts.astype(np.int64)))
    rm = sb.pack_rowmerge(pa, px, py, pf.nnzb_y, 8, 32, 4)
    assert rm.lm2 == 32
    assert rm.mac_inflation < 6.5       # measured 5.4x (greedy w=64)
    # every fine pair is covered by a merged triple
    a_pos = {int(v): i for i, v in enumerate(rm.a_src)}
    tri = set(zip(rm.pair_a2.tolist(), rm.pair_y2.tolist(),
                  rm.pair_x2.tolist()))
    idx = np.random.default_rng(17).integers(0, len(pa), 200)
    for t in idx:
        key = (rm.a_cell[a_pos[int(pa[t])]], rm.cell_of[py[t]],
               rm.cell_of[px[t]])
        assert (int(key[0]), int(key[1]), int(key[2])) in tri


def test_auto_f_row_picks_and_degrades():
    pa, px, py, nnzb, _, _, _ = random_full_intersection(24, 4)
    f, packs = sb.auto_f_row(pa, px, py, nnzb, 8, 32)
    assert f in (1, 2, 4)
    assert all(rm.f_row == k for k, rm in packs.items())


def test_rowmerge_rejects_duplicate_a_endpoints():
    """Two distinct A ids sharing one (target row, operand row) endpoint
    pair map to the SAME merged slot: merge_a_blocks would overwrite one
    while the fine multiply sums both -- pack_rowmerge must refuse
    (advisor r4)."""
    pa = np.array([0, 1, 3, 2])          # a1 and a3 both span (row0, row1)
    py = np.array([0, 0, 0, 1])
    px = np.array([0, 1, 1, 1])
    row_of = np.array([0, 1])
    col_of = np.array([0, 0])
    with pytest.raises(ValueError, match="duplicate A blocks"):
        sb.pack_rowmerge(pa, px, py, 2, 4, 8, 2,
                         row_of=row_of, col_of=col_of)
