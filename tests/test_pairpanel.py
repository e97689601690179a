"""Tests for the pair-plan panel SpMM engine (ops/pairpanel.py):
geometry recovery from bare pair lists, relabeling, window assignment, and
multiply correctness vs a NumPy pair walk (the reference semantics,
bench_tfqmrgpu.cu:353-419)."""

import numpy as np
import pytest

from tfqmrgpu_tpu.ops import pairpanel as pp


def _bsr_pair_plan(rng, mb=24, ncols=3, lm=8, ln=8, stencil=(0, 1, 2)):
    """Build a banded BSR problem and emit its pair list (shuffled)."""
    rows_a, cols_a = [0], []
    for i in range(mb):
        cs = sorted({(i + s) % mb for s in stencil})
        cols_a.extend(cs)
        rows_a.append(len(cols_a))
    rowptr_a = np.array(rows_a)
    colind_a = np.array(cols_a)
    # X pattern: full mb x ncols
    x_row = np.repeat(np.arange(mb), ncols)
    x_col = np.tile(np.arange(ncols), mb)
    nx = mb * ncols
    xid = {(int(r), int(c)): i for i, (r, c) in enumerate(zip(x_row, x_col))}
    pa, px, py = [], [], []
    for iy in range(nx):
        r, c = int(x_row[iy]), int(x_col[iy])
        for ia in range(rowptr_a[r], rowptr_a[r + 1]):
            k = int(colind_a[ia])
            if (k, c) in xid:
                pa.append(ia)
                px.append(xid[(k, c)])
                py.append(iy)
    pa, px, py = map(np.array, (pa, px, py))
    sh = rng.permutation(len(pa))
    return pa[sh], px[sh], py[sh], len(colind_a), nx


def _np_pairwalk(pa, px, py, a, x, ny):
    y = np.zeros((ny,) + (a.shape[1], x.shape[2]), complex)
    for i in range(len(pa)):
        y[py[i]] += a[pa[i]] @ x[px[i]]
    return y


@pytest.mark.parametrize("r_tile", [1, 2, 4])
def test_pairpanel_multiply_matches_pairwalk(rng, r_tile):
    lm = ln = 4
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=10, ncols=2, lm=lm, ln=ln)
    plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=r_tile)
    assert plan.inflation < 4.0

    a = rng.standard_normal((na, lm, lm)) + 1j * rng.standard_normal(
        (na, lm, lm))
    x = rng.standard_normal((nx, lm, ln)) + 1j * rng.standard_normal(
        (nx, lm, ln))
    want = _np_pairwalk(pa, px, py, a, x, nx)

    import jax.numpy as jnp

    panels = jnp.asarray(pp.build_a_panels(
        plan, a.real.astype(np.float32), a.imag.astype(np.float32)))
    mult = pp.make_pairpanel_multiply(plan, panels, precision="highest",
                                      interpret=True)
    xf = jnp.asarray(pp.permute_x(plan, x.real.astype(np.float32),
                                  x.imag.astype(np.float32)))
    yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
    got = yre + 1j * yim
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-5


@pytest.mark.parametrize("t_step,r_tile", [(2, 1), (4, 1), (3, 2), (8, 1)])
def test_pairpanel_multiply_t_step(rng, t_step, r_tile):
    """Multi-tile grid steps produce bit-identical semantics to t_step=1."""
    lm = ln = 4
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=14, ncols=2, lm=lm, ln=ln)
    plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=r_tile)

    a = rng.standard_normal((na, lm, lm)) + 1j * rng.standard_normal(
        (na, lm, lm))
    x = rng.standard_normal((nx, lm, ln)) + 1j * rng.standard_normal(
        (nx, lm, ln))
    want = _np_pairwalk(pa, px, py, a, x, nx)

    import jax.numpy as jnp

    panels = jnp.asarray(pp.build_a_panels(
        plan, a.real.astype(np.float32), a.imag.astype(np.float32)))
    mult = pp.make_pairpanel_multiply(plan, panels, precision="highest",
                                      interpret=True, t_step=t_step)
    xf = jnp.asarray(pp.permute_x(plan, x.real.astype(np.float32),
                                  x.imag.astype(np.float32)))
    yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
    got = yre + 1j * yim
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-5


def test_geometry_recovery_counts(rng):
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=16, ncols=4)
    frag, col = pp.recover_geometry(pa, px, py, nx)
    assert col.max() + 1 == 4            # the 4 X columns
    assert frag.max() + 1 <= 16          # fragments refine the 16 rows


def test_known_geometry_shortcut(rng):
    lm = ln = 4
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=12, ncols=2, lm=lm, ln=ln)
    x_row = np.repeat(np.arange(12), 2)
    x_col = np.tile(np.arange(2), 12)
    plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=2,
                             row_of=x_row, col_of=x_col)
    assert plan.ntiles == (nx + 1) // 2


def test_span_budget_raises():
    rng = np.random.default_rng(3)
    n = 256
    pa = rng.integers(0, 300, 1500)
    px = rng.integers(0, n, 1500)
    py = rng.integers(0, n, 1500)
    with pytest.raises(ValueError):
        pp.pack_pair_plan(pa, px, py, n, n, 8, 8, r_tile=2, max_window=32)


def test_bucketed_multiply_matches_pairwalk(rng):
    lm = ln = 8
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=16, ncols=3, lm=lm, ln=ln,
                                        stencil=(0, 1, 2, 5))
    plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=2)
    bp = pp.bucketize(plan, n_buckets=3)
    assert sum(t.size for t in bp.tile_ids) == plan.ntiles

    a = rng.standard_normal((na, lm, lm)) + 1j * rng.standard_normal(
        (na, lm, lm))
    x = rng.standard_normal((nx, lm, ln)) + 1j * rng.standard_normal(
        (nx, lm, ln))
    want = _np_pairwalk(pa, px, py, a, x, nx)

    import jax.numpy as jnp

    panels = build_bucket_panels_host(bp, a.real.astype(np.float32),
                                      a.imag.astype(np.float32))
    mult = pp.BucketedMultiply(bp, panels, precision="highest",
                               interpret=True)
    xf = jnp.asarray(pp.permute_x(plan, x.real.astype(np.float32),
                                  x.imag.astype(np.float32)))
    yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
    got = yre + 1j * yim
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


def build_bucket_panels_host(bp, a_re, a_im):
    import jax.numpy as jnp

    return [jnp.asarray(np.asarray(p)) for p in
            pp.build_a_panels_bucketed_device(bp, jnp.asarray(a_re),
                                              jnp.asarray(a_im))]


def test_golden_plan_files_order_independence():
    """The reference ships plan_unordered and plan_reordered as the same
    plan in different pair order to test order-independence of the
    multiply (SURVEY.md §4.1).  Verify both parse to the same multiset of
    (iY, iA, iX) triples and pack to the same schedule geometry."""
    import os

    base = "/root/reference/test/multiplication"
    files = [os.path.join(base, f"plan_{v}.14-287-16")
             for v in ("unordered", "reordered")]
    if not all(os.path.exists(f) for f in files):
        pytest.skip("golden plan files not present")
    from tfqmrgpu_tpu.io.planfile import read_plan_file

    triples = []
    packs = []
    for f in files:
        pf = read_plan_file(f)
        counts = np.diff(pf.starts.astype(np.int64))
        py = np.repeat(pf.y_order, counts).astype(np.int64)
        pa = pf.pairs[:, 0].astype(np.int64)
        px = pf.pairs[:, 1].astype(np.int64)
        t = np.stack([py, pa, px], 1)
        triples.append(t[np.lexsort(t.T[::-1])])
        o = np.argsort(py, kind="stable")
        packs.append(pp.pack_pair_plan(pa[o], px[o], py[o], pf.nnzb_y,
                                       pf.nnzb_x, 32, 32, r_tile=2))
    np.testing.assert_array_equal(triples[0], triples[1])
    assert packs[0].ntiles == packs[1].ntiles
    assert packs[0].ku == packs[1].ku
    assert packs[0].s_window == packs[1].s_window
    np.testing.assert_array_equal(packs[0].perm, packs[1].perm)


@pytest.mark.parametrize("stride_factor", [2, 3])
def test_stride_factor_windows_match(rng, stride_factor):
    """Stride-factor windows (bigger segment, span-sized cover) must be
    bit-identical to the legacy 2S overlap."""
    import jax.numpy as jnp

    lm = ln = 4
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=24, ncols=2, lm=lm, ln=ln)
    a = (rng.standard_normal((na, lm, lm))
         + 1j * rng.standard_normal((na, lm, lm)))
    x = (rng.standard_normal((nx, lm, ln))
         + 1j * rng.standard_normal((nx, lm, ln)))
    want = _np_pairwalk(pa, px, py, a, x, nx)

    got = {}
    for k in (1, stride_factor):
        plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=1,
                                 stride_factor=k)
        if k > 1:
            assert plan.o_blocks < plan.s_window
        panels = jnp.asarray(pp.build_a_panels(
            plan, a.real.astype(np.float32), a.imag.astype(np.float32)))
        mult = pp.make_pairpanel_multiply(plan, panels,
                                         precision="highest",
                                         interpret=True, t_step=2)
        xf = jnp.asarray(pp.permute_x(plan, x.real.astype(np.float32),
                                      x.imag.astype(np.float32)))
        yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
        got[k] = yre + 1j * yim
        scale = np.max(np.abs(want))
        assert np.max(np.abs(got[k] - want)) / scale < 1e-5
    np.testing.assert_array_equal(got[1], got[stride_factor])


@pytest.mark.parametrize("t_step,r_tile", [(1, 1), (4, 1), (2, 2)])
def test_resident_window_matches_pairwalk(rng, t_step, r_tile):
    """Resident-X plans (one full-panel VMEM window, constant index map,
    no replica build) are bit-identical to the windowed layout."""
    import jax.numpy as jnp

    lm = ln = 4
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=20, ncols=2, lm=lm, ln=ln)
    a = (rng.standard_normal((na, lm, lm))
         + 1j * rng.standard_normal((na, lm, lm)))
    x = (rng.standard_normal((nx, lm, ln))
         + 1j * rng.standard_normal((nx, lm, ln)))
    want = _np_pairwalk(pa, px, py, a, x, nx)

    got = {}
    for res in (False, True):
        plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln,
                                 r_tile=r_tile, resident=res)
        if res:
            assert plan.resident and plan.n_windows == 1
            assert plan.o_blocks == 0 and plan.s_window == plan.n_slots
            assert plan.x_rows_padded == plan.n_slots * lm
        panels = jnp.asarray(pp.build_a_panels(
            plan, a.real.astype(np.float32), a.imag.astype(np.float32)))
        mult = pp.make_pairpanel_multiply(plan, panels,
                                          precision="highest",
                                          interpret=True, t_step=t_step)
        xf = jnp.asarray(pp.permute_x(plan, x.real.astype(np.float32),
                                      x.imag.astype(np.float32)))
        yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
        got[res] = yre + 1j * yim
        scale = np.max(np.abs(want))
        assert np.max(np.abs(got[res] - want)) / scale < 1e-5
    np.testing.assert_array_equal(got[False], got[True])


def test_resident_handles_scattered_pattern():
    """Patterns with NO window locality (span > max_window would reject
    the windowed pack) still run resident: there is no locality
    requirement when the whole panel is the window."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n, na, npair, lm, ln = 96, 120, 400, 4, 4
    pa = rng.integers(0, na, npair)
    px = rng.integers(0, n, npair)
    py = rng.integers(0, n, npair)
    with pytest.raises(ValueError):
        pp.pack_pair_plan(pa, px, py, n, n, lm, ln, r_tile=1,
                          max_window=8)
    plan = pp.pack_pair_plan(pa, px, py, n, n, lm, ln, r_tile=1,
                             max_window=8, resident=True)
    a = (rng.standard_normal((na, lm, lm))
         + 1j * rng.standard_normal((na, lm, lm)))
    x = (rng.standard_normal((n, lm, ln))
         + 1j * rng.standard_normal((n, lm, ln)))
    want = _np_pairwalk(pa, px, py, a, x, n)
    panels = jnp.asarray(pp.build_a_panels(
        plan, a.real.astype(np.float32), a.imag.astype(np.float32)))
    mult = pp.make_pairpanel_multiply(plan, panels, precision="highest",
                                      interpret=True, t_step=2)
    xf = jnp.asarray(pp.permute_x(plan, x.real.astype(np.float32),
                                  x.imag.astype(np.float32)))
    yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
    got = yre + 1j * yim
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-5


def test_resident_feasible_bounds():
    assert pp.resident_feasible(1000, 8, 8, "highest")
    assert pp.resident_feasible(1000, 8, 8, "bf16x4")
    assert not pp.resident_feasible(40000, 32, 32, "highest")
    assert not pp.resident_feasible(0x8000, 4, 4, "highest")


def test_split_bf16x3_reconstructs_f32():
    """hi + mid + lo must reproduce the f32 value to ~2^-24 relative
    (three 8-bit bf16 mantissas cover all 24 f32 mantissa bits)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    a = jnp.asarray((rng.standard_normal(4096) *
                     10.0 ** rng.uniform(-3, 3, 4096)).astype(np.float32))
    hi, mid, lo = pp.split_bf16x3(a)
    rec = (hi.astype(jnp.float32) + mid.astype(jnp.float32)
           + lo.astype(jnp.float32))
    rel = np.max(np.abs(np.asarray(rec - a)) / np.abs(np.asarray(a)))
    assert rel < 2.0 ** -23
    # and the 2-way split is strictly coarser
    h2, l2 = pp.split_bf16x2(a)
    rec2 = h2.astype(jnp.float32) + l2.astype(jnp.float32)
    rel2 = np.max(np.abs(np.asarray(rec2 - a)) / np.abs(np.asarray(a)))
    assert rel2 > rel


@pytest.mark.parametrize("t_step", [1, 4])
def test_pairpanel_bf16x6_exact_f32_quality(rng, t_step):
    """The bf16x6 mode (3-way splits, 6 cross products, in-kernel A split)
    must land at exact-f32 quality -- well inside the reference's 1e-5
    full-solve gate, an order tighter than bf16x4's ~1e-4-scale floor."""
    lm = ln = 16
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=24, ncols=2, lm=lm, ln=ln,
                                        stencil=(0, 1, 2, 3, 4, 5, 6, 7))
    plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=1)
    a = rng.standard_normal((na, lm, lm)) + 1j * rng.standard_normal(
        (na, lm, lm))
    x = rng.standard_normal((nx, lm, ln)) + 1j * rng.standard_normal(
        (nx, lm, ln))
    want = _np_pairwalk(pa, px, py, a, x, nx)

    import jax.numpy as jnp

    panels = jnp.asarray(pp.build_a_panels(
        plan, a.real.astype(np.float32), a.imag.astype(np.float32)))
    mult = pp.make_pairpanel_multiply(plan, panels, precision="bf16x6",
                                      interpret=True, t_step=t_step)
    xf = jnp.asarray(pp.permute_x(plan, x.real.astype(np.float32),
                                  x.imag.astype(np.float32)))
    yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
    got = yre + 1j * yim
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 2e-6


@pytest.mark.parametrize("t_step", [1, 4])
@pytest.mark.parametrize("comp", ["1", "0"])
def test_pairpanel_oz_f64_quality(rng, t_step, comp, monkeypatch):
    """The Ozaki 'oz' mode must reproduce the f64 pair walk to ~1e-13
    relative -- 7 orders beyond any f32-accumulation mode, on data with
    a wide exponent spread.  comp='1' runs the TwoSum-compensated 'ozc'
    kernel (q=8 slices, one error plane), '0' the diag_sum-exact legacy."""
    import jax

    monkeypatch.setenv("TFQ_OZ_COMP", comp)
    jax.config.update("jax_enable_x64", True)
    lm = ln = 16
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=20, ncols=2, lm=lm, ln=ln,
                                        stencil=(0, 1, 2, 3))
    plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=1)
    sp = 10.0 ** rng.uniform(-6, 6, (na, 1, 1))
    a = (rng.standard_normal((na, lm, lm))
         + 1j * rng.standard_normal((na, lm, lm))) * sp
    spx = 10.0 ** rng.uniform(-6, 6, (nx, 1, 1))
    x = (rng.standard_normal((nx, lm, ln))
         + 1j * rng.standard_normal((nx, lm, ln))) * spx
    want = _np_pairwalk(pa, px, py, a, x, nx)

    import jax.numpy as jnp

    mult = pp.make_pairpanel_multiply_oz(plan, a.real, a.imag,
                                         interpret=True, t_step=t_step)
    assert mult.p * mult.q >= 53
    assert mult.comp == (comp == "1")
    if mult.comp:
        import os as _os_

        if _os_.environ.get("TFQ_OZC_INT8", "0") != "0":
            # int8 planes: q = 7 (every slice int <= 64), p = 8
            assert mult.q == 7 and mult.p == 8
        else:
            # bf16 planes (default): q = 8 (full significand) at this K
            assert mult.q == 8 and mult.p == 7
    xf = jnp.asarray(pp.permute_x(plan, a0 := x.real, x.imag))
    del a0
    yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
    got = yre + 1j * yim
    scale = np.abs(want).max()
    dev = np.max(np.abs(got - want)) / scale
    assert dev < 1e-12, dev
    # and genuinely beyond f32: the same product through the exact-f32
    # kernel sits at ~1e-6; oz must be >= 5 orders tighter
    panels = jnp.asarray(pp.build_a_panels(
        plan, a.real.astype(np.float32), a.imag.astype(np.float32)))
    m32 = pp.make_pairpanel_multiply(plan, panels, precision="highest",
                                     interpret=True, t_step=t_step)
    xf32 = jnp.asarray(pp.permute_x(plan, x.real.astype(np.float32),
                                    x.imag.astype(np.float32)))
    yre32, yim32 = pp.unpermute_y(plan, np.asarray(m32(xf32)))
    dev32 = np.max(np.abs((yre32 + 1j * yim32) - want)) / scale
    assert dev < 1e-5 * dev32, (dev, dev32)


def test_pairpanel_ozc_xi8_f64_quality(rng, monkeypatch):
    """The 'xi8' mode (TFQ_OZC_INT8=2): BOTH operands ship raw int8
    slice integers and the MXU accumulates in int32 -- every diagonal
    sum exact by integer arithmetic, f32 conversion exactified by the
    hi/lo split (see dots()).  Must match the f64 pair walk to the same
    ~1e-12 tier as the bf16 ozc kernel, on wide-exponent data."""
    import jax

    monkeypatch.setenv("TFQ_OZ_COMP", "1")
    monkeypatch.setenv("TFQ_OZC_INT8", "2")
    jax.config.update("jax_enable_x64", True)
    lm = ln = 32                      # xi8 needs lm % 32 == 0
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=10, ncols=2, lm=lm, ln=ln,
                                        stencil=(0, 1, 2))
    plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=1)
    sp = 10.0 ** rng.uniform(-5, 5, (na, 1, 1))
    a = (rng.standard_normal((na, lm, lm))
         + 1j * rng.standard_normal((na, lm, lm))) * sp
    spx = 10.0 ** rng.uniform(-5, 5, (nx, 1, 1))
    x = (rng.standard_normal((nx, lm, ln))
         + 1j * rng.standard_normal((nx, lm, ln))) * spx
    want = _np_pairwalk(pa, px, py, a, x, nx)

    import jax.numpy as jnp

    mult = pp.make_pairpanel_multiply_oz(plan, a.real, a.imag,
                                         interpret=True, t_step=2,
                                         bits=47)
    assert mult.xi8 and mult.q == 7
    xf = jnp.asarray(pp.permute_x(plan, x.real, x.imag))
    yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
    dev = np.max(np.abs((yre + 1j * yim) - want)) / np.abs(want).max()
    assert dev < 1e-12, dev


def test_pairpanel_ozc_extreme_scale_lanes(rng, monkeypatch):
    """Lanes whose |x| max sits below the f32 subnormal range (or above
    f32 max) must take the f64 legacy descale: the f32-side amax is
    blind (flushes to 0) or garbage (inf) there, so the fast-path tau is
    wrong while the guard used to pass (advisor r4: tiny lanes sliced to
    all-zero SILENTLY).  Per-lane relative accuracy must hold for both
    extremes simultaneously."""
    import jax

    monkeypatch.setenv("TFQ_OZ_COMP", "1")
    jax.config.update("jax_enable_x64", True)
    lm = ln = 16
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=12, ncols=2, lm=lm, ln=ln,
                                        stencil=(0, 1, 2))
    plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=1)
    a = (rng.standard_normal((na, lm, lm))
         + 1j * rng.standard_normal((na, lm, lm)))
    x = (rng.standard_normal((nx, lm, ln))
         + 1j * rng.standard_normal((nx, lm, ln)))
    # alternate lanes: far below f32 subnormals / far above f32 max
    # (still inside pow2_scale's documented |log2| <= ~326 exact range)
    x[:, :, 0::2] *= 1e-60
    x[:, :, 1::2] *= 1e60
    want = _np_pairwalk(pa, px, py, a, x, nx)

    import jax.numpy as jnp

    mult = pp.make_pairpanel_multiply_oz(plan, a.real, a.imag,
                                         interpret=True, t_step=1)
    xf = jnp.asarray(pp.permute_x(plan, x.real, x.imag))
    yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
    got = yre + 1j * yim
    scale_lane = np.abs(want).max(axis=(0, 1))
    assert np.all(scale_lane > 0)
    dev_lane = np.abs(got - want).max(axis=(0, 1)) / scale_lane
    assert dev_lane.max() < 1e-12, dev_lane


def test_precision_props_vmem_model():
    """bf16x6 ships A raw f32 (no presplit planes) and 3-way split X
    windows; the VMEM/time models must price it that way."""
    props = pp.precision_props("bf16x6")
    assert props["xsplit"] == 3 and props["a_presplit"] == 0
    assert pp.precision_props("bf16x4")["a_presplit"] == 2
    # resident window: 6*ln bf16 lanes = 1.5x the f32 bytes (at ln=64
    # where neither lane count pads: VMEM lanes tile at 128, so the model
    # counts PHYSICAL padded widths -- see _lanes_pad)
    b_hi = pp.resident_window_bytes(100, 16, 64, "highest")
    b_x6 = pp.resident_window_bytes(100, 16, 64, "bf16x6")
    assert b_x6 == int(1.5 * b_hi)
    # narrow lanes pad to the full 128-lane tile: ln=8 'highest' (16
    # fused lanes) must be priced as 128
    b_n = pp.resident_window_bytes(100, 16, 8, "highest")
    assert b_n == (100 + 2) * 16 * 128 * 4


@pytest.mark.parametrize("t_step,r_tile,precision",
                         [(1, 1, "highest"), (4, 1, "highest"),
                          (3, 2, "highest"), (4, 1, "bf16x4")])
def test_tile_pipe_matches_pairwalk(rng, monkeypatch, t_step, r_tile,
                                    precision):
    """The TILE-pipelined resident kernel (per-tile union buffers, identity
    block maps, per-tile copy programs) must reproduce the step-pipelined
    kernel's results exactly.  Forced via TFQ_PAIRS_TILEPIPE=1 here; the
    auto rule enables it only for wide grouped lanes (use_tile_pipe)."""
    import jax.numpy as jnp

    lm = ln = 4
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=20, ncols=2, lm=lm, ln=ln)
    a = (rng.standard_normal((na, lm, lm))
         + 1j * rng.standard_normal((na, lm, lm)))
    x = (rng.standard_normal((nx, lm, ln))
         + 1j * rng.standard_normal((nx, lm, ln)))
    want = _np_pairwalk(pa, px, py, a, x, nx)

    plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln,
                             r_tile=r_tile, resident=True)
    panels = jnp.asarray(pp.build_a_panels(
        plan, a.real.astype(np.float32), a.imag.astype(np.float32)))
    xf = jnp.asarray(pp.permute_x(plan, x.real.astype(np.float32),
                                  x.imag.astype(np.float32)))
    got = {}
    for pipe in ("0", "1"):
        monkeypatch.setenv("TFQ_PAIRS_TILEPIPE", pipe)
        mult = pp.make_pairpanel_multiply(plan, panels, precision=precision,
                                          interpret=True, t_step=t_step)
        yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
        got[pipe] = yre + 1j * yim
    scale = np.max(np.abs(want))
    tol = 1e-5 if precision == "highest" else 5e-4
    assert np.max(np.abs(got["1"] - want)) / scale < tol
    np.testing.assert_array_equal(got["0"], got["1"])


def test_use_tile_pipe_rule(rng, monkeypatch):
    """Auto rule: resident + wide lanes (>= 256 incl. the split packing)."""
    monkeypatch.delenv("TFQ_PAIRS_TILEPIPE", raising=False)
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=8, ncols=2, lm=4, ln=4)
    narrow = pp.pack_pair_plan(pa, px, py, nx, nx, 4, 4, r_tile=1,
                               resident=True)
    assert not pp.use_tile_pipe(narrow, "highest")
    wide = pp.pack_pair_plan(pa, px, py, nx, nx, 4, 128, r_tile=1,
                             resident=True)
    assert pp.use_tile_pipe(wide, "highest")
    assert not pp.use_tile_pipe(wide, "oz9")
    windowed = pp.pack_pair_plan(pa, px, py, nx, nx, 4, 128, r_tile=1)
    assert not pp.use_tile_pipe(windowed, "highest")
    # bf16x4 packs [hi|lo] lanes: threshold crosses at ln >= 64
    wide2 = pp.pack_pair_plan(pa, px, py, nx, nx, 4, 64, r_tile=1,
                              resident=True)
    assert pp.use_tile_pipe(wide2, "bf16x4")
    assert not pp.use_tile_pipe(wide2, "highest")
    # tile-pipe scratch is t-independent: bigger t_step stays admissible
    assert pp.vmem_need_bytes(wide, "highest", 16, tile_pipe=True) < \
        pp.vmem_need_bytes(wide, "highest", 16, tile_pipe=False)


def test_tile_pipe_auto_wide_lanes(rng, monkeypatch):
    """Wide lanes (2*xsplit*ln >= 256) + resident plan must auto-select
    the tile pipeline (no env forcing) and still match the pair walk."""
    monkeypatch.delenv("TFQ_PAIRS_TILEPIPE", raising=False)
    import jax.numpy as jnp

    lm, ln = 4, 128
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=10, ncols=2, lm=lm, ln=ln)
    a = (rng.standard_normal((na, lm, lm))
         + 1j * rng.standard_normal((na, lm, lm)))
    x = (rng.standard_normal((nx, lm, ln))
         + 1j * rng.standard_normal((nx, lm, ln)))
    want = _np_pairwalk(pa, px, py, a, x, nx)

    plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=1,
                             resident=True)
    assert pp.use_tile_pipe(plan, "highest")
    panels = jnp.asarray(pp.build_a_panels(
        plan, a.real.astype(np.float32), a.imag.astype(np.float32)))
    mult = pp.make_pairpanel_multiply(plan, panels, precision="highest",
                                      interpret=True, t_step=4)
    xf = jnp.asarray(pp.permute_x(plan, x.real.astype(np.float32),
                                  x.imag.astype(np.float32)))
    yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
    got = yre + 1j * yim
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-5


def test_pairpanel_oz_grouped(rng):
    """Ozaki 'z' on a COLUMN-GROUPED plan (r3): grouping is a pattern
    transform -- zero-filled absent lanes slice to exact zeros -- so the
    grouped oz multiply must match the f64 pair walk to the same ~1e-12
    as the ungrouped kernel, with the grouped A dedup."""
    import jax

    jax.config.update("jax_enable_x64", True)
    lm = ln = 16
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=20, ncols=2, lm=lm, ln=ln,
                                        stencil=(0, 1, 2, 3))
    gp = pp.pack_grouped(pa, px, py, nx, ln, 2)
    plan = pp.pack_pair_plan(gp.pair_a2, gp.pair_x2, gp.pair_y2,
                             gp.nnzb2, gp.nnzb2, lm, gp.ln2, r_tile=1,
                             row_of=gp.row_of2, col_of=gp.col_of2,
                             resident=False)
    sp = 10.0 ** rng.uniform(-5, 5, (na, 1, 1))
    a = (rng.standard_normal((na, lm, lm))
         + 1j * rng.standard_normal((na, lm, lm))) * sp
    spx = 10.0 ** rng.uniform(-5, 5, (nx, 1, 1))
    x = (rng.standard_normal((nx, lm, ln))
         + 1j * rng.standard_normal((nx, lm, ln))) * spx
    want = _np_pairwalk(pa, px, py, a, x, nx)

    import jax.numpy as jnp

    mult = pp.make_pairpanel_multiply_oz(plan, a.real, a.imag,
                                         interpret=True, t_step=2)
    xr = np.asarray(pp.grouped_blocks(gp, x.real))
    xi = np.asarray(pp.grouped_blocks(gp, x.imag))
    xf = jnp.asarray(pp.permute_x(plan, xr, xi))
    yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
    got = pp.ungroup_blocks(gp, yre) + 1j * pp.ungroup_blocks(gp, yim)
    dev = np.max(np.abs(got - want)) / np.abs(want).max()
    assert dev < 1e-12, dev


def test_kernels_stay_32bit_under_x64(rng):
    """Regression: with jax_enable_x64 on (the 'z'/'m' paths), python-int
    index math inside the Pallas kernels promotes through weak int64 and
    Mosaic either recurses (s64 converts) or rejects the memref slice
    (i64 indices).  Interpret mode cannot catch it, so walk the traced
    kernel jaxprs and assert no 64-bit dtype appears anywhere."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    def _is64(dt):
        try:
            return jnp.dtype(dt).itemsize == 8
        except TypeError:
            return False            # semaphore/opaque dtypes

    def walk(jaxpr, bad):
        for v in list(jaxpr.invars) + list(jaxpr.outvars):
            if hasattr(v, "aval") and hasattr(v.aval, "dtype"):
                if _is64(v.aval.dtype):
                    bad.append((v.aval.dtype, "io"))
        for eqn in jaxpr.eqns:
            for v in list(eqn.invars) + list(eqn.outvars):
                if hasattr(v, "aval") and hasattr(v.aval, "dtype"):
                    if _is64(v.aval.dtype):
                        bad.append((v.aval.dtype, eqn.primitive.name))
            for p in eqn.params.values():
                inner = getattr(p, "jaxpr", None)
                if inner is not None:
                    walk(inner if not hasattr(inner, "jaxpr") else
                         inner.jaxpr, bad)

    def kernel_jaxprs(jaxpr, out):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                out.append(eqn.params["jaxpr"])
            for p in eqn.params.values():
                inner = getattr(p, "jaxpr", None)
                if inner is not None:
                    kernel_jaxprs(inner if not hasattr(inner, "jaxpr")
                                  else inner.jaxpr, out)

    lm = ln = 16
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=12, ncols=2, lm=lm, ln=ln)
    a = rng.standard_normal((na, lm, lm)) + 1j * rng.standard_normal(
        (na, lm, lm))
    x = rng.standard_normal((nx, lm, ln)) + 1j * rng.standard_normal(
        (nx, lm, ln))

    builds = []
    # resident step-pipelined, resident tile-piped, windowed, oz
    for res, tp in ((True, False), (True, True), (False, False)):
        plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=1,
                                 resident=res)
        if tp:
            import os
            os.environ["TFQ_PAIRS_TILEPIPE"] = "1"
        try:
            panels = jnp.asarray(pp.build_a_panels(
                plan, a.real.astype(np.float32),
                a.imag.astype(np.float32)))
            mult = pp.make_pairpanel_multiply(plan, panels,
                                              precision="highest",
                                              interpret=True, t_step=2)
        finally:
            if tp:
                os.environ.pop("TFQ_PAIRS_TILEPIPE", None)
        xf = jnp.asarray(pp.permute_x(plan, x.real.astype(np.float32),
                                      x.imag.astype(np.float32)))
        builds.append((f"res={res},tp={tp}",
                       jax.make_jaxpr(lambda c, v: mult.apply(c, v))(
                           mult.consts, xf)))
    plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=1,
                             resident=False)
    mult_oz = pp.make_pairpanel_multiply_oz(plan, a.real, a.imag,
                                            interpret=True, t_step=2)
    xf64 = jnp.asarray(pp.permute_x(plan, a0 := x.real, x.imag))
    del a0
    builds.append(("oz", jax.make_jaxpr(
        lambda c, v: mult_oz.apply(c, v))(mult_oz.consts, xf64)))

    for name, traced in builds:
        kerns = []
        kernel_jaxprs(traced.jaxpr, kerns)
        assert kerns, f"{name}: no pallas_call found"
        for kj in kerns:
            bad = []
            walk(kj, bad)
            assert not bad, f"{name}: 64-bit values in kernel: {bad[:5]}"


def test_pairpanel_oz_int8_bit_identical(rng, monkeypatch):
    """int8 raw-int A planes (the default) must lose nothing vs the bf16
    scaled-value planes.  At q <= 6 the reconstruction is bit-exact (same
    sigma, |int| <= 64); slice-level identity is asserted directly.  At
    the plan level (small K here forces q = 7, which re-slices with one
    spare binade) both modes must deliver f64 quality on the same data."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    # slice-level bit identity at q = 6
    v = rng.standard_normal((8, 96)) * 10.0 ** rng.uniform(-5, 5, (8, 96))
    from tfqmrgpu_tpu.ops import ozaki
    sig = ozaki.pow2_scale(jnp.max(jnp.abs(jnp.asarray(v)), axis=1,
                                   keepdims=True))
    pure = jnp.asarray(v) / sig
    bf = pp._oz_slices(pure, 9, 6)
    i8 = pp._oz_slices_int8(pure, 9, 6)
    for s_ in range(9):
        np.testing.assert_array_equal(
            np.asarray(bf[s_], np.float64),
            np.asarray(i8[s_], np.float64) * 2.0 ** (-(s_ + 1) * 6))

    # plan-level: int8 engages and both modes reach f64 quality
    lm = ln = 16
    pa, px, py, na, nx = _bsr_pair_plan(rng, mb=16, ncols=2, lm=lm, ln=ln,
                                        stencil=(0, 1, 3))
    plan = pp.pack_pair_plan(pa, px, py, nx, nx, lm, ln, r_tile=1)
    sp = 10.0 ** rng.uniform(-6, 6, (na, 1, 1))
    a = (rng.standard_normal((na, lm, lm))
         + 1j * rng.standard_normal((na, lm, lm))) * sp
    x = (rng.standard_normal((nx, lm, ln))
         + 1j * rng.standard_normal((nx, lm, ln)))
    want = _np_pairwalk(pa, px, py, a, x, nx)
    scale = np.abs(want).max()
    xf = jnp.asarray(pp.permute_x(plan, x.real, x.imag))
    monkeypatch.setenv("TFQ_OZ_COMP", "0")   # int8 is a LEGACY-mode knob
    for mode, want_dt in (("1", jnp.int8), ("0", jnp.bfloat16)):
        monkeypatch.setenv("TFQ_OZ_INT8", mode)
        mult = pp.make_pairpanel_multiply_oz(plan, a.real, a.imag,
                                             interpret=True)
        assert mult.consts[3].dtype == want_dt
        yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
        dev = np.max(np.abs((yre + 1j * yim) - want)) / scale
        assert dev < 1e-12, (mode, dev)

    # compensated mode's int8 point (TFQ_OZC_INT8=1): q = 7 / p = 8,
    # carry-renormalized ints (every |int| <= 66), f64 quality
    monkeypatch.setenv("TFQ_OZ_COMP", "1")
    monkeypatch.setenv("TFQ_OZC_INT8", "1")
    mult = pp.make_pairpanel_multiply_oz(plan, a.real, a.imag,
                                         interpret=True)
    assert mult.comp and mult.q == 7 and mult.p == 8
    # consts[3] = the p slice planes CONCATENATED along rows (one DMA per
    # grid step); the carry-renormalized int bound holds for every plane
    assert mult.consts[3].dtype == jnp.int8
    assert np.max(np.abs(np.asarray(mult.consts[3], np.int32))) <= 66
    yre, yim = pp.unpermute_y(plan, np.asarray(mult(xf)))
    dev = np.max(np.abs((yre + 1j * yim) - want)) / scale
    assert dev < 1e-12, dev
