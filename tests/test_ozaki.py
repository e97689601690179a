"""Ozaki-scheme f64-quality MXU matmul: slicing exactness + product error."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfqmrgpu_tpu.ops import ozaki


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield


def test_slice_params_points():
    p, q = ozaki.slice_params(448)          # the pairpanel K = ku*LM range
    assert q == 7 and p == 8
    p, q = ozaki.slice_params(4096)
    assert q == 6
    with pytest.raises(ValueError):
        ozaki.slice_params(2 ** 22)          # too deep for exact f32 accum


def test_slice_params_comp_points():
    """Compensated-kernel sizing: dual spare binade admits the full bf16
    significand (q=8) through k=1024 -> 7 slices / 28 products; beyond,
    q steps down but stays ahead of the diag_sum-exact legacy point."""
    assert ozaki.slice_params_comp(448) == (7, 8)
    # the +1 int headroom (stored-value residuals, pairpanel._oz_slices)
    # tightens the q=8 cutoff from 1024 to 2^24 // 129^2 = 1008
    assert ozaki.slice_params_comp(1008) == (7, 8)
    p, q = ozaki.slice_params_comp(1009)     # k * 129^2 > 2^24 at q=8
    assert (p, q) == (8, 7)
    assert p * q >= 53
    with pytest.raises(ValueError):
        ozaki.slice_params_comp(2 ** 24)


def test_slice_operand_reconstructs():
    """scale * sum(slices) must reproduce the f64 input to 2^{-p*q}
    relative-to-scale; each slice must be exactly representable in bf16."""
    rng = np.random.default_rng(3)
    v = rng.standard_normal((64, 37)) * 10.0 ** rng.uniform(-8, 8, (64, 37))
    p, q = 8, 7
    slices, scale = ozaki.slice_operand(v, axis=1, p=p, q=q)
    assert slices.dtype == jnp.bfloat16 and slices.shape == (p, 64, 37)
    # bf16 exactness: f32(bf16(slice)) round-trips by construction; check
    # the reconstruction instead (the real invariant)
    rec = np.asarray(scale) * np.sum(
        np.asarray(slices, dtype=np.float64), axis=0)
    err = np.abs(rec - v) / np.asarray(scale)
    assert err.max() < 2.0 ** (-p * q), err.max()
    # slice magnitudes honor the 2^q int bound (exact f32 accumulation)
    for s in range(p):
        m = np.abs(np.asarray(slices[s], dtype=np.float64)).max()
        assert m <= 2.0 ** (q - (s + 1) * q + 1), (s, m)


@pytest.mark.parametrize("k", [448, 63])
def test_matmul_oz_f64_quality(k):
    """The full product must land ~1e-14 relative -- far beyond any f32
    path (1e-6) and at the f64 dot noise floor."""
    rng = np.random.default_rng(11)
    a = rng.standard_normal((40, k)) * 10.0 ** rng.uniform(-4, 4, (40, k))
    x = rng.standard_normal((k, 24)) * 10.0 ** rng.uniform(-4, 4, (k, 24))
    got = np.asarray(ozaki.matmul_oz(a, x))
    want = a @ x
    scale = (np.abs(a).max(1, keepdims=True)
             * np.abs(x).max(0, keepdims=True))
    err = (np.abs(got - want) / scale).max()
    assert err < k * 2.0 ** -50, err


def test_matmul_oz_complex():
    rng = np.random.default_rng(5)
    k = 128
    ar, ai = rng.standard_normal((2, 32, k))
    xr, xi = rng.standard_normal((2, k, 16))
    yr, yi = ozaki.matmul_oz_complex(ar, ai, xr, xi)
    want = (ar + 1j * ai) @ (xr + 1j * xi)
    dev = np.max(np.abs((np.asarray(yr) + 1j * np.asarray(yi)) - want))
    assert dev / np.abs(want).max() < 1e-13, dev


def test_matmul_oz_beats_f32():
    """Sanity: the same product through f32 (simulating the 'c' path) has
    ~1e-6 error; ozaki must be >= 6 orders better on the same data."""
    rng = np.random.default_rng(7)
    k = 448
    a = rng.standard_normal((64, k))
    x = rng.standard_normal((k, 32))
    want = a @ x
    f32 = np.asarray(jnp.dot(jnp.asarray(a, jnp.float32),
                             jnp.asarray(x, jnp.float32),
                             precision=jax.lax.Precision.HIGHEST),
                     dtype=np.float64)
    oz = np.asarray(ozaki.matmul_oz(a, x))
    e32 = np.abs(f32 - want).max()
    eoz = np.abs(oz - want).max()
    assert eoz < 1e-6 * e32, (eoz, e32)


def test_pow2_scale_edges():
    """Power-of-two-ness and sigma >= amax across binade edges (the f32
    bit-pattern construction replaced frexp, which the TPU relay's
    f64 emulation cannot compile)."""
    import jax.numpy as jnp

    from tfqmrgpu_tpu.ops.ozaki import pow2_scale

    vals = np.array([0.0, 1e-90, 2.0**-300, 2.0**-149, 2.0**-126, 0.25,
                     0.5 - 1e-17, 0.5, 0.5 + 1e-16, 0.75, 1.0 - 1e-16,
                     1.0, 1.0 + 1e-15, 3.0, 4.0, 2.0**126, 2.0**127,
                     1e38, 1e90], np.float64)
    sig = np.asarray(pow2_scale(jnp.asarray(vals)))
    m, e = np.frexp(sig)
    assert np.all(m == 0.5), "scales must be exact powers of two"
    assert np.all(sig >= np.where(vals > 0, vals, 1.0))
    # never more than one binade of over-scale inside the exact range
    assert np.all(sig <= 4.0 * np.where(vals > 0, vals, 1.0))


def test_spmm_pairs_oz_f64_quality():
    """The block-list engine's f64 path must route through the Ozaki
    slice products automatically (no Pallas tiling constraints -- serves
    LM < 16, e.g. the FD geometry's LM=8) and agree with the NumPy
    complex128 pair walk to ~1e-13 relative (reference semantics:
    gemmNxNf double instantiation, tfqmrgpu.cu:40-45)."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import make_random_problem

    from tfqmrgpu_tpu.ops.blocksparse import BlockSparseAction
    from tfqmrgpu_tpu.plan import create_plan

    rng = np.random.default_rng(11)
    a, x, b = make_random_problem(rng, mb=14, lm=8, ln=8, ncols=2,
                                  x_fill=0.8)
    a.data *= 10.0 ** rng.integers(-6, 6, (a.nnzb, 1, 1))
    plan = create_plan(a, x, b)
    act = BlockSparseAction.from_plan(
        plan, np.ascontiguousarray(a.data.real),
        np.ascontiguousarray(a.data.imag), engine="xla", ln=8)
    assert act.oz_pq is not None           # auto-enabled for f64 operands
    xv = (rng.standard_normal((plan.nnzb_x, 8, 8))
          + 1j * rng.standard_normal((plan.nnzb_x, 8, 8)))
    yr, yi = act.multiply((np.ascontiguousarray(xv.real),
                           np.ascontiguousarray(xv.imag)))
    y = np.asarray(yr) + 1j * np.asarray(yi)
    pair_y = np.repeat(np.arange(plan.nnzb_x), np.diff(plan.starts))
    yo = np.zeros_like(y)
    for (ia, ix), iy in zip(plan.pairs, pair_y):
        yo[iy] += a.data[ia] @ xv[ix]
    rel = np.max(np.abs(y - yo)) / np.max(np.abs(yo))
    assert rel < 1e-13, rel
    # opt-out restores the plain emulated-f64 path
    os.environ["TFQ_XLA_OZ"] = "0"
    try:
        act2 = BlockSparseAction.from_plan(
            plan, np.ascontiguousarray(a.data.real),
            np.ascontiguousarray(a.data.imag), engine="xla", ln=8)
        assert act2.oz_pq is None
    finally:
        del os.environ["TFQ_XLA_OZ"]
