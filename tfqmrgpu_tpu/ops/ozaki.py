"""Ozaki-scheme f64-quality matmul on the bf16 MXU.

TPU v5e has no float64 unit: XLA emulates every f64 dot with f32-pair
arithmetic at a fraction of the f32 rate, which is why the reference's
native-double 'z' mode (tfqmrgpu.cu:40-45, gemmNxNf double instantiation)
has no direct TPU analogue.  This module reaches f64-and-beyond *dot*
accuracy using only bf16 MXU products, via exponent-blocked integer
slicing -- the Ozaki scheme (error-free matmul transformation), the same
family used for tensor-core DGEMM emulation on NVIDIA hardware:

    A[i, :] = sigma_i * sum_s S_s[i, :]        |S_s| = int * 2^{-(s+1)q}
    X[:, j] = tau_j  * sum_t T_t[:, j]         with int in [-2^q, 2^q]

* each slice value is an integer times a power of two with <= q+1
  significand bits  ->  EXACTLY representable in bfloat16;
* each cross product S_s @ T_t accumulates K terms of magnitude
  < 2^{2q - (s+t+2)q} sharing one ULP, so the f32 MXU accumulator holds
  the dot EXACTLY as long as  K * 2^{2q} <= 2^24;
* slices beyond the first p are dropped: the ONLY rounding anywhere is
  this deliberate truncation, |error| <= ~K * 2^{-pq} relative to
  sigma_i*tau_j.  p*q >= 53 lands below one f64 ulp of the row/col scale.

The cross products with s + t >= p are below the truncation floor and are
skipped: p*(p+1)/2 bf16 MXU passes total (36 at the (p=8, q=7) point that
covers the pair-panel engine's K = ku*LM <= ~1000).  The final combine --
sum of the kept products and the sigma/tau descale -- happens in f64
OUTSIDE the MXU (elementwise, where TPU f64 emulation is cheap).

Slicing itself runs in f64 elementwise (round/subtract chains): one pass
per slice.  A-side slices are computed once per set_matrix and reused
across multiplies/iterations; X-side slices are rebuilt per call.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def slice_params(k: int, bits: int = 53,
                 diag_sum: bool = False) -> tuple[int, int]:
    """(p, q) for contraction depth ``k``: q bits per slice so that
    K*2^(2q) <= 2^24 (exact f32 accumulation), p slices so that the
    truncation floor 2^(-p*q) covers ``bits`` significand bits.

    diag_sum=True additionally keeps the IN-f32 sum of one diagonal's
    <= p cross products exact (p * K * 2^(2q) <= 2^24) -- required when
    the kernel accumulates a diagonal into one f32 buffer (the pair-panel
    'oz' mode) instead of f64-converting every product separately."""
    if k < 1:
        raise ValueError(f"contraction depth must be >= 1, got {k}")
    # q <= 8: slice ints (incl. the round-half carry to 2^q) must fit
    # bf16's 8 significand bits; q from K: exact f32 accumulation
    for q in range(8, 1, -1):
        p = math.ceil(bits / q) + (1 if bits % q == 0 else 0)
        terms = p if diag_sum else 1
        if terms * k * 4 ** q <= 2 ** 24:
            return p, q
    raise ValueError(
        f"contraction depth {k} too deep for exact f32 accumulation; "
        f"chunk the contraction and combine in f64")


def slice_params_comp(k: int, bits: int = 53) -> tuple[int, int]:
    """(p, q) for the COMPENSATED-accumulation kernel (the pair-panel
    'ozc' mode): per-diagonal sums run as error-free TwoSum chains whose
    f32 rounding errors are carried in a separate plane, so only the
    individual k-deep slice products must be exact -- and BOTH operands
    are pre-scaled into |.| <= 0.5 (one spare binade each), capping slice
    integers at 2^{q-1} and the product terms at 4^{q-1}:

        k * 4^{q-1} <= 2^24    (vs slice_params' p * k * 4^q)

    That admits q = 8 (the full bf16 significand) up to k ~ 1000, giving
    p = ceil(53/8) = 7 slices and p(p+1)/2 = 28 cross products -- 38%
    fewer MXU passes than the diag_sum-exact (9, 6) point at k ~ 450,
    with MORE coverage (p*q = 56 > 54 bits).

    The int bound carries a +1: the slicer subtracts the STORED
    (narrowing-converted) slice so TPU-relay f64-emulation conversion
    quirks are absorbed by the next slice (pairpanel._oz_slices), which
    can push one slice int one past 2^{q-1}."""
    if k < 1:
        raise ValueError(f"contraction depth must be >= 1, got {k}")
    for q in range(8, 1, -1):
        p = math.ceil(bits / q) + (1 if bits % q == 0 else 0)
        if k * (2 ** (q - 1) + 1) ** 2 <= 2 ** 24:
            return p, q
    raise ValueError(
        f"contraction depth {k} too deep for exact f32 slice products; "
        f"chunk the contraction and combine in f64")


def slice_pairs(p: int) -> tuple[np.ndarray, np.ndarray]:
    """All (s, t) slice-index pairs with s + t <= p - 1, the products above
    the truncation floor, ordered by diagonal (descending magnitude)."""
    st = [(s, d - s) for d in range(p) for s in range(d + 1)]
    s, t = np.array(st, dtype=np.int32).T.reshape(2, -1)
    return s, t


def pow2_scale(amax):
    """Power of two >= amax (exact -- taken from the F32 bit pattern;
    frexp/ldexp bitcast through 64-bit integers, which the TPU relay's
    f64-as-f32-pair emulation cannot rewrite), zeros mapped to 1.

    May land one binade above the minimal power (when the f32 cast
    rounds a just-below-power value up) -- harmless: one spare bit of
    slice-int headroom, never an under-scale (sigma >= amax for every
    f32 rounding case, since a <= f32(a) * (1 + 2^-24) < 2^(e+1) for
    f32(a) in [2^e, 2^(e+1))).  One pre-scale tier extends the exact
    range to |log2 amax| <= ~326 (the f32-pair f64 emulation of TPU
    relays cannot even represent that much); beyond it the scale
    saturates at the range edge."""
    a64 = jnp.where(amax > 0, amax, 1.0)
    big = a64 > 2.0 ** 126
    tiny = a64 < 2.0 ** -125
    adj = jnp.where(big, jnp.float64(2.0) ** -200,
                    jnp.where(tiny, jnp.float64(2.0) ** 200, 1.0))
    a = (a64 * adj).astype(jnp.float32)       # power-of-two mul: exact
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    e = (jax.lax.shift_right_logical(bits, np.uint32(23))
         & np.uint32(0xFF)).astype(jnp.int32) - 126   # floor(log2) + 1
    e = e + jnp.where(big, 200, 0) - jnp.where(tiny, 200, 0)

    def p2(ei):
        """Exact f32 power of two from the exponent field."""
        return jax.lax.bitcast_convert_type(
            jax.lax.shift_left((ei + 127).astype(jnp.uint32),
                               np.uint32(23)), jnp.float32
        ).astype(jnp.float64)

    e1 = jnp.clip(e, -126, 127)
    e2 = jnp.clip(e - e1, -126, 127)
    return p2(e1) * p2(e2) * p2(jnp.clip(e - e1 - e2, -126, 127))


def slice_operand(v, axis: int, p: int, q: int,
                  spare_binade: bool = False):
    """Exponent-blocked slicing of an f64 array along the NON-contraction
    axis: returns (slices bf16 [p, *v.shape], scale f64 with ``axis``
    reduced to 1) such that  v == scale * sum_s f64(slices[s])  up to the
    2^{-p*q} truncation.

    ``axis`` is the axis whose entries share one output row/column (the
    per-row sigma for A, per-column tau for X): the max-abs over it sets
    the shared power-of-two scale, so slice values are exact ints times
    2^{-(s+1)q} and every MXU cross product accumulates exactly.

    ``spare_binade`` doubles the scale (|v/scale| <= 0.5), halving the
    slice-int cap to 2^{q-1}: with BOTH operands sliced this way the
    per-product exactness condition relaxes to k * 4^{q-1} <= 2^24
    (slice_params_comp), admitting one more significand bit per slice."""
    v = jnp.asarray(v, jnp.float64)
    scale = pow2_scale(jnp.max(jnp.abs(v), axis=axis, keepdims=True))
    if spare_binade:
        scale = scale * 2.0
    r = v / scale                                    # |r| <= 1, exact
    out = []
    for s in range(p):
        step = jnp.float64(2.0 ** ((s + 1) * q))
        sl = jnp.round(r * step) / step              # int * 2^{-(s+1)q}
        r = r - sl                                   # exact (Sterbenz-ish:
        #                                             shared ulp grid)
        out.append(sl.astype(jnp.bfloat16))          # exact: <= q+1 bits
    return jnp.stack(out), scale


@functools.partial(jax.jit, static_argnames=("p", "q"))
def oz_products(a_sl, x_sl, s_idx, t_idx, p: int, q: int):
    """Batched bf16 MXU products of the kept slice pairs, f64 combine."""
    prods = jax.lax.dot_general(
        a_sl[s_idx], x_sl[t_idx],
        (((2,), (1,)), ((0,), (0,))),                # batched [B,M,K]@[B,K,N]
        preferred_element_type=jnp.float32)          # EXACT accumulation
    return jnp.sum(prods.astype(jnp.float64), axis=0)


def matmul_oz(a, x, bits: int = 53):
    """f64-quality  a @ x  via bf16 MXU slice products.

    a: [M, K] float64, x: [K, N] float64 -> [M, N] float64 with error
    ~K * 2^{-bits} relative to |a_row|_inf * |x_col|_inf -- at the default
    bits=53 and K~500 that is ~1e-14, two+ orders below f64 dot rounding
    noise at the same depth and 9 orders inside the reference's gates.
    Raise ``bits`` to push the floor down (cost: more slice products).
    """
    if not jax.config.read("jax_enable_x64"):
        raise RuntimeError("matmul_oz needs x64: call tq.enable_x64()")
    a = jnp.asarray(a, jnp.float64)
    x = jnp.asarray(x, jnp.float64)
    k = a.shape[-1]
    if x.shape[0] != k:
        raise ValueError(f"shape mismatch {a.shape} @ {x.shape}")
    # dual-spare-binade sizing: products are f64-combined individually,
    # so only per-product exactness binds (see slice_params_comp)
    p, q = slice_params_comp(k, bits)
    a_sl, sig = slice_operand(a, axis=1, p=p, q=q,   # per-row scale
                              spare_binade=True)
    x_sl, tau = slice_operand(x, axis=0, p=p, q=q,   # per-column scale
                              spare_binade=True)
    s_idx, t_idx = slice_pairs(p)
    y = oz_products(a_sl, x_sl, jnp.asarray(s_idx), jnp.asarray(t_idx),
                    p, q)
    return y * sig * tau                             # power-of-two: exact


def matmul_oz_complex(a_re, a_im, x_re, x_im, bits: int = 53):
    """Complex f64-quality matmul from four real Ozaki products (the
    reference's gemmNxNf double arithmetic, tfqmrgpu_blockmult.hxx, with
    the complex assembly in f64 outside the MXU)."""
    rr = matmul_oz(a_re, x_re, bits)
    ii = matmul_oz(a_im, x_im, bits)
    ri = matmul_oz(a_re, x_im, bits)
    ir = matmul_oz(a_im, x_re, bits)
    return rr - ii, ri + ir
