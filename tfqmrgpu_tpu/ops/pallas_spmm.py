"""Pallas TPU kernel: block-sparse A  x  dense X panel  ->  Y panel.

The flop engine for large problems where densifying A is wasteful.  Design
(TPU-first; replaces the reference's per-block pair walk, gemmNxNf,
tfqmrgpu_blockmult.hxx:10-93):

* **Row-tile union packing (host, once per setMatrix)**: block rows are
  grouped into tiles of ``r_tile`` rows; per tile the union of the rows'
  A-column indices is taken and the tile's blocks are scattered into a dense
  panel ``[r_tile*LM, ku*LM]`` (absent blocks = zero).  Patterns with column
  locality (the FD examples) inflate little; the panel is streamed from HBM
  contiguously -- no scattered block gathers, which measure ~13 GB/s on v5e.
* **X panel resident in VMEM**: the kernel copies the tile's union columns
  into a stacked operand ``[ku*LM, C]`` with cheap VMEM-to-VMEM slices, then
  runs the complex product as four real MXU matmuls with contraction depth
  ``ku*LM`` (full MXU depth instead of the BSR-native LM).
* Grid is 1-D over row tiles; Pallas double-buffers the A-panel DMA against
  the previous tile's compute automatically.

The X-pattern mask (the reference's pair-list truncation, tfqmrgpu.cu:183-230)
is applied by the caller (XLA fuses it).  float32 planes only -- complex128
('z') solves use the dense or block engines (no f64 MXU on TPU).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Pair = tuple[jax.Array, jax.Array]


class RowTilePack(NamedTuple):
    """Host-side packing of BSR A into row-tile union panels."""

    ntiles: int
    r_tile: int
    ku: int             # union columns per tile (padded to the max)
    lm: int
    xcols: np.ndarray   # int32[ntiles, ku]  union block-column ids (pad -> 0)
    # scatter map: a_panels[tile, rslot*LM:+LM, kslot*LM:+LM] = A[src]
    tile_of: np.ndarray     # int32[nnzbA]
    rslot_of: np.ndarray    # int32[nnzbA]
    kslot_of: np.ndarray    # int32[nnzbA]
    inflation: float        # packed panel volume / nnzbA block volume


def pack_row_tiles(rowptr_a: np.ndarray, colind_a: np.ndarray, mb: int,
                   lm: int, r_tile: int = 8) -> RowTilePack:
    """Compute the union-ELL packing tables (pattern-only; data-independent)."""
    rowptr = np.asarray(rowptr_a, dtype=np.int64)
    colind = np.asarray(colind_a, dtype=np.int64)
    nnzb = colind.shape[0]
    ntiles = math.ceil(mb / r_tile)

    tile_cols = []
    ku = 1
    for t in range(ntiles):
        r0, r1 = t * r_tile, min((t + 1) * r_tile, mb)
        cols = np.unique(colind[rowptr[r0]:rowptr[r1]])
        tile_cols.append(cols)
        ku = max(ku, cols.shape[0])

    xcols = np.zeros((ntiles, ku), dtype=np.int32)
    tile_of = np.zeros(nnzb, dtype=np.int32)
    rslot_of = np.zeros(nnzb, dtype=np.int32)
    kslot_of = np.zeros(nnzb, dtype=np.int32)
    row_of = np.repeat(np.arange(mb, dtype=np.int64), np.diff(rowptr))
    for t in range(ntiles):
        cols = tile_cols[t]
        xcols[t, : cols.shape[0]] = cols
        r0, r1 = t * r_tile, min((t + 1) * r_tile, mb)
        lo, hi = rowptr[r0], rowptr[r1]
        tile_of[lo:hi] = t
        rslot_of[lo:hi] = row_of[lo:hi] - r0
        kslot_of[lo:hi] = np.searchsorted(cols, colind[lo:hi])

    inflation = (ntiles * r_tile * ku) / max(nnzb, 1)
    return RowTilePack(ntiles=ntiles, r_tile=r_tile, ku=ku, lm=lm,
                       xcols=xcols, tile_of=tile_of, rslot_of=rslot_of,
                       kslot_of=kslot_of, inflation=float(inflation))


def build_a_panels(pack: RowTilePack, a_blocks: np.ndarray) -> np.ndarray:
    """Scatter [nnzbA, LM, LM] block data into [ntiles, R*LM, ku*LM] panels
    (accumulating: duplicate pattern entries -- recover_grid's summable
    collisions -- add up)."""
    lm, r = pack.lm, pack.r_tile
    p = np.zeros((pack.ntiles, r, lm, pack.ku, lm), dtype=a_blocks.dtype)
    np.add.at(p, (pack.tile_of, pack.rslot_of, slice(None), pack.kslot_of),
              a_blocks)
    return np.ascontiguousarray(p.reshape(pack.ntiles, r * lm, pack.ku * lm))


class PairGrid(NamedTuple):
    """A (row-slot x column) grid factorization of a bare pair list, for
    the row-tile engine.

    Row slots are the pair list's connected row FRAGMENTS
    (pairpanel.recover_geometry), ordered by Cuthill-McKee rank so
    neighboring slots share A operands.  Fragments of one true matrix row
    that never share an A block (distant RHS clusters) stay separate
    slots, so grid density equals nnzb / (nfrag * ncol) -- callers should
    check it before choosing this engine.  (Packing column-disjoint
    fragments into shared slots was measured to violate cell injectivity
    on real FD plans: a grid cell (slot, slot') may host only ONE
    (target-fragment, operand-fragment) pair, and dense packings collide
    on essentially every fragment.)"""

    nslots: int
    ncols: int
    slot_of: np.ndarray      # int32[nnzb] row slot of each X/Y block
    col_of: np.ndarray       # int32[nnzb]
    rowptr: np.ndarray       # int64[nslots+1] slot-A CSR
    colind: np.ndarray       # int64[nnzbA] operand slots
    a_order: np.ndarray      # int64[nnzbA]: slot-A position -> original pa


def recover_grid(pair_a, pair_x, pair_y, nnzb: int) -> PairGrid:
    """Factor a bare pair list into a (slot x col) grid (see PairGrid)."""
    from .pairpanel import recover_geometry, _cuthill_mckee

    pa = np.asarray(pair_a, dtype=np.int64)
    px = np.asarray(pair_x, dtype=np.int64)
    py = np.asarray(pair_y, dtype=np.int64)
    frag, col = recover_geometry(pa, px, py, nnzb)
    nfrag = int(frag.max()) + 1
    ncol = int(col.max()) + 1
    rank = _cuthill_mckee(nfrag, frag[py], frag[px])

    # one slot per fragment, in CM order (operand slots stay nearby);
    # rank IS the slot id (position of each fragment in CM order)
    slot_of_frag = rank

    # A-block endpoints in fragment space (each USED pa has a unique
    # (fy, fx); ids absent from the pair list -- plan files carry them --
    # must not be materialized anywhere)
    o = np.argsort(pa, kind="stable")
    first = np.concatenate([[True], pa[o][1:] != pa[o][:-1]])
    used = pa[o][first]                   # unique pa ids, ascending
    fy = frag[py[o][first]]
    fx = frag[px[o][first]]

    slot_of = slot_of_frag[frag].astype(np.int32)
    ra = slot_of_frag[fy]
    ca = slot_of_frag[fx]
    csr_order = np.lexsort((ca, ra))
    rowptr = np.searchsorted(ra[csr_order], np.arange(nfrag + 1))
    return PairGrid(nslots=int(nfrag), ncols=int(ncol), slot_of=slot_of,
                    col_of=col.astype(np.int32),
                    rowptr=rowptr.astype(np.int64),
                    colind=ca[csr_order],
                    a_order=used[csr_order])


def build_a_panels_device(pack: RowTilePack, a_blocks) -> jax.Array:
    """Device-side panel build (one scatter-add): avoids shipping the
    inflated panels over the (slow) host link when A data is already on
    device."""
    lm, r, ku = pack.lm, pack.r_tile, pack.ku
    base = jnp.asarray(
        ((pack.tile_of.astype(np.int64) * r + pack.rslot_of) * ku
         + pack.kslot_of).astype(np.int32))
    flat = jnp.zeros((pack.ntiles * r * ku, lm, lm), dtype=a_blocks.dtype)
    flat = flat.at[base].add(a_blocks)
    p = flat.reshape(pack.ntiles, r, ku, lm, lm).transpose(0, 1, 3, 2, 4)
    return p.reshape(pack.ntiles, r * lm, ku * lm)


@functools.lru_cache(maxsize=64)
def _make_call(ntiles: int, rlm: int, kulm: int, lm: int, nr: int, c: int,
               interpret: bool, precision: str = "highest",
               t_step: int = 1):
    """Build (and cache) the pallas_call for one problem geometry.

    precision: 'highest' (exact f32, 6 MXU passes/product), 'bf16x4'
    (rounded hi/lo operand splits, 4 bf16 products -- ~1.5x less MXU time,
    relative error ~1e-4-scale worst case, same story as the pairpanel
    kernel), 'bf16x3' (drops lo*lo, 2x less MXU, ~1e-3 floor), 'bf16x6'
    (3-way RN splits of BOTH operands, the 6 cross products through
    O(2^-16) -- exact-f32 quality like 'highest', but the products pack
    into 3 lane-concatenated dots, so at narrow lane counts (3c <= MXU
    width) it runs ~2x less MXU time than HIGHEST; mirrors the pairpanel
    kernel's bf16x6).  A panels arrive FUSED over re/im rows
    ([ntiles, 2*rlm, kulm]; f32 for 'highest'/'bf16x6' -- the x6 3-way A
    split happens in-kernel, keeping A DMA at 4 B/el -- pre-split bf16
    (hi, lo) pair otherwise); X stays f32 resident and the bf16 splits
    happen on the VMEM-local union slice inside the kernel.

    t_step: tiles per grid step (EVEN, or 1).  Small tiles leave the
    multiply bound by the ~9 us per-grid-step fixed cost (DMA issue +
    wait); T tiles per step amortize it T-fold.  ``ntiles`` is then the
    STEP count; two union-scratch pairs alternate by global tile parity
    so the gather of tile j+1 overlaps the MXU work of tile j."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .pairpanel import split_bf16x2, split_bf16x3

    ku = kulm // lm
    T = max(int(t_step), 1)
    if T > 1 and T % 2:
        raise ValueError("t_step must be even (buffer parity) or 1")
    split = precision in ("bf16x3", "bf16x4")
    x6 = precision == "bf16x6"
    n_a = 2 if split else 1
    a_dt = jnp.bfloat16 if split else jnp.float32

    def kernel(xcols_ref, *refs):
        a_refs = refs[:n_a]
        (x_re_ref, x_im_ref, y_re_ref, y_im_ref,
         xs_re_a, xs_im_a, xs_re_b, xs_im_b) = refs[n_a:]
        i = pl.program_id(0)
        bufs = ((xs_re_a, xs_im_a), (xs_re_b, xs_im_b))

        def gather(j, xs_re, xs_im):
            # xcols is FLAT [nsteps*T*ku] (2-D SMEM operands pad every
            # row to 128 lanes); pad tiles point at block 0 and their
            # zero A panels contribute nothing
            base = (i * T + j) * ku
            for k in range(ku):  # static unroll; ku is small
                c0 = pl.multiple_of(
                    xcols_ref[base + k].astype(jnp.int32) * jnp.int32(lm),
                    lm)
                xs_re[pl.ds(k * lm, lm), :] = x_re_ref[pl.ds(c0, lm), :]
                xs_im[pl.ds(k * lm, lm), :] = x_im_ref[pl.ds(c0, lm), :]

        dot = functools.partial(jax.lax.dot,
                                preferred_element_type=jnp.float32)

        def a_parts(a_j):
            """Per-tile A operand(s): split once, reused for re AND im."""
            if x6:
                return split_bf16x3(a_refs[0][a_j])
            return tuple(r[a_j] for r in a_refs)

        def dots(ap, xs):
            """[2*rlm, c] = A_fused @ xs with the configured precision."""
            if x6:
                # 6 cross products through O(2^-16) in 3 lane-packed dots
                # (exact-f32 quality; see pairpanel's bf16x6)
                ah, am, al = ap
                xh, xm, xl = split_bf16x3(xs)
                x2 = jnp.concatenate([xh, xm], axis=1)
                d1 = dot(ah, jnp.concatenate([x2, xl], axis=1))
                d2 = dot(am, x2)
                d3 = dot(al, xh)
                return (d1[:, :c] + d1[:, c: 2 * c] + d1[:, 2 * c:]
                        + d2[:, :c] + d2[:, c:] + d3)
            if not split:
                return jax.lax.dot(ap[0], xs,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
            xh, xl = split_bf16x2(xs)
            d = dot(ap[0], xh) + dot(ap[0], xl) + dot(ap[1], xh)
            if precision == "bf16x4":
                d = d + dot(ap[1], xl)
            return d

        gather(0, *bufs[0])
        for j in range(T):
            xs_re, xs_im = bufs[j % 2]
            ap = a_parts(j)
            d_r = dots(ap, xs_re[:])      # [ar@xr ; ai@xr]
            d_i = dots(ap, xs_im[:])      # [ar@xi ; ai@xi]
            if j + 1 < T:                 # overlaps the dots above
                gather(j + 1, *bufs[(j + 1) % 2])
            y_re_ref[j] = d_r[:rlm] - d_i[rlm:]
            y_im_ref[j] = d_i[:rlm] + d_r[rlm:]

    a_specs = [pl.BlockSpec((T, 2 * rlm, kulm),
                            lambda i, xc: (i, i * 0, i * 0),
                            memory_space=pltpu.VMEM)] * n_a
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=a_specs + [
            pl.BlockSpec((nr, c), lambda i, xc: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, c), lambda i, xc: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, rlm, c), lambda i, xc: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, rlm, c), lambda i, xc: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((kulm, c), jnp.float32),
            pltpu.VMEM((kulm, c), jnp.float32),
            pltpu.VMEM((kulm, c), jnp.float32),
            pltpu.VMEM((kulm, c), jnp.float32),
        ],
    )

    # VMEM: the X panels stay RESIDENT ([nr, c] re+im), plus double-buffered
    # A panels and outputs -- well past the 16 MB scoped default for real
    # problems, but v5e carries 128 MB (see pairpanel._make_call)
    a_eb = 2 if split else 4
    # PHYSICAL lane widths: VMEM tiles at 128 lanes, so narrow panels
    # (few RHS columns) occupy the full tile (see pairpanel._lanes_pad)
    c_p = -(-c // 128) * 128
    kulm_p = -(-kulm // 128) * 128
    vmem_need = (2 * nr * c_p * 4 + 4 * kulm * c_p * 4
                 + 2 * n_a * T * 2 * rlm * kulm_p * a_eb
                 + 4 * T * rlm * c_p * 4)
    vmem_limit = min(int(vmem_need * 1.2) + (8 << 20), 120 << 20)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ntiles * T, rlm, c), jnp.float32),
            jax.ShapeDtypeStruct((ntiles * T, rlm, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * ntiles * T * rlm * kulm * c,
            bytes_accessed=(2 * ntiles * T * rlm * kulm + 4 * nr * c) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )


def auto_t_step_rowtile(ntiles: int, rlm: int, kulm: int,
                        split: bool, nr: int = 0, c: int = 0,
                        t_max: int = 16) -> int:
    """Even tile batch amortizing the ~9 us per-grid-step fixed cost:
    grow T until each step's A-panel DMA carries ~2 MB (beyond which the
    fixed cost is fully hidden and batching only raises VMEM pressure),
    then shrink while the working set (resident X + double-buffered A
    and outputs + scratch) exceeds ~100 MB -- wide-lane configs (many
    RHS columns) hit the output buffers first."""
    a_eb = 2 if split else 4
    n_a = 2 if split else 1
    tile_a = 2 * rlm * kulm * a_eb * n_a
    t = 1
    while t < t_max and t * tile_a < (2 << 20) and t * 2 <= ntiles:
        t *= 2

    def need(t):
        return (2 * nr * c * 4 + 4 * kulm * c * 4
                + 2 * t * tile_a + 4 * t * rlm * c * 4)

    while t > 1 and nr and need(t) > (100 << 20):
        t //= 2
    return t


def bsr_panel_multiply(a_panels_re, a_panels_im, xcols, mask4,
                       mb, lm, ncc, ln, interpret: bool = False,
                       precision: str = "", t_step: int = 0):
    """multiply(x_pair[NR, ncc, LN]) -> masked y_pair, for the panel solver
    (core.solve_core_panel).  Packing geometry comes from the array shapes,
    which are static under jit.  ``precision``: see _make_call (default from
    TFQ_PALLAS_MM_PREC, 'highest').  ``t_step``: tiles per grid step
    (0 = auto; env TFQ_PALLAS_TSTEP overrides)."""
    import os

    from .panel import apply_mask

    precision = precision or os.environ.get("TFQ_PALLAS_MM_PREC", "highest")
    ntiles, rlm, kulm = (int(s) for s in a_panels_re.shape)
    nr = mb * lm
    c = ncc * ln
    split = precision in ("bf16x3", "bf16x4")   # bf16x6 ships raw-f32 A
    if os.environ.get("TFQ_PALLAS_TSTEP"):
        t_step = int(os.environ["TFQ_PALLAS_TSTEP"])
    if not t_step:
        t_step = auto_t_step_rowtile(ntiles, rlm, kulm, split,
                                     nr=nr, c=c)
    T = max(int(t_step), 1)
    nsteps = -(-ntiles // T)
    call = _make_call(nsteps, rlm, kulm, lm, nr, c, interpret,
                      precision, t_step=T)
    # fuse re/im rows once (loop-invariant: XLA hoists this out of the
    # solver's while_loop) and pre-split for the bf16 modes; pad tiles to
    # whole steps (zero panels -> zero contribution) and flatten xcols
    # (2-D SMEM operands pad rows to 128 lanes)
    pad_t = nsteps * T - ntiles
    a_fused = jnp.concatenate([a_panels_re, a_panels_im], axis=1)
    if pad_t:
        a_fused = jnp.pad(a_fused, ((0, pad_t), (0, 0), (0, 0)))
    xc = jnp.asarray(xcols, jnp.int32).reshape(ntiles, -1)
    if pad_t:
        xc = jnp.pad(xc, ((0, pad_t), (0, 0)))
    xc = xc.reshape(-1)
    if split:
        from .pairpanel import split_bf16x2

        a_args = split_bf16x2(a_fused)
    else:
        a_args = (a_fused,)

    def multiply(x: Pair) -> Pair:
        y_re, y_im = call(xc, *a_args,
                          x[0].reshape(nr, c), x[1].reshape(nr, c))
        y = (y_re.reshape(-1, c)[:nr].reshape(nr, ncc, ln),
             y_im.reshape(-1, c)[:nr].reshape(nr, ncc, ln))
        return apply_mask(y, mask4, mb, lm, ncc, ln)

    return multiply


def flops_bsr_panel(ntiles: int, rlm: int, kulm: int, c: int) -> float:
    """Actual flops of one packed multiply (includes padding waste)."""
    return 8.0 * ntiles * rlm * kulm * c
