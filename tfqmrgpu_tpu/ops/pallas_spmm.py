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
    """Scatter [nnzbA, LM, LM] block data into [ntiles, R*LM, ku*LM] panels."""
    lm, r = pack.lm, pack.r_tile
    p = np.zeros((pack.ntiles, r, lm, pack.ku, lm), dtype=a_blocks.dtype)
    p[pack.tile_of, pack.rslot_of, :, pack.kslot_of, :] = a_blocks
    return np.ascontiguousarray(p.reshape(pack.ntiles, r * lm, pack.ku * lm))


@functools.lru_cache(maxsize=64)
def _make_call(ntiles: int, rlm: int, kulm: int, lm: int, nr: int, c: int,
               interpret: bool):
    """Build (and cache) the pallas_call for one problem geometry."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ku = kulm // lm

    def kernel(xcols_ref, a_re_ref, a_im_ref, x_re_ref, x_im_ref,
               y_re_ref, y_im_ref, xs_re, xs_im):
        i = pl.program_id(0)

        for k in range(ku):  # static unroll; ku is a compile-time constant
            c0 = xcols_ref[i, k].astype(jnp.int32) * jnp.int32(lm)
            xs_re[pl.ds(k * lm, lm), :] = x_re_ref[pl.ds(c0, lm), :]
            xs_im[pl.ds(k * lm, lm), :] = x_im_ref[pl.ds(c0, lm), :]
        ar = a_re_ref[0]
        ai = a_im_ref[0]
        xr = xs_re[:]
        xi = xs_im[:]
        dot = functools.partial(jax.lax.dot,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        y_re_ref[0] = dot(ar, xr) - dot(ai, xi)
        y_im_ref[0] = dot(ar, xi) + dot(ai, xr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, rlm, kulm), lambda i, xc: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rlm, kulm), lambda i, xc: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, c), lambda i, xc: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, c), lambda i, xc: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rlm, c), lambda i, xc: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rlm, c), lambda i, xc: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((kulm, c), jnp.float32),
            pltpu.VMEM((kulm, c), jnp.float32),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ntiles, rlm, c), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, rlm, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * ntiles * rlm * kulm * c,
            bytes_accessed=(2 * ntiles * rlm * kulm + 4 * nr * c) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )


def bsr_panel_multiply(a_panels_re, a_panels_im, xcols, mask4,
                       mb, lm, ncc, ln, interpret: bool = False):
    """multiply(x_pair[NR, ncc, LN]) -> masked y_pair, for the panel solver
    (core.solve_core_panel).  Packing geometry comes from the array shapes,
    which are static under jit."""
    from .panel import apply_mask

    ntiles, rlm, kulm = a_panels_re.shape
    nr = mb * lm
    c = ncc * ln
    call = _make_call(int(ntiles), int(rlm), int(kulm), lm, nr, c, interpret)

    def multiply(x: Pair) -> Pair:
        y_re, y_im = call(xcols, a_panels_re, a_panels_im,
                          x[0].reshape(nr, c), x[1].reshape(nr, c))
        y = (y_re.reshape(ntiles * rlm, c)[:nr].reshape(nr, ncc, ln),
             y_im.reshape(ntiles * rlm, c)[:nr].reshape(nr, ncc, ln))
        return apply_mask(y, mask4, mb, lm, ncc, ln)

    return multiply


def flops_bsr_panel(ntiles: int, rlm: int, kulm: int, c: int) -> float:
    """Actual flops of one packed multiply (includes padding waste)."""
    return 8.0 * ntiles * rlm * kulm * c
