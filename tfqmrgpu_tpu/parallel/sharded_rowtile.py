"""Mesh-sharded ROW-TILE solver: the flagship BSR engine over a device mesh.

Shards the row-tile Pallas engine (ops/pallas_spmm.py) over a 1-D "rows"
mesh axis: each device owns a slab of A's block rows packed into union-ELL
row tiles (A blocks stream once for ALL RHS columns), completes its X
operand with one ``all_gather`` (the gathered panel then sits resident in
VMEM for the local Pallas call), and finishes the per-RHS reductions with
``psum``.  Scalar recurrences replicate; convergence control takes global
maxima, so stopping is bit-identical to the single-device engine.

Compared to ``ShardedPanelSolver`` (dense slabs) this keeps A block-sparse
-- the per-multiply A traffic is nnzbA-proportional, not (mb*LM)^2 -- and
compared to ``ShardedPairsSolver`` it does not duplicate A blocks per RHS
column.  Requires the FULL X panel to fit in a single device's VMEM
(PALLAS_X_BYTE_LIMIT), like the single-device engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .. import core
from ..core import TfqmrPrimitives
from ..ops import decisions
from ..ops import pallas_spmm as rt
from ..ops.panel import PanelLayout, apply_mask
from .sharded import make_mesh  # noqa: F401

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _ceil_to(n: int, k: int) -> int:
    return -(-n // k) * k


class ShardedRowTileSolver:
    """Host driver: packs each shard's row slab into row-tile panels."""

    def __init__(self, plan, mesh, precision: str = "c",
                 r_tile: int = 0, interpret: bool = False,
                 mm_prec: str = "highest"):
        if precision != "c":
            raise ValueError("the row-tile engine is float32-only")
        self.plan = plan
        self.mesh = mesh
        self.pr = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        self.lm, self.ln = plan.lm, plan.ln
        self.lay = PanelLayout.from_plan(plan)
        self.interpret = interpret
        self.mm_prec = mm_prec
        lm = self.lm

        r_tile = r_tile or max(1, 128 // lm)
        self.mb_pad = _ceil_to(_ceil_to(self.lay.mb, r_tile), self.pr * r_tile)
        self.mb_local = self.mb_pad // self.pr
        self.nrl = self.mb_local * lm
        self.nr = self.mb_pad * lm
        self.ncc = self.lay.ncc
        self.c = self.ncc * self.ln

        # per-shard row-tile packing of the PADDED A pattern (pad rows are
        # empty); all shards share one kernel, so pad ku to the global max
        rowptr = np.zeros(self.mb_pad + 1, np.int64)
        rowptr[: plan.nrows + 1] = plan.rowptr_a
        rowptr[plan.nrows + 1:] = plan.rowptr_a[-1]
        packs = []
        ku_max = 1
        for s in range(self.pr):
            lo, hi = s * self.mb_local, (s + 1) * self.mb_local
            rp = (rowptr[lo: hi + 1] - rowptr[lo]).astype(np.int64)
            ci = plan.colind_a[rowptr[lo]: rowptr[hi]].astype(np.int64)
            p = rt.pack_row_tiles(rp, ci, self.mb_local, lm, r_tile)
            packs.append(p)
            ku_max = max(ku_max, p.ku)
        self.r_tile = r_tile
        self.ku = ku_max
        self.ntiles_l = packs[0].ntiles
        self.packs = packs
        xcols = np.zeros((self.pr, self.ntiles_l, ku_max), np.int32)
        for s, p in enumerate(packs):
            xcols[s, :, : p.ku] = p.xcols
        self.xcols = xcols
        # X-pattern mask, padded and row-sharded: [pr, mb_local, ncc]
        mask = np.zeros((self.mb_pad, self.ncc), np.float32)
        mask[: self.lay.mb] = self.lay.mask
        self.mask_sh = mask.reshape(self.pr, self.mb_local, self.ncc)

        v3 = core.make_shadow_vector(plan.nnzb_x, self.lm, self.ln)
        self.v3 = (self._shard_panel(self.lay.pack_x(np.asarray(v3[0]))),
                   self._shard_panel(self.lay.pack_x(np.asarray(v3[1]))))
        self._a_panels = None
        self._call = None

    # ------------------------------------------------------------- helpers

    def _shard_panel(self, p):
        """[NR0, ncc, LN] -> [pr, nrl, ncc*LN] (rows padded)."""
        p = np.asarray(p)
        out = np.zeros((self.nr, self.ncc, self.ln), p.dtype)
        out[: p.shape[0]] = p
        return np.ascontiguousarray(
            out.reshape(self.pr, self.nrl, self.c))

    def set_matrix_a(self, a_re: np.ndarray, a_im: np.ndarray):
        lm, r, ku = self.lm, self.r_tile, self.ku
        kulm = ku * lm
        panels = np.zeros((self.pr, self.ntiles_l, 2 * r * lm, kulm),
                          np.float32)
        rowptr = self.plan.rowptr_a
        for s, p in enumerate(packs_ := self.packs):
            lo = s * self.mb_local
            blk_lo = int(rowptr[min(lo, self.plan.nrows)])
            blk_hi = int(rowptr[min(lo + self.mb_local, self.plan.nrows)])
            pre = rt.build_a_panels(p, a_re[blk_lo:blk_hi].astype(np.float32))
            pim = rt.build_a_panels(p, a_im[blk_lo:blk_hi].astype(np.float32))
            panels[s, :, : r * lm, : p.ku * lm] = pre
            panels[s, :, r * lm:, : p.ku * lm] = pim
        self._a_panels = jnp.asarray(panels)
        self._call = rt._make_call(self.ntiles_l, r * lm, kulm, lm,
                                   self.nr, self.c, self.interpret,
                                   self.mm_prec)

    # --------------------------------------------------------------- solve

    def solve(self, a_re, a_im, b_re, b_im, tolerance=1e-5,
              max_iterations=300, rhs_xshaped=False):
        """``rhs_xshaped=True`` takes the RHS as X-shaped blocks
        [nnzbX, LM, LN] (mixed-refinement correction solves)."""
        if self._a_panels is None:
            self.set_matrix_a(np.asarray(a_re), np.asarray(a_im))
        pack = self.lay.pack_x if rhs_xshaped else self.lay.pack_b
        b_sh = (jnp.asarray(self._shard_panel(
                    pack(np.asarray(b_re, np.float32)))),
                jnp.asarray(self._shard_panel(
                    pack(np.asarray(b_im, np.float32)))))
        out = self._solve_core(
            self.mesh, self._a_panels, jnp.asarray(self.xcols),
            b_sh[0], b_sh[1],
            jnp.asarray(self.v3[0]), jnp.asarray(self.v3[1]),
            jnp.asarray(self.mask_sh),
            tolerance=float(tolerance), max_iterations=int(max_iterations))
        x_re, x_im, status, iters, resid, rhs_status, n_probes = out
        xp = (np.asarray(x_re).reshape(self.nr, self.ncc, self.ln)
              + 1j * np.asarray(x_im).reshape(self.nr, self.ncc, self.ln))
        x_blocks = self.lay.unpack_x(xp[: self.lay.nr])
        info = dict(return_status=int(status), iterations=int(iters),
                    residuum=float(resid), n_probes=int(n_probes),
                    rhs_status=np.asarray(rhs_status))
        return x_blocks, info

    @partial(jax.jit, static_argnames=("self", "mesh", "max_iterations"))
    def _solve_core(self, mesh, a_panels, xcols, b_re, b_im, v3_re, v3_im,
                    mask_sh, tolerance=1e-5, max_iterations=300):
        lm, ln, ncc = self.lm, self.ln, self.ncc
        nrl, nr, c = self.nrl, self.nr, self.c
        ntl, rlm = self.ntiles_l, self.r_tile * lm
        mb_l = self.mb_local
        call = self._call
        split = self.mm_prec in ("bf16x3", "bf16x4")
        sdt = decisions.scalar_dtype()

        def shard_fn(ap, xc, br, bi, v3r, v3i, msk):
            ap = ap.reshape(ap.shape[1:])
            xc = xc.reshape(xc.shape[1:])
            b = (br.reshape(br.shape[1:]), bi.reshape(bi.shape[1:]))
            v3 = (v3r.reshape(v3r.shape[1:]), v3i.reshape(v3i.shape[1:]))
            msk = msk.reshape(msk.shape[1:])
            mask4 = msk[:, None, :, None]

            if split:
                from ..ops.pairpanel import split_bf16x2

                a_args = split_bf16x2(ap)
            else:
                a_args = (ap,)

            def masked(y):
                y4 = (y[0].reshape(mb_l, lm, ncc, ln) * mask4,
                      y[1].reshape(mb_l, lm, ncc, ln) * mask4)
                return (y4[0].reshape(nrl, c), y4[1].reshape(nrl, c))

            def multiply(x):
                # halo: complete the X panel over "rows"; the Pallas call
                # keeps it resident in VMEM
                xg_re = jax.lax.all_gather(x[0], "rows", axis=0,
                                           tiled=True)
                xg_im = jax.lax.all_gather(x[1], "rows", axis=0,
                                           tiled=True)
                # xcols FLAT per the kernel's 1-D SMEM contract
                y_re, y_im = call(xc.reshape(-1), *a_args, xg_re, xg_im)
                return masked((y_re.reshape(ntl * rlm, c)[:nrl],
                               y_im.reshape(ntl * rlm, c)[:nrl]))

            def dotp(x, y):
                zr = jnp.sum((x[0] * y[0] - x[1] * y[1])
                             .reshape(mb_l, lm, ncc, ln), axis=(0, 1))
                zi = jnp.sum((x[0] * y[1] + x[1] * y[0])
                             .reshape(mb_l, lm, ncc, ln), axis=(0, 1))
                return (jax.lax.psum(zr.astype(sdt), "rows"),
                        jax.lax.psum(zi.astype(sdt), "rows"))

            def nrm2(x):
                d = jnp.sum((x[0] * x[0] + x[1] * x[1])
                            .reshape(mb_l, lm, ncc, ln), axis=(0, 1))
                return jax.lax.psum(d.astype(sdt), "rows")

            def _expand(a):
                # per-(col, rhs) scalars [ncc, LN] -> the panel lane layout
                # [1, ncc*LN] (broadcast over rows)
                return (a[0].astype(jnp.float32).reshape(1, c),
                        a[1].astype(jnp.float32).reshape(1, c))

            def axpy(y, x, a):
                ar, ai = _expand(a)
                return (ar * x[0] - ai * x[1] + y[0],
                        ai * x[0] + ar * x[1] + y[1])

            def xpay(y, a, x):
                ar, ai = _expand(a)
                return (x[0] + ar * y[0] - ai * y[1],
                        x[1] + ai * y[0] + ar * y[1])

            def add_rhs(v, bb, scal):
                del bb
                return (v[0] + scal * b[0], v[1] + scal * b[1])

            prim = TfqmrPrimitives(
                multiply=multiply, dotp=dotp, nrm2=nrm2, axpy=axpy,
                xpay=xpay, add_rhs=add_rhs,
                allmax=lambda s: jax.lax.pmax(s, "rows"),
                alland=lambda s: jax.lax.pmin(s.astype(jnp.int32),
                                              "rows").astype(bool),
            )

            v5 = b
            tau0 = prim.nrm2(v5)
            inv_bn2 = jnp.where(tau0 > 0,
                                1.0 / jnp.where(tau0 > 0, tau0, 1.0), 0.0)
            res = core.tfqmr_loop(prim, b, v3, v5, tau0, inv_bn2,
                                  tolerance, max_iterations, jnp.float32)
            return (res.x[0][None], res.x[1][None], res.return_status,
                    res.iterations, res.residuum, res.rhs_status,
                    res.n_probes)

        r_ = P("rows")
        rep = P()
        return shard_map(
            shard_fn, mesh=mesh,
            in_specs=(r_, r_, r_, r_, r_, r_, r_),
            out_specs=(r_, r_, rep, rep, rep, rep, rep),
            check_vma=False,
        )(a_panels, xcols, b_re, b_im, v3_re, v3_im, mask_sh)
