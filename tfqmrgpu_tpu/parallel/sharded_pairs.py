"""Mesh-sharded PAIRS engine: the Pallas pair-plan SpMM over a device mesh.

Completes the multi-chip story for large sparse problems (the dense-panel
sharded solver requires A to densify).  Sharding over a 1-D "rows" mesh
axis:

* the pair-plan schedule's Y TILES are split into equal contiguous chunks
  (tiles are window-sorted, so each chunk touches a contiguous window
  range); every device holds its chunk's union-ELL A panels and scalar
  tables and runs the SAME Pallas kernel on them;
* vectors are row-sharded by tile slots; each multiply completes its X
  operand with one ``all_gather`` over "rows" (the halo — as in the other
  sharded engines, XLA overlaps the gather with compute);
* per-column reductions run locally (one-hot MXU matmuls over the local
  row slice) and finish with a ``psum``; scalar recurrences replicate;
* convergence control takes global maxima, so stopping is bit-identical to
  the single-device pairs engine.
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
from ..ops import pairpanel as pp
from .sharded import make_mesh  # noqa: F401

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


class ShardedPairsSolver:
    """Host driver: packs the pair plan, shards tiles and vectors."""

    def __init__(self, plan, mesh, r_tile: int = 2,
                 precision: str = "highest", interpret: bool = False):
        self.plan = plan
        self.mesh = mesh
        self.pr = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        self.lm, self.ln = plan.lm, plan.ln
        self.precision = precision
        self.interpret = interpret

        row_of_x = np.repeat(np.arange(plan.nrows, dtype=np.int64),
                             np.diff(plan.rowptr_x))
        counts = np.diff(plan.starts).astype(np.int64)
        pair_y = np.repeat(np.arange(plan.nnzb_x, dtype=np.int64), counts)
        self.pp_plan = pp.pack_pair_plan(
            plan.pairs[:, 0], plan.pairs[:, 1], pair_y,
            plan.nnzb_x, plan.nnzb_x, self.lm, self.ln, r_tile=r_tile,
            row_of=row_of_x, col_of=plan.colindx)
        p0 = self.pp_plan

        # tiles -> pr equal chunks (pad tile count)
        self.ntiles_pad = -(-p0.ntiles // self.pr) * self.pr
        self.tiles_local = self.ntiles_pad // self.pr
        self.rows_local = self.tiles_local * r_tile * self.lm
        self.ny_rows = self.ntiles_pad * r_tile * self.lm

        # per-shard scalar tables (+1 pipeline step each); pad tiles beyond
        # the real schedule carry zero-trip pad programs and zero A panels
        wsel = np.full(self.ntiles_pad, p0.wsel[-1] if p0.ntiles else 0,
                       np.int32)
        wsel[: p0.ntiles] = p0.wsel
        cm = p0.cmax
        self.wsel_sh = np.zeros((self.pr, self.tiles_local + 1), np.int32)
        self.trips_sh = np.zeros((self.pr, self.tiles_local + 1), np.int32)
        self.codes_sh = np.full(
            (self.pr, (self.tiles_local + 1) * cm), p0.ku, np.int32)
        # full-coverage program for first-use tiles of shards whose chunk is
        # shorter than 2 real tiles (uninitialized-VMEM NaN guard)
        cover = np.arange(0, p0.ku, p0.copy_g, dtype=np.int32)
        for s in range(self.pr):
            lo = s * self.tiles_local
            hi = min((s + 1) * self.tiles_local, p0.ntiles)
            tiles = np.arange(lo, max(hi, lo))
            nt = tiles.shape[0]
            self.wsel_sh[s, :-1] = wsel[lo: lo + self.tiles_local]
            self.wsel_sh[s, -1] = self.wsel_sh[s, -2] if self.tiles_local \
                else 0
            if nt:
                codes, trips = pp._program_tables(p0, tiles, p0.ku)
                self.codes_sh[s, : nt * cm] = codes[: nt * cm]
                self.trips_sh[s, :nt] = trips[:nt]
            for j in range(nt, min(2, self.tiles_local)):
                self.codes_sh[s, j * cm: j * cm + cover.shape[0]] = cover
                self.trips_sh[s, j] = (cover.shape[0] + 1) // 2

        # one-hot column map per local row (for reductions + scaling)
        ncc = plan.ncols
        self.ncc = ncc
        colx = p0.col_of_new
        row_col = np.repeat(np.where(colx >= 0, colx, ncc),
                            self.lm).astype(np.int64)
        onehot = np.zeros((p0.x_rows_padded, ncc + 1), np.float32)
        onehot[np.arange(row_col.shape[0]), row_col] = 1.0
        onehot = onehot[:, :ncc]
        # vectors are sharded in TILE-ROW units so each shard's multiply
        # output lands exactly on its own vector rows; the window tail
        # (zero rows beyond the slots) is re-appended inside multiply
        self.vrows_local = self.tiles_local * r_tile * self.lm
        self.vec_rows_pad = self.ny_rows
        assert self.ny_rows >= (p0.n_slots or plan.nnzb_x) * self.lm
        oh_pad = np.zeros((self.vec_rows_pad, ncc), np.float32)
        n_keep = min(p0.x_rows_padded, self.vec_rows_pad)
        oh_pad[:n_keep] = onehot[:n_keep]
        self.onehot_sh = oh_pad.reshape(self.pr, self.vrows_local, ncc)

        self._a_panels = None
        self._call = None

    # ------------------------------------------------------------- data

    def set_matrix_a(self, a_re: np.ndarray, a_im: np.ndarray):
        """Build per-shard A panels (device) for the local tile chunks."""
        p0 = self.pp_plan
        panels = pp.build_a_panels_device(
            p0, jnp.asarray(a_re.astype(np.float32)),
            jnp.asarray(a_im.astype(np.float32)))
        m2 = 2 * p0.r_tile * self.lm
        k = p0.ku * self.lm
        pad = self.ntiles_pad - p0.ntiles
        panels = jnp.pad(panels, ((0, pad), (0, 0), (0, 0)))
        panels = panels.reshape(self.pr, self.tiles_local, m2, k)
        if self.precision in ("bf16", "bf16x3", "bf16x4"):
            self._a_panels = pp.split_bf16x2(panels)
        else:
            self._a_panels = (panels,)
        self._call = pp._make_call(
            self.tiles_local, p0.r_tile, p0.ku, self.lm, self.ln,
            p0.s_window, p0.x_rows_padded, self.precision, self.interpret,
            copy_g=p0.copy_g, cmax=p0.cmax)

    def _pack_vec(self, re_blocks: np.ndarray, im_blocks: np.ndarray,
                  scatter=None):
        """Blocks -> row-sharded fused vector [pr, vrows_local, 2ln]."""
        if scatter is not None:
            xr = np.zeros((self.plan.nnzb_x, self.lm, self.ln),
                          re_blocks.dtype)
            xi = np.zeros_like(xr)
            np.add.at(xr, scatter, re_blocks)
            np.add.at(xi, scatter, im_blocks)
            re_blocks, im_blocks = xr, xi
        flat = pp.permute_x(self.pp_plan, re_blocks, im_blocks)
        out = np.zeros((self.vec_rows_pad, 2 * self.ln), flat.dtype)
        n_keep = min(flat.shape[0], self.vec_rows_pad)
        out[:n_keep] = flat[:n_keep]
        return out.reshape(self.pr, self.vrows_local, 2 * self.ln)

    # ------------------------------------------------------------ solve

    def solve(self, a_re, a_im, b_re, b_im, tolerance=1e-5,
              max_iterations=300):
        if self._a_panels is None:
            self.set_matrix_a(np.asarray(a_re), np.asarray(a_im))
        b_sh = jnp.asarray(self._pack_vec(
            np.asarray(b_re, np.float32), np.asarray(b_im, np.float32),
            scatter=self.plan.subset.astype(np.int64)))
        v3 = core.make_shadow_vector(self.plan.nnzb_x, self.lm, self.ln)
        v3_sh = jnp.asarray(self._pack_vec(np.asarray(v3[0]),
                                           np.asarray(v3[1])))
        out = self._solve_core(
            self.mesh, b_sh, v3_sh, jnp.asarray(self.onehot_sh),
            jnp.asarray(self.wsel_sh), jnp.asarray(self.trips_sh),
            jnp.asarray(self.codes_sh), *self._a_panels,
            tolerance=float(tolerance),
            max_iterations=int(max_iterations))
        x_sh, status, iters, resid, rhs_status, n_probes = out
        flat = np.asarray(x_sh).reshape(self.vec_rows_pad, 2 * self.ln)
        re, im = pp.unpermute_y(self.pp_plan,
                                flat[: self.pp_plan.x_rows_padded])
        info = dict(return_status=int(status), iterations=int(iters),
                    residuum=float(resid), n_probes=int(n_probes),
                    rhs_status=np.asarray(rhs_status))
        return re + 1j * im, info

    @partial(jax.jit, static_argnames=("self", "mesh", "max_iterations"))
    def _solve_core(self, mesh, b_sh, v3_sh, onehot_sh, wsel_sh, trips_sh,
                    xloc_sh, *a_panels, tolerance=1e-5,
                    max_iterations=300):
        p0 = self.pp_plan
        ncc, ln, lm = self.ncc, self.ln, self.lm
        m = p0.r_tile * lm
        nxrows = p0.x_rows_padded
        vrl = self.vrows_local
        call = self._call
        pr = self.pr
        sdt = decisions.scalar_dtype()

        def shard_fn(b, v3, oh, ws, tr, xl, *ap):
            b = b.reshape(b.shape[1:])
            v3 = v3.reshape(v3.shape[1:])
            oh = oh.reshape(oh.shape[1:])
            ws = ws.reshape(ws.shape[1:])
            tr = tr.reshape(tr.shape[1:])
            xl = xl.reshape(xl.shape[1:])
            ap = [a.reshape(a.shape[1:]) for a in ap]

            def multiply(x):
                # halo: complete X over "rows", re-append the zero window
                # tail, build the overlapping window replicas (as in
                # PairPanelMultiply.apply), run the local-tile kernel
                xg = jax.lax.all_gather(x, "rows", axis=0, tiled=True)
                if nxrows > xg.shape[0]:
                    xg = jnp.pad(xg, ((0, nxrows - xg.shape[0]), (0, 0)))
                else:
                    xg = xg[:nxrows]
                xrep = pp._window_replicas(
                    xg, p0.n_windows, p0.s_window * lm, 2 * ln,
                    split=(len(ap) == 2), g_rows=p0.copy_g * lm)
                y = call(ws, tr, xl, *ap, xrep)
                return y.reshape(vrl, 2 * ln)

            def halves(x):
                return x[:, :ln], x[:, ln:]

            def exact_dot(o, p):
                hi, lo = pp.split_bf16x2(p)
                dt = jnp.float32
                return (jax.lax.dot(o, hi, preferred_element_type=dt)
                        + jax.lax.dot(o, lo, preferred_element_type=dt))

            def dotp(x, y):
                xr, xi = halves(x)
                yr, yi = halves(y)
                zr = exact_dot(oh.T, xr * yr - xi * yi)
                zi = exact_dot(oh.T, xr * yi + xi * yr)
                return (jax.lax.psum(zr.astype(sdt), "rows"),
                        jax.lax.psum(zi.astype(sdt), "rows"))

            def nrm2(x):
                xr, xi = halves(x)
                d = exact_dot(oh.T, xr * xr + xi * xi)
                return jax.lax.psum(d.astype(sdt), "rows")

            def _scale(a):
                dt = jnp.float32
                hp = jax.lax.Precision.HIGHEST
                return (jax.lax.dot(oh, a[0].astype(dt),
                                    preferred_element_type=dt, precision=hp),
                        jax.lax.dot(oh, a[1].astype(dt),
                                    preferred_element_type=dt, precision=hp))

            def axpy(y, x, a):
                ar, ai = _scale(a)
                xr, xi = halves(x)
                yr, yi = halves(y)
                return jnp.concatenate([ar * xr - ai * xi + yr,
                                        ai * xr + ar * xi + yi], axis=1)

            def xpay(y, a, x):
                ar, ai = _scale(a)
                xr, xi = halves(x)
                yr, yi = halves(y)
                return jnp.concatenate([xr + ar * yr - ai * yi,
                                        xi + ai * yr + ar * yi], axis=1)

            def add_rhs(v, bb, scal):
                del bb
                return v + scal * b

            prim = TfqmrPrimitives(
                multiply=multiply, dotp=dotp, nrm2=nrm2, axpy=axpy,
                xpay=xpay, add_rhs=add_rhs,
                allmax=lambda s: jax.lax.pmax(s, "rows"),
                alland=lambda s: jax.lax.pmin(s.astype(jnp.int32),
                                              "rows").astype(bool),
            )

            v5 = prim.add_rhs(jnp.zeros_like(b), b, 1.0)
            tau0 = prim.nrm2(v5)
            inv_bn2 = jnp.where(tau0 > 0,
                                1.0 / jnp.where(tau0 > 0, tau0, 1.0), 0.0)
            res = core.tfqmr_loop(prim, b, v3, v5, tau0, inv_bn2,
                                  tolerance, max_iterations, jnp.float32)
            return (res.x[None], res.return_status, res.iterations,
                    res.residuum, res.rhs_status, res.n_probes)

        r_ = P("rows")
        rep = P()
        return shard_map(
            shard_fn, mesh=mesh,
            in_specs=tuple([r_] * (6 + len(a_panels))),
            out_specs=(r_, rep, rep, rep, rep, rep),
            check_vma=False,
        )(b_sh, v3_sh, onehot_sh, wsel_sh, trips_sh, xloc_sh, *a_panels)
