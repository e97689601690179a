"""Mesh-sharded PAIRS engine: the Pallas pair-plan SpMM over a device mesh.

Completes the multi-chip story for large sparse problems (the dense-panel
sharded solver requires A to densify).  Sharding over a 1-D "rows" mesh
axis:

* the pair-plan schedule's Y TILES are split into equal contiguous chunks
  (tiles are window-sorted, so each chunk touches a contiguous window
  range); every device holds its chunk's union-ELL A panels and scalar
  tables and runs the SAME Pallas kernel on them, with the single-device
  engine's ``t_step`` grid-step batching (per-step DMA/bookkeeping is the
  kernel's fixed cost; batching T tiles amortizes it T-fold);
* vectors are row-sharded by tile slots; each multiply completes its X
  operand with one ``all_gather`` over "rows" (the halo);
* **halo overlap** (SURVEY §7 hard-part 5): each shard's tile chunk is
  split into a REMOTE prefix/suffix (tiles whose X window crosses the
  shard boundary) and a LOCAL middle (window fully inside the shard's own
  vector rows).  The local tiles run on the shard-local X slice with NO
  dependency on the all_gather, so XLA's latency-hiding scheduler overlaps
  the collective with the local Pallas call; only the boundary tiles wait
  for the gathered X.  Tile chunks stay contiguous and window-sorted, so
  the recombination is a static concat (no gather);
* per-column reductions run locally (one-hot MXU matmuls over the local
  row slice) and finish with a ``psum``; scalar recurrences replicate;
* convergence control takes global maxima, so stopping is bit-identical to
  the single-device pairs engine.
"""

from __future__ import annotations

import math
import os as _os
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


def _pad_tables(tabs, cmax):
    """Per-shard (wsel, trips, codes2d) step tables -> stacked arrays with a
    common cmax (codes flattened)."""
    pr = len(tabs)
    nsp1 = tabs[0][0].shape[0]
    wsel = np.zeros((pr, nsp1), np.int32)
    trips = np.zeros((pr, nsp1), np.int32)
    codes = np.zeros((pr, nsp1 * cmax), np.int32)
    for s, (w, t, c2) in enumerate(tabs):
        wsel[s] = w
        trips[s] = t
        codes[s].reshape(nsp1, cmax)[:, : c2.shape[1]] = c2
    return wsel, trips, codes


class ShardedPairsSolver:
    """Host driver: packs the pair plan, shards tiles and vectors."""

    def __init__(self, plan, mesh, r_tile: int = 1,
                 precision: str = "highest", interpret: bool = False,
                 t_step: int = 0, overlap: bool = True):
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
        # column grouping (same engine knob as the single-device solver;
        # see pairpanel.pack_grouped): dedups the per-shard A panels and
        # SHRINKS THE HALO -- the all_gather moves [nnzb2, lm, G*ln]
        # instead of [nnzb, lm, ln] rows, same bytes, but boundary tiles
        # per shard drop with the tile count
        self.gp = None
        self.ln0 = self.ln                   # per-RHS lane width (blocks)
        eff_nnzb = plan.nnzb_x
        cg_env = _os.environ.get("TFQ_PAIRS_COLGROUP", "0")
        want = 0
        if cg_env != "1" and plan.ncols >= 2:
            want = int(cg_env)
            if want == 0:
                cands = tuple(g for g in (1, 2, 4, 8)
                              if g * self.ln <= 512)
                try:
                    want, _ = pp.auto_group_size(
                        plan.pairs[:, 0], plan.pairs[:, 1], pair_y,
                        plan.nnzb_x, self.lm, self.ln, precision,
                        row_of=row_of_x, col_of=plan.colindx,
                        candidates=cands)
                except ValueError:
                    want = 0
        # resident-X and stride-factor window layouts are both admissible
        # here: resident plans shard on absolute tile spans (the remote
        # call holds the full gathered panel resident; the local call the
        # shard's X slice), windowed plans on window boundaries.
        # TFQ_PAIRS_RESIDENT=0 (the pack-level knob, same as the
        # single-device engine) or TFQ_SHARDED_RESIDENT=0 (the local-
        # window knob -- the only local layout a resident pack has)
        # vetoes resident PACK candidates.
        res_env = _os.environ.get("TFQ_SHARDED_RESIDENT", "auto")
        allow_res = (res_env != "0"
                     and _os.environ.get("TFQ_PAIRS_RESIDENT", "auto")
                     != "0")
        self.gp, self.pp_plan = pp.pack_grouped_plan(
            plan.pairs[:, 0], plan.pairs[:, 1], pair_y,
            plan.nnzb_x, self.lm, self.ln, max(want, 1), precision,
            row_of=row_of_x, col_of=plan.colindx, r_tile=r_tile,
            force=(want > 1 and cg_env not in ("0", "1")),
            allow_resident=allow_res)
        if self.gp is not None:
            self.ln = self.gp.ln2
            eff_nnzb = self.gp.nnzb2
        p0 = self.pp_plan
        lm, S, g = self.lm, p0.s_window, p0.copy_g
        self.swrows = S * lm
        self.resident_plan = bool(p0.resident)
        self.orows = p0.o_blocks * lm        # window cover rows past S

        # tiles -> pr equal contiguous chunks.  Windowed plans: the chunk
        # row count must be a multiple of the window row count so every
        # shard's rows start on a window boundary (uniform shapes inside
        # shard_map; per-shard window bases go into the scalar TABLES,
        # which are data).  Resident plans have no window grid -- any
        # whole-tile chunking works.
        per = -(-p0.ntiles // self.pr)
        if self.resident_plan:
            self.tiles_local = max(per, 1)
        else:
            lcm_rows = (S * r_tile) // math.gcd(S, r_tile)  # tiles/window
            self.tiles_local = -(-per // lcm_rows) * lcm_rows
        self.ntiles_pad = self.tiles_local * self.pr
        self.rows_local = self.tiles_local * r_tile * lm
        self.ny_rows = self.ntiles_pad * r_tile * lm
        self.vrows_local = self.rows_local
        self.vec_rows_pad = self.ny_rows
        if self.resident_plan:
            self.nwin_local = 1
        else:
            assert self.vrows_local % self.swrows == 0
            self.nwin_local = self.vrows_local // self.swrows

        # TILE-pipelined kernels for the RESIDENT calls (r3; same verdict
        # as the single-chip engine: per-tile scratch buffers are
        # t-independent, so wide grouped lanes batch freely -- the
        # exact-quality single-chip champion runs this kernel).  Windowed
        # calls stay step-pipelined (use_tile_pipe is False for them).
        self.tile_pipe = pp.use_tile_pipe(p0, precision)

        # t_step: auto (VMEM model) unless overridden; per-shard tables
        # may still overflow the window span -> halve and retry
        env_t = _os.environ.get("TFQ_PAIRS_TSTEP")
        want_t = int(t_step or (env_t if env_t else 0)) or \
            pp.auto_t_step(p0, precision, tile_pipe=self.tile_pipe)

        # local/remote split: tiles whose X reads lie fully inside the
        # owning shard's vector rows need no halo.  Windowed plans bound a
        # tile's reads by its window cover; resident plans by the union's
        # absolute block span.  The not-local tiles must form a prefix +
        # suffix of each chunk (window-sorted tiles make the local run
        # contiguous; if it is not, overlap is off); take uniform p, q =
        # max over shards (interior shards just over-mark a few tiles as
        # remote).  Pad tiles count as local (they read nothing).
        if self.resident_plan:
            idx = np.arange(p0.ntiles)
            lo_blk = p0.xloc[idx, 0].astype(np.int64)
            hi_blk = p0.xloc[idx, np.maximum(p0.kcount - 1, 0)] \
                .astype(np.int64)
            win_lo = lo_blk * lm
            win_hi = (hi_blk + 1) * lm
        else:
            wsel = p0.wsel
            win_lo = wsel.astype(np.int64) * self.swrows
            win_hi = ((wsel.astype(np.int64) + 1) * self.swrows
                      + self.orows + g * lm)
        p_max = q_max = 0
        tl = self.tiles_local
        for s in range(self.pr):
            ids = np.arange(s * tl, (s + 1) * tl)
            real = ids < p0.ntiles
            ok = np.ones(tl, bool)
            rr = ids[real]
            ok[real] = ((win_lo[rr] >= s * self.vrows_local)
                        & (win_hi[rr] <= (s + 1) * self.vrows_local))
            if not ok.any():
                p_max = tl
                break
            first_ok = int(np.argmax(ok))
            last_ok = tl - 1 - int(np.argmax(ok[::-1]))
            if not ok[first_ok: last_ok + 1].all():
                p_max = tl          # non-contiguous local run: no overlap
                break
            p_max = max(p_max, first_ok)
            q_max = max(q_max, tl - 1 - last_ok)
        self.overlap = (overlap
                        and _os.environ.get("TFQ_SHARDED_OVERLAP", "1")
                        != "0"
                        and p_max + q_max < self.tiles_local)
        self.p, self.q = (p_max, q_max) if self.overlap else \
            (self.tiles_local, 0)
        self.n_loc = self.tiles_local - self.p - self.q

        # per-shard RESIDENT local window: hold the shard's whole X slice
        # in VMEM behind a constant-index BlockSpec -- the local call then
        # skips both the per-iteration replica build and the in-kernel
        # window re-streaming (the single-device resident-X design,
        # applied shard-locally).  TFQ_SHARDED_RESIDENT: auto|0|1.
        # Resident-source plans REQUIRE it (they carry no window grid for
        # a windowed local call) -- if the slice cannot be resident, the
        # local/remote split is abandoned and everything runs remote.
        win2 = 2 * (self.vrows_local + g * lm) * 8 * self.ln
        self.loc_resident = (
            res_env != "0" and self.n_loc > 0
            and self.vrows_local // lm + g <= 0x7FFF
            and (res_env == "1" or self.resident_plan
                 or win2 <= (72 << 20)))
        if self.resident_plan and self.n_loc and (
                not self.loc_resident
                or win2 > (100 << 20)):
            self.overlap = False
            self.p, self.q = self.tiles_local, 0
            self.n_loc = 0
            self.loc_resident = False

        # NEIGHBOR-HALO mode (resident plans): when every boundary tile's
        # X span stays within the immediately adjacent shards' rows, the
        # remote call reads an EXTENDED local window [s*B - Hlo, (s+1)*B
        # + Hhi) assembled from two fixed-size edge slabs moved by
        # ppermute -- per-shard ICI bytes then stay CONSTANT as the mesh
        # grows (the all_gather fallback moves the whole global panel:
        # (pr-1)x the shard bytes, which kills weak scaling).  Uniform
        # Hlo/Hhi = max over shards (static shapes inside shard_map).
        # TFQ_SHARDED_HALO=0 forces the all_gather path.
        self.h_lo = self.h_hi = 0
        self.halo = False
        if (self.resident_plan and self.p + self.q
                and self.p + self.q < self.tiles_local
                and _os.environ.get("TFQ_SHARDED_HALO", "1") != "0"):
            bl = self.vrows_local // lm
            h_lo = h_hi = 0
            ok_halo = True
            tlc = self.tiles_local
            for s in range(self.pr):
                ids = np.concatenate([
                    np.arange(s * tlc, s * tlc + self.p),
                    np.arange((s + 1) * tlc - self.q, (s + 1) * tlc)])
                ids = ids[ids < p0.ntiles]
                if ids.size == 0:
                    continue
                h_lo = max(h_lo, int(np.max(s * bl - lo_blk[ids],
                                            initial=0)))
                h_hi = max(h_hi, int(np.max(hi_blk[ids] + 1 - (s + 1) * bl,
                                            initial=0)))
            if h_lo > bl or h_hi > bl:
                ok_halo = False     # spans reach beyond +-1 neighbor
            ext = bl + h_lo + h_hi
            if ok_halo and ext + g <= 0x7FFF:
                self.h_lo, self.h_hi = h_lo, h_hi
                self.halo = True

        # per-shard step tables (remote tiles see FULL-X windows; local
        # tiles see the shard-local window slice, rebased)
        t = want_t
        while True:
            try:
                self._build_tables(t)
                break
            except ValueError:
                if t <= 1:
                    raise
                t = max(1, t // 2)
        self.t_step = t

        # one-hot column map per local row (for reductions + scaling);
        # grouped: the one-hot contracts GROUPS, the (group, lane-block)
        # -> column remap happens after the psum, and a per-slot lane mask
        # zeroes grouped products on absent lanes
        ncc = plan.ncols
        self.ncc = ncc
        n_oh = self.gp.ngroups if self.gp is not None else ncc
        colx = p0.col_of_new
        row_col = np.repeat(np.where(colx >= 0, colx, n_oh),
                            self.lm).astype(np.int64)
        onehot = np.zeros((p0.x_rows_padded, n_oh + 1), np.float32)
        onehot[np.arange(row_col.shape[0]), row_col] = 1.0
        onehot = onehot[:, :n_oh]
        assert self.ny_rows >= (p0.n_slots or eff_nnzb) * self.lm
        oh_pad = np.zeros((self.vec_rows_pad, n_oh), np.float32)
        n_keep = min(p0.x_rows_padded, self.vec_rows_pad)
        oh_pad[:n_keep] = onehot[:n_keep]
        self.onehot_sh = oh_pad.reshape(self.pr, self.vrows_local, n_oh)
        self.n_oh = n_oh
        if self.gp is not None:
            gsz = self.gp.group_size
            gc = np.zeros(ncc, np.int64)
            for gi, grp in enumerate(self.gp.groups):
                for cpos, c in enumerate(grp):
                    gc[c] = gi * gsz + cpos
            self.gc_np = gc
            m_slot = pp.grouped_lane_mask(p0, self.gp)  # [slots, 2ln2]
            slots_pad = self.vec_rows_pad // self.lm
            mp = np.zeros((slots_pad, m_slot.shape[1]), np.float32)
            keep = min(m_slot.shape[0], slots_pad)
            mp[:keep] = m_slot[:keep]
            self.mask_sh = mp.reshape(self.pr, self.vrows_local // self.lm,
                                      2 * self.ln)
        else:
            self.gc_np = None
            self.mask_sh = np.ones(
                (self.pr, 1, 2 * self.ln), np.float32)

        self._a_panels = None
        self._call_loc = None
        self._call_rem = None

    def _build_tables(self, t: int):
        """Per-shard step tables for the remote and local calls."""
        p0 = self.pp_plan
        tl, p, q = self.tiles_local, self.p, self.q
        nt_real = p0.ntiles
        rem_tabs, loc_tabs = [], []
        rem_cmax = loc_cmax = 2
        self.nsteps_rem = -(-max(p + q, 1) // t) if (p + q) else 0
        self.nsteps_loc = -(-max(self.n_loc, 1) // t) if self.n_loc else 0
        # resident-source plans: the remote call holds the full gathered
        # panel resident (halo mode: the shard's rows extended by the
        # neighbor edge slabs), so its tables validate against that span
        bl = self.vrows_local // self.lm
        if self.halo:
            rem_span = bl + self.h_lo + self.h_hi
        elif self.resident_plan:
            rem_span = p0.x_rows_padded // self.lm
        else:
            rem_span = 0
        for s in range(self.pr):
            base = s * tl
            chunk = np.arange(base, base + tl, dtype=np.int64)
            chunk[chunk >= nt_real] = -1        # pad tiles
            if p + q:
                rem_ids = np.concatenate([chunk[:p], chunk[tl - q:] if q
                                          else chunk[:0]])
                rem_ids = np.pad(rem_ids, (0, self.nsteps_rem * t
                                           - rem_ids.shape[0]),
                                 constant_values=-1)
                rem_base = (s * bl - self.h_lo) if self.halo else 0
                if self.tile_pipe:
                    c, tr, cm = pp.make_tile_tables(
                        p0, rem_ids, src_base=rem_base, span=rem_span)
                    w = np.zeros(rem_ids.shape[0], np.int32)
                    rem_tabs.append((w, tr,
                                     c.reshape(rem_ids.shape[0], cm)))
                else:
                    ns, w, c, tr, cm = pp.make_step_tables(
                        p0, t, tiles=rem_ids, resident_span=rem_span,
                        src_base=rem_base)
                    assert ns == self.nsteps_rem
                    rem_tabs.append((w, tr, c.reshape(ns + 1, cm)))
                rem_cmax = max(rem_cmax, cm)
            if self.n_loc:
                loc_ids = np.pad(chunk[p: tl - q if q else tl],
                                 (0, self.nsteps_loc * t - self.n_loc),
                                 constant_values=-1)
                span = (self.vrows_local // self.lm
                        if self.loc_resident else 0)
                if self.resident_plan and self.tile_pipe:
                    c, tr, cm = pp.make_tile_tables(
                        p0, loc_ids, src_base=s * bl, span=bl)
                    w = np.zeros(loc_ids.shape[0], np.int32)
                    loc_tabs.append((w, tr,
                                     c.reshape(loc_ids.shape[0], cm)))
                    loc_cmax = max(loc_cmax, cm)
                    continue
                if self.resident_plan:
                    # sources are absolute block ids; rebase to the
                    # shard's local slice start
                    ns, w, c, tr, cm = pp.make_step_tables(
                        p0, t, tiles=loc_ids, resident_span=span,
                        src_base=s * (self.vrows_local // self.lm))
                else:
                    w_base = (s * self.vrows_local) // self.swrows
                    ns, w, c, tr, cm = pp.make_step_tables(
                        p0, t, tiles=loc_ids, wsel_base=w_base,
                        resident_span=span)
                assert ns == self.nsteps_loc
                # windowed local replicas expose nwin_local-1 windows at
                # the legacy O == S cover (3-segment replica build) and
                # nwin_local at stride covers (O + g <= S)
                if not self.loc_resident:
                    max_w = self.nwin_local - (
                        2 if self.orows + p0.copy_g * self.lm > self.swrows
                        else 1)
                    if w[: ns].max(initial=0) > max(max_w, 0):
                        raise ValueError("local window index out of range")
                loc_tabs.append((w, tr, c.reshape(ns + 1, cm)))
                loc_cmax = max(loc_cmax, cm)
        self.rem_cmax, self.loc_cmax = rem_cmax, loc_cmax
        if rem_tabs:
            self.wsel_rem, self.trips_rem, self.codes_rem = \
                _pad_tables(rem_tabs, rem_cmax)
        if loc_tabs:
            self.wsel_loc, self.trips_loc, self.codes_loc = \
                _pad_tables(loc_tabs, loc_cmax)

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
        if pp.precision_props(self.precision)["a_presplit"]:
            parts = pp.split_bf16x2(panels)
        else:
            parts = (panels,)
        from . import multihost as mh

        if mh.is_multiprocess():
            # panels were built process-locally; re-enter as global
            # row-sharded arrays for the multi-host mesh
            parts = tuple(self._to_dev(np.asarray(p)) for p in parts)
        self._a_panels = parts
        mk = dict(copy_g=p0.copy_g, t_step=self.t_step)
        tp = self.tile_pipe
        if self.n_loc:
            if self.loc_resident:
                self._call_loc = pp._make_call(
                    self.nsteps_loc, p0.r_tile, p0.ku, self.lm, self.ln,
                    self.vrows_local // self.lm, self.vrows_local,
                    self.precision, self.interpret, cmax=self.loc_cmax,
                    resident=True, tile_pipe=tp, **mk)
            else:
                self._call_loc = pp._make_call(
                    self.nsteps_loc, p0.r_tile, p0.ku, self.lm, self.ln,
                    p0.s_window, self.vrows_local, self.precision,
                    self.interpret, cmax=self.loc_cmax,
                    o_blocks=p0.o_blocks, **mk)
        if self.p + self.q:
            if self.halo:
                # boundary tiles read the shard's rows EXTENDED by the
                # neighbor edge slabs (ppermute halo), held resident
                ext = self.vrows_local // self.lm + self.h_lo + self.h_hi
                self._call_rem = pp._make_call(
                    self.nsteps_rem, p0.r_tile, p0.ku, self.lm, self.ln,
                    ext, ext * self.lm,
                    self.precision, self.interpret, cmax=self.rem_cmax,
                    resident=True, tile_pipe=tp, **mk)
            elif self.resident_plan:
                # boundary tiles read the full gathered panel, held
                # resident in VMEM (the pack's VMEM check admitted it)
                self._call_rem = pp._make_call(
                    self.nsteps_rem, p0.r_tile, p0.ku, self.lm, self.ln,
                    p0.x_rows_padded // self.lm, p0.x_rows_padded,
                    self.precision, self.interpret, cmax=self.rem_cmax,
                    resident=True, tile_pipe=tp, **mk)
            else:
                self._call_rem = pp._make_call(
                    self.nsteps_rem, p0.r_tile, p0.ku, self.lm, self.ln,
                    p0.s_window, p0.x_rows_padded, self.precision,
                    self.interpret, cmax=self.rem_cmax,
                    o_blocks=p0.o_blocks, **mk)

    def _pack_vec(self, re_blocks: np.ndarray, im_blocks: np.ndarray,
                  scatter=None):
        """Blocks -> row-sharded fused vector [pr, vrows_local, 2ln]."""
        if scatter is not None:
            xr = np.zeros((self.plan.nnzb_x, self.lm, self.ln0),
                          re_blocks.dtype)
            xi = np.zeros_like(xr)
            np.add.at(xr, scatter, re_blocks)
            np.add.at(xi, scatter, im_blocks)
            re_blocks, im_blocks = xr, xi
        if self.gp is not None:
            re_blocks = np.asarray(pp.grouped_blocks(self.gp, re_blocks))
            im_blocks = np.asarray(pp.grouped_blocks(self.gp, im_blocks))
        flat = pp.permute_x(self.pp_plan, re_blocks, im_blocks)
        out = np.zeros((self.vec_rows_pad, 2 * self.ln), flat.dtype)
        n_keep = min(flat.shape[0], self.vec_rows_pad)
        out[:n_keep] = flat[:n_keep]
        return out.reshape(self.pr, self.vrows_local, 2 * self.ln)

    # ------------------------------------------------------------ solve

    def _to_dev(self, arr):
        """Row-sharded device array; multi-PROCESS meshes route through
        the global-array constructor (see parallel.multihost)."""
        from . import multihost as mh

        if mh.is_multiprocess():
            return mh.put_global(np.asarray(arr), self.mesh, P("rows"))
        return jnp.asarray(arr)

    def solve(self, a_re, a_im, b_re, b_im, tolerance=1e-5,
              max_iterations=300, rhs_xshaped=False):
        """``rhs_xshaped=True`` takes the RHS as X-shaped blocks
        [nnzbX, LM, LN] instead of B-shaped blocks scattered through the
        subset list — the entry used by mixed-precision refinement, whose
        correction equation A·dX == R has an X-patterned RHS."""
        from . import multihost as mh

        if self._a_panels is None:
            self.set_matrix_a(np.asarray(a_re), np.asarray(a_im))
        b_sh = self._to_dev(self._pack_vec(
            np.asarray(b_re, np.float32), np.asarray(b_im, np.float32),
            scatter=None if rhs_xshaped
            else self.plan.subset.astype(np.int64)))
        v3 = core.make_shadow_vector(self.plan.nnzb_x, self.lm, self.ln0)
        v3_sh = self._to_dev(self._pack_vec(np.asarray(v3[0]),
                                            np.asarray(v3[1])))
        tabs = []
        for name in ("wsel_rem", "trips_rem", "codes_rem",
                     "wsel_loc", "trips_loc", "codes_loc"):
            arr = getattr(self, name, None)
            tabs.append(self._to_dev(arr) if arr is not None else
                        self._to_dev(np.zeros((self.pr, 1), np.int32)))
        out = self._solve_core(
            self.mesh, b_sh, v3_sh, self._to_dev(self.onehot_sh),
            self._to_dev(self.mask_sh),
            *tabs, *self._a_panels,
            tolerance=float(tolerance),
            max_iterations=int(max_iterations))
        x_sh, status, iters, resid, rhs_status, n_probes = out
        if mh.is_multiprocess():
            flat = mh.gather_global(x_sh, self.mesh)
        else:
            flat = np.asarray(x_sh)
        flat = flat.reshape(self.vec_rows_pad, 2 * self.ln)
        re, im = pp.unpermute_y(self.pp_plan,
                                flat[: self.pp_plan.x_rows_padded])
        if self.gp is not None:
            re = pp.ungroup_blocks(self.gp, re)
            im = pp.ungroup_blocks(self.gp, im)
        info = dict(return_status=int(status), iterations=int(iters),
                    residuum=float(resid), n_probes=int(n_probes),
                    rhs_status=np.asarray(rhs_status))
        return re + 1j * im, info

    @partial(jax.jit, static_argnames=("self", "mesh", "max_iterations"))
    def _solve_core(self, mesh, b_sh, v3_sh, onehot_sh, mask_sh,
                    wsel_rem, trips_rem, codes_rem,
                    wsel_loc, trips_loc, codes_loc,
                    *a_panels, tolerance=1e-5, max_iterations=300):
        p0 = self.pp_plan
        ncc, ln, lm = self.ncc, self.ln, self.lm
        gp = self.gp
        gsz = gp.group_size if gp is not None else 1
        ln0 = ln // gsz
        gc = jnp.asarray(self.gc_np) if gp is not None else None
        n_oh = self.n_oh
        m = p0.r_tile * lm
        nxrows = p0.x_rows_padded
        vrl = self.vrows_local
        tl, p_, q_, nloc = self.tiles_local, self.p, self.q, self.n_loc
        t = self.t_step
        call_loc, call_rem = self._call_loc, self._call_rem
        # X-window split planes (1 = raw f32, 2 = [hi|lo], 3 = [hi|mid|lo]
        # for the exact-quality bf16x6 mode whose A ships raw f32)
        split = pp.precision_props(self.precision)["xsplit"]
        sdt = decisions.scalar_dtype()
        g_rows = p0.copy_g * lm

        def shard_fn(b, v3, oh, msk, wr, tr_r, cr, wl, tr_l, cl, *ap):
            b = b.reshape(b.shape[1:])
            v3 = v3.reshape(v3.shape[1:])
            oh = oh.reshape(oh.shape[1:])
            msk = msk.reshape(msk.shape[1:])
            wr, tr_r, cr = (x.reshape(x.shape[1:]) for x in (wr, tr_r, cr))
            wl, tr_l, cl = (x.reshape(x.shape[1:]) for x in (wl, tr_l, cl))
            ap = [a.reshape(a.shape[1:]) for a in ap]

            def multiply(x):
                """Local tiles run on the shard's own X rows while the
                halo collective (neighbor-edge ppermutes, or the
                all_gather fallback) completes X for the boundary
                (remote) tiles -- issued first so it overlaps the local
                call."""
                parts = []
                if p_ + q_:
                    if self.halo:
                        # receive the upper neighbor's first h_hi rows
                        # and the lower neighbor's last h_lo rows; edge
                        # shards get zeros (never addressed: their tiles
                        # stay inside the global panel)
                        slabs = []
                        if self.h_lo:
                            hl = self.h_lo * lm
                            slabs.append(jax.lax.ppermute(
                                x[vrl - hl:], "rows",
                                [(r, r + 1) for r in range(self.pr - 1)]))
                        slabs.append(x)
                        if self.h_hi:
                            hh = self.h_hi * lm
                            slabs.append(jax.lax.ppermute(
                                x[:hh], "rows",
                                [(r + 1, r) for r in range(self.pr - 1)]))
                        xg = jnp.concatenate(slabs) if len(slabs) > 1 \
                            else slabs[0]
                        xrep = pp._window_replicas(
                            xg, 1, xg.shape[0], 2 * ln, split=split,
                            g_rows=g_rows, resident=True)
                    elif self.resident_plan:
                        xg = jax.lax.all_gather(x, "rows", axis=0,
                                                tiled=True)
                        if nxrows > xg.shape[0]:
                            xg = jnp.pad(
                                xg, ((0, nxrows - xg.shape[0]), (0, 0)))
                        else:
                            xg = xg[:nxrows]
                        xrep = pp._window_replicas(
                            xg, 1, nxrows, 2 * ln, split=split,
                            g_rows=g_rows, resident=True)
                    else:
                        xg = jax.lax.all_gather(x, "rows", axis=0,
                                                tiled=True)
                        if nxrows > xg.shape[0]:
                            xg = jnp.pad(
                                xg, ((0, nxrows - xg.shape[0]), (0, 0)))
                        else:
                            xg = xg[:nxrows]
                        xrep = pp._window_replicas(
                            xg, nxrows // self.swrows, self.swrows,
                            2 * ln, split=split, g_rows=g_rows,
                            orows=self.orows)
                    ap_rem = [
                        jnp.pad(jnp.concatenate([a[:p_], a[tl - q_:]]
                                                if q_ else [a[:p_]]),
                                ((0, self.nsteps_rem * t - p_ - q_),
                                 (0, 0), (0, 0)))
                        for a in ap]
                    y_rem = call_rem(wr, tr_r, cr, *ap_rem, xrep)
                    y_rem = y_rem.reshape(-1, 2 * ln)
                if nloc:
                    if self.loc_resident:
                        xrep_l = pp._window_replicas(
                            x, 1, vrl, 2 * ln, split=split,
                            g_rows=g_rows, resident=True)
                    else:
                        xrep_l = pp._window_replicas(
                            x, self.nwin_local, self.swrows, 2 * ln,
                            split=split, g_rows=g_rows, orows=self.orows)
                    ap_loc = [
                        jnp.pad(a[p_: tl - q_ if q_ else tl],
                                ((0, self.nsteps_loc * t - nloc),
                                 (0, 0), (0, 0)))
                        for a in ap]
                    y_loc = call_loc(wl, tr_l, cl, *ap_loc, xrep_l)
                    y_loc = y_loc.reshape(-1, 2 * ln)[: nloc * m]
                if p_ + q_ and nloc:
                    y = jnp.concatenate(
                        [y_rem[: p_ * m], y_loc,
                         y_rem[p_ * m: (p_ + q_) * m]])
                elif nloc:
                    y = y_loc
                else:
                    y = y_rem[: tl * m]
                # grouped: zero products on absent lanes of existing cells
                return (y.reshape(-1, lm, 2 * ln)
                        * msk[:, None, :]).reshape(-1, 2 * ln)

            def halves(x):
                return x[:, :ln], x[:, ln:]

            def exact_dot(o, pmat):
                hi, lo = pp.split_bf16x2(pmat)
                dt = jnp.float32
                return (jax.lax.dot(o, hi, preferred_element_type=dt)
                        + jax.lax.dot(o, lo, preferred_element_type=dt))

            def _remap(z):
                """[n_oh, ln] group sums -> [ncc, ln0] per-column sums."""
                if gp is None:
                    return z
                return z.reshape(n_oh * gsz, ln0)[gc]

            def dotp(x, y):
                xr, xi = halves(x)
                yr, yi = halves(y)
                zr = exact_dot(oh.T, xr * yr - xi * yi)
                zi = exact_dot(oh.T, xr * yi + xi * yr)
                return (_remap(jax.lax.psum(zr, "rows")).astype(sdt),
                        _remap(jax.lax.psum(zi, "rows")).astype(sdt))

            def nrm2(x):
                xr, xi = halves(x)
                d = exact_dot(oh.T, xr * xr + xi * xi)
                return _remap(jax.lax.psum(d, "rows")).astype(sdt)

            def _scale(a):
                dt = jnp.float32
                hp = jax.lax.Precision.HIGHEST

                def expand(v):
                    v = v.astype(dt)
                    if gp is not None:
                        flat = jnp.zeros((n_oh * gsz, ln0), dt)
                        v = flat.at[gc].set(v).reshape(n_oh, ln)
                    return jax.lax.dot(oh, v, preferred_element_type=dt,
                                       precision=hp)

                return expand(a[0]), expand(a[1])

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
            in_specs=tuple([r_] * (10 + len(a_panels))),
            out_specs=(r_, rep, rep, rep, rep, rep),
            check_vma=False,
        )(b_sh, v3_sh, onehot_sh, mask_sh, wsel_rem, trips_rem, codes_rem,
          wsel_loc, trips_loc, codes_loc, *a_panels)
