"""High-level plan/handle-style solver API (layer L3 equivalent).

The reference exposes a 10-step C workflow (createHandle -> createPlan ->
bufferSize -> setBuffer -> setMatrix('A'/'B') -> solve -> getInfo ->
getMatrix('X') -> destroy*, see tfqmrgpu.cu:700-791).  On TPU the handle and
explicit buffer management dissolve -- XLA owns device memory and streams --
so the surviving state is the ``Solver`` object: plan + device-resident
matrices + compiled solve.  ``api.py`` layers a call-by-call C-API-parity
shim on top of this for users porting from the reference.
"""

from __future__ import annotations

import dataclasses
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import core
from .profiling import trace
from .bsr import Bsr
from .errors import Status, TfqmrgpuError, encode_status
from .ops import layout as layout_ops
from .ops.decisions import scalar_dtype as decisions_scalar_dtype
from .ops import panel as panel_ops
from .ops.blocksparse import BlockSparseAction
from .plan import Plan, create_plan

# 'auto' picks 'dense' while the dense A planes fit in this many bytes
# (both planes together) AND the pattern is dense-ish; sparse patterns
# prefer the row-tile Pallas engine when the X panel fits VMEM.
DENSE_A_BYTE_LIMIT = int(64e6)
# X panel residency budget for the row-tile 'pallas' engine (v5e VMEM is
# 128 MB; leave room for A double-buffers and scratch)
PALLAS_X_BYTE_LIMIT = 90 << 20


def _dtype_for(precision: str):
    if precision == "z":
        if not jax.config.read("jax_enable_x64"):
            raise TfqmrgpuError(
                encode_status(Status.PRECISION_MISSMATCH),
                "'z' (complex128) precision requires jax_enable_x64; call "
                "tfqmrgpu_tpu.enable_x64() first",
            )
        return jnp.float64
    if precision == "c":
        return jnp.float32
    raise TfqmrgpuError(encode_status(Status.PRECISION_MISSMATCH),
                        f"precision must be 'z' or 'c', got {precision!r}")


@dataclasses.dataclass
class SolveInfo:
    """getInfo parity (tfqmrgpu.cu:663-679)."""

    residuum_reached: float
    iterations_needed: int
    flops_performed: float
    flops_performed_all: float
    return_status: int = 0
    rhs_status: Optional[np.ndarray] = None


class Solver:
    """Block-sparse tfQMR solver for A @ X == B.

    Args:
      a, x, b: BSR operators.  A must carry square [LM, LM] blocks; B carries
        [LM, LN] blocks; X provides the solution pattern (data optional).
        B's pattern must be a subset of X's.
      precision: 'z' (complex128) or 'c' (complex64).
      engine: SpMM/vector engine:
        'dense'  -- panel engine, A densified (fast for moderate mb);
        'pallas' -- panel engine, BSR A streamed by the Pallas kernel;
        'pairs'  -- pair-plan engine: Pallas union-ELL panels over the
                    plan's multiplication pair list with RCM-relabeled
                    fused vectors (general BSR, X too big to densify);
        'xla'    -- block-list engine (reference-shaped data path);
        'auto'   -- 'dense' for small or genuinely dense A; else (for
                    'c') the row-tile 'pallas' engine when the X panel
                    fits VMEM and the pattern packs (A blocks stream once
                    for ALL RHS columns -- measured 2.6x faster full
                    iterations than 'pairs' on banded operators); else
                    'pairs'; 'xla' as the last resort.
      index_offset: 0 for C-style, 1 for Fortran-style rowptr/colind.
    """

    def __init__(self, a: Bsr, x: Bsr, b: Bsr, *, precision: str = "z",
                 engine: str = "auto", index_offset: int = 0, echo: int = 0,
                 lm: int = 0, ln: int = 0, plan: Optional[Plan] = None):
        self.plan: Plan = plan if plan is not None else create_plan(
            a, x, b, index_offset=index_offset, echo=echo)
        self.precision = precision
        self.dtype = _dtype_for(precision)
        self.echo = echo
        lm = lm or a.slow_block_dim or (x.slow_block_dim or b.slow_block_dim)
        ln = ln or (b.fast_block_dim or x.fast_block_dim) or lm
        if lm < 1:
            raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                                "cannot infer block dims; attach data to A/B")
        if ln < lm:
            raise TfqmrgpuError(
                encode_status(Status.UNDOCUMENTED_ERROR),
                f"LN={ln} < LM={lm}: rectangular blocks need LN >= LM")
        self.lm, self.ln = int(lm), int(ln)
        self.plan.lm, self.plan.ln = self.lm, self.ln
        self.plan.precision = precision

        rsize = 8 if precision == "z" else 4
        auto = engine == "auto"
        if auto:
            nr = self.plan.nrows * self.lm
            dense_bytes = 2 * nr * nr * rsize
            a_fill = self.plan.nnzb_a / max(self.plan.nrows ** 2, 1)
            x_panel_bytes = 2 * nr * self.plan.ncols * self.ln * 4
            if dense_bytes <= DENSE_A_BYTE_LIMIT or (
                    a_fill >= 0.25 and dense_bytes <= int(4e9)):
                engine = "dense"
            elif (precision == "c" and self.lm >= 8
                  and x_panel_bytes <= PALLAS_X_BYTE_LIMIT):
                # row-tile Pallas engine: A blocks stream ONCE for all RHS
                # columns (the pairs layout duplicates them per column);
                # requires the X panel resident in VMEM.  Falls through to
                # 'pairs' if the pattern inflates too much (checked below).
                engine = "pallas"
            elif precision == "c":
                engine = "pairs"     # falls back to xla if the pattern has
                # no recoverable locality (pack raises below); exact-f32
                # compiles for all lm (bf16 modes coerce below)
            elif self.lm >= 16:
                # 'z' on the pair-panel Ozaki kernel (bf16 window tiling
                # needs LM >= 16); falls back to xla below like 'c'
                engine = "pairs"
            else:
                # 'z' at small LM: the pairs engine composes the
                # SUPERBLOCK row merge (ops/superblock.py) so the Ozaki
                # kernel runs at merged LM' in {16, 32} -- the measured
                # fast path for the reference's own FD geometry (LM=8,
                # tfqmrgpu_generate_FD_example.cxx:916-923).  Patterns
                # that cannot merge fall back to the block-list engine
                # (spmm_pairs_oz) via the ValueError path below.
                engine = "pairs"
        self.engine = engine
        if engine == "pallas" and precision != "c":
            raise TfqmrgpuError(
                encode_status(Status.PRECISION_MISSMATCH),
                f"the {engine} engine is float32-only; use precision='c' "
                "(no f64 MXU on TPU) or engine='dense'")
        # pairs accepts 'z' too: the multiply runs the Ozaki slice kernel
        # (ops/ozaki.py, f64-quality bf16 MXU products) and the vector ops
        # run in emulated f64
        self._pack = None             # row-tile engine packing
        if engine == "pallas":
            from .ops.pallas_spmm import pack_row_tiles

            # r_tile trades A-panel inflation (narrow bands blow up at
            # large unions) against MXU utilization (fused re/im rows
            # 2*r*lm want to reach the 128-row systolic dimension): pick
            # the candidate minimizing streamed-bytes / MXU-efficiency
            env_r = _os.environ.get("TFQ_PALLAS_RTILE")
            cands = ([int(env_r)] if env_r else
                     sorted({max(1, 128 // self.lm), max(1, 64 // self.lm),
                             max(1, 32 // self.lm), 1}, reverse=True))
            best = None
            for r_tile in cands:
                p_ = pack_row_tiles(self.plan.rowptr_a, self.plan.colind_a,
                                    self.plan.nrows, self.lm, r_tile)
                score = p_.inflation / min(1.0, 2 * r_tile * self.lm / 128)
                if best is None or score < best[0]:
                    best = (score, p_)
            pack = best[1]
            if auto and pack.inflation > 4.0:
                engine = "pairs"      # unions too ragged for row tiles
            else:
                self._pack = pack
                if echo > 2:
                    print(f"# pallas pack: {pack.ntiles} tiles x "
                          f"{pack.r_tile} rows, ku={pack.ku}, "
                          f"inflation {pack.inflation:.2f}x")
        self.engine = engine
        self._pp = None               # pairs engine state
        self._pp_plan = None          # pairs pack (fine or merged space)
        self._gp = None               # column-grouped transform (pairs)
        self._sup = None              # superblock row merge (pairs)
        self._sup_gp = None           # lane widening composed before it
        self._sup_mask_fused = None   # fused live-slot mask (merged space)
        if engine == "pairs":
            from .ops import pairpanel as pp_ops

            row_of_x = np.repeat(np.arange(self.plan.nrows, dtype=np.int64),
                                 np.diff(self.plan.rowptr_x))
            counts = np.diff(self.plan.starts).astype(np.int64)
            pair_y = np.repeat(np.arange(self.plan.nnzb_x, dtype=np.int64),
                               counts)
            try:
                # SUPERBLOCK composition for small blocks (LM <= 8, 9 of
                # the reference's 15 sizes): merge f_row block rows (after
                # an optional lane widening) so the measured-fast LM'=
                # 16/32 kernels run instead of drowning the 128x128 MXU
                # (see ops/superblock.py).  On success the merged plan
                # replaces the fine pack below; junk products on dead
                # merged slots are masked out of every multiply
                # (fused_primitives sup_mask).
                sup_env = _os.environ.get("TFQ_SOLVER_SUPER", "auto")
                if sup_env != "0" and self.lm <= 8:
                    try:
                        self._build_superblock(row_of_x, pair_y, sup_env)
                    except ValueError as sup_err:
                        if echo > 2:
                            print(f"# superblock unavailable ({sup_err}); "
                                  "fine-grained pairs")
                        if precision == "z" and self.lm < 16:
                            # fine pairs cannot run 'z' below LM=16 (bf16
                            # window tiling); surface as a pack failure so
                            # 'auto' falls to the block-list engine
                            raise ValueError(
                                "the pairs engine's 'z' kernel needs "
                                "LM >= 16 and the superblock merge did "
                                f"not pack ({sup_err})") from sup_err
                # column-padded layout keeps the per-column vector ops
                # index-free; fall back to the compact layout when column
                # fills are too uneven (padded slots > 2x the real blocks)
                if self._sup is None:
                    self._build_fine_pairs(pp_ops, row_of_x, pair_y)
            except ValueError as e:
                if not auto:
                    if precision == "z" and self.lm < 16:
                        raise TfqmrgpuError(
                            encode_status(Status.PRECISION_MISSMATCH),
                            "the pairs engine's 'z' (Ozaki) kernel needs "
                            "LM >= 16 (bf16 window tiling) and the "
                            f"superblock merge did not pack ({e}); use "
                            "engine='dense' or 'xla'") from e
                    raise
                engine = "xla"        # no recoverable locality
            self.engine = engine
            self._pp_prec = _os.environ.get("TFQ_PAIRS_MM_PREC", "highest")
            kern_lm = self._pp_plan.lm if self._pp_plan is not None \
                else self.lm
            if self._pp_prec != "highest" and kern_lm < 16:
                # bf16 windows tile at 16 sublanes; kernel lm in [8,16)
                # can only run the exact-f32 kernel (the superblock merge
                # raises the KERNEL lm to 16/32, lifting this)
                self._pp_prec = "highest"
            if precision == "z" and engine == "pairs" and kern_lm < 16:
                if auto:
                    # e.g. 8 < LM < 16 (no superblock factor reaches 16),
                    # or LM <= 8 with TFQ_SOLVER_SUPER=0: the fine pack
                    # succeeded but the oz kernel cannot tile it -- keep
                    # the old auto routing to the block-list engine
                    engine = "xla"
                    self._pp_plan = None
                    self._gp = None
                    self.engine = engine
                else:
                    raise TfqmrgpuError(
                        encode_status(Status.PRECISION_MISSMATCH),
                        "the pairs engine's 'z' (Ozaki) kernel needs "
                        "LM >= 16 (bf16 window tiling); use "
                        "engine='dense' or 'xla'")
            if engine == "pairs" and echo > 2:
                print(f"# pairs engine: ntiles={self._pp_plan.ntiles} "
                      f"ku={self._pp_plan.ku} S={self._pp_plan.s_window} "
                      f"inflation={self._pp_plan.inflation:.2f}x"
                      + (f" colgroup={self._gp.group_size}"
                         if self._gp is not None else "")
                      + (f" super={self._sup.f_row}x"
                         f"{self._sup_gp.group_size if self._sup_gp else 1}"
                         f" lm'={self._sup.lm2}"
                         f" inflMAC={self._sup.mac_inflation:.2f}x"
                         if self._sup is not None else ""))
        self._panel = engine in ("dense", "pallas")
        self._layout: Optional[panel_ops.PanelLayout] = None
        if self._panel:
            self._layout = panel_ops.PanelLayout.from_plan(self.plan)

        self._colindx = jnp.asarray(self.plan.colindx.astype(np.int32))
        self._subset = jnp.asarray(self.plan.subset.astype(np.int32))
        self._action: Optional[BlockSparseAction] = None
        self._a_panel = None          # (dense planes) or (stream arrays)
        self._b: Optional[tuple] = None
        self._bn2: Optional[np.ndarray] = None
        self._x0 = None               # initial guess (engine layout)
        self._x_result = None
        self._x_override = None       # refined iterate (complex ndarray)
        self._info: Optional[SolveInfo] = None
        v3 = core.make_shadow_vector(self.plan.nnzb_x, self.lm, self.ln)
        if self._panel:
            lay = self._layout
            self._v3 = (jnp.asarray(lay.pack_x(np.asarray(v3[0]))),
                        jnp.asarray(lay.pack_x(np.asarray(v3[1]))))
            self._mask4 = jnp.asarray(
                lay.mask[:, None, :, None].astype(
                    np.float64 if precision == "z" else np.float32))
        elif engine == "pairs":
            self._v3 = jnp.asarray(self._pairs_permute(
                np.asarray(v3[0]), np.asarray(v3[1])).astype(
                    np.float64 if precision == "z" else np.float32))
        else:
            self._v3 = v3

        if a.data is not None:
            self.set_matrix("A", a.data)
        if b.data is not None:
            self.set_matrix("B", b.data)

    # ------------------------------------------------------- pairs packing

    def _build_fine_pairs(self, pp_ops, row_of_x, pair_y):
        """Pack the FINE pair plan (optionally column-grouped) -- the
        pairs engine's default space.  Raises ValueError when the pattern
        has no recoverable locality."""
        precision = self.precision
        counts = np.bincount(self.plan.colindx.astype(np.int64),
                             minlength=self.plan.ncols)
        # measured on v5e: the one-hot-matmul primitives edge out
        # the column-padded 3-D layout (lane width + pad copies),
        # so col_pad is opt-in for now
        col_pad = (_os.environ.get("TFQ_PAIRS_COLPAD", "0") == "1"
                   and precision == "c"
                   and counts.max() * self.plan.ncols
                   <= 2 * self.plan.nnzb_x)
        # column grouping: when the X grid is column-sparse each
        # A block is streamed once per column it serves; grouping
        # G compressed columns onto the lane axis dedups that
        # traffic (see pairpanel.pack_grouped).  TFQ_PAIRS_COLGROUP:
        # 0 = model auto-pick (default), 1 = off, N = force N.
        self._pp_prec = _os.environ.get("TFQ_PAIRS_MM_PREC", "highest")
        cg_env = _os.environ.get("TFQ_PAIRS_COLGROUP", "0")
        rt = int(_os.environ.get("TFQ_PAIRS_RTILE", "1"))
        cg_copy = int(_os.environ.get("TFQ_PAIRS_COPYG", "2"))
        want = 0
        # z routes through the Ozaki kernel: grouped windowed
        # packs work (r3 -- the grouped A dedup carries straight
        # through the A-bytes-bound slice stream); r5: the xi8
        # int8 layout halves the window, so _try_resident_z below
        # upgrades fitting plans to a whole-panel resident window.
        # Model the candidates at the oz pass rate
        # the 'z' model tag must match the kernel set_matrix will build
        # (the solver's xi8/int8 default), or the grouped plan is
        # VMEM-sized for the wrong window split
        model_prec = (self._pp_prec if precision == "c"
                      else pp_ops.oz_mode_params(
                          16 * self.lm,
                          int8=_os.environ.get("TFQ_OZC_INT8", "2"))[0])
        if (cg_env != "1" and not col_pad
                and self.plan.ncols >= 2):
            want = int(cg_env)
            if want == 0:
                cap = 512 if precision == "c" else 256
                cands = tuple(g for g in (1, 2, 4, 8)
                              if g * self.ln <= cap)
                try:
                    # FULL-ITERATION objective (vec_passes=15, the
                    # residency model's fusion lower bound): the solver
                    # pays the G-inflated vector traffic 15x per
                    # iteration, so the multiply-optimal G is usually
                    # NOT the iteration-optimal one (r3: golden at G=8
                    # sat at 0.666 of roofline; the iteration model
                    # picks G<=2 there)
                    want, _ests = pp_ops.auto_group_size(
                        self.plan.pairs[:, 0],
                        self.plan.pairs[:, 1], pair_y,
                        self.plan.nnzb_x, self.lm, self.ln,
                        model_prec, row_of=row_of_x,
                        col_of=self.plan.colindx,
                        candidates=cands, vec_passes=15.0,
                        vec_bytes_per_val=(8 if precision == "z" else 4))
                except ValueError:
                    want = 0
        # r_tile=1 measured best on v5e (1.09x vs 2.0x panel
        # inflation at r_tile=2; t_step batching already amortizes
        # the per-step fixed cost that r_tile=2 targeted)
        if want > 1:
            # walks the group size down until the grouped plan
            # both packs and fits VMEM; None = ungrouped
            self._gp, self._pp_plan = pp_ops.pack_grouped_plan(
                self.plan.pairs[:, 0], self.plan.pairs[:, 1],
                pair_y, self.plan.nnzb_x, self.lm, self.ln,
                want, model_prec, row_of=row_of_x,
                col_of=self.plan.colindx, r_tile=rt,
                copy_g=cg_copy, force=(cg_env not in ("0", "1")),
                allow_resident=(precision != "z"))
            if precision == "z":
                # grouped 'z' can reach the resident xi8 layout too
                # (the 1.77 TF config rates.py records is the resident
                # cg2 one) -- repack the SAME cell lists with a
                # whole-panel window when the int8 panel fits VMEM
                # (pack_grouped_plan may have fallen back to ungrouped:
                # gp None repacks the fine lists)
                gp = self._gp
                if gp is not None:
                    self._pp_plan = self._try_resident_z(
                        self._pp_plan,
                        lambda: pp_ops.pack_pair_plan(
                            gp.pair_a2, gp.pair_x2, gp.pair_y2,
                            gp.nnzb2, gp.nnzb2, self.lm, gp.ln2,
                            r_tile=rt, copy_g=cg_copy, row_of=gp.row_of2,
                            col_of=gp.col_of2, resident="1"))
                else:
                    self._pp_plan = self._try_resident_z(
                        self._pp_plan,
                        lambda: pp_ops.pack_pair_plan(
                            self.plan.pairs[:, 0], self.plan.pairs[:, 1],
                            pair_y, self.plan.nnzb_x, self.plan.nnzb_x,
                            self.lm, self.ln, r_tile=rt,
                            row_of=row_of_x, col_of=self.plan.colindx,
                            copy_g=cg_copy, resident="1"))
        else:
            self._pp_plan = pp_ops.pack_pair_plan(
                self.plan.pairs[:, 0], self.plan.pairs[:, 1],
                pair_y, self.plan.nnzb_x, self.plan.nnzb_x,
                self.lm, self.ln, r_tile=rt,
                row_of=row_of_x, col_of=self.plan.colindx,
                col_pad=bool(col_pad), copy_g=cg_copy,
                resident=("0" if precision == "z" else
                          _os.environ.get("TFQ_PAIRS_RESIDENT",
                                          "auto")))
            if precision == "z":
                self._pp_plan = self._try_resident_z(
                    self._pp_plan,
                    lambda: pp_ops.pack_pair_plan(
                        self.plan.pairs[:, 0], self.plan.pairs[:, 1],
                        pair_y, self.plan.nnzb_x, self.plan.nnzb_x,
                        self.lm, self.ln, r_tile=rt,
                        row_of=row_of_x, col_of=self.plan.colindx,
                        col_pad=bool(col_pad), copy_g=cg_copy,
                        resident="1"))

    def _try_resident_z(self, plan, repack):
        """'z' plans default to windowed (an xsplit=p bf16 window is ~2x
        VMEM), but the solver's int8-slice default (xi8) HALVES the
        window: when the whole int8 slice panel fits VMEM, repack
        RESIDENT -- one panel DMA per multiply instead of the replica
        build + windowed streaming (measured 1.50 -> 1.77 TFlop/s on
        the golden 'z' bench).  TFQ_PAIRS_RESIDENT=0 or a non-int8
        TFQ_OZC_INT8 pin opts out; the oz builder re-checks the fit.
        The feasibility test needs the packed plan's slot count, so an
        eligible plan pays one extra pack at init -- a one-time cost
        (plans are built once and reused across solves)."""
        from .ops import pairpanel as pp_ops

        if _os.environ.get("TFQ_PAIRS_RESIDENT", "auto") == "0":
            return plan
        if _os.environ.get("TFQ_OZ_COMP", "1") == "0":
            return plan           # legacy 'oz' mode has no xi8 layout
        if _os.environ.get("TFQ_OZC_INT8", "2") not in ("2", "3"):
            return plan
        if plan.lm % 32:
            return plan           # xi8 needs 32-row int8 alignment
        p = 8                     # ceil(53/7): the int8 point at 53 bits
        win_b = ((plan.n_slots + plan.copy_g) * plan.lm
                 * pp_ops._lanes_pad(p * 2 * plan.ln))
        if win_b > (100 << 20) or plan.n_slots + plan.copy_g > 0x7FFF:
            return plan
        min_mb = float(_os.environ.get("TFQ_Z_RESIDENT_MIN_MB", "16"))
        if win_b < int(min_mb * (1 << 20)):
            # small panels (FD-class): the windowed replica build is
            # already cheap and the per-multiply full-panel DMA costs
            # more than it saves (measured: rtb=12.75 754 -> 835 ms);
            # residency pays on golden-class panels (75 MB: 1.50 ->
            # 1.77 TF)
            return plan
        try:
            return repack()
        except ValueError:
            return plan

    def _build_superblock(self, row_of_x, pair_y, sup_env):
        """Compose lane widening (pack_grouped) + row merging
        (superblock.pack_rowmerge) and pack the MERGED pair plan, so
        small-block problems (LM <= 8) run the measured-fast LM'=16/32
        kernels end-to-end inside the solver (VERDICT r4 ask #3; the
        bench driver's pre-pass is the same transform).  The routing cost
        model uses the shared measured-rate table (ops/rates.py).

        Raises ValueError when no factor packs or merging does not pay.
        On success sets _sup / _sup_gp / _pp_plan / _sup_mask_fused."""
        from .ops import pairpanel as pp_ops
        from .ops import rates
        from .ops import superblock as sb_ops

        pa = self.plan.pairs[:, 0].astype(np.int64)
        px = self.plan.pairs[:, 1].astype(np.int64)
        lm, ln = self.lm, self.ln
        # size floor: on problems too small to feed the MXU the transform
        # overhead (masking, permutes, MAC inflation) swamps the engine
        # rates the cost model is built on; a forced TFQ_SOLVER_SUPER=N
        # bypasses
        mac_fine = float(pa.shape[0]) * lm * lm * ln
        min_macs = float(_os.environ.get("TFQ_SUPER_MIN_MACS", "1e6"))
        if sup_env in ("auto", "") and mac_fine < min_macs:
            raise ValueError("problem too small for the superblock "
                             f"transform ({mac_fine:.0f} fine MACs < "
                             f"{min_macs:.0f})")
        col_of = self.plan.colindx.astype(np.int64)
        rt = int(_os.environ.get("TFQ_PAIRS_RTILE", "1"))
        cg_copy = int(_os.environ.get("TFQ_PAIRS_COPYG", "2"))
        cands = sorted({f for f in (16 // lm, 32 // lm) if f >= 2})
        if sup_env not in ("auto", ""):
            cands = [int(sup_env)]
        best = None
        for f in cands:
            lm2 = f * lm
            # lane widening toward ln2 >= max(lm2, 32) first (grouping
            # verifies the full-intersection invariant on the fine
            # lists; the row merge then composes without re-check).
            # LN' >= LM' is NOT required in the merged internal space --
            # the reference's LN >= LM rule (tfqmrgpu_core.hxx:34) is an
            # API constraint on the USER's problem (checked in __init__);
            # a narrow-lane merged kernel merely under-fills the MXU lane
            # axis, which still beats the fine-grained engines by far on
            # single-column FD patterns (ncols=1 cannot widen at all)
            fc = max(-(-lm2 // ln), -(-32 // ln))
            fc = min(fc, self.plan.ncols)
            gp_f = None
            if fc > 1:
                try:
                    gp_f = pp_ops.pack_grouped(pa, px, pair_y,
                                               self.plan.nnzb_x, ln, fc,
                                               row_of=row_of_x,
                                               col_of=col_of)
                except ValueError:
                    gp_f = None
            if gp_f is not None:
                rm_f = sb_ops.pack_rowmerge(
                    gp_f.pair_a2, gp_f.pair_x2, gp_f.pair_y2,
                    gp_f.nnzb2, lm, gp_f.ln2, f,
                    row_of=gp_f.row_of2, col_of=gp_f.col_of2,
                    verify=False)
            else:
                rm_f = sb_ops.pack_rowmerge(pa, px, pair_y,
                                            self.plan.nnzb_x, lm, ln, f,
                                            row_of=row_of_x, col_of=col_of)
            rate = rates.engine_rate(self.precision, lm2)
            if not rate:
                # unmeasured merged size: ineligible for AUTO routing,
                # but a user-forced factor must still go through
                if sup_env in ("auto", ""):
                    continue
                rate = 1.0
            cost = rm_f.mac_inflation / rate
            if best is None or cost < best[0]:
                best = (cost, f, gp_f, rm_f)
        if best is None:
            raise ValueError("no feasible superblock factor")
        if (sup_env in ("auto", "")
                and best[0] >= 1.0 / rates.base_rate(self.precision, lm)):
            raise ValueError("superblock does not pay on this pattern "
                             f"(cost {best[0]:.2f} vs fine-grained "
                             f"{1.0 / rates.base_rate(self.precision, lm):.2f})")
        _, sup_f, gp_f, rm = best
        self._pp_plan = pp_ops.pack_pair_plan(
            rm.pair_a2, rm.pair_x2, rm.pair_y2, rm.n_cells, rm.n_cells,
            rm.lm2, rm.ln, r_tile=rt, copy_g=cg_copy,
            row_of=rm.row_of2, col_of=rm.col_of2,
            resident=("0" if self.precision == "z" else
                      _os.environ.get("TFQ_PAIRS_RESIDENT", "auto")))
        if self.precision == "z":
            self._pp_plan = self._try_resident_z(
                self._pp_plan,
                lambda: pp_ops.pack_pair_plan(
                    rm.pair_a2, rm.pair_x2, rm.pair_y2, rm.n_cells,
                    rm.n_cells, rm.lm2, rm.ln, r_tile=rt,
                    copy_g=cg_copy, row_of=rm.row_of2, col_of=rm.col_of2,
                    resident="1"))
        self._sup = rm
        self._sup_gp = gp_f
        self._gp = gp_f               # grouped primitives run in merged
        #                               space with the composed mask
        npdt = np.float64 if self.precision == "z" else np.float32
        m = sb_ops.merged_mask_full(rm, gp_f).astype(npdt)
        self._sup_mask_fused = jnp.asarray(
            pp_ops.permute_x(self._pp_plan, m, m))

    # ------------------------------------------------------------- matrices

    def set_matrix(self, var: str, val, *, trans: str = "n",
                   layout: int = layout_ops.LAYOUT_RIRIRIRI,
                   scale: float = 1.0, conjugate: bool = False):
        """Upload operator data ('A' or 'B'); accepts complex ndarrays
        [nnzb, d1, d2] or real interleaved arrays in any reference layout
        (setMatrix parity, tfqmrgpu.cu:609-621).  ``trans`` accepts the
        reference's full vocabulary 'n'/'t'/'h'/'c'/'*' (case-insensitive;
        'h'/'c' = adjoint, '*' = conjugate only, tfqmrgpu.cu:492-500), and
        an explicit ``conjugate`` flag composes with it."""
        var = var.upper()
        val = np.asarray(val)
        npdt = np.float64 if self.dtype == jnp.float64 else np.float32
        if var == "A":
            re, im = layout_ops.to_planes(
                val, self.plan.nnzb_a, self.lm, self.lm, trans=trans,
                layout=layout, scale=scale, conjugate=conjugate, dtype=npdt)
            if self.engine == "pairs":
                from .ops import pairpanel as pp_ops

                if self._sup is not None:
                    # superblock: scatter fine A blocks into the merged
                    # cells (zero fill-in); the kernels below then see
                    # the merged [n_acells, LM', LM'] planes
                    from .ops import superblock as sb_ops

                    re = np.asarray(sb_ops.merge_a_blocks(self._sup, re))
                    im = np.asarray(sb_ops.merge_a_blocks(self._sup, im))
                t_env = _os.environ.get("TFQ_PAIRS_TSTEP")
                interp = jax.default_backend() not in ("tpu",)
                if self.precision == "z":
                    # f64-quality multiply on the bf16 MXU (Ozaki slice
                    # kernel; see ops/ozaki.py + make_pairpanel_multiply_oz).
                    # Solver default: the measured-fast 'xi8' layout
                    # (s8xs8->s32 MXU; r5 golden ladder bf16 1.16 ->
                    # i8 1.40 -> xi8 1.48 TF), passed as an EXPLICIT
                    # parameter (no ambient env mutation -- thread-safe).
                    # An explicit TFQ_OZC_INT8 pins; when xi8's mixed
                    # fallback (lm not 32-aligned) fails the f32 depth
                    # bound, the default retries with bf16 X slices.
                    oz_i8 = _os.environ.get("TFQ_OZC_INT8", "2")
                    tries = ([oz_i8] if "TFQ_OZC_INT8" in _os.environ
                             else [oz_i8, "0"])
                    for n_try, i8_try in enumerate(tries):
                        try:
                            oz_tag, _, _ = pp_ops.oz_mode_params(
                                self._pp_plan.ku * self._pp_plan.lm,
                                int8=i8_try)
                            t_step = (int(t_env) if t_env else
                                      pp_ops.auto_t_step(self._pp_plan,
                                                         oz_tag))
                            if self._pp_plan.resident and not t_env:
                                # the VMEM model prices bf16 windows;
                                # the resident plan only exists because
                                # the int8 window is HALF that, so the
                                # auto pick collapses to the fixed-cost
                                # t=1 regime -- floor it at the
                                # measured-good batch
                                t_step = max(t_step, 8)
                            self._pp = pp_ops.make_pairpanel_multiply_oz(
                                self._pp_plan, re, im, interpret=interp,
                                t_step=t_step, int8=i8_try)
                            break
                        except ValueError:
                            if n_try == len(tries) - 1:
                                raise
                else:
                    # build the inflated panels ON DEVICE: shipping
                    # host-built panels costs panel-bytes over the host
                    # link (which can be very slow through a relay); raw
                    # A block bytes are ~ku x smaller
                    panels = pp_ops.build_a_panels_device(
                        self._pp_plan,
                        jnp.asarray(re.astype(np.float32)),
                        jnp.asarray(im.astype(np.float32)))
                    t_step = (int(t_env) if t_env else
                              pp_ops.auto_t_step(self._pp_plan,
                                                 self._pp_prec))
                    self._pp = pp_ops.make_pairpanel_multiply(
                        self._pp_plan, panels, precision=self._pp_prec,
                        interpret=interp, t_step=t_step)
                # the cached jitted steps close over the previous
                # PairPanelMultiply (its t_step/precision/consts structure);
                # drop them so a re-set A cannot execute a stale closure
                self._pairs_jit = {}
                self._apply_a_jit = None
            elif self.engine == "dense":
                dr, di = self._layout.densify_a(self.plan, re, im)
                self._a_panel = (jnp.asarray(dr), jnp.asarray(di))
            elif self.engine == "pallas":
                from .ops.pallas_spmm import build_a_panels_device

                # panels build ON DEVICE (see the pairs branch above)
                self._a_panel = (
                    build_a_panels_device(
                        self._pack, jnp.asarray(re.astype(np.float32))),
                    build_a_panels_device(
                        self._pack, jnp.asarray(im.astype(np.float32))))
            else:
                self._action = BlockSparseAction.from_plan(
                    self.plan, re, im, engine=self.engine, ln=self.ln)
            self._apply_a_jit = None      # A changed: retrace B - A*X0
        elif var == "B":
            re, im = layout_ops.to_planes(
                val, self.plan.nnzb_b, self.lm, self.ln, trans=trans,
                layout=layout, scale=scale, conjugate=conjugate, dtype=npdt)
            if self._panel:
                self._b = (jnp.asarray(self._layout.pack_b(re)),
                           jnp.asarray(self._layout.pack_b(im)))
            elif self.engine == "pairs":
                self._b = jnp.asarray(self._pairs_b_panel(re, im))
            else:
                self._b = (jnp.asarray(re), jnp.asarray(im))
            # per-(column, rhs) squared norms of B (for restart chunks)
            cols_b = self.plan.colindx[self.plan.subset.astype(np.int64)]
            bn2 = np.zeros((self.plan.ncols, self.ln))
            np.add.at(bn2, cols_b.astype(np.int64),
                      (re.astype(np.float64) ** 2
                       + im.astype(np.float64) ** 2).sum(axis=1))
            self._bn2 = bn2
        elif var == "X":
            # initial guess X0: the solver then runs on the shifted system
            # A*dX == B - A*X0 and returns X0 + dX.  (The reference always
            # starts from zero and leaves this as a ToDo,
            # tfqmrgpu_core.hxx:125 / bench_tfqmrgpu.cu:159 step 8x.)
            re, im = layout_ops.to_planes(
                val, self.plan.nnzb_x, self.lm, self.ln, trans=trans,
                layout=layout, scale=scale, conjugate=conjugate, dtype=npdt)
            if self._panel:
                self._x0 = (jnp.asarray(self._layout.pack_x(re)),
                            jnp.asarray(self._layout.pack_x(im)))
            elif self.engine == "pairs":
                self._x0 = jnp.asarray(self._pairs_permute(re, im))
            else:
                self._x0 = (jnp.asarray(re), jnp.asarray(im))
        else:
            raise TfqmrgpuError(
                encode_status(Status.VARIABLENAME_UNKNOWN, 0, var),
                f"var={var!r}")

    def get_matrix(self, var: str = "X", *, trans: str = "n",
                   layout: Optional[int] = None,
                   conjugate: bool = False) -> np.ndarray:
        """Retrieve the solution X as a complex ndarray [nnzbX, LM, LN]
        (or reference-layout real array when ``layout`` is given);
        getMatrix parity (tfqmrgpu.cu:624-645, restricted to 'X').
        ``trans`` accepts 'n'/'t'/'h'/'c'/'*' like set_matrix."""
        if var.upper() != "X":
            raise TfqmrgpuError(
                encode_status(Status.VARIABLENAME_UNKNOWN, 0, var),
                "getMatrix supports only 'X'")
        if self._x_override is not None:
            re = np.ascontiguousarray(self._x_override.real)
            im = np.ascontiguousarray(self._x_override.imag)
        elif self._x_result is None:
            raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                                "solve() has not been called")
        else:
            re, im = self._unpack_x(self._x_result)
        if layout is None:
            t, conj = layout_ops.resolve_transposition(trans, conjugate)
            if t == "t":
                re, im = np.swapaxes(re, 1, 2), np.swapaxes(im, 1, 2)
            if conj:
                im = -im
            return layout_ops.planes_to_complex(re, im)
        return layout_ops.from_planes(re, im, trans=trans, layout=layout,
                                      conjugate=conjugate)

    def _unpack_x(self, x_engine) -> tuple:
        """Engine-layout X vector -> (re, im) ndarrays [nnzbX, LM, LN]."""
        if self._panel:
            return (self._layout.unpack_x(np.asarray(x_engine[0])),
                    self._layout.unpack_x(np.asarray(x_engine[1])))
        if self.engine == "pairs":
            return self._pairs_unpermute(x_engine)
        return np.asarray(x_engine[0]), np.asarray(x_engine[1])

    def _solve_xshaped(self, r: np.ndarray, inv_bn2, tolerance,
                       max_iterations):
        """Solve A @ dX == r for an X-shaped complex RHS ``r`` (the
        correction step of iterative refinement), with the convergence
        normalization ``inv_bn2`` [ncols, LN].  ``r`` may be a complex
        ndarray or an (re, im) plane tuple (refinement passes device
        planes: complex128 device transfers hang the TPU relay).  Returns
        the raw SolveResult (x in engine layout); does NOT touch the
        solver's stored result."""
        npdt = np.float64 if self.precision == "z" else np.float32
        if isinstance(r, tuple):
            re = np.ascontiguousarray(np.asarray(r[0]).astype(npdt))
            im = np.ascontiguousarray(np.asarray(r[1]).astype(npdt))
        else:
            re = np.ascontiguousarray(r.real.astype(npdt))
            im = np.ascontiguousarray(r.imag.astype(npdt))
        if self.engine == "pairs":
            b_over = jnp.asarray(self._pairs_permute(re, im))
            return self._solve_pairs(tolerance, max_iterations, False,
                                     b_override=b_over, inv_bn2=inv_bn2)
        if self._panel:
            b_over = (jnp.asarray(self._layout.pack_x(re)),
                      jnp.asarray(self._layout.pack_x(im)))
            return self._solve_panel(tolerance, max_iterations, False,
                                     b_override=b_over, inv_bn2=inv_bn2)
        ident = jnp.arange(self.plan.nnzb_x, dtype=jnp.int32)
        return core.solve_core(
            self.action, (jnp.asarray(re), jnp.asarray(im)), self._v3,
            self._colindx, ident, tolerance, max_iterations, inv_bn2,
            ncols=self.plan.ncols, lm=self.lm, ln=self.ln,
            rhs_trivial=False)

    # ---------------------------------------------------------------- solve

    @property
    def action(self) -> BlockSparseAction:
        if self._action is None:
            raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                                "matrix 'A' has not been set")
        return self._action

    def _pairs_permute(self, re: np.ndarray, im: np.ndarray) -> np.ndarray:
        """X-shaped block planes -> the pairs engine's fused panel
        (column-grouping, then the superblock row merge, when active)."""
        from .ops import pairpanel as pp_ops

        if self._gp is not None:
            re = np.asarray(pp_ops.grouped_blocks(self._gp, re))
            im = np.asarray(pp_ops.grouped_blocks(self._gp, im))
        if self._sup is not None:
            from .ops import superblock as sb_ops

            re = np.asarray(sb_ops.merge_xy_blocks(self._sup, re))
            im = np.asarray(sb_ops.merge_xy_blocks(self._sup, im))
        return pp_ops.permute_x(self._pp_plan, re, im)

    def _pairs_unpermute(self, y_fused) -> tuple:
        """Fused panel -> (re, im) block planes [nnzbX, LM, LN]."""
        from .ops import pairpanel as pp_ops

        re, im = pp_ops.unpermute_y(self._pp_plan, np.asarray(y_fused))
        if self._sup is not None:
            from .ops import superblock as sb_ops

            re = sb_ops.unmerge_xy_blocks(self._sup, re)
            im = sb_ops.unmerge_xy_blocks(self._sup, im)
        if self._gp is not None:
            re = pp_ops.ungroup_blocks(self._gp, re)
            im = pp_ops.ungroup_blocks(self._gp, im)
        return re, im

    def _pairs_b_panel(self, re: np.ndarray, im: np.ndarray) -> np.ndarray:
        """Scatter B blocks into the fused permuted X-shaped panel."""
        xr = np.zeros((self.plan.nnzb_x, self.lm, self.ln), re.dtype)
        xi = np.zeros_like(xr)
        sub = self.plan.subset.astype(np.int64)
        np.add.at(xr, sub, re)
        np.add.at(xi, sub, im)
        return self._pairs_permute(xr, xi)

    def _solve_pairs(self, tolerance, max_iterations, rhs_trivial,
                     b_override=None, inv_bn2=None):
        from .ops import pairpanel as pp_ops
        from .ops.linalg import set_unit_blocks

        if self._pp is None:
            raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                                "matrix 'A' has not been set")
        vdt = jnp.float64 if self.precision == "z" else jnp.float32
        if b_override is not None:
            b = b_override
        elif rhs_trivial:
            ub = np.asarray(set_unit_blocks(
                self.plan.nnzb_b, self.lm, self.ln, vdt))
            b = jnp.asarray(self._pairs_b_panel(ub[0], ub[1]))
        else:
            b = self._b
        pplan = self._pp_plan
        ncc = self.plan.ncols
        mult = self._pp

        gp = self._gp
        sup_mask = self._sup_mask_fused

        def step(consts, b_fused, v3_fused, tol, maxit, inv_override):
            prim = pp_ops.fused_primitives(mult, consts, pplan, ncc,
                                           b_fused, gp=gp,
                                           sup_mask=sup_mask)
            v5 = prim.add_rhs(jnp.zeros_like(b_fused), b_fused, 1.0)
            sdt = decisions_scalar_dtype()
            if rhs_trivial:
                tau0 = jnp.ones((ncc, self.ln), dtype=sdt)
                inv = tau0
            else:
                tau0 = prim.nrm2(v5)
                inv = jnp.where(tau0 > 0,
                                1.0 / jnp.where(tau0 > 0, tau0, 1.0),
                                0.0)
            if inv_override is not None:
                inv = inv_override
            return core.tfqmr_loop(prim, b_fused, v3_fused, v5, tau0,
                                   inv, tol, maxit, vdt)

        # cache the jitted step per (rhs_trivial, override) flavor
        cache = getattr(self, "_pairs_jit", None) or {}
        self._pairs_jit = cache
        key = (rhs_trivial, inv_bn2 is not None)
        if key not in cache:
            cache[key] = jax.jit(step)
        return cache[key](mult.consts, b, self._v3,
                          tolerance, max_iterations, inv_bn2)

    def solve(self, tolerance: float = 1e-6, max_iterations: int = 999,
              rhs_trivial: bool = False) -> SolveInfo:
        if self._b is None and not rhs_trivial:
            raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                                "matrix 'B' has not been set")
        with trace(f"tfq.solve.{self.engine}"):
            result = self._dispatch_solve(tolerance, max_iterations,
                                          rhs_trivial)
        return self._finish_solve(result, max_iterations)

    def _dispatch_solve(self, tolerance, max_iterations, rhs_trivial):
        if self._x0 is not None and not rhs_trivial:
            return self._solve_shifted(tolerance, max_iterations)
        if self._panel:
            return self._solve_panel(tolerance, max_iterations, rhs_trivial)
        if self.engine == "pairs":
            return self._solve_pairs(tolerance, max_iterations, rhs_trivial)
        b = self._b
        if b is None:      # trivial RHS: shape placeholder, rebuilt on device
            z = jnp.zeros((self.plan.nnzb_b, self.lm, self.ln), self.dtype)
            b = (z, z)
        return core.solve_core(
            self.action, b, self._v3, self._colindx, self._subset,
            tolerance, max_iterations,
            ncols=self.plan.ncols, lm=self.lm, ln=self.ln,
            rhs_trivial=rhs_trivial,
        )

    def _apply_a(self, x_vec):
        """y = A @ x in the engine's vector layout (used for B - A*X0)."""
        if self.engine == "dense":
            lay = self._layout
            from .ops.panel import dense_multiply
            from .ops.blocksparse import MATMUL_PRECISION

            mult = dense_multiply(self._a_panel[0], self._a_panel[1],
                                  self._mask4, lay.mb, lay.lm, lay.ncc,
                                  lay.ln, MATMUL_PRECISION)
            return mult(x_vec)
        if self.engine == "pallas":
            from .ops.pallas_spmm import bsr_panel_multiply

            lay = self._layout
            mult = bsr_panel_multiply(
                self._a_panel[0], self._a_panel[1],
                jnp.asarray(self._pack.xcols), self._mask4,
                lay.mb, lay.lm, lay.ncc, lay.ln,
                interpret=jax.default_backend() != "tpu")
            return mult(x_vec)
        if self.engine == "pairs":
            pp = self._pp_plan
            nyrows = pp.ntiles * pp.r_tile * pp.lm
            y = self._pp.apply(self._pp.consts, x_vec)
            y = jnp.pad(y, ((0, pp.x_rows_padded - nyrows), (0, 0)))
            if self._sup_mask_fused is not None:
                y = y * self._sup_mask_fused
            elif self._gp is not None:
                from .ops import pairpanel as pp_ops

                m = jnp.asarray(pp_ops.grouped_lane_mask(pp, self._gp))
                y = (y.reshape(-1, pp.lm, y.shape[1])
                     * m[:, None, :]).reshape(y.shape)
            return y
        return self.action.multiply(x_vec)

    def _solve_shifted(self, tolerance, max_iterations):
        """Restart solve from the stored initial guess X0:
        solve A*dX == (B - A*X0) with the ORIGINAL |B| normalization, then
        return X0 + dX."""
        x0 = self._x0
        sdt = decisions_scalar_dtype()
        bn2 = jnp.asarray(self._bn2.astype(np.float64))
        inv = jnp.where(bn2 > 0, 1.0 / jnp.where(bn2 > 0, bn2, 1.0),
                        0.0).astype(sdt)
        # cache the jitted B - A*X0 operator: a fresh jax.jit wrapper per
        # restart retraces every chunk (measured: restart-dominated FD
        # walls at ~1 s/chunk against a 0.2 ms/iteration solve)
        if getattr(self, "_apply_a_jit", None) is None:
            self._apply_a_jit = jax.jit(self._apply_a)
        ax0 = self._apply_a_jit(x0)
        if self.engine == "pairs":
            bp = self._b - ax0
            result = self._solve_pairs(tolerance, max_iterations, False,
                                       b_override=bp, inv_bn2=inv)
            x = result.x + x0
        elif self._panel:
            bp = (self._b[0] - ax0[0], self._b[1] - ax0[1])
            result = self._solve_panel(tolerance, max_iterations, False,
                                       b_override=bp, inv_bn2=inv)
            x = (result.x[0] + x0[0], result.x[1] + x0[1])
        else:
            # block-list engine: the shifted RHS is X-shaped; reuse
            # solve_core with an identity subset
            bp = (jnp.asarray(self._scatter_b()[0]) - ax0[0],
                  jnp.asarray(self._scatter_b()[1]) - ax0[1])
            ident = jnp.arange(self.plan.nnzb_x, dtype=jnp.int32)
            result = core.solve_core(
                self.action, bp, self._v3, self._colindx, ident,
                tolerance, max_iterations, inv,
                ncols=self.plan.ncols, lm=self.lm, ln=self.ln,
                rhs_trivial=False)
            x = (result.x[0] + x0[0], result.x[1] + x0[1])
        return result._replace(x=x)

    def _scatter_b(self):
        """B blocks scattered into X shape (host helper, xla engine)."""
        re = np.zeros((self.plan.nnzb_x, self.lm, self.ln),
                      np.float64 if self.precision == "z" else np.float32)
        im = np.zeros_like(re)
        sub = self.plan.subset.astype(np.int64)
        np.add.at(re, sub, np.asarray(self._b[0]))
        np.add.at(im, sub, np.asarray(self._b[1]))
        return re, im

    def _finish_solve(self, result, max_iterations) -> SolveInfo:
        self._x_result = result.x
        self._x_override = None
        iters = int(result.iterations)
        n_probes = int(result.n_probes)
        status = int(result.return_status)
        actual_iters = iters if status == int(Status.SUCCESS) else \
            min(int(max_iterations), iters)
        if self._panel:
            from .ops.panel import flops_dense_multiply
            from .ops.linalg import flops_axpy, flops_dotp, flops_nrm2

            lay = self._layout
            nb_panel = lay.mb * lay.ncc       # panel positions incl. zeros
            spmm = (flops_dense_multiply(lay.mb, lay.lm, lay.ncc, lay.ln)
                    if self.engine == "dense" else
                    self.plan.nnzb_a * 8.0 * lay.lm * lay.lm
                    * lay.ncc * lay.ln)
            per_iter = (2 * spmm
                        + 2 * flops_dotp(nb_panel, lay.lm, lay.ln)
                        + 2 * flops_nrm2(nb_panel, lay.lm, lay.ln)
                        + 10 * flops_axpy(nb_panel, lay.lm, lay.ln))
            per_probe = spmm + flops_nrm2(nb_panel, lay.lm, lay.ln)
            flops = actual_iters * per_iter + n_probes * per_probe
        else:
            flops = (actual_iters * core.flops_per_iteration(
                         self.plan.n_pairs, self.plan.nnzb_x, self.lm, self.ln)
                     + n_probes * core.flops_per_probe(
                         self.plan.n_pairs, self.plan.nnzb_x, self.lm,
                         self.ln))
        self.plan.residuum_reached = float(result.residuum)
        self.plan.iterations_needed = actual_iters
        self.plan.flops_performed = flops
        self.plan.flops_performed_all += flops
        self._info = SolveInfo(
            residuum_reached=float(result.residuum),
            iterations_needed=actual_iters,
            flops_performed=flops,
            flops_performed_all=self.plan.flops_performed_all,
            return_status=status,
            rhs_status=np.asarray(result.rhs_status),
        )
        return self._info

    def _solve_panel(self, tolerance, max_iterations, rhs_trivial,
                     b_override=None, inv_bn2=None):
        if self._a_panel is None:
            raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                                "matrix 'A' has not been set")
        lay = self._layout
        npdt = np.float64 if self.precision == "z" else np.float32
        if b_override is not None:
            b = b_override
        elif rhs_trivial:
            unit = lay.unit_b_blocks(npdt)
            b = (jnp.asarray(lay.pack_b(unit)),
                 jnp.asarray(lay.pack_b(np.zeros_like(unit))))
        else:
            b = self._b
        a_re, a_im = self._a_panel
        dummy = jnp.zeros((1,), jnp.int32)
        if self.engine == "pallas":
            a_colind = jnp.asarray(self._pack.xcols)
        else:
            a_colind = dummy
        a_rowptr = dummy
        return core.solve_core_panel(
            a_re, a_im, a_colind, a_rowptr, b, self._v3, self._mask4,
            tolerance, max_iterations, inv_bn2,
            mb=lay.mb, lm=lay.lm, ncc=lay.ncc, ln=lay.ln,
            rhs_trivial=rhs_trivial, engine=self.engine)

    def solve_checkpointed(self, tolerance: float = 1e-6,
                           max_iterations: int = 999, chunk: int = 50,
                           state_path: Optional[str] = None) -> SolveInfo:
        """Chunked solve with restart-based checkpointing.

        Runs the solver in chunks of ``chunk`` iterations; after each chunk
        the current iterate X is (optionally) persisted to ``state_path``
        and re-injected as the initial guess of the next chunk.  A process
        that dies mid-solve resumes by calling this again with the same
        ``state_path``.  Restarting discards the Krylov space, so total
        iterations can exceed a single uninterrupted solve -- this is the
        price of bounded recovery time.  The convergence target stays
        relative to the ORIGINAL |B| across chunks.

        (The reference has no checkpointing at all -- plans are merely
        reusable across solves, SURVEY.md §5.4.)
        """
        import os

        if state_path and not state_path.endswith(".npz"):
            state_path += ".npz"    # np.savez appends it; keep exists/remove
            # checks consistent with what savez actually wrote
        if state_path and os.path.exists(state_path):
            with np.load(state_path) as st:
                self.set_matrix("X", st["x_re"] + 1j * st["x_im"])
                done = int(st["iterations"])
        else:
            done = 0
        if done >= max_iterations:
            info = SolveInfo(
                residuum_reached=float("nan"), iterations_needed=done,
                flops_performed=0.0,
                flops_performed_all=self.plan.flops_performed_all,
                return_status=int(Status.MAX_ITERATIONS))
            self._info = info
            return info
        total = done
        info = None
        flops_total = 0.0
        while total < max_iterations:
            it = min(chunk, max_iterations - total)
            info = self.solve(tolerance=tolerance, max_iterations=it)
            total += info.iterations_needed if info.return_status == 0                 else it
            flops_total += info.flops_performed
            x = self.get_matrix("X")
            if state_path:
                np.savez(state_path, x_re=x.real, x_im=x.imag,
                         iterations=total)
            if info.return_status == int(Status.SUCCESS):
                break
            self.set_matrix("X", x)
        if info is not None:
            info.iterations_needed = total
            info.flops_performed = flops_total
        if state_path and info is not None and                 info.return_status == int(Status.SUCCESS) and                 os.path.exists(state_path):
            os.remove(state_path)
        return info

    def clear_initial_guess(self):
        """Drop the stored X0 initial guess: the next solve() starts from
        zero again (the reference's behavior -- it always clears v1,
        tfqmrgpu_core.hxx:125).  Needed after solve_checkpointed, which
        leaves the final iterate installed as X0 for resumability."""
        self._x0 = None

    def get_info(self) -> SolveInfo:
        if self._info is None:
            raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                                "solve() has not been called")
        return self._info


# ------------------------------------------------------------- one-callers

def refine_mixed(sc: Solver, a_re64: np.ndarray, a_im64: np.ndarray,
                 bx64: np.ndarray, tolerance: float, max_iterations: int,
                 info_c: SolveInfo, echo: int = 0, max_rounds: int = 12):
    """Mixed-precision iterative refinement: the TPU-native 'm' core.

    f64 matmuls are software-emulated on TPU (~40x slower than bf16), so a
    full complex128 re-solve wastes the hardware.  Classic iterative
    refinement sidesteps it: per round, ONE f64 SpMM computes the true
    residual r = B - A@x, and the fast f32 engine solves the correction
    A dX == r.  Each round gains roughly the f32 engine's stall factor in
    residual until the f64 floor, so a handful of rounds reaches 'z'
    quality at f32 iteration cost.

    Args:
      sc: the 'c' Solver, solved once already (its iterate is the start).
      a_re64/a_im64: f64 planes of A [nnzbA, LM, LM] (for the residual op).
      bx64: B scattered into X shape, complex128 [nnzbX, LM, LN].
      info_c: the c-stage SolveInfo (iteration/flop accounting baseline).

    Returns (x complex128 [nnzbX, LM, LN], SolveInfo, converged: bool).
    """
    from .ops.blocksparse import BlockSparseAction
    from .refine import refinement_loop

    plan = sc.plan
    act = BlockSparseAction.from_plan(plan, a_re64, a_im64, engine="xla",
                                      ln=sc.ln)
    apply64 = jax.jit(lambda xr, xi: act.multiply((xr, xi)))
    bn2 = sc._bn2
    if bn2 is None:
        raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                            "matrix 'B' has not been set")

    def _correction(r, res2, stall, inner_max):
        inv_r = np.where(res2 > 0, 1.0 / np.where(res2 > 0, res2, 1.0), 0.0)
        result = sc._solve_xshaped(r, jnp.asarray(inv_r), stall, inner_max)
        dre, dim = sc._unpack_x(result.x)
        inner_iters = int(result.iterations)
        if int(result.return_status) != int(Status.SUCCESS):
            inner_iters = inner_max
        return ((dre.astype(np.float64), dim.astype(np.float64)),
                inner_iters)

    res = refinement_loop(
        apply64=apply64, bx64=bx64,
        colindx=plan.colindx.astype(np.int64), bn2=bn2,
        x0=sc.get_matrix("X").astype(np.complex128),
        tolerance=tolerance, max_iterations=max_iterations,
        total_iters=info_c.iterations_needed,
        inner_base=info_c.iterations_needed,
        solve_correction=_correction,
        stall_seed=info_c.residuum_reached,
        flops_per_round=core.flops_per_probe(plan.n_pairs, plan.nnzb_x,
                                             sc.lm, sc.ln),
        flops_per_iteration=core.flops_per_iteration(
            plan.n_pairs, plan.nnzb_x, sc.lm, sc.ln),
        echo=echo, max_rounds=max_rounds, label="refine")

    info = SolveInfo(
        residuum_reached=res["ratio"],
        iterations_needed=res["total_iters"],
        flops_performed=info_c.flops_performed + res["flops"],
        flops_performed_all=sc.plan.flops_performed_all,
        return_status=int(Status.SUCCESS) if res["converged"]
        else int(Status.MAX_ITERATIONS),
    )
    return res["x"], info, res["converged"]


def _scatter_to_x(plan, b_data: np.ndarray, lm: int, ln: int) -> np.ndarray:
    """B blocks [nnzbB, LM, LN] -> X-shaped complex128 [nnzbX, LM, LN]."""
    bx = np.zeros((plan.nnzb_x, lm, ln), np.complex128)
    np.add.at(bx, plan.subset.astype(np.int64),
              np.asarray(b_data, np.complex128))
    return bx


def solve_mixed(a: Bsr, x: Bsr, b: Bsr, *, tolerance: float = 1e-9,
                max_iterations: int = 999, c_tolerance: float = 1e-4,
                engine: str = "auto", index_offset: int = 0,
                echo: int = 0) -> tuple[Bsr, SolveInfo]:
    """Mixed precision ('m'): iterate in complex64 on the MXU fast path,
    then reach f64 residuals by iterative refinement (one Ozaki f64-quality SpMM
    per round + f32 correction solves, see ``refine_mixed``).  Falls back to
    a complex128 re-solve from the refined iterate only if refinement
    stalls.  The reference DECLARES this mode but never enabled it
    (tfqmrgpu.cu:42 "mixed precision is still buggy"); here it is the
    recommended way to get f64 residuals at f32 iteration cost on TPU.
    """
    if not jax.config.read("jax_enable_x64"):
        from . import enable_x64

        enable_x64()
    sc = Solver(a, x, b, precision="c", engine=engine,
                index_offset=index_offset, echo=echo)
    # bound the c-stage budget: when f32 stalls above c_tolerance (rounding
    # floor ~ cond(A)*eps_f32), burning the whole budget here is waste --
    # refinement only needs a decent initial iterate
    maxit_c = min(max_iterations, max(150, max_iterations // 4))
    info_c = sc.solve(tolerance=max(c_tolerance, tolerance),
                      max_iterations=maxit_c)

    from .ops import layout as lops

    a_re64, a_im64 = lops.complex_to_planes(a.data, np.float64)
    bx64 = _scatter_to_x(sc.plan, b.data, sc.lm, sc.ln)
    xm, info, converged = refine_mixed(sc, a_re64, a_im64, bx64, tolerance,
                                       max_iterations, info_c, echo=echo)
    if echo > 0:
        print(f"# mixed: {info_c.iterations_needed} c-iterations + "
              f"{info.iterations_needed - info_c.iterations_needed} "
              f"refine-iterations -> residuum {info.residuum_reached:.3e}"
              f"{'' if converged else ' (stalled)'}")
    if not converged and info.iterations_needed < max_iterations:
        # guarantee 'z' quality: finish with a complex128 solve restarted
        # from the refined iterate
        sz = Solver(a, x, b, precision="z",
                    engine="dense" if engine in ("pallas", "pairs")
                    else engine,
                    index_offset=index_offset, echo=echo)
        sz.set_matrix("X", xm)
        info_z = sz.solve(tolerance=tolerance,
                          max_iterations=max_iterations
                          - info.iterations_needed)
        info_z.iterations_needed += info.iterations_needed
        info_z.flops_performed += info.flops_performed
        return x.with_data(sz.get_matrix("X")), info_z
    return x.with_data(xm), info


def solve(a: Bsr, x: Bsr, b: Bsr, *, precision: str = "z",
          tolerance: float = 1e-6, max_iterations: int = 999,
          engine: str = "auto", index_offset: int = 0,
          echo: int = 0) -> tuple[Bsr, SolveInfo]:
    """One-call convenience: returns (X with data attached, SolveInfo).
    The TPU analogue of tfqmrgpu::tfqmrgpu_bsrsv (tfqmrgpu.cu:700-791).
    precision 'm' runs the mixed c-iterate/z-refine pipeline."""
    if precision == "m":
        return solve_mixed(a, x, b, tolerance=tolerance,
                           max_iterations=max_iterations, engine=engine,
                           index_offset=index_offset, echo=echo)
    s = Solver(a, x, b, precision=precision, engine=engine,
               index_offset=index_offset, echo=echo)
    info = s.solve(tolerance=tolerance, max_iterations=max_iterations)
    return x.with_data(s.get_matrix("X")), info


def bsrsv(a: Bsr, x: Bsr, b: Bsr, *, precision: str = "z",
          tolerance: float = 1e-6, max_iterations: int = 999,
          index_offset: int = 0, echo: int = 0):
    return solve(a, x, b, precision=precision, tolerance=tolerance,
                 max_iterations=max_iterations, index_offset=index_offset,
                 echo=echo)


def bsrsv_z(a, x, b, **kw):
    """complex128 one-call solve (reference: tfqmrgpu_bsrsv_z,
    tfqmrgpu.cu:796-809)."""
    kw.setdefault("precision", "z")
    return bsrsv(a, x, b, **kw)


def bsrsv_c(a, x, b, **kw):
    """complex64 one-call solve (reference: tfqmrgpu_bsrsv_c,
    tfqmrgpu.cu:812-822)."""
    kw.setdefault("precision", "c")
    return bsrsv(a, x, b, **kw)


def bsrsv_m(a, x, b, **kw):
    """mixed-precision one-call solve: c iterations + z refinement (the
    reference's declared-but-disabled 'm' mode, tfqmrgpu.cu:42)."""
    kw.setdefault("precision", "m")
    return bsrsv(a, x, b, **kw)
