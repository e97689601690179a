"""Pallas pair-plan SpMM engine: Y[iY] += A[iA] @ X[iX] over a pair list.

This is the TPU-native replacement for the reference's gemmNxNf pair walk
(reference: tfQMRgpu/include/tfqmrgpu_blockmult.hxx:10-93 and the `multi`
benchmark mode, bench_tfqmrgpu.cu:289-440).  The reference assigns one CUDA
block per Y block and walks its (iA, iX) pairs through shared memory; a
literal port would be gather-bound on TPU.  Instead the plan is compiled,
once, into an MXU/DMA-friendly schedule:

1.  **Geometry recovery** (host, pattern-only).  A pair list is generated
    from an underlying BSR triple (tfqmrgpu.cu:183-230): pairs sharing an iA
    belong to one block row; iY--iX connectivity closes block columns.
    Union-find recovers these labels even from bare pair files
    (test/multiplication/plan_*.14-287-16 carry no BSR structure).
2.  **Bandwidth-minimizing relabeling**.  X/Y blocks are renamed
    column-major with rows in Cuthill-McKee order of the row-adjacency
    graph, which shrinks the X-index span of every Y tile from O(nnzbX) to
    O(stencil bandwidth) -- the golden plan drops from ~3160 to <160.
3.  **Union-ELL A panels**.  Y blocks are grouped into tiles of ``r_tile``;
    each tile's A blocks are scattered (host, once per setMatrix) into a
    dense panel [2*r_tile*LM, ku*LM] holding the re plane stacked on the im
    plane, so that one MXU matmul per tile computes all four real products:
        [a_re; a_im] @ [x_re | x_im] = [[P1 P2]; [Q1 Q2]],
        y_re = P1 - Q2,  y_im = P2 + Q1.
4.  **Sliding X window**.  X lives in HBM as one flat [nblocks*LM, LN]
    panel; the kernel sees two consecutive S-block windows selected per tile
    through scalar-prefetch index_maps, so any tile whose span fits S reads
    its operands from VMEM.  Consecutive tiles share windows, so each window
    is DMA'd once (pallas revisiting semantics).

The multiply runs entirely in the relabeled space: callers permute X once
(host) and read Y back in relabeled order, so chained multiplies (the
benchmark loop, or the tfQMR iteration) pay zero per-call reindexing.
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os
from collections import deque

import numpy as np

Pair = tuple


# --------------------------------------------------------------- recovery

def _find(par: np.ndarray, i: int) -> int:
    r = i
    while par[r] != r:
        r = par[r]
    while par[i] != r:
        par[i], i = r, par[i]
    return int(r)


def recover_geometry(pair_a, pair_x, pair_y, nnzb_y: int):
    """Recover (row_fragment, column) labels of the shared X/Y pattern space
    from a bare pair list.  Returns (frag[nnzb_y], col[nnzb_y])."""
    pa = np.asarray(pair_a, dtype=np.int64)
    px = np.asarray(pair_x, dtype=np.int64)
    py = np.asarray(pair_y, dtype=np.int64)
    n = pa.shape[0]

    def _union(par, a, b):
        ra, rb = _find(par, int(a)), _find(par, int(b))
        if ra != rb:
            par[ra] = rb

    par = np.arange(nnzb_y)
    o = np.argsort(pa, kind="stable")
    pa_s, py_s, px_s = pa[o], py[o], px[o]
    i = 0
    while i < n:
        j = i + 1
        while j < n and pa_s[j] == pa_s[i]:
            j += 1
        for t in range(i + 1, j):
            # same iA => same block row for the Y blocks AND the same middle
            # row for the X blocks (col(iA) is one row index)
            _union(par, py_s[i], py_s[t])
            _union(par, px_s[i], px_s[t])
        i = j
    frag = np.fromiter((_find(par, i) for i in range(nnzb_y)), np.int64,
                       nnzb_y)
    _, frag = np.unique(frag, return_inverse=True)

    par = np.arange(nnzb_y)
    for t in range(n):
        ra, rb = _find(par, int(py[t])), _find(par, int(px[t]))
        if ra != rb:
            par[ra] = rb
    col = np.fromiter((_find(par, i) for i in range(nnzb_y)), np.int64,
                      nnzb_y)
    _, col = np.unique(col, return_inverse=True)
    return frag, col


def _cuthill_mckee(nfrag: int, edges_a: np.ndarray, edges_b: np.ndarray):
    """BFS (Cuthill-McKee) ordering of the fragment graph -> rank[nfrag]."""
    adj = [set() for _ in range(nfrag)]
    for a, b in zip(edges_a, edges_b):
        if a != b:
            adj[a].add(int(b))
            adj[b].add(int(a))
    order = []
    seen = np.zeros(nfrag, bool)
    deg = np.array([len(s) for s in adj])
    for s in np.argsort(deg):
        if seen[s]:
            continue
        seen[s] = True
        dq = deque([int(s)])
        while dq:
            u = dq.popleft()
            order.append(u)
            for v in sorted(adj[u], key=lambda v: len(adj[v])):
                if not seen[v]:
                    seen[v] = True
                    dq.append(v)
    rank = np.zeros(nfrag, np.int64)
    rank[np.array(order)] = np.arange(nfrag)
    return rank


# ------------------------------------------------------------------- pack

@dataclasses.dataclass
class PairPanelPlan:
    """Compiled pair-plan schedule (pattern-only; data enters via panels)."""

    ntiles: int
    r_tile: int
    ku: int                  # union X blocks per tile (max-padded)
    lm: int
    ln: int
    s_window: int            # window STRIDE in blocks (segment size)
    n_windows: int           # number of S-block segments the padded X spans
    nnzb_y: int
    nnzb_x: int
    perm: np.ndarray         # int64[nnzb_x]: new block id -> old block id
    inv_perm: np.ndarray     # int64[nnzb_x]: old -> new
    wsel: np.ndarray         # int32[ntiles]: window index (units of S blocks)
    xloc: np.ndarray         # int32[ntiles, ku]: window-relative block idx
    kcount: np.ndarray       # int32[ntiles]: true union size per tile
    # A panel scatter map (host, applied per setMatrix):
    pair_tile: np.ndarray    # int32[nPairs]
    pair_rslot: np.ndarray   # int32[nPairs]
    pair_kslot: np.ndarray   # int32[nPairs]
    pair_a: np.ndarray       # int64[nPairs] source A block
    inflation: float         # padded block-MACs / nPairs
    # compressed column of each NEW block id (pad blocks -> -1); used by the
    # fused solver primitives for per-column segmented reductions
    col_of_new: np.ndarray
    # window COVER in blocks: each replica spans s_window + o_window (+g)
    # blocks.  o_window == s_window is the legacy 2S overlap; a stride
    # factor k sets s_window = k*base and o_window = base, cutting the
    # replica traffic from 2x to (k+1)/k of the X panel at the price of
    # (k+1)/2 times the resident window VMEM.
    o_window: int = 0
    # RESIDENT-X mode: the whole padded X panel is ONE window (s_window =
    # n_slots, no overlap cover) held in VMEM for the entire multiply.  The
    # kernel's window BlockSpec uses a constant index map, so Mosaic fetches
    # the panel once instead of re-streaming a window per wsel change, and
    # the caller skips the overlapping-replica build entirely (the replica
    # copies cost ~2x the X panel in HBM traffic per multiply).  Also lifts
    # the tiles-share-a-window constraint from t_step batching.  Only
    # admissible when the (split-lane) panel fits the VMEM budget next to
    # the A-panel double buffers -- see resident_fits_vmem().
    resident: bool = False
    r_col: int = 0           # blocks per column in col_pad layout (0 = off)
    n_slots: int = 0         # relabeled block-slot count (>= nnzb_x) = None
    # Run-aware copy program: each code = (src_rel << 16) | dst_slot moves
    # ``copy_g`` consecutive blocks from the window into the union scratch.
    # Unions decompose into runs of consecutive relabeled ids; one copy per
    # ceil(run/g) instead of one per block cuts the scalar-core issue count
    # (the kernel's critical path) by ~2x on FD-like plans.  Overruns past a
    # run land in the next run's slots and are overwritten by the next copy
    # (dst-ordered), or in zero-A pad slots.
    copy_g: int = 1
    cmax: int = 0            # codes per tile (max, incl. coverage pads)
    copy_codes: np.ndarray = None   # int32[ntiles, cmax]
    n_copies: np.ndarray = None     # int32[ntiles] normal program length
    n_copies_full: np.ndarray = None  # int32[ntiles] + first-use coverage

    @property
    def x_rows_padded(self) -> int:
        return self.n_windows * self.s_window * self.lm

    @property
    def o_blocks(self) -> int:
        """Effective window cover (legacy plans stored 0 = stride)."""
        if self.resident:
            return 0
        return self.o_window or self.s_window


def pack_pair_plan(pair_a, pair_x, pair_y, nnzb_y: int, nnzb_x: int,
                   lm: int, ln: int, r_tile: int = 2,
                   max_window: int = 512, s_window: int = 0,
                   row_of=None, col_of=None,
                   col_pad: bool = False, copy_g: int = 2,
                   stride_factor: int = 1,
                   resident: bool = False) -> PairPanelPlan:
    """Compile a pair list into the panel/window schedule.

    row_of/col_of: optional known geometry (from a real BSR plan); recovered
    from the pair list if absent.  Raises ValueError when no ordering keeps
    tile spans within ``max_window`` blocks (caller should fall back).

    col_pad: pad every compressed column to the same block count R so the
    relabeled space factors as [ncc, R].  The solver's per-column vector
    operations then become plain reshapes/broadcasts (no gathers, scatters
    or one-hot matmuls); the SpMM tiles over the padded slots carry zero A
    panels.  Costs block-count inflation up to max/mean column fill.

    resident: True / False / "auto" -- pack the whole panel as ONE
    VMEM-resident window (see PairPanelPlan.resident); "auto" enables it
    whenever the panel fits the VMEM budget (resident_feasible)."""
    pa = np.asarray(pair_a, dtype=np.int64)
    px = np.asarray(pair_x, dtype=np.int64)
    py = np.asarray(pair_y, dtype=np.int64)
    if nnzb_x != nnzb_y:
        raise ValueError("pair plans share one X/Y pattern space")

    if row_of is None or col_of is None:
        frag, col = recover_geometry(pa, px, py, nnzb_y)
    else:
        frag = np.asarray(row_of, dtype=np.int64)
        col = np.asarray(col_of, dtype=np.int64)
        _, frag = np.unique(frag, return_inverse=True)
        _, col = np.unique(col, return_inverse=True)
    nfrag = int(frag.max()) + 1

    rank = _cuthill_mckee(nfrag, frag[py], frag[px])
    key = col * (nfrag + 1) + rank[frag]
    cm_order = np.argsort(key, kind="stable")      # old ids, col-major
    ncol = int(col.max()) + 1
    if col_pad:
        counts = np.bincount(col, minlength=ncol)
        r_col = int(counts.max())
        col_sorted = col[cm_order]
        col_starts = np.concatenate([[0], np.cumsum(counts)])
        rank_in_col = np.arange(nnzb_x) - col_starts[col_sorted]
        newid = col_sorted * r_col + rank_in_col
        n_slots = ncol * r_col
        perm = np.full(n_slots, -1, np.int64)
        perm[newid] = cm_order
        inv = np.zeros(nnzb_x, np.int64)
        inv[cm_order] = newid
    else:
        r_col = 0
        n_slots = nnzb_x
        perm = cm_order                             # new id -> old id
        inv = np.zeros(nnzb_x, np.int64)
        inv[perm] = np.arange(nnzb_x)

    npy, npx = inv[py], inv[px]                     # pairs in new labels
    order = np.argsort(npy, kind="stable")
    npy_s, npx_s, pa_s = npy[order], npx[order], pa[order]
    starts = np.searchsorted(npy_s, np.arange(n_slots + 1))

    ntiles = (n_slots + r_tile - 1) // r_tile
    unions = []
    ku = 1
    span_max = 0
    for t in range(ntiles):
        lo = starts[t * r_tile]
        hi = starts[min((t + 1) * r_tile, n_slots)]
        u = np.unique(npx_s[lo:hi])
        if u.shape[0] == 0:
            u = np.zeros(1, np.int64)
        unions.append(u)
        ku = max(ku, u.shape[0])
        span_max = max(span_max, int(u[-1] - u[0] + 1))
    ku += ku % 2                           # even for the 2-wide gather
    if isinstance(resident, str):
        if resident == "auto":
            # split-lane and f32 windows both cost 8*ln bytes per row, so
            # the feasibility test is precision-independent
            resident = resident_feasible(n_slots, lm, ln, "highest", copy_g)
        else:
            resident = resident not in ("0", "", "false")
    if span_max > max_window and not resident:
        raise ValueError(
            f"tile X-span {span_max} exceeds the window budget {max_window}; "
            "pattern has no recoverable locality")
    if resident:
        # one window covering the whole relabeled panel; no overlap cover
        s_window = n_slots
        o_window = 0
        if s_window + max(int(copy_g), 1) > 0x7FFF:
            raise ValueError(
                f"resident plan: {n_slots} slots exceed the 15-bit "
                "src field of the copy codes")
    elif s_window:
        if s_window < span_max:
            raise ValueError(f"s_window={s_window} < span {span_max}")
        o_window = s_window
    else:
        base = max(span_max, 2 * ku, 32)
        k_str = max(int(stride_factor), 1)
        s_window = k_str * base
        # the replica must cover any tile starting anywhere in its
        # segment: stride + base; k=1 degenerates to the legacy 2S
        o_window = base

    wsel = np.zeros(ntiles, np.int32)
    xloc = np.zeros((ntiles, ku), np.int32)
    kcount = np.zeros(ntiles, np.int32)
    for t, u in enumerate(unions):
        w = int(u[0]) // s_window
        wsel[t] = w
        xloc[t, : u.shape[0]] = (u - w * s_window).astype(np.int32)
        kcount[t] = u.shape[0]
    n_windows = 1 if resident else int(wsel.max()) + 2

    # run-aware copy program (see PairPanelPlan.copy_codes)
    g = max(int(copy_g), 1)
    if ku + g > 0xFFFF:
        raise ValueError(f"union size {ku}+{g} exceeds the 16-bit dst field")
    progs, n_copies, n_copies_full = [], [], []
    for t, u in enumerate(unions):
        rel = (u - wsel[t] * s_window).astype(np.int64)
        cuts = np.flatnonzero(np.diff(rel) != 1) + 1
        codes, dst = [], 0
        for run in np.split(rel, cuts):
            for off in range(0, run.shape[0], g):
                codes.append((int(run[off]) << 16) | (dst + off))
            dst += run.shape[0]
        n_copies.append(len(codes))
        # first-use coverage: fill [kcount, ku) so every slot the MXU reads
        # is finite before the first real tile touches this scratch buffer
        for s in range(int(kcount[t]), ku, g):
            codes.append(s)                         # src_rel 0, dst s
        n_copies_full.append(len(codes))
        progs.append(codes)
    cmax = max((len(c) for c in progs), default=1)
    cmax += cmax % 2                                # even for 2-wide loop
    copy_codes = np.full((ntiles, cmax), ku, np.int32)   # pad: dst=ku slot
    for t, codes in enumerate(progs):
        copy_codes[t, : len(codes)] = codes

    # A-panel scatter map: pair (iY, iA, iX) -> panel[tile, rslot, kslot]
    pair_tile = (npy_s // r_tile).astype(np.int32)
    pair_rslot = (npy_s % r_tile).astype(np.int32)
    pair_kslot = np.zeros(npx_s.shape[0], np.int32)
    for t, u in enumerate(unions):
        lo = starts[t * r_tile]
        hi = starts[min((t + 1) * r_tile, n_slots)]
        pair_kslot[lo:hi] = np.searchsorted(u, npx_s[lo:hi]).astype(np.int32)

    inflation = (ntiles * r_tile * ku) / max(len(pa), 1)
    n_blocks_padded = n_windows * s_window
    col_of_new = np.full(n_blocks_padded, -1, np.int64)
    if col_pad:
        col_of_new[: n_slots] = np.arange(n_slots) // r_col
    else:
        col_of_new[: n_slots] = col[perm]
    return PairPanelPlan(
        ntiles=ntiles, r_tile=r_tile, ku=ku, lm=lm, ln=ln,
        s_window=s_window, n_windows=n_windows, o_window=o_window,
        resident=resident,
        nnzb_y=nnzb_y, nnzb_x=nnzb_x, perm=perm, inv_perm=inv,
        wsel=wsel, xloc=xloc, kcount=kcount,
        pair_tile=pair_tile, pair_rslot=pair_rslot, pair_kslot=pair_kslot,
        pair_a=pa_s, inflation=float(inflation),
        col_of_new=col_of_new, r_col=r_col, n_slots=n_slots,
        copy_g=g, cmax=cmax, copy_codes=copy_codes,
        n_copies=np.asarray(n_copies, np.int32),
        n_copies_full=np.asarray(n_copies_full, np.int32),
    )


def _program_tables(plan: PairPanelPlan, tiles, ku_cap: int):
    """Flattened copy-code table + trip counts for a tile subset.

    ``ku_cap`` caps dst slots (bucketed kernels run at a smaller padded
    union); coverage codes past the cap redirect to the cap's pad slot.
    The first two tiles use the FULL coverage program (VMEM scratch starts
    uninitialized; every slot the MXU reads must be finite).  One trailing
    pipeline row is appended."""
    g = plan.copy_g
    nt = len(tiles)
    codes = np.full((nt + 1, plan.cmax), ku_cap, np.int32)
    trips = np.zeros(nt + 1, np.int32)
    for j, t in enumerate(tiles):
        n = int(plan.n_copies_full[t] if j < 2 else plan.n_copies[t])
        c = plan.copy_codes[t, :n]
        if ku_cap < plan.ku:
            c = np.where((c & 0xFFFF) > ku_cap, np.int32(ku_cap), c)
        codes[j, :n] = c
        trips[j] = (n + 1) // 2
    return codes.reshape(-1), trips


def make_tile_tables(plan: PairPanelPlan, tiles, src_base: int = 0,
                     span: int = 0):
    """Per-TILE copy programs for the TILE-pipelined resident kernel,
    over an explicit tile-id list (-1 = pad tile: empty program).

    Real copy sources are rebased by ``src_base`` (resident-source plans
    carry absolute block sources; a shard-local window starts at that
    block) and validated against ``span`` blocks when given.  The first
    TWO list positions carry full coverage of their per-tile buffer
    (the two scratch buffers start uninitialized).  Returns
    (codes_flat int32[ntl*cmax], trips int32[ntl], cmax)."""
    g, ku = plan.copy_g, plan.ku
    progs = []
    for j, t in enumerate(np.asarray(tiles, dtype=np.int64)):
        t = int(t)
        codes = []
        kc = 0
        if t >= 0:
            for c in map(int, plan.copy_codes[t, : plan.n_copies[t]]):
                rel, dst = (c >> 16) - src_base, c & 0xFFFF
                if rel < 0 or (span and rel > span):
                    raise ValueError(
                        f"tile {t}: source outside the local span")
                codes.append((rel << 16) | dst)
            kc = int(plan.kcount[t])
        if j < 2:                        # buffer-coverage prologue
            for d in range(kc, ku, g):
                codes.append(d)          # src 0 = local window base
        progs.append(codes)
    cmax = max((len(c) for c in progs), default=1)
    cmax += cmax % 2
    codes_flat = np.full((len(progs), cmax), ku, np.int32)
    trips = np.zeros(len(progs), np.int32)
    for j, c in enumerate(progs):
        codes_flat[j, : len(c)] = c
        trips[j] = (len(c) + 1) // 2
    return codes_flat.reshape(-1), trips, cmax


def make_step_tables(plan: PairPanelPlan, t_step: int, tiles=None,
                     wsel_base: int = 0, resident_span: int = 0,
                     src_base: int = 0):
    """Group ``t_step`` consecutive tiles into one grid step.

    Per-grid-step fixed costs (DMA issue + scalar bookkeeping, ~1 us on
    v5e) dominate the pair-panel stream once tiles are small; fetching T
    tiles' A panels per step amortizes them T-fold.  All T tiles of a step
    share ONE window (their unions are consecutive in the relabeled order,
    so the overlapping 2S window almost always covers the union of unions);
    raises ValueError when it does not -- caller falls back to t_step=1.

    ``tiles``: optional explicit tile-id sequence (default: all tiles in
    order).  Entries of -1 are PAD tiles (zero program, covered in the
    first two steps) -- used by the sharded engine for per-shard chunks.
    ``wsel_base``: subtracted from every window index -- used when the
    window replicas are built from a shard-local slice of X.

    ``resident_span``: >0 compiles the tables against a single RESIDENT
    window of that many blocks (e.g. a shard's whole local X slice):
    every step's window index is 0 and copy sources become absolute
    block offsets (rebased by ``wsel_base``); raises ValueError when a
    source falls outside the span.

    ``src_base``: absolute block offset subtracted from every copy
    source -- used when the SOURCE plan is itself resident (wsel all
    zero, sources already absolute) and the tables target a shard-local
    resident window starting at that block (pass wsel_base=0 then).

    Returns (nsteps, wsel_step[nsteps+1], codes_flat, trips[nsteps+1],
    cmax_step): the copy program of a step concatenates its tiles' programs
    with dst offsets j*ku; the first two steps carry full coverage of all
    T*ku slots (uninitialized-VMEM guard, including pad tiles)."""
    T = int(t_step)
    ku, S, g = plan.ku, plan.s_window, plan.copy_g
    O = plan.o_blocks
    if T * ku + g > 0xFFFF:
        raise ValueError("step dst space exceeds the 16-bit field")
    if resident_span and resident_span + g > 0x7FFF:
        raise ValueError("resident span exceeds the 15-bit src field")
    rel_lim = resident_span if resident_span else S + O
    if tiles is None:
        tiles = np.arange(plan.ntiles, dtype=np.int64)
    else:
        tiles = np.asarray(tiles, dtype=np.int64)
    ntl = tiles.shape[0]
    nsteps = (ntl + T - 1) // T
    wsel_step = np.zeros(nsteps + 1, np.int32)
    progs = []
    prev_w = 0
    for s in range(nsteps):
        step_tiles = tiles[s * T: (s + 1) * T]
        real = [int(t) for t in step_tiles if t >= 0]
        if resident_span:
            w = 0
        else:
            w = (int(min(plan.wsel[t] for t in real)) - wsel_base) if real \
                else prev_w
        prev_w = w
        wsel_step[s] = w
        codes = []
        for j in range(len(step_tiles)):
            t = int(step_tiles[j])
            if t >= 0:
                shift = (int(plan.wsel[t]) - wsel_base - w) * S - src_base
                for c in map(int, plan.copy_codes[t, : plan.n_copies[t]]):
                    rel, dst = (c >> 16) + shift, c & 0xFFFF
                    if rel > rel_lim or rel < 0:
                        raise ValueError(
                            f"t_step={T}: window span overflow at step {s}")
                    codes.append((rel << 16) | (j * ku + dst))
                kc = int(plan.kcount[t])
            else:
                kc = 0
            if s < 2:                       # coverage: [kcount, ku) pads
                for d in range(kc, ku, g):
                    codes.append(j * ku + d)
        if s < 2:                           # coverage: pad tiles of step
            for j in range(len(step_tiles), T):
                for d in range(0, ku, g):
                    codes.append(j * ku + d)
        progs.append(codes)
    wsel_step[nsteps] = wsel_step[nsteps - 1] if nsteps else 0
    cmax = max((len(c) for c in progs), default=1)
    cmax += cmax % 2
    codes_flat = np.full((nsteps + 1, cmax), T * ku, np.int32)
    trips = np.zeros(nsteps + 1, np.int32)
    for s, codes in enumerate(progs):
        codes_flat[s, : len(codes)] = codes
        trips[s] = (len(codes) + 1) // 2
    return nsteps, wsel_step, codes_flat.reshape(-1), trips, cmax


def precision_props(precision: str) -> dict:
    """Shape/cost properties of a pairpanel precision mode.

    xsplit: bf16 planes the X windows are pre-split into (1 = f32 raw);
    a_presplit: A panels ship as that many bf16 planes (0 = raw f32 --
    'bf16x6' splits A 3-way IN-KERNEL to keep the streamed bytes at 4/el);
    passes: MXU pass-equivalents per product (the 2*ln<=64 side-by-side
    packing is already folded in); mxu pass rate is ~173 TFlop/s bf16.

    'ozN' (N = slice count p, e.g. 'oz9') is the f64-quality Ozaki mode
    (ops/ozaki.py, make_pairpanel_multiply_oz): A and X ship as p pure
    exponent-blocked bf16 slice planes, the kernel runs the p(p+1)/2
    above-truncation cross products as p triangular dots with EXACT f32
    per-diagonal accumulation, and the f64 combine/descale/complex
    assembly happens outside."""
    if precision.startswith("ozc"):
        # compensated-accumulation oz (slice_params_comp): q = 8 slices
        # hold the full bf16 significand (dual spare binade keeps the
        # k-deep products exact).  The kernel folds ALL p(p+1)/2 products
        # into ONE correctly-rounded f32 plane via a hybrid TwoSum chain
        # (error terms exact in a second plane), assembles the complex
        # result in-kernel (r4), and outputs [M, 4*ln] -- 8x fewer output
        # bytes than the r3 per-diagonal layout.  TFQ_OZC_INT8=1 swaps to
        # int8 RAW-int A planes at q = 7 / p = 8 (half the A bytes, 36 vs
        # 28 MXU passes -- measured SLOWER on the golden plan, the MXU
        # passes dominate the A saving, so bf16 q = 8 is the default).
        p = int(precision[3:])
        a_b = 1 if _os.environ.get("TFQ_OZC_INT8", "0") != "0" else 2
        return dict(xsplit=p, a_presplit=p, passes=p * (p + 1) / 4.0,
                    a_bytes=a_b, comp=True)
    if precision.startswith("oz"):
        p = int(precision[2:])
        # triangular dots at ~half lanes on average; the 2*ln<=64 lane
        # packing folds pairs of products per pass like bf16x4.
        # a_bytes: int8 raw-int planes (the default, TFQ_OZ_INT8) halve
        # the A element size vs bf16 scaled values
        a_b = 1 if _os.environ.get("TFQ_OZ_INT8", "1") != "0" else 2
        return dict(xsplit=p, a_presplit=p, passes=p * (p + 1) / 4.0,
                    a_bytes=a_b)
    return {
        "highest": dict(xsplit=1, a_presplit=0, passes=6.0),
        "bf16":    dict(xsplit=2, a_presplit=2, passes=1.0),
        "bf16x3":  dict(xsplit=2, a_presplit=2, passes=3.0),
        "bf16x4":  dict(xsplit=2, a_presplit=2, passes=4.0),
        # 3-way splits, 6 cross products in 4 dots (2 full + 2 half-lane):
        # exact-f32 quality at ~2/3 of HIGHEST's MXU time and the same
        # A-DMA bytes as f32
        "bf16x6":  dict(xsplit=3, a_presplit=0, passes=4.0),
    }[precision]


PRECISIONS = ("bf16", "bf16x3", "bf16x4", "bf16x6", "highest")
# modes whose X windows are bf16 splits (need lm >= 16 sublane alignment)
SPLIT_X_PRECISIONS = ("bf16", "bf16x3", "bf16x4", "bf16x6")


def use_tile_pipe(plan: PairPanelPlan, precision: str) -> bool:
    """Whether the kernel should pipeline at TILE granularity (two per-tile
    union scratch buffers, gather of tile j+1 under the MXU work of tile j)
    instead of the default STEP granularity (two whole-step buffers).

    The step-level design stages ``t_step * ku`` blocks per buffer; at the
    wide grouped lanes of resident plans that scratch dominates VMEM and
    collapses the admissible t_step to where per-grid-step fixed cost
    (~9 us) dominates the multiply.  Tile-level buffers are t-independent,
    so wide-lane resident plans batch freely.  Env override:
    TFQ_PAIRS_TILEPIPE=0/1 (default: auto as above)."""
    env = _os.environ.get("TFQ_PAIRS_TILEPIPE", "auto")
    if env in ("0", "1"):
        return env == "1" and plan.resident
    if precision.startswith("oz"):
        return False
    return bool(plan.resident) and \
        2 * precision_props(precision)["xsplit"] * plan.ln >= 256


def _lanes_pad(lanes: int) -> int:
    """Physical VMEM lane width: buffers tile at 128 lanes, so a narrow
    last dim (e.g. the 16-lane fused panels of the FD geometry LN=8)
    occupies ceil(lanes/128)*128 lanes on chip.  Byte models that ignore
    this under-count narrow-lane working sets by up to 8x (observed: a
    scoped-vmem stack OOM at rtb=12.75 'm' where the model said 10.9 MB
    and Mosaic needed 11.1)."""
    return -(-lanes // 128) * 128


def vmem_need_bytes(plan: PairPanelPlan, precision: str, t: int,
                    tile_pipe=None) -> int:
    """Modeled VMEM working set of the kernel at grid-step batch ``t``:
    double-buffered A panels, union scratch, the two resident window
    replicas, and the output buffers.  All lane widths are PHYSICAL
    (padded to the 128-lane tile)."""
    pr = precision_props(precision)
    split = pr["a_presplit"] > 0
    a_b, n_a = ((pr.get("a_bytes", 2), pr["a_presplit"]) if split
               else (4, 1))
    w_lanes = _lanes_pad(2 * pr["xsplit"] * plan.ln)
    w_b = 2 if pr["xsplit"] > 1 else 4
    lm, ku, g, S = plan.lm, plan.ku, plan.copy_g, plan.s_window
    m2 = 2 * plan.r_tile * lm
    m = plan.r_tile * lm
    if tile_pipe is None:
        tile_pipe = use_tile_pipe(plan, precision)
    # oz: raw [m2, p*2ln] diagonal outputs (combined in f64 outside);
    # 'ozc' folds + complex-assembles in-kernel to [m, 4ln] (acc | err);
    # other modes assemble to [m, 2ln] in-kernel
    if pr.get("comp"):
        o_rows, o_lanes = m, _lanes_pad(4 * plan.ln)
    elif precision.startswith("oz"):
        o_rows, o_lanes = m2, _lanes_pad(2 * pr["xsplit"] * plan.ln)
    else:
        o_rows, o_lanes = m, _lanes_pad(2 * plan.ln)
    # resident plans hold ONE panel-sized scratch (manual DMA from HBM);
    # windowed plans carry two pipelined replica buffers
    win_bufs = 1 if plan.resident else 2
    win = win_bufs * (S + plan.o_blocks + g) * lm * w_lanes * w_b
    # tile-level pipelining: the two union buffers hold ONE tile each
    scr_ku = (ku + g) if tile_pipe else (t * ku + g)
    return (2 * n_a * t * m2 * _lanes_pad(ku * lm) * a_b
            + 2 * scr_ku * lm * w_lanes * w_b
            + win + 2 * t * o_rows * o_lanes * 4)


def plan_fits_vmem(plan: PairPanelPlan, precision: str,
                   cap: int = 100 << 20) -> bool:
    """Whether the kernel can run AT ALL (t_step=1) under the v5e scoped
    VMEM -- wide-lane grouped plans with large window spans can exceed the
    chip's 128 MB regardless of batching (the resident windows scale with
    span x lanes)."""
    return vmem_need_bytes(plan, precision, 1) <= cap


def resident_window_bytes(n_slots: int, lm: int, ln: int, precision: str,
                          copy_g: int = 2) -> int:
    """VMEM bytes of the resident-X window: ONE panel-sized scratch buffer
    (the kernel DMAs the HBM panel into it once at grid step 0; the input
    itself stays in ANY/HBM memory space)."""
    pr = precision_props(precision)
    w_lanes = _lanes_pad(2 * pr["xsplit"] * ln)
    w_b = 2 if pr["xsplit"] > 1 else 4
    return (n_slots + max(int(copy_g), 1)) * lm * w_lanes * w_b


def resident_feasible(n_slots: int, lm: int, ln: int, precision: str,
                      copy_g: int = 2, budget: int = 72 << 20) -> bool:
    """Whether a resident-X plan is worth packing: the full-panel window
    must leave VMEM headroom for the double-buffered A panels and scratch
    (~28 MB under the 100 MB scoped cap), and the slot count must fit the
    15-bit src field of the copy codes."""
    if n_slots + max(int(copy_g), 1) > 0x7FFF:
        return False
    return resident_window_bytes(n_slots, lm, ln, precision,
                                 copy_g) <= budget


def auto_t_step(plan: PairPanelPlan, precision: str,
                vmem_budget: int = 0, t_max: int = 64,
                tile_pipe=None) -> int:
    """Largest t_step whose VMEM working set fits ``vmem_budget`` and whose
    step windows validate.

    The per-grid-step fixed cost measured on v5e is ~8-10 us (DMA issue +
    wait latency; the scalar gather hides under it), so the multiply is
    step-count-bound until each step's A-panel DMA carries several MB.
    The default scoped VMEM is only 16 MB, but v5e has 128 MB physically
    and Mosaic accepts a raised ``vmem_limit_bytes`` (the kernel passes it,
    see _make_call) -- so the default budget here is 56 MB (override with
    TFQ_PAIRS_VMEM, in MB)."""
    if tile_pipe is None:
        tile_pipe = use_tile_pipe(plan, precision)
    if not vmem_budget:
        vmem_budget = int(_os.environ.get("TFQ_PAIRS_VMEM", "56")) << 20
        # wide-lane (grouped) plans carry big resident windows; grant
        # headroom above them up to the physical cap so t_step does not
        # collapse to 1 (the window bytes are t-independent).  The clamp
        # follows TFQ_PAIRS_VMEM_CAP so a plan admitted under a raised
        # pack cap also gets a matching batching budget (otherwise it
        # would collapse to t=1, the fixed-cost regime).
        clamp = max(100, int(_os.environ.get("TFQ_PAIRS_VMEM_CAP",
                                             "100"))) << 20
        win = vmem_need_bytes(plan, precision, 0, tile_pipe=tile_pipe)
        vmem_budget = max(vmem_budget, min(win + (44 << 20), clamp))
    # past ~1.5 MB of A panel per grid step the per-step fixed cost is
    # fully amortized and extra batching only raises VMEM pressure
    # (measured on the golden plan: t=8 at 1.8 MB/step beats t=32).
    # Tile-pipelined kernels keep per-tile buffers, so batching carries no
    # scratch cost -- let the A-panel window grow further (8 MB/step).
    n_a = precision_props(precision)["a_presplit"] or 1
    split = n_a > 1
    tile_a = n_a * 2 * plan.r_tile * plan.lm \
        * plan.ku * plan.lm * (2 if split else 4)
    a_cap = (8 << 20) if tile_pipe else (3 << 20) // 2
    t_sweet = 1
    while t_sweet < t_max and t_sweet * tile_a < a_cap:
        t_sweet *= 2
    t_max = min(int(t_max), t_sweet)
    t = int(t_max)
    while t > 1:
        if vmem_need_bytes(plan, precision, t,
                           tile_pipe=tile_pipe) <= vmem_budget:
            if tile_pipe:
                return t           # per-tile programs: nothing to validate
            try:
                make_step_tables(plan, t)
                return t
            except ValueError:
                pass
        t //= 2
    return 1


def build_a_panels(plan: PairPanelPlan, a_re: np.ndarray,
                   a_im: np.ndarray) -> np.ndarray:
    """Scatter A block data into stacked complex panels
    [ntiles, 2*r_tile*LM, ku*LM] (re rows on top of im rows); accumulates
    duplicate (iY, iX) pairs like the reference's += walk."""
    lm, r, ku = plan.lm, plan.r_tile, plan.ku
    flat = np.zeros((plan.ntiles * 2 * r * ku, lm, lm), dtype=a_re.dtype)
    base = (plan.pair_tile.astype(np.int64) * 2 * r
            + plan.pair_rslot) * ku + plan.pair_kslot
    stride = r * ku                                   # im rows offset
    np.add.at(flat, base, a_re[plan.pair_a])
    np.add.at(flat, base + stride, a_im[plan.pair_a])
    p = flat.reshape(plan.ntiles, 2 * r, ku, lm, lm).transpose(0, 1, 3, 2, 4)
    return np.ascontiguousarray(
        p.reshape(plan.ntiles, 2 * r * lm, ku * lm))


def build_a_panels_device(plan: PairPanelPlan, a_re, a_im):
    """Device-side panel build (one scatter-add): avoids shipping the
    inflated panels over the host link when A data is already on device."""
    import jax.numpy as jnp

    lm, r, ku = plan.lm, plan.r_tile, plan.ku
    base = jnp.asarray(
        ((plan.pair_tile.astype(np.int64) * 2 * r + plan.pair_rslot) * ku
         + plan.pair_kslot).astype(np.int32))
    stride = np.int32(r * ku)
    pa = jnp.asarray(plan.pair_a.astype(np.int32))
    flat = jnp.zeros((plan.ntiles * 2 * r * ku, lm, lm), dtype=a_re.dtype)
    flat = flat.at[base].add(a_re[pa]).at[base + stride].add(a_im[pa])
    p = flat.reshape(plan.ntiles, 2 * r, ku, lm, lm).transpose(0, 1, 3, 2, 4)
    return p.reshape(plan.ntiles, 2 * r * lm, ku * lm)


def rn16_f32(v):
    """Round an f32 array to the nearest bf16-representable value,
    RETURNED AS f32, by mantissa bit-masking (RN, ties away from zero).

    Deliberately NOT ``f32(bf16(v))``: under ``--xla_allow_excess_precision``
    XLA is free to elide the f32->bf16->f32 round-trip inside
    ``v - f32(bf16(v))``, which silently turns a split residual into exact
    zero (observed on the v5e relay).  The bit-masked form is opaque to
    that rewrite, works identically inside Mosaic kernels, and the result
    is exactly representable in bf16.  Shared by every hi/lo operand split
    (split_bf16x2/x3 here, the row-tile kernel in pallas_spmm)."""
    import jax
    import jax.numpy as jnp

    bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        (bits + np.uint32(0x8000)) & np.uint32(0xFFFF0000), jnp.float32)


def split_bf16x2(a):
    """Split an f32 array into (hi, lo) bfloat16 planes with
    a == hi + lo + O(2^-16) -- the operand halves of the 3-pass bf16 product
    that reproduces XLA's HIGH matmul precision (Mosaic kernels only expose
    DEFAULT and HIGHEST).  RN halves the split residual vs truncation;
    see rn16_f32 for why the rounding is bit-masked."""
    import jax.numpy as jnp

    hi_f32 = rn16_f32(a)
    hi = hi_f32.astype(jnp.bfloat16)         # exact: mantissa already fits
    lo = (a - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def split_bf16x3(a):
    """Three-way round-to-nearest bf16 split: a == hi + mid + lo + O(2^-25).
    Three bf16 mantissas (8 bits each) cover all 24 f32 mantissa bits, so
    the 6-product cross scheme ('bf16x6') reproduces exact-f32 (HIGHEST)
    matmul quality -- vs the 2-way split's ~1e-4 systematic floor at
    K~1000 accumulations.  Bit-masked RN for the same excess-precision
    reasons as split_bf16x2 (see rn16_f32)."""
    import jax.numpy as jnp

    hi_f32 = rn16_f32(a)
    r1 = a - hi_f32
    mid_f32 = rn16_f32(r1)
    return (hi_f32.astype(jnp.bfloat16), mid_f32.astype(jnp.bfloat16),
            (r1 - mid_f32).astype(jnp.bfloat16))


def permute_x(plan: PairPanelPlan, re: np.ndarray,
              im: np.ndarray) -> np.ndarray:
    """Split planes [nnzb_x, LM, LN] (old order) -> fused padded panel
    [x_rows_padded, 2*LN] (re in lanes [:ln], im in [ln:]); col_pad slots
    (perm == -1) stay zero."""
    ln = re.shape[2]
    out = np.zeros((plan.x_rows_padded // plan.lm, plan.lm, 2 * ln),
                   dtype=re.dtype)
    n_slots = plan.n_slots or plan.nnzb_x
    mask = plan.perm >= 0
    slots = np.flatnonzero(mask)
    out[slots, :, :ln] = re[plan.perm[mask]]
    out[slots, :, ln:] = im[plan.perm[mask]]
    del n_slots
    return out.reshape(plan.x_rows_padded, 2 * ln)


def unpermute_y(plan: PairPanelPlan, y_fused: np.ndarray):
    """Fused [>=n_slots*LM, 2*LN] (new order) -> (re, im) block lists
    [nnzb_y, LM, LN] in the original order (col_pad slots dropped)."""
    ln = y_fused.shape[1] // 2
    y = y_fused.reshape(-1, plan.lm, 2 * ln)
    re = np.zeros((plan.nnzb_y, plan.lm, ln), dtype=y_fused.dtype)
    im = np.zeros_like(re)
    n_slots = plan.n_slots or plan.nnzb_y
    mask = plan.perm[:n_slots] >= 0
    slots = np.flatnonzero(mask)
    re[plan.perm[:n_slots][mask]] = y[slots, :, :ln]
    im[plan.perm[:n_slots][mask]] = y[slots, :, ln:]
    return re, im


# -------------------------------------------------- column-grouped pairs
#
# The pair-panel layout streams each A block once PER RHS COLUMN it serves
# (a pair (iY, iA, iX) exists per column, tfqmrgpu.cu:183-230), so plans
# whose X grid is column-sparse (the golden plan: 1063 rows x 16 columns at
# 0.26 fill, ~3.9 columns per A block) pay ~3.9x the unique-A HBM traffic
# -- and the engine is A-bytes-bound.  Grouping G columns onto the lane
# axis lets one streamed A block serve all G at once:
#
#   new block space  = occupied (row, group) cells, LN' = G * LN lanes
#   new pair list    = unique (iA, row(iY), row(iX), group) -- deduped
#   X cells          = zero-filled where (row, col) has no block
#   Y cells          = masked back to the true pattern on extraction
#
# Correctness requires the pair list to be the FULL intersection of the
# underlying BSR patterns (every (Y exists, A exists, X exists) triple
# present -- exactly what the reference's createPlan emits): then a product
# against a present X lane either has its pair in the list or lands on an
# absent (masked) Y lane.  `pack_grouped` verifies this per A block and
# raises ValueError otherwise; group_size=1 degenerates to the ungrouped
# engine and is always safe.

def _optimal_groups(pmb: np.ndarray, group_size: int,
                    max_transitions: int = 2_000_000):
    """EXACT minimizer of the grouped cost over all partitions of the
    columns into groups of exactly ``group_size``.

    The cost of a partition is the deduped pair count
    ``sum_a |{groups a's pair columns touch}|`` = A-panel blocks streamed
    per multiply.  Distinct A column-masks collapse with multiplicity, so
    a group's cost contribution is independent of the rest of the
    partition -- which makes the problem a minimum-weight set partition,
    solved by DP over remaining-column bitmasks (each state expands only
    groups containing the lowest remaining column, so every partition is
    enumerated once).  Returns the optimal groups, or None when ncol is
    not divisible by group_size or the transition-count bound says the
    instance is too big (caller falls back to greedy + swap refinement).
    On the golden KKR plan (16 columns, G=4) this runs in seconds and
    dominates the hill-climb."""
    import functools
    import itertools
    from math import comb

    ncol = int(pmb.shape[1])
    G = int(group_size)
    if G < 2 or ncol % G != 0 or ncol > 24:
        return None
    est = 0
    rem = ncol
    while rem > 0:
        est += comb(ncol, rem) * comb(rem - 1, G - 1)
        rem -= G
    if est > max_transitions:
        return None

    # distinct A column-masks with multiplicities
    col_bits = (np.int64(1) << np.arange(ncol, dtype=np.int64))
    amask = (pmb.astype(np.int64) * col_bits[None, :]).sum(axis=1)
    masks_u, counts = np.unique(amask, return_counts=True)

    # cost of every possible group, vectorized over distinct masks
    combos = list(itertools.combinations(range(ncol), G))
    gmasks = np.array([sum(1 << c for c in combo) for combo in combos],
                      np.int64)
    hit = (masks_u[:, None] & gmasks[None, :]) != 0
    gcost = {int(m): int(c) for m, c in
             zip(gmasks, counts @ hit.astype(np.int64))}

    @functools.lru_cache(maxsize=None)
    def dp(remaining):
        if remaining == 0:
            return 0, ()
        b = (remaining & -remaining).bit_length() - 1
        rest = [c for c in range(ncol)
                if (remaining >> c) & 1 and c != b]
        best = None
        for combo in itertools.combinations(rest, G - 1):
            g = (1 << b) | sum(1 << c for c in combo)
            sub, sub_groups = dp(remaining & ~g)
            tot = gcost[g] + sub
            if best is None or tot < best[0]:
                best = (tot, sub_groups + (g,))
        return best

    _, chosen = dp((1 << ncol) - 1)
    dp.cache_clear()
    return [[c for c in range(ncol) if (g >> c) & 1] for g in chosen]


def _refine_groups(groups: list, pmb: np.ndarray, max_passes: int = 8):
    """Hill-climb column swaps between groups to minimize the TRUE grouped
    cost: the deduped pair count sum_a |{groups a's pair columns touch}|
    (= A-panel blocks streamed per multiply).  The greedy co-occurrence
    seeding optimizes a proxy (shared X rows); on the golden KKR plan this
    swap refinement cuts A replication a further ~10-15%."""
    ncol = pmb.shape[1]
    if ncol > 128:               # O(ncol^2) swap sweeps; huge grids keep greedy
        return groups
    assign = np.zeros(ncol, np.int64)
    for gi, g in enumerate(groups):
        assign[np.asarray(g, dtype=np.int64)] = gi
    ngroups = len(groups)
    pm = pmb.astype(np.int16)

    # cnt[a, g] = how many of a's pair columns sit in group g; the cost is
    # (cnt > 0).sum().  A c1<->c2 swap moves only two columns, so the new
    # cost of the two touched groups is an O(nau) update -- no full
    # [nau,ncol]x[ncol,ngroups] rebuild per candidate swap.
    onehot = np.zeros((ncol, ngroups), np.int16)
    onehot[np.arange(ncol), assign] = 1
    cnt = pm @ onehot                          # [nau, ngroups]
    nz = (cnt > 0).sum(axis=0).astype(np.int64)
    for _ in range(max_passes):
        improved = False
        for c1 in range(ncol):
            for c2 in range(c1 + 1, ncol):
                g1, g2 = int(assign[c1]), int(assign[c2])
                if g1 == g2:
                    continue
                m1, m2 = pm[:, c1], pm[:, c2]
                n1 = int(((cnt[:, g1] - m1 + m2) > 0).sum())
                n2 = int(((cnt[:, g2] - m2 + m1) > 0).sum())
                if n1 + n2 < nz[g1] + nz[g2]:
                    cnt[:, g1] += m2 - m1
                    cnt[:, g2] += m1 - m2
                    nz[g1], nz[g2] = n1, n2
                    assign[c1], assign[c2] = g2, g1
                    improved = True
        if not improved:
            break
    return [sorted(np.flatnonzero(assign == gi).tolist())
            for gi in range(ngroups)]


@dataclasses.dataclass
class GroupedPairs:
    """Column-grouped transform of a pair list (host, pattern-only)."""

    group_size: int
    ncol: int
    ngroups: int
    nnzb2: int               # occupied (row, group) cells
    ln2: int                 # group_size * ln
    pair_a2: np.ndarray      # int64[nPairs2]  ORIGINAL A block ids
    pair_x2: np.ndarray      # int64[nPairs2]  new cell ids
    pair_y2: np.ndarray      # int64[nPairs2]
    row_of2: np.ndarray      # int64[nnzb2]    recovered row per cell
    col_of2: np.ndarray      # int64[nnzb2]    group index per cell
    src_of: np.ndarray       # int64[nnzb2, group_size] orig block id | -1
    cell_of_blk: np.ndarray  # int64[nnzb]     cell id per original block
    lane_of_blk: np.ndarray  # int64[nnzb]     lane slot (cpos) per block
    groups: list             # list[list[int]] column ids per group


def _group_columns(rbool: np.ndarray, group_size: int) -> list:
    """Greedy max-co-occurrence clustering of columns into equal groups
    (columns sharing rows belong together: their rows' A blocks then serve
    both lanes in one streamed panel)."""
    ncol = rbool.shape[1]
    co = (rbool.astype(np.int64).T @ rbool.astype(np.int64))
    left = set(range(ncol))
    groups = []
    while left:
        seed = max(left, key=lambda c: co[c, c])
        g = [seed]
        left.discard(seed)
        while len(g) < group_size and left:
            nxt = max(left, key=lambda c: sum(int(co[c, x]) for x in g))
            g.append(nxt)
            left.discard(nxt)
        groups.append(g)
    return groups


def pack_grouped(pair_a, pair_x, pair_y, nnzb: int, ln: int,
                 group_size: int, row_of=None, col_of=None,
                 groups=None) -> GroupedPairs:
    """Transform a full-intersection pair list into the column-grouped
    space (see module comment above).  Raises ValueError when the list is
    not a full intersection, contains duplicate (iY, iA, iX) triples, or
    has no column structure to group."""
    pa = np.asarray(pair_a, dtype=np.int64)
    px = np.asarray(pair_x, dtype=np.int64)
    py = np.asarray(pair_y, dtype=np.int64)
    if row_of is None or col_of is None:
        row, col = recover_geometry(pa, px, py, nnzb)
    else:
        _, row = np.unique(np.asarray(row_of, np.int64), return_inverse=True)
        _, col = np.unique(np.asarray(col_of, np.int64), return_inverse=True)
    nrow, ncol = int(row.max()) + 1, int(col.max()) + 1
    group_size = int(group_size)
    if group_size < 2 or ncol < 2:
        raise ValueError("grouping needs group_size >= 2 and >= 2 columns")

    # cell injectivity of the recovered geometry
    cell_key = row * np.int64(ncol) + col
    if np.unique(cell_key).shape[0] != nnzb:
        raise ValueError("recovered (row, col) labels collide")
    blk_of_cell = np.full(nrow * ncol, -1, np.int64)
    blk_of_cell[cell_key] = np.arange(nnzb)

    # duplicate pairs would be silently deduped -> reject
    trip = (pa * nnzb + py) * nnzb + px
    if np.unique(trip).shape[0] != trip.shape[0]:
        raise ValueError("duplicate (iY, iA, iX) triples cannot be grouped")

    # per-used-A endpoints and pair-column sets
    au, inv = np.unique(pa, return_inverse=True)
    nau = au.shape[0]
    ai = np.zeros(nau, np.int64)
    aj = np.zeros(nau, np.int64)
    ai[inv] = row[py]
    aj[inv] = row[px]
    if (np.unique(inv * np.int64(nrow) + row[py]).shape[0] != nau
            or np.unique(inv * np.int64(nrow) + row[px]).shape[0] != nau):
        raise ValueError("an A block spans multiple recovered rows")
    pmb = np.zeros((nau, ncol), bool)
    pmb[inv, col[py]] = True
    rbool = np.zeros((nrow, ncol), bool)
    rbool[row, col] = True
    # completeness: pairs(a) must equal cols(row_i) & cols(row_j)
    if not np.array_equal(pmb, rbool[ai] & rbool[aj]):
        raise ValueError("pair list is not a full pattern intersection; "
                         "column grouping would change its semantics")

    if groups is None:
        groups = _optimal_groups(pmb, group_size)
        if groups is None:
            groups = _group_columns(rbool, group_size)
            groups = _refine_groups(groups, pmb)
    gsz = max(len(g) for g in groups)
    if gsz != group_size:
        raise ValueError("groups exceed group_size")
    ngroups = len(groups)
    g_of_col = np.zeros(ncol, np.int64)
    cpos_of_col = np.zeros(ncol, np.int64)
    for gi, g in enumerate(groups):
        for p, c in enumerate(g):
            g_of_col[c] = gi
            cpos_of_col[c] = p

    # occupied (row, group) cells -> new ids, ordered (group, row) so the
    # window machinery slides within one group at a time
    occ = np.zeros((nrow, ngroups), bool)
    occ[row, g_of_col[col]] = True
    occ_r, occ_g = np.nonzero(occ)
    o = np.lexsort((occ_r, occ_g))
    occ_r, occ_g = occ_r[o], occ_g[o]
    nnzb2 = occ_r.shape[0]
    cell2 = np.full(nrow * ngroups, -1, np.int64)
    cell2[occ_r * ngroups + occ_g] = np.arange(nnzb2)

    cell_of_blk = cell2[row * ngroups + g_of_col[col]]
    lane_of_blk = cpos_of_col[col]
    src_of = np.full((nnzb2, group_size), -1, np.int64)
    src_of[cell_of_blk, lane_of_blk] = np.arange(nnzb)

    # grouped pair list: for each used A and each group its pairs touch
    pg = g_of_col[col[py]]
    key2 = (inv * np.int64(ngroups) + pg)
    uniq = np.unique(key2)
    a2 = au[uniq // ngroups]
    g2 = uniq % ngroups
    i2 = ai[uniq // ngroups]
    j2 = aj[uniq // ngroups]
    py2 = cell2[i2 * ngroups + g2]
    px2 = cell2[j2 * ngroups + g2]
    if np.any(py2 < 0) or np.any(px2 < 0):
        raise ValueError("internal: grouped pair hits an unoccupied cell")

    return GroupedPairs(
        group_size=group_size, ncol=ncol, ngroups=ngroups, nnzb2=nnzb2,
        ln2=group_size * ln, pair_a2=a2, pair_x2=px2, pair_y2=py2,
        row_of2=occ_r.astype(np.int64), col_of2=occ_g.astype(np.int64),
        src_of=src_of, cell_of_blk=cell_of_blk, lane_of_blk=lane_of_blk,
        groups=[list(map(int, g)) for g in groups])


def grouped_blocks(gp: GroupedPairs, blocks: np.ndarray) -> np.ndarray:
    """[nnzb, LM, LN] block data -> [nnzb2, LM, G*LN] grouped cells
    (absent lanes zero).  Works on numpy or jax arrays."""
    import jax.numpy as jnp

    xp = jnp if not isinstance(blocks, np.ndarray) else np
    lm, ln = blocks.shape[1], blocks.shape[2]
    src = gp.src_of.reshape(-1)
    gathered = xp.where(
        xp.asarray((src >= 0)[:, None, None]),
        blocks[xp.asarray(np.maximum(src, 0))], 0)
    out = gathered.reshape(gp.nnzb2, gp.group_size, lm, ln)
    return out.transpose(0, 2, 1, 3).reshape(gp.nnzb2, lm, gp.ln2)


def ungroup_blocks(gp: GroupedPairs, cells: np.ndarray) -> np.ndarray:
    """[nnzb2, LM, G*LN] grouped cells -> [nnzb, LM, LN] original blocks."""
    lm = cells.shape[1]
    ln = gp.ln2 // gp.group_size
    c4 = cells.reshape(gp.nnzb2, lm, gp.group_size, ln).transpose(0, 2, 1, 3)
    return np.asarray(c4)[gp.cell_of_blk, gp.lane_of_blk]


def plan_time_model(plan: PairPanelPlan, precision: str,
                    hbm_gbps: float = 140.0,
                    step_us: float = 9.0) -> tuple:
    """(est_ms, t_step) for one multiply of a packed plan: max of total
    kernel DMA traffic (A panels + the overlapping X-window replicas + Y
    writes -- wide grouped lanes inflate the WINDOW traffic and can eat
    the A dedup), MXU time, and per-grid-step fixed cost at the plan's
    admissible t_step (resident windows can force t_step down to 1, where
    the fixed cost dominates -- the reason grouped candidates must be
    costed POST-pack)."""
    t = auto_t_step(plan, precision)
    pr = precision_props(precision)
    split = pr["a_presplit"] > 0
    lm, ku, S = plan.lm, plan.ku, plan.s_window
    a_bytes = plan.ntiles * plan.r_tile * ku * 2 * lm * lm \
        * (pr.get("a_bytes", 2) if split else 4)
    # X: each (2S+g)-row replica window is streamed once (pallas
    # revisiting); w_lanes/w_b as in vmem_need_bytes
    w_lanes = 2 * pr["xsplit"] * plan.ln
    w_b = 2 if pr["xsplit"] > 1 else 4
    x_bytes = plan.n_windows * (S + plan.o_blocks + plan.copy_g) * lm \
        * w_lanes * w_b
    y_bytes = plan.ntiles * plan.r_tile * lm * 2 * plan.ln * 4
    passes = pr["passes"]
    mxu_flops = plan.ntiles * plan.r_tile * ku * lm * lm * plan.ln * 8
    dma_ms = (a_bytes + x_bytes + y_bytes) / (hbm_gbps * 1e6)
    mxu_ms = mxu_flops / (173e9 / passes)
    # ntiles already counts r_tile-row tiles; a step batches t of them
    steps = -(-plan.ntiles // t) if t else plan.ntiles
    fixed_ms = steps * step_us * 1e-3
    # replica build: XLA's strided-copy+concat before the kernel (read the
    # panel, write the overlapping replicas) runs SEQUENTIALLY with the
    # kernel at the measured ~250 GB/s copy rate; resident plans skip it
    # (just the g-row pad copy of the panel itself)
    panel_bytes = plan.n_windows * S * lm * w_lanes * w_b
    build_ms = (panel_bytes if plan.resident
                else panel_bytes + x_bytes) / 250e6
    return max(dma_ms, mxu_ms, fixed_ms) + build_ms, t


def pack_grouped_plan(pair_a, pair_x, pair_y, nnzb: int, lm: int, ln: int,
                      want: int, precision: str = "highest",
                      row_of=None, col_of=None, r_tile: int = 1,
                      copy_g: int = 2, vmem_cap: int = 0,
                      force: bool = False, allow_resident: bool = True,
                      max_stride: int = 3):
    """Pack with column grouping: tries group sizes ``want``, want/2, ...
    1, keeps only candidates that pack AND fit VMEM at t_step=1 (wide
    grouped lanes multiply the resident window bytes), and returns the
    one with the best post-pack time model (A stream / MXU / per-step
    fixed cost at the ADMISSIBLE t_step -- a G that models fastest
    pre-pack can be forced to t_step=1 by its own windows).  Returns
    (gp_or_None, plan); gp is None when ungrouped wins.  ``force`` (an
    explicit user-chosen group size) skips the model comparison -- the
    first feasible grouped candidate wins (at the best stride factor).
    ``max_stride``: highest window stride factor to try (callers whose
    kernel build only supports the legacy O == S layout pass 1 so the
    model prices what will actually run); env TFQ_PAIRS_MAX_STRIDE
    overrides.  ``vmem_cap``: 0 reads TFQ_PAIRS_VMEM_CAP (MB, default
    100 -- conservative; v5e carries 128 and the tile-pipelined resident
    kernel runs a few MB above 100).  Raises ValueError only if even the
    ungrouped pack fails."""
    if not vmem_cap:
        vmem_cap = int(_os.environ.get("TFQ_PAIRS_VMEM_CAP", "100")) << 20
    env_stride = _os.environ.get("TFQ_PAIRS_MAX_STRIDE")
    if env_stride:
        max_stride = max(1, int(env_stride))
    # TFQ_PAIRS_RESIDENT: pack-level layout knob shared with the
    # single-device pack_pair_plan path -- 0 vetoes the resident
    # candidate, 1 forces it (windowed fallback only when it cannot pack)
    res_env = _os.environ.get("TFQ_PAIRS_RESIDENT", "auto")
    if res_env == "0":
        allow_resident = False

    def _candidates(packer):
        """(est, plan) over window stride factors (k=0 packs the
        resident-X single-window layout), best first."""
        ks = tuple(range(1, max_stride + 1))
        orders = [(0,) + ks if allow_resident else ks]
        if allow_resident and res_env == "1":
            orders = [(0,), ks]          # forced resident, then fallback
        for order in orders:
            out = []
            for k in order:
                try:
                    plan = packer(k)
                except ValueError:
                    continue
                if plan_fits_vmem(plan, precision, cap=vmem_cap):
                    est, _ = plan_time_model(plan, precision)
                    out.append((est, plan))
            if out:
                break
        out.sort(key=lambda e: e[0])
        return out

    best = None
    g = int(want)
    while g > 1:
        try:
            gp = pack_grouped(pair_a, pair_x, pair_y, nnzb, ln, g,
                              row_of=row_of, col_of=col_of)
        except ValueError:
            break                      # grouping invalid for ANY size
        cands = _candidates(lambda k: pack_pair_plan(
            gp.pair_a2, gp.pair_x2, gp.pair_y2, gp.nnzb2, gp.nnzb2,
            lm, gp.ln2, r_tile=r_tile, copy_g=copy_g,
            row_of=gp.row_of2, col_of=gp.col_of2,
            stride_factor=max(k, 1), resident=(k == 0)))
        if cands:
            if force:
                return gp, cands[0][1]
            if best is None or cands[0][0] < best[0]:
                best = (cands[0][0], gp, cands[0][1])
        g //= 2
    cands = _candidates(lambda k: pack_pair_plan(
        pair_a, pair_x, pair_y, nnzb, nnzb, lm, ln, r_tile=r_tile,
        copy_g=copy_g, row_of=row_of, col_of=col_of,
        stride_factor=max(k, 1), resident=(k == 0)))
    if not cands:
        # no stride candidate fit VMEM: plain legacy pack (raises if
        # even that is impossible)
        plan = pack_pair_plan(pair_a, pair_x, pair_y, nnzb, nnzb, lm, ln,
                              r_tile=r_tile, copy_g=copy_g,
                              row_of=row_of, col_of=col_of)
        cands = [(plan_time_model(plan, precision)[0], plan)]
    if best is not None and best[0] < cands[0][0]:
        return best[1], best[2]
    return None, cands[0][1]


def auto_group_size(pair_a, pair_x, pair_y, nnzb: int, lm: int, ln: int,
                    mm_prec: str = "highest", row_of=None, col_of=None,
                    hbm_gbps: float = 140.0, candidates=(1, 2, 4, 8, 16),
                    vec_passes: float = 0.0, vec_bytes_per_val: int = 4):
    """Pick the column group size minimizing the modeled multiply time
    (max of A-panel streaming and MXU time; r_tile=1 tiles).  Returns
    (best_G, estimates dict).  1 means 'do not group'.

    vec_passes > 0 switches the objective to FULL-ITERATION cost:
    2 multiplies + ``vec_passes`` HBM traversals of the G-inflated
    X-shaped state vectors (grouped cells zero-fill absent lanes, so
    wide groups that win the multiply can LOSE the iteration -- measured
    r3: the golden pattern's multiply-optimal G=8 inflates vector bytes
    2.6x and sinks the iteration to 0.666 of roofline).  The solver
    passes the residency model's 15-pass fusion lower bound
    (profiling.solver_roofline); SpMM-only callers keep 0."""
    pa = np.asarray(pair_a, dtype=np.int64)
    px = np.asarray(pair_x, dtype=np.int64)
    py = np.asarray(pair_y, dtype=np.int64)
    if row_of is None or col_of is None:
        row, col = recover_geometry(pa, px, py, nnzb)
    else:
        _, row = np.unique(np.asarray(row_of, np.int64), return_inverse=True)
        _, col = np.unique(np.asarray(col_of, np.int64), return_inverse=True)
    ncol = int(col.max()) + 1
    au, inv = np.unique(pa, return_inverse=True)
    ai = np.zeros(au.shape[0], np.int64)
    ai[inv] = row[py]
    # MXU rates measured on the v5e relay (memory-bank): exact f32 ~31
    # TFlop/s (HIGHEST = 6 bf16-class passes), one bf16 pass ~173
    try:
        passes = precision_props(mm_prec)["passes"]   # incl. 'ozN'
    except KeyError:
        passes = 6.0
    mxu_tflops = 173.0 / passes
    rbool = np.zeros((int(row.max()) + 1, ncol), bool)
    rbool[row, col] = True
    pmb = np.zeros((au.shape[0], ncol), bool)
    pmb[inv, np.asarray(col)[py]] = True
    ests = {}
    for g in candidates:
        if g > ncol:
            continue
        if g == 1:
            kcnt = np.bincount(py)          # pairs per Y block
            padded = int(np.count_nonzero(kcnt) * kcnt.max())
            lanes = ln
            cells = nnzb
        else:
            try:
                # the same partition chooser the pack uses, so the model
                # prices the groups it will actually get
                groups = _optimal_groups(pmb, g)
                if groups is None:
                    groups = _refine_groups(_group_columns(rbool, g), pmb)
            except Exception:
                continue
            g_of_col = np.zeros(ncol, np.int64)
            for gi, grp in enumerate(groups):
                for c in grp:
                    g_of_col[c] = gi
            key2 = np.unique(
                (inv * np.int64(len(groups)) + g_of_col[col[py]]))
            tgt = ai[key2 // len(groups)] * np.int64(len(groups)) \
                + key2 % len(groups)
            kcnt = np.bincount(np.unique(tgt, return_inverse=True)[1])
            padded = int(kcnt.shape[0] * kcnt.max())
            lanes = g * ln
            # occupied (row, group) cells: the grouped state-vector size
            occ = np.zeros((rbool.shape[0], len(groups)), bool)
            occ[row, g_of_col[col]] = True
            cells = int(occ.sum())
        a_ms = padded * lm * lm * 8 / (hbm_gbps * 1e6)
        mxu_ms = padded * lanes * lm * lm * 8 / (mxu_tflops * 1e9)
        fixed_ms = kcnt.shape[0] * 0.7e-3      # per-tile scalar bookkeeping
        mult_ms = max(a_ms, mxu_ms, fixed_ms)
        # vector ops are fused XLA streams, which sustain the ~250 GB/s
        # copy rate -- NOT the ~140 GB/s Pallas-DMA rate the multiply
        # terms use (r5 calibration: golden G=8 vector work measured
        # 5.9 ms on 95 MB x 15 passes = the 250 rate)
        vec_ms = (vec_passes * cells * 2 * lm * lanes * vec_bytes_per_val
                  / (250.0 * 1e6))
        est_ms = 2 * mult_ms + vec_ms if vec_passes else mult_ms
        ests[g] = dict(a_ms=a_ms, mxu_ms=mxu_ms, fixed_ms=fixed_ms,
                       vec_ms=vec_ms, est_ms=est_ms, cells=cells,
                       tiles=int(kcnt.shape[0]), ku_max=int(kcnt.max()))
    best = min(ests, key=lambda k: ests[k]["est_ms"]) if ests else 1
    return best, ests


# ----------------------------------------------------------------- kernel

@functools.lru_cache(maxsize=32)
def _make_call(ntiles: int, r_tile: int, ku: int, lm: int, ln: int,
               s_window: int, x_rows: int, precision: str, interpret: bool,
               copy_g: int = 1, cmax: int = 0, t_step: int = 1,
               o_blocks: int = 0, resident: bool = False,
               tile_pipe: bool = False, oz_q: int = 0, oz_stack: int = 1,
               oz_xi8: bool = False):
    import sys

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # wide-step kernels (oz at p=9 slices especially) trace deep Python
    # stacks through pallas/mosaic; the interpreter default of 1000
    # frames dies inside jnp promotion chains mid-trace
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))

    # ``ntiles`` is the GRID length (number of steps); each step carries
    # ``t_step`` tiles' A panels, outputs and scratch slots.
    T = max(int(t_step), 1)
    m2 = 2 * r_tile * lm
    k = ku * lm
    g = max(int(copy_g), 1)
    swrows = s_window * lm
    orows = 0 if resident else (o_blocks or s_window) * lm
    # ablation knobs (timing attribution only; results are garbage)
    no_gather = _os.environ.get("TFQ_PP_NO_GATHER") == "1"
    no_dot = _os.environ.get("TFQ_PP_NO_DOT") == "1"
    is_oz = precision.startswith("oz")    # f64-quality Ozaki slice mode
    oz_comp = precision.startswith("ozc")  # TwoSum-compensated diagonals
    if precision not in PRECISIONS and not is_oz:
        raise ValueError(f"precision must be one of {PRECISIONS} or "
                         f"'ozN', got {precision!r}")
    props = precision_props(precision)
    xsplit = props["xsplit"]              # bf16 planes packed in X lanes
    a_presplit = props["a_presplit"] > 0  # A ships as bf16 plane(s)
    split = xsplit > 1                    # X windows are split
    a_dt = jnp.bfloat16 if a_presplit else jnp.float32

    def gather_xs(i, trips_ref, code_ref, win_read, xs2):
        """Stage tile i's union X blocks from the VMEM window into the
        scratch via the run-aware copy program: each code moves ``g``
        consecutive blocks (src_rel << 16 | dst_slot).  The window is an
        OVERLAPPING (2S+g)-block replica (built by XLA around the kernel),
        so every copy resolves unconditionally -- branch-free, which matters
        because the scalar core's per-copy bookkeeping is the kernel's
        critical path.  Copies are dst-ordered: a copy overrunning its run's
        end writes garbage into the NEXT run's slots, which the next copy
        overwrites (same-ref stores execute in program order).  Garbage past
        the last run lands in zero-A pad slots and multiplies to 0.
        (Measured and rejected alternatives: per-block async DMAs -- issue
        overhead dominates; full static unroll -- compile-time explosion.)"""
        def copy_one(j):
            # all-int32 index math: python-int operands promote through a
            # weak int64 under jax_enable_x64 (the oz mode runs with x64
            # on), and Mosaic's s64 convert lowering recurses infinitely
            code = code_ref[i * np.int32(cmax) + j]
            rel = jax.lax.shift_right_logical(code, np.int32(16))
            dst = jax.lax.bitwise_and(code, np.int32(0xFFFF))
            xs2[pl.ds(pl.multiple_of(dst * np.int32(lm), lm),
                      g * lm), :] = \
                win_read(pl.ds(pl.multiple_of(rel * np.int32(lm), lm),
                               g * lm))

        def body(kk, carry):
            copy_one(np.int32(2) * kk)
            copy_one(np.int32(2) * kk + np.int32(1))
            return carry

        # per-tile DYNAMIC trip count (program lengths average well below
        # the padded cmax; pad copies target the zero-A slot at ku); the
        # 2-wide body amortizes the loop overhead.  Explicit int32 bounds
        # and carry: python-int literals become weak int64 under
        # jax_enable_x64 and drag the whole loop to i64, which Mosaic
        # cannot lower
        if not no_gather:
            jax.lax.fori_loop(jnp.int32(0), trips_ref[i], body,
                              jnp.int32(0))

    def dot(a, b):
        return jax.lax.dot(
            a, b, preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST if precision == "highest"
                       else jax.lax.Precision.DEFAULT))

    def finish(y2, y_ref, j):
        """[2M, 2LN] raw product -> fused complex result in y_ref[j]:
        top half P = a_re @ [xr|xi], bottom half Q = a_im @ [xr|xi];
        y = [P1 - Q2 | P2 + Q1].  One full-block store: Mosaic cannot
        lane-slice a >=3-D memref view at sub-128 offsets.

        oz: the raw [2M, p*2LN] per-diagonal sums are stored untouched --
        any in-kernel f32 arithmetic past the exact diagonal accumulation
        would break the f64-quality combine that happens outside.

        ozc (r4): y2 is [2M, 2*2ln] = TwoSum-folded (acc | err) for the
        P (a_re @ x) and Q (a_im @ x) halves.  The complex assembly
        re = P1 - Q2, im = P2 + Q1 runs HERE as two more TwoSum steps
        (valid: sigma is shared across the re/im panel halves and tau
        across the re/im lanes -- every operand is on the same
        power-of-two scale), and the output shrinks to [M, 4ln] =
        [re_acc | im_acc | re_err | im_err]."""
        j = np.int32(j)       # python-int ref indices trace as i64
        #                         under jax_enable_x64; Mosaic wants i32
        if oz_comp:
            m = r_tile * lm
            two = 2 * ln
            pa_, qa_ = y2[:m, :two], y2[m:, :two]
            pe_, qe_ = y2[:m, two:], y2[m:, two:]
            a1, b1 = pa_[:, :ln], -qa_[:, ln:]
            t1 = a1 + b1
            av = t1 - b1
            bv = t1 - av
            e1 = ((a1 - av) + (b1 - bv)) + (pe_[:, :ln] - qe_[:, ln:])
            a2, b2 = pa_[:, ln:], qa_[:, :ln]
            t2 = a2 + b2
            av2 = t2 - b2
            bv2 = t2 - av2
            e2 = ((a2 - av2) + (b2 - bv2)) + (pe_[:, ln:] + qe_[:, :ln])
            y_ref[j] = jnp.concatenate([t1, t2, e1, e2], axis=1)
            return
        if is_oz:
            y_ref[j] = y2
            return
        m = r_tile * lm
        p = y2[:m, :]
        q = y2[m:, :]
        y_ref[j] = jnp.concatenate(
            [p[:, 0:ln] - q[:, ln:], p[:, ln:] + q[:, 0:ln]], axis=1)

    # Software pipeline: step i gathers tile i's operand into one of the two
    # scratch buffers while the MXU contracts tile i-1 from the other -- the
    # VPU copy stream and the MXU run concurrently.  The grid runs one extra
    # step; the output block index trails by one.
    #
    # In the split modes, X windows arrive PRE-SPLIT as packed bf16 lanes
    # [hi(re|im) | lo(re|im)]: block copies move 4 vregs instead of 16 and
    # the kernel does no conversion.
    def dots(a_refs, xs2, j, xj=None):
        # xj: xs2 slot of tile j's staged union (tile-pipelined kernels use
        # per-tile buffers where the union always sits at slot 0; the A-ref
        # index stays j)
        xo = (j if xj is None else xj) * ku * lm
        j = np.int32(j)       # i32 ref index (see finish)
        if is_oz:
            # f64-quality (ops/ozaki.py): a_refs[0] holds the p pure bf16
            # slice planes of A CONCATENATED along rows ([p*m2, k] per
            # tile; per-row power-of-two scale factored out), xs2 lanes
            # pack the p X slice planes [x0 | x1 | ... | x_{p-1}].  One
            # input ref instead of p: each grid step issues ONE large
            # A-panel DMA -- p separate refs measured ~106 GB/s on the
            # A-bytes-bound golden 'z' run (7 small DMAs/step), the
            # concatenated layout restores the streaming rate (r4).
            # Triangular dots: slice s only meets X slices t <= p-1-s
            # (products below the 2^{-p q} truncation are skipped), so
            # dot s runs at (p-s)*2ln static lane width.  Each diagonal
            # d = s+t accumulates its <= d+1 cross terms in f32 EXACTLY
            # (slice_params(diag_sum=True) sized q for it); diagonals are
            # emitted side by side and combined in f64 outside.
            xs = xs2[xo: xo + k, :]
            p_ = xsplit
            two = 2 * ln
            a_cat = a_refs[0][j]                      # [p*m2, k]
            if oz_xi8:
                # 'xi8' (r5): BOTH operand sides ship RAW int8 slice
                # integers and the MXU runs s8 x s8 -> s32 (2x the bf16
                # rate on v5e).  Every product and every DIAGONAL sum is
                # an EXACT int32 (p * k * 66^2 <= 2^31, oz_mode_params),
                # so the per-product TwoSum chain and the in-kernel int8
                # -> bf16 A reconstruction of the mixed mode disappear
                # entirely.  Each diagonal converts to f32 through an
                # exact hi/lo integer split (multiples of 2^12 carry
                # <= 19 significant bits; the remainder < 2^12) and the
                # two parts TwoSum-fold across diagonals -- 2p folds
                # instead of p(p+1)/2.
                tri = two % 128 == 0     # lane-aligned triangular slices
                ds = []
                for s in range(p_):
                    blk = a_cat[s * m2: (s + 1) * m2, :]
                    wid = (p_ - s) * two if tri else p_ * two
                    d = jax.lax.dot_general(
                        blk, xs[:, :wid], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    ds.append(d)
                acc = err = None
                for d in range(p_):
                    tot = ds[0][:, d * two: (d + 1) * two]
                    for s in range(1, d + 1):
                        tot = tot + ds[s][:, (d - s) * two:
                                          (d - s + 1) * two]
                    sc = np.float32(2.0 ** (-(d + 2) * oz_q))
                    lo_i = jax.lax.rem(tot, jnp.int32(4096))
                    hi_i = tot - lo_i
                    for v in (hi_i.astype(jnp.float32) * sc,
                              lo_i.astype(jnp.float32) * sc):
                        if acc is None:
                            acc, err = v, jnp.zeros_like(v)
                        else:
                            t_ = acc + v
                            a_v = t_ - v
                            b_v = t_ - a_v
                            err = err + ((acc - a_v) + (v - b_v))
                            acc = t_
                return jnp.concatenate([acc, err], axis=1)
            # STACKED dots (ablation knob TFQ_OZ_STACK): run ``oz_stack``
            # consecutive slice planes as ONE taller MXU pass
            # ([stack*m2, k] @ [k, (p-s)*two]; slice s+1's last lane block
            # is computed and ignored -- finite garbage, never read by the
            # fold).  MEASURED on the golden plan (r4): stack 1/2/4/7 =
            # 0.96/0.94/0.89/0.81 TFlop/s -- the narrow m2-row triangular
            # dots do NOT underutilize the MXU, so extra MACs are pure
            # cost and the default stays 1.
            ds = []
            s = 0
            while s < p_:
                hi = min(s + oz_stack, p_)
                blk = a_cat[s * m2: hi * m2, :]
                if blk.dtype == jnp.int8:
                    # int8 planes store RAW slice integers (|int| <= 64):
                    # exact convert + exact power-of-two descale restores
                    # the bf16 slice value at HALF the streamed A bytes
                    parts = [
                        (blk[(t - s) * m2: (t - s + 1) * m2]
                         .astype(jnp.float32)
                         * np.float32(2.0 ** (-(t + 1) * oz_q))
                         ).astype(jnp.bfloat16)
                        for t in range(s, hi)]
                    blk = (jnp.concatenate(parts, axis=0)
                           if len(parts) > 1 else parts[0])
                d = dot(blk, xs[:, : (p_ - s) * two])
                for t in range(s, hi):
                    ds.append(d[(t - s) * m2: (t - s + 1) * m2])
                s = hi
            if oz_comp:
                # 'ozc': q = 8 slices -- products no longer sum exactly
                # in f32 (only each k-deep PRODUCT is exact, via the dual
                # spare binade), so the accumulation runs as ONE global
                # Knuth TwoSum chain over all p(p+1)/2 products in
                # diagonal (descending-magnitude) order: acc stays the
                # correctly-rounded f32 sum, every rounding error is
                # captured EXACTLY and accumulated into one error plane
                # (error terms are ~2^-24 of the result, so the plain f32
                # err accumulation rounds at ~2^-48 of the result -- well
                # below the 2^{-pq} truncation floor).  Folding ALL
                # diagonals in-kernel (r4) cuts the output from (p+1) to
                # 2 planes; validity needs the row-shared sigma and
                # lane-shared tau the builder provides (power-of-two
                # scales identical across everything summed here).  Do
                # NOT let the compiler reassociate: Mosaic/XLA keep
                # strict FP order.
                # Hybrid fold: TwoSum only while a product can still move
                # acc's rounding (diagonals d <= 4; |term| >= ~2^{-5q} of
                # the scale); deeper diagonals accumulate PLAINLY into a
                # tail register whose own rounding (<= #adds * 2^-24 of
                # |tail| <= 2^{-5q}) sits below the err-plane noise.
                # finish() folds tail into err.  Halves the VPU work of
                # the all-TwoSum chain and carries ~2.4x fewer err terms.
                ts_d = 4
                acc = ds[0][:, 0:two]
                err = jnp.zeros_like(acc)
                tail = jnp.zeros_like(acc)
                for d in range(1, p_):
                    for s in range(d + 1):
                        b = ds[s][:, (d - s) * two: (d - s + 1) * two]
                        if d <= ts_d:
                            tot = acc + b
                            a_v = tot - b
                            b_v = tot - a_v
                            err = err + ((acc - a_v) + (b - b_v))
                            acc = tot
                        else:
                            tail = tail + b
                return jnp.concatenate([acc, err + tail], axis=1)
            cols = []
            for d in range(p_):
                acc = ds[0][:, d * two: (d + 1) * two]
                for s in range(1, d + 1):
                    acc = acc + ds[s][:, (d - s) * two: (d - s + 1) * two]
                cols.append(acc)
            return jnp.concatenate(cols, axis=1)     # [2M, p*2ln]
        if precision == "bf16x6":
            # exact-f32 quality: X lanes pack 3-way RN splits [xh|xm|xl];
            # the f32 A panel is split 3-way IN-KERNEL (VPU work that hides
            # under the MXU pipeline; streaming pre-split planes would cost
            # 1.5x the DMA bytes on an A-bandwidth-bound kernel).  The six
            # cross products through O(2^-16) relative run as 2 full-lane +
            # 2 half-lane dots; dropped terms (m@l, l@m, l@l) are O(2^-25).
            xs = xs2[xo: xo + k, :]
            ah, am, al = split_bf16x3(a_refs[0][j])
            d1 = dot(ah, xs[:, : 4 * ln])          # [ah@xh | ah@xm]
            d2 = dot(am, xs[:, : 4 * ln])          # [am@xh | am@xm]
            d3 = dot(ah, xs[:, 4 * ln:])           # ah@xl
            d4 = dot(al, xs[:, : 2 * ln])          # al@xh
            return (d1[:, : 2 * ln] + d1[:, 2 * ln:]
                    + d2[:, : 2 * ln] + d2[:, 2 * ln:] + d3 + d4)
        if split:
            xs = xs2[xo: xo + k, :]
            ah = a_refs[0][j]
            if precision == "bf16":
                return dot(ah, xs[:, : 2 * ln])
            # The scratch packs [hi | lo] X lanes side by side, so one
            # FULL-lane-width dot computes a@xh and a@xl together; folding
            # the halves in f32 is numerically identical to separate dots
            # (each product accumulates in f32 before the add).  For
            # 2*ln <= 64 this halves the MXU pass count vs half-width dots.
            d1 = dot(ah, xs)
            y = d1[:, : 2 * ln] + d1[:, 2 * ln:]
            if precision == "bf16x3":              # + lo@hi only
                return y + dot(a_refs[1][j], xs[:, : 2 * ln])
            d2 = dot(a_refs[1][j], xs)             # bf16x4: + lo@(hi+lo)
            return y + d2[:, : 2 * ln] + d2[:, 2 * ln:]
        return dot(a_refs[0][j], xs2[xo: xo + k, :])

    n_a = props["a_presplit"] or 1
    # oz/ozc: the p slice planes ship CONCATENATED along rows as ONE input
    # (one big DMA per grid step; see the comment in dots) -- the kernel
    # row-slices them back out for free in VMEM
    a_rows = xsplit * m2 if is_oz else m2
    if is_oz:
        n_a = 1
    if tile_pipe and not resident:
        raise ValueError("tile_pipe requires a resident-window plan")

    def kernel_tile_pipe(wsel_ref, trips_ref, code_ref, *refs):
        """TILE-granularity pipeline (resident window only): two per-tile
        union buffers instead of two whole-step buffers.  The step-level
        scratch scales with t_step * ku; at wide grouped lanes it dominates
        VMEM and collapses the admissible t_step.  Here the scratch is
        t-independent: the MXU work of tile j is issued, then the scalar
        gather of tile j+1 runs into the other buffer while the MXU chews
        (Mosaic's per-ref dependency tracking overlaps them); the identity
        block maps drop the trailing-step recompute entirely.  Copy
        programs are PER TILE (dst slots within [0, ku]); tiles 0 and 1
        carry the full-coverage prologue for their respective buffers."""
        del wsel_ref
        a_refs = refs[:n_a]
        xw_hbm, y_ref, xs_a, xs_b, xw_v, w_sem = refs[n_a:]

        def win_read(rows):
            return xw_v[np.int32(0), rows, :]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            # FULL-ref copy (scratch is [1, rows, lanes] like the HBM
            # input): slicing the HBM ref with .at[0] lowers to
            # tpu.memref_slice, which requires the lane dim to be
            # 128-aligned -- narrow fused panels (2*ln < 128, e.g. the
            # FD geometry LN=8) would fail to compile
            cp = pltpu.make_async_copy(xw_hbm, xw_v, w_sem)
            cp.start()
            cp.wait()

        bufs = (xs_a, xs_b)

        def run(base):
            """Buffer index = GLOBAL tile parity (base + j) % 2, so the
            alternation is seamless across grid steps even at odd T --
            otherwise step i+1's head gather would write the buffer step
            i's last dot reads and serialize behind it.  (The coverage
            prologue in the per-tile programs covers tiles 0 and 1, which
            under global parity are buffers 0 and 1.)"""
            gather_xs(i * np.int32(T), trips_ref, code_ref, win_read,
                      bufs[base])
            for j in range(T):
                if not no_dot:
                    y2 = dots(a_refs, bufs[(base + j) % 2], j, xj=0)
                if j + 1 < T:
                    gather_xs(i * np.int32(T) + np.int32(j + 1), trips_ref,
                              code_ref, win_read, bufs[(base + j + 1) % 2])
                if not no_dot:
                    finish(y2, y_ref, j)

        if T % 2 == 0:
            run(0)                    # i*T is even for every step
        else:
            parity = jax.lax.rem(i * np.int32(T), np.int32(2))

            @pl.when(parity == 0)
            def _():
                run(0)

            @pl.when(parity == 1)
            def _():
                run(1)

    def kernel(wsel_ref, trips_ref, code_ref, *refs):
        a_refs = refs[:n_a]
        if resident:
            # RESIDENT mode: the padded X panel stays in HBM (ANY memory
            # space) and is DMAed ONCE into a single VMEM scratch at step 0
            # -- the pipelined-window path below would allocate TWO window
            # buffers even under a constant index map, doubling the VMEM
            # footprint and collapsing the admissible t_step for big panels.
            xw_hbm, y_ref, xs_a, xs_b, xw_v, w_sem = refs[n_a:]

            def win_read(rows):
                return xw_v[np.int32(0), rows, :]
        else:
            xw, y_ref, xs_a, xs_b = refs[n_a:]

            def win_read(rows):
                return xw[0, rows, :]
        del wsel_ref
        i = pl.program_id(0)
        if resident:
            @pl.when(i == 0)
            def _():
                # full-ref copy; see kernel_tile_pipe for why .at[0]
                # (tpu.memref_slice) cannot be used on narrow lane panels
                cp = pltpu.make_async_copy(xw_hbm, xw_v, w_sem)
                cp.start()
                cp.wait()
        # Two SEPARATE scratch refs (not halves of one): Mosaic tracks
        # read/write dependencies per ref, so gather(i) and the MXU work on
        # step i-1 only overlap when they touch different refs.  Each branch
        # ISSUES all T steps' dots first, runs the scalar gather loop while
        # the MXU pipeline drains, and only then stores the results -- the
        # stores are the first ops that wait on the MXU, so the gather hides
        # behind them.  Step 0 contracts an uninitialized buffer into output
        # block 0; step 1 recomputes block 0 from real data and the
        # revisiting output block is flushed after the last write.
        parity = jax.lax.rem(i, np.int32(2))

        def run(xs_mine, xs_other):
            if not no_dot:
                ys = [dots(a_refs, xs_other, j) for j in range(T)]
            gather_xs(i, trips_ref, code_ref, win_read, xs_mine)
            if not no_dot:
                for j in range(T):
                    finish(ys[j], y_ref, j)

        @pl.when(parity == 0)
        def _():
            run(xs_a, xs_b)

        @pl.when(parity == 1)
        def _():
            run(xs_b, xs_a)

        # NOTE: pad rows of xs (between the tile's true union and ku) hold
        # stale data from earlier tiles; their A panel columns are zero, so
        # they contribute exactly 0 to the dot

    # index maps return EXPLICIT int32: bare python 0 literals become i64
    # constants under jax_enable_x64 (the oz mode) and Mosaic refuses
    # mixed (i32, i64, i64) index tuples
    z32 = np.int32(0)
    if tile_pipe:
        def a_map(i, ws, tr, xl):
            return (i, z32, z32)
    else:
        def a_map(i, ws, tr, xl):
            return (jnp.maximum(i - np.int32(1), z32), z32, z32)

    a_specs = [pl.BlockSpec((T, a_rows, k), a_map,
                            memory_space=pltpu.VMEM)] * n_a
    w_lanes = 2 * xsplit * ln
    w_dt = jnp.int8 if oz_xi8 else (jnp.bfloat16 if split
                                    else jnp.float32)
    # resident mode: the panel input stays in HBM (ANY memory space); the
    # kernel DMAs it once into a SINGLE VMEM scratch at step 0 (the
    # pipeline would allocate two window buffers even for a constant index
    # map, doubling the footprint)
    if resident:
        win_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    else:
        win_specs = [
            pl.BlockSpec((1, swrows + orows + g * lm, w_lanes),
                         lambda i, ws, tr, xl: (ws[i], z32, z32),
                         memory_space=pltpu.VMEM),
        ]
    m = r_tile * lm
    # oz outputs the raw per-diagonal sums [2M, p*2ln]; ozc the folded,
    # complex-assembled [M, 4ln] (acc | err); others the assembled fused
    # complex result [M, 2ln]
    out_rows, out_lanes = ((m, 4 * ln) if oz_comp
                           else (m2, xsplit * 2 * ln) if is_oz
                           else (m, 2 * ln))
    scr_ku = (ku + g) if tile_pipe else (T * ku + g)
    scratch = [pltpu.VMEM((scr_ku * lm, w_lanes), w_dt),
               pltpu.VMEM((scr_ku * lm, w_lanes), w_dt)]
    if resident:
        # 3-D like the HBM input so the step-0 DMA copies the FULL ref
        # (no memref_slice -> no 128-lane alignment requirement)
        scratch += [pltpu.VMEM((1, swrows + g * lm, w_lanes), w_dt),
                    pltpu.SemaphoreType.DMA]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,                    # wsel, trips, codes
        grid=(ntiles,) if tile_pipe else (ntiles + 1,),
        in_specs=a_specs + win_specs,
        out_specs=pl.BlockSpec((T, out_rows, out_lanes), a_map,
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )

    a_eb0 = props.get("a_bytes", 2) if a_presplit else 4
    a_bytes = ntiles * T * a_rows * k * a_eb0 * n_a
    # VMEM working set: double-buffered A panels + window + 2 scratch
    # buffers + output; the default scoped limit is 16 MB but v5e carries
    # 128 MB -- raise the limit to what this call actually needs so large
    # t_step (the per-grid-step fixed cost amortizer) is admissible
    a_eb = a_eb0
    w_eb = 1 if oz_xi8 else (2 if split else 4)
    w_lanes_n = 2 * xsplit * ln
    win_bufs = 1 if resident else 2              # resident: single scratch
    # PHYSICAL lane widths: VMEM tiles at 128 lanes, so narrow buffers
    # (2*ln < 128) occupy the full tile -- the scoped limit must budget
    # the padded footprint or Mosaic stack-OOMs at compile time
    w_lanes_p = _lanes_pad(w_lanes_n)
    vmem_need = (2 * n_a * T * a_rows * _lanes_pad(k) * a_eb    # A in x2
                 + win_bufs * (swrows + orows + g * lm) * w_lanes_p * w_eb
                 + 2 * scr_ku * lm * w_lanes_p * w_eb            # scratch x2
                 + 2 * T * out_rows * _lanes_pad(out_lanes) * 4)  # out x2
    vmem_limit = min(int(vmem_need * 1.25) + (8 << 20), 120 << 20)
    # oz runs p triangular dots of shrinking static width: sum_s (p-s)
    # lane groups = p(p+1)/2 product-equivalents
    flop_mult = (3 if precision == "bf16x3"
                 else (xsplit * (xsplit + 1)) // 2 if is_oz else 1)
    call = pl.pallas_call(
        kernel_tile_pipe if tile_pipe else kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles * T, out_rows, out_lanes),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * ntiles * T * m2 * k * 2 * ln * flop_mult,
            bytes_accessed=int(a_bytes + 4 * 2 * x_rows * ln),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )
    del a_dt
    return call


class PairPanelMultiply:
    """Compiled multiply on fused permuted panels.

    ``consts`` holds the device-resident operand tables (wsel, xloc, A
    panels).  IMPORTANT: jit-compiled callers must take ``consts`` as an
    ARGUMENT (``jax.jit(lambda c, x: pm.apply(c, x))(pm.consts, x)``), not
    close over it -- a closed-over device array is serialized into the HLO
    as a literal, which for ~1 GB panels breaks the compiler (and any
    remote-compile transport).
    """

    def __init__(self, call, consts, n_rows_out, two_ln, n_windows, swrows,
                 split, g_rows, orows=0, resident=False):
        self._call = call
        self.consts = consts
        self._n_rows_out = n_rows_out
        self._two_ln = two_ln
        self._n_windows = n_windows
        self._swrows = swrows
        self._split = split
        self._g_rows = g_rows
        self._orows = orows or swrows
        self._resident = resident

    def apply(self, consts, x_fused):
        wsel, trips, codes, *a_args = consts
        xrep = _window_replicas(x_fused, self._n_windows, self._swrows,
                                self._two_ln, self._split, self._g_rows,
                                orows=self._orows, resident=self._resident)
        y = self._call(wsel, trips, codes, *a_args, xrep)
        # t_step padding adds whole zero tiles at the end; drop them
        return y.reshape(-1, self._two_ln)[: self._n_rows_out]

    def __call__(self, x_fused):
        return self.apply(self.consts, x_fused)


def _window_replicas(x_fused, n_windows, swrows, two_ln, split, g_rows,
                     orows=0, resident=False):
    """Overlapping (S + O + g)-row window replicas: window w covers its own
    S-row segment plus the first O (+g overrun) rows of the next --
    legacy plans have O == S (the 2S design); stride-factor plans carry a
    larger segment and a span-sized cover, cutting the replica traffic
    from 2x toward 1x of the X panel.  XLA emits this as strided copies +
    concat, which buys a branch-free window gather inside the kernel.  In
    split mode X is pre-split into packed bf16 [hi | lo] lanes first: the
    kernel's block copies then move a quarter of the vregs and the MXU
    consumes the operands without conversion (see split_bf16x2)."""
    import jax.numpy as jnp

    xsplit = int(split) if not isinstance(split, bool) else (2 if split
                                                             else 1)
    if xsplit == 3:
        xw = jnp.concatenate(split_bf16x3(x_fused), axis=1)
    elif xsplit == 2:
        hi, lo = split_bf16x2(x_fused)
        xw = jnp.concatenate([hi, lo], axis=1)
    else:
        xw = x_fused
    lanes = xsplit * two_ln
    if resident:
        # single full-panel window: only the g-row overrun pad, no replicas
        return jnp.pad(xw, ((0, g_rows), (0, 0))).reshape(
            1, swrows + g_rows, lanes)
    orows = orows or swrows
    xpad = jnp.pad(xw, ((0, swrows), (0, 0)))       # one extra zero window
    segp = xpad.reshape(n_windows + 1, swrows, lanes)
    if orows + g_rows <= swrows:
        return jnp.concatenate(
            [segp[:-1], segp[1:, : orows + g_rows]], axis=1)
    return jnp.concatenate(
        [segp[:-2], segp[1:-1], segp[2:, :g_rows]], axis=1)


def make_pairpanel_multiply(plan: PairPanelPlan, a_panels,
                            precision: str = "bf16x3",
                            interpret: bool = False,
                            t_step: int = 1) -> PairPanelMultiply:
    """Build the multiply on flat permuted FUSED panels
    [x_rows_padded, 2*LN] (re in lanes [:ln], im in [ln:]) ->
    y_fused [ntiles*r_tile*LM, 2*LN] (new block order).

    a_panels: f32 device array from build_a_panels / build_a_panels_device.
    precision: 'bf16' (1 MXU pass, ~4e-3 relative), 'bf16x3' (3 passes,
    fp32-quality ~1e-7 -- the default), 'highest' (6 passes, exact fp32).
    t_step: tiles fetched + contracted per grid step (amortizes per-step
    DMA/bookkeeping overhead; all tiles of a step share one X window).
    """
    import jax.numpy as jnp

    r, lm, ln = plan.r_tile, plan.lm, plan.ln
    T = max(int(t_step), 1)
    tile_pipe = use_tile_pipe(plan, precision)
    if not tile_pipe and T > 1:
        # Self-heal a t_step sized for a DIFFERENT precision's kernel
        # shape: callers pick t once (e.g. at the fast bf16 mode) and
        # rebuild at 'highest' after a gate fallback -- if that flips the
        # tile-pipe verdict, the step kernel's t-scaled scratch at the
        # original T can blow the VMEM budget or the step-window
        # constraint.  Clamp to what THIS precision's step kernel admits.
        T = min(T, auto_t_step(plan, precision, tile_pipe=False))
    if tile_pipe:
        # per-TILE copy programs (dst within [0, ku]); resident plans have
        # wsel == 0 so the code sources are already window-absolute.  Pad
        # the tables and A panels to whole steps: pad tiles keep trips == 0
        # (no copies) and zero A panels, contributing exactly 0.
        nsteps = (plan.ntiles + T - 1) // T
        ntp = nsteps * T
        codes_h, trips_h = _program_tables(plan, np.arange(plan.ntiles),
                                           plan.ku)
        cmax = plan.cmax
        codes2 = np.full((ntp, cmax), plan.ku, np.int32)
        codes2[: plan.ntiles] = codes_h.reshape(-1, cmax)[: plan.ntiles]
        trips2 = np.zeros(ntp, np.int32)
        trips2[: plan.ntiles] = trips_h[: plan.ntiles]
        codes_h, trips_h = codes2.reshape(-1), trips2
        wsel_h = np.zeros(nsteps, np.int32)
        a_panels = jnp.pad(a_panels,
                           ((0, ntp - plan.ntiles), (0, 0), (0, 0)))
    elif T > 1:
        nsteps, wsel_h, codes_h, trips_h, cmax = make_step_tables(plan, T)
        a_panels = jnp.pad(
            a_panels, ((0, nsteps * T - plan.ntiles), (0, 0), (0, 0)))
    else:
        nsteps, cmax = plan.ntiles, plan.cmax
        wsel_h = np.concatenate([plan.wsel, plan.wsel[-1:]])
        codes_h, trips_h = _program_tables(plan, np.arange(plan.ntiles),
                                           plan.ku)
    call = _make_call(nsteps, r, plan.ku, lm, ln, plan.s_window,
                      plan.x_rows_padded, precision, interpret,
                      copy_g=plan.copy_g, cmax=cmax, t_step=T,
                      o_blocks=plan.o_blocks, resident=plan.resident,
                      tile_pipe=tile_pipe)
    # one extra (dummy) step for the software pipeline; 1-D code table
    # because 2-D SMEM operands pad every row to 128 lanes, overflowing
    # ~1 MB SMEM
    wsel = jnp.asarray(wsel_h)
    trips = jnp.asarray(trips_h)
    codes = jnp.asarray(codes_h)
    props = precision_props(precision)
    if props["a_presplit"]:
        a_args = split_bf16x2(a_panels)
    else:
        a_args = (a_panels,)
    return PairPanelMultiply(call, (wsel, trips, codes) + tuple(a_args),
                             plan.ntiles * r * lm, 2 * ln,
                             plan.n_windows, plan.s_window * lm,
                             props["xsplit"],
                             plan.copy_g * lm,
                             orows=plan.o_blocks * lm,
                             resident=plan.resident)


class OzPairPanelMultiply:
    """f64-quality multiply on fused permuted panels (the 'z' mode of the
    pair-panel engine, via the Ozaki scheme -- see ops/ozaki.py and the
    'oz' branches in _make_call).

    apply(consts, x_fused_f64 [x_rows_padded, 2*LN]) -> fused f64
    [ntiles*r_tile*LM, 2*LN].  ``consts`` = (wsel, trips, codes,
    *p bf16 A slice planes, sigma): pass as a jit ARGUMENT, never close
    over (see PairPanelMultiply).
    """

    def __init__(self, call, consts, plan: PairPanelPlan, p: int, q: int,
                 comp: bool = False, xi8: bool = False):
        self._call = call
        self.consts = consts
        self.p, self.q = p, q
        self.comp = comp                 # 'ozc': TwoSum err plane + dual
        #                                  spare-binade sigma/tau
        self.xi8 = xi8                   # int8 X slices (s8xs8->s32 MXU)
        self.resident = plan.resident    # single-window X panel (xi8)
        self._m = plan.r_tile * plan.lm
        self._ln = plan.ln
        self._n_rows_out = plan.ntiles * self._m
        self._n_windows = plan.n_windows
        self._swrows = plan.s_window * plan.lm
        self._g_rows = plan.copy_g * plan.lm
        self._orows = plan.o_blocks * plan.lm or self._swrows

    def apply(self, consts, x_fused):
        import jax

        import jax.numpy as jnp

        from . import ozaki

        wsel, trips, codes, *rest = consts
        planes, sigma = rest[:-1], rest[-1]
        p, ln, m = self.p, self._ln, self._m
        x_fused = x_fused.astype(jnp.float64)
        if self.comp:
            # r4b: the whole descale runs on the f32 side.  Split FIRST
            # (hi0 = f32(x) -- exact conversion; lo0 = f32(x - hi0) --
            # the ONE remaining emulated-f64 elementwise pass), then take
            # amax from |hi0| and scale by the exact f32 power of two.
            # pow2_scale's envelope already covers an f32-derived amax
            # (it f32-casts internally and proves sigma >= amax for every
            # f32 rounding case, ozaki.py:106-118); power-of-two f32
            # multiplies are exact, so rh/rl is the same exact pair the
            # old f64 divide produced -- element floor 2^-49, lane floor
            # 2^{-pq}, slice ints <= 2^{q-1}(1 + 2^-24) + 2, inside the
            # +2 slack of the product-exactness bound.  Measured r4: the
            # f64 amax + divide cost ~1.2 ms/multiply of the 1.5 ms
            # descale stage.  Extreme scales (|tau| outside 2^+-100, or
            # 1/tau not an f32 normal) take the legacy f64 path via
            # lax.cond, like the epilogue.
            hi0 = x_fused.astype(jnp.float32)
            lo0 = (x_fused - hi0.astype(jnp.float64)).astype(jnp.float32)
            amax32 = jnp.max(jnp.abs(hi0), axis=0, keepdims=True)
            # per-lane power-of-two scale, shared across the re/im lane
            # pair (the kernel's complex assembly subtracts same-scale
            # quantities) and doubled (spare binade caps slice ints at
            # 2^{q-1})
            half = jnp.maximum(amax32[:, :ln], amax32[:, ln:])
            tau32 = ozaki.pow2_scale(jnp.concatenate(
                [half, half], axis=1).astype(jnp.float64)) * 2.0
            itau32 = (1.0 / tau32).astype(jnp.float32)
            # the f32-side amax is BLIND to lanes the f32 cast flushed
            # (|x| < ~2^-150: half == 0 but the lane is NOT zero -- its
            # slices would silently vanish) and garbage for lanes above
            # f32 max (half == inf poisons pow2_scale).  Both route to
            # the legacy branch, which derives tau from the exact f64
            # amax; genuinely all-zero lanes (grouped/superblock dead
            # lanes) keep the fast path (pow2_scale maps 0 -> 1).  The
            # != 0 probe is a comparison pass, not f64 arithmetic.
            lane_nz = jnp.any(x_fused != 0.0, axis=0, keepdims=True)
            nzh = lane_nz[:, :ln] | lane_nz[:, ln:]
            ok = jnp.all(jnp.isfinite(half) & ((half > 0) | ~nzh)) \
                & jnp.all(jnp.isfinite(itau32)
                          & (itau32 >= np.float32(2.0 ** -100))
                          & (itau32 <= np.float32(2.0 ** 100)))

            def _fast_pro(ops):
                x_, h_, l_ = ops
                return h_ * itau32, l_ * itau32, tau32

            def _slow_pro(ops):
                x_, h_, l_ = ops
                amax64 = jnp.max(jnp.abs(x_), axis=0, keepdims=True)
                h64 = jnp.maximum(amax64[:, :ln], amax64[:, ln:])
                tau64 = ozaki.pow2_scale(jnp.concatenate(
                    [h64, h64], axis=1)) * 2.0
                r_ = x_ / tau64                # exact p2 descale (f64)
                h2 = r_.astype(jnp.float32)
                l2 = (r_ - h2.astype(jnp.float64)).astype(jnp.float32)
                return h2, l2, tau64

            hi, lo, tau = jax.lax.cond(ok, _fast_pro, _slow_pro,
                                       (x_fused, hi0, lo0))
            xs = _oz_slices_f32pair(hi, lo, p, self.q,
                                    out_int8=self.xi8)
        else:
            amax = jnp.max(jnp.abs(x_fused), axis=0, keepdims=True)
            tau = ozaki.pow2_scale(amax)
            xs = _oz_slices(x_fused / tau, p, self.q)
        xw = jnp.concatenate(xs, axis=1)          # [rows, p*2ln] bf16/int8
        xrep = _window_replicas(xw, self._n_windows, self._swrows,
                                p * 2 * ln, 1, self._g_rows,
                                orows=self._orows, resident=self.resident)
        y_raw = self._call(wsel, trips, codes, *planes, xrep)
        if self.comp:
            # folded output [nt, M, 4ln] = [re_acc | im_acc | re_err |
            # im_err]: acc is the correctly-rounded f32 total, err its
            # exact TwoSum rounding errors -- f64(acc) + f64(err)
            # restores the total to ~2^-48 relative.  sigma/tau are
            # powers of two, so the descale multiplies are EXACT in f32
            # whenever the combined scale stays inside the f32 exponent
            # range -- the common case, checked at runtime; the f64
            # multiply (XLA-emulated, measured ~4 ms/multiply on the
            # golden run) only runs on extreme-scale data (lax.cond).
            acc = y_raw[:, :, : 2 * ln]
            err = y_raw[:, :, 2 * ln:]
            st32 = sigma.astype(jnp.float32) * tau.astype(
                jnp.float32)[None, :, :]
            ok = jnp.all(jnp.isfinite(st32)
                         & (st32 >= np.float32(2.0 ** -90))
                         & (st32 <= np.float32(2.0 ** 90)))

            def _fast(ops):
                a_, e_ = ops
                return ((a_ * st32).astype(jnp.float64)
                        + (e_ * st32).astype(jnp.float64))

            def _slow(ops):
                a_, e_ = ops
                return ((a_.astype(jnp.float64) + e_.astype(jnp.float64))
                        * sigma * tau[None, :, :])

            fused = jax.lax.cond(ok, _fast, _slow, (acc, err))
            return fused.reshape(-1, 2 * ln)[: self._n_rows_out]
        # f64 combine: diagonal sums are exact f32 -> conversion is exact;
        # sigma/tau are powers of two -> descale is exact; the complex
        # assembly is the first (and only) rounding after slice truncation.
        y = sum(y_raw[:, :, 2 * ln * d: 2 * ln * (d + 1)]
                .astype(jnp.float64) for d in range(p))
        y = y * sigma * tau[None, :, :]
        pt, qt = y[:, :m, :], y[:, m:, :]
        fused = jnp.concatenate([pt[..., :ln] - qt[..., ln:],
                                 pt[..., ln:] + qt[..., :ln]], axis=-1)
        return fused.reshape(-1, 2 * ln)[: self._n_rows_out]

    def __call__(self, x_fused):
        return self.apply(self.consts, x_fused)


def _oz_slices(pure, p: int, q: int):
    """p pure bf16 slices of an f64 array already descaled to |.| <= 1:
    pure == sum_s f64(slices[s]) + O(2^{-p q}).

    The residual subtracts the STORED (bf16-round-tripped) slice, not the
    f64 round result: on TPU relays f64 is an f32-pair emulation whose
    narrowing conversions may disagree with the emulated round by one ulp
    of the slice grid (hi = n+1, lo = -1 converts to n+1, value is n) --
    subtracting the stored value makes the next slice absorb any such
    off-by-one exactly (slice-int bounds grow to 2^{q-1} + 1, still exact
    everywhere).  Measured: without this, a full-slice-step error
    (~2^{-q}) appears on device but not in interpret mode."""
    import jax.numpy as jnp

    r = pure
    out = []
    for s in range(p):
        step = jnp.float64(2.0 ** ((s + 1) * q))
        sl = (jnp.round(r * step) / step).astype(jnp.bfloat16)
        r = r - sl.astype(jnp.float64)
        out.append(sl)
    return out


def _oz_slices_f32pair(hi, lo, p: int, q: int, out_int8: bool = False):
    """p merged bf16 slices of the exact f32 pair (hi, lo), |hi+lo| <= 0.5,
    on the shared exponent grid: hi + lo == sum_s f64(slices[s]) +
    O(2^{-p q}).  All arithmetic is NATIVE f32 -- this replaces the
    emulated-f64 slicing of ``_oz_slices`` on the hot X path ('ozc').

    Exactness: each stream is sliced separately (round/mul/sub by powers
    of two on grid-aligned residuals -- every step exact in f32, same
    argument as _oz_slices); the per-grid MERGE sh + sl is an exact f32
    integer add (ints <= 2^q + 2); the downward CARRY sweep moves whole
    grid-(s-1) multiples up (sum-preserving, exactly as
    _oz_slices_int8), after which every slice int is <= 2^{q-1} + 2 --
    inside the k * (2^{q-1} + 2)^2 <= 2^24 product-exactness bound
    oz_mode_params enforces, and exactly representable in bf16's 8
    significand bits.

    lo's early slices are zero (|lo| <= 2^-25): its first nonzero slice
    int is <= 2^{sq - 25} <= 2^{q-1} for the first grid reaching lo's
    magnitude, and <= 2^{q-1} after (residual bound) -- no extra margin
    needed."""
    import jax.numpy as jnp

    rh, rl = hi, lo
    ms = []
    for s in range(p):
        step = np.float32(2.0 ** ((s + 1) * q))
        istep = np.float32(2.0 ** (-(s + 1) * q))
        sh = jnp.round(rh * step) * istep
        rh = rh - sh
        if (s + 1) * q <= 24:
            # |lo| <= 2^-25 (half an ulp of the <=0.5-bounded hi), so
            # round(lo * 2^{(s+1)q}) == 0 EXACTLY while (s+1)q <= 24:
            # skip the dead early lo rounds (3 of 7 at q=7 -- measured
            # X-prologue passes on the hot oz path)
            ms.append(sh)
            continue
        sl = jnp.round(rl * step) * istep
        rl = rl - sl
        ms.append(sh + sl)
    for s in range(p - 1, 0, -1):
        stepm = np.float32(2.0 ** (s * q))
        istepm = np.float32(2.0 ** (-s * q))
        c = jnp.round(ms[s] * stepm) * istepm
        ms[s - 1] = ms[s - 1] + c
        ms[s] = ms[s] - c
    if out_int8:
        # raw slice INTEGERS (the 'xi8' kernel mode): value * 2^{(s+1)q}
        # is an exact small int (<= 2^{q-1} + 2 after the carry sweep,
        # int8-safe at q <= 7); power-of-two multiply + convert: exact
        return [(m * np.float32(2.0 ** ((s + 1) * q))).astype(jnp.int8)
                for s, m in enumerate(ms)]
    return [m.astype(jnp.bfloat16) for m in ms]


def _oz_slices_int8(pure, p: int, q: int, r_cap_log2: int = 0):
    """p RAW-INTEGER int8 slices of an f64 array descaled to
    |.| <= 2^{r_cap_log2}: pure == sum_s f64(slices[s]) * 2^{-(s+1)q}
    + O(2^{-p q}).

    Identical math to ``_oz_slices`` but the stored value is the slice
    INTEGER, not the scaled bf16 value -- HALF the HBM bytes on the
    A-bandwidth-bound oz kernel.  Int bounds: the FIRST slice is
    <= 2^{q + r_cap_log2} (set by the descale), but every RESIDUAL slice
    is <= 2^{q-1} (half an ulp of the previous slice grid --
    scale-INDEPENDENT, so extra spare binades cannot shrink it).  int8
    therefore requires q <= 7 (residuals <= 64) and q + r_cap_log2 <= 7
    (first slice); q = 8 overflows at +128 no matter the scale.  The
    kernel converts int8 -> f32 -> *2^{-(s+1)q} -> bf16 per tile; every
    step is exact (small ints times a power-of-two scale), so the MXU
    products are bit-identical to the bf16 planes."""
    import jax.numpy as jnp

    if q - 1 > 7 or q + r_cap_log2 > 7:
        raise ValueError(f"q={q} (first-slice cap 2^{q + r_cap_log2}, "
                         f"residual cap 2^{q - 1}) overflows int8")
    r = pure
    ints = []
    for s in range(p):
        step = jnp.float64(2.0 ** ((s + 1) * q))
        # the int is kept in f32 (exact to 2^24) and the residual
        # subtracts the STORED value: the TPU relay's f32-pair f64
        # emulation can round/convert one ulp off the true nearest
        # (measured on the golden plan), and using the stored value makes
        # the next slice absorb the error exactly -- at the price of the
        # absorbed slice's int reaching up to 1.5 * 2^q
        sl = jnp.round(r * step).astype(jnp.float32)
        r = r - sl.astype(jnp.float64) / step
        ints.append(sl)
    # carry renormalization: an absorbed off-by-one can push a slice int
    # to ~1.5 * 2^q, past int8.  Move whole 2^q multiples into the
    # previous slice (c * 2^q on grid s == c on grid s-1, so the
    # decomposition sum is EXACTLY preserved); after the sweep every int
    # is <= 2^{q-1} + 2 -- int8-safe at q <= 7 and inside the tightened
    # product-exactness bound.  All f32 integer arithmetic: exact.
    for s in range(p - 1, 0, -1):
        c = jnp.round(ints[s] * np.float32(2.0 ** -q))
        ints[s - 1] = ints[s - 1] + c
        ints[s] = ints[s] - c * np.float32(2.0 ** q)
    return [i.astype(jnp.int8) for i in ints]


def _pow2_scale_np(amax: np.ndarray) -> np.ndarray:
    """Host-exact power of two >= amax (zeros mapped to 1): the numpy
    twin of ozaki.pow2_scale, valid over the FULL f64 exponent range
    (no relay-emulation tiering needed on host)."""
    a = np.where(amax > 0, amax, 1.0)
    _, e = np.frexp(a)                 # a = m * 2^e with 0.5 <= m < 1
    return np.ldexp(np.ones_like(a), e)


def _oz_slices_np(pure: np.ndarray, p: int, q: int) -> list:
    """Host twin of _oz_slices (true-f64 numpy: the stored-value subtract
    is kept so the slice-int bounds match the device path exactly)."""
    import ml_dtypes

    r = np.asarray(pure, np.float64)
    out = []
    for s in range(p):
        step = 2.0 ** ((s + 1) * q)
        sl = (np.round(r * step) / step).astype(ml_dtypes.bfloat16)
        r = r - sl.astype(np.float64)
        out.append(sl)
    return out


def _oz_slices_int8_np(pure: np.ndarray, p: int, q: int,
                       r_cap_log2: int = 0) -> list:
    """Host twin of _oz_slices_int8 (same int bounds and carry sweep)."""
    if q - 1 > 7 or q + r_cap_log2 > 7:
        raise ValueError(f"q={q} overflows int8")
    r = np.asarray(pure, np.float64)
    ints = []
    for s in range(p):
        step = 2.0 ** ((s + 1) * q)
        sl = np.round(r * step).astype(np.float32)
        r = r - sl.astype(np.float64) / step
        ints.append(sl)
    for s in range(p - 1, 0, -1):
        c = np.round(ints[s] * np.float32(2.0 ** -q))
        ints[s - 1] = ints[s - 1] + c
        ints[s] = ints[s] - c * np.float32(2.0 ** q)
    return [i.astype(np.int8) for i in ints]


def oz_mode_params(k: int, bits: int = 53,
                   int8: str = None) -> tuple[str, int, int]:
    """(precision tag, p, q) of the oz kernel make_pairpanel_multiply_oz
    will build for contraction depth ``k`` under the current env knobs --
    the single source of truth for VMEM-fit checks, auto_t_step and
    engine labels.  Default is the compensated 'ozc' mode with bf16 A
    planes at q = 8, p = 7 (28 MXU passes -- measured faster than the
    int8 point on the golden plan); TFQ_OZC_INT8=1 selects int8 raw-int
    planes at q = 7, p = 8 (half the A bytes, 36 passes -- residual
    slice ints are bounded by 2^{q-1} independent of scale, so q = 8
    cannot ship as int8); TFQ_OZ_COMP=0 the legacy 'oz' mode."""
    import math

    from . import ozaki

    if _os.environ.get("TFQ_OZC_INT8") is not None and int8 is None:
        int8 = _os.environ.get("TFQ_OZC_INT8")
    if _os.environ.get("TFQ_OZ_COMP", "1") != "0":
        p, q = ozaki.slice_params_comp(k, bits)
        i8 = int8 if int8 is not None else "0"
        if i8 != "0" and q > 7:
            # int8 point: slice ints <= 2^{q-1} + 2 <= 66 at q = 7 (the
            # +2 covers emulated-f64 absorbs after carry renormalization,
            # see _oz_slices_int8).  Exactness: k * 66^2 <= 2^24 ->
            # k <= 3851 -- looser than q = 8's bound.
            q = 7
            p = math.ceil(bits / q) + (1 if bits % q == 0 else 0)
        if i8 in ("2", "3"):
            # 'xi8': BOTH operands int8, MXU accumulates in int32 --
            # per-product bound k * (2^{q-1}+2)^2 <= 2^31 and diagonal
            # sums p * that <= 2^31 (the f32 conversion is exactified by
            # the hi/lo integer split in the kernel, see dots())
            if p * k * (2 ** (q - 1) + 2) ** 2 > 2 ** 31:
                raise ValueError(f"contraction depth {k} too deep for "
                                 f"int32 slice accumulation at q={q}")
        elif k * (2 ** (q - 1) + 2) ** 2 > 2 ** 24:
            raise ValueError(f"contraction depth {k} too deep for exact "
                             f"f32 slice products at q={q}")
        return f"ozc{p}", p, q
    p, q = ozaki.slice_params(k, bits, diag_sum=True)
    if _os.environ.get("TFQ_OZ_INT8", "1") != "0" and q > 7:
        q = 7
        p = max(p, -(-54 // 7))
    return f"oz{p}", p, q


def make_pairpanel_multiply_oz(plan: PairPanelPlan, a_re, a_im,
                               interpret: bool = False, t_step: int = 1,
                               bits: int = 53,
                               int8: str = None) -> OzPairPanelMultiply:
    """Build the f64-quality ('z') pair-panel multiply.

    a_re/a_im: [nnzbA, LM, LM] float64 block data (host or device).  The
    A panels are built on device in f64, descaled by a per-panel-row
    power-of-two, and split into p exponent-blocked bf16 slice planes
    (ops/ozaki.py); slice count p and width q come from
    ozaki.slice_params(ku*LM, bits, diag_sum=True) so every MXU product
    AND every in-kernel diagonal sum is exactly representable in f32.

    The reference ships this as the native-double gemmNxNf instantiation
    (tfqmrgpu.cu:40-45); v5e has no f64 unit, so this is the TPU-native
    equivalent.  COLUMN-GROUPED plans work (pack the grouped pair list,
    pass grouped X cells -- zero lanes slice to zero exactly); RESIDENT
    plans are rejected: an xsplit=p window panel cannot fit VMEM."""
    import jax.numpy as jnp

    from . import ozaki

    r, lm, ln = plan.r_tile, plan.lm, plan.ln
    k = plan.ku * lm
    tag, p, q = oz_mode_params(k, bits, int8=int8)
    comp = tag.startswith("ozc")
    T = max(int(t_step), 1)
    if T > 1:
        nsteps, wsel_h, codes_h, trips_h, cmax = make_step_tables(plan, T)
    else:
        nsteps, cmax = plan.ntiles, plan.cmax
        wsel_h = np.concatenate([plan.wsel, plan.wsel[-1:]])
        codes_h, trips_h = _program_tables(plan, np.arange(plan.ntiles),
                                           plan.ku)
    pad_tiles = nsteps * T - plan.ntiles
    # int8 raw-int A planes (default): HALF the streamed bytes of the
    # bf16 scaled-value planes on this A-bandwidth-bound kernel; the
    # in-kernel reconstruction is exact (see _oz_slices_int8), so results
    # are bit-identical given the same (p, q).  Opt out: TFQ_OZ_INT8=0.
    # Slice-int range: |int| <= 2^q; int8 holds q <= 6 directly, q == 7
    # with ONE spare binade of scale (|r| <= 0.5 -> ints <= 64); tiny-K
    # plans where slice_params returns q > 7 are re-sliced at q=7 with
    # more slices (lower q only ADDS accumulation headroom, and
    # p*q - 1 >= 53 keeps the truncation below one f64 ulp).
    if comp:
        i8_env = (int8 if int8 is not None else
                  _os.environ.get("TFQ_OZC_INT8", "0"))
    else:
        i8_env = _os.environ.get("TFQ_OZ_INT8", "1")
    use_int8 = i8_env != "0"
    # 'xi8' (TFQ_OZC_INT8=2): X slices ALSO ship int8 and the MXU runs
    # s8 x s8 -> s32 (see the dots() branch).  Needs the int8-safe q,
    # int8 32-row sublane alignment of the scratch copies (lm % 32), and
    # the compensated mode's dual spare binade
    xi8 = (comp and i8_env in ("2", "3") and q <= 7 and lm % 32 == 0)
    if comp and use_int8 and not xi8 \
            and k * (2 ** (q - 1) + 2) ** 2 > 2 ** 24:
        # an xi8 request fell back to the MIXED int8-A/bf16-X kernel
        # (lm not 32-aligned): its f32-accumulated dots need the tighter
        # 2^24 bound oz_mode_params skipped under the int32 mode
        raise ValueError(f"contraction depth {k} too deep for exact f32 "
                         f"slice products at q={q} (xi8 unavailable at "
                         f"lm={lm})")
    if plan.resident:
        # RESIDENT oz: only the xi8 layout fits -- an xsplit=p bf16
        # window panel is ~2x VMEM, but int8 slices halve it (~106 MB on
        # the golden cg2 plan, inside the 120 MB scoped cap).  The panel
        # is DMAed once per multiply instead of building + streaming the
        # overlapping window replicas.
        win_b = ((plan.n_slots + plan.copy_g) * lm
                 * _lanes_pad(p * 2 * ln) * 1)
        if not xi8 or win_b > (108 << 20):
            raise ValueError(
                "resident oz needs the xi8 layout and a <=108 MB int8 "
                f"panel (have xi8={xi8}, {win_b >> 20} MB); pack with "
                "resident=False")
    # WHERE to slice: the A-side descale/slicing chains are f64
    # elementwise; on relay-emulated-f64 devices they cost minutes of
    # build time for FD-class plans (measured 444 s), while true-f64
    # host numpy does them in seconds -- at the price of shipping the
    # finished planes over the host link.  auto (default): host when the
    # plane bytes stay under 256 MB and the inputs are host arrays;
    # TFQ_OZ_HOST_SLICE=1/0 forces.
    plane_bytes = (nsteps * T * p * 2 * r * lm * k
                   * (1 if use_int8 and q <= 7 else 2))
    host_env = _os.environ.get("TFQ_OZ_HOST_SLICE", "auto")
    host = (isinstance(a_re, np.ndarray) and isinstance(a_im, np.ndarray)
            and (host_env == "1"
                 or (host_env not in ("0",) and plane_bytes <= 256 << 20)))
    if host:
        panels = build_a_panels(plan, np.asarray(a_re, np.float64),
                                np.asarray(a_im, np.float64))
        if pad_tiles:
            panels = np.pad(panels, ((0, pad_tiles), (0, 0), (0, 0)))
        xp = np
        sigma = _pow2_scale_np(np.max(np.abs(panels), axis=2,
                                      keepdims=True))
        sl_int8 = _oz_slices_int8_np
        sl_bf16 = _oz_slices_np
    else:
        panels = build_a_panels_device(
            plan, jnp.asarray(a_re, jnp.float64),
            jnp.asarray(a_im, jnp.float64))
        if pad_tiles:
            panels = jnp.pad(panels, ((0, pad_tiles), (0, 0), (0, 0)))
        xp = jnp
        sigma = ozaki.pow2_scale(jnp.max(jnp.abs(panels), axis=2,
                                         keepdims=True))
        sl_int8 = _oz_slices_int8
        sl_bf16 = _oz_slices
    if comp:
        # r4: sigma is SHARED across the re/im panel halves (max of the
        # pair) so the kernel's in-kernel complex assembly operates on
        # one power-of-two scale; the X side mirrors this with a
        # lane-shared tau in apply().  Sharing only shrinks the smaller
        # half's slice ints -- the truncation floor stays 2^{-pq} of the
        # (shared) scale.
        mr = r * lm
        sig_sh = xp.maximum(sigma[:, :mr], sigma[:, mr:])
        sigma = xp.concatenate([sig_sh, sig_sh], axis=1)
        # dual spare binade (the X side mirrors this in apply): ints cap
        # at 2^{q-1} so every k-deep slice product sums exactly in f32.
        # The default int8 planes require q <= 7 (oz_mode_params picks
        # q = 7, p = 8 then: every int <= 64); q = 8 residual ints reach
        # +128 and cannot ship as int8 (see _oz_slices_int8).
        sigma = sigma * 2.0
        if use_int8 and q <= 7:
            planes = tuple(sl_int8(panels / sigma, p, q, r_cap_log2=-1))
        else:
            planes = tuple(sl_bf16(panels / sigma, p, q))
        # apply() descales the folded [M, 4ln] output with the half-panel
        # sigma (both halves carry the identical shared scale)
        sigma = sigma[:, :mr]
    elif use_int8:
        if 2 ** q > 64:
            # one spare binade: first-slice ints <= 2^{q-1} <= 64
            sigma = sigma * 2.0
        planes = tuple(sl_int8(panels / sigma, p, q))
    else:
        planes = tuple(sl_bf16(panels / sigma, p, q))
    call = _make_call(nsteps, r, plan.ku, lm, ln, plan.s_window,
                      plan.x_rows_padded, tag, interpret,
                      copy_g=plan.copy_g, cmax=cmax, t_step=T,
                      o_blocks=plan.o_blocks, resident=plan.resident,
                      oz_q=q,
                      oz_stack=max(1, int(_os.environ.get("TFQ_OZ_STACK",
                                                          "1"))),
                      oz_xi8=xi8)
    # one concatenated [ntiles_padded, p*2M, K] input: each grid step
    # issues ONE large A DMA (p separate plane refs measured ~106 GB/s
    # on the A-bytes-bound golden 'z' run; see the kernel comment)
    if host:
        planes_cat = jnp.asarray(np.concatenate(planes, axis=1))
        sigma = jnp.asarray(sigma)
    else:
        planes_cat = jnp.concatenate(planes, axis=1)
    consts = ((jnp.asarray(wsel_h), jnp.asarray(trips_h),
               jnp.asarray(codes_h)) + (planes_cat,) + (sigma,))
    return OzPairPanelMultiply(call, consts, plan, p, q, comp=comp,
                               xi8=xi8)


def flops_nominal(n_pairs: int, lm: int, ln: int) -> float:
    """The reference's flop accounting for one pair-plan multiply
    (bench_tfqmrgpu.cu:335)."""
    return n_pairs * 8.0 * lm * lm * ln


# ----------------------------------------------------- solver integration

def fused_primitives(mult: "PairPanelMultiply", consts, plan: PairPanelPlan,
                     ncc: int, b_fused, gp: "GroupedPairs" = None,
                     sup_mask=None):
    """TfqmrPrimitives over FUSED permuted panels (single f32 arrays
    [x_rows_padded, 2*LN], re in lanes [:ln], im in [ln:]) -- the vector
    layout of the ``pairs`` solver engine.

    Per-column reductions run as sorted segmented sums keyed by the
    permuted block->compressed-column map (the relabeling is column-major,
    so segments are contiguous); padded rows map to a dump segment.

    With ``gp`` (a column-grouped plan, see pack_grouped) each slot packs
    ``G`` compressed columns side by side on lanes: the multiply output is
    masked back to the true pattern (grouped products land on absent
    lanes of existing cells), per-column reductions contract a GROUP
    one-hot and then un-interleave the lane blocks, and per-column scalars
    scatter into the [ngroups, G*ln] lane layout before the one-hot
    row expansion.

    With ``sup_mask`` (a [x_rows_padded, 2*ln] fused live-slot mask, see
    superblock.merged_mask_full + permute_x) the plan runs in SUPERBLOCK
    merged space: every multiply output is masked so junk products on
    dead merged slots never re-enter the recurrence, and the per-column
    reductions stay exact because dead slots contribute zero.  When both
    ``gp`` and ``sup_mask`` are given the mask already composes the
    grouped lane mask (grouped_lane_mask cannot index merged cells)."""
    import jax
    import jax.numpy as jnp

    from ..core import TfqmrPrimitives
    from . import decisions

    ln, lm = plan.ln, plan.lm
    nxrows = plan.x_rows_padded
    nyrows = plan.ntiles * plan.r_tile * lm
    sdt = decisions.scalar_dtype()

    if gp is not None:
        return _fused_primitives_grouped(mult, consts, plan, ncc, b_fused,
                                         gp, sup_mask=sup_mask)

    def multiply(x):
        y = mult.apply(consts, x)
        y = jnp.pad(y, ((0, nxrows - nyrows), (0, 0)))
        return y if sup_mask is None else y * sup_mask

    # permuted block -> compressed column of X; pad blocks -> dump segment
    colx = plan.col_of_new                       # int32[n_blocks_padded]
    row_col_np = np.repeat(np.where(colx >= 0, colx, ncc),
                           lm).astype(np.int32)
    row_col = jnp.asarray(row_col_np)

    def halves(x):
        return x[:, :ln], x[:, ln:]

    # reductions accumulate in the DATA dtype and convert per-column results
    # to f64 for the decision math -- the reference does the same
    # (col_inner in real_t, tfqmrgpu_linalg.hxx:480-523; decisions in
    # double): f64 elementwise work is software-emulated on TPU and would
    # dominate the iteration
    vdt = jnp.result_type(b_fused)     # f32, or f64 on the 'z' pairs path

    def _exact_onehot_dot(oh, p):
        """oh @ p with one-hot oh, exact in f32: split p into bf16 hi/lo
        halves (exact decomposition to 2^-17, summed in f32 accumulators) --
        2 MXU passes instead of HIGHEST's 6.  oh entries are 0/1, exact in
        bf16, so the only rounding is the split residual, which for a
        0/1-weighted SUM is below f32 accumulation noise."""
        hi, lo = split_bf16x2(p)
        dt = jnp.float32
        return (jax.lax.dot(oh, hi, preferred_element_type=dt)
                + jax.lax.dot(oh, lo, preferred_element_type=dt))

    def _colsum(p):
        """Per-column segmented sum of a [nxrows, ln] array.  When the
        one-hot matrix exists this is a transposed MXU matmul (TPU scatter
        is serial and dominates otherwise).  f64 inputs ('z') keep the
        reduction in f64 -- the recurrence's quality floor lives here --
        but as a SEGMENT SUM, never an emulated-f64 matmul (measured r5:
        one-hot f64 dots made a golden 'z' iteration 209 ms)."""
        if vdt == jnp.float64:
            return jax.ops.segment_sum(p, row_col, num_segments=ncc + 1,
                                       indices_are_sorted=True)[:ncc]
        if onehot is not None:
            return _exact_onehot_dot(onehot.T, p)
        return jax.ops.segment_sum(p, row_col, num_segments=ncc + 1,
                                   indices_are_sorted=True)[:ncc]

    def dotp(x, y):
        xr, xi = halves(x)
        yr, yi = halves(y)
        zr = _colsum(xr * yr - xi * yi)
        zi = _colsum(xr * yi + xi * yr)
        return zr.astype(sdt), zi.astype(sdt)

    def nrm2(x):
        xr, xi = halves(x)
        return _colsum(xr * xr + xi * xi).astype(sdt)

    # Per-row expansion of the [ncc, ln] per-column scalars and the
    # per-column reductions.  Preference order:
    #   1. col_pad layout: plain reshape-sum / broadcast (no index ops);
    #   2. one-hot MXU matmuls (TPU row gather runs ~13 GB/s and scatter is
    #      serial -- both would dominate the 10 axpy + 6 reductions/iter);
    #   3. gather / segment_sum fallback for huge ncc.
    import os as _os
    r_col = plan.r_col
    if r_col and plan.n_slots == ncc * r_col:
        rr = r_col * lm

        def _h3(v):
            """[nxrows, 2ln] -> active 3-D view [ncc, rr, ln] re/im halves
            (rows beyond n_slots*lm are window padding and stay zero)."""
            v3 = v[: ncc * rr].reshape(ncc, rr, 2 * ln)
            return v3[..., :ln], v3[..., ln:]

        def _out3(zr, zi):
            out = jnp.concatenate([zr, zi], axis=2).reshape(ncc * rr,
                                                            2 * ln)
            return jnp.pad(out, ((0, nxrows - ncc * rr), (0, 0)))

        def dotp(x, y):
            xr, xi = _h3(x)
            yr, yi = _h3(y)
            zr = (xr * yr - xi * yi).sum(axis=1)
            zi = (xr * yi + xi * yr).sum(axis=1)
            return zr.astype(sdt), zi.astype(sdt)

        def nrm2(x):
            xr, xi = _h3(x)
            return (xr * xr + xi * xi).sum(axis=1).astype(sdt)

        def axpy(y, x, a):
            ar = a[0].astype(jnp.float32)[:, None, :]
            ai = a[1].astype(jnp.float32)[:, None, :]
            xr, xi = _h3(x)
            yr, yi = _h3(y)
            return _out3(ar * xr - ai * xi + yr, ai * xr + ar * xi + yi)

        def xpay(y, a, x):
            ar = a[0].astype(jnp.float32)[:, None, :]
            ai = a[1].astype(jnp.float32)[:, None, :]
            xr, xi = _h3(x)
            yr, yi = _h3(y)
            return _out3(xr + ar * yr - ai * yi, xi + ai * yr + ar * yi)

        def add_rhs(v, b, scal):
            del b
            return v + scal * b_fused

        return TfqmrPrimitives(
            multiply=multiply, dotp=dotp, nrm2=nrm2, axpy=axpy, xpay=xpay,
            add_rhs=add_rhs, allmax=lambda s: s, alland=lambda s: s,
        )

    onehot = None
    if (nxrows * (ncc + 1) * 4 <= 32 * 1024 * 1024
            and _os.environ.get('TFQ_ONEHOT_SCALE', '1') != '0'):
        oh = np.zeros((nxrows, ncc + 1), np.float32)
        oh[np.arange(nxrows), row_col_np] = 1.0
        onehot = jnp.asarray(oh[:, :ncc])         # dump column dropped

        def _scale(a):
            # HIGHEST precision: the tfQMR scalars must expand EXACTLY --
            # bf16 rounding (even hi/lo split residuals at 2^-17) shows up
            # directly as a convergence floor.  'z' expands in f64.
            dt = jnp.float64 if vdt == jnp.float64 else jnp.float32
            hp = jax.lax.Precision.HIGHEST
            oh = onehot.astype(dt) if dt == jnp.float64 else onehot
            ar = jax.lax.dot(oh, a[0].astype(dt),
                             preferred_element_type=dt, precision=hp)
            ai = jax.lax.dot(oh, a[1].astype(dt),
                             preferred_element_type=dt, precision=hp)
            return ar, ai
    if onehot is None:
        def _scale(a):
            dt = jnp.float64 if vdt == jnp.float64 else jnp.float32
            ar = jnp.concatenate([a[0].astype(dt),
                                  jnp.zeros((1, ln), dt)])[row_col]
            ai = jnp.concatenate([a[1].astype(dt),
                                  jnp.zeros((1, ln), dt)])[row_col]
            return ar, ai

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

    def add_rhs(v, b, scal):
        del b  # b_fused closed over (device-resident, pre-scattered)
        return v + scal * b_fused

    if vdt == jnp.float64:
        # 'z': scalar expansion by SLOT GATHER + in-arithmetic broadcast
        # -- exact (pure data movement; the gathered table is tiny) and
        # free of the emulated-f64 one-hot matmuls that dominated full-z
        # iterations (r5 measured 209 ms/iter on the golden pattern)
        nslots = nxrows // lm
        slot_col = jnp.asarray(
            np.where(colx >= 0, colx, ncc)[:nslots].astype(np.int32))

        def _scal3(a):
            pad = jnp.zeros((1, ln), vdt)
            ar = jnp.concatenate([a[0].astype(vdt), pad])[slot_col]
            ai = jnp.concatenate([a[1].astype(vdt), pad])[slot_col]
            return ar[:, None, :], ai[:, None, :]

        def axpy(y, x, a):
            ar, ai = _scal3(a)
            x3 = x.reshape(nslots, lm, 2 * ln)
            y3 = y.reshape(nslots, lm, 2 * ln)
            xr, xi = x3[..., :ln], x3[..., ln:]
            yr, yi = y3[..., :ln], y3[..., ln:]
            return jnp.concatenate(
                [ar * xr - ai * xi + yr, ai * xr + ar * xi + yi],
                axis=-1).reshape(nxrows, 2 * ln)

        def xpay(y, a, x):
            ar, ai = _scal3(a)
            x3 = x.reshape(nslots, lm, 2 * ln)
            y3 = y.reshape(nslots, lm, 2 * ln)
            xr, xi = x3[..., :ln], x3[..., ln:]
            yr, yi = y3[..., :ln], y3[..., ln:]
            return jnp.concatenate(
                [xr + ar * yr - ai * yi, xi + ai * yr + ar * yi],
                axis=-1).reshape(nxrows, 2 * ln)

    return TfqmrPrimitives(
        multiply=multiply, dotp=dotp, nrm2=nrm2, axpy=axpy, xpay=xpay,
        add_rhs=add_rhs, allmax=lambda s: s, alland=lambda s: s,
    )


def grouped_lane_mask(plan: PairPanelPlan, gp: "GroupedPairs") -> np.ndarray:
    """Per-slot lane mask [n_slots_padded, 2*ln2] of the grouped layout:
    1 where the (cell, column) is in the true pattern, 0 on absent lanes
    and window-padding slots.  Constant across the LM rows of a slot, so
    callers broadcast instead of materializing [rows, lanes]."""
    ln2 = plan.ln
    ln0 = ln2 // gp.group_size
    nslots = nxs = plan.x_rows_padded // plan.lm
    m = np.zeros((nxs, gp.group_size), np.float32)
    live = plan.perm[: plan.n_slots or plan.nnzb_x] >= 0
    slots = np.flatnonzero(live)
    cells = plan.perm[: plan.n_slots or plan.nnzb_x][live]
    m[slots] = (gp.src_of[cells] >= 0).astype(np.float32)
    half = np.repeat(m, ln0, axis=1)           # [nslots, ln2]
    del nslots
    return np.concatenate([half, half], axis=1)


def _fused_primitives_grouped(mult, consts, plan: PairPanelPlan, ncc: int,
                              b_fused, gp: "GroupedPairs", sup_mask=None):
    import jax
    import jax.numpy as jnp

    from ..core import TfqmrPrimitives
    from . import decisions

    ln2, lm = plan.ln, plan.lm
    gsz = gp.group_size
    ln0 = ln2 // gsz
    ngroups = gp.ngroups
    nxrows = plan.x_rows_padded
    nyrows = plan.ntiles * plan.r_tile * lm
    nslots = nxrows // lm
    sdt = decisions.scalar_dtype()

    # slot -> group one-hot (col_of_new holds GROUP ids: pack_pair_plan was
    # called with col_of=gp.col_of2); padded slots go to a dump column
    grp_np = np.where(plan.col_of_new >= 0, plan.col_of_new,
                      ngroups).astype(np.int64)
    oh = np.zeros((nslots, ngroups + 1), np.float32)
    oh[np.arange(nslots), grp_np[:nslots]] = 1.0
    oh_rows = jnp.asarray(np.repeat(oh[:, :ngroups], lm, axis=0))

    # compressed column c <-> (group, lane block) bijection
    gc_np = np.zeros(ncc, np.int64)
    for gi, grp in enumerate(gp.groups):
        for cpos, c in enumerate(grp):
            gc_np[c] = gi * gsz + cpos
    gc = jnp.asarray(gc_np)

    # f32 on the 'c' path; f64 on the 'z' (Ozaki multiply) path -- the
    # reductions and scalar expansions then stay in f64, same policy as
    # the ungrouped primitives
    vdt = jnp.result_type(b_fused)
    if sup_mask is not None:
        # superblock merged space: the composed full-resolution mask
        # (grouped_lane_mask indexes GROUPED cells and cannot be used --
        # plan.perm holds MERGED cell ids here)
        def multiply(x):
            y = mult.apply(consts, x)
            y = jnp.pad(y, ((0, nxrows - nyrows), (0, 0)))
            return (y * sup_mask).astype(vdt)
    else:
        mask = jnp.asarray(grouped_lane_mask(plan, gp))  # [nslots, 2*ln2]

        def multiply(x):
            y = mult.apply(consts, x)
            y = jnp.pad(y, ((0, nxrows - nyrows), (0, 0)))
            y3 = y.reshape(nslots, lm, 2 * ln2) * mask[:, None, :]
            return y3.reshape(nxrows, 2 * ln2).astype(vdt)

    def _exact_onehot_dot(a, p):
        hi, lo = split_bf16x2(p)
        dt = jnp.float32
        return (jax.lax.dot(a, hi, preferred_element_type=dt)
                + jax.lax.dot(a, lo, preferred_element_type=dt))

    # 'z' reductions/expansions avoid emulated-f64 one-hot matmuls:
    # segment sums over the (group-major, contiguous) slot order and
    # slot gathers of the tiny per-group scalar panel (r5: the matmul
    # form measured 209 ms/iteration on the golden pattern)
    row_grp = jnp.asarray(np.repeat(grp_np[:nslots], lm).astype(np.int32))
    slot_grp = jnp.asarray(grp_np[:nslots].astype(np.int32))

    def _colsum(p):
        """[nxrows, ln2] -> [ncc, ln0] per-compressed-column sums."""
        if vdt == jnp.float64:
            z = jax.ops.segment_sum(p, row_grp,
                                    num_segments=ngroups + 1,
                                    indices_are_sorted=True)[:ngroups]
        else:
            z = _exact_onehot_dot(oh_rows.T, p)         # [ngroups, ln2]
        return z.reshape(ngroups * gsz, ln0)[gc]

    def halves(x):
        return x[:, :ln2], x[:, ln2:]

    def dotp(x, y):
        xr, xi = halves(x)
        yr, yi = halves(y)
        zr = _colsum(xr * yr - xi * yi)
        zi = _colsum(xr * yi + xi * yr)
        return zr.astype(sdt), zi.astype(sdt)

    def nrm2(x):
        xr, xi = halves(x)
        return _colsum(xr * xr + xi * xi).astype(sdt)

    def _scale(a):
        """[ncc, ln0] per-column scalars -> [nxrows, ln2] lane panel.
        Exact expansion: the scatter into the lane layout moves values
        (no arithmetic) and the 0/1 one-hot expansion runs at HIGHEST
        (f64 on the 'z' path, keeping the recurrence at f64 quality)."""
        dt = vdt
        hp = jax.lax.Precision.HIGHEST

        def expand(v):
            flat = jnp.zeros((ngroups * gsz, ln0), dt)
            flat = flat.at[gc].set(v.astype(dt))
            return jax.lax.dot(oh_rows.astype(dt),
                               flat.reshape(ngroups, ln2),
                               preferred_element_type=dt, precision=hp)

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

    def add_rhs(v, b, scal):
        del b  # b_fused closed over (device-resident, pre-scattered)
        return v + scal * b_fused

    if vdt == jnp.float64:
        # see the ungrouped variant: slot-gather + broadcast scalar
        # expansion for 'z' (no emulated-f64 one-hot matmuls)
        def _scal3(a):
            flat = jnp.zeros((ngroups * gsz, ln0), vdt)
            fr = flat.at[gc].set(a[0].astype(vdt)).reshape(ngroups, ln2)
            fi = flat.at[gc].set(a[1].astype(vdt)).reshape(ngroups, ln2)
            pad = jnp.zeros((1, ln2), vdt)
            ar = jnp.concatenate([fr, pad])[slot_grp]
            ai = jnp.concatenate([fi, pad])[slot_grp]
            return ar[:, None, :], ai[:, None, :]

        def axpy(y, x, a):
            ar, ai = _scal3(a)
            x3 = x.reshape(nslots, lm, 2 * ln2)
            y3 = y.reshape(nslots, lm, 2 * ln2)
            xr, xi = x3[..., :ln2], x3[..., ln2:]
            yr, yi = y3[..., :ln2], y3[..., ln2:]
            return jnp.concatenate(
                [ar * xr - ai * xi + yr, ai * xr + ar * xi + yi],
                axis=-1).reshape(nxrows, 2 * ln2)

        def xpay(y, a, x):
            ar, ai = _scal3(a)
            x3 = x.reshape(nslots, lm, 2 * ln2)
            y3 = y.reshape(nslots, lm, 2 * ln2)
            xr, xi = x3[..., :ln2], x3[..., ln2:]
            yr, yi = y3[..., :ln2], y3[..., ln2:]
            return jnp.concatenate(
                [xr + ar * yr - ai * yi, xi + ai * yr + ar * yi],
                axis=-1).reshape(nxrows, 2 * ln2)

    return TfqmrPrimitives(
        multiply=multiply, dotp=dotp, nrm2=nrm2, axpy=axpy, xpay=xpay,
        add_rhs=add_rhs, allmax=lambda s: s, alland=lambda s: s,
    )


# ------------------------------------------------------------- bucketing

@dataclasses.dataclass
class BucketedPairPlan:
    """ku-bucketed execution of a PairPanelPlan: tiles are split into
    groups by union size and each group runs its own pallas call padded to
    its own ku -- removing the max-padding waste of a single call (~20% of
    MXU passes and A-panel bytes on the golden plan).  Tile ORDER is kept
    inside each bucket, so the sliding-window index sequence stays
    monotone and windows are still fetched once."""

    base: PairPanelPlan
    ku_b: list                    # per bucket padded ku
    tile_ids: list                # per bucket int64[] tile indices (sorted)
    wsel_b: list                  # per bucket int32[ntiles_b (+1 pipeline)]
    codes_b: list                 # per bucket flat int32[(ntiles_b+1)*cmax]
    trips_b: list                 # per bucket int32[ntiles_b+1]
    gather_order: np.ndarray      # int32[ntiles]: concat-bucket row -> tile


def bucketize(plan: PairPanelPlan, n_buckets: int = 3) -> BucketedPairPlan:
    kus = plan.kcount.astype(np.int64)
    qs = np.unique(np.quantile(kus, np.linspace(0, 1, n_buckets + 1)[1:])
                   .astype(np.int64))
    qs[-1] = plan.ku
    ku_b, tile_ids, wsel_b, codes_b, trips_b = [], [], [], [], []
    lo = 0
    for q in qs:
        sel = np.flatnonzero((kus > lo) & (kus <= q))
        lo = q
        if sel.size == 0:
            continue
        ku = int(q + (q % 2))                       # even for 2-wide gather
        ku_b.append(ku)
        tile_ids.append(sel)
        ws = plan.wsel[sel]
        wsel_b.append(np.concatenate([ws, ws[-1:]]).astype(np.int32))
        codes, trips = _program_tables(plan, sel, ku)
        codes_b.append(codes)
        trips_b.append(trips)
    concat_tiles = np.concatenate(tile_ids)
    gather_order = np.zeros(plan.ntiles, np.int64)
    gather_order[concat_tiles] = np.arange(plan.ntiles)
    return BucketedPairPlan(base=plan, ku_b=ku_b, tile_ids=tile_ids,
                            wsel_b=wsel_b, codes_b=codes_b, trips_b=trips_b,
                            gather_order=gather_order.astype(np.int32))


def build_a_panels_bucketed_device(bp: BucketedPairPlan, a_re, a_im):
    """Per-bucket stacked A panels (device scatter-add, like
    build_a_panels_device)."""
    import jax.numpy as jnp

    plan = bp.base
    lm, r = plan.lm, plan.r_tile
    panels = []
    for ku, tiles in zip(bp.ku_b, bp.tile_ids):
        local = np.full(plan.ntiles, -1, np.int64)
        local[tiles] = np.arange(tiles.size)
        sel = np.flatnonzero(local[plan.pair_tile] >= 0)
        base = ((local[plan.pair_tile[sel]] * 2 * r
                 + plan.pair_rslot[sel]) * ku + plan.pair_kslot[sel])
        pa = jnp.asarray(plan.pair_a[sel].astype(np.int32))
        stride = np.int32(r * ku)
        basej = jnp.asarray(base.astype(np.int32))
        flat = jnp.zeros((tiles.size * 2 * r * ku, lm, lm), dtype=a_re.dtype)
        flat = flat.at[basej].add(a_re[pa]).at[basej + stride].add(a_im[pa])
        p = flat.reshape(tiles.size, 2 * r, ku, lm, lm).transpose(0, 1, 3,
                                                                  2, 4)
        panels.append(p.reshape(tiles.size, 2 * r * lm, ku * lm))
    return panels


class BucketedMultiply:
    """Multiply over bucketed pallas calls; returns y in TILE order."""

    def __init__(self, bp: BucketedPairPlan, panels, precision: str,
                 interpret: bool):
        import jax.numpy as jnp

        plan = bp.base
        self._plan = plan
        self._two_ln = 2 * plan.ln
        self._m = plan.r_tile * plan.lm
        self._n_windows = plan.n_windows
        self._swrows = plan.s_window * plan.lm
        props = precision_props(precision)
        self._split = props["xsplit"]
        self._g_rows = plan.copy_g * plan.lm
        self._calls = []
        consts = []
        for ku, tiles, ws, codes, trips, pan in zip(
                bp.ku_b, bp.tile_ids, bp.wsel_b, bp.codes_b, bp.trips_b,
                panels):
            call = _make_call(int(tiles.size), plan.r_tile, int(ku),
                              plan.lm, plan.ln, plan.s_window,
                              plan.x_rows_padded, precision, interpret,
                              copy_g=plan.copy_g, cmax=plan.cmax,
                              o_blocks=plan.o_blocks,
                              resident=plan.resident)
            self._calls.append(call)
            if props["a_presplit"]:
                a_args = split_bf16x2(pan)
            else:
                a_args = (pan,)
            consts.append((jnp.asarray(ws), jnp.asarray(trips),
                           jnp.asarray(codes)) + tuple(a_args))
        consts.append(jnp.asarray(bp.gather_order))
        self.consts = tuple(consts)

    def apply(self, consts, x_fused):
        import jax.numpy as jnp

        *bucket_consts, order = consts
        xrep = _window_replicas(x_fused, self._n_windows, self._swrows,
                                self._two_ln, self._split, self._g_rows,
                                orows=self._plan.o_blocks * self._plan.lm,
                                resident=self._plan.resident)
        ys = []
        for call, bc in zip(self._calls, bucket_consts):
            wsel, tr, codes, *a_args = bc
            ys.append(call(wsel, tr, codes, *a_args, xrep))
        y = jnp.concatenate(ys, axis=0)[order]      # back to tile order
        return y.reshape(self._plan.ntiles * self._m, self._two_ln)

    def __call__(self, x_fused):
        return self.apply(self.consts, x_fused)
