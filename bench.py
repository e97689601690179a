"""Headline benchmark: block-sparse SpMM on the reference's golden workload.

Reproduces the reference's ``bench_tfqmrgpu multi`` mode
(bench_tfqmrgpu.cu:289-440): the plan_unordered.14-287-16 multiplication plan
(nnzbY=nnzbX=4490, nnzbA=13109, 50,526 pairs), deterministic cos/sin block
fill, a CPU correctness gate (maxdev <= 1e-4, bench_tfqmrgpu.cu:414), and a
timed Y = A @ X loop.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline compares against the reference's best in-source V100 anchor for
LM=LN=32 double: 4.3 TFlop/s (bench_tfqmrgpu.cu:319).

Env knobs: TFQ_BENCH_LM/LN (default 32/32), TFQ_BENCH_PREC (c|z, default c),
TFQ_BENCH_NREP (default 64), TFQ_BENCH_RTILE (default 1, pairpanel),
TFQ_BENCH_ROWTILE (default 128/LM, rowtile), TFQ_BENCH_TSTEP (default 16),
TFQ_BENCH_BUCKETS (ku buckets, default 1; >1 trades dispatch overhead for
padding), TFQ_BENCH_ENGINE (rowtile|pairpanel|xla|auto, default auto),
PREC=z races the oz axes ON DEVICE (bits x stride x t_step x colgroup x
int8/xi8) -- setting TFQ_OZ_BITS / TFQ_OZ_STRIDE / TFQ_BENCH_TSTEP /
TFQ_BENCH_COLGROUP / TFQ_OZC_INT8 PINS that axis for every candidate,
TFQ_BENCH_MM_PREC (bf16x4|bf16x3|bf16x6|highest|auto; default 'auto' =
measure bf16x4 against the gate, fall back through 'bf16x6' (3-way splits,
exact-f32 quality at bf16x4's streamed A bytes; pairpanel + rowtile) to
exact-f32 'highest' whenever maxdev crosses 0.9x the gate -- MXU bf16
hi/lo split products carry a systematic ~1.3e-4-scale error at K~450, so
the margin is verified, never assumed), TFQ_PLAN_FILE.
"""

import functools
import json
import os
import sys
import time

import numpy as np

GOLDEN_PLAN = "/root/reference/test/multiplication/plan_unordered.14-287-16"
BASELINE_TFLOPS = 4.3  # V100 double LM=LN=32 TUNE=4 (bench_tfqmrgpu.cu:319)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_pairs():
    """Return (pair_a, pair_x, pair_y sorted by Y, nnzb_y, nnzb_a, nnzb_x)."""
    path = os.environ.get("TFQ_PLAN_FILE", GOLDEN_PLAN)
    if os.path.exists(path):
        from tfqmrgpu_tpu.io.planfile import read_plan_file

        pf = read_plan_file(path)
        counts = np.diff(pf.starts.astype(np.int64))
        pair_y = np.repeat(pf.y_order, counts)
        order = np.argsort(pair_y, kind="stable")
        log(f"# plan file {path}: nnzbY={pf.nnzb_y} nnzbA={pf.nnzb_a} "
            f"nnzbX={pf.nnzb_x} nPairs={pf.pairs.shape[0]}")
        return (pf.pairs[order, 0].astype(np.int64),
                pf.pairs[order, 1].astype(np.int64),
                pair_y[order].astype(np.int64),
                pf.nnzb_y, pf.nnzb_a, pf.nnzb_x)
    # synthesize a same-sized FD-like banded plan (golden asset absent);
    # TFQ_BENCH_MB/NCOLSB/DEG shrink it for smoke tests
    log("# golden plan absent; synthesizing an equivalent banded plan")
    mb = int(os.environ.get("TFQ_BENCH_MB", "281"))
    ncols = int(os.environ.get("TFQ_BENCH_NCOLSB", "16"))
    deg = int(os.environ.get("TFQ_BENCH_DEG", "11"))
    rowptr_a = np.arange(mb + 1) * deg
    colind_a = ((np.arange(mb)[:, None] + np.arange(deg)[None, :]) % mb
                ).reshape(-1)
    x_row = np.repeat(np.arange(mb), ncols)
    x_col = np.tile(np.arange(ncols), mb)
    nx = mb * ncols
    xid = -np.ones((mb, ncols), np.int64)
    xid[x_row, x_col] = np.arange(nx)
    pa, px, py = [], [], []
    for iy in range(nx):
        r, c = int(x_row[iy]), int(x_col[iy])
        for ia in range(rowptr_a[r], rowptr_a[r + 1]):
            k = int(colind_a[ia])
            pa.append(ia)
            px.append(int(xid[k, c]))
            py.append(iy)
    return (np.array(pa), np.array(px), np.array(py),
            nx, mb * deg, nx)


def cos_sin_fill(nnzb, d1, d2, dtype):
    """Deterministic block data: re=cos(idx), im=sin(idx) with
    idx = (m*d1 + i)*d2 + j (reference: fill_cos_sin,
    bench_tfqmrgpu.cu:276-287)."""
    idx = np.arange(nnzb * d1 * d2, dtype=np.float64).reshape(nnzb, d1, d2)
    return np.cos(idx).astype(dtype), np.sin(idx).astype(dtype)


def main_fd():
    """TFQ_BENCH_MODE=fd: full tfQMR solve on a generated FD problem --
    time-to-residual + iteration count + maxdev vs the generator's dense
    reference solution (the reference driver's gate: maxdev < 1e-5,
    bench_tfqmrgpu.cu:178-206).  BASELINE config 2."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    prec = os.environ.get("TFQ_BENCH_PREC", "z")
    rtb = float(os.environ.get("TFQ_FD_RTB", "6.75"))
    engine = os.environ.get("TFQ_BENCH_ENGINE", "auto")
    repeats = int(os.environ.get("TFQ_BENCH_NREP", "4"))
    # iteration cap: the reference driver's default is 2000
    # (bench_tfqmrgpu.cu:575); r3 ran 500 and mislabeled capped rows
    maxit = int(os.environ.get("TFQ_FD_MAXITER", "2000"))

    from tfqmrgpu_tpu import Solver, enable_x64, profiling
    from tfqmrgpu_tpu.generator import generate_fd_problem
    from tfqmrgpu_tpu.solver import solve_mixed

    if prec in ("z", "m"):
        enable_x64()
    t0 = time.time()
    prob = generate_fd_problem(rtb=rtb, reference=True)
    a = prob.a.with_data((prob.a_stencil[prob.a_indirection]
                          * prob.a_scale).astype(np.complex128))
    b = prob.b.with_data(
        prob.b_blocks[prob.b_indirection].astype(np.complex128))
    log(f"# FD problem: mb={a.nrows} nnzbA={a.nnzb} nnzbX={prob.x.nnzb} "
        f"BS={prob.params['bs']} generated in {time.time()-t0:.1f}s")
    tol = prob.tolerance if prec in ("z", "m") else 1e-5

    if prec == "m":
        # first call pays the (remote) compiles; time the warm second call
        solve_mixed(a, prob.x, b, tolerance=tol, max_iterations=maxit,
                    engine=engine)
        t0 = time.time()
        xsol, info = solve_mixed(a, prob.x, b, tolerance=tol * (1 - 1e-9),
                                 max_iterations=maxit, engine=engine)
        best = time.time() - t0
        xc = xsol.data
        solver = None
        roof = None
        eng = f"mixed({engine})"
    else:
        solver = Solver(a, prob.x, b, precision=prec, engine=engine)
        # restart-chunked solve (solve_checkpointed without a state
        # file): tfQMR's recurrence drifts from the true residual on
        # long solves and plateaus ~1e-8 on the rtb=12.75 operator
        # (r3's capped rows); restarting from the current iterate
        # re-anchors B - A*X0 exactly and converges in a few more
        # iterations (measured: 2000-cap stall at 1.4e-8 -> 427 total
        # iterations to 2.5e-11).  The reference leaves X0 re-upload as
        # a ToDo (bench_tfqmrgpu.cu:159 step 8x); here it is a solver
        # capability.  TFQ_FD_CHUNK=0 disables (single-shot parity).
        chunk = int(os.environ.get("TFQ_FD_CHUNK", "100"))

        def run_solve(tol_):
            if chunk > 0:
                solver.clear_initial_guess()
                return solver.solve_checkpointed(
                    tolerance=tol_, max_iterations=maxit, chunk=chunk)
            return solver.solve(tolerance=tol_, max_iterations=maxit)

        # warm-up (compile)
        info = run_solve(tol)
        # the TPU relay memoizes identical dispatches: vary the tolerance by
        # a negligible relative amount so every timed solve really executes
        best = 1e30
        for i in range(max(1, repeats - 1)):
            t0 = time.perf_counter()
            info = run_solve(tol * (1.0 - 1e-9 * (i + 1)))
            best = min(best, time.perf_counter() - t0)
        iters = max(info.iterations_needed, 1)
        roof = profiling.solver_roofline(solver, best / iters)
        log(f"# {roof}")
        xc = solver.get_matrix("X")
        eng = solver.engine

    # the reference driver's correctness gate vs the dense LAPACK solution
    ref = prob.x_reference.astype(np.float64)
    scale = max(float(np.max(np.abs(ref))), 1e-300)
    maxdev = float(np.max(np.abs(xc - ref)) / scale)
    gate = 1e-5 if prec in ("z", "m") else 1e-4
    log(f"# maxdev vs dense reference: {maxdev:.3e} (gate {gate})")
    gate_pass = maxdev < gate
    # honesty at the iteration cap (reference spirit: the driver only
    # reports a performance line for a CONVERGED solve whose maxdev
    # passes, bench_tfqmrgpu.cu:178-206).  return_status 9 means the
    # solver hit max_iterations ABOVE the requested tolerance: such a
    # row is labeled ms_at_iteration_cap (not ms_to_residual), carries
    # converged=false, and the run exits nonzero even if the partial
    # solution happens to sit inside the maxdev gate.
    converged = info.return_status == 0

    print(json.dumps({
        "metric": f"fd_solve_rtb{rtb:g}_{prec}",
        "value": round(best * 1e3, 2),
        "unit": "ms_to_residual" if converged else "ms_at_iteration_cap",
        "vs_baseline": round((roof.fraction_of_light or 0.0)
                             if roof else 0.0, 3),
        "iterations": info.iterations_needed,
        "residuum": info.residuum_reached,
        "tolerance": tol,
        "converged": bool(converged),
        "maxdev": maxdev,
        "gate_pass": bool(gate_pass and converged),
        "engine": eng,
        "tflops": round(info.flops_performed / best / 1e12, 3),
    }))
    return 0 if (converged and gate_pass) else 1


def main_iter():
    """TFQ_BENCH_MODE=iter: full tfQMR ITERATION throughput on a banded
    operator (1000 block rows, LM=LN=32, 8 RHS block columns) -- the
    sustained-production metric: ms/iteration and the fraction of the
    residency-aware roofline ceiling.  Iteration time is differential
    ((t(40 iters) - t(10 iters)) / 30) with varied tolerances, so dispatch
    overhead and relay memoization cancel."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tfqmrgpu_tpu import Solver, profiling
    from tfqmrgpu_tpu.bsr import Bsr

    engine = os.environ.get("TFQ_BENCH_ENGINE", "auto")
    pattern = os.environ.get("TFQ_BENCH_ITER_PATTERN", "banded")
    # TFQ_BENCH_ITER_PREC=z: the reference's headline precision -- full
    # f64-quality iterations through the (resident) xi8 Ozaki solver path
    prec = os.environ.get("TFQ_BENCH_ITER_PREC", "c")
    if prec == "z":
        from tfqmrgpu_tpu import enable_x64

        enable_x64()
    cdt = np.complex128 if prec == "z" else np.complex64
    rng = np.random.default_rng(0)
    if pattern == "golden":
        # the golden plan's own geometry (1063 rows x 16 column clusters,
        # 0.26 grid fill -- the KKR-shaped case where the pairs engine's
        # column grouping pays): recover (row, col) labels, synthesize a
        # diagonally-dominant A on the recovered operator pattern
        from tfqmrgpu_tpu.ops.pairpanel import recover_geometry

        lm = ln = 32
        pair_a, pair_x, pair_y, nnzb_y, _, _ = load_pairs()
        row, col = recover_geometry(pair_a, pair_x, pair_y, nnzb_y)
        mb = int(row.max()) + 1
        ncols = int(col.max()) + 1
        au, first = np.unique(pair_a, return_index=True)
        ai, aj = row[pair_y[first]], row[pair_x[first]]
        # union with the diagonal so dominance is expressible
        keys = np.unique(np.concatenate(
            [ai * mb + aj, np.arange(mb) * mb + np.arange(mb)]))
        ar_, ac_ = keys // mb, keys % mb
        rowptr_a = np.searchsorted(ar_, np.arange(mb + 1)).astype(np.int32)
        colind_a = ac_.astype(np.int32)
        nnzb_a = len(keys)
        a_data = (rng.standard_normal((nnzb_a, lm, lm))
                  + 1j * rng.standard_normal((nnzb_a, lm, lm))
                  ).astype(cdt)
        deg = np.diff(rowptr_a)
        diag = np.flatnonzero(ar_ == ac_)
        for j in diag:
            a_data[j] += 4.0 * deg[ar_[j]] * lm * np.eye(lm)
        a = Bsr(mb, mb, rowptr_a, colind_a, a_data, name="A")
        xo = np.lexsort((col, row))
        rowptr_x = np.searchsorted(row[xo], np.arange(mb + 1)) \
            .astype(np.int32)
        x = Bsr(mb, ncols, rowptr_x, col[xo].astype(np.int32), name="X")
        # B: first X block of every column
        bsel = xo[np.unique(col[xo], return_index=True)[1]]
        brow, bcol = row[bsel], col[bsel]
        bo = np.lexsort((bcol, brow))
        rowptr_b = np.searchsorted(brow[bo], np.arange(mb + 1)) \
            .astype(np.int32)
        b_data = (rng.standard_normal((ncols, lm, ln))
                  + 1j * rng.standard_normal((ncols, lm, ln))
                  ).astype(cdt)
        b = Bsr(mb, ncols, rowptr_b, bcol[bo].astype(np.int32), b_data,
                name="B")
    else:
        mb, lm, ln, ncols, hb = 1000, 32, 32, 8, 5
        rows, cols = [0], []
        for i in range(mb):
            cs = list(range(max(0, i - hb), min(mb, i + hb + 1)))
            cols.extend(cs)
            rows.append(len(cols))
        rowptr_a = np.asarray(rows, np.int32)
        colind_a = np.asarray(cols, np.int32)
        nnzb_a = len(cols)
        a_data = (rng.standard_normal((nnzb_a, lm, lm))
                  + 1j * rng.standard_normal((nnzb_a, lm, lm))
                  ).astype(cdt)
        for i in range(mb):
            row = slice(rowptr_a[i], rowptr_a[i + 1])
            j = np.flatnonzero(colind_a[row] == i)[0] + rowptr_a[i]
            a_data[j] += 4.0 * (2 * hb + 1) * lm * np.eye(lm)
        a = Bsr(mb, mb, rowptr_a, colind_a, a_data, name="A")
        x = Bsr(mb, ncols, np.arange(mb + 1, dtype=np.int32) * ncols,
                np.tile(np.arange(ncols, dtype=np.int32), mb), name="X")
        rowptr_b = np.zeros(mb + 1, np.int32)
        rowptr_b[1: ncols + 1] = np.arange(1, ncols + 1)
        rowptr_b[ncols + 1:] = ncols
        b_data = (rng.standard_normal((ncols, lm, ln))
                  + 1j * rng.standard_normal((ncols, lm, ln))
                  ).astype(cdt)
        b = Bsr(mb, ncols, rowptr_b, np.arange(ncols, dtype=np.int32),
                b_data, name="B")

    def measure_solver(env):
        """Build under env overrides; measure differential ms/iteration
        ((t(40) - t(10)) / 30, min of 2, varied tolerances)."""
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            t0 = time.time()
            s = Solver(a, x, b, precision=prec, engine=engine, echo=3)
            log(f"# engine={s.engine} {env} built in {time.time()-t0:.1f}s")
            s.solve(tolerance=1e-30, max_iterations=10)  # compile + warm
            ts, tl = [], []
            for i in range(2):
                t0 = time.perf_counter()
                s.solve(tolerance=1e-30 * (1 + 1e-3 * i),
                        max_iterations=10)
                ts.append(time.perf_counter() - t0)
            for i in range(2):
                t0 = time.perf_counter()
                s.solve(tolerance=1e-30 * (1 + 1e-3 * (2 + i)),
                        max_iterations=40)
                tl.append(time.perf_counter() - t0)
            return s, (min(tl) - min(ts)) / 30
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    # the solver's iteration-cost model cannot reliably rank the
    # column-group candidates on irregular patterns (the multiply term
    # mispredicts at fine granularity -- r5: the model's G=2 pick
    # measured 9% SLOWER than G=8 on the golden pattern), so the
    # golden-pattern bench RACES the group sizes on MEASURED full
    # iterations and reports the winner; banded patterns keep the
    # single auto build (their engine is rowtile, no grouping).
    if pattern == "golden" and os.environ.get("TFQ_BENCH_ITER_RACE",
                                              "1") == "1":
        best = None
        for env in ({}, {"TFQ_PAIRS_COLGROUP": "8"},
                    {"TFQ_PAIRS_COLGROUP": "4"},
                    {"TFQ_PAIRS_COLGROUP": "4",
                     "TFQ_PAIRS_MM_PREC": "bf16x6"},
                    {"TFQ_PAIRS_COLGROUP": "2",
                     "TFQ_PAIRS_MM_PREC": "bf16x6"},
                    {"TFQ_PAIRS_COLGROUP": "1"}):
            try:
                s_, t_ = measure_solver(env)
            except Exception as e:
                log(f"# iter race {env} failed ({type(e).__name__})")
                continue
            log(f"# iter race {env}: {t_*1e3:.3f} ms/iter")
            if best is None or t_ < best[1]:
                best = (s_, t_)
        if best is None:
            raise RuntimeError("every iter-race candidate failed")
        solver, t_iter = best
    else:
        solver, t_iter = measure_solver({})
    roof = profiling.solver_roofline(solver, t_iter)
    log(f"# {roof}")
    frac = roof.fraction_of_light or 0.0
    print(json.dumps({
        "metric": f"iter_{'golden' if pattern == 'golden' else 'banded1000'}"
                  f"_lm{lm}_ln{ln}_{prec}",
        "value": round(t_iter * 1e3, 3),
        "unit": "ms_per_iteration",
        "vs_baseline": round(frac, 3),
        "engine": solver.engine,
        "n_pairs": int(solver.plan.n_pairs),
        "fraction_of_measured_roofline": round(frac, 3),
        "fraction_of_sheet_light": round(roof.fraction_of_sheet_light
                                         or 0.0, 3),
        "baseline_note": "vs_baseline = fraction of the residency-aware "
                         "roofline at the MEASURED-achievable bandwidth "
                         "(~250 GB/s; fusion-lower-bound vector passes, "
                         "ceiling majorizes, fractions <= 1); "
                         "fraction_of_sheet_light uses the 819 GB/s sheet "
                         "rate (absolute physical light)",
        "vectors_resident": bool(roof.vectors_resident),
    }))
    return 0


def main_rhs():
    """TFQ_BENCH_MODE=rhs: the many-RHS vectorization stress (BASELINE
    config 4: sparser-B-than-X patterns with many right-hand sides).  A
    banded operator with nCols block columns x LN lanes of RHS (B holds ONE
    block per column, ~3% of X's pattern); reports full-iteration
    throughput per RHS and the per-RHS scalar-state scaling."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tfqmrgpu_tpu import Solver, profiling
    from tfqmrgpu_tpu.bsr import Bsr

    engine = os.environ.get("TFQ_BENCH_ENGINE", "auto")
    mb = int(os.environ.get("TFQ_RHS_MB", "256"))
    lm = int(os.environ.get("TFQ_BENCH_LM", "16"))
    ln = int(os.environ.get("TFQ_BENCH_LN", "64"))
    ncols = int(os.environ.get("TFQ_RHS_NCOLS", "32"))
    hb = 4
    n_rhs = ncols * ln
    rng = np.random.default_rng(0)
    rows, cols = [0], []
    for i in range(mb):
        cs = list(range(max(0, i - hb), min(mb, i + hb + 1)))
        cols.extend(cs)
        rows.append(len(cols))
    rowptr_a = np.asarray(rows, np.int32)
    colind_a = np.asarray(cols, np.int32)
    nnzb_a = len(cols)
    a_data = (rng.standard_normal((nnzb_a, lm, lm))
              + 1j * rng.standard_normal((nnzb_a, lm, lm))
              ).astype(np.complex64)
    for i in range(mb):
        row = slice(rowptr_a[i], rowptr_a[i + 1])
        j = np.flatnonzero(colind_a[row] == i)[0] + rowptr_a[i]
        a_data[j] += 4.0 * (2 * hb + 1) * lm * np.eye(lm)
    a = Bsr(mb, mb, rowptr_a, colind_a, a_data, name="A")
    x = Bsr(mb, ncols, np.arange(mb + 1, dtype=np.int32) * ncols,
            np.tile(np.arange(ncols, dtype=np.int32), mb), name="X")
    # B: one block per column, scattered over rows -- B pattern is
    # 1/mb = ~0.4% of X's (the sparser-B stress)
    brow = (np.arange(ncols) * (mb // ncols)) % mb
    bo = np.argsort(brow, kind="stable")
    rowptr_b = np.searchsorted(brow[bo], np.arange(mb + 1)).astype(np.int32)
    b_data = (rng.standard_normal((ncols, lm, ln))
              + 1j * rng.standard_normal((ncols, lm, ln))
              ).astype(np.complex64)
    b = Bsr(mb, ncols, rowptr_b, np.arange(ncols, dtype=np.int32)[bo],
            b_data, name="B")

    t0 = time.time()
    solver = Solver(a, x, b, precision="c", engine=engine, echo=3)
    log(f"# engine={solver.engine} built in {time.time()-t0:.1f}s; "
        f"n_rhs={n_rhs} (cap 65536 per uint16 colindx)")
    solver.solve(tolerance=1e-30, max_iterations=8)     # compile + warm
    ts, tl = [], []
    for i in range(2):
        t0 = time.perf_counter()
        solver.solve(tolerance=1e-30 * (1 + 1e-3 * i), max_iterations=8)
        ts.append(time.perf_counter() - t0)
    for i in range(2):
        t0 = time.perf_counter()
        solver.solve(tolerance=1e-30 * (1 + 1e-3 * (2 + i)),
                     max_iterations=32)
        tl.append(time.perf_counter() - t0)
    t_iter = (min(tl) - min(ts)) / 24
    roof = profiling.solver_roofline(solver, t_iter)
    log(f"# {roof}")
    frac = roof.fraction_of_light or 0.0
    print(json.dumps({
        "metric": f"rhs_stress_mb{mb}_lm{lm}_ln{ln}_ncols{ncols}_c",
        "value": round(t_iter * 1e3, 3),
        "unit": "ms_per_iteration",
        "vs_baseline": round(frac, 3),
        "engine": solver.engine,
        "n_rhs": n_rhs,
        "ns_per_rhs_iteration": round(t_iter * 1e9 / n_rhs, 1),
        "fraction_of_measured_roofline": round(frac, 3),
        "fraction_of_sheet_light": round(roof.fraction_of_sheet_light
                                         or 0.0, 3),
        "baseline_note": "BASELINE config 4 (many-RHS batching stress); "
                         "vs_baseline = fraction of the residency-aware "
                         "roofline at measured-achievable bandwidth "
                         "(majorizes; fractions <= 1); sheet-light "
                         "fraction reported alongside",
        "vectors_resident": bool(roof.vectors_resident),
    }))
    return 0


def main():
    mode = os.environ.get("TFQ_BENCH_MODE", "spmm")
    if mode == "fd":
        return main_fd()
    if mode == "iter":
        return main_iter()
    if mode == "rhs":
        return main_rhs()
    lm = int(os.environ.get("TFQ_BENCH_LM", "32"))
    ln = int(os.environ.get("TFQ_BENCH_LN", "32"))
    prec = os.environ.get("TFQ_BENCH_PREC", "c")
    nrep = int(os.environ.get("TFQ_BENCH_NREP", "64"))
    r_tile = int(os.environ.get("TFQ_BENCH_RTILE", "1"))
    copy_g = int(os.environ.get("TFQ_BENCH_COPYG", "2"))
    t_step = int(os.environ.get("TFQ_BENCH_TSTEP", "16"))
    n_buckets = int(os.environ.get("TFQ_BENCH_BUCKETS", "1"))
    engine = os.environ.get("TFQ_BENCH_ENGINE", "auto")
    # 'bf16x4' (4 bf16 passes over round-to-nearest hi/lo operand splits)
    # passes the reference's 1e-4 gate at ~8e-5 on the golden workload;
    # 'highest' (exact fp32, 6 passes) gives ~3e-6 at ~20% less throughput.
    # 'auto' (default) measures bf16x4 against the gate and FALLS BACK
    # through bf16x6 to 'highest' whenever the measured maxdev crosses
    # 0.9x the gate (the single threshold, implemented below) -- the fast
    # mode's margin is workload-dependent, so it is verified per run,
    # never assumed; only the thinnest margins (>90% of gate) are refused.
    mm_prec = os.environ.get("TFQ_BENCH_MM_PREC", "auto")
    mm_auto = mm_prec == "auto"
    if mm_auto:
        mm_prec = "bf16x4"

    import jax

    # persistent compile cache: the pallas kernel + chain compiles are
    # expensive through the axon relay; cache them across runs
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    if prec == "z":
        jax.config.update("jax_enable_x64", True)
    npdt = np.float64 if prec == "z" else np.float32

    dev = jax.devices()[0]
    log(f"# device: {dev.platform} ({getattr(dev, 'device_kind', '?')})")

    pair_a, pair_x, pair_y, nnzb_y, nnzb_a, nnzb_x = load_pairs()
    n_pairs = pair_a.shape[0]
    flops_per_call = n_pairs * 8.0 * lm * lm * ln  # bench_tfqmrgpu.cu:335
    # tiny workloads (small LM under the superblock pre-pass runs the
    # fast merged engines at ~50 us/multiply) need LONG chains or the
    # differential timing (t_full - t_half) drowns in chain-granularity
    # noise -- r5: the (4,4) row printed an absurd TFlop/s at nrep=64.
    # Auto-scale the chain toward ~1e11 nominal flops unless the caller
    # pinned TFQ_BENCH_NREP.
    if not os.environ.get("TFQ_BENCH_NREP") and flops_per_call > 0:
        nrep = max(nrep, min(4096, int(1e11 / flops_per_call)))
    nrep = max(8, nrep - nrep % 8)     # chain bodies unroll 4 multiplies

    a_re, a_im = cos_sin_fill(nnzb_a, lm, lm, npdt)
    x_re, x_im = cos_sin_fill(nnzb_x, lm, ln, npdt)

    # ---- NumPy reference (the reference's OpenMP CPU check,
    #      bench_tfqmrgpu.cu:353-419)
    import hashlib, tempfile
    key = hashlib.sha256(np.concatenate([
        pair_a, pair_x, pair_y,
        [lm, ln, nnzb_a, nnzb_x, nnzb_y]]).tobytes()).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(), f"tfq_yref_{key}_{prec}.npy")
    if os.path.exists(cache):
        y_ref = np.load(cache)
        log(f"# reference Y loaded from {cache}")
    else:
        t0 = time.time()
        ac = a_re.astype(np.complex128) + 1j * a_im.astype(np.complex128)
        xc = x_re.astype(np.complex128) + 1j * x_im.astype(np.complex128)
        y_ref = np.zeros((nnzb_y, lm, ln), np.complex128)
        step = 8192
        for lo in range(0, pair_a.shape[0], step):
            hi = min(lo + step, pair_a.shape[0])
            prod = np.matmul(ac[pair_a[lo:hi]], xc[pair_x[lo:hi]])
            np.add.at(y_ref, pair_y[lo:hi], prod)
        log(f"# reference Y computed in {time.time()-t0:.1f}s")
        np.save(cache, y_ref)

    # ---- superblock pre-pass for small blocks (LM <= 8): merge f_row
    # block-rows (ops/superblock.py) -- and, when LN is narrow, f_col
    # columns via the existing pack_grouped lane transform -- so the 9
    # small reference sizes (allowed_block_sizes.h:4-18) run on the
    # measured-fast LM'=32-class engines instead of drowning an 8x128 MXU
    # tile (r02: 0.004-0.44 TFlop/s).  The reported TFlop/s stays the
    # FINE nominal flops (the merge's padded MACs are overhead, not
    # credit).  TFQ_BENCH_SUPER: auto (default, model-picked f_row),
    # 0 = off, N = force f_row N.
    super_tag = ""
    sup_rm = None
    sup_gp = None
    lm_fine, ln_fine = lm, ln
    sup_env = os.environ.get("TFQ_BENCH_SUPER", "auto")
    if sup_env != "0" and lm <= 8 and engine in ("auto", "super"):
        from tfqmrgpu_tpu.ops import pairpanel as ppx
        from tfqmrgpu_tpu.ops import superblock as sbx

        try:
            row_g, col_g = ppx.recover_geometry(pair_a, pair_x, pair_y,
                                                nnzb_y)
            cands = sorted({f for f in (16 // lm, 32 // lm) if f >= 2})
            if sup_env not in ("auto", ""):
                cands = [int(sup_env)]
            best = None
            for f in cands:
                lm2 = f * lm
                # lane widening to ln2 >= max(lm2, 32) first (grouping
                # verifies the full-intersection invariant on the fine
                # lists; the row merge then composes without re-check)
                fc = max(-(-lm2 // ln), -(-32 // ln))
                ncol_g = int(col_g.max()) + 1
                fc = min(fc, ncol_g)
                if ln * fc < lm2:
                    continue         # cannot reach LN' >= LM'
                gp_f = None
                if fc > 1:
                    gp_f = ppx.pack_grouped(pair_a, pair_x, pair_y,
                                            nnzb_y, ln, fc,
                                            row_of=row_g, col_of=col_g)
                if gp_f is not None:
                    rm_f = sbx.pack_rowmerge(
                        gp_f.pair_a2, gp_f.pair_x2, gp_f.pair_y2,
                        gp_f.nnzb2, lm, gp_f.ln2, f,
                        row_of=gp_f.row_of2, col_of=gp_f.col_of2,
                        verify=False)
                else:
                    if ln < lm2:
                        continue     # cannot reach LN' >= LM'
                    rm_f = sbx.pack_rowmerge(pair_a, pair_x, pair_y,
                                             nnzb_y, lm, ln, f,
                                             row_of=row_g, col_of=col_g)
                # cost model: merged MACs / measured engine rate at lm2
                # (ops/rates.py -- the shared measured table; rate 0.0
                # means the size was never measured -> ineligible for
                # AUTO routing, but a forced TFQ_BENCH_SUPER=N factor
                # must still go through)
                from tfqmrgpu_tpu.ops import rates as _rates
                rate = _rates.engine_rate(prec, lm2)
                if not rate:
                    if sup_env in ("auto", ""):
                        continue
                    rate = 1.0
                cost = rm_f.mac_inflation / rate
                if best is None or cost < best[0]:
                    best = (cost, f, gp_f, rm_f)
            if best is None:
                raise ValueError("no feasible superblock factor")
            _, sup_f, sup_gp, sup_rm = best
            # remap the WHOLE problem into merged space; the gate unmaps
            a_re = np.asarray(sbx.merge_a_blocks(sup_rm, a_re))
            a_im = np.asarray(sbx.merge_a_blocks(sup_rm, a_im))
            if sup_gp is not None:
                x_re = np.asarray(ppx.grouped_blocks(sup_gp, x_re))
                x_im = np.asarray(ppx.grouped_blocks(sup_gp, x_im))
            x_re = np.asarray(sbx.merge_xy_blocks(sup_rm, x_re))
            x_im = np.asarray(sbx.merge_xy_blocks(sup_rm, x_im))
            pair_a = sup_rm.pair_a2.astype(pair_a.dtype)
            pair_x = sup_rm.pair_x2.astype(pair_x.dtype)
            pair_y = sup_rm.pair_y2.astype(pair_y.dtype)
            nnzb_y = nnzb_x = sup_rm.n_cells
            nnzb_a = sup_rm.n_acells
            lm, ln = sup_rm.lm2, sup_rm.ln
            super_tag = (f"super{sup_f}x"
                         f"{sup_gp.group_size if sup_gp else 1}+")
            log(f"# superblock: ({lm_fine},{ln_fine}) -> ({lm},{ln}), "
                f"{sup_rm.n_in} blocks -> {sup_rm.n_cells} cells, "
                f"{len(pair_a)} pairs, MAC inflation "
                f"{sup_rm.mac_inflation:.2f}x")
        except ValueError as e:
            log(f"# superblock unavailable ({e}); running fine-grained")
            sup_rm = None
            sup_gp = None

    # solver-representative masking: a real solver integration must zero
    # the dead merged slots after EVERY multiply (junk products land
    # there); the timed chain does the same so the measured rate carries
    # that per-iteration elementwise cost (advisor r4)
    sup_mask_blocks = None
    if sup_rm is not None:
        from tfqmrgpu_tpu.ops import superblock as sbx

        sup_mask_blocks = sbx.merged_mask_full(sup_rm, sup_gp)

    def unmap_super_y(y_blocks):
        """Merged-space Y blocks -> fine blocks (gate comparison)."""
        if sup_rm is None:
            return y_blocks
        from tfqmrgpu_tpu.ops import pairpanel as ppx
        from tfqmrgpu_tpu.ops import superblock as sbx

        y = sbx.unmerge_xy_blocks(sup_rm, y_blocks)
        if sup_gp is not None:
            y = ppx.ungroup_blocks(sup_gp, y)
        return y

    # ---- pick the multiply implementation
    eng_used = engine
    pplan = None
    rowtile = None
    rt_cand = None
    gp = None
    oz_refine = None
    if engine in ("rowtile", "auto") and prec == "c":
        # ROW-TILE engine: recover the BSR geometry hidden in the pair list;
        # when X is (row x col)-grid-dense (FD patterns are: the golden plan
        # fills 97.7% of its 287x16 grid) the X panel fits VMEM whole, A
        # blocks stream ONCE for ALL RHS columns (the pair-panel layout
        # duplicates each A block per column), and the MXU contracts
        # full-union depth at grid-wide lanes.
        from tfqmrgpu_tpu.ops import pairpanel as ppg
        from tfqmrgpu_tpu.ops import pallas_spmm as rt

        g = rt.recover_grid(pair_a, pair_x, pair_y, nnzb_x)
        frag, colx = g.slot_of, g.col_of
        mbg, ncg = g.nslots, g.ncols
        nrg, cg = mbg * lm, ncg * ln
        density = nnzb_x / (mbg * ncg)
        fits = 2 * nrg * cg * 4 <= (90 << 20)
        if lm < 8:
            fits = False             # Mosaic sublane alignment (see below)
        if engine == "rowtile" and lm < 8:
            raise RuntimeError("rowtile engine needs lm >= 8 (sublane "
                               "alignment of dynamic row slices)")
        # the fragment grid is CORRECT at any density (cell injectivity
        # holds with one slot per fragment: a fragment lies within one
        # true block row, a column cluster within one true column, and
        # each A id maps to one (fy, fx) by the union construction).
        # Density only inflates the X/Y panels -- the MXU work per A
        # block (all grid columns on lanes) is density-INDEPENDENT -- so
        # a sparse-but-VMEM-fitting grid is still a legitimate engine:
        # dense grids take it outright, sparse ones RACE it against the
        # pairpanel candidates on device.
        min_dens = float(os.environ.get("TFQ_BENCH_RT_MINDENS", "0.15"))
        if engine == "rowtile" or (fits and density >= min_dens):
            t0 = time.time()
            order = g.a_order
            rt_rows = int(os.environ.get("TFQ_BENCH_ROWTILE",
                                         str(max(1, 128 // lm))))
            pack = rt.pack_row_tiles(g.rowptr, g.colind, mbg, lm, rt_rows)
            # device data: cos/sin regenerated on device from host
            # range-reduced phases (the host link is too slow for the
            # inflated PANELS; the blocks themselves are cheap) -- except
            # under the superblock remap, whose merged blocks carry
            # structural zeros the regeneration would destroy
            ord_j = jnp.asarray(order.astype(np.int32))
            if sup_rm is not None:
                ab_re = jnp.asarray(a_re.astype(np.float32))
                ab_im = jnp.asarray(a_im.astype(np.float32))
            else:
                phase = jnp.asarray(np.remainder(
                    np.arange(nnzb_a * lm * lm, dtype=np.float64),
                    2 * np.pi).astype(np.float32).reshape(nnzb_a, lm, lm))
                ab_re, ab_im = jnp.cos(phase), jnp.sin(phase)
            pan_re = rt.build_a_panels_device(pack, ab_re[ord_j])
            pan_im = rt.build_a_panels_device(pack, ab_im[ord_j])
            a_fused = jnp.concatenate([pan_re, pan_im], axis=1)
            fr_j = jnp.asarray(frag.astype(np.int32))
            cx_j = jnp.asarray(colx.astype(np.int32))

            def to_panel(blocks):
                g = jnp.zeros((mbg, ncg, lm, ln), jnp.float32)
                g = g.at[fr_j, cx_j].set(blocks)
                return g.transpose(0, 2, 1, 3).reshape(nrg, cg)

            if sup_rm is not None:
                xb_re = jnp.asarray(x_re.astype(np.float32))
                xb_im = jnp.asarray(x_im.astype(np.float32))
            else:
                phx = jnp.asarray(np.remainder(
                    np.arange(nnzb_x * lm * ln, dtype=np.float64),
                    2 * np.pi).astype(np.float32).reshape(nnzb_x, lm, ln))
                xb_re, xb_im = jnp.cos(phx), jnp.sin(phx)
            x0 = jnp.stack([to_panel(xb_re), to_panel(xb_im)])
            if sup_mask_blocks is not None:
                # fine-slot-resolution mask: dead merged row slots / group
                # lanes zero out, not just absent grid cells
                mk = np.zeros((mbg, ncg, lm, ln), np.float32)
                mk[frag, colx] = sup_mask_blocks
                maskpan = jnp.asarray(
                    mk.transpose(0, 2, 1, 3).reshape(nrg, cg)[None])
            else:
                maskpan = np.zeros((mbg, ncg), np.float32)
                maskpan[frag, colx] = 1.0
                maskpan = jnp.asarray(np.repeat(np.repeat(
                    maskpan, lm, 0), ln, 1)[None])
            interp = jax.default_backend() not in ("tpu",)
            # T tiles per grid step amortize the per-step fixed cost;
            # pad panels/xcols to whole steps (zero A panels -> 0)
            rt_T = rt.auto_t_step_rowtile(
                pack.ntiles, rt_rows * lm, pack.ku * lm,
                mm_prec in ("bf16x3", "bf16x4"), nr=nrg, c=cg)
            rt_nsteps = -(-pack.ntiles // rt_T)
            rt_pad = rt_nsteps * rt_T - pack.ntiles
            if rt_pad:
                a_fused = jnp.pad(a_fused, ((0, rt_pad), (0, 0), (0, 0)))
            xc_j = jnp.asarray(np.pad(pack.xcols,
                                      ((0, rt_pad), (0, 0))).reshape(-1))

            def rt_build_mult(prec_):
                call = rt._make_call(rt_nsteps, rt_rows * lm,
                                     pack.ku * lm, lm, nrg, cg, interp,
                                     prec_, t_step=rt_T)
                if prec_ in ("bf16x3", "bf16x4"):
                    a_args = ppg.split_bf16x2(a_fused)
                else:
                    a_args = (a_fused,)
                return call, (xc_j,) + tuple(a_args) + (maskpan,)

            mm_rt = "bf16x4" if mm_auto else mm_prec
            if mm_rt not in ("bf16x3", "bf16x4", "bf16x6", "highest"):
                mm_rt = "highest"
            mm_prec = mm_rt
            call_rt, rt_consts = rt_build_mult(mm_rt)
            rt_state = dict(pack=pack, call=call_rt, frag=frag, colx=colx,
                            rt_rows=rt_rows)

            def rt_multiply(c, x):
                xc_, *rest = c
                a_args, mp = rest[:-1], rest[-1]
                y_re, y_im = rt_state["call"](xc_, *a_args, x[0], x[1])
                y = jnp.stack([y_re.reshape(-1, cg)[:nrg],
                               y_im.reshape(-1, cg)[:nrg]])
                return y * mp

            def rt_y_to_x(y):
                return y

            rt_x0 = x0
            log(f"# rowtile pack: {time.time()-t0:.1f}s, grid {mbg}x{ncg} "
                f"density {density:.3f}, {pack.ntiles} tiles x {rt_rows} "
                f"rows, ku={pack.ku}, inflation {pack.inflation:.2f}x, "
                f"prec={mm_rt}, t_step={rt_T}")
            rt_cand = dict(
                gp=None, pplan=None, t_step=None, rowtile=rt_state,
                build_mult=rt_build_mult, multiply=rt_multiply,
                y_to_x=rt_y_to_x, x0=rt_x0, consts=rt_consts,
                eng_name=lambda prec_: f"rowtile-r{rt_rows}-t{rt_T}-"
                                       f"{prec_}")
            if engine == "rowtile" or density >= 0.6:
                # dense grid: the engine wins outright (measured r02)
                rowtile = rt_state
                multiply_c = rt_multiply
                y_to_x = rt_y_to_x
                consts = rt_consts
                build_mult = rt_build_mult
                eng_used = f"rowtile-r{rt_rows}-{mm_rt}"
            else:
                log("# rowtile grid is sparse; racing it against "
                    "pairpanel")
        elif engine == "rowtile":
            raise RuntimeError(
                f"rowtile engine needs lm >= 8 and VMEM-resident panels "
                f"(density {density:.2f}, fits={fits})")
        else:
            rt_cand = None
            log(f"# rowtile not applicable (density {density:.2f}, "
                f"fits={fits}); trying pairpanel")
    if rowtile is None and engine in ("pairpanel", "auto") and prec == "c":
        if mm_prec in ("bf16", "bf16x3", "bf16x4", "bf16x6") and lm < 16:
            # Mosaic cannot prove sublane alignment of lm-row dynamic
            # slices in the packed bf16 windows below 16 rows (measured:
            # lm=4 bf16x4 fails to compile; exact-f32 compiles for all lm)
            log(f"# lm={lm} < 16: bf16 pair-panel windows unavailable; "
                "using 'highest'")
            mm_prec = "highest"
        try:
            from tfqmrgpu_tpu.ops import pairpanel as pp

            # column grouping: dedup A streaming across RHS columns when
            # the pair list is a full pattern intersection (pack_grouped
            # verifies; see pairpanel.py).  TFQ_BENCH_COLGROUP: 0 = build
            # BOTH the model-picked grouped plan and the ungrouped plan
            # and RACE them on device (the post-pack model misjudges the
            # grouped kernel's t_step=1 window regime -- measured r02),
            # 1 = off, N = force group size N.
            colgroup = int(os.environ.get("TFQ_BENCH_COLGROUP", "0"))
            mm_eff = mm_prec if not mm_auto else "bf16x4"
            interp = jax.default_backend() not in ("tpu",)
            # build the A panels on device (the host link is far too slow
            # for the ~1 GB inflated panels); the cos/sin arguments must be
            # range-reduced on the HOST in float64 -- float32 argument
            # reduction at idx ~ 1e7 is meaningless
            if sup_rm is not None:
                # superblock remap: the merged blocks carry structural
                # zeros -- ship them as-is (30 MB-scale, fine)
                a_dev = (jnp.asarray(a_re.astype(np.float32)),
                         jnp.asarray(a_im.astype(np.float32)))
            else:
                phase = jnp.asarray(np.remainder(
                    np.arange(nnzb_a * lm * lm, dtype=np.float64),
                    2 * np.pi).astype(np.float32).reshape(nnzb_a, lm, lm))
                a_dev = (jnp.cos(phase), jnp.sin(phase))

            def build_candidate(spec):
                """spec: 'auto' (grouped, model-picked G), 1 (ungrouped),
                an explicit group size, or a tuple (G, cap_mb) forcing a
                raised VMEM cap (the wide-lane resident plans sit a few MB
                above the conservative 100 MB default; v5e carries 128).
                Returns the full engine bundle, or None when the spec
                resolves to a duplicate of the ungrouped candidate."""
                t0 = time.time()
                gp = None
                cap_mb = 0
                if isinstance(spec, tuple):
                    spec, cap_mb = spec
                if spec != 1:
                    row_g, col_g = pp.recover_geometry(pair_a, pair_x,
                                                       pair_y, nnzb_y)
                    if spec == "auto":
                        gbest, gests = pp.auto_group_size(
                            pair_a, pair_x, pair_y, nnzb_y, lm, ln,
                            mm_prec if not mm_auto else "highest",
                            row_of=row_g, col_of=col_g)
                        log("# colgroup model: " + " ".join(
                            f"G{g}={e['est_ms']:.2f}ms"
                            for g, e in sorted(gests.items())))
                    else:
                        gbest = spec
                    # feasibility vs the heavier exact-f32 kernel: the
                    # auto mode may fall back to it after the gate probe
                    gp, pplan = pp.pack_grouped_plan(
                        pair_a, pair_x, pair_y, nnzb_y, lm, ln, gbest,
                        "highest" if mm_auto else mm_prec,
                        row_of=row_g, col_of=col_g,
                        r_tile=r_tile, copy_g=copy_g,
                        force=(spec != "auto"),
                        vmem_cap=(cap_mb << 20) if cap_mb else 0)
                    if gp is not None:
                        log(f"# colgroup G={gp.group_size}: {nnzb_y} "
                            f"blocks -> {gp.nnzb2} cells, {n_pairs} "
                            f"pairs -> {len(gp.pair_a2)} (A dedup "
                            f"{n_pairs/len(gp.pair_a2):.2f}x), "
                            f"lanes={gp.ln2}")
                    elif spec == "auto":
                        log("# colgroup model prefers ungrouped")
                        return None
                else:
                    pplan = pp.pack_pair_plan(
                        pair_a, pair_x, pair_y, nnzb_y, nnzb_x, lm, ln,
                        r_tile=r_tile, copy_g=copy_g,
                        resident=os.environ.get("TFQ_PAIRS_RESIDENT",
                                                "auto"))
                if os.environ.get("TFQ_BENCH_TSTEP"):
                    t_step = int(os.environ["TFQ_BENCH_TSTEP"])
                else:
                    t_step = pp.auto_t_step(
                        pplan, mm_eff,
                        vmem_budget=(cap_mb << 20) if cap_mb else 0)
                if n_buckets > 1:
                    bplan = pp.bucketize(pplan, n_buckets=n_buckets)
                    panels = pp.build_a_panels_bucketed_device(
                        bplan, *a_dev)
                    [p.block_until_ready() for p in panels]

                    def build_mult(prec_):
                        return pp.BucketedMultiply(bplan, panels,
                                                   precision=prec_,
                                                   interpret=interp)

                    log(f"# pairpanel pack: {time.time()-t0:.1f}s, "
                        f"ntiles={pplan.ntiles} buckets="
                        f"{[int(k) for k in bplan.ku_b]} "
                        f"S={pplan.s_window} prec={mm_prec}")
                else:
                    panels = pp.build_a_panels_device(pplan, *a_dev)
                    panels.block_until_ready()

                    def build_mult(prec_, pplan=pplan, panels=panels,
                                   t_step=t_step, cap_mb=cap_mb):
                        # precision fallbacks change the X-window split
                        # factor (bf16x6 windows are 1.5x bf16x4's):
                        # re-derive t_step for the ACTUAL precision or
                        # the stale batching exceeds VMEM and the kernel
                        # collapses to the fixed-cost regime (r5: the
                        # (8,32) fallback ran 20x slower than its race)
                        ts = t_step
                        if not os.environ.get("TFQ_BENCH_TSTEP"):
                            ts = pp.auto_t_step(
                                pplan, prec_,
                                vmem_budget=(cap_mb << 20) if cap_mb
                                else 0)
                        return pp.make_pairpanel_multiply(
                            pplan, panels, precision=prec_,
                            interpret=interp, t_step=ts)

                    log(f"# pairpanel pack: {time.time()-t0:.1f}s, "
                        f"ntiles={pplan.ntiles} ku={pplan.ku} "
                        f"S={pplan.s_window} "
                        f"inflation={pplan.inflation:.2f}x prec={mm_prec} "
                        f"t_step={t_step}")
                mult2 = build_mult(mm_prec)
                nxrows = pplan.x_rows_padded
                nyrows = pplan.ntiles * r_tile * lm

                def multiply_c(c, x, mult2=mult2):
                    return mult2.apply(c, x)

                msk_j = None
                if sup_mask_blocks is not None:
                    if gp is not None:
                        mg = np.asarray(pp.grouped_blocks(
                            gp, sup_mask_blocks))
                        msk_j = jnp.asarray(pp.permute_x(pplan, mg, mg))
                    else:
                        msk_j = jnp.asarray(pp.permute_x(
                            pplan, sup_mask_blocks, sup_mask_blocks))

                def y_to_x(y, pad=nxrows - nyrows, m=msk_j):
                    """Feed Y (new-order fused rows) back as the next X
                    (dead merged slots re-zeroed under the superblock)."""
                    y = jnp.pad(y, ((0, pad), (0, 0)))
                    return y if m is None else y * m

                if gp is not None:
                    x0 = jnp.asarray(pp.permute_x(
                        pplan, np.asarray(pp.grouped_blocks(gp, x_re)),
                        np.asarray(pp.grouped_blocks(gp, x_im))))
                else:
                    x0 = jnp.asarray(pp.permute_x(pplan, x_re, x_im))

                def eng_name(prec_, t_step=t_step, gp=gp, pplan=pplan):
                    return (f"pairpanel-r{r_tile}-g{copy_g}-t{t_step}-"
                            f"b{n_buckets}"
                            + (f"-cg{gp.group_size}" if gp is not None
                               else "")
                            + ("-res" if pplan.resident else "")
                            + ("-tp" if pp.use_tile_pipe(pplan, prec_)
                               else "") + f"-{prec_}")

                return dict(gp=gp, pplan=pplan, t_step=t_step,
                            build_mult=build_mult, multiply=multiply_c,
                            y_to_x=y_to_x, x0=x0, consts=mult2.consts,
                            eng_name=eng_name)

            # race only where timing means something (the real TPU);
            # interpret-mode chains take minutes on CPU, and the pick
            # would be noise anyway.  Off-TPU the ungrouped plan is the
            # known-good default.
            race_ok = (not interp
                       or os.environ.get("TFQ_BENCH_RACE") == "1")
            if colgroup == 0:
                # the third candidate forces wide grouped lanes under a
                # raised VMEM cap (tile-pipelined resident kernel): the
                # conservative 100 MB default rejects it by a few MB, and
                # the per-step fixed cost it removes is worth racing
                specs = ["auto", 1, (8, 110)] if race_ok else [1]
            else:
                specs = [colgroup if colgroup > 1 else 1]
            cands = []
            for spec in specs:
                try:
                    c = build_candidate(spec)
                except ValueError as e:
                    log(f"# candidate {spec} unavailable ({e})")
                    c = None
                if c is not None:
                    cands.append(c)
            # a sparse-grid rowtile build joins the race (or rescues a
            # failed pairpanel pack outright)
            if rt_cand is not None and (race_ok or not cands):
                cands.append(rt_cand)
            if not cands:
                raise ValueError("no pairpanel candidate packs")

            # small merged workloads finish a multiply in ~0.2 ms, so an
            # 8-long race chain is DOMINATED by the ~26 ms dispatch
            # overhead and noise picks the engine (r5: the (8,8) race
            # flapped between winners).  Scale the chain so its compute
            # is several x the overhead; equal lengths keep it fair.
            race_n = max(8, min(256, int(5e9 / max(flops_per_call, 1.0))))
            race_n -= race_n % 4

            def race_time(c):
                """Equal-length chains compare fairly: the relay dispatch
                overhead is identical for every candidate."""

                @jax.jit
                def chain_r(cc, x):
                    def body4(_, x):
                        for _ in range(3):
                            x = c["y_to_x"](c["multiply"](cc, x))
                        y = c["multiply"](cc, x)
                        s = 1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
                        return c["y_to_x"](y * s)

                    x = jax.lax.fori_loop(0, race_n // 4, body4, x)
                    return x.reshape(-1)[0]

                _ = float(np.asarray(chain_r(c["consts"], c["x0"] * 1.003)))
                best = 1e30
                for i in range(2):
                    t0 = time.perf_counter()
                    _ = float(np.asarray(
                        chain_r(c["consts"], c["x0"] * (1.0 + 0.01 * i))))
                    best = min(best, time.perf_counter() - t0)
                return best

            if len(cands) > 1:
                times = []
                for c in cands:
                    try:
                        tt = race_time(c)
                    except Exception as e:  # e.g. Mosaic compile failure
                        log(f"# race {c['eng_name'](mm_prec)} failed to "
                            f"compile/run ({type(e).__name__}); dropped")
                        tt = float("inf")
                    times.append(tt)
                    if np.isfinite(tt):
                        log(f"# race {c['eng_name'](mm_prec)}: "
                            f"{tt*1e3:.1f} ms race chain")
                if not any(np.isfinite(t) for t in times):
                    raise ValueError("every race candidate failed")
                chosen = cands[int(np.argmin(times))]
            else:
                chosen = cands[0]
            gp, pplan, t_step = (chosen["gp"], chosen["pplan"],
                                 chosen["t_step"])
            rowtile = chosen.get("rowtile")
            multiply_c, y_to_x, x0 = (chosen["multiply"],
                                      chosen["y_to_x"], chosen["x0"])
            consts = chosen["consts"]

            def build_mult(prec_):
                return chosen["build_mult"](prec_)

            eng_used = chosen["eng_name"](mm_prec)
            if pplan is not None:
                nxrows = pplan.x_rows_padded
                nyrows = pplan.ntiles * r_tile * lm
        except ValueError as e:
            if engine == "pairpanel":
                raise
            log(f"# pairpanel unavailable ({e}); falling back to xla")
            pplan = None
    if (rowtile is None and pplan is None and prec == "z"
            and engine in ("pairpanel", "auto")):
        # f64-quality 'z' via the Ozaki slice kernel (ops/ozaki.py +
        # pairpanel 'oz' mode): exact bf16 MXU slice products, f64 combine
        # outside -- the TPU-native equivalent of the reference's
        # native-double gemmNxNf (tfqmrgpu.cu:40-45).  v5e has no f64
        # unit; the alternative below (xla engine) runs XLA's elementwise
        # f64 emulation, orders of magnitude slower.
        try:
            from tfqmrgpu_tpu.ops import pairpanel as pp

            interp = jax.default_backend() not in ("tpu",)
            # COLUMN GROUPING for the oz kernel (r3): at p~7 slice planes
            # the multiply is A-bytes-bound, so the grouped A dedup
            # (2-3x on the golden plan) carries straight through.  The
            # resident layout stays off (an xsplit=p resident window
            # cannot fit VMEM); plain windowed grouped packs only.
            # The oz AXES (r5: raced on device, not env-only levers):
            #   bits   -- significand coverage.  The bench's gate is
            #             1e-12; 47-bit slices pass it with a measured
            #             ~25x margin at fewer MXU passes and slice
            #             bytes; 53 is the strict-f64-parity switch.
            #   stride -- window stride factor k: replica traffic drops
            #             from 2x to (k+1)/k of the X panel.
            #   t_step -- tiles per grid step (fixed-cost amortization).
            #   cg     -- column grouping (0 = model-picked G, 1 = off).
            #   int8   -- raw-int A slice planes: at 47 bits the q=7
            #             point keeps p=7 (28 passes, same as q=8) with
            #             HALF the A bytes -- the A-bound kernel's
            #             biggest lever.
            # Each env knob (TFQ_OZ_BITS / TFQ_OZ_STRIDE / TFQ_BENCH_TSTEP
            # / TFQ_BENCH_COLGROUP / TFQ_OZC_INT8), when set, PINS that
            # axis for every candidate; unset axes race.
            env_bits = os.environ.get("TFQ_OZ_BITS")
            env_stride = os.environ.get("TFQ_OZ_STRIDE")
            env_tstep = os.environ.get("TFQ_BENCH_TSTEP")
            env_cg = os.environ.get("TFQ_BENCH_COLGROUP")
            env_int8 = os.environ.get("TFQ_OZC_INT8")

            def resolve_spec(bits, stride, tstep, cg, int8):
                """Apply the env pins; used to DEDUP before building --
                five pinned-identical candidates would otherwise all
                build and exhaust device memory."""
                return (int(env_bits) if env_bits else bits,
                        int(env_stride) if env_stride else stride,
                        int(env_tstep) if env_tstep else tstep,
                        int(env_cg) if env_cg is not None else cg,
                        env_int8 if env_int8 is not None else int8)

            def build_oz(bits, stride, tstep, cg, int8):
                """One oz engine bundle (spec already env-resolved).
                int8 '3' = the xi8 layout with a RESIDENT X panel (the
                int8 slice window fits VMEM whole: no replica build, one
                panel DMA per multiply)."""
                t0 = time.time()
                res = int8 == "3"
                gp_ = None
                want = cg
                if want != 1:
                    try:
                        if want == 0:
                            want, _ = pp.auto_group_size(
                                pair_a, pair_x, pair_y, nnzb_x, lm,
                                ln, pp.oz_mode_params(16 * lm, bits,
                                                      int8=int8)[0],
                                candidates=tuple(
                                    gg for gg in (1, 2, 4, 8)
                                    if gg * ln <= 256))
                        if want > 1:
                            gp_ = pp.pack_grouped(pair_a, pair_x,
                                                  pair_y, nnzb_x,
                                                  ln, want)
                    except ValueError:
                        gp_ = None
                while gp_ is not None:
                    pplan_ = pp.pack_pair_plan(
                        gp_.pair_a2, gp_.pair_x2, gp_.pair_y2,
                        gp_.nnzb2, gp_.nnzb2, lm, gp_.ln2,
                        r_tile=r_tile, copy_g=copy_g,
                        row_of=gp_.row_of2, col_of=gp_.col_of2,
                        resident="1" if res else False,
                        stride_factor=stride)
                    tag_chk, _, _ = pp.oz_mode_params(
                        pplan_.ku * lm, bits, int8=int8)
                    cap_mb = int(os.environ.get("TFQ_PAIRS_VMEM_CAP",
                                                "100"))
                    if res or pp.plan_fits_vmem(pplan_, tag_chk,
                                                cap=cap_mb << 20):
                        # resident xi8 prices its own (int8) window
                        # inside make_pairpanel_multiply_oz
                        break
                    # walk the group size down before giving up: a
                    # VMEM-rejected G=4 often fits (and still wins
                    # the A dedup) at G=2
                    nxt = gp_.group_size // 2
                    log(f"# oz colgroup G={gp_.group_size} exceeds "
                        f"VMEM; trying G={nxt if nxt > 1 else 0}")
                    gp_ = None
                    if nxt > 1:
                        try:
                            gp_ = pp.pack_grouped(pair_a, pair_x,
                                                  pair_y, nnzb_x,
                                                  ln, nxt)
                        except ValueError:
                            gp_ = None
                if gp_ is None:
                    pplan_ = pp.pack_pair_plan(
                        pair_a, pair_x, pair_y, nnzb_y, nnzb_x, lm,
                        ln, r_tile=r_tile, copy_g=copy_g,
                        resident="1" if res else False,
                        stride_factor=stride)
                tag_oz, _, _ = pp.oz_mode_params(pplan_.ku * lm, bits,
                                                 int8=int8)
                ts = tstep or pp.auto_t_step(pplan_, tag_oz)
                mult_ = pp.make_pairpanel_multiply_oz(
                    pplan_, a_re, a_im, interpret=interp, t_step=ts,
                    bits=bits, int8=int8)
                i8 = any(getattr(c, "dtype", None) == jnp.int8
                         for c in mult_.consts)
                tag8 = ("xi8" if getattr(mult_, "xi8", False)
                        else "i8" if i8 else "")
                log(f"# oz pack b{bits}s{stride}t{ts}"
                    f"cg{gp_.group_size if gp_ else 1}{tag8}: "
                    f"{time.time()-t0:.1f}s, "
                    f"ntiles={pplan_.ntiles} ku={pplan_.ku} "
                    f"p={mult_.p} q={mult_.q}")

                def mult_c(c, x, m=mult_):
                    return m.apply(c, x)

                nxr = pplan_.x_rows_padded
                nyr = pplan_.ntiles * r_tile * lm
                msk = None
                if sup_mask_blocks is not None:
                    if gp_ is not None:
                        mg = np.asarray(pp.grouped_blocks(
                            gp_, sup_mask_blocks))
                        msk = jnp.asarray(pp.permute_x(pplan_, mg, mg))
                    else:
                        msk = jnp.asarray(pp.permute_x(
                            pplan_, sup_mask_blocks, sup_mask_blocks))

                def ytx(y, pad=nxr - nyr, m=msk):
                    y = jnp.pad(y, ((0, pad), (0, 0)))
                    return y if m is None else y * m

                if gp_ is not None:
                    x0_ = jnp.asarray(pp.permute_x(
                        pplan_, np.asarray(pp.grouped_blocks(gp_, x_re)),
                        np.asarray(pp.grouped_blocks(gp_, x_im))))
                else:
                    x0_ = jnp.asarray(pp.permute_x(pplan_, x_re, x_im))
                name = (f"pairpanel-{'ozc' if mult_.comp else 'oz'}"
                        f"{mult_.p}q{mult_.q}{tag8}-"
                        f"b{bits}-r{r_tile}-g{copy_g}-t{ts}-s{stride}"
                        + (f"-cg{gp_.group_size}" if gp_ is not None
                           else "")
                        + ("-res" if pplan_.resident else ""))
                return dict(gp=gp_, pplan=pplan_, t_step=ts,
                            multiply=mult_c, y_to_x=ytx, x0=x0_,
                            consts=mult_.consts,
                            eng_name=lambda prec_=None, n=name: n,
                            spec=(bits, stride, tstep, cg, int8))

            # default race set: the shipped default must match the best
            # committed lever row without env knobs (VERDICT r4 #6) --
            # 47-bit/stride-3/t8 with AND without grouping (the r4 lever
            # run never tried the cg combination), the strict 53-bit
            # parity point, and the int8-plane layout candidate
            specs = [(47, 2, 8, 0, "2"), (47, 1, 8, 0, "3"),
                     (47, 3, 8, 0, "1"), (47, 3, 8, 0, "0"),
                     (47, 3, 8, 1, "0"), (53, 1, 0, 0, "0")]
            race_ok = (not interp
                       or os.environ.get("TFQ_BENCH_RACE") == "1")
            if not race_ok:
                specs = specs[:1]
            rspecs = []
            for spec in specs:
                rs = resolve_spec(*spec)
                if rs not in rspecs:        # env pins collapse the axes
                    rspecs.append(rs)

            def race_time_oz(c):
                @jax.jit
                def chain8(cc, x):
                    def body4(_, x):
                        for _ in range(3):
                            x = c["y_to_x"](c["multiply"](cc, x))
                        y = c["multiply"](cc, x)
                        s = 1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
                        return c["y_to_x"](y * s)

                    x = jax.lax.fori_loop(0, 2, body4, x)
                    return x.reshape(-1)[0]

                _ = float(np.asarray(chain8(c["consts"], c["x0"] * 1.003)))
                best = 1e30
                for i in range(2):
                    t0 = time.perf_counter()
                    _ = float(np.asarray(
                        chain8(c["consts"], c["x0"] * (1.0 + 0.01 * i))))
                    best = min(best, time.perf_counter() - t0)
                return best

            # STREAMING race: build -> time -> keep only the best-so-far
            # (a full candidate holds GB-scale device planes; keeping all
            # five alive OOMs the chip when env pins make them heavy)
            chosen = None
            best_tt = float("inf")
            for rs in rspecs:
                try:
                    c = build_oz(*rs)
                except ValueError as e:
                    log(f"# oz candidate {rs} unavailable ({e})")
                    continue
                if len(rspecs) == 1:
                    chosen = c
                    break
                try:
                    tt = race_time_oz(c)
                except Exception as e:
                    log(f"# oz race {c['eng_name']()} failed "
                        f"({type(e).__name__}); dropped")
                    del c
                    continue
                log(f"# oz race {c['eng_name']()}: "
                    f"{tt*1e3:.1f} ms race chain")
                if tt < best_tt:
                    chosen, best_tt = c, tt
                else:
                    del c               # free the loser's device planes
            if chosen is None:
                raise ValueError("every oz candidate failed")
            gp, pplan, t_step = (chosen["gp"], chosen["pplan"],
                                 chosen["t_step"])
            multiply_c, y_to_x, x0 = (chosen["multiply"],
                                      chosen["y_to_x"], chosen["x0"])
            consts = chosen["consts"]
            eng_used = chosen["eng_name"]()

            def oz_refine(_unused, spec=chosen["spec"]):
                # gate-fallback hook: same schedule at strict 53 bits.
                # t_step re-derives for the larger 53-bit windows unless
                # the user pinned it (the stale-batching trap the 'c'
                # fallback fix documents in build_mult).  A resident
                # ('3') winner may not fit at 53 bits (p grows 7 -> 8);
                # degrade to the windowed xi8 layout instead of dying.
                ts = spec[2] if env_tstep else 0
                try:
                    return build_oz(53, spec[1], ts, spec[3], spec[4])
                except ValueError:
                    if spec[4] != "3":
                        raise
                    return build_oz(53, spec[1], ts, spec[3], "2")
        except ValueError as e:
            if engine == "pairpanel":
                raise
            log(f"# pairpanel-oz unavailable ({e}); falling back to xla")
            pplan = None
    if rowtile is None and pplan is None:
        from tfqmrgpu_tpu.ops.blocksparse import spmm_pairs

        pa = jnp.asarray(pair_a.astype(np.int32))
        px = jnp.asarray(pair_x.astype(np.int32))
        py = jnp.asarray(pair_y.astype(np.int32))
        a = (jnp.asarray(a_re), jnp.asarray(a_im))

        consts = (a[0], a[1], pa, px, py)

        def multiply_c(c, x):
            ar, ai, pa_, px_, py_ = c
            yr, yi = spmm_pairs((ar, ai), (x[..., 0], x[..., 1]),
                                pa_, px_, py_, nnzb_y)
            return jnp.stack([yr, yi], axis=-1)

        if sup_mask_blocks is not None:
            msk_xla = jnp.asarray(sup_mask_blocks)[..., None]

            def y_to_x(y):
                return y * msk_xla
        else:
            def y_to_x(y):
                return y

        x0 = jnp.stack([jnp.asarray(x_re), jnp.asarray(x_im)], axis=-1)
        eng_used = "xla"

    # ---- correctness gate (maxdev <= 1e-4, bench_tfqmrgpu.cu:414)
    def run_gate():
        t0 = time.time()
        mj = jax.jit(multiply_c)
        yh = np.asarray(mj(consts, x0))
        log(f"# first multiply (compile+run): {time.time()-t0:.1f}s")
        if rowtile is not None:
            frag_, colx_ = rowtile["frag"], rowtile["colx"]
            pan = yh[0] + 1j * yh[1]
            pan = pan.reshape(mbg, lm, ncg, ln).transpose(0, 2, 1, 3)
            y_got = pan[frag_, colx_]
        elif pplan is not None:
            ybr, ybi = pp.unpermute_y(pplan, yh)
            if gp is not None:
                ybr = pp.ungroup_blocks(gp, ybr)
                ybi = pp.ungroup_blocks(gp, ybi)
            y_got = ybr + 1j * ybi
        else:
            y_got = yh[..., 0] + 1j * yh[..., 1]
        y_got = unmap_super_y(y_got)
        scale = max(np.max(np.abs(y_ref)), 1e-300)
        return float(np.max(np.abs(y_got - y_ref)) / scale)

    gate = 1e-4 if prec == "c" else 1e-12
    maxdev = run_gate()
    log(f"# correctness: maxdev={maxdev:.3e} (gate {gate})")
    fell_back_from = None
    # mirrors the reference's -DSKIP_CORRECTNESS_CHECK
    # (bench_tfqmrgpu.cu:350).  Ablation runs (TFQ_PP_NO_DOT etc.)
    # produce garbage on purpose; the skip must disarm the gate BEFORE
    # the precision fallback chains, or they rebuild a different
    # configuration than the one being floored
    if os.environ.get("TFQ_BENCH_SKIP_CHECK") == "1":
        maxdev, gate = 0.0, 1.0
    # auto precision: fall back when the fast mode's measured error crosses
    # 90% of the gate.  The probe measures the TRUE deviation of this exact
    # workload (the bf16-split error is deterministic, BLOCKSIZES_r02.json),
    # so a measured pass is a real pass -- only refuse the thinnest margin.
    # Fallback chain (pairpanel AND rowtile): bf16x4 -> bf16x6 (3-way
    # splits, exact-f32 quality at the same streamed A bytes) -> highest.
    if mm_auto and prec == "c" and (rowtile is not None
                                    or (pplan is not None
                                        and n_buckets <= 1)):
        chain = ["highest"] if lm < 16 else ["bf16x6", "highest"]
        while maxdev > 0.9 * gate and chain:
            nxt = chain.pop(0)
            log(f"# {mm_prec} margin too thin (maxdev {maxdev:.3e} > "
                f"{0.9*gate:.1e}); falling back to {nxt!r}")
            if fell_back_from is None:
                fell_back_from = maxdev
            mm_prec = nxt
            if rowtile is not None:
                rowtile["call"], consts = build_mult(nxt)
                eng_used = f"rowtile-r{rowtile['rt_rows']}-{mm_prec}"
            else:
                mult2 = build_mult(nxt)
                consts = mult2.consts

                def multiply_c(c, x, mult2=mult2):
                    return mult2.apply(c, x)

                eng_used = chosen["eng_name"](nxt)
            maxdev = run_gate()
            log(f"# correctness ({nxt}): maxdev={maxdev:.3e}")
    # z margin fallback: the race's 47-bit winner must still PASS the
    # 1e-12 gate on this workload; if its measured deviation crosses 90%
    # of the gate, rebuild the same schedule at the strict 53-bit parity
    # point and re-gate (mirrors the 'c' mm_auto chain above)
    if (prec == "z" and oz_refine is not None and maxdev > 0.9 * gate
            and "-b53-" not in eng_used):
        log(f"# oz margin too thin (maxdev {maxdev:.3e} > "
            f"{0.9*gate:.1e}); rebuilding at 53 bits")
        fell_back_from = maxdev
        c53 = oz_refine(None)
        gp, pplan, t_step = c53["gp"], c53["pplan"], c53["t_step"]
        multiply_c, y_to_x, x0 = (c53["multiply"], c53["y_to_x"],
                                  c53["x0"])
        consts = c53["consts"]
        eng_used = c53["eng_name"]()
        maxdev = run_gate()
        log(f"# correctness (53-bit): maxdev={maxdev:.3e}")
    if maxdev > gate:
        print(json.dumps({"metric": "spmm_correctness_FAILED",
                          "value": maxdev, "unit": "maxdev",
                          "vs_baseline": 0.0}))
        return 1

    # ---- timed loop: chain multiplies in ONE jit call and time TWO chain
    # lengths (nrep and nrep//2): the difference cancels the per-dispatch
    # overhead of the TPU relay (~30 ms) exactly -- the reference times
    # bare kernel launches (bench_tfqmrgpu.cu:329-341), so the honest
    # equivalent is the marginal cost of one more multiply
    # the chain feeds Y back as X to defeat relay memoization; the
    # renormalization only keeps magnitudes bounded for the HARNESS (the
    # reference's loop times bare gemm launches with no feedback at all,
    # bench_tfqmrgpu.cu:329-341).  A full max+scale pass over the f64 Y
    # every step costs ~1 ms/multiply on the 'z' rows (profiled r5);
    # a statically unrolled 4-multiply body renormalizes ONCE per group
    # (growth ~(K·|a||x|)^4 ~ 1e10 between renorms -- far inside f32 and
    # f64 range) at a quarter of the harness cost.  (A lax.cond variant
    # measured WORSE: the cond boundary breaks loop-body fusion.)
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(c, x, n):
        def body4(_, x):
            for _ in range(3):
                x = y_to_x(multiply_c(c, x))
            y = multiply_c(c, x)
            s = 1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return y_to_x(y * s)

        x = jax.lax.fori_loop(0, n // 4, body4, x)
        return x.reshape(-1)[0]

    # the relay memoizes identical dispatches and completes asynchronously:
    # time with VARIED inputs and a host readback of a data-dependent scalar
    half = max(nrep // 2, 1)
    xs = [x0 * (1.0 + 0.01 * i) for i in range(5)]
    _ = float(np.asarray(chain(consts, xs[4], nrep)))   # compile + warm
    _ = float(np.asarray(chain(consts, xs[3], half)))
    t_full = t_half = 1e30
    for i in range(2):
        t0 = time.perf_counter()
        _ = float(np.asarray(chain(consts, xs[i], nrep)))
        t_full = min(t_full, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = float(np.asarray(chain(consts, xs[2 + i], half)))
        t_half = min(t_half, time.perf_counter() - t0)
    best = max(t_full - t_half, 1e-9)       # time of (nrep - half) multiplies
    n_eff = nrep - half
    log(f"# chain timing: {nrep} in {t_full*1e3:.1f} ms, {half} in "
        f"{t_half*1e3:.1f} ms -> dispatch overhead "
        f"{(t_half - best * half / max(n_eff, 1))*1e3:.1f} ms cancelled")
    tflops = flops_per_call * n_eff / best / 1e12
    nnz_per_s = n_pairs * lm_fine * lm_fine * ln_fine * n_eff / best
    nrep = n_eff                                  # for the reports below

    log(f"# {nrep} multiplies in {best*1e3:.1f} ms -> {tflops:.2f} TFlop/s "
        f"({eng_used}, {prec}, LM={lm}, LN={ln})")
    print(json.dumps({
        "metric": f"spmm_plan_unordered_lm{lm_fine}_ln{ln_fine}_{prec}",
        "value": round(tflops, 3),
        "unit": "TFlop/s",
        "vs_baseline": round(tflops / BASELINE_TFLOPS, 3),
        "engine": super_tag + eng_used,
        "maxdev": maxdev,
        "nnz_mac_per_s": nnz_per_s,
        "n_pairs": int(n_pairs),
        "ms_per_multiply": best * 1e3 / nrep,
        **({"mm_fallback_from_maxdev": fell_back_from}
           if fell_back_from is not None else {}),
        # explicit apples-to-oranges label: the anchor is the reference's
        # DOUBLE-precision V100 number (bench_tfqmrgpu.cu:319); this run is
        # accuracy-gated complex64 on TPU (f64 matmul is software-emulated
        # on TPU -- see BENCH_fd artifacts for the f64-residual story)
        "baseline_note": f"vs 4.3 TFlop/s f64 V100 anchor; this={prec} "
                         f"gated maxdev<={gate:g}",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
