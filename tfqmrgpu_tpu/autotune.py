"""Runtime autotuning -- the TPU replacement for the reference's
compile-time block-size registry.

The reference enumerates 15 (LM, LN) template instantiations plus a
hand-made TUNE table per block size (reference: allowed_block_sizes.h,
bench_tfqmrgpu.cu:529-547 "extracted from comparison of TUNE={1,2,3,4,6,8}").
Here block shapes are traced jit parameters, so ANY (LM, LN) compiles; what
remains tunable at runtime is the ENGINE (dense / pairs / xla) and the
pair-panel tile factor ``r_tile``.  ``autotune_solver`` measures candidate
configurations on the actual problem (one timed solve each, correctness
implied by the shared algorithm) and returns the fastest Solver.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from .bsr import Bsr
from .solver import Solver


def _time_solve(solver, tolerance, max_iterations, repeats=2) -> float:
    solver.solve(tolerance=tolerance, max_iterations=max_iterations)
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        solver.solve(tolerance=tolerance, max_iterations=max_iterations)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def autotune_solver(a: Bsr, x: Bsr, b: Bsr, *, precision: str = "c",
                    tolerance: float = 1e-5, max_iterations: int = 200,
                    candidates: Optional[list] = None,
                    echo: int = 0):
    """Measure candidate engine configurations; return (best_solver, table).

    candidates: list of (engine, env) pairs; default scans dense, pairs at
    r_tile 1/2/4, and xla.  'z' precision restricts to dense/xla (no f64
    MXU path).
    """
    if candidates is None:
        if precision == "z":
            candidates = [("dense", {}), ("xla", {})]
        else:
            candidates = [("dense", {}),
                          ("pairs", {"TFQ_PAIRS_RTILE": "1"}),
                          ("pairs", {"TFQ_PAIRS_RTILE": "2"}),
                          ("pairs", {"TFQ_PAIRS_RTILE": "4"}),
                          ("xla", {})]
    table = []
    best = None
    for engine, env in candidates:
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            s = Solver(a, x, b, precision=precision, engine=engine,
                       echo=echo)
            dt = _time_solve(s, tolerance, max_iterations)
            row = dict(engine=engine, env=dict(env), wall_s=dt)
            table.append(row)
            if echo > 0:
                print(f"# autotune: {engine} {env} -> {dt*1e3:.1f} ms")
            if best is None or dt < best[1]:
                best = (s, dt, row)
        except Exception as e:            # engine not applicable
            table.append(dict(engine=engine, env=dict(env),
                              error=f"{type(e).__name__}: {e}"))
            if echo > 0:
                print(f"# autotune: {engine} {env} unavailable ({e})")
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    if best is None:
        raise RuntimeError("no engine configuration succeeded")
    return best[0], table
