"""Measured golden-plan engine rates -- the ONE source for the
superblock routing cost model (used by ops/superblock.auto_f_row, the
bench driver's superblock pre-pass, and the solver's superblock
composition).

The reference hardwires a per-(LM, LN) TUNE table measured on V100
(bench_tfqmrgpu.cu:529-547).  The TPU equivalent is this per-merged-LM
TFlop/s table measured on the golden plan_unordered.14-287-16 workload
(v5e, committed artifacts): routing picks the merge factor minimizing
MAC-inflation / rate.  Values refresh whenever a blocksize sweep is
collected (tools/collect_r05.py); a stale table only mis-ROUTES (the
result stays exact), so approximate rates are acceptable.

Provenance: 'c' rates from BLOCKSIZES_r03.json (exact-f32-quality modes);
'z' rates from the r5 golden runs (BENCH_spmm_r05.json).
"""

from __future__ import annotations

# gate-passing TFlop/s of the fine-grained engines at block edge LM on the
# golden plan -- the rate a merged problem at LM' = lm2 runs at
ENGINE_TFLOPS = {
    "c": {16: 2.0, 32: 8.1, 64: 7.0},
    "z": {16: 0.35, 32: 1.77, 64: 1.0},
}

# rates of the small sizes WITHOUT merging (the do-nothing baseline the
# cost model must beat): measured r02 small-lm runs
BASE_TFLOPS = {
    "c": {4: 0.05, 8: 0.3},
    "z": {4: 0.02, 8: 0.1},
}


def engine_rate(precision: str, lm2: int) -> float:
    """Measured engine TFlop/s at merged block edge ``lm2`` (0.0 when the
    size was never measured -- callers treat that as ineligible)."""
    return ENGINE_TFLOPS.get(precision, ENGINE_TFLOPS["c"]).get(lm2, 0.0)


def base_rate(precision: str, lm: int) -> float:
    """Measured unmerged rate at fine block edge ``lm`` (pessimistic
    default for unmeasured sizes)."""
    t = BASE_TFLOPS.get(precision, BASE_TFLOPS["c"])
    return t.get(lm, min(t.values()))
