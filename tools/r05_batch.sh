#!/bin/bash
# r05 TPU measurement batch (VERDICT r4 ask #1: commit the evidence).
# Writes /tmp/r05_*.json; collate with tools/collect_r05.py afterwards.
# Run from the repo root on the axon TPU host.  Each run is independent;
# a failure (nonzero exit on capped FD rows is EXPECTED) does not stop
# the batch.
set -u
cd "$(dirname "$0")/.."
R=/tmp
run() {  # run <outfile> <env...>
  out=$1; shift
  echo "=== $out : $* ==="
  env "$@" timeout 3600 python bench.py > "$R/$out" 2> "$R/${out%.json}.log"
  echo "    exit=$? $(tail -c 300 "$R/$out")"
}

# ---- golden 'z': shipped default (races the oz axes on device)
run r05_z_default.json TFQ_BENCH_PREC=z

# ---- golden 'z': pinned single-config rows (lever attribution)
run r05_z_b53.json    TFQ_BENCH_PREC=z TFQ_OZ_BITS=53 TFQ_OZ_STRIDE=1 TFQ_OZC_INT8=0
run r05_z_b47i8.json  TFQ_BENCH_PREC=z TFQ_OZ_BITS=47 TFQ_OZ_STRIDE=3 TFQ_BENCH_TSTEP=8 TFQ_OZC_INT8=1
run r05_z_b47bf.json  TFQ_BENCH_PREC=z TFQ_OZ_BITS=47 TFQ_OZ_STRIDE=3 TFQ_BENCH_TSTEP=8 TFQ_OZC_INT8=0

# ---- golden 'c': the driver's own row (auto)
run r05_c_auto.json   TFQ_BENCH_PREC=c

# ---- measured DMA/XLA floors of the 'z' layouts (VERDICT r4 ask #4:
# bound analysis).  TFQ_PP_NO_DOT skips the MXU/fold work, leaving the
# A-panel DMA + X staging + the XLA-side prologue/epilogue -- the
# layout's hard floor; results are garbage so the gate is skipped.
run r05_floor_xi8res.json  TFQ_BENCH_PREC=z TFQ_OZ_BITS=47 TFQ_OZ_STRIDE=1 TFQ_BENCH_TSTEP=8 TFQ_OZC_INT8=3 TFQ_BENCH_COLGROUP=2 TFQ_PP_NO_DOT=1 TFQ_BENCH_SKIP_CHECK=1
run r05_floor_xi8win.json   TFQ_BENCH_PREC=z TFQ_OZ_BITS=47 TFQ_OZ_STRIDE=3 TFQ_BENCH_TSTEP=8 TFQ_OZC_INT8=2 TFQ_BENCH_COLGROUP=2 TFQ_PP_NO_DOT=1 TFQ_BENCH_SKIP_CHECK=1

# ---- superblock rows: all 9 small reference sizes
# (allowed_block_sizes.h:4-18), 'c' gate 1e-4
for sz in 4,4 4,5 4,8 4,32 8,8 8,9 8,10 8,32 8,64; do
  IFS=, read lm ln <<< "$sz"
  run "r05_bs_${lm}_${ln}.json" TFQ_BENCH_PREC=c TFQ_BENCH_LM=$lm TFQ_BENCH_LN=$ln
done
# the 'z' superblock point at the FD geometry (LM=LN=8)
run r05_bs_8_8_z.json TFQ_BENCH_PREC=z TFQ_BENCH_LM=8 TFQ_BENCH_LN=8

# ---- full-iteration rows
run r05_iter_golden.json TFQ_BENCH_MODE=iter TFQ_BENCH_ITER_PATTERN=golden
run r05_iter_banded.json TFQ_BENCH_MODE=iter
run r05_rhs.json         TFQ_BENCH_MODE=rhs

# ---- FD full solves at the reference cap (2000); superblock solver path
for rtb in 6.75 9.75 12.75; do
  run "r05_fd_z_${rtb}.json" TFQ_BENCH_MODE=fd TFQ_BENCH_PREC=z TFQ_FD_RTB=$rtb
done
run r05_fd_m_6.75.json TFQ_BENCH_MODE=fd TFQ_BENCH_PREC=m TFQ_FD_RTB=6.75
run r05_fd_c_6.75.json TFQ_BENCH_MODE=fd TFQ_BENCH_PREC=c TFQ_FD_RTB=6.75

echo "batch done; now: python tools/collect_r05.py"
