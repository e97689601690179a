#!/bin/bash
# Tile-pipelined wide-group candidates + the pending bf16x6/Ozaki evidence.
# One job at a time on the single relay chip; all subprocesses share the
# persistent compile cache.
#
#  1. golden SpMM, default race (now includes g4/g8 resident tile-pipe
#     candidates vs the g2/ungrouped champions and the rowtile build)
#  2. golden SpMM, explicit bf16x6 and auto-precision chain
#  3. golden SpMM, PREC=z via the pairpanel Ozaki kernel (gate 1e-12)
#  4. FD full solve, z (dense engine routes f64 through ozaki)
#  5. blocksize rows where bf16x4 gate-failed, with bf16x6
#  6. golden-pattern full-iteration artifact with the bf16x6 multiply
set -x
cd /root/repo
TFQ_BENCH_MM_PREC=highest TFQ_BENCH_NREP=32 timeout 3600 python bench.py \
  > /tmp/g_hi_tp.json 2>/tmp/g_hi_tp.log
TFQ_BENCH_MM_PREC=bf16x6 TFQ_BENCH_NREP=32 timeout 2400 python bench.py \
  > /tmp/g_x6.json 2>/tmp/g_x6.log
TFQ_BENCH_NREP=32 timeout 3600 python bench.py \
  > /tmp/g_auto.json 2>/tmp/g_auto.log
TFQ_BENCH_PREC=z TFQ_BENCH_NREP=16 timeout 3000 python bench.py \
  > /tmp/g_z.json 2>/tmp/g_z.log
TFQ_BENCH_MODE=fd TFQ_BENCH_PREC=z TFQ_BENCH_NREP=4 \
  timeout 2400 python bench.py > /tmp/fd_z_oz.json 2>/tmp/fd_z_oz.log
TFQ_BENCH_MODE=fd TFQ_BENCH_PREC=c TFQ_BENCH_NREP=4 \
  timeout 2400 python bench.py > /tmp/fd_c.json 2>/tmp/fd_c.log
for size in "16 32" "32 64" "64 64" "32 32"; do
  set -- $size
  TFQ_BENCH_LM=$1 TFQ_BENCH_LN=$2 TFQ_BENCH_MM_PREC=bf16x6 \
    TFQ_BENCH_NREP=16 timeout 2400 python bench.py \
    > /tmp/bs_${1}_${2}_x6.json 2>/tmp/bs_${1}_${2}_x6.log
done
TFQ_BENCH_MODE=iter TFQ_BENCH_ITER_PATTERN=golden TFQ_BENCH_ENGINE=pairs \
  TFQ_PAIRS_MM_PREC=bf16x6 timeout 2400 python bench.py \
  > /tmp/iter_golden_x6.json 2>/tmp/iter_golden_x6.log
# banded iteration with the t_step-batched row-tile kernel (r02 measured
# 5.855 ms/iter pre-batching; the per-step fixed cost was ~40% of it)
TFQ_BENCH_MODE=iter timeout 2400 python bench.py \
  > /tmp/iter_auto_tstep.json 2>/tmp/iter_auto_tstep.log
echo TILEPIPE_BATCH_DONE
