#!/bin/bash
# Ungrouped controls for the golden plan: the r01 headline config under
# the differential chain timing, in both precisions.
set -x
cd /root/repo
TFQ_BENCH_COLGROUP=1 TFQ_BENCH_MM_PREC=bf16x4 TFQ_BENCH_NREP=32 \
  timeout 2400 python bench.py > /tmp/g_u_bf16x4.json 2>/tmp/g_u_bf16x4.log
TFQ_BENCH_COLGROUP=1 TFQ_BENCH_MM_PREC=highest TFQ_BENCH_NREP=32 \
  timeout 2400 python bench.py > /tmp/g_u_high.json 2>/tmp/g_u_high.log
echo UNGROUPED_BATCH_DONE
