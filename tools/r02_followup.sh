#!/bin/bash
# Follow-up TPU batch: grouped-engine golden artifacts (run after
# tools/r02_batch.sh completes; one job at a time on the single chip).
set -x
cd /root/repo
# re-run sweep rows that errored before the VMEM-feasibility fix
python tools/blocksize_sweep.py BLOCKSIZES_r02.json 16 >> /tmp/sweep.log 2>&1
# golden SpMM, exact-f32, grouped (model auto-pick) -- the headline
TFQ_BENCH_MM_PREC=highest TFQ_BENCH_NREP=32 timeout 2400 python bench.py \
  > /tmp/g_cg_hi.json 2>/tmp/g_cg_hi.log
# golden SpMM, auto precision (bf16x4 with fallback), grouped
TFQ_BENCH_NREP=32 timeout 2400 python bench.py \
  > /tmp/g_cg_auto.json 2>/tmp/g_cg_auto.log
# model validation: forced G=4 and G=2 and ungrouped, exact-f32
TFQ_BENCH_COLGROUP=4 TFQ_BENCH_MM_PREC=highest TFQ_BENCH_NREP=32 \
  timeout 2400 python bench.py > /tmp/g_cg4_hi.json 2>/tmp/g_cg4_hi.log
TFQ_BENCH_COLGROUP=2 TFQ_BENCH_MM_PREC=highest TFQ_BENCH_NREP=32 \
  timeout 2400 python bench.py > /tmp/g_cg2_hi.json 2>/tmp/g_cg2_hi.log
TFQ_BENCH_COLGROUP=1 TFQ_BENCH_MM_PREC=highest TFQ_BENCH_NREP=32 \
  timeout 2400 python bench.py > /tmp/g_cg1_hi.json 2>/tmp/g_cg1_hi.log
# full-iteration throughput on the golden pattern: grouped vs ungrouped
TFQ_BENCH_MODE=iter TFQ_BENCH_ITER_PATTERN=golden TFQ_BENCH_ENGINE=pairs \
  timeout 2400 python bench.py > /tmp/iter_g_cg.json 2>/tmp/iter_g_cg.log
TFQ_BENCH_MODE=iter TFQ_BENCH_ITER_PATTERN=golden TFQ_BENCH_ENGINE=pairs \
  TFQ_PAIRS_COLGROUP=1 timeout 2400 python bench.py \
  > /tmp/iter_g_u.json 2>/tmp/iter_g_u.log
echo FOLLOWUP_DONE
