#!/bin/bash
# Serialized TPU batch for the round-2 evidence artifacts.  Runs ONE job at
# a time (the relay exposes a single chip); each bench.py subprocess shares
# the persistent compile cache.
#
#  1. resume/complete the per-blocksize gate sweep -> BLOCKSIZES_r02.json
#  2. full-iteration throughput artifacts (auto engine + pairs engine)
#  3. golden-plan headline probes (bucketed/t8/copyg4 exact-f32)
set -x
cd /root/repo
python tools/blocksize_sweep.py BLOCKSIZES_r02.json 16 \
  >> /tmp/sweep.log 2>&1
TFQ_BENCH_MODE=iter timeout 2400 python bench.py \
  > /tmp/iter_auto.json 2>/tmp/iter_auto.log
TFQ_BENCH_MODE=iter TFQ_BENCH_ENGINE=pairs timeout 2400 python bench.py \
  > /tmp/iter_pairs.json 2>/tmp/iter_pairs.log
TFQ_BENCH_MM_PREC=highest TFQ_BENCH_BUCKETS=3 TFQ_BENCH_NREP=32 \
  timeout 2400 python bench.py > /tmp/g_b3.json 2>/tmp/g_b3.log
TFQ_BENCH_MM_PREC=highest TFQ_BENCH_TSTEP=8 TFQ_BENCH_NREP=32 \
  timeout 2400 python bench.py > /tmp/g_t8.json 2>/tmp/g_t8.log
TFQ_BENCH_MM_PREC=highest TFQ_BENCH_COPYG=4 TFQ_BENCH_NREP=32 \
  timeout 2400 python bench.py > /tmp/g_g4.json 2>/tmp/g_g4.log
echo BATCH_DONE
