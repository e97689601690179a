#!/bin/bash
# Measure forced column-group sizes G=8 and G=16 on the golden plan
# (exact-f32), then the Pallas DMA ceiling probe.
set -x
cd /root/repo
TFQ_BENCH_COLGROUP=8 TFQ_BENCH_MM_PREC=highest TFQ_BENCH_NREP=32 \
  timeout 2400 python bench.py > /tmp/g_cg8.json 2>/tmp/g_cg8.log
TFQ_BENCH_COLGROUP=16 TFQ_BENCH_MM_PREC=highest TFQ_BENCH_NREP=32 \
  timeout 2400 python bench.py > /tmp/g_cg16.json 2>/tmp/g_cg16.log
timeout 2400 python tools/dma_probe.py /tmp/dma_probe.json \
  > /tmp/dma_probe.log 2>&1
echo G16_BATCH_DONE
