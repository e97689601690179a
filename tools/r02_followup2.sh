#!/bin/bash
# Second follow-up: many-RHS stress artifact (BASELINE config 4).
set -x
cd /root/repo
TFQ_BENCH_MODE=rhs timeout 2400 python bench.py > /tmp/rhs_stress.json 2>/tmp/rhs_stress.log
echo FOLLOWUP2_DONE
