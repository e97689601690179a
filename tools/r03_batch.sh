#!/bin/bash
# Round-3 TPU evidence batch (run after the code lands; one job at a time
# on the single relay chip, shared persistent compile cache):
#
#  1. FD z/m crossover ladder (rtb = 6.75 / 9.75 / 12.75): where does the
#     mixed mode ('m', f32 iterations + f64-residual refinement, now with
#     a device-resident refinement loop) beat the emulated-f64 'z' solve?
#  2. FD 'c' at the f32-appropriate tolerance (the 1e-9 XML tolerance is
#     unreachable in complex64; gate stays the honest 1e-4 c-gate).
#  3. golden-plan 'z' (Ozaki pairpanel) -- the apples-to-apples vs the
#     4.3 TFlop/s f64 V100 anchor (if not already produced this round).
set -x
cd /root/repo
for rtb in 6.75 9.75 12.75; do
  TFQ_BENCH_MODE=fd TFQ_BENCH_PREC=z TFQ_FD_RTB=$rtb TFQ_BENCH_NREP=3 \
    timeout 3000 python bench.py > /tmp/fd_z_$rtb.json 2>/tmp/fd_z_$rtb.log
  TFQ_BENCH_MODE=fd TFQ_BENCH_PREC=m TFQ_FD_RTB=$rtb TFQ_BENCH_NREP=3 \
    timeout 3000 python bench.py > /tmp/fd_m_$rtb.json 2>/tmp/fd_m_$rtb.log
done
TFQ_BENCH_MODE=fd TFQ_BENCH_PREC=c TFQ_BENCH_NREP=4 \
  timeout 2400 python bench.py > /tmp/fd_c.json 2>/tmp/fd_c.log
if [ ! -s /tmp/g_z.json ]; then
  TFQ_BENCH_PREC=z TFQ_BENCH_NREP=16 timeout 3000 python bench.py \
    > /tmp/g_z.json 2>/tmp/g_z.log
fi
echo R03_BATCH_DONE
