#!/usr/bin/env python
"""Produce SCALING_r05.json (supersedes SCALING_r04.json):

* host_overhead -- unchanged protocol (median of 9 warm repeats,
  min..max spread, resolved flags);
* weak_scaling -- now carries resolved:false on EVERY pr>1 row
  (VERDICT r4 ask #8: same-host simulation cannot resolve weak-scaling
  efficiency; the r4 rows swung 0.58..1.18 host-normalized.  The
  modeled comm tables carry the transferable signal);
* comm_model -- the banded neighbor-halo tables + the all_gather
  fallback pricing, as in r04.

Run on the simulated 8-device CPU mesh with an otherwise QUIET host:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/make_scaling_r05.py SCALING_r05.json
"""

import json
import sys


def main(out_path: str = "SCALING_r05.json") -> int:
    from tfqmrgpu_tpu.parallel import comm_model, scaling

    doc = {}
    doc["host_overhead"] = dict(
        description=(
            "PRIMARY same-host signal: fixed GLOBAL problem (mb=192, 25 "
            "iterations, MEDIAN OF 9 warm solves with min..max spread) "
            "across mesh shapes on a SIMULATED 8-device CPU mesh (one "
            "shared host).  Total work is identical at every pr, ideal "
            "relative_wall = 1.0; the excess is the sharded data path's "
            "collective/halo/dispatch cost.  resolved=false marks rows "
            "whose |overhead| is inside the run-to-run spread -- "
            "same-host simulation cannot resolve those.  Real-ICI "
            "numbers need a pod slice; the code path is identical."),
        rows=scaling.host_overhead_report(mb_total=192, repeats=9))
    doc["weak_scaling"] = dict(
        description=(
            "Weak scaling (problem grows with pr, fixed 25 iterations) "
            "on the same simulated mesh.  EVERY pr>1 row carries "
            "resolved:false: all simulated devices share one host CPU, "
            "so these rows are dominated by cache and XLA-CPU threading "
            "effects (r4 measured host-normalized efficiency swinging "
            "0.58..1.18 on identical code) -- the comm_model table "
            "below is the informative weak-scaling signal."),
        rows=scaling.weak_scaling_report())
    doc["comm_model"] = dict(
        description=(
            "Per-iteration collective BYTES of the sharded pairs engine "
            "(derived from its actual lowering: 2 halo collectives + 6 "
            "psum planes per tfQMR iteration) and the modeled ICI-time "
            "efficiency at stated v5e rates.  The neighbor-halo tables "
            "keep per-shard bytes CONSTANT in pr; the allgather_fallback "
            "table is a wide band (halfband > mb/shard) whose boundary "
            "tiles span beyond +-1 shard: the engine REFUSES the halo "
            "mode there and moves the full fused panel per multiply -- "
            "per-shard bytes GROW with (pr-1)/pr x panel, the "
            "weak_scalable=false rows.  Assumptions in row 0 of each "
            "table."),
        golden_scale_lm32=comm_model.weak_scaling_model(
            mb_per_shard=561, lm=32, ln=32, ncols=1, halfband=2),
        fd_scale_lm8=comm_model.weak_scaling_model(
            mb_per_shard=128, lm=8, ln=8, ncols=1, halfband=2),
        allgather_fallback_lm8=comm_model.weak_scaling_model(
            mb_per_shard=24, lm=8, ln=8, ncols=1, halfband=40,
            prs=(1, 2, 4, 8)),
    )
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
