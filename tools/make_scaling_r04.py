#!/usr/bin/env python
"""Produce SCALING_r04.json (supersedes SCALING_r03.json):

* host_overhead -- fixed-global-problem table, now 9 warm repeats per
  point with median + min..max spread and a resolved flag (VERDICT r3
  item 6: pr=4 at -5.6% meant variance exceeded signal at 3 repeats);
* weak_scaling -- as before (caveats stated);
* comm_model -- the banded (neighbor-halo) tables as in r03, PLUS an
  ALL_GATHER FALLBACK table (VERDICT r3 item 5): a wide band whose
  boundary tiles span beyond +-1 shard, so the engine refuses the halo
  mode and the full-panel all_gather branch (comm_model.py pricing,
  PERF.md's claim) is exercised with its (worse) modeled efficiency.

Run on the simulated 8-device CPU mesh:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/make_scaling_r04.py SCALING_r04.json
"""

import json
import sys


def main(out_path: str = "SCALING_r04.json") -> int:
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
            "Weak scaling (problem grows with pr, fixed 25 iterations) on "
            "the same simulated mesh.  CAVEAT: all simulated devices "
            "share one host CPU, so these rows are dominated by cache and "
            "XLA-CPU threading effects; read host_overhead and the "
            "comm_model table for the transferable signals."),
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
