#!/usr/bin/env python
"""Produce SCALING_r03.json: the CPU-sim measured tables (host-overhead +
weak rows, as in r02) PLUS the new communication-volume model — per-
iteration collective bytes per sharded-pairs configuration and the
modeled ICI-time efficiency curve at stated v5e rates (VERDICT r2 item 6).

Run on the simulated 8-device CPU mesh:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/make_scaling_r03.py SCALING_r03.json
"""

import json
import sys


def main(out_path: str = "SCALING_r03.json") -> int:
    from tfqmrgpu_tpu.parallel import comm_model, scaling

    doc = {}
    doc["host_overhead"] = dict(
        description=(
            "PRIMARY same-host signal: fixed GLOBAL problem (mb=192, 25 "
            "iterations, median of 3 warm solves) across mesh shapes on a "
            "SIMULATED 8-device CPU mesh (one shared host).  Total work "
            "is identical at every pr, ideal relative_wall = 1.0; the "
            "excess is the sharded data path's collective/halo/dispatch "
            "cost.  Real-ICI numbers require a pod slice; the code path "
            "is identical."),
        rows=scaling.host_overhead_report(mb_total=192))
    doc["weak_scaling"] = dict(
        description=(
            "Weak scaling (problem grows with pr, fixed 25 iterations) on "
            "the same simulated mesh.  CAVEAT: all simulated devices "
            "share one host CPU, so these rows are dominated by cache and "
            "XLA-CPU threading effects; read host_overhead and the "
            "comm_model table for the transferable signals."),
        rows=scaling.weak_scaling_report())
    # the communication model: golden-plan-scale banded shards (561
    # blocks/shard at LM=LN=32 mirrors plan_unordered's 4490 blocks over
    # 8 shards) and a smaller FD-like config
    doc["comm_model"] = dict(
        description=(
            "Per-iteration collective BYTES of the sharded pairs engine "
            "(derived from its actual lowering: 2 halo collectives + 6 "
            "psum planes per tfQMR iteration) and the modeled ICI-time "
            "efficiency at stated v5e rates.  The engine's neighbor-halo "
            "mode (ppermute edge slabs, r3) keeps per-shard bytes "
            "CONSTANT in pr; rows list both the built-object "
            "measurements (pr <= simulated devices) and the analytic "
            "extension.  Assumptions carried in row 0."),
        golden_scale_lm32=comm_model.weak_scaling_model(
            mb_per_shard=561, lm=32, ln=32, ncols=1, halfband=2),
        fd_scale_lm8=comm_model.weak_scaling_model(
            mb_per_shard=128, lm=8, ln=8, ncols=1, halfband=2),
    )
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
