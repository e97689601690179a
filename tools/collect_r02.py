"""Collect the r02 TPU batch outputs (/tmp/*.json from tools/r02_*.sh)
into committed artifacts:

* BENCH_spmm_r02.json  -- golden-plan SpMM rows (highest race, bf16x6,
  auto chain, Ozaki 'z'), full-iteration golden artifact
* BLOCKSIZES_r02.json  -- merge bf16x6 retry rows for the bf16x4
  gate-failing sizes
* BENCH_fd_r02.json    -- add the 'z'-via-Ozaki FD run if present

Usage: python tools/collect_r02.py  (idempotent; skips absent files)
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_json_line(path):
    try:
        with open(path) as f:
            rows = [json.loads(ln) for ln in f if ln.startswith("{")]
        return rows[-1] if rows else None
    except (OSError, json.JSONDecodeError):
        return None


def main():
    spmm_path = os.path.join(REPO, "BENCH_spmm_r02.json")
    spmm = {}
    if os.path.exists(spmm_path):
        spmm = json.load(open(spmm_path))
    spmm.setdefault("description", (
        "Golden-plan SpMM artifacts on TPU v5e (plan_unordered.14-287-16, "
        "LM=LN=32, gate maxdev<=1e-4 vs the NumPy pair walk, "
        "bench_tfqmrgpu.cu:414); 'z' gate 1e-12. vs_baseline labels the "
        "apples-to-oranges f64-V100 anchor comparison."))
    spmm.setdefault("runs", {})
    for key, path in [("highest_race", "/tmp/g_hi_tp.json"),
                      ("bf16x6", "/tmp/g_x6.json"),
                      ("auto", "/tmp/g_auto.json"),
                      ("z_ozaki", "/tmp/g_z.json"),
                      ("iter_golden_bf16x6", "/tmp/iter_golden_x6.json"),
                      ("iter_banded_tstep", "/tmp/iter_auto_tstep.json")]:
        rec = _last_json_line(path)
        if rec is not None:
            spmm["runs"][key] = rec
            print(f"spmm[{key}] <- {path}: {rec.get('value')} "
                  f"{rec.get('unit')} engine={rec.get('engine')}")
    if spmm["runs"]:
        json.dump(spmm, open(spmm_path, "w"), indent=1)
        print(f"wrote {spmm_path} ({len(spmm['runs'])} runs)")

    # blocksize bf16x6 retries
    bs_path = os.path.join(REPO, "BLOCKSIZES_r02.json")
    if os.path.exists(bs_path):
        bs = json.load(open(bs_path))
        added = 0
        for fn in os.listdir("/tmp"):
            if not (fn.startswith("bs_") and fn.endswith("_x6.json")):
                continue
            rec = _last_json_line(os.path.join("/tmp", fn))
            if rec is None:
                continue
            lm, ln = int(fn.split("_")[1]), int(fn.split("_")[2])
            row = dict(lm=lm, ln=ln, mm_prec="bf16x6",
                       tflops=rec.get("value"),
                       maxdev=rec.get("maxdev"),
                       engine=rec.get("engine"),
                       ms_per_multiply=rec.get("ms_per_multiply"),
                       gate_pass=(rec.get("maxdev", 1) <= 1e-4))
            bs["rows"] = [r for r in bs["rows"]
                          if not (r["lm"] == lm and r["ln"] == ln
                                  and r["mm_prec"] == "bf16x6")]
            bs["rows"].append(row)
            added += 1
            print(f"blocksize bf16x6 ({lm},{ln}): maxdev={row['maxdev']}")
        if added:
            json.dump(bs, open(bs_path, "w"), indent=1)
            print(f"wrote {bs_path} (+{added} bf16x6 rows)")

    # FD 'z' via ozaki
    fd_path = os.path.join(REPO, "BENCH_fd_r02.json")
    for key, path in [("z_ozaki", "/tmp/fd_z_oz.json"),
                      ("c", "/tmp/fd_c.json")]:
        fd_rec = _last_json_line(path)
        if fd_rec is not None:
            fd = json.load(open(fd_path))
            fd["runs"][key] = fd_rec
            json.dump(fd, open(fd_path, "w"), indent=1)
            print(f"BENCH_fd_r02.json += {key} ({fd_rec.get('value')} "
                  f"{fd_rec.get('unit')})")


if __name__ == "__main__":
    sys.exit(main())
