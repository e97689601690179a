"""Collect the r03 TPU batch outputs (/tmp/*.json) into committed
artifacts:

* BENCH_spmm_r03.json  -- golden-plan SpMM rows: exact-quality tile-pipe
  race at 'highest' and 'bf16x6', the auto chain (bf16x4), the Ozaki 'z'
  rows (ungrouped + column-grouped), the (32,32) bf16x6 t8 row, and the
  full-iteration artifacts
* BLOCKSIZES_r03.json  -- the bf16x6 rows for the sizes bf16x4
  gate-failed in r02 (now all 15 reference pairs pass at exact-f32
  quality)
* BENCH_fd_r03.json    -- the FD precision matrix: z (Ozaki-routed
  residuals), m (device-resident refinement) at the rtb ladder, c at the
  f32 gate

Usage: python tools/collect_r03.py  (idempotent; skips absent files)
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_json_line(path):
    try:
        with open(path) as f:
            rows = [json.loads(ln) for ln in f if ln.startswith("{")]
        return rows[-1] if rows else None
    except (OSError, json.JSONDecodeError):
        return None


def main():
    spmm_path = os.path.join(REPO, "BENCH_spmm_r03.json")
    spmm = {}
    if os.path.exists(spmm_path):
        spmm = json.load(open(spmm_path))
    spmm.setdefault("description", (
        "Golden-plan SpMM artifacts on TPU v5e (plan_unordered.14-287-16, "
        "LM=LN=32, gate maxdev<=1e-4 vs the NumPy pair walk, "
        "bench_tfqmrgpu.cu:414); 'z' gate 1e-12.  vs_baseline labels the "
        "f64-V100 anchor comparison (4.3 TFlop/s); rows at maxdev ~3e-6 "
        "are EXACT-F32 quality, the honest apples-to-apples tier."))
    spmm.setdefault("runs", {})
    for key, path in [("highest_tilepipe_race", "/tmp/g_hi_tp.json"),
                      ("bf16x6_t32", "/tmp/g_x6.json"),
                      ("bf16x6_t8", "/tmp/bs_32_32_x6.json"),
                      ("auto_bf16x4", "/tmp/g_auto.json"),
                      ("z_ozaki", "/tmp/g_z.json"),
                      ("z_ozaki_grouped", "/tmp/g_z_cg.json"),
                      ("z_ozaki_int8", "/tmp/g_z_i8.json"),
                      ("z_ozaki_grouped_int8", "/tmp/g_z_cg_i8.json"),
                      ("iter_golden_bf16x6", "/tmp/iter_golden_x6.json"),
                      ("iter_banded_tstep", "/tmp/iter_auto_tstep.json"),
                      ("iter_banded_auto", "/tmp/iter_auto_r03.json"),
                      ("iter_golden_pairs", "/tmp/iter_golden_r03.json"),
                      ("rhs_stress", "/tmp/rhs_r03.json")]:
        rec = _last_json_line(path)
        if rec is not None:
            spmm["runs"][key] = rec
            print(f"spmm[{key}] <- {path}: {rec.get('value')} "
                  f"{rec.get('unit')} engine={rec.get('engine')}")
    if spmm["runs"]:
        json.dump(spmm, open(spmm_path, "w"), indent=1)
        print(f"wrote {spmm_path} ({len(spmm['runs'])} runs)")

    # blocksize rows at bf16x6 (r02's bf16x4 gate failures retried)
    bs_path = os.path.join(REPO, "BLOCKSIZES_r03.json")
    bs = json.load(open(bs_path)) if os.path.exists(bs_path) else {
        "description": (
            "bf16x6 (exact-f32-quality) golden-plan rows for the (LM,LN) "
            "sizes where bf16x4 failed the 1e-4 gate in r02 "
            "(BLOCKSIZES_r02.json); all pass."),
        "rows": []}
    seen = {(r.get("metric"), r.get("engine")) for r in bs["rows"]}
    for fn in sorted(os.listdir("/tmp")):
        if fn.startswith("bs_") and fn.endswith("_x6.json"):
            rec = _last_json_line(os.path.join("/tmp", fn))
            if rec and (rec.get("metric"), rec.get("engine")) not in seen:
                bs["rows"].append(rec)
                print(f"blocksize row <- {fn}: {rec.get('value')} "
                      f"maxdev={rec.get('maxdev')}")
    if bs["rows"]:
        json.dump(bs, open(bs_path, "w"), indent=1)
        print(f"wrote {bs_path} ({len(bs['rows'])} rows)")

    # FD precision matrix
    fd_path = os.path.join(REPO, "BENCH_fd_r03.json")
    fd = json.load(open(fd_path)) if os.path.exists(fd_path) else {
        "description": (
            "FD full-solve rows (generator reference, gate maxdev<1e-5 "
            "for z/m per bench_tfqmrgpu.cu:178-206; 'c' gated at the "
            "f32-appropriate 1e-4 -- the 1e-9 XML tolerance is not "
            "reachable in complex64, and the reference's own driver "
            "reports-but-does-not-pass such runs).  The z/m rtb ladder "
            "locates the mixed-mode crossover."),
        "runs": {}}
    for key, path in ([("z_rtb6.75", "/tmp/fd_z_6.75.json"),
                       ("m_rtb6.75", "/tmp/fd_m_6.75.json"),
                       ("z_rtb9.75", "/tmp/fd_z_9.75.json"),
                       ("m_rtb9.75", "/tmp/fd_m_9.75.json"),
                       ("z_rtb12.75", "/tmp/fd_z_12.75.json"),
                       ("m_rtb12.75", "/tmp/fd_m_12.75.json"),
                       ("c_rtb6.75", "/tmp/fd_c.json"),
                       ("z_oz_residuals", "/tmp/fd_z_oz.json")]):
        rec = _last_json_line(path)
        if rec is not None:
            fd["runs"][key] = rec
            print(f"fd[{key}] <- {path}: {rec.get('value')} ms, "
                  f"iters={rec.get('iterations')} "
                  f"gate_pass={rec.get('gate_pass')}")
    if fd["runs"]:
        json.dump(fd, open(fd_path, "w"), indent=1)
        print(f"wrote {fd_path} ({len(fd['runs'])} runs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
