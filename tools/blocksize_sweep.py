"""Per-blocksize SpMM gate sweep: the TPU analogue of the reference's TUNE
table (bench_tfqmrgpu.cu:529-547).

Runs the golden-plan SpMM benchmark (bench.py) for every (LM, LN) pair in
the reference's compiled list (allowed_block_sizes.h:4-18), in both the
fast bf16x4 mode and the exact-f32 'highest' mode, and records
maxdev-vs-CPU-reference (gate: maxdev <= 1e-4, bench_tfqmrgpu.cu:414) and
throughput per combination.

Each combination runs in a SUBPROCESS so a compile failure of one shape
cannot kill the sweep, and the persistent compile cache is shared.

Usage:  python tools/blocksize_sweep.py [out.json] [nrep]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the reference's 15 compiled pairs (allowed_block_sizes.h:4-18)
PAIRS = [(4, 4), (4, 5), (4, 8), (4, 32), (8, 8), (8, 9), (8, 10),
         (8, 32), (8, 64), (16, 16), (16, 32), (16, 64), (32, 32),
         (32, 64), (64, 64)]
PRECS = ["bf16x4", "highest"]


def run_one(lm: int, ln: int, mm_prec: str, nrep: int, timeout: int = 2400):
    env = dict(os.environ)
    env.update(TFQ_BENCH_LM=str(lm), TFQ_BENCH_LN=str(ln),
               TFQ_BENCH_PREC="c", TFQ_BENCH_MM_PREC=mm_prec,
               TFQ_BENCH_NREP=str(nrep))
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           capture_output=True, text=True, timeout=timeout,
                           env=env, cwd=REPO)
    except subprocess.TimeoutExpired:
        return dict(lm=lm, ln=ln, mm_prec=mm_prec, error="timeout")
    out = dict(lm=lm, ln=ln, mm_prec=mm_prec,
               wall_s=round(time.time() - t0, 1))
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    try:
        j = json.loads(line)
        if j.get("metric") == "spmm_correctness_FAILED":
            # the bench refuses to report performance past the gate
            # (bench_tfqmrgpu.cu:192 behavior); value carries the maxdev
            out.update(maxdev=j.get("value"), gate_pass=False,
                       gate_fail=True)
            return out
        out.update(tflops=j.get("value"), maxdev=j.get("maxdev"),
                   engine=j.get("engine"),
                   ms_per_multiply=j.get("ms_per_multiply"),
                   gate_pass=(j.get("metric", "").startswith("spmm_plan")
                              and (j.get("maxdev") or 1.0) <= 1e-4))
    except (json.JSONDecodeError, IndexError):
        tail = (r.stderr or "").strip().splitlines()[-3:]
        out.update(error="no-json", rc=r.returncode, stderr_tail=tail)
    return out


def main(argv):
    out_path = argv[1] if len(argv) > 1 else os.path.join(
        REPO, "BLOCKSIZES_r02.json")
    nrep = int(argv[2]) if len(argv) > 2 else 32
    # resume: keep completed rows from a previous (crashed) sweep; rerun
    # rows that errored and rows not yet attempted
    done = {}
    if os.path.exists(out_path):
        try:
            for r in json.load(open(out_path)).get("rows", []):
                if not r.get("error"):
                    done[(r["lm"], r["ln"], r["mm_prec"])] = r
        except (json.JSONDecodeError, KeyError):
            pass
    rows = []
    for lm, ln in PAIRS:
        for prec in PRECS:
            if (lm, ln, prec) in done:
                rows.append(done[(lm, ln, prec)])
                continue
            row = run_one(lm, ln, prec, nrep)
            rows.append(row)
            print(json.dumps(row), flush=True)
            # checkpoint after every combo (sweeps are long; crashes happen)
            with open(out_path, "w") as f:
                json.dump({"description":
                           "Golden-plan SpMM gate sweep over the "
                           "reference's 15 (LM,LN) pairs x {bf16x4, "
                           "highest} on TPU (gate maxdev<=1e-4, "
                           "bench_tfqmrgpu.cu:414)",
                           "rows": rows}, f, indent=1)
    n_pass = sum(1 for r in rows if r.get("gate_pass"))
    print(f"# {n_pass}/{len(rows)} gate-passing", file=sys.stderr)
    return 0 if n_pass == len(rows) else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
