"""Render BLOCKSIZES_r02.json into the TPU analogue of the reference's
per-blocksize TUNE table (bench_tfqmrgpu.cu:529-547): one row per compiled
(LM, LN) pair with measured throughput/accuracy per matmul precision and
the recommended policy (the bench's auto rule: bf16x4 only when its
measured maxdev stays under HALF the 1e-4 gate; exact-f32 'highest'
otherwise).

Usage: python tools/make_tune_table.py [BLOCKSIZES_r02.json] [docs/tune_table.md]
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv):
    src = argv[1] if len(argv) > 1 else os.path.join(REPO,
                                                     "BLOCKSIZES_r02.json")
    dst = argv[2] if len(argv) > 2 else os.path.join(REPO, "docs",
                                                     "tune_table.md")
    rows = json.load(open(src))["rows"]
    by_size = {}
    for r in rows:
        by_size.setdefault((r["lm"], r["ln"]), {})[r["mm_prec"]] = r

    lines = [
        "# Per-blocksize tune table (TPU v5e, golden-plan SpMM)",
        "",
        "The runtime analogue of the reference's compile-time TUNE table",
        "(`bench_tfqmrgpu.cu:529-547`): every (LM, LN) pair of",
        "`allowed_block_sizes.h` measured on the golden multiplication",
        "plan, in the fast split-bf16 mode and the exact-f32 mode, against",
        "the reference's maxdev <= 1e-4 gate (`bench_tfqmrgpu.cu:414`).",
        "The `auto` policy (default) uses bf16x4 only where its measured",
        "maxdev stays under HALF the gate; otherwise exact-f32.",
        "Engines are picked per size by the packing/VMEM/time model",
        "(`cgN` = column grouping over N RHS clusters).",
        "",
        "| LM | LN | bf16x4 TFlop/s | bf16x4 maxdev | f32 TFlop/s "
        "| f32 maxdev | engine | auto policy |",
        "|---|---|---|---|---|---|---|---|",
    ]
    n_pass = n_total = 0
    for (lm, ln), d in sorted(by_size.items()):
        b4 = d.get("bf16x4", {})
        hi = d.get("highest", {})

        def fmt(r, key, spec="{:.3g}"):
            v = r.get(key)
            return spec.format(v) if v is not None else "—"

        b4_dev = b4.get("maxdev")
        b4_fail = b4.get("error") or not b4.get("gate_pass", False)
        b4_forced_hi = str(b4.get("engine", "")).endswith("-highest") \
            or str(b4.get("engine", "")) == "xla"
        if b4_forced_hi:
            policy = "highest (f32; no bf16 kernel at this LM)"
        elif b4_dev is not None and b4_dev <= 5e-5 and not b4_fail:
            policy = "bf16x4"
        else:
            policy = "highest (f32)"
        eng = hi.get("engine") or b4.get("engine") or "—"
        n_total += 1
        if hi.get("gate_pass"):
            n_pass += 1
        lines.append(
            f"| {lm} | {ln} | {fmt(b4, 'tflops')} | {fmt(b4, 'maxdev', '{:.2e}')}"
            f"{' ✗gate' if b4_fail and not b4.get('error') else ''}"
            f"{' ✗err' if b4.get('error') else ''} | "
            f"{fmt(hi, 'tflops')} | {fmt(hi, 'maxdev', '{:.2e}')} | "
            f"{eng} | {policy} |")
    lines += [
        "",
        f"{n_pass}/{n_total} sizes pass the gate in exact-f32; the auto",
        "policy passes everywhere it is reachable (bf16x4 rows marked",
        "`✗gate` are exactly the sizes where auto falls back).",
        "",
        "Notes: LM < 16 cannot compile the bf16 pair-panel windows",
        "(Mosaic sublane alignment) and always runs exact-f32; tiny sizes",
        "are fixed-cost-bound (~ms-scale multiplies regardless of flops),",
        "so their TFlop/s mostly measures the golden plan's 4490-tile",
        "dispatch floor, not the MXU.",
    ]
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {dst}: {n_total} sizes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
