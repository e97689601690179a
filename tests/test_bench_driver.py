"""Driver bench (repo-root bench.py) regression tests: the candidate
race (pairpanel grouped/ungrouped + sparse-grid rowtile) must produce a
gate-passing JSON line end-to-end.  Runs in a subprocess because bench.py
configures jax (x64, compile cache) at module scope."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_sparse_plan(path, mb=30, ncols=4, deg=3, fill=0.4, seed=5):
    """A small plan file whose recovered fragment grid is SPARSE
    (density well under the 0.6 rowtile-outright threshold), so the
    bench exercises the rowtile-vs-pairpanel race path."""
    rng = np.random.default_rng(seed)
    xid = -np.ones((mb, ncols), np.int64)
    cells = [(r, c) for r in range(mb) for c in range(ncols)]
    rng.shuffle(cells)
    keep = set(cells[: int(fill * len(cells))])
    for c in range(ncols):
        if not any(cc == c for _, cc in keep):
            keep.add((int(rng.integers(mb)), c))
    cnt = 0
    for r, c in sorted(keep):
        xid[r, c] = cnt
        cnt += 1
    rowptr = [0]
    colind = []
    for r in range(mb):
        cs = sorted({(r + s) % mb for s in range(deg)})
        colind.extend(cs)
        rowptr.append(len(colind))
    lines = []
    ny = 0
    for r in range(mb):
        for c in range(ncols):
            iy = xid[r, c]
            if iy < 0:
                continue
            first = True
            for ia in range(rowptr[r], rowptr[r + 1]):
                ix = xid[colind[ia], c]
                if ix < 0:
                    continue
                lines.append(f"{iy} {ia} {ix} {0 if first else 1}")
                first = False
            if not first:
                ny += 1
    with open(path, "w") as f:
        f.write(f"#nnzb_for_Y_A_X= {ny} {len(colind)} {cnt}\n")
        f.write("\n".join(lines) + "\n")


def _run_bench(tmp_path, extra_env):
    env = {k: v for k, v in os.environ.items()
           if not (k.startswith(("TFQ_", "JAX_", "XLA_"))
                   or k == "PYTHONPATH")}
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
        "JAX_COMPILATION_CACHE_DIR": str(tmp_path / "jaxcache"),
        "TFQ_BENCH_NREP": "4",
    })
    env.update(extra_env)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=900,
                         env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    payload = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert payload, out.stdout + out.stderr
    return json.loads(payload[-1]), out.stdout + out.stderr


@pytest.mark.slow
def test_bench_race_sparse_grid(tmp_path):
    plan = tmp_path / "sparse_plan.txt"
    _write_sparse_plan(str(plan))
    rec, stdout = _run_bench(tmp_path, {
        "TFQ_PLAN_FILE": str(plan),
        "TFQ_BENCH_LM": "8",
        "TFQ_BENCH_LN": "8",
        "TFQ_BENCH_RACE": "1",       # force the race off-TPU
    })
    assert rec["maxdev"] <= 1e-4
    assert rec["ms_per_multiply"] > 0
    # both engines must have entered the race
    assert "# race rowtile" in stdout and "# race pairpanel" in stdout


@pytest.mark.slow
def test_bench_z_ozaki(tmp_path):
    """PREC=z routes to the pairpanel 'oz' Ozaki kernel and passes the
    1e-12 f64 gate end-to-end."""
    plan = tmp_path / "sparse_plan.txt"
    _write_sparse_plan(str(plan), mb=20, ncols=3, fill=0.6)
    rec, stdout = _run_bench(tmp_path, {
        "TFQ_PLAN_FILE": str(plan),
        "TFQ_BENCH_PREC": "z",
        "TFQ_BENCH_LM": "16",
        "TFQ_BENCH_LN": "16",
        "TFQ_BENCH_NREP": "2",
    })
    assert rec["metric"].endswith("_z"), rec
    assert rec["engine"].startswith("pairpanel-oz"), rec
    assert rec["maxdev"] <= 1e-12, rec


@pytest.mark.slow
def test_bench_dense_grid_rowtile_outright(tmp_path):
    rec, stdout = _run_bench(tmp_path, {
        "TFQ_PLAN_FILE": str(tmp_path / "missing"),   # synthesize
        "TFQ_BENCH_MB": "24", "TFQ_BENCH_NCOLSB": "3",
        "TFQ_BENCH_DEG": "3",
        "TFQ_BENCH_LM": "8", "TFQ_BENCH_LN": "8",
    })
    assert rec["maxdev"] <= 1e-4
    # LM=8 runs under the superblock pre-pass (merged rows feed the
    # rowtile engine); the dense grid must still pick rowtile outright
    import re

    assert re.match(r"^(super\d+x\d+\+)?rowtile", rec["engine"]), rec


@pytest.mark.slow
def test_bench_race_wide_groups(tmp_path):
    """The race's raised-cap wide-group spec (G=8 resident, tile-pipelined
    at split precisions) must build, race, and gate-pass end-to-end."""
    plan = tmp_path / "wide_plan.txt"
    _write_sparse_plan(str(plan), mb=36, ncols=8, deg=3, fill=0.45)
    rec, stdout = _run_bench(tmp_path, {
        "TFQ_PLAN_FILE": str(plan),
        "TFQ_BENCH_LM": "8",
        "TFQ_BENCH_LN": "8",
        "TFQ_BENCH_RACE": "1",
    })
    assert rec["maxdev"] <= 1e-4
    # the forced wide-group candidate entered the race (resident marker)
    assert "-res" in stdout, stdout[-2000:]
