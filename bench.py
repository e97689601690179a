"""Headline benchmark: block-sparse SpMM on the reference's golden workload.

Reproduces the reference's ``bench_tfqmrgpu multi`` mode
(bench_tfqmrgpu.cu:289-440): the plan_unordered.14-287-16 multiplication plan
(nnzbY=nnzbX=4490, nnzbA=13109, 50,526 pairs), deterministic cos/sin block
fill, a CPU correctness gate (maxdev <= 1e-4), and a timed Y = A @ X loop.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline compares against the reference's best in-source V100 anchor for
LM=LN=32 double: 4.3 TFlop/s (bench_tfqmrgpu.cu:319).

Env knobs: TFQ_BENCH_LM/LN (default 32/32), TFQ_BENCH_PREC (c|z, default c),
TFQ_BENCH_NREP (default 64), TFQ_BENCH_ENGINE (xla|pallas|auto, default auto),
TFQ_PLAN_FILE (default: the reference's golden plan, synthesized equivalent
if absent).
"""

import json
import os
import sys
import time

import numpy as np

GOLDEN_PLAN = "/root/reference/test/multiplication/plan_unordered.14-287-16"
BASELINE_TFLOPS = 4.3  # V100 double LM=LN=32 TUNE=4 (bench_tfqmrgpu.cu:319)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_pairs():
    """Return (pair_a, pair_x, pair_y sorted by Y, nnzb_y, nnzb_a, nnzb_x)."""
    path = os.environ.get("TFQ_PLAN_FILE", GOLDEN_PLAN)
    if os.path.exists(path):
        from tfqmrgpu_tpu.io.planfile import read_plan_file

        pf = read_plan_file(path)
        counts = np.diff(pf.starts.astype(np.int64))
        pair_y = np.repeat(pf.y_order, counts)
        order = np.argsort(pair_y, kind="stable")
        log(f"# plan file {path}: nnzbY={pf.nnzb_y} nnzbA={pf.nnzb_a} "
            f"nnzbX={pf.nnzb_x} nPairs={pf.pairs.shape[0]}")
        return (pf.pairs[order, 0].astype(np.int32),
                pf.pairs[order, 1].astype(np.int32),
                pair_y[order].astype(np.int32),
                pf.nnzb_y, pf.nnzb_a, pf.nnzb_x)
    # synthesize a same-sized random plan (golden asset absent)
    log("# golden plan absent; synthesizing equivalent-size random plan")
    rng = np.random.default_rng(1234)
    nnzb_y = nnzb_x = 4490
    nnzb_a = 13109
    n_pairs = 50526
    k = n_pairs // nnzb_y
    pair_y = np.repeat(np.arange(nnzb_y, dtype=np.int32), k)
    extra = n_pairs - pair_y.shape[0]
    pair_y = np.concatenate([pair_y, rng.integers(0, nnzb_y, extra,
                                                  dtype=np.int32)])
    pair_y.sort()
    pair_a = rng.integers(0, nnzb_a, n_pairs, dtype=np.int32)
    pair_x = rng.integers(0, nnzb_x, n_pairs, dtype=np.int32)
    return pair_a, pair_x, pair_y, nnzb_y, nnzb_a, nnzb_x


def cos_sin_fill(nnzb, d1, d2, dtype):
    """Deterministic block data: re=cos(idx), im=sin(idx) with
    idx = (m*d1 + i)*d2 + j (reference: fill_cos_sin,
    bench_tfqmrgpu.cu:276-287)."""
    idx = np.arange(nnzb * d1 * d2, dtype=np.float64).reshape(nnzb, d1, d2)
    return np.cos(idx).astype(dtype), np.sin(idx).astype(dtype)


def main():
    lm = int(os.environ.get("TFQ_BENCH_LM", "32"))
    ln = int(os.environ.get("TFQ_BENCH_LN", "32"))
    prec = os.environ.get("TFQ_BENCH_PREC", "c")
    nrep = int(os.environ.get("TFQ_BENCH_NREP", "64"))
    engine = os.environ.get("TFQ_BENCH_ENGINE", "auto")

    import jax
    import jax.numpy as jnp

    if prec == "z":
        jax.config.update("jax_enable_x64", True)
    dt = jnp.float64 if prec == "z" else jnp.float32
    npdt = np.float64 if prec == "z" else np.float32

    dev = jax.devices()[0]
    log(f"# device: {dev.platform} ({getattr(dev, 'device_kind', '?')})")

    pair_a, pair_x, pair_y, nnzb_y, nnzb_a, nnzb_x = load_pairs()
    n_pairs = pair_a.shape[0]
    flops_per_call = n_pairs * 8.0 * lm * lm * ln  # bench_tfqmrgpu.cu:335

    a_re, a_im = cos_sin_fill(nnzb_a, lm, lm, npdt)
    x_re, x_im = cos_sin_fill(nnzb_x, lm, ln, npdt)

    # ---- pick the multiply implementation
    multiply = None
    eng_used = engine
    if engine in ("pallas", "auto"):
        try:
            from tfqmrgpu_tpu.ops.pallas_spmm import make_spmm_ell
            from tfqmrgpu_tpu.plan import Plan  # noqa: F401

            starts = np.zeros(nnzb_y + 1, dtype=np.int64)
            np.add.at(starts[1:], pair_y, 1)
            starts = np.cumsum(starts)
            multiply = make_spmm_ell(
                starts, np.stack([pair_a, pair_x], 1), nnzb_y, lm, ln, dt)
            eng_used = "pallas"
        except Exception as e:  # kernel unavailable -> XLA path
            if engine == "pallas":
                raise
            log(f"# pallas engine unavailable ({type(e).__name__}: {e}); "
                "falling back to xla")
    if multiply is None:
        from tfqmrgpu_tpu.ops.blocksparse import spmm_pairs

        pa = jnp.asarray(pair_a)
        px = jnp.asarray(pair_x)
        py = jnp.asarray(pair_y)

        def multiply(a, x):
            return spmm_pairs(a, x, pa, px, py, nnzb_y)

        eng_used = "xla"

    a = (jnp.asarray(a_re), jnp.asarray(a_im))
    x0 = (jnp.asarray(x_re), jnp.asarray(x_im))

    # ---- correctness gate vs NumPy reference (maxdev <= 1e-4,
    #      bench_tfqmrgpu.cu:414)
    y_dev = jax.jit(lambda x: multiply(a, x))(x0)
    ac = a_re.astype(np.complex128) + 1j * a_im.astype(np.complex128)
    xc = x_re.astype(np.complex128) + 1j * x_im.astype(np.complex128)
    prod = np.einsum("pij,pjk->pik", ac[pair_a], xc[pair_x])
    y_ref = np.zeros((nnzb_y, lm, ln), np.complex128)
    np.add.at(y_ref, pair_y, prod)
    y_got = np.asarray(y_dev[0]) + 1j * np.asarray(y_dev[1])
    scale = max(np.max(np.abs(y_ref)), 1e-300)
    maxdev = float(np.max(np.abs(y_got - y_ref)) / scale)
    gate = 1e-4 if prec == "c" else 1e-12
    log(f"# correctness: maxdev={maxdev:.3e} (gate {gate})")
    if maxdev > gate:
        print(json.dumps({"metric": "spmm_correctness_FAILED",
                          "value": maxdev, "unit": "maxdev",
                          "vs_baseline": 0.0}))
        return 1

    # ---- timed loop: chain nrep multiplies in ONE jit call (the TPU relay
    # adds ~25 ms per dispatch; the reference times nrep kernel launches)
    @jax.jit
    def chain(x):
        def body(_, x):
            y = multiply(a, x)
            s = 1.0 / jnp.maximum(jnp.max(jnp.abs(y[0])), 1e-30)
            return (y[0] * s, y[1] * s)

        return jax.lax.fori_loop(0, nrep, body, x)

    r = chain(x0)
    jax.block_until_ready(r)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        r = chain(x0)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    tflops = flops_per_call * nrep / best / 1e12
    nnz_per_s = n_pairs * lm * lm * ln * nrep / best  # MACs through the pattern

    log(f"# {nrep} multiplies in {best*1e3:.1f} ms -> {tflops:.2f} TFlop/s "
        f"({eng_used}, {prec}, LM={lm}, LN={ln})")
    print(json.dumps({
        "metric": f"spmm_plan_unordered_lm{lm}_ln{ln}_{prec}",
        "value": round(tflops, 3),
        "unit": "TFlop/s",
        "vs_baseline": round(tflops / BASELINE_TFLOPS, 3),
        "engine": eng_used,
        "maxdev": maxdev,
        "nnz_mac_per_s": nnz_per_s,
        "n_pairs": int(n_pairs),
        "ms_per_multiply": best * 1e3 / nrep,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
