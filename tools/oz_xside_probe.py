#!/usr/bin/env python
"""Measure the oz multiply's XLA-side X-path cost in isolation: the
descale + hi/lo split + bf16 slicing + window-replica build (prologue)
and the fold/descale epilogue -- everything apply() runs OUTSIDE the
Pallas kernel.  Together with the TFQ_PP_NO_DOT / TFQ_PP_NO_GATHER
kernel ablations this decomposes the measured multiply into
  prologue/epilogue (XLA elementwise) + A/X DMA + scalar gather + MXU,
the bound analysis VERDICT r4 ask #4 requires.

Usage (axon TPU env):  python tools/oz_xside_probe.py [G [bits]]
Prints one JSON line."""

import json
import os
import sys
import time

import numpy as np


def main(g=2, bits=47):
    os.environ.setdefault("TFQ_OZC_INT8", "1")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tfqmrgpu_tpu.io.planfile import read_plan_file
    from tfqmrgpu_tpu.ops import pairpanel as pp

    pf = read_plan_file(
        "/root/reference/test/multiplication/plan_unordered.14-287-16")
    counts = np.diff(pf.starts.astype(np.int64))
    pair_y = np.repeat(pf.y_order, counts)
    o = np.argsort(pair_y, kind="stable")
    pa, px, py = (pf.pairs[o, 0].astype(np.int64),
                  pf.pairs[o, 1].astype(np.int64),
                  pair_y[o].astype(np.int64))
    lm = ln = 32
    stride = int(os.environ.get("TFQ_OZ_STRIDE", "3"))
    gp = pp.pack_grouped(pa, px, py, pf.nnzb_x, ln, g) if g > 1 else None
    if gp is not None:
        plan = pp.pack_pair_plan(gp.pair_a2, gp.pair_x2, gp.pair_y2,
                                 gp.nnzb2, gp.nnzb2, lm, gp.ln2,
                                 r_tile=1, copy_g=2, resident=False,
                                 stride_factor=stride)
    else:
        plan = pp.pack_pair_plan(pa, px, py, pf.nnzb_y, pf.nnzb_x, lm, ln,
                                 r_tile=1, copy_g=2, resident=False,
                                 stride_factor=stride)
    tag, p, q = pp.oz_mode_params(plan.ku * lm, bits)
    t_step = int(os.environ.get("TFQ_BENCH_TSTEP", "8"))
    ln2 = plan.ln
    rng = np.random.default_rng(0)
    x = rng.standard_normal((plan.x_rows_padded, 2 * ln2))
    xj = jnp.asarray(x)

    swrows = plan.s_window * lm
    g_rows = plan.copy_g * lm
    orows = plan.o_blocks * lm or swrows

    def prologue(xf):
        """Exactly apply()'s comp X path: split, amax guard, slices,
        concat, window replicas.  Returns a checksum scalar."""
        from tfqmrgpu_tpu.ops import ozaki

        xf = xf.astype(jnp.float64)
        hi0 = xf.astype(jnp.float32)
        lo0 = (xf - hi0.astype(jnp.float64)).astype(jnp.float32)
        amax32 = jnp.max(jnp.abs(hi0), axis=0, keepdims=True)
        half = jnp.maximum(amax32[:, :ln2], amax32[:, ln2:])
        tau32 = ozaki.pow2_scale(jnp.concatenate(
            [half, half], axis=1).astype(jnp.float64)) * 2.0
        itau32 = (1.0 / tau32).astype(jnp.float32)
        lane_nz = jnp.any(xf != 0.0, axis=0, keepdims=True)
        nzh = lane_nz[:, :ln2] | lane_nz[:, ln2:]
        ok = jnp.all(jnp.isfinite(half) & ((half > 0) | ~nzh)) \
            & jnp.all(jnp.isfinite(itau32))
        hi = hi0 * itau32 * ok
        lo = lo0 * itau32 * ok
        xs = pp._oz_slices_f32pair(hi, lo, p, q)
        xw = jnp.concatenate(xs, axis=1)
        xrep = pp._window_replicas(xw, plan.n_windows, swrows,
                                   p * 2 * ln2, 1, g_rows, orows=orows)
        return jnp.sum(xrep.astype(jnp.float32))

    def timeit(fn, *args):
        j = jax.jit(fn)
        _ = float(np.asarray(j(*args)))      # compile + warm
        best = 1e30
        for i in range(3):
            a2 = tuple(a * (1.0 + 0.001 * i) for a in args)
            t0 = time.perf_counter()
            _ = float(np.asarray(j(*a2)))
            best = min(best, time.perf_counter() - t0)
        return best

    # chain 8 prologues (renormalized) so dispatch overhead amortizes
    def chain_pro(xf):
        def body(_, acc):
            return acc + prologue(xf * (1.0 + acc * 1e-30))

        return jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))

    t_pro8 = timeit(chain_pro, xj)
    # epilogue shapes: folded [nsteps*T? -> ntiles, M, 4ln] f32
    m = plan.r_tile * lm
    yraw = jnp.asarray(rng.standard_normal(
        (plan.ntiles, m, 4 * ln2)).astype(np.float32))
    sig = jnp.asarray(np.abs(rng.standard_normal((plan.ntiles, m, 1))))

    def chain_epi(y, s):
        def body(_, acc):
            st32 = s.astype(jnp.float32)
            a_ = y[:, :, :2 * ln2]
            e_ = y[:, :, 2 * ln2:]
            f = ((a_ * st32).astype(jnp.float64)
                 + (e_ * st32).astype(jnp.float64))
            return acc + jnp.sum(f.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))

    t_epi8 = timeit(chain_epi, yraw, sig)
    out = dict(metric="oz_xside_ms_per_multiply",
               value=round(t_pro8 / 8 * 1e3 + t_epi8 / 8 * 1e3, 3),
               unit="ms", vs_baseline=0.0,
               prologue_ms=round(t_pro8 / 8 * 1e3, 3),
               epilogue_ms=round(t_epi8 / 8 * 1e3, 3),
               G=g, bits=bits, p=p, q=q, ntiles=plan.ntiles,
               x_rows=plan.x_rows_padded, lanes=2 * ln2,
               note="XLA-side X path of one oz multiply (descale + "
                    "slicing + window replicas; fold epilogue) measured "
                    "in isolation on the golden cg-grouped plan")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    raise SystemExit(main(*args))
