"""Pallas DMA ceiling probe: measure the sustained HBM->VMEM stream rate
of a grid-pipelined kernel as a function of the per-step block size and
the number of parallel input operands.

The pairpanel/rowtile engines are bandwidth-bound; their ceiling is
whatever Mosaic's automatic double-buffered DMA achieves -- measured
~140-180 GB/s on the v5e relay vs ~250 GB/s for an XLA device copy.
This probe isolates that number so engine models use measured rates.

Usage: python tools/dma_probe.py [out.json]
"""

import functools
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_stream(nsteps: int, rows: int, cols: int, n_ops: int,
                interpret: bool):
    """Kernel that streams n_ops operands of [nsteps, rows, cols] f32 and
    accumulates one column slice (prevents DMA elision, negligible
    compute)."""

    def kernel(*refs):
        ins, out = refs[:-1], refs[-1]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out[...] = jnp.zeros_like(out)

        acc = out[...]
        for r in ins:
            acc = acc + r[0, :, :128]
        out[...] = acc

    in_specs = [pl.BlockSpec((1, rows, cols), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)] * n_ops
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        interpret=interpret,
    )


def time_stream(nsteps, rows, cols, n_ops, interpret, budget_bytes):
    xs = [jnp.asarray(np.random.default_rng(i).standard_normal(
        (nsteps, rows, cols), dtype=np.float32)) for i in range(n_ops)]
    call = jax.jit(make_stream(nsteps, rows, cols, n_ops, interpret))
    y = call(*xs); y.block_until_ready()          # compile+warm
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        y = call(*xs)
        y.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    nbytes = n_ops * nsteps * rows * cols * 4
    return nbytes / best / 1e9, best * 1e3


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dma_probe.json"
    interpret = jax.default_backend() not in ("tpu",)
    total = 1 << 30                                # ~1 GB per variant
    rows_fixed = 64
    res = []
    for blk_kb in (64, 256, 1024, 4096):
        cols = blk_kb * 1024 // (rows_fixed * 4)
        for n_ops in (1, 2, 4):
            per = rows_fixed * cols * 4
            nsteps = max(8, total // (per * n_ops))
            gbps, ms = time_stream(nsteps, rows_fixed, cols, n_ops,
                                   interpret, total)
            r = dict(block_kb=blk_kb, n_ops=n_ops, nsteps=nsteps,
                     gbps=round(gbps, 1), ms=round(ms, 2))
            print(json.dumps(r), flush=True)
            res.append(r)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
