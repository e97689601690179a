"""Observability: trace ranges, flop accounting, roofline audit.

The reference instruments phases with NVTX PUSH_RANGE/POP_RANGE markers
gated by -DUSE_NVTX (reference: tfqmrgpu.hxx:8-27, used at
tfqmrgpu_core.hxx:29,177,332) and accumulates analytic flop counts exposed
via getInfo (tfqmrgpu_core.hxx:133-138).  TPU equivalents:

* ``trace(name)``     -- jax.profiler trace annotation (shows up in
  TensorBoard/xprof timelines), enabled when TFQ_TRACE=1 (the USE_NVTX
  analogue) or when a profiler session is active;
* ``start_trace/stop_trace`` -- dump a full device profile to a directory;
* ``roofline(...)``   -- analytic flops/bytes of one tfQMR iteration per
  engine, and the speed-of-light fraction of a measured iteration time
  against device peak numbers (the audit BASELINE.json requires).
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from typing import Optional

import numpy as np

# Peak numbers per chip generation (empirically validated for the v5e relay
# this repo is developed against: ~173 TF/s bf16 MXU, ~670 GB/s HBM).
DEVICE_PEAKS = {
    # hbm_gbps: datasheet number.  hbm_gbps_measured: sustained rate of an
    # XLA copy loop MEASURED on the chip this repo develops against -- the
    # v5e relay delivers ~250 GB/s sustained (copy r+w), far below the
    # 819 GB/s sheet number, and Pallas-issued DMA streams cap at ~140-180
    # GB/s regardless of block size or pipeline depth (probed: auto
    # pipeline, dimension_semantics, manual 4-deep async_copy).  Roofline
    # fractions are computed against the measured rate (override with
    # TFQ_HBM_GBPS, or recalibrate with profiling.calibrate_hbm()).
    "TPU v5 lite": dict(bf16_tflops=197.0, fp32_eff_tflops=197.0 / 6,
                        hbm_gbps=819.0, hbm_gbps_measured=250.0),
    "TPU v4": dict(bf16_tflops=275.0, fp32_eff_tflops=275.0 / 6,
                   hbm_gbps=1228.0),
    "cpu": dict(bf16_tflops=1.0, fp32_eff_tflops=0.5, hbm_gbps=50.0),
}


def calibrate_hbm(size_mb: int = 512, nrep: int = 8) -> float:
    """Measure the sustained HBM copy rate (read+write GB/s) with an XLA
    loop and override the roofline constant for this process."""
    import time as _time

    import jax
    import jax.numpy as jnp

    n = size_mb * (1 << 20) // (64 * 384 * 4)
    a = jnp.ones((n, 64, 384), jnp.float32)

    @jax.jit
    def chain(a, s):
        def body(_, c):
            y = a + c[0]
            return jnp.stack([y.reshape(-1)[0] * 0.5 + 1e-9, c[1]])
        return jax.lax.fori_loop(0, nrep, body, s)[0]

    _ = float(np.asarray(chain(a, jnp.ones(2))))
    best = None
    for i in range(2):
        t0 = _time.perf_counter()
        _ = float(np.asarray(chain(a, jnp.ones(2) * (2.0 + i))))
        dt = _time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    gbps = a.size * 4 * 2 / 1e9 / (best / nrep)
    os.environ["TFQ_HBM_GBPS"] = f"{gbps:.1f}"
    return gbps


def _enabled() -> bool:
    return os.environ.get("TFQ_TRACE", "0") != "0"


@contextlib.contextmanager
def trace(name: str):
    """Trace-annotation range (NVTX PUSH/POP equivalent).  Cheap no-op when
    TFQ_TRACE is unset."""
    if not _enabled():
        yield
        return
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


def start_trace(log_dir: str):
    import jax.profiler

    jax.profiler.start_trace(log_dir)


def stop_trace():
    import jax.profiler

    jax.profiler.stop_trace()


# ------------------------------------------------------------- roofline

@dataclasses.dataclass
class Roofline:
    """Analytic cost model of one tfQMR iteration + measured efficiency."""

    flops_per_iteration: float      # nominal (reference accounting)
    bytes_per_iteration: float      # engine-specific HBM traffic estimate
    device_kind: str
    peak_tflops: float              # precision-adjusted compute ceiling
    peak_gbps: float
    compute_bound: bool
    light_speed_s: float            # max(flop/peak, bytes/bw) per iteration
    measured_s: Optional[float] = None
    fraction_of_light: Optional[float] = None
    nnz_mac_per_s: Optional[float] = None
    vectors_resident: bool = False  # state vectors modeled as VMEM-held
    # secondary: fraction of the DATASHEET-bandwidth light (the absolute
    # physical ceiling; fraction_of_light uses the measured-achievable
    # rate, which is the actionable regression metric on this relay)
    fraction_of_sheet_light: Optional[float] = None

    def __str__(self):
        s = (f"roofline[{self.device_kind}]: "
             f"{self.flops_per_iteration:.3e} flop + "
             f"{self.bytes_per_iteration:.3e} B/iter"
             f"{' (state VMEM-resident)' if self.vectors_resident else ''}, "
             f"light-speed {self.light_speed_s*1e6:.1f} us "
             f"({'compute' if self.compute_bound else 'bandwidth'}-bound)")
        if self.fraction_of_light is not None:
            s += (f"; measured {self.measured_s*1e6:.1f} us = "
                  f"{100*self.fraction_of_light:.1f}% of light")
        return s


def solver_roofline(solver, measured_iteration_s: Optional[float] = None,
                    mm_passes: int = 6) -> Roofline:
    """Audit a Solver's per-iteration cost against device peaks.

    mm_passes: MXU passes per fp32 matmul (6 = exact fp32 / HIGHEST,
    3 = bf16x3, 1 = bf16).
    """
    import jax

    plan = solver.plan
    lm, ln = solver.lm, solver.ln
    rsize = 8 if solver.precision == "z" else 4

    from .core import flops_per_iteration

    flops = flops_per_iteration(plan.n_pairs, plan.nnzb_x, lm, ln)

    # HBM bytes: 2 SpMM reads of A + ~13 passes over the X-shaped vectors
    nvec = plan.nnzb_x * 2 * lm * ln * rsize
    gp = getattr(solver, "_gp", None)
    if solver.engine == "pairs" and gp is not None:
        # column-grouped vectors carry G lane-blocks per cell (zero-filled
        # absent lanes still move over HBM)
        nvec = gp.nnzb2 * 2 * lm * gp.ln2 * rsize
    if solver.engine == "dense":
        nr = plan.nrows * lm
        a_bytes = 2 * nr * nr * rsize
    elif solver.engine == "pairs" and solver._pp_plan is not None:
        pp = solver._pp_plan
        a_bytes = pp.ntiles * 2 * pp.r_tile * lm * pp.ku * lm * 2 * 2
    else:
        a_bytes = plan.nnzb_a * 2 * lm * lm * rsize
    # Residency-aware vector traffic: the iteration runs inside one jitted
    # while_loop; when the ~10 X-shaped state vectors fit the VMEM budget,
    # XLA keeps them on-chip and the vector ops never stream from HBM --
    # only the A panels are compulsory traffic.  A ceiling must majorize
    # (r02's stream-only model produced fractions > 1 on VMEM-resident
    # engines, hiding regressions), so resident states count zero vector
    # bytes, and the NON-resident pass count is a fusion LOWER BOUND, not
    # the op-by-op count: a perfectly fused iteration reads each of the 7
    # persistent complex vectors (v1, v4..v9, tfqmrgpu_core.hxx:49-56)
    # once and writes it once per iteration, plus one read of the f32
    # shadow v3 -- ~15 unidirectional traversals.  (The naive op-by-op
    # count is ~26; XLA's fusion really does land between the two, which
    # is what put r02's fractions at 1.2-1.4.)  Budget override:
    # TFQ_ROOFLINE_VMEM (MB).
    vmem_budget = int(os.environ.get("TFQ_ROOFLINE_VMEM", "72")) << 20
    vectors_resident = 10 * nvec <= vmem_budget
    vec_passes = 0 if vectors_resident else 15
    bytes_ = 2 * a_bytes + vec_passes * nvec

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu")
    peaks = DEVICE_PEAKS.get(kind, DEVICE_PEAKS["cpu"])
    if solver.precision == "z":
        peak_tflops = peaks["bf16_tflops"] / 40     # f64 emulation ballpark
    else:
        peak_tflops = peaks["bf16_tflops"] / mm_passes
    # a CEILING takes the SHEET bandwidth (the fastest the chip could
    # ever move the compulsory bytes), not the measured copy-loop rate:
    # fused read-mostly streams measurably exceed the r+w copy number,
    # which made r2's fractions land above 1.  Override: TFQ_HBM_GBPS.
    # Two ceilings: the headline fraction uses the MEASURED-achievable
    # bandwidth (XLA copy-loop rate; the actionable regression metric --
    # the 15-pass fusion lower bound keeps it majorizing real kernels),
    # and fraction_of_sheet_light records the datasheet-bandwidth light
    # (the absolute physical ceiling, unreachable on this relay where
    # even pure copies sustain ~30% of sheet).  Override: TFQ_HBM_GBPS.
    hbm_meas = peaks.get("hbm_gbps_measured", peaks["hbm_gbps"])
    hbm_gbps = float(os.environ.get("TFQ_HBM_GBPS", hbm_meas))
    t_compute = flops / (peak_tflops * 1e12)
    t_bw = bytes_ / (hbm_gbps * 1e9)
    light = max(t_compute, t_bw)
    light_sheet = max(t_compute, bytes_ / (peaks["hbm_gbps"] * 1e9))
    r = Roofline(
        flops_per_iteration=flops, bytes_per_iteration=bytes_,
        device_kind=kind, peak_tflops=peak_tflops,
        peak_gbps=hbm_gbps,
        compute_bound=t_compute >= t_bw, light_speed_s=light,
        vectors_resident=vectors_resident,
    )
    if measured_iteration_s is not None:
        r.measured_s = measured_iteration_s
        r.fraction_of_light = light / max(measured_iteration_s, 1e-30)
        r.fraction_of_sheet_light = (light_sheet
                                     / max(measured_iteration_s, 1e-30))
        r.nnz_mac_per_s = (plan.n_pairs * lm * lm * ln
                           / measured_iteration_s / 2)
    return r


def timed_solve(solver, tolerance: float = 1e-6, max_iterations: int = 999,
                repeats: int = 2):
    """Run repeated solves, return (info, best_wall_s, Roofline) -- the
    nnz/s + fraction-of-light report the benchmark configs require."""
    info = solver.solve(tolerance=tolerance, max_iterations=max_iterations)
    best = None
    for _ in range(max(0, repeats - 1)):
        t0 = time.perf_counter()
        info = solver.solve(tolerance=tolerance,
                            max_iterations=max_iterations)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    if best is None:
        best = float("nan")
    iters = max(info.iterations_needed, 1)
    return info, best, solver_roofline(solver, best / iters)
