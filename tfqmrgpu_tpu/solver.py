"""High-level plan/handle-style solver API (layer L3 equivalent).

The reference exposes a 10-step C workflow (createHandle -> createPlan ->
bufferSize -> setBuffer -> setMatrix('A'/'B') -> solve -> getInfo ->
getMatrix('X') -> destroy*, see tfqmrgpu.cu:700-791).  On TPU the handle and
explicit buffer management dissolve -- XLA owns device memory and streams --
so the surviving state is the ``Solver`` object: plan + device-resident
matrices + compiled solve.  ``api.py`` layers a call-by-call C-API-parity
shim on top of this for users porting from the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import core
from .bsr import Bsr
from .errors import Status, TfqmrgpuError, encode_status
from .ops import layout as layout_ops
from .ops.blocksparse import BlockSparseAction
from .plan import Plan, create_plan


def _dtype_for(precision: str):
    if precision == "z":
        if not jax.config.read("jax_enable_x64"):
            raise TfqmrgpuError(
                encode_status(Status.PRECISION_MISSMATCH),
                "'z' (complex128) precision requires jax_enable_x64; call "
                "tfqmrgpu_tpu.enable_x64() first",
            )
        return jnp.float64
    if precision == "c":
        return jnp.float32
    raise TfqmrgpuError(encode_status(Status.PRECISION_MISSMATCH),
                        f"precision must be 'z' or 'c', got {precision!r}")


@dataclasses.dataclass
class SolveInfo:
    """getInfo parity (tfqmrgpu.cu:663-679)."""

    residuum_reached: float
    iterations_needed: int
    flops_performed: float
    flops_performed_all: float
    return_status: int = 0
    rhs_status: Optional[np.ndarray] = None


class Solver:
    """Block-sparse tfQMR solver for A @ X == B.

    Args:
      a, x, b: BSR operators.  A must carry square [LM, LM] blocks; B carries
        [LM, LN] blocks; X provides the solution pattern (data optional).
        B's pattern must be a subset of X's.
      precision: 'z' (complex128) or 'c' (complex64).
      engine: 'xla' | 'pallas' SpMM implementation.
      index_offset: 0 for C-style, 1 for Fortran-style rowptr/colind.
    """

    def __init__(self, a: Bsr, x: Bsr, b: Bsr, *, precision: str = "z",
                 engine: str = "xla", index_offset: int = 0, echo: int = 0):
        self.plan: Plan = create_plan(a, x, b, index_offset=index_offset,
                                      echo=echo)
        self.precision = precision
        self.dtype = _dtype_for(precision)
        self.engine = engine
        self.echo = echo
        lm = a.slow_block_dim or (x.slow_block_dim or b.slow_block_dim)
        ln = (b.fast_block_dim or x.fast_block_dim) or lm
        if lm < 1:
            raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                                "cannot infer block dims; attach data to A/B")
        if ln < lm:
            raise TfqmrgpuError(
                encode_status(Status.UNDOCUMENTED_ERROR),
                f"LN={ln} < LM={lm}: rectangular blocks need LN >= LM")
        self.lm, self.ln = int(lm), int(ln)
        self.plan.lm, self.plan.ln = self.lm, self.ln
        self.plan.precision = precision

        self._colindx = jnp.asarray(self.plan.colindx.astype(np.int32))
        self._subset = jnp.asarray(self.plan.subset.astype(np.int32))
        self._action: Optional[BlockSparseAction] = None
        self._b: Optional[tuple] = None
        self._x_result = None
        self._info: Optional[SolveInfo] = None
        self._v3 = core.make_shadow_vector(self.plan.nnzb_x, self.lm, self.ln)

        if a.data is not None:
            self.set_matrix("A", a.data)
        if b.data is not None:
            self.set_matrix("B", b.data)

    # ------------------------------------------------------------- matrices

    def set_matrix(self, var: str, val, *, trans: str = "n",
                   layout: int = layout_ops.LAYOUT_RIRIRIRI,
                   scale: float = 1.0):
        """Upload operator data ('A' or 'B'); accepts complex ndarrays
        [nnzb, d1, d2] or real interleaved arrays in any reference layout
        (setMatrix parity, tfqmrgpu.cu:609-621)."""
        var = var.upper()
        val = np.asarray(val)
        npdt = np.float64 if self.dtype == jnp.float64 else np.float32
        if var == "A":
            re, im = layout_ops.to_planes(
                val, self.plan.nnzb_a, self.lm, self.lm, trans=trans,
                layout=layout, scale=scale, dtype=npdt)
            self._action = BlockSparseAction.from_plan(
                self.plan, re, im, engine=self.engine, ln=self.ln)
        elif var == "B":
            re, im = layout_ops.to_planes(
                val, self.plan.nnzb_b, self.lm, self.ln, trans=trans,
                layout=layout, scale=scale, dtype=npdt)
            self._b = (jnp.asarray(re), jnp.asarray(im))
        elif var == "X":
            # initial guess: accepted for API parity; the solver starts from
            # zero exactly like the reference (tfqmrgpu_core.hxx:125)
            pass
        else:
            raise TfqmrgpuError(
                encode_status(Status.VARIABLENAME_UNKNOWN, 0, var),
                f"var={var!r}")

    def get_matrix(self, var: str = "X", *, trans: str = "n",
                   layout: Optional[int] = None) -> np.ndarray:
        """Retrieve the solution X as a complex ndarray [nnzbX, LM, LN]
        (or reference-layout real array when ``layout`` is given);
        getMatrix parity (tfqmrgpu.cu:624-645, restricted to 'X')."""
        if var.upper() != "X":
            raise TfqmrgpuError(
                encode_status(Status.VARIABLENAME_UNKNOWN, 0, var),
                "getMatrix supports only 'X'")
        if self._x_result is None:
            raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                                "solve() has not been called")
        re = np.asarray(self._x_result[0])
        im = np.asarray(self._x_result[1])
        if layout is None:
            if trans == "t":
                re, im = np.swapaxes(re, 1, 2), np.swapaxes(im, 1, 2)
            return layout_ops.planes_to_complex(re, im)
        return layout_ops.from_planes(re, im, trans=trans, layout=layout)

    # ---------------------------------------------------------------- solve

    @property
    def action(self) -> BlockSparseAction:
        if self._action is None:
            raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                                "matrix 'A' has not been set")
        return self._action

    def solve(self, tolerance: float = 1e-6, max_iterations: int = 999,
              rhs_trivial: bool = False) -> SolveInfo:
        if self._b is None and not rhs_trivial:
            raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                                "matrix 'B' has not been set")
        b = self._b
        if b is None:  # trivial RHS: shape placeholder, rebuilt on device
            z = jnp.zeros((self.plan.nnzb_b, self.lm, self.ln), self.dtype)
            b = (z, z)
        result = core.solve_core(
            self.action, b, self._v3, self._colindx, self._subset,
            tolerance, max_iterations,
            ncols=self.plan.ncols, lm=self.lm, ln=self.ln,
            rhs_trivial=rhs_trivial,
        )
        self._x_result = result.x
        iters = int(result.iterations)
        n_probes = int(result.n_probes)
        status = int(result.return_status)
        actual_iters = iters if status == int(Status.SUCCESS) else \
            min(int(max_iterations), iters)
        flops = (actual_iters * core.flops_per_iteration(
                     self.plan.n_pairs, self.plan.nnzb_x, self.lm, self.ln)
                 + n_probes * core.flops_per_probe(
                     self.plan.n_pairs, self.plan.nnzb_x, self.lm, self.ln))
        self.plan.residuum_reached = float(result.residuum)
        self.plan.iterations_needed = actual_iters
        self.plan.flops_performed = flops
        self.plan.flops_performed_all += flops
        self._info = SolveInfo(
            residuum_reached=float(result.residuum),
            iterations_needed=actual_iters,
            flops_performed=flops,
            flops_performed_all=self.plan.flops_performed_all,
            return_status=status,
            rhs_status=np.asarray(result.rhs_status),
        )
        return self._info

    def get_info(self) -> SolveInfo:
        if self._info is None:
            raise TfqmrgpuError(encode_status(Status.NO_INFO_PASSED),
                                "solve() has not been called")
        return self._info


# ------------------------------------------------------------- one-callers

def solve(a: Bsr, x: Bsr, b: Bsr, *, precision: str = "z",
          tolerance: float = 1e-6, max_iterations: int = 999,
          engine: str = "xla", index_offset: int = 0,
          echo: int = 0) -> tuple[Bsr, SolveInfo]:
    """One-call convenience: returns (X with data attached, SolveInfo).
    The TPU analogue of tfqmrgpu::tfqmrgpu_bsrsv (tfqmrgpu.cu:700-791)."""
    s = Solver(a, x, b, precision=precision, engine=engine,
               index_offset=index_offset, echo=echo)
    info = s.solve(tolerance=tolerance, max_iterations=max_iterations)
    return x.with_data(s.get_matrix("X")), info


def bsrsv(a: Bsr, x: Bsr, b: Bsr, *, precision: str = "z",
          tolerance: float = 1e-6, max_iterations: int = 999,
          index_offset: int = 0, echo: int = 0):
    return solve(a, x, b, precision=precision, tolerance=tolerance,
                 max_iterations=max_iterations, index_offset=index_offset,
                 echo=echo)


def bsrsv_z(a, x, b, **kw):
    """complex128 one-call solve (reference: tfqmrgpu_bsrsv_z,
    tfqmrgpu.cu:796-809)."""
    kw.setdefault("precision", "z")
    return bsrsv(a, x, b, **kw)


def bsrsv_c(a, x, b, **kw):
    """complex64 one-call solve (reference: tfqmrgpu_bsrsv_c,
    tfqmrgpu.cu:812-822)."""
    kw.setdefault("precision", "c")
    return bsrsv(a, x, b, **kw)
