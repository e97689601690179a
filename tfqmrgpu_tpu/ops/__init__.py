"""Device-side operator library (the TPU analogue of the reference's L0/L1).

* ``layout``      -- host/device data-layout conversion (RIRIRIRI interleave,
                     split re/im planes, block transpose/conjugation).
* ``linalg``      -- per-column fused vector ops: axpy/xpay, segmented
                     dotp/nrm2 reductions, RHS scatter-add.
* ``decisions``   -- the three tfQMR scalar decision updates (dec35/dec34/decT).
* ``blocksparse`` -- block-sparse Y = A @ X over a multiplication pair list
                     (pure-XLA gather/batched-matmul path).
* ``pallas_spmm`` -- Pallas row-tile union kernel for BSR A against dense
                     X panels (panel engines' perf path).
* ``pairpanel``   -- Pallas pair-plan engine: geometry recovery, RCM
                     relabeling, union-ELL panels, VMEM sliding windows.
* ``panel``       -- the dense row-panel vector layout and primitives.
"""

from . import layout
from . import linalg
from . import decisions
from . import blocksparse

__all__ = ["layout", "linalg", "decisions", "blocksparse", "panel",
           "pallas_spmm", "pairpanel"]


def __getattr__(name):
    # lazy submodule access (panel/pallas_spmm/pairpanel import jax.pallas
    # machinery; keep base import light)
    if name in ("panel", "pallas_spmm", "pairpanel"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
