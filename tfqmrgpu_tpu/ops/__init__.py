"""Device-side operator library (the TPU analogue of the reference's L0/L1).

* ``layout``      -- host/device data-layout conversion (RIRIRIRI interleave,
                     split re/im planes, block transpose/conjugation).
* ``linalg``      -- per-column fused vector ops: axpy/xpay, segmented
                     dotp/nrm2 reductions, RHS scatter-add.
* ``decisions``   -- the three tfQMR scalar decision updates (dec35/dec34/decT).
* ``blocksparse`` -- block-sparse Y = A @ X over a multiplication pair list
                     (pure-XLA gather/batched-matmul path).
* ``pallas_spmm`` -- the Pallas MXU kernel for the same contraction (perf path).
"""

from . import layout
from . import linalg
from . import decisions
from . import blocksparse

__all__ = ["layout", "linalg", "decisions", "blocksparse"]
