"""Python example: solve A @ X == B from scipy BSR matrices.

Behavior parity with the reference's Python example
(reference: example/tfqmrgpu_python_example.py, which drives the CUDA
library through ctypes over scipy.sparse.bsr_matrix); here the native
Python API does the same in two lines.

Run:  PYTHONPATH=. python examples/tfqmrgpu_python_example.py
"""

import numpy as np
from scipy.sparse import bsr_matrix

import tfqmrgpu_tpu as tq

mb, lm, ln, ncols = 8, 4, 4, 2
rng = np.random.default_rng(42)

# block-sparse A: diagonal + one off-diagonal band, diagonally dominant
indptr = np.arange(mb + 1) * 2
indices = np.array([[i, (i + 1) % mb] for i in range(mb)]).reshape(-1)
order = np.argsort(indices.reshape(mb, 2), axis=1)
indices = np.take_along_axis(indices.reshape(mb, 2), order, 1).reshape(-1)
blocks = (rng.standard_normal((2 * mb, lm, lm))
          + 1j * rng.standard_normal((2 * mb, lm, lm)))
for i in range(mb):
    for k in range(indptr[i], indptr[i + 1]):
        if indices[k] == i:
            blocks[k] += 10 * np.eye(lm)
a_scipy = bsr_matrix((blocks, indices, indptr),
                     shape=(mb * lm, mb * lm))

# X pattern (dense over ncols columns), B subset (one block per column)
x_pat = tq.Bsr(mb, ncols, np.arange(mb + 1) * ncols,
               np.tile(np.arange(ncols), mb), None, name="X")
b_data = (rng.standard_normal((ncols, lm, ln))
          + 1j * rng.standard_normal((ncols, lm, ln)))
b = tq.Bsr(mb, ncols, np.concatenate([[0], np.cumsum(
    [1 if r < ncols else 0 for r in range(mb)])]),
    np.arange(ncols), b_data, name="B")

tq.enable_x64()
a = tq.Bsr.from_scipy_bsr(a_scipy, name="A")
x, info = tq.bsrsv_z(a, x_pat, b, tolerance=1e-10, max_iterations=300)

print(f"# converged in {info.iterations_needed} iterations to "
      f"residuum {info.residuum_reached:.3e}")

# independent check: dense |A X - B|
ad = a_scipy.toarray()
xd = x.to_scipy_bsr().toarray()
bd = b.to_scipy_bsr().toarray()
dev = np.max(np.abs(ad @ xd - bd))
print(f"# max|A@X - B| = {dev:.3e}")
assert dev < 1e-7
print("tfqmrgpu_python_example: OK")
