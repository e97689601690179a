"""Multi-device / multi-host layer (new territory -- absent in the reference,
which is single-GPU: tfqmrgpu_handle.hxx:4-6, SURVEY.md §5.8).

Block rows of A, X and B are partitioned over a 1-D ``jax.sharding.Mesh``
axis; each device runs the local pair-list SpMM against an X working set
completed by halo exchange, and the per-RHS segmented reductions finish with
a ``psum`` over the mesh.  Scalar recurrences are replicated.
"""

from .partition import RowPartition, partition_plan
from .sharded import ShardedAction, sharded_solve, sharded_solve_core, \
    make_mesh
from .sharded_panel import ShardedPanelSolver
from .sharded_pairs import ShardedPairsSolver
from .sharded_rowtile import ShardedRowTileSolver

__all__ = ["RowPartition", "partition_plan", "ShardedAction",
           "sharded_solve", "sharded_solve_core", "make_mesh",
           "ShardedPanelSolver", "ShardedPairsSolver",
           "ShardedRowTileSolver"]
