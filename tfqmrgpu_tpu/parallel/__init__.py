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


def solve_sharded(a, x, b, *, mesh=None, n_devices: int = 0,
                  engine: str = "auto", precision: str = "c",
                  tolerance: float = 1e-5, max_iterations: int = 300,
                  r_tile: int = 0, interpret=None):
    """One-call mesh-sharded solve: returns (X blocks complex, info dict).

    The multi-chip analogue of ``tfqmrgpu_tpu.solve``: builds the plan,
    shards A/X/B over a 1-D "rows" mesh (``mesh`` or ``n_devices``, default
    all local devices), and solves with a sharded engine:

    * 'rowtile' -- union-ELL row slabs, X panel resident per shard
      (fastest when the X panel fits VMEM);
    * 'pairs'   -- pair-plan Pallas panels with t_step batching and the
      local/remote halo-overlap tile split;
    * 'auto'    -- 'rowtile' when the X panel fits, else 'pairs'.

    precision 'c' iterates in float32; precision 'm' additionally refines
    to f64 residuals (one emulated-f64 SpMM per round, sharded f32
    correction solves -- see ``parallel.mixed``).  Stopping is globally
    synchronized and bit-identical to one device.
    """
    import numpy as np

    if precision not in ("c", "m"):
        raise ValueError("sharded engines iterate in float32: use "
                         "precision 'c', or 'm' for f64-residual "
                         "refinement; plain 'z' runs on one device")
    plan, sp, eng = _build_sharded(a, x, b, mesh=mesh, n_devices=n_devices,
                                   engine=engine, r_tile=r_tile,
                                   interpret=interpret)
    if precision == "m":
        from .mixed import solve_sharded_mixed

        xc, info = solve_sharded_mixed(
            a, x, b, plan, sp, tolerance=tolerance,
            max_iterations=max_iterations)
    else:
        xc, info = sp.solve(np.asarray(a.data.real),
                            np.asarray(a.data.imag),
                            np.asarray(b.data.real),
                            np.asarray(b.data.imag),
                            tolerance=tolerance,
                            max_iterations=max_iterations)
    info["engine"] = eng
    return xc, info


def _build_sharded(a, x, b, *, mesh=None, n_devices: int = 0,
                   engine: str = "auto", r_tile: int = 0, interpret=None):
    """Shared plumbing of solve_sharded: plan + engine pick + solver."""
    import jax

    from ..plan import create_plan
    from .sharded_pairs import ShardedPairsSolver
    from .sharded_rowtile import ShardedRowTileSolver

    if mesh is None:
        mesh = make_mesh(int(n_devices) or len(jax.devices()), 1)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    plan = create_plan(a, x, b)
    lm = a.slow_block_dim or b.slow_block_dim
    ln = b.fast_block_dim or lm
    plan.lm, plan.ln = int(lm), int(ln)
    eng = engine
    if eng == "auto":
        x_panel_bytes = 2 * plan.nrows * plan.lm * plan.ncols * plan.ln * 4
        eng = "rowtile" if (plan.lm >= 8
                            and x_panel_bytes <= (90 << 20)) else "pairs"
    if eng == "rowtile":
        sp = ShardedRowTileSolver(plan, mesh, r_tile=r_tile,
                                  interpret=interpret)
    elif eng == "pairs":
        sp = ShardedPairsSolver(plan, mesh, interpret=interpret)
    else:
        raise ValueError(f"unknown sharded engine {engine!r}")
    return plan, sp, eng


__all__.append("solve_sharded")
