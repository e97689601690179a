"""Runtime autotuning -- the TPU replacement for the reference's
compile-time block-size registry and hand-made TUNE table.

The reference enumerates 15 (LM, LN) template instantiations plus a
per-size TUNE constant (reference: allowed_block_sizes.h,
bench_tfqmrgpu.cu:529-547 "extracted from comparison of TUNE={1,2,3,4,6,8}").
Here block shapes are traced jit parameters, so ANY (LM, LN) compiles; what
remains tunable at runtime is the ENGINE (dense / pairs / xla) and the
pair-panel schedule knobs (r_tile, t_step, copy_g).

``autotune_solver`` measures candidates on the actual problem and returns
the fastest Solver.  Two departures from the naive approach:

* the measured quantity is the ISOLATED multiply (a fori_loop chain of
  ``nrep`` multiplies with varied inputs and one host readback), not a full
  solve -- full solves are dominated by dispatch noise and probe-schedule
  luck, and the multiply is where the candidates actually differ;
* results persist to a JSON cache keyed on (pattern hash, LM, LN,
  precision, device kind), so a production service pays the measurement
  once per operator pattern.

``mm_prec`` (bf16x4 vs exact-f32 'highest') is deliberately NOT part of the
search: it is an accuracy POLICY, chosen by the caller's error budget, not
a speed knob to race.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Optional

import numpy as np

from .bsr import Bsr
from .solver import Solver


def _cache_path() -> str:
    d = os.environ.get("TFQ_AUTOTUNE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "tfqmrgpu_tpu")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "autotune.json")


def _pattern_key(plan, lm: int, ln: int, precision: str) -> str:
    import jax

    dev = jax.devices()[0]
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(plan.pairs).tobytes())
    h.update(np.ascontiguousarray(plan.colindx).tobytes())
    h.update(f"{lm}:{ln}:{precision}:"
             f"{getattr(dev, 'device_kind', dev.platform)}".encode())
    return h.hexdigest()[:24]


def _load_cache() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def _store_cache(key: str, entry: dict) -> None:
    cache = _load_cache()
    cache[key] = entry
    try:
        with open(_cache_path(), "w") as f:
            json.dump(cache, f, indent=1)
    except OSError:
        pass


def time_multiply(solver: Solver, nrep: int = 16, repeats: int = 2) -> float:
    """Median-of-best wall time of ONE multiply on the solver's engine.

    Chains ``nrep`` multiplies inside one jit (dispatch overhead through a
    TPU relay is ~30 ms/call) with a renormalization between steps, times
    with VARIED inputs plus a data-dependent host readback (relays memoize
    identical dispatches and complete asynchronously -- see bench.py)."""
    import jax
    import jax.numpy as jnp

    eng = solver.engine
    if eng == "pairs":
        mult = solver._pp
        if mult is None:
            raise RuntimeError("matrix 'A' has not been set")
        pplan = solver._pp_plan
        nyrows = pplan.ntiles * pplan.r_tile * pplan.lm
        pad = pplan.x_rows_padded - nyrows
        sup_mask = solver._sup_mask_fused   # superblock: keep dead merged
        #                                     slots zero in the chain, as
        #                                     the solve itself does

        @jax.jit
        def chain(c, x):
            def body(_, x):
                y = mult.apply(c, x)
                s = 1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
                y = jnp.pad(y, ((0, pad), (0, 0))) * s
                return y if sup_mask is None else y * sup_mask

            return jax.lax.fori_loop(0, nrep, body, x).reshape(-1)[0]

        consts = mult.consts
        x0 = solver._v3
    else:
        # panel engines consume (re, im) pairs; xla consumes block lists
        apply = solver._apply_a

        @jax.jit
        def chain(c, x):
            del c

            def body(_, x):
                y = apply(x)
                s = 1.0 / jnp.maximum(jnp.max(jnp.abs(y[0])), 1e-30)
                return (y[0] * s, y[1] * s)

            return jax.lax.fori_loop(0, nrep, body, x)[0].reshape(-1)[0]

        consts = 0
        x0 = solver._v3
    xs = [jax.tree_util.tree_map(lambda v: v * (1.0 + 0.01 * i), x0)
          for i in range(repeats + 1)]
    _ = float(np.asarray(chain(consts, xs[-1])))     # compile + warm
    best = None
    for i in range(repeats):
        t0 = time.perf_counter()
        _ = float(np.asarray(chain(consts, xs[i])))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / nrep


def default_candidates(precision: str, lm: int = 0) -> list:
    """(engine, env) candidates.  The pairs knobs measured to matter on
    v5e: r_tile (panel inflation vs tile count), t_step (per-grid-step
    fixed cost amortization; 0 = auto VMEM model), copy_g (scalar-copy
    granularity).  At LM <= 8 the pairs engine composes the superblock
    row merge by default; the race also tries it OFF and at the forced
    factors (the routing cost model can misjudge uncommon patterns)."""
    sup: list = []
    if 0 < lm <= 8:
        sup = [("pairs", {"TFQ_SOLVER_SUPER": "0"})] + [
            ("pairs", {"TFQ_SOLVER_SUPER": str(f)})
            for f in sorted({16 // lm, 32 // lm}) if f >= 2]
    if precision == "z":
        # pairs-z = the Ozaki slice kernel (needs LM >= 16 -- at small LM
        # the superblock merge provides it; the harness drops candidates
        # that raise).  The bare ("pairs", {}) candidate IS the xi8
        # default (solver.set_matrix), so the explicit variants race the
        # OTHER layouts: bf16 X slices ("0") and int8-A/bf16-X ("1").
        return [("dense", {}), ("pairs", {}),
                ("pairs", {"TFQ_OZC_INT8": "0"}),
                ("pairs", {"TFQ_OZC_INT8": "1"}),
                ("xla", {})] + sup
    return sup + [
        ("dense", {}),
        ("pallas", {}),                 # row-tile, model-picked r_tile
        ("pallas", {"TFQ_PALLAS_RTILE": "1"}),
        ("pairs", {"TFQ_PAIRS_RTILE": "1"}),   # auto t_step + auto colgroup
        ("pairs", {"TFQ_PAIRS_RTILE": "1", "TFQ_PAIRS_COLGROUP": "1"}),
        ("pairs", {"TFQ_PAIRS_RTILE": "1", "TFQ_PAIRS_TSTEP": "1"}),
        ("pairs", {"TFQ_PAIRS_RTILE": "2"}),
        ("pairs", {"TFQ_PAIRS_RTILE": "1", "TFQ_PAIRS_COPYG": "1"}),
        # resident-X off (auto is the default; the windowed layout can win
        # when the panel crowds the A-panel t_step budget out of VMEM)
        ("pairs", {"TFQ_PAIRS_RTILE": "1", "TFQ_PAIRS_RESIDENT": "0",
                   "TFQ_PAIRS_COLGROUP": "1"}),
        # raised VMEM cap: admits wide-group resident plans (tile-pipelined
        # kernel) that the conservative 100 MB default rejects by a few MB
        ("pairs", {"TFQ_PAIRS_RTILE": "1", "TFQ_PAIRS_VMEM_CAP": "110",
                   "TFQ_PAIRS_VMEM": "110"}),
        ("xla", {}),
    ]


def autotune_solver(a: Bsr, x: Bsr, b: Bsr, *, precision: str = "c",
                    tolerance: float = 1e-5, max_iterations: int = 200,
                    candidates: Optional[list] = None,
                    nrep: int = 16, use_cache: bool = True,
                    search_budget: int = 8,
                    echo: int = 0):
    """Measure candidate engine configurations on the ISOLATED multiply;
    return (best_solver, table).

    After the candidate race, a bounded coordinate-descent search
    perturbs the winning pairs knobs (colgroup, t_step, VMEM cap,
    copy_g) one at a time -- ``search_budget`` extra measurements
    (env TFQ_AUTOTUNE_SEARCH; 0 disables), so values between the fixed
    candidates are reachable.  Results persist across processes keyed on
    the operator pattern (see module docstring); a cache hit builds the
    winning configuration directly without re-measuring."""
    del tolerance, max_iterations        # timing is multiply-only now
    probe = Solver(a, x, b, precision=precision, engine="xla", echo=0)
    if candidates is None:
        candidates = default_candidates(precision, lm=probe.lm)
    key = _pattern_key(probe.plan, probe.lm, probe.ln, precision)
    if use_cache:
        hit = _load_cache().get(key)
        if hit is not None:
            env = hit.get("env", {})
            saved = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                s = Solver(a, x, b, precision=precision,
                           engine=hit["engine"], echo=echo, plan=probe.plan)
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
            if echo > 0:
                print(f"# autotune: cache hit {hit['engine']} {env} "
                      f"({hit.get('ms_per_multiply', '?')} ms/multiply)")
            return s, [dict(**hit, cached=True)]

    table = []
    best = None
    for engine, env in candidates:
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            s = Solver(a, x, b, precision=precision, engine=engine,
                       echo=echo)
            dt = time_multiply(s, nrep=nrep)
            row = dict(engine=engine, env=dict(env),
                       ms_per_multiply=round(dt * 1e3, 4))
            table.append(row)
            if echo > 0:
                print(f"# autotune: {engine} {env} -> "
                      f"{dt*1e3:.3f} ms/multiply")
            if best is None or dt < best[1]:
                best = (s, dt, row)
        except Exception as e:            # engine not applicable
            table.append(dict(engine=engine, env=dict(env),
                              error=f"{type(e).__name__}: {e}"))
            if echo > 0:
                print(f"# autotune: {engine} {env} unavailable ({e})")
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    if best is None:
        raise RuntimeError("no engine configuration succeeded")

    # LOCAL SEARCH around the winner (r3): the candidate list alone
    # cannot discover knob values between its fixed points (a good VMEM
    # cap, a colgroup the model mis-prices, a t_step off the auto pick).
    # Coordinate descent: perturb one pairs knob at a time; an accepted
    # move re-opens its neighbors.  Bounded by ``search_budget`` extra
    # measurements (TFQ_AUTOTUNE_SEARCH, default 8; 0 disables).
    budget = int(os.environ.get("TFQ_AUTOTUNE_SEARCH", str(search_budget)))
    if budget > 0 and best[2]["engine"] == "pairs":
        from .ops import pairpanel as pp_ops

        def measure(env):
            saved = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                s = Solver(a, x, b, precision=precision, engine="pairs",
                           echo=0)
                return s, time_multiply(s, nrep=nrep)
            except Exception:
                return None, float("inf")
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v

        def neighbors(env, sref):
            out = []
            gp = getattr(sref, "_gp", None)
            g_cur = gp.group_size if gp is not None else 1
            t_cur = int(env.get("TFQ_PAIRS_TSTEP", "0")) or \
                pp_ops.auto_t_step(sref._pp_plan, sref._pp_prec)
            for g in (g_cur // 2, g_cur * 2):
                if 1 <= g <= 16 and g * sref.ln <= 512 and g != g_cur:
                    out.append({**env, "TFQ_PAIRS_COLGROUP": str(g)})
            for t in (max(t_cur // 2, 1), min(t_cur * 2, 128)):
                if t != t_cur:
                    out.append({**env, "TFQ_PAIRS_TSTEP": str(t)})
            cap = int(env.get("TFQ_PAIRS_VMEM_CAP", "100"))
            for c in (cap + 10, cap - 10):
                if 80 <= c <= 120 and c != cap:
                    out.append({**env, "TFQ_PAIRS_VMEM_CAP": str(c),
                                "TFQ_PAIRS_VMEM": str(c)})
            cg = int(env.get("TFQ_PAIRS_COPYG", "2"))
            for c in (1, 2, 4):
                if c != cg:
                    out.append({**env, "TFQ_PAIRS_COPYG": str(c)})
            return out

        cur_env = dict(best[2]["env"])
        seen = {json.dumps(cur_env, sort_keys=True)}
        improved = True
        while improved and budget > 0:
            improved = False
            for env in neighbors(cur_env, best[0]):
                kk = json.dumps(env, sort_keys=True)
                if kk in seen or budget <= 0:
                    continue
                seen.add(kk)
                budget -= 1
                s, dt = measure(env)
                row = dict(engine="pairs", env=dict(env),
                           ms_per_multiply=round(dt * 1e3, 4),
                           search=True)
                table.append(row)
                if echo > 0:
                    print(f"# autotune search: {env} -> "
                          f"{dt*1e3:.3f} ms/multiply")
                if s is not None and dt < best[1]:
                    best = (s, dt, row)
                    cur_env = dict(env)
                    improved = True
                    break                 # re-open the neighborhood

    if use_cache:
        _store_cache(key, best[2])
    return best[0], table
