"""Phase timing / profiling.

Reference: the ``comm_timing`` decorator + ``config.time/flag`` globals
(pyDNMFk/utils.py:539-567, config.py:1-5) which accumulate MPI.Wtime deltas
per function name.  Two reference warts fixed by design:

  * the enable flag is checked at *call* time, not latched at import
    (the reference latches at decoration time — utils.py:555-556 — so
    ``--timing_stats`` silently no-ops unless set before imports,
    main.py:58);
  * timings block on device completion (``block_until_ready``) so they
    measure real work, not dispatch.

``jax.profiler`` traces can be layered on top via ``trace()`` for XLA-level
compute/communication breakdown.
"""
from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Dict, Optional

import jax

# mutable module state (mirrors reference config.time / config.flag,
# but read dynamically)
TIMINGS: Dict[str, float] = {}
ENABLED: bool = False

# the reference's own category taxonomy (plot_results.timing_stats :157-201)
CATEGORIES = {
    "init": ["__init__", "init_factors", "compute_global_dim",
             "compute_local_dim"],
    "data_io": ["read", "read_global", "read_chunk", "save_factors",
                "save_cluster_results"],
    "sampling": ["sample_ensemble", "sample_one"],
    "dist_compute": ["solve", "mu_fro_step", "mu_kl_step", "hals_step",
                     "bcd_solve", "svd", "nnsvd"],
    "clustering": ["cluster_ensemble", "fit_clustering"],
}


def enable(on: bool = True):
    global ENABLED
    ENABLED = on


def reset():
    TIMINGS.clear()


def _record(name: str, dt: float):
    TIMINGS[name] = TIMINGS.get(name, 0.0) + dt


@contextlib.contextmanager
def timed(name: str):
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _record(name, time.perf_counter() - t0)


def timed_fn(fn: Callable) -> Callable:
    """Decorator analogue of reference comm_timing; flag read per call."""
    @functools.wraps(fn)
    def wrapper(*a, **kw):
        if not ENABLED:
            return fn(*a, **kw)
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        out = jax.block_until_ready(out) if _is_arrayish(out) else out
        _record(fn.__name__, time.perf_counter() - t0)
        return out
    return wrapper


def _is_arrayish(x) -> bool:
    try:
        jax.tree_util.tree_leaves(x)
        return True
    except Exception:
        return False


def category_breakdown() -> Dict[str, float]:
    """Group accumulated timings into the reference's categories."""
    out = {c: 0.0 for c in CATEGORIES}
    other = 0.0
    for name, dt in TIMINGS.items():
        for cat, names in CATEGORIES.items():
            if name in names:
                out[cat] += dt
                break
        else:
            other += dt
    out["other"] = other
    return out


def save_csv(path: str):
    import pandas as pd
    pd.DataFrame([TIMINGS]).to_csv(path)


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """XLA profiler trace (TPU): compute vs collective breakdown in
    TensorBoard; replaces the reference's Timing_stats.csv taxonomy at the
    hardware level."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield
