"""Driver-side concurrency for independent Spark actions (guide §2.6).

One shared helper so every overlap site uses
``pyspark.inheritable_thread_target``: under PySpark's default
pinned-thread mode a plain thread neither inherits job
groups/descriptions/local properties nor releases its pinned JVM
thread promptly — harmless at pool size 2-4, but a latent footgun as
the overlap pattern spreads (r12 ADVICE). The wrapper propagates the
caller's JVM thread-locals into each worker and is a no-op when
pinning is disabled.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Sequence


def _inheritable(fn: Callable) -> Callable:
    try:
        from pyspark import inheritable_thread_target

        return inheritable_thread_target(fn)
    except Exception:  # no active session/JVM (pure-python tests)
        return fn


def par_map(fns: Sequence[Callable[[], Any]],
            max_workers: int | None = None) -> list:
    """Run independent zero-arg driver actions concurrently; results
    in input order. Results identical to sequential by independence —
    this only changes driver scheduling, never a plan."""
    if not fns:
        return []
    if len(fns) == 1:
        return [fns[0]()]
    with ThreadPoolExecutor(max_workers=max_workers or len(fns)) as pool:
        futs = [pool.submit(_inheritable(f)) for f in fns]
        return [f.result() for f in futs]


def par2(fa: Callable[[], Any], fb: Callable[[], Any]) -> tuple:
    """Two independent driver actions, overlapped (the reconciliation
    pattern: the scheduler back-fills the second job into the first's
    stage tails)."""
    a, b = par_map([fa, fb])
    return a, b


def par_pool_map(fn: Callable, args: Iterable,
                 max_workers: int) -> list:
    """``pool.map`` with inheritable threads — for N independent
    actions sharing one function."""
    items = list(args)
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futs = [pool.submit(_inheritable(fn), a) for a in items]
        return [f.result() for f in futs]
