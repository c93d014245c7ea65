"""Tracked persist: cache handles with a session-wide release point.

Operators that persist a multi-consumer intermediate (shingle frames in
dedup, exploded chunks in simhash, first-pass packs in packing) build and
return a *lazy* DataFrame -- the terminal action happens in the caller
(driver collect, bench write, test assertion), so the operator itself has
no correct place to ``unpersist()``.  Round-2's bench showed what happens
when nobody does: 16 queries x 5 repeats accumulated dozens of never-freed
cached RDDs that evicted each other under memory pressure (+24% on the
common query set, 3.6x on the flagship minhash path).

The fix is a registry: operators call :func:`tracked_persist` instead of
``DataFrame.persist`` and any harness that drives actions to completion
(bench.py between repeats, tools/driver_sim.py between queries, the test
suite's fixture teardown) calls :func:`release_tracked` afterwards.
Unpersisting is always safe -- a released handle recomputes from lineage
if re-used -- so the registry can be drained aggressively.

Self-managed persists with a terminal consumer in the same function (e.g.
``plans/publish.py`` which unpersists after its writes) do NOT go through
the registry; it exists only for caches whose lifetime crosses an API
boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel | None = None
) -> DataFrame:
    """Persist ``df`` and register the handle for later release.

    Returns the same DataFrame (persist marks in place); the registered
    handle is dropped -- blocks freed -- at the next :func:`release_tracked`.
    """
    df = df.persist(level) if level is not None else df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked cache (blocking=False); returns the count.

    Safe to call at any time: dependents of a released cache recompute
    from lineage.  Intended call sites are 'between units of work' --
    bench repeats, driver-sim queries, test teardown -- where all actions
    on the cached plans have completed.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # a stopped session invalidates handles; dropping the
            # reference is all that's left to do
            pass
    return n
