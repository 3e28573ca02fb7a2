"""Session-scoped tracked persists.

Plan builders persist intermediates that feed multiple branches (shingle
tables, band tables, fixpoint labels). A returned DataFrame may still depend
on those caches, so the builder itself can't unpersist them — but a session
that runs many queries back-to-back (the driver gate runs 80+) would
otherwise accumulate cached blocks until eviction pressure.

Contract: ``persist_tracked(df)`` persists and registers the frame;
``release_tracked()`` unpersists everything registered so far. The query
registry (`plans.all_queries`) calls ``release_tracked()`` at the START of
every top-level query invocation — by then the previous query's result has
been materialized, so its caches are dead weight. Composed plans (K1 calling
F2 internally) share one top-level invocation and keep their caches alive
for the whole build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for release at the next query start.

    Safe on an already-persisted frame (only tracked, not re-persisted)."""
    if not df.storageLevel.useMemory and not df.storageLevel.useDisk:
        df = df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> None:
    while _TRACKED:
        _TRACKED.pop().unpersist()
