"""Conditional partition spreading.

Many per-row-heavy plans (interpreted higher-order-function lambdas, regex
chains, codec mapInPandas) historically forced
``df.repartition(defaultParallelism, key)`` so a tiny single-file bench corpus
— which scans as ONE partition — spreads its work across every core. That
exchange is the right call locally but WRONG unconditionally: on a real
many-file 100 TB corpus the scan is already parallel (thousands of file-split
partitions), and the unconditional form pays a full shuffle of corpus bytes
before map-only work — and ``defaultParallelism`` would even UNDER-partition
the data on a large cluster.

``spread_if_narrow`` keeps the local-bench behavior and removes the
at-scale hazard: it inserts the exchange only when the incoming plan has
fewer partitions than the session's parallelism, and otherwise returns the
input untouched (zero Exchange added — proven by plan test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Width-probe memo: (applicationId, analyzed-plan semanticHash) → partition
# count. Composed pipelines (K1/K3 chain several text ops over one corpus)
# re-load the same table per op and would otherwise pay the ~0.3 ms analyzer
# probe per call site; identical plans have identical scan widths, so one
# probe per loaded corpus per session suffices. Bounded: cleared wholesale
# past _WIDTH_CACHE_MAX (plan-build metadata, not data — entries are ints).
# Staleness: a path re-written WITHIN one session with a different file
# count maps to the same semanticHash; the stale width only mis-answers the
# narrow-or-wide question, and the failure mode is one redundant (or one
# missing) local spread — correctness is never affected.
_WIDTH_CACHE: dict[tuple[str, int], int] = {}
_WIDTH_CACHE_MAX = 512


def _plan_width(df: DataFrame) -> int:
    """Partition count of ``df``'s physical plan, memoized per (session,
    analyzed plan).

    The probe (``df.rdd.getNumPartitions()``) runs the analyzer but no job
    for scan-rooted frames — it reads the plan's partitioning without
    executing it. CAVEAT (AQE): the session enables adaptive execution,
    under which ``.rdd`` on a plan CONTAINING EXCHANGES materializes the
    upstream query stages eagerly (real jobs run). Every call site in this
    repo probes a scan-rooted frame (straight off ``load_tables``), where
    the probe stays free; do not call this — or ``spread_if_narrow`` — on
    an already-shuffled intermediate without accepting that cost.
    """
    key = (df.sparkSession.sparkContext.applicationId, df.semanticHash())
    hit = _WIDTH_CACHE.get(key)
    if hit is None:
        if len(_WIDTH_CACHE) >= _WIDTH_CACHE_MAX:
            _WIDTH_CACHE.clear()
        hit = _WIDTH_CACHE[key] = df.rdd.getNumPartitions()
    return hit


def spread_if_narrow(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition ``df`` across ``defaultParallelism`` only when it is
    narrower than that; a wide input (the 100 TB case) passes through with no
    Exchange.

    With ``keys``: hash-partition on those columns (keeps same-key rows
    co-located for any downstream keyed op). Without: round-robin, for
    spreading a dim-sized side ahead of broadcast-scored work.

    The width probe is memoized per (session, plan) — see ``_plan_width``
    for the probe-cost and AQE caveats.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if _plan_width(df) >= target:
        return df
    if keys:
        return df.repartition(target, *keys)
    return df.repartition(target)
