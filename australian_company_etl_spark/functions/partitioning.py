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


def spread_if_narrow(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition ``df`` across ``defaultParallelism`` only when it is
    narrower than that; a wide input (the 100 TB case) passes through with no
    Exchange.

    With ``keys``: hash-partition on those columns (keeps same-key rows
    co-located for any downstream keyed op). Without: round-robin, for
    spreading a dim-sized side ahead of broadcast-scored work.

    The width probe (``df.rdd.getNumPartitions()``) runs the analyzer but no
    job — it reads the physical plan's partitioning, it does not execute it.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if keys:
        return df.repartition(target, *keys)
    return df.repartition(target)
