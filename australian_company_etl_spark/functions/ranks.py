"""Distributed exact ranking — the replacement for unpartitioned windows.

`Window.orderBy(...)` with no partition key plans `Exchange SinglePartition`:
the ENTIRE frame moves through one task's sort (Spark itself warns "Moving
all data to a single partition"). Fine at sf0.01; the one plan that cannot
ship against a 100 TB corpus. The two-phase form here is exact and fully
distributed:

1. range-partition the frame on the complete sort key (the key ends in a
   unique id, so it is a TOTAL order — no tie can straddle a partition
   boundary);
2. `row_number` WITHIN each range partition (each task sorts only its
   slice);
3. add the cumulative row count of the preceding partitions — a
   ≤ n_parts×|segments|-row aggregate, broadcast back onto the slices.

`segmented_rank` generalizes the same shape to per-segment ranking
(PARTITION BY seg ORDER BY ...): the range partitioning runs on
(seg_cols ++ order_cols) so one segment may span several partitions (no
partition ever needs to hold a whole segment — the straggler a 5-value
`partitionBy` creates at scale), and the offsets are tracked per
(partition, segment). `global_rank` is the zero-segment special case.

The only SinglePartition exchange left in these plans carries the
offsets aggregate — O(n_parts × segments) rows by construction, never
corpus-scaled. `ntile_from_rank` then derives SQL-standard NTILE(k)
arithmetically from (rank, segment size), bit-identical to the window
function over the same total order.

First proven on the RFM/Pareto rewrites (plans/tpch.py, round 7 —
tie-identical to ntile on the tie-dense replicated sf1 corpus); shared
here so the curriculum and decile plans use the same audited machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def segmented_rank(
    df: DataFrame,
    seg_cols: list[str],
    order_cols: list,
    rank_name: str,
    n_parts: int = 32,
    count_name: str | None = None,
) -> DataFrame:
    """Exact distributed `row_number() OVER (PARTITION BY seg_cols ORDER BY
    order_cols)`. ``order_cols`` must end in a unique key so the combined
    (seg, order) sort is total. ``seg_cols`` may be empty (global rank).
    ``n_parts`` is the local-mode setting; at cluster scale size it like
    any shuffle. NULL segment values rank as their own group, exactly
    like the window form this replaces — the offsets join is null-SAFE
    on the segment columns (a review pass caught the plain equi-join
    silently dropping every NULL-segment row; no current caller has
    nullable segments, but the helper sells itself as a general
    PARTITION BY drop-in).

    ``count_name``: also emit each row's total segment size (the frame's
    total row count when seg_cols is empty) under this column — derived
    from the SAME per-(partition, segment) counts aggregate the offsets
    come from, so consumers that need (rank, segment size) — ntile,
    percent_rank, cume_dist — don't pay a second pass over the input.

    The rank branch and the offsets branch both hang off the same range
    exchange; the printed plan shows it twice with no ReusedExchange
    node, but that is a display artifact of AQE — at RUNTIME the shuffle
    stage is materialized once and read by both branches (measured via
    the stage metrics: shuffle-write bytes ≈ one corpus pass, shuffle-
    read ≈ two), so the corpus is scanned and range-shuffled once."""
    segs = [F.col(c) for c in seg_cols]
    part = df.repartitionByRange(n_parts, *segs, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    counts = part.groupBy("__pid", *seg_cols).agg(F.count("*").alias("__c"))
    w_off = (
        Window.partitionBy(*seg_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_cols = [
        "__pid",
        *seg_cols,
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
    ]
    if count_name is not None:
        w_tot = Window.partitionBy(*seg_cols)
        off_cols.append(F.sum("__c").over(w_tot).alias(count_name))
    offs = counts.select(*off_cols)
    # null-safe join keys for the segment columns (__pid is never null);
    # renamed on the offsets side so the joined frame keeps single copies
    offs = offs.select(
        F.col("__pid").alias("__opid"),
        *[F.col(c).alias(f"__oseg_{i}") for i, c in enumerate(seg_cols)],
        *([F.col("__off")] + ([F.col(count_name)] if count_name is not None else [])),
    )
    cond = part["__pid"] == offs["__opid"]
    for i, c in enumerate(seg_cols):
        cond = cond & part[c].eqNullSafe(offs[f"__oseg_{i}"])
    w_in = Window.partitionBy("__pid", *seg_cols).orderBy(*order_cols)
    # LEFT join + raise_error on a missed offset, not an inner join: the
    # counts branch and the rank branch both hang off the same range
    # exchange, and correctness relies on that exchange materializing ONCE
    # (reused boundaries). If exchange/stage reuse is ever disabled
    # (spark.sql.exchange.reuse=false, AQE off), the two branches can
    # sample DIFFERENT range boundaries — an inner join would then
    # silently drop rows / mis-rank; this guard makes a reuse regression
    # fail loudly instead (ADVICE r08).
    missing = F.raise_error(
        F.lit(
            "segmented_rank: offsets join missed a (partition, segment) — "
            "the range exchange was not reused consistently between the "
            "rank and counts branches (is spark.sql.exchange.reuse off?)"
        )
    )
    out = part.join(F.broadcast(offs), cond, "left").withColumn(
        rank_name,
        F.row_number().over(w_in) + F.coalesce(F.col("__off"), missing.cast("bigint")),
    )
    if count_name is not None:
        # same loud guard on the counts output (ADVICE r09): a consumer that
        # reads only count_name — or a plan where column pruning drops the
        # rank column — must hit the raise_error on a missed offset too, not
        # a silent NULL segment size.
        out = out.withColumn(
            count_name, F.coalesce(F.col(count_name), missing.cast("bigint"))
        )
    return out.drop(
        "__pid", "__off", "__opid", *[f"__oseg_{i}" for i in range(len(seg_cols))]
    )


def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_name: str,
    n_parts: int = 32,
    count_name: str | None = None,
) -> DataFrame:
    """Exact DISTRIBUTED global rank over a total order — the drop-in for
    `row_number() OVER (ORDER BY ...)` (see module docstring).
    ``count_name`` optionally emits the frame's total row count per row,
    derived from the rank's own counts aggregate (no second input pass)."""
    return segmented_rank(df, [], order_cols, rank_name, n_parts, count_name)


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL-standard NTILE(k) computed from an exact rank and the frame's
    total row count: the first n%k buckets hold ceil(n/k) rows, the rest
    floor(n/k) — bit-identical to Spark/DuckDB ntile over the same total
    order (CASE short-circuits, so the q=0 small-n edge never divides by
    zero: rank ≤ n = m·(q+1) keeps every row in the first branch).

    All divisions are INTEGER `div` (not double division truncated): the
    double form is exact only below 2^53 rows per segment, and the repo's
    stated discipline (SURVEY §4 overflow envelope) is exact integer
    arithmetic for anything corpus-count-scaled — this formula is now
    unconditionally exact at any bigint row count (VERDICT r08 task 5)."""
    def idiv(a: Column, b: Column) -> Column:
        # SQL IntegralDivide (`a div b`) on bigints — exact at any scale
        return F.call_function("div", a, b)

    nb = n.cast("bigint")
    rb = rank.cast("bigint")
    q = idiv(nb, F.lit(k).cast("bigint"))
    m = nb % k
    head = m * (q + 1)
    return (
        F.when(rb <= head, idiv(rb - 1, q + 1) + 1)
        .otherwise(m + idiv(rb - head - 1, q) + 1)
        .cast("int")
    )
