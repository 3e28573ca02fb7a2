"""Group E — analytics engine core (TPC-H-style), the bench headliners.

All plans are single declarative DataFrame expressions: Catalyst pushes the
filters into the parquet scan, prunes columns, and (with AQE) picks
broadcast joins for the dim tables. Money/quantity aggregates run as exact
integer units (functions/exactmath.py) so summation order can't flip the
value hash at any scale; only the final integer→double cast is float.

Scale notes (100 TB): lineitem⋈orders is the only fact-fact shuffle; orders,
customer, nation, region, supplier are broadcast-eligible at real-world dim
sizes (supplier/customer at TPC-H SF100k would NOT be — those joins shuffle
on the key and AQE handles skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from australian_company_etl_spark.sources.registry import load_tables

# Exact money arithmetic (see functions/exactmath.py for the rationale:
# float revenue sums flipped q5's 2-dp rounding at the replicated sf1).
from australian_company_etl_spark.functions.exactmath import (  # noqa: E402
    D38 as _D38,
    sum_cents,
    sum_cents_sql,
    cents as _cents,
    cents_sql as _cents_sql,
    money as _money,
    money_sql as _money_sql,
)


def _rev_e4() -> Column:
    """l_extendedprice * (1 - l_discount) in exact 1e-4 currency units."""
    return _cents("l_extendedprice") * _cents(1 - F.col("l_discount"))


REV_E4_SQL = f"({_cents_sql('l_extendedprice')} * {_cents_sql('1 - l_discount')})"

Q1_CUTOFF = "1998-09-02"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-03-15"
Q5_REGION = "ASIA"
Q5_START, Q5_END = "1996-01-01", "1997-01-01"
Q6_START, Q6_END = "1996-01-01", "1997-01-01"
Q10_START, Q10_END = "1996-10-01", "1997-01-01"


def _orders_bytes(sf_dir: str) -> int:
    """On-disk bytes of the orders table — the pure data property that
    gates q3's shuffled-hash hint (same pattern as dedup._docs_bytes)."""
    import os

    from australian_company_etl_spark.sources.registry import table_path

    p = table_path(sf_dir, "orders")
    if os.path.isdir(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, files in os.walk(p)
            for f in files
        )
    return os.path.getsize(p) if os.path.exists(p) else 0


def _q3_shj_max_bytes(spark) -> int:
    """Upper bound on the orders table's on-disk size below which q3's
    shuffled-hash hint is safe: heap//16. Arithmetic at the bound (8 GiB
    heap → 512 MiB zstd orders ≈ 4M segment-filtered build rows ≈ 300 MB
    hashed relation) spread over ≥32 shuffle partitions is ~10 MB of build
    per task — far from the q5-measured thrash point (~7M rows per a
    handful of partitions). Above the bound the join is unhinted (SMJ or
    whatever AQE picks); a cluster deployment that raises partitions with
    the corpus can raise the bound in lockstep."""
    from australian_company_etl_spark.plans.dedup import _parse_jvm_mem

    try:
        heap = _parse_jvm_mem(
            spark.sparkContext.getConf().get("spark.driver.memory", "8g")
        )
    except (ValueError, TypeError):
        heap = 8 << 30
    return heap // 16


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report (reference parity: the engine's
    group-agg core; run_quality_checks.py-style aggregate reporting)."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    qty = F.round(F.col("l_quantity")).cast("bigint")  # integer-valued column
    cents = _cents("l_extendedprice")
    disc_cents = _cents("l_discount")
    e4_disc_price = _rev_e4()
    e6_charge = e4_disc_price * _cents(1 + F.col("l_tax"))
    # Two-phase exact sum (measured 1.8x over direct DECIMAL(38,0) sums at
    # sf0.1): phase 1 sums BIGINT per (group, input partition) — exact
    # because a partition is bounded by maxPartitionBytes (~2e6 rows x
    # <=1.1e11 e-6 units/row = 2e17 << 2^63) — phase 2 merges the tiny
    # per-partition partials as DECIMAL(38,0), where overflow safety is
    # needed but the row count is groups x partitions, not the fact table.
    partial = (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("pid"))
        .agg(
            F.sum(qty).alias("sq"),
            F.sum(cents).alias("sc"),
            F.sum(e4_disc_price).alias("s4"),
            F.sum(e6_charge).alias("s6"),
            F.sum(disc_cents).alias("sd"),
            F.count("*").alias("n"),
        )
    )
    agg = partial.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("sq").cast(_D38)).alias("sq"),
        F.sum(F.col("sc").cast(_D38)).alias("sc"),
        F.sum(F.col("s4").cast(_D38)).alias("s4"),
        F.sum(F.col("s6").cast(_D38)).alias("s6"),
        F.sum(F.col("sd").cast(_D38)).alias("sd"),
        F.sum("n").alias("n"),
    )
    n = F.col("n")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("sq").cast("double"), 2).alias("sum_qty"),
        _money(F.col("sc"), 2).alias("sum_base_price"),
        _money(F.col("s4"), 4).alias("sum_disc_price"),
        _money(F.col("s6"), 6).alias("sum_charge"),
        F.round(F.col("sq").cast("double") / n, 2).alias("avg_qty"),
        F.round(F.col("sc").cast("double") / (n * 100), 2).alias("avg_price"),
        F.round(F.col("sd").cast("double") / (n * 100), 4).alias("avg_disc"),
        n.alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


Q1_SQL = f"""
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         sum(CAST(round(l_quantity) AS BIGINT))      AS sq,
         sum({_cents_sql("l_extendedprice")})        AS sc,
         sum({REV_E4_SQL})                           AS s4,
         sum({REV_E4_SQL} * {_cents_sql("1 + l_tax")}) AS s6,
         sum({_cents_sql("l_discount")})             AS sd,
         count(*)                                    AS n
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       round(sq::DOUBLE, 2)                 AS sum_qty,
       {_money_sql("sc", 2)}                AS sum_base_price,
       {_money_sql("s4", 4)}                AS sum_disc_price,
       {_money_sql("s6", 6)}                AS sum_charge,
       round(sq::DOUBLE / n, 2)             AS avg_qty,
       round(sc::DOUBLE / (n * 100), 2)     AS avg_price,
       round(sd::DOUBLE / (n * 100), 4)     AS avg_disc,
       n                                    AS count_order
FROM agg
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped-revenue orders for one market segment."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    cust = t["customer"].filter(F.col("c_mktsegment") == Q3_SEGMENT)
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp"))
    # r12 (measured, guide §3.1): reduce orders by the segment-filtered
    # customer FIRST (the dim filter prunes ~80% of orders before the big
    # lineitem join), and take the pruned side as the shuffled-HASH build of
    # that join — it is far below lineitem (no sort of the 60M-row stream
    # side). Interleaved sf10 A/B: 5.1s → 2.7s min, consistent across three
    # rounds. The segment-filtered customer is ~20% of ALL customers — it
    # scales with SF, so a mandatory broadcast would die collecting it
    # instead of degrading to a shuffle join; unhinted, AQE still broadcasts
    # it INSIDE the orders⋈customer join at any SF where it fits.
    # r13 (VERDICT r12 item 3): the SHJ hint is SIZE-GUARDED like setsim's
    # broadcast — the build side scales with SF while shuffle partitions
    # are derived from cores, so an unguarded hint turns into allocator
    # thrash once a per-partition build outgrows the heap (measured on q5:
    # 34.9 s + GCLocker warnings at a ~7M-row build). The hint applies only
    # while the orders table's on-disk bytes stay under a heap-coupled
    # bound (_q3_shj_max_bytes); above it the join is left unhinted and the
    # planner's sort-merge/AQE choice stands. Plan is a pure function of
    # (corpus bytes, configured heap), never of JVM heap state.
    pruned = orders.join(cust, orders.o_custkey == cust.c_custkey)
    if _orders_bytes(sf_dir) <= _q3_shj_max_bytes(spark):
        pruned = pruned.hint("shuffle_hash")
    return (
        li.join(
            pruned,
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_money(F.sum(_rev_e4().cast(_D38)), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       {_money_sql(f"sum({REV_E4_SQL})", 4)}             AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS o_orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where supplier and customer share the
    nation, within one region and order-date year.

    r12 optimization round, measured NEGATIVE: a shuffled-hash hint on the
    date-filtered orders side of the lineitem join (the q3/q10 win) was
    tried and REJECTED — the ~7M-row build (the year window keeps ~45% of
    orders, vs q10's one quarter) thrashes the allocator at this heap:
    interleaved sf10 runs went 34.9/16.3/7.6s vs the sort-merge plan's
    steady 5.2-6.4s, with GCLocker retry warnings. Sort-merge spills
    gracefully and stays."""
    t = load_tables(spark, sf_dir, ["region", "nation", "customer", "orders", "lineitem", "supplier"])
    region = t["region"].filter(F.col("r_name") == Q5_REGION)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit(Q5_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_END).cast("timestamp"))
    )
    joined = (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(_money(F.sum(_rev_e4().cast(_D38)), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = f"""
SELECT n_name,
       {_money_sql(f"sum({REV_E4_SQL})", 4)}             AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_START} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q5_END} 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective filter + single agg — pure scan/pushdown test."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q6_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q6_END).cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money(
                F.sum((_cents("l_extendedprice") * _cents("l_discount")).cast(_D38)), 4
            ).alias("revenue")
        )
    )


Q6_SQL = f"""
SELECT {_money_sql(f"sum({_cents_sql('l_extendedprice')} * {_cents_sql('l_discount')})", 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_START} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q6_END} 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost revenue on returned items."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit(Q10_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_END).cast("timestamp"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    # r12 optimization round, measured NEUTRAL-to-NEGATIVE: shuffled-hash
    # hints on the quarter-filtered orders and the customer dim (the q3
    # win) looked good in one interleaved sf10 probe (3.2s → 2.7s) but a
    # second independent A/B showed 3.0-3.2s (sort-merge) vs 3.2-4.8s
    # (hinted) — the ~1.9M-row orders + 1.5M-row customer builds sit in the
    # same allocator-pressure band that made q5's hint thrash. Kept as
    # sort-merge: it never exhibits the slow mode.
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_money(F.sum(_rev_e4().cast(_D38)), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {_money_sql(f"sum({REV_E4_SQL})", 4)}             AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '{Q10_START} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q10_END} 00:00:00'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def window_top_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function core: top-3 orders per customer by total price."""
    from pyspark.sql import Window as W

    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rn",
        )
    )


WINDOW_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
"""


Q4_START, Q4_END = "1996-01-01", "1996-07-01"
Q18_QTY = 320


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts over orders having a late
    lineitem (EXISTS → left-semi join; adapted to this schema's columns:
    late == shipped after the order date)."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp"))
    )
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_START} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q4_END} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation — high- vs low-priority
    line counts per linestatus (shipmode column absent in this schema)."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional agg over a dim join."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    rev4 = _rev_e4().cast(_D38)
    promo4 = F.when(F.col("p_type") == "PROMO", rev4).otherwise(F.lit(0).cast(_D38))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100 * F.sum(promo4).cast("double") / F.sum(rev4).cast("double"), 4
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = f"""
SELECT round(100 * (sum(CASE WHEN p_type = 'PROMO' THEN {REV_E4_SQL}
                             ELSE 0 END))::DOUBLE
             / (sum({REV_E4_SQL}))::DOUBLE, 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders above a total-quantity threshold
    (agg-subquery filter → aggregate + semi join)."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    qty = F.round(F.col("l_quantity")).cast("bigint")  # integer-valued column
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(qty.cast(_D38)).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY)
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["lineitem"]
            .groupBy("l_orderkey")
            .agg(F.round(F.sum(qty.cast(_D38)).cast("double"), 2).alias("total_qty")),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round((SELECT sum(CAST(round(l_quantity) AS BIGINT)) FROM lineitem
              WHERE l_orderkey = o_orderkey)::DOUBLE, 2) AS total_qty
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {Q18_QTY})
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def window_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E24 — distribution window functions over customer balances, per
    market segment: percent_rank (exact rank position), cume_dist
    (fraction ≤ this row), and ntile(10) decile assignment — the
    feature-bucketing trio for scorecards and monotone binning.

    Ties are broken by (c_acctbal, c_custkey), so every function is a pure
    function of the data in both engines — ntile's uneven-bucket boundary
    placement follows the same deterministic row order.

    Scale: `partitionBy(c_mktsegment)` would hash SF-scaled customers into
    ≤5 effective tasks (the segment dim has 5 values), each sorting N/5
    rows — a guaranteed straggler at 100×. Instead the rank is two-phase
    per segment (`_segmented_rank`: range partition on the full
    (segment, acctbal, custkey) total order, so ONE segment spans MANY
    partitions; within-partition row_number + broadcast per-(partition,
    segment) offsets), and all three distribution functions are then
    arithmetic on (rank, per-segment count): the order key ends in the
    unique c_custkey, so there are no peers — percent_rank =
    (rank−1)/(n_seg−1) (0 for a 1-row segment, the SQL definition),
    cume_dist = rank/n_seg, ntile via `_ntile_from_rank`. Exactly the
    same doubles the window functions produce over the same total order.
    The per-segment counts ride out of the rank's own per-(partition,
    segment) counts aggregate (`count_name`) — one customer pass."""
    c = load_tables(spark, sf_dir, ["customer"])["customer"]
    base = c.select("c_custkey", "c_mktsegment", "c_acctbal")
    # count_name: per-segment totals ride out of the rank's own
    # per-(partition, segment) counts aggregate — no second customer scan
    ranked = _segmented_rank(
        base,
        ["c_mktsegment"],
        [F.asc("c_acctbal"), F.asc("c_custkey")],
        "__rnk",
        count_name="__n",
    )
    rnk, n = F.col("__rnk"), F.col("__n")
    return ranked.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.round(
            F.when(n > 1, (rnk - 1) / (n - 1)).otherwise(F.lit(0.0)), 6
        ).alias("pct_rank"),
        F.round(rnk / n, 6).alias("cume_dist"),
        _ntile_from_rank(rnk, n, 10).alias("decile"),
    )


DECILES_SQL = """
SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume_dist,
       ntile(10) OVER w AS decile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E25 — relational set operators: customers who placed an order in
    1995 INTERSECT those who placed one in 1996 (retained), plus 1995
    EXCEPT 1996 (churned), labeled in one result. Spark plans INTERSECT as
    a left-semi and EXCEPT as a left-anti over distinct keys — the
    shuffle-dedup shape, never a full materialized union.

    Scale: each branch is distinct-project → semi/anti join on the
    customer key; AQE coalesces the small outputs."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    retained = y95.intersect(y96).select(
        F.col("o_custkey").alias("c_custkey"), F.lit("retained").alias("cohort")
    )
    churned = y95.exceptAll(y96).select(
        F.col("o_custkey").alias("c_custkey"), F.lit("churned").alias("cohort")
    )
    return retained.unionByName(churned)


SET_OPS_SQL = """
SELECT o_custkey AS c_custkey, 'retained' AS cohort FROM (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
)
UNION ALL
SELECT o_custkey, 'churned' FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  EXCEPT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
)
"""


# the two-phase distributed rank machinery (range-partition on the total
# order, within-partition row_number, broadcast prefix offsets) proven here
# on RFM/Pareto in round 7 now lives in functions/ranks.py, shared with the
# curriculum (N9) and decile (E24) plans — same audited implementation.
from australian_company_etl_spark.functions.ranks import (  # noqa: E402
    global_rank as _global_rank,
    ntile_from_rank as _ntile_from_rank,
    segmented_rank as _segmented_rank,
)


def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E26 — RFM customer segmentation: recency (days behind the dataset's
    last order), frequency (order count), monetary (lifetime spend), each
    scored into quintiles by ntile(5) with a deterministic c_custkey
    tie-break (5 = best: most recent / most frequent / highest spend), and
    the familiar 3-digit segment label. The marketing-analytics staple —
    and the anchor is the data's own max date, so the result is a pure
    function of the corpus.

    Scale: one groupBy on the customer key; each quintile is then an
    exact ntile derived from a DISTRIBUTED global rank (`_global_rank` —
    range-partitioned two-phase ranking, the full key is a total order) —
    NOT an unpartitioned ntile window: the per-customer frame scales with
    SF, and a global-sort window funnels all of it through one task."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count("*").alias("frequency"),
        sum_cents("o_totalprice").alias("monetary"),
    )
    hwm = orders.agg(F.max(F.to_date("o_orderdate")).alias("hwm"))
    base = per_cust.crossJoin(F.broadcast(hwm)).select(
        "o_custkey",
        F.datediff("hwm", "last_order").alias("recency_days"),
        "frequency",
        "monetary",
    )
    n_cust = per_cust.agg(F.count("*").alias("__n"))
    # three INDEPENDENT rank branches joined back on the key — chaining
    # _global_rank calls would make each level recompute the previous
    # (the rank helper references its input twice), compounding 2× per
    # level; as parallel branches each pays its own range shuffle once
    # and the custkey joins reuse one partitioning
    scored = base
    for rank_name, cols in (
        ("__r_rank", [F.desc("recency_days"), F.asc("o_custkey")]),
        ("__f_rank", [F.asc("frequency"), F.asc("o_custkey")]),
        ("__m_rank", [F.asc("monetary"), F.asc("o_custkey")]),
    ):
        branch = _global_rank(base, cols, rank_name).select("o_custkey", rank_name)
        scored = scored.join(branch, "o_custkey")
    scored = scored.crossJoin(F.broadcast(n_cust)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        _ntile_from_rank(F.col("__r_rank"), F.col("__n"), 5).alias("r_score"),
        _ntile_from_rank(F.col("__f_rank"), F.col("__n"), 5).alias("f_score"),
        _ntile_from_rank(F.col("__m_rank"), F.col("__n"), 5).alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws("", F.col("r_score"), F.col("f_score"), F.col("m_score")),
    )


RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate::DATE) AS last_order,
         count(*) AS frequency,
         {sum_cents_sql('o_totalprice')} AS monetary
  FROM orders GROUP BY o_custkey
),
hwm AS (SELECT max(o_orderdate::DATE) AS hwm FROM orders),
base AS (
  SELECT o_custkey,
         date_diff('day', last_order, hwm) AS recency_days,
         frequency, monetary
  FROM per_cust, hwm
),
scored AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency ASC, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary ASC, o_custkey) AS m_score
  FROM base
)
SELECT o_custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
       r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR AS segment
FROM scored
"""


BASKET_TOPK = 20


def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E27 — market-basket pair mining: the top part pairs co-purchased in
    the same order, with support and exact-integer lift (association-rule
    analytics: lift > 1e6 ppm means the pair co-occurs more than
    independence predicts).

    Scale: candidate pairs come from a lineitem SELF-JOIN ON o_orderkey
    with partkey_a < partkey_b — cost Σ basket² per order, bounded by
    basket size (≤7 in TPC-H), NEVER parts² — then one map-side-combined
    pair count. Lift is computed in exact integer ppm ((support · n_orders
    · 10⁶) div (cnt_a · cnt_b)) so no float ratio can reorder the top-k
    between engines."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    items = li.select("l_orderkey", "l_partkey").distinct()
    part_cnt = items.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_orders")
    )
    a = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("support"))
    )
    # part_cnt joins are UNHINTED: one row per distinct part scales with
    # the fact table (~2e10 at SF1e5), so a mandatory broadcast would OOM
    # the driver at exactly the scale the lift envelope below plans for —
    # AQE still picks a broadcast join at any SF where the side actually
    # fits. Only the 1-row n_orders aggregate is broadcast by right.
    return (
        pairs.join(
            part_cnt.select(F.col("l_partkey").alias("pa"), F.col("cnt").alias("cnt_a")),
            "pa",
        )
        .join(
            part_cnt.select(F.col("l_partkey").alias("pb"), F.col("cnt").alias("cnt_b")),
            "pb",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            "support",
            # DECIMAL(38,0) intermediates: at 100 TB n_orders ~1.5e11, so
            # support·n_orders·1e6 and cnt_a·cnt_b for popular parts both
            # blow past int64 (ANSI failure); the lift itself
            # (≤ 1e6·n_orders/cnt_b since support ≤ cnt_a) fits bigint.
            # DuckDB promotes to HUGEINT on its own — values identical.
            F.expr(
                "(CAST(support AS DECIMAL(38,0)) * n_orders * 1000000)"
                " div (CAST(cnt_a AS DECIMAL(38,0)) * cnt_b)"
            )
            .cast("bigint")
            .alias("lift_ppm"),
        )
        .orderBy(F.desc("support"), F.asc("pa"), F.asc("pb"))
        .limit(BASKET_TOPK)
    )


BASKET_SQL = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
part_cnt AS (SELECT l_partkey, count(*) AS cnt FROM items GROUP BY 1),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS support
  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT pa, pb, support,
       CAST((support * n.n_orders * 1000000) // (ca.cnt * cb.cnt) AS BIGINT) AS lift_ppm
FROM pairs
JOIN part_cnt ca ON ca.l_partkey = pa
JOIN part_cnt cb ON cb.l_partkey = pb
CROSS JOIN n
ORDER BY support DESC, pa ASC, pb ASC
LIMIT {BASKET_TOPK}
"""


def suppliers_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E28 — Pareto/ABC supplier classification: rank suppliers by exact
    revenue, cumulative share in exact integer arithmetic, class A = the
    suppliers covering the first 80% of revenue, B to 95%, C the tail —
    the inventory-policy report every supply-chain stack runs.

    Exactness: revenue accumulates as e-4 currency units in DECIMAL(38,0)
    (HUGEINT twin), the cumulative window rides the same units, and the
    80/95 thresholds compare as integer cross-products (cum·5 ≤ total·4)
    — no float share can flip a class boundary at any scale. One shuffle
    for the supplier aggregate; the window runs over O(suppliers) rows."""
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_rev_e4().cast(_D38)).alias("rev_e4")
    )
    # DISTRIBUTED exact prefix sum (the _global_rank two-phase shape): the
    # per-supplier frame scales with SF, so the previous unpartitioned
    # running-sum window (and the whole-frame `total` window beside it)
    # funneled all of it through ONE task. Range-partition on the total
    # order, run the running sum within each partition, and add the
    # preceding partitions' sums (≤32-row broadcast; decimal addition is
    # exact, so the split-and-offset sum is the identical integer). The
    # grand total folds in as a broadcast 1-row aggregate.
    order_cols = [F.desc("rev_e4"), F.asc("l_suppkey")]
    part = rev.repartitionByRange(32, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    psums = part.groupBy("__pid").agg(F.sum("rev_e4").alias("__s"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = psums.select(
        "__pid",
        F.coalesce(F.sum("__s").over(w_off), F.lit(0).cast(_D38)).alias("__soff"),
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    total = rev.agg(F.sum("rev_e4").alias("total"))
    bound = (
        part.join(F.broadcast(offs), "__pid")
        .withColumn("cum", F.sum("rev_e4").over(w_in) + F.col("__soff"))
        .crossJoin(F.broadcast(total))
        .drop("__pid", "__soff")
    )
    abc = (
        F.when(F.col("cum") * 5 <= F.col("total") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("total") * 19, "B")
        .otherwise("C")
    )
    return bound.select(
        "l_suppkey",
        _money(F.col("rev_e4"), 4).alias("revenue"),
        F.expr("CAST((cum * 1000000) div total AS BIGINT)").alias("cum_share_ppm"),
        abc.alias("abc_class"),
    )


PARETO_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, sum({REV_E4_SQL}) AS rev_e4
  FROM lineitem GROUP BY 1
),
bound AS (
  SELECT l_suppkey, rev_e4,
         sum(rev_e4) OVER (ORDER BY rev_e4 DESC, l_suppkey ASC
                           ROWS UNBOUNDED PRECEDING) AS cum,
         sum(rev_e4) OVER () AS total
  FROM rev
)
SELECT l_suppkey,
       {_money_sql('rev_e4', 4)} AS revenue,
       CAST((cum * 1000000) // total AS BIGINT) AS cum_share_ppm,
       CASE WHEN cum * 5 <= total * 4 THEN 'A'
            WHEN cum * 20 <= total * 19 THEN 'B'
            ELSE 'C' END AS abc_class
FROM bound
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q4_order_priority": q4_order_priority,
    "q12_priority_shipping": q12_priority_shipping,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "window_top_orders_per_cust": window_top_orders_per_cust,
    "window_value_deciles": window_value_deciles,
    "set_ops_customer_segments": set_ops_customer_segments,
    "orders_rfm_segments": orders_rfm_segments,
    "orders_market_basket": orders_market_basket,
    "suppliers_pareto_abc": suppliers_pareto_abc,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q10_returned_items": Q10_SQL,
    "q4_order_priority": Q4_SQL,
    "q12_priority_shipping": Q12_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q18_large_orders": Q18_SQL,
    "window_top_orders_per_cust": WINDOW_SQL,
    "window_value_deciles": DECILES_SQL,
    "set_ops_customer_segments": SET_OPS_SQL,
    "orders_rfm_segments": RFM_SQL,
    "orders_market_basket": BASKET_SQL,
    "suppliers_pareto_abc": PARETO_SQL,
}
