"""Group L — temporal joins & hypertable-style rollups over the event log.

Operators Spark has no single built-in for, re-expressed as scalable
compositions (the brief's "custom operators" path (a)):

- L1 `asof_join_last_error` — AS-OF JOIN: for every click event, the most
  recent error event by the same user at-or-before the click. Implemented
  as a tagged UNION + one window pass (single shuffle on user_id, running
  `last(..., ignoreNulls)` carry-forward) — the classic scalable as-of
  plan. A sort-merge inequality join would shuffle the same data but then
  do a per-row backward scan; the union form is one linear pass.
- L2 `range_join_close_pairs` — RANGE (band) JOIN: pairs of events by the
  same user within 1 hour. Implemented by time-bucketing to the band width
  and equi-joining on (user_id, bucket ∈ {b, b+1}) then filtering the
  exact band — candidate cost is Σ|bucket|², never N² (same blocking
  discipline as the fuzzy entity-match family, SURVEY §4).
- L3 `rollup_events_hourly` — hypertable continuous-aggregate shape:
  multi-granularity (day, hour) ROLLUP with grouping_id, one shuffle with
  map-side partial aggregation (Spark expands grouping sets before the
  exchange).
- L4 `cube_orders_priority` — CUBE over (order priority, order year) on
  orders: all four grouping combinations in one pass.

Reference parity: the reference's ingest log accounting and quality
rollups (scripts/run_quality_checks.py:46-78) are flat GROUP BYs; these
generalize them to the event-time/multi-granularity forms a 100 TB ingest
ledger needs.

Scale: L1/L2 shuffle once on user_id (high cardinality, AQE-coalesced);
L3/L4 are single-exchange grouping-set aggregations. No cartesian products
anywhere (asserted in tests/test_scale_plan.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from australian_company_etl_spark.functions.exactmath import (
    D38,
    cents,
    cents_sql,
    money,
    money_sql,
    sum_cents,
    sum_cents_sql,
)
from australian_company_etl_spark.sources.registry import load_tables

BAND_US = 3600 * 1_000_000  # 1-hour range-join band


def asof_join_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 — per click event, the latest error at-or-before it (same user)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    tagged = ev.filter(F.col("event_type").isin("click", "error")).select(
        "event_id",
        "user_id",
        us.alias("us"),
        # errors sort before clicks at equal timestamps → at-or-before is
        # inclusive, matching the oracle's e.ts <= c.ts
        F.when(F.col("event_type") == "error", 0).otherwise(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "last_error_us",
        F.last(F.when(F.col("side") == 0, F.col("us")), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("us").alias("click_us"),
        "last_error_us",
        (F.col("us") - F.col("last_error_us")).alias("gap_us"),
    )


ASOF_SQL = """
SELECT c.event_id,
       c.user_id,
       epoch_us(c.ts) AS click_us,
       (SELECT max(epoch_us(e.ts)) FROM events e
         WHERE e.user_id = c.user_id AND e.event_type = 'error' AND e.ts <= c.ts)
         AS last_error_us,
       epoch_us(c.ts) - (SELECT max(epoch_us(e.ts)) FROM events e
         WHERE e.user_id = c.user_id AND e.event_type = 'error' AND e.ts <= c.ts)
         AS gap_us
FROM events c
WHERE c.event_type = 'click'
"""


def range_join_close_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 — event pairs by the same user within 1 hour (strictly ordered)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    base = ev.select("event_id", "user_id", us.alias("us"))
    bucket = F.expr(f"us div {BAND_US}")
    # left probes its own bucket and the next one; right sits in its bucket —
    # every pair with gap <= band shares a (user, bucket) candidate key
    left = base.select(
        F.col("event_id").alias("e1_id"),
        "user_id",
        F.col("us").alias("us1"),
        F.explode(F.array(bucket, bucket + F.lit(1))).alias("bkt"),
    )
    right = base.select(
        F.col("event_id").alias("e2_id"),
        "user_id",
        F.col("us").alias("us2"),
        bucket.alias("bkt"),
    )
    return (
        left.join(right, ["user_id", "bkt"])
        .filter((F.col("us2") > F.col("us1")) & (F.col("us2") - F.col("us1") <= BAND_US))
        .select("user_id", "e1_id", "e2_id", (F.col("us2") - F.col("us1")).alias("gap_us"))
    )
    # no distinct needed: a qualifying pair's buckets differ by 0 or 1, so it
    # matches exactly one of the two probe buckets — the join is exact


RANGE_SQL = f"""
SELECT e1.user_id,
       e1.event_id AS e1_id,
       e2.event_id AS e2_id,
       epoch_us(e2.ts) - epoch_us(e1.ts) AS gap_us
FROM events e1
JOIN events e2
  ON e1.user_id = e2.user_id
 AND epoch_us(e2.ts) > epoch_us(e1.ts)
 AND epoch_us(e2.ts) - epoch_us(e1.ts) <= {BAND_US}
"""


def _with_grand_total(prepared: DataFrame, group_cols: list[str], sets: list[list[str]], aggs) -> DataFrame:
    """GROUPING SETS including the grand-total () set, SQL-standard on
    EMPTY input: Spark's rollup/cube/groupingSets implement every set via
    one Expand+aggregate, so a zero-row input yields ZERO rows — but the
    standard (and DuckDB) treat the () set as a global aggregate, which
    yields exactly ONE row however empty the input (the empty-corpus
    sweep caught the divergence). The non-() sets run through
    groupingSets as before; the () row comes from a separate global
    aggregate branch unioned on — identical output on non-empty input,
    one (NULLs, gid=2^n−1, count 0) row instead of nothing on empty.
    Scale: the extra branch is a map-side-combined global aggregate over
    the same pruned scan — O(1) output rows."""
    gsets = prepared.groupingSets(sets, *group_cols).agg(
        F.grouping_id().alias("gid"), *aggs()
    )
    null_cols = [
        F.lit(None).cast(t).alias(c)
        for c, t in prepared.dtypes
        if c in group_cols
    ]
    gid_type = dict(gsets.dtypes)["gid"]
    total = prepared.agg(*aggs()).select(
        *null_cols,
        F.lit((1 << len(group_cols)) - 1).cast(gid_type).alias("gid"),
        *[F.col(c) for c in gsets.columns if c not in group_cols and c != "gid"],
    )
    return gsets.unionByName(total)


def rollup_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 — (day, hour) ROLLUP: hourly, daily, and grand-total in one pass
    (grand total via `_with_grand_total`, exact on empty input)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    prepared = ev.select(
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
        F.hour(F.col("ts")).alias("hour"),
        "value",
    )
    return _with_grand_total(
        prepared,
        ["day", "hour"],
        [["day", "hour"], ["day"]],
        lambda: [F.count("*").alias("n_events"), sum_cents("value").alias("sum_value")],
    )


ROLLUP_SQL = f"""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       hour(ts) AS hour,
       GROUPING(strftime(ts, '%Y-%m-%d'), hour(ts)) AS gid,
       count(*) AS n_events,
       {sum_cents_sql('value')} AS sum_value
FROM events
GROUP BY ROLLUP(1, 2)
"""


def cube_orders_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 — CUBE over (priority, order year): all four grouping combos."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    prepared = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.year(F.col("o_orderdate")).alias("order_year"),
        "o_totalprice",
    )
    return _with_grand_total(
        prepared,
        ["priority", "order_year"],
        [["priority", "order_year"], ["priority"], ["order_year"]],
        lambda: [
            F.count("*").alias("n_orders"),
            sum_cents("o_totalprice").alias("revenue"),
        ],
    )


# money sums composed from the guarded exactmath helpers (ADVICE r09):
# the hand-inlined ::BIGINT casts predated money_sql's matched 'envelope'
# refusal, so past-BIGINT sums raised a raw unmatched ConversionException
# in the oracle — caught by the round-10 cancelling-pairs extreme sweep.
CUBE_SQL = f"""
SELECT o_orderpriority AS priority,
       year(o_orderdate) AS order_year,
       GROUPING(o_orderpriority, year(o_orderdate)) AS gid,
       count(*) AS n_orders,
       {sum_cents_sql('o_totalprice')} AS revenue
FROM orders
GROUP BY CUBE(1, 2)
"""


def grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10 — explicit GROUPING SETS over the event log: exactly the three
    report granularities a dashboard needs — per type, per (type, day),
    and the grand total — WITHOUT the unwanted fourth combo (per-day-only)
    a CUBE would also compute and a reporting job would throw away. One
    aggregation pass; the expand operator replicates each input row once
    per grouping set, all map-side-combined (the same executed shape as
    L3/L4 but with a hand-picked set list).

    grouping_id disambiguates the NULL produced by a rolled-up column from
    a genuine NULL value — the standard contract consumers key on."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    prepared = ev.select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    return _with_grand_total(
        prepared,
        ["event_type", "day"],
        [["event_type"], ["event_type", "day"]],
        lambda: [F.count("*").alias("n_events"), sum_cents("value").alias("sum_value")],
    )


GROUPING_SETS_SQL = f"""
SELECT event_type, ts::DATE AS day,
       GROUPING(event_type, ts::DATE) AS gid,
       count(*) AS n_events,
       {sum_cents_sql('value')} AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type), (event_type, ts::DATE), ())
"""


ZORDER_BITS = 16


def _interleave_expr(a: str, b: str, spark_dialect: bool) -> str:
    """Bit-interleave two ZORDER_BITS-wide ints: bit k of `a` lands at
    position 2k, bit k of `b` at 2k+1. Same unrolled integer expression in
    both dialects — no floats, no UDF."""
    terms = []
    for k in range(ZORDER_BITS):
        if spark_dialect:
            terms.append(f"shiftleft(shiftright({a}, {k}) & 1, {2 * k})")
            terms.append(f"shiftleft(shiftright({b}, {k}) & 1, {2 * k + 1})")
        else:
            terms.append(f"((({a} >> {k}) & 1) << {2 * k})")
            terms.append(f"((({b} >> {k}) & 1) << {2 * k + 1})")
    return " + ".join(terms)


def events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L11 — Z-order (Morton) layout key over (user_id, hour-index): the
    multi-dimensional data-layout lever. Range-partitioning + sorting a
    100 TB table by z(user, time) clusters BOTH dimensions into every
    parquet row group, so min/max footer stats prune scans filtered on
    either column (or a rectangle of both) — a single-column sort can only
    serve one of the two predicates. This computes the key; the write path
    is `repartitionByRange(zvalue).sortWithinPartitions(zvalue)` (the
    Delta/Iceberg OPTIMIZE ZORDER dataflow).

    The interleave is an unrolled 32-term integer expression (shift/mask/
    add), generated from the same builder for both dialects — whole-stage
    codegen on the Spark side, never a UDF."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    base = ev.select(
        "event_id",
        (F.col("user_id") % (1 << ZORDER_BITS)).alias("ua"),
        F.expr("unix_micros(ts) div 3600000000").alias("hb_raw"),
    ).select(
        "event_id", "ua", (F.col("hb_raw") % (1 << ZORDER_BITS)).alias("hb")
    )
    return base.select(
        "event_id",
        F.col("ua").cast("int").alias("u_bucket"),
        F.col("hb").cast("int").alias("h_bucket"),
        F.expr(_interleave_expr("ua", "hb", spark_dialect=True)).alias("zvalue"),
    )


def _zorder_sql() -> str:
    m = 1 << ZORDER_BITS
    inter = _interleave_expr("ua", "hb", spark_dialect=False)
    return f"""
WITH base AS (
  SELECT event_id,
         user_id % {m} AS ua,
         (epoch_us(ts) // 3600000000) % {m} AS hb
  FROM events
)
SELECT event_id, ua::INT AS u_bucket, hb::INT AS h_bucket,
       ({inter})::BIGINT AS zvalue
FROM base
"""


# ── L5: explicitly salted skew join ─────────────────────────────────────────

JOIN_SALT = 8


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 — fact⨝dim join with explicit key salting: the event log's user_id
    distribution is hot (few distinct users carry all traffic — the shape of
    any power-law entity key at 100 TB), so a plain shuffle join lands each
    hot key on ONE reducer. Salting splits every fact key across JOIN_SALT
    reducers (salt = event_id % S, deterministic) and replicates the dim row
    to all S salts; each fact row still matches exactly once, so the result
    is identical to the plain join the oracle runs. AQE's skew-join split
    does this adaptively for sort-merge joins; the explicit form is the
    portable rewrite that also covers aggregations-after-join and engines
    or modes where AQE can't see the skew.

    Scale: dim replication is S× a SMALL table (broadcast-sized per salt);
    the fact side gains one cheap projected column, no extra shuffle.
    """
    ev, cust = (
        load_tables(spark, sf_dir, ["events", "customer"])[t] for t in ("events", "customer")
    )
    dim = cust.select(F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment")
    salted_dim = dim.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(JOIN_SALT - 1))).alias("salt")
    )
    fact = ev.select("user_id", "value", (F.col("event_id") % JOIN_SALT).alias("salt"))
    # shuffle_hash hint: at the scale this rewrite exists for, the dim is
    # past broadcast size (a broadcast join has no skew problem to salt) —
    # force the shuffle join the technique targets so the plan under test
    # is the plan that ships
    joined = fact.join(salted_dim.hint("shuffle_hash"), ["user_id", "salt"])
    return joined.groupBy("user_id", "c_name", "c_mktsegment").agg(
        F.count("*").alias("n_events"),
        sum_cents("value").alias("sum_value"),
    )


SKEW_SALTED_SQL = f"""
SELECT e.user_id, c.c_name, c.c_mktsegment,
       count(*) AS n_events,
       {sum_cents_sql('e.value')} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2, 3
"""


# ── L6: event-time RANGE-frame rolling window ───────────────────────────────

ROLL_US = 24 * 3600 * 1_000_000  # 24-hour trailing window


def rolling_window_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 — trailing 24-hour rolling aggregate per user at every event: a
    RANGE frame over event-time micros (not N rows — the frame follows the
    clock, so sparse and dense activity windows are comparable). The
    standard feature-engineering shape for fraud/engagement features.

    Scale: one shuffle on user_id; the range frame is evaluated in one
    sorted pass per partition. At 100 TB you bound the frame state by the
    window width, never by the partition length."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = F.unix_micros(F.col("ts"))
    base = ev.select("event_id", "user_id", us.alias("us"), "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-ROLL_US, Window.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        "us",
        F.count("*").over(w).alias("n_24h"),
        money(F.sum(cents("value").cast(D38)).over(w), 2).alias("sum_24h"),
    )


ROLLING_SQL = f"""
SELECT event_id, user_id, us,
       count(*) OVER w AS n_24h,
       {money_sql(f"sum({cents_sql('value')}) OVER w", 2)} AS sum_24h
FROM (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {ROLL_US} PRECEDING AND CURRENT ROW)
"""


# ── L7: pivot (cross-tab) ───────────────────────────────────────────────────

PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7 — per-user event-type count matrix via `pivot` with an EXPLICIT
    value list: with the values pinned, Spark skips the extra
    distinct-values job and plans a single map-side-combined aggregation —
    the only pivot form that belongs on a 100 TB table."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, [t for t in PIVOT_TYPES])
    )


def _pivot_sql() -> str:
    cols = ", ".join(
        # CAST: DuckDB sum(INTEGER) is HUGEINT, which the driver's fetch
        # renders as float and hash-mismatches Spark's BIGINT cells.
        f'CAST(coalesce(sum(CASE WHEN event_type = \'{t}\' THEN 1 ELSE 0 END), 0) AS BIGINT) AS "{t}"'
        for t in PIVOT_TYPES
    )
    return f"SELECT user_id, {cols} FROM events GROUP BY user_id"




# ── L8: incremental rollup via mergeable partial aggregates ─────────────────


def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L8 — materialized-view maintenance dataflow: per-(day, event_type)
    PARTIAL aggregates (count, sum in exact centi-units, min/max) merged
    into per-type totals WITHOUT touching raw rows again — the two-level
    shape where adding a day to a 100 TB rollup recomputes one day's
    partial and re-merges ~365 tiny rows, instead of rescanning history.

    Everything materializable must be algebraic (count/sum merge by sum,
    min/max by min/max; avg only as sum/count at merge time) — the same
    constraint a production incremental MV imposes. The oracle computes
    the totals DIRECTLY from raw events, so the parity gate is the real
    theorem: merge(partials(raw)) == agg(raw), i.e. the partials lose
    nothing. Sums ride exact integers (floor-centi-units) so re-
    aggregation order can't flip a float ulp between the two paths.

    Scale: pass 1 is one map-side-combined shuffle to |days × types| rows;
    pass 2 merges that tiny frame. The partial frame IS the incremental
    state you'd persist (and what J8's foreachBatch upsert would maintain
    per micro-batch)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    partials = (
        ev.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.expr("cast(floor(value * 100) as bigint)").alias("v_centi"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count("*").alias("p_n"),
            F.sum("v_centi").alias("p_sum"),
            F.min("v_centi").alias("p_min"),
            F.max("v_centi").alias("p_max"),
        )
    )
    return partials.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("p_n").alias("n_events"),
        F.sum("p_sum").alias("sum_centi"),
        F.min("p_min").alias("min_centi"),
        F.max("p_max").alias("max_centi"),
    )


INCR_ROLLUP_SQL = """
SELECT event_type,
       count(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_centi,
       min(CAST(floor(value * 100) AS BIGINT)) AS min_centi,
       max(CAST(floor(value * 100) AS BIGINT)) AS max_centi
FROM events
GROUP BY event_type
"""




# ── L9: hourly resample + forward fill ──────────────────────────────────────


#: L9 spine bound: max per-user lifetime the hourly grid will materialize
#: (1e6 hours ≈ 114 years — generous for any real entity, 70× under the
#: hostile 1777→9999 span that hung both engines in the round-11
#: extreme_timestamps introducing run). Past it, matched loud refusal.
RESAMPLE_MAX_HOURS = 1_000_000


def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L9 — regularize an irregular event stream onto an hourly grid, per
    user, from their first to their last active hour: gap hours appear
    with n_events = 0 and carry the last observed value forward (the
    time-series feature-engineering transform: models want a dense grid,
    sensors/users emit sparsely).

    The carried value is in exact centi-units and the per-hour "observed"
    value is the LAST event of the hour by (ts, event_id) — a
    deterministic tie-break, so the forward-fill chain is identical in
    both engines. Window ffill via last(..., ignorenulls) over the dense
    spine.

    Scale: the spine is sequence()-generated per user (rows ∝ user
    lifetime hours, never a global calendar cross join); the hourly
    pre-aggregation shuffles once on (user, hour); spine join and ffill
    window both ride the user_id partitioning. A pathological always-on
    entity yields ~9k rows/year — bounded for any real lifetime, but
    UNBOUNDED under timestamp OUTLIERS: the round-11 extreme_timestamps
    regime (one 1777 event + one year-9999 event per user) made every
    user's lifetime ~72M hours and both engines hung materializing a
    ~1e11-row grid. Past RESAMPLE_MAX_HOURS (1e6 hours ≈ 114 years) both
    engines now refuse loudly with the matched 'envelope' marker —
    clamp or filter outlier timestamps before resampling."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    base = ev.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("hr"),
        "ts",
        "event_id",
        F.expr("cast(floor(value * 100) as bigint)").alias("v_centi"),
    )
    w_last = Window.partitionBy("user_id", "hr").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    hourly = (
        base.withColumn("rn", F.row_number().over(w_last))
        .groupBy("user_id", "hr")
        .agg(
            F.count("*").alias("n_events"),
            F.max(F.when(F.col("rn") == 1, F.col("v_centi"))).alias("last_v"),
        )
    )
    spans = base.groupBy("user_id").agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = (
        spans.withColumn(
            "h1",
            F.when(
                F.expr(f"(unix_seconds(h1) - unix_seconds(h0)) div 3600 > {RESAMPLE_MAX_HOURS}"),
                F.raise_error(
                    F.lit(
                        "events_resample_ffill: spine envelope exceeded (a user "
                        f"lifetime spans > {RESAMPLE_MAX_HOURS} hours) — clamp or "
                        "filter outlier timestamps before resampling"
                    )
                ).cast("timestamp"),
            ).otherwise(F.col("h1")),
        )
        .select(
            "user_id",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hr"),
        )
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hr"], "left")
        .select(
            "user_id",
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour_at"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("last_v", ignorenulls=True).over(w_fill).alias("v_ffill_centi"),
        )
    )


RESAMPLE_SQL = f"""
WITH base AS (
  SELECT user_id, date_trunc('hour', ts) AS hr, ts, event_id,
         CAST(floor(value * 100) AS BIGINT) AS v_centi
  FROM events
), hourly AS (
  SELECT user_id, hr, count(*) AS n_events,
         max(CASE WHEN rn = 1 THEN v_centi END) AS last_v
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, hr
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM base
  ) GROUP BY user_id, hr
), spine AS (
  SELECT user_id, unnest(generate_series(h0,
    CASE WHEN date_diff('hour', h0, h1) > {RESAMPLE_MAX_HOURS}
         THEN error('events_resample_ffill: spine envelope exceeded (a user lifetime spans > {RESAMPLE_MAX_HOURS} hours) - clamp or filter outlier timestamps before resampling')::TIMESTAMP
         ELSE h1 END, INTERVAL 1 HOUR)) AS hr
  FROM (SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM base GROUP BY user_id)
)
SELECT s.user_id,
       strftime(s.hr, '%Y-%m-%d %H:%M:%S') AS hour_at,
       coalesce(h.n_events, 0) AS n_events,
       last_value(h.last_v IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill_centi
FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hr = h.hr
"""


QUERIES = {
    "asof_join_last_error": asof_join_last_error,
    "range_join_close_pairs": range_join_close_pairs,
    "rollup_events_hourly": rollup_events_hourly,
    "cube_orders_priority": cube_orders_priority,
    "join_skew_salted": join_skew_salted,
    "rolling_window_24h": rolling_window_24h,
    "pivot_user_event_matrix": pivot_user_event_matrix,
    "incremental_rollup_merge": incremental_rollup_merge,
    "events_resample_ffill": events_resample_ffill,
    "grouping_sets_report": grouping_sets_report,
    "events_zorder_key": events_zorder_key,
}

ORACLES = {
    "asof_join_last_error": ASOF_SQL,
    "range_join_close_pairs": RANGE_SQL,
    "rollup_events_hourly": ROLLUP_SQL,
    "cube_orders_priority": CUBE_SQL,
    "join_skew_salted": SKEW_SALTED_SQL,
    "rolling_window_24h": ROLLING_SQL,
    "pivot_user_event_matrix": _pivot_sql(),
    "incremental_rollup_merge": INCR_ROLLUP_SQL,
    "events_resample_ffill": RESAMPLE_SQL,
    "grouping_sets_report": GROUPING_SETS_SQL,
    "events_zorder_key": _zorder_sql(),
}
